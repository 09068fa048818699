package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.{PageRecord, PageStatus}

/** ST7: the page-status lifecycle as keyed streaming state.
  *
  * NEW (blocks stored) → UPLOADING (drain started) → SUCCESS | FAIL
  * (upload result) or ABORTED (execution died) — the transitions the
  * reference spreads across store_notion_blocks.py:140-150,
  * upload_notion_blocks.py:129-149 and
  * upload-state-machine.asl.json:215-237,311-336, expressed as one
  * `mapGroupsWithState` over status events.
  *
  * Illegal transitions (e.g. SUCCESS → UPLOADING) are ignored rather
  * than thrown: terminal states are sticky, which is exactly the
  * `attribute_not_exists(PageUrl)`-guard discipline of the reference.
  */
object StatusMachine {

  /** A status-affecting event. `kind` ∈ stored | upload_start |
    * upload_success | upload_fail | aborted. */
  case class StatusEvent(blockBatch: String, key: String, kind: String,
      timeMs: Long)

  private val rank: Map[String, Int] = Map(
    PageStatus.New -> 0, PageStatus.Uploading -> 1,
    PageStatus.Success -> 2, PageStatus.Fail -> 2, PageStatus.Aborted -> 2)

  /** The ONE kind→status mapping (transition and the replay sort key
    * both consume it — a second inline copy previously drifted on
    * unknown kinds). */
  private def statusOf(kind: String): Option[String] = kind match {
    case "stored" => Some(PageStatus.New)
    case "upload_start" => Some(PageStatus.Uploading)
    case "upload_success" => Some(PageStatus.Success)
    case "upload_fail" => Some(PageStatus.Fail)
    case "aborted" => Some(PageStatus.Aborted)
    case _ => None
  }

  def transition(current: Option[PageRecord], e: StatusEvent): Option[PageRecord] = {
    val next = statusOf(e.kind) match {
      case Some(s) => s
      case None => return current
    }
    current match {
      case None => Some(PageRecord(e.blockBatch, e.key, next, e.timeMs, None))
      case Some(cur) =>
        // terminal states sticky; otherwise move forward only
        if (rank(cur.status) >= 2) current
        else if (rank(next) >= rank(cur.status) || next == PageStatus.Aborted)
          Some(cur.copy(status = next, statusTime = e.timeMs))
        else current
    }
  }

  private def updateFn(
      batch: String,
      events: Iterator[StatusEvent],
      state: GroupState[PageRecord]): Iterator[PageRecord] = {
    var cur: Option[PageRecord] = state.getOption
    // TOTAL order: (time, rank, kind). Rank alone cannot separate two
    // terminal kinds at the same millisecond (Success/Fail/Aborted all
    // rank 2), so without the kind tiebreak the sticky winner depended
    // on shuffle arrival order — a crash-replay could flip a persisted
    // SUCCESS to FAIL. With it, the lexically-first terminal kind at a
    // tied (time, rank) applies first and sticks, replay-independent.
    // Unknown kinds sort at rank -1 (they are transition no-ops).
    events.toSeq.sortBy(e =>
      (e.timeMs, statusOf(e.kind).flatMap(rank.get).getOrElse(-1), e.kind))
      .foreach { e => cur = transition(cur, e) }
    cur match {
      // a group whose only events had unknown kinds (and no prior
      // state) is IGNORED — fabricating a NEW record with empty key and
      // time 0 would emit (and persist) a phantom page
      case None => Iterator.empty
      case Some(rec) => state.update(rec); Iterator.single(rec)
    }
  }

  /** Streaming form: one output row per updated page per micro-batch. */
  def run(events: Dataset[StatusEvent]): Dataset[PageRecord] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.blockBatch)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(updateFn)
  }
}
