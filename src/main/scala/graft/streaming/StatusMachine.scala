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

  def transition(current: Option[PageRecord], e: StatusEvent): Option[PageRecord] = {
    val next = e.kind match {
      case "stored" => PageStatus.New
      case "upload_start" => PageStatus.Uploading
      case "upload_success" => PageStatus.Success
      case "upload_fail" => PageStatus.Fail
      case "aborted" => PageStatus.Aborted
      case _ => return current
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
    events.toSeq.sortBy(e => (e.timeMs, rank.getOrElse(
      e.kind match {
        case "stored" => PageStatus.New
        case "upload_start" => PageStatus.Uploading
        case "upload_success" => PageStatus.Success
        case "upload_fail" => PageStatus.Fail
        case _ => PageStatus.Aborted
      }, 0))).foreach { e =>
      cur = transition(cur, e)
    }
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
