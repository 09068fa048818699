package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact-cut sequence packing — the ingest twin of
  * [[graft.scale.Packing]]: documents arriving on a stream are laid
  * end-to-end per shard and cut every `seqLen` tokens, with the
  * shard's running token offset carried ACROSS micro-batches in
  * per-shard state. A training-data pipeline uses this to assign
  * stable (bin, span) coordinates at ingest time instead of
  * re-packing the corpus at rest after every crawl.
  *
  * Ordering contract, stated not hidden: the batch operator orders by
  * doc_id within shard; a stream's order IS arrival order — within one
  * micro-batch the group's rows are sorted by doc_id (deterministic
  * under replay), across batches the offset continues from state. Feed
  * batches in doc_id order and the placements equal the batch
  * operator's exactly (spec-pinned).
  *
  * Scale shape: state per shard is ONE long (the running offset) —
  * bounded however long the stream runs, the [[StreamingDedup]]
  * state-honesty discipline; the only shuffle is the groupByKey on
  * shard, the same key the batch window sorts on.
  */
object StreamingPacking {

  /** Per-document placement rows (shard, doc_id, tk, cstart, bin_first,
    * bin_last) for a streaming (shard, doc_id, tk) input. Append-mode
    * safe: each input row yields exactly one output row, placements
    * never revise. */
  def placements(docs: Dataset[(Long, Long, Long)],
      seqLen: Long): Dataset[(Long, Long, Long, Long, Long, Long)] = {
    require(seqLen >= 1)
    import docs.sparkSession.implicits._
    docs.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[(Long, Long, Long)],
            state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._2).map { case (_, id, tk) =>
            val cs = off
            off += tk
            (shard, id, tk, cs, cs / seqLen, (cs + tk - 1) / seqLen)
          }
          state.update(off)
          out.iterator
      }
  }
}
