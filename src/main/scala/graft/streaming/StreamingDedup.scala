package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming hash-keyed dedup: first-seen wins over a content-hash key.
  *
  * The batch dedup family (graft.scale.Dedup) assumes the corpus is at
  * rest; an ingest pipeline must instead drop re-uploads AS they arrive.
  * State is keyed by (128-bit content hash, length) — never the
  * document — so per-key state is constant-size and the stream shuffles
  * only (hash, payload) once. The watermark horizon bounds state: a
  * duplicate arriving later than the horizon re-admits the document
  * (at 100 TB, unbounded first-seen state is the thing that kills the
  * job; horizon + compaction against the at-rest store is the pattern).
  *
  * Collision honesty (same tradeoff as `Dedup.exactByHash`, documented
  * not hidden): two DISTINCT documents colliding on the full
  * 128-bit-md5 + length key would be conflated and the later one
  * dropped. That needs a 2^-128-scale event — not a birthday-bound
  * 64-bit risk, which at billions of streamed documents WOULD be
  * expected. Exact-by-content streaming state would have to hold every
  * document text in state, the thing this operator exists to avoid.
  */
object StreamingDedup {

  /** Drop rows whose `text` content key (md5, length) was already seen
    * within the watermark horizon. `tsCol` must be an event-time
    * timestamp column. */
  def firstSeen(docs: DataFrame, tsCol: String, horizon: String): DataFrame =
    docs
      .withColumn("content_hash", md5(to_binary(col("text"), lit("utf-8"))))
      .withColumn("content_len", length(col("text")))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash", "content_len")
      .drop("content_len")
}
