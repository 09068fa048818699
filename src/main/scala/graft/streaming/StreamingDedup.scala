package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup: first-seen wins over a content-hash key.
  *
  * The batch dedup family (graft.scale.Dedup) assumes the corpus is at
  * rest; an ingest pipeline must instead drop re-uploads AS they arrive.
  * State is keyed by the 8-byte content hash — never the document — so
  * per-key state is constant-size and the stream shuffles only
  * (hash, payload) once. The watermark horizon bounds state: a
  * duplicate arriving later than the horizon re-admits the document
  * (at 100 TB, unbounded first-seen state is the thing that kills the
  * job; horizon + compaction against the at-rest store is the pattern).
  */
object StreamingDedup {

  /** Drop rows whose `text` content hash was already seen within the
    * watermark horizon. `tsCol` must be an event-time timestamp column. */
  def firstSeen(docs: DataFrame, tsCol: String, horizon: String): DataFrame =
    docs
      .withColumn("content_hash", xxhash64(col("text")))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
