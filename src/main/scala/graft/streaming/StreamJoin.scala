package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: enrich each event on the
  * left stream with matching right-stream events for the same key that
  * occurred within a bounded look-back window — the streaming twin of
  * the batch as-of/range joins (WindowCatalogue q62/q63).
  *
  * Scale: BOTH sides carry watermarks and the join condition bounds the
  * right side's event time relative to the left's, so Spark derives a
  * state-retention horizon per side and evicts buffered rows as the
  * watermarks advance — state is O(events within the interval), never
  * the whole stream. Without the time bound a stream-stream join's
  * state grows forever; this operator makes the bound part of the API.
  */
object StreamJoin {

  /** left(ts, key, …) ⋈ right(ts, key, …): rows of `right` within
    * `[left.ts - lookback, left.ts]` for the same key. Column names are
    * prefixed to avoid collisions. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      lookback: String = "10 minutes",
      watermark: String = "20 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(key).as("k"), col("ts").as("l_ts"),
        struct(left.columns.map(col): _*).as("l"))
    val r = right.withWatermark("ts", watermark)
      .select(col(key).as("r_k"), col("ts").as("r_ts"),
        struct(right.columns.map(col): _*).as("r"))
    l.join(r,
      col("k") === col("r_k") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $lookback") &&
        col("r_ts") <= col("l_ts"))
      .select(col("k"), col("l_ts"), col("r_ts"), col("l"), col("r"))
  }
}
