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

  /** Streaming NEAR-dup admission: first-seen wins over the document's
    * full n-gram MinHash SIGNATURE (the [[graft.scale.Dedup
    * .minhashSignature]] sketch, computed per-row with the native
    * expression — no shuffle beyond the dedup's own) within the
    * watermark horizon.
    *
    * Operating curve, stated not hidden: two documents collide on the
    * FULL signature with probability J^numHashes (J = shingle
    * Jaccard), so this is a HIGH-PRECISION near-dup gate — at the
    * default 8 hashes, J=0.95 twins are dropped ~66% of the time,
    * J=0.7 cousins ~6%, unrelated documents never (beyond the 128-bit
    * key hash). Lower `numHashes` for more recall at the cost of
    * conflating more distant pairs. The RECALL-oriented banded-LSH
    * form stays a batch operator ([[graft.scale.Dedup
    * .minhashLshPairs]]): per-band admission needs a second stateful
    * aggregation over band verdicts, and candidate pairs need exact
    * verification against the at-rest corpus — run it as the
    * compaction pass over what this gate admits (the same
    * stream-gate + batch-compact split the class doc describes).
    *
    * State honesty (same pattern as [[firstSeen]]): the key is the
    * md5 of the signature VALUES (comma-joined decimal longs — a
    * serialization this operator owns, NOT Spark's complex-type cast
    * rendering, whose display format has changed across majors and
    * would silently re-key months-old checkpoint state on an engine
    * upgrade) plus the signature length — 128-bit, constant-size per
    * key, never the document, never a birthday-bound 64-bit value.
    * Documents with fewer than `n` tokens have no shingle signature
    * and fall back to the exact content key, so shorts dedup exactly
    * instead of being dropped or conflated. */
  def nearDupFirstSeen(docs: DataFrame, tsCol: String, horizon: String,
      n: Int = 5, numHashes: Int = 8): DataFrame = {
    val w = split(col("text"), " ")
    val sig = graft.functions.HashSketches
      .minhash_sig(graft.scale.Dedup.shingles(w, n), numHashes)
    val sigRepr = concat_ws(",", transform(sig, x => x.cast("string")))
    val key = when(size(w) >= n, md5(to_binary(sigRepr, lit("utf-8"))))
      .otherwise(md5(to_binary(col("text"), lit("utf-8"))))
    docs
      .withColumn("near_key", key)
      .withColumn("near_len",
        when(size(w) >= n, lit(numHashes)).otherwise(-length(col("text"))))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("near_key", "near_len")
      .drop("near_len")
  }
}
