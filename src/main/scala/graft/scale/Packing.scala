package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing — the concat-then-chunk step that turns a document
  * corpus into fixed-length training sequences: within each shard,
  * documents are laid end-to-end in deterministic order and the token
  * stream is cut every `seqLen` tokens; a document crossing a cut
  * contributes a span to each bin it touches. This is the standard
  * GPT-style pretraining layout (concatenate, then split at the context
  * length) computed RELATIONALLY: one per-shard window cumsum + a
  * bounded explode, no driver loop, no per-doc state machine.
  *
  * Extension scope (training-data pipeline operators; the reference's
  * own unit of work is the block-chunked page upload,
  * upload_notion_blocks.py:257-337 — same chunk-a-document shape, its
  * chunk boundary being Notion's 100-block API cap where ours is the
  * model context length).
  *
  * Scale shape:
  *  - The ONLY shuffle is the shard-keyed window sort — per-shard, never
  *    a global sort; shards are the parallelism unit exactly as input
  *    files are in a real pipeline, so 1000 executors sort 1000 shards
  *    independently.
  *  - The bin explode emits `1 + spans` rows per doc where spans is the
  *    number of cuts the doc crosses (≤ tokens/seqLen + 1) — output is
  *    O(total tokens / seqLen + docs), and the per-(shard, bin) rollup
  *    is map-side combinable because exploded rows for a bin are
  *    produced inside the partition that owns the shard.
  *  - All arithmetic is integer (token counts, cut indices, span
  *    lengths), so an external engine replays the layout bit-for-bit.
  */
object Packing {

  /** Whitespace token count — the corpus-wide stand-in for a tokenizer
    * count (q107/q111 give the subword form); empty text counts 1
    * (split yields [""]), so every doc occupies ≥1 token and bin
    * assignment is total. */
  def tokenCount(text: Column): Column = size(split(text, " ")).cast("long")

  /** Per-document placement: `(shard, doc_id, tk, cstart)` where
    * `cstart` is the token offset of the doc in its shard's
    * concatenated stream — docs ordered by doc_id within shard. */
  def placements(docs: DataFrame, shardExpr: Column): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(shardExpr.as("shard"), col("doc_id"),
        tokenCount(col("text")).as("tk"))
      .withColumn("cstart", sum(col("tk")).over(w) - col("tk"))
  }

  /** Token-balanced shard assignment — the exporter's complement to
    * q89's hash-mod-S sharding: hash-mod balances document COUNTS in
    * expectation but leaves token mass skewed when lengths vary; a
    * training-data exporter wants each output shard to carry ≈ equal
    * TOKENS. Documents are laid on one deterministic global axis
    * (content-hash order — reproducible across engines and reruns, the
    * q68/q89 discipline) and the token stream is cut every
    * ⌈total/nShards⌉ tokens; a document belongs to the shard its START
    * offset falls in.
    *
    * The global cumsum is computed WITHOUT a single-partition sort
    * window — the q61 two-level exact-rank recipe with sums instead of
    * counts: hash buckets lead the global order, so (1) per-bucket
    * token sums prefix-sum into exclusive offsets (control-plane:
    * `buckets` longs to the driver, same adjudicated bound as q61),
    * (2) the within-bucket window partitions on the bucket (every
    * executor sorts only its slice), (3) global offset = bucket offset
    * + local cumsum. PlanShapeSpec asserts the non-empty partitionSpec.
    *
    * Returns one row per doc: (doc_id, tk, cstart, shard). */
  def tokenBalancedShards(docs: DataFrame, nShards: Int,
      buckets: Int = 32): DataFrame = {
    require(nShards >= 1 && buckets >= 1)
    val h = graft.functions.RollingHash.rolling_hash(col("text"))
    val base = docs.select(col("doc_id"), h.as("h"),
        tokenCount(col("text")).as("tk"))
      .withColumn("bucket", pmod(col("h"), lit(buckets.toLong)))
    val sums = base.groupBy(col("bucket")).agg(sum(col("tk")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = sums.map(_._2).sum
    val target = math.max(1L, (total + nShards - 1) / nShards)
    var acc = 0L
    val offPairs = sums.flatMap { case (b, s) =>
      val o = acc; acc += s; Seq(lit(b), lit(o))
    }
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("cstart", sum(col("tk")).over(w) - col("tk") +
        element_at(map(offPairs.toIndexedSeq: _*), col("bucket")))
      .withColumn("shard", expr(s"cstart div ${target}L"))
      .select(col("doc_id"), col("tk"), col("cstart"), col("shard"))
  }

  /** Per-bin packing profile: for each `(shard, bin)` of the cut
    * stream, how many documents contribute a span and how many tokens
    * the bin holds (= `seqLen` for every bin but the shard's last).
    * Returns (shard, bin, n_docs, n_tokens). */
  def packStats(docs: DataFrame, shardExpr: Column,
      seqLen: Long): DataFrame = {
    require(seqLen >= 1)
    val p = placements(docs, shardExpr)
      .withColumn("bin_first", expr(s"cstart div ${seqLen}L"))
      .withColumn("bin_last", expr(s"(cstart + tk - 1) div ${seqLen}L"))
    p.select(col("shard"), col("cstart"), col("tk"),
        explode(expr("sequence(bin_first, bin_last)")).as("bin"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(lit(seqLen) * (col("bin") + 1), col("cstart") + col("tk"))
          - greatest(lit(seqLen) * col("bin"), col("cstart")))
          .as("n_tokens"))
  }
}
