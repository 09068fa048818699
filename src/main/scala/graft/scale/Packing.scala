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
