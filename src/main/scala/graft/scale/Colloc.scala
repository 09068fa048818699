package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining: adjacent-bigram association strength over the
  * corpus — the PMI-style sweep that finds multiword units ("new york",
  * "machine learning") before tokenizer training or phrase-aware
  * indexing. Association is the integer LIFT
  *
  * {{{ lift_q = (c12 · N · liftScale) div (c1 · c2) }}}
  *
  * — the PMI argument exp-free and floor-quantized, so ordering matches
  * PMI ordering exactly (log is monotone) while every value is a pure
  * integer an external engine reproduces bit-for-bit (the q96 integer-
  * space discipline applied to corpus statistics).
  *
  * Scale shape:
  *  - Bigram emission is a zero-shuffle per-row explode (slice + zip of
  *    the token array); the (w1, w2) count is one map-side-combinable
  *    shuffle of vocabulary²-bounded (in practice near-corpus-linear)
  *    pairs — identical shape to q49's vocabulary build.
  *  - Unigram counts join back on the term key: vocabulary-sized,
  *    broadcastable at any realistic vocab; N is an in-plan one-row
  *    broadcast scalar, never a driver count.
  *  - Overflow contract: c12·N·liftScale must stay under 2^63 — at the
  *    default liftScale 10^6 that is N·c12 < 9.2×10^12, ample for any
  *    single-machine slice; a 100 TB corpus caller drops liftScale to
  *    10^3 or widens to DecimalType (resolution vs range, stated not
  *    hidden — the hitsQ contract).
  */
object Colloc {

  /** Bigram lift table: (w1, w2, c12, c1, c2, lift_q) for every
    * adjacent bigram occurring ≥ `minCount` times. */
  def bigramLift(docs: DataFrame, minCount: Long,
      liftScale: Long = 1000000L): DataFrame = {
    require(minCount >= 1 && liftScale >= 1)
    val toks = docs.select(split(col("text"), " ").as("w"))
    val uni = toks.select(explode(col("w")).as("term"))
    val ucnt = uni.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val n = uni.agg(count(lit(1)).as("n"))
    val bcnt = toks.filter(size(col("w")) >= 2)
      .select(slice(col("w"), lit(1), size(col("w")) - 1).as("a"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("b"))
      .select(explode(arrays_zip(col("a"), col("b"))).as("z"))
      .groupBy(col("z.a").as("w1"), col("z.b").as("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    bcnt
      .join(ucnt.select(col("term").as("w1"), col("c").as("c1")), "w1")
      .join(ucnt.select(col("term").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        expr(s"(c12 * n * ${liftScale}L) div (c1 * c2)").as("lift_q"))
  }
}
