package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temperature-weighted corpus mixing: rebalance a multi-source corpus
  * toward sqrt-proportional representation and draw a deterministic
  * sample meeting the rebalanced quotas — the GPT-3-style mixture step
  * ("don't let the biggest crawl drown the curated sources") run as a
  * relational operator. Two temperature paths: [[temperatureQuotas]]
  * fixes α = 0.5 (`floor(sqrt(n))` is exact in IEEE double below 2^52
  * — the fast path q126/q129 pin), and [[temperatureQuotasAlpha]]
  * serves any DYADIC α = num/den (den ≤ 16) via iterated floor-sqrt
  * chains — 1/16 granularity brackets the published 0.3/0.7-style
  * mixes with the same engine-portable integer algebra.
  *
  * Selection within a group is content-hash order (md5_64 of a salted
  * doc key — the q68/q97 deterministic-"random" discipline): stable
  * under repartitioning, engine choice, and rerun, and replayable by an
  * external oracle.
  *
  * Scale shape: group counts are one map-side-combinable aggregation;
  * the quota table is group-cardinality-sized and broadcast; candidate
  * ranking is the per-group window with a CONSTANT rank bound `k`
  * pushed as WindowGroupLimit (each task keeps ≤ k candidate rows
  * before the window shuffle — quotas never exceed k since
  * isq·k div Σisq ≤ k), then the per-group quota refines the kept rows.
  * No global sort, no driver-side counts.
  */
object Mixture {

  /** Per-group sqrt-temperature quotas out of a budget of `k` docs:
    * (group, n, isq, quota) with isq = floor(sqrt(n)) and
    * quota = (isq · k) div Σ isq. Σ quota ≤ k (floors); small groups
    * gain share relative to raw proportion, big groups lose it. */
  def temperatureQuotas(docs: DataFrame, groupCol: String,
      k: Long): DataFrame = {
    require(k >= 1)
    val cnt = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .withColumn("isq", floor(sqrt(col("n").cast("double"))).cast("long"))
    val tot = cnt.agg(sum(col("isq")).as("t"))
    cnt.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n"), col("isq"),
        expr(s"(isq * ${k}L) div t").as("quota"))
  }

  /** GENERAL-temperature quotas at DYADIC α = num/den (den a power of
    * two ≤ 16) — the path α=0.3/0.7-style published mixes previously
    * lacked. The weight is an exact-integer dyadic power built from
    * the iterated floor-sqrt identity floor(n^(1/2^i)) =
    * isqrt(isqrt(…(n))) (isqrt = floor∘sqrt is IEEE-exact below 2^52):
    * α's binary expansion selects which chain elements multiply, so
    * {{{ w(n) = Π_{i : bit_i(α)=1} floor(n^(1/2^i)) }}}
    * — a floor-composed under-approximation of n^α that is monotone in
    * n, fits 64 bits for every α ≤ 1 (w ≤ n), and is REPLAYABLE by any
    * engine with exact double sqrt: no pow(), no rational-root search,
    * no n^p intermediate (exact p/q-th roots need n^p, which overflows
    * 64-bit at n≈2^(63/p) — n^7 dies at 509 docs; the dyadic chain
    * never leaves [0, n]). Granularity 1/16 brackets every published
    * temperature: α=0.3 → 5/16 = 0.3125, α=0.7 → 11/16 = 0.6875.
    * num = den gives α = 1 (plain proportional); [[temperatureQuotas]]
    * (α = 1/2) stays the fixed fast path q126/q129 pin.
    *
    * Same scale shape as [[temperatureQuotas]]: one map-combinable
    * count aggregation, a broadcast group-cardinality quota table.
    * Returns (group, n, w, quota) with quota = (w·k) div Σw; feed to
    * [[sample]] via `precomputedQuotas` (it reads group/n/quota). */
  def temperatureQuotasAlpha(docs: DataFrame, groupCol: String, k: Long,
      alphaNum: Int, alphaDen: Int): DataFrame = {
    require(k >= 1)
    require(alphaDen > 0 && (alphaDen & (alphaDen - 1)) == 0 &&
      alphaDen <= 16, "alphaDen must be a power of two <= 16")
    require(alphaNum >= 1 && alphaNum <= alphaDen,
      "alpha must lie in (0, 1]")
    val j = 31 - Integer.numberOfLeadingZeros(alphaDen) // log2(den)
    val cnt = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val w: Column =
      if (alphaNum == alphaDen) col("n")
      else {
        // chain s_i = floor(n^(1/2^i)); bit i of num (MSB-first over j
        // bits) selects s_i into the product
        var s: Column = col("n")
        val factors = scala.collection.mutable.ListBuffer[Column]()
        for (i <- 1 to j) {
          s = floor(sqrt(s.cast("double"))).cast("long")
          if (((alphaNum >> (j - i)) & 1) == 1) factors += s
        }
        factors.reduce(_ * _)
      }
    val wc = cnt.withColumn("w", w)
    val tot = wc.agg(sum(col("w")).as("t"))
    wc.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n"), col("w"),
        expr(s"(w * ${k}L) div t").as("quota"))
  }

  /** The mixed sample: for each group, its `quota` docs in content-hash
    * order. Returns (group, n, quota, rk, doc_id). A caller that also
    * reports the quotas (q129's funnel) passes its own
    * [[temperatureQuotas]] frame via `precomputedQuotas` so the
    * group-count aggregation runs once, not twice. */
  def sample(docs: DataFrame, groupCol: String, k: Long,
      idCol: String = "doc_id",
      precomputedQuotas: Option[DataFrame] = None): DataFrame = {
    val quotas = precomputedQuotas
      .getOrElse(temperatureQuotas(docs, groupCol, k))
    val h = graft.functions.Md5_64.md5_64(
      concat_ws(":", lit("mix"), col(idCol)))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("h").asc, col(idCol).asc)
    docs.select(col(groupCol), col(idCol))
      .withColumn("h", h)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= lit(k)) // constant bound → WindowGroupLimit
      .join(broadcast(quotas.select(col(groupCol), col("n"), col("quota"))),
        groupCol)
      .filter(col("rk") <= col("quota"))
      .select(col(groupCol), col("n"), col("quota"), col("rk"), col(idCol))
  }
}
