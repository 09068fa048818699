package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temperature-weighted corpus mixing: rebalance a multi-source corpus
  * toward sqrt-proportional representation and draw a deterministic
  * sample meeting the rebalanced quotas — the GPT-3-style mixture step
  * ("don't let the biggest crawl drown the curated sources") run as a
  * relational operator. α = 0.5 (sqrt) is fixed: `floor(sqrt(n))` is
  * exact in IEEE double for any count below 2^52, so the quota algebra
  * stays engine-portable integer arithmetic; other temperatures need a
  * rational-power integer routine and are out of scope.
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
