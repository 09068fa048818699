package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rank-error quantile sketch: the planted-heavy-tail bound (the reason
  * it exists — one 2^40 outlier must not destroy the p50 estimate,
  * which is precisely where histQuantiles' value-space bound
  * collapses), exact KMV mergeability, partitioning invariance,
  * small-group exactness, and the map-side WindowGroupLimit plan
  * shape. */
class RankQuantileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 20k rows in one group, values uniform over [0, 1000), plus ONE
    * 2^40 outlier — the length-distribution shape (heavy tail) that
    * breaks equi-width histograms. */
  private def planted = {
    val base = spark.range(20000)
      .select(lit("g0").as("grp"), (col("id") % 1000L).as("v"),
        col("id").as("doc"))
    base.unionByName(
      Seq(("g0", 1L << 40, 20000L)).toDF("grp", "v", "doc"))
  }

  private def rankOf(est: Long): Long =
    planted.filter(col("v") <= est).count()

  test("one 2^40 outlier: p50 rank error stays small where histQuantiles collapses") {
    val n = planted.count()
    val got = Sketch.rankQuantiles(planted, "grp", "v", "doc",
        k = 256, pcts = Seq(25, 50, 75, 95))
      .as[(String, Long, Long)].collect()
      .map { case (_, pq, est) => pq -> est }.toMap

    // rank-error bound: for every estimated quantile, the estimate's
    // true rank is within 10% of the target rank (k=256 gives ~1/√k ≈
    // 6% w.h.p.; the pin is the measured deterministic outcome)
    for ((pq, est) <- got) {
      val target = pq * n / 100.0
      val r = rankOf(est)
      assert(math.abs(r - target) <= 0.10 * n,
        s"p$pq: est=$est has rank $r, target $target (n=$n)")
      assert(est < 2000L || pq == 100,
        s"p$pq estimate $est dragged toward the outlier")
    }

    // the motivating failure: the equi-width histogram's global extent
    // is stretched to 2^40, all real mass bins at 0, and its p50
    // estimate's RANK error exceeds 40% of the corpus
    val hist = Sketch.histQuantiles(planted, "grp", "v", pcts = Seq(50))
      .select(col("est")).as[Long].collect().head
    val histRank = rankOf(hist)
    assert(math.abs(histRank - n / 2.0) > 0.40 * n,
      s"histQuantiles unexpectedly survived the heavy tail (est=$hist)")
  }

  test("KMV merge is exact: bottomK(A) ∪ bottomK(B) re-sketched == bottomK(A ∪ B)") {
    val a = planted.filter(col("doc") % 3 === 0)
    val b = planted.filter(col("doc") % 3 =!= 0)
    val whole = Sketch.rankSample(planted, "grp", "v", "doc", k = 256)
      .as[(String, Long, Long, Long)].collect().toSet
    val merged = Sketch.mergeRankSamples(
        Sketch.rankSample(a, "grp", "v", "doc", k = 256),
        Sketch.rankSample(b, "grp", "v", "doc", k = 256), k = 256)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(merged == whole, "merged shard sketches != whole-data sketch")

    // overlapping shards (the at-least-once case): the same row in both
    // inputs must not double-enter the sample
    val overlapped = Sketch.mergeRankSamples(
        Sketch.rankSample(planted.filter(col("doc") % 2 === 0), "grp", "v", "doc", k = 256),
        Sketch.rankSample(planted, "grp", "v", "doc", k = 256), k = 256)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(overlapped == whole, "overlapping merge diverged")
  }

  test("estimates are partitioning-invariant (deterministic hash sample)") {
    def est(parts: Int) = Sketch
      .rankQuantiles(planted.repartition(parts), "grp", "v", "doc", k = 256)
      .orderBy(col("pq")).as[(String, Long, Long)].collect().toSeq
    assert(est(3) == est(13), "sample depends on partitioning")
  }

  test("groups smaller than k degrade to exact quantiles") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Sketch.rankQuantiles(docs, "lang", "n_chars", "doc_id",
        k = 100000, pcts = Seq(50))
      .select(col("g"), col("est")).as[(String, Long)].collect().toMap
    val exact = docs
      .groupBy(col("lang"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
        .cast("long").as("p50"))
      .as[(String, Long)].collect().toMap
    assert(got == exact, s"full-sample sketch != exact: $got vs $exact")
  }

  test("sampling filter runs map-side as WindowGroupLimit") {
    val plan = Sketch.rankSample(planted, "grp", "v", "doc", k = 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"row_number<=k not pushed as WindowGroupLimit:\n$plan")
  }
}
