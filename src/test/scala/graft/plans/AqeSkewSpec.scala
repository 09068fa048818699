package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew handling: proves AQE actually splits a skewed join
  * partition under this project's session shape, and that the manual
  * salted join produces the identical result — the two mitigations
  * SURVEY §8 names for hot keys (AQE for joins at runtime, salting when
  * a key is too hot even for AQE or for aggregations). */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = graft.scale.SparkTestSession.spark

  // HALF the fact rows collapse onto key 0 with a fat payload (the hot
  // partition is ~5x the median, past the 2.0 skew factor); the rest
  // spread uniformly. dim is small but broadcast is disabled to force
  // the shuffle join AQE rewrites.
  private def skewedFact: DataFrame =
    spark.range(0, 200000).select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 1000).as("k"),
      concat(lit("payload-"), col("id"),
        lit("-" + "x" * 64)).as("payload"))

  private def dim: DataFrame =
    spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("dim-"), col("id")).as("name"))

  private def withConf[T](conf: Seq[(String, String)])(body: => T): T = {
    val old = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("AQE splits the skewed partition of a shuffle join at runtime") {
    withConf(Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val joined = skewedFact.join(dim, "k")
      // drive THIS DataFrame's queryExecution (count() would plan a
      // separate query and leave joined's adaptive plan unexecuted)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the adaptive plan:\n$plan")
    }
  }

  test("salted join is row-identical to the plain join on the skewed data") {
    withConf(Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val plain = skewedFact.join(dim, "k")
      val salted = graft.operators.Skew.saltedJoin(skewedFact, dim, "k",
        saltBuckets = 8)
        .select(plain.columns.map(col).toSeq: _*)
      assert(salted.count() == plain.count())
      assert(salted.exceptAll(plain).isEmpty &&
        plain.exceptAll(salted).isEmpty)
    }
  }
}
