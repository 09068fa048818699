package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.{Similarity, SparkTestSession}

class RewriteHofVectorOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofQuery() = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .filter(col("vec_id") < 50)
    .select(col("vec_id"),
      Similarity.dotHof(col("embedding"), col("embedding")).as("d"))

  test("HOF dot-product pattern rewrites to native dot_f, bit-equal") {
    val base = hofQuery().as[(Long, Double)].collect().toMap
    spark.experimental.extraOptimizations = Seq(RewriteHofVectorOps)
    try {
      val rewritten = hofQuery()
      val opt = rewritten.queryExecution.optimizedPlan.toString
      assert(opt.contains("dot_f"),
        s"HOF pattern not rewritten to DotProductF:\n$opt")
      assert(!opt.contains("aggregate("),
        s"interpreted ArrayAggregate survived the rewrite:\n$opt")
      assert(rewritten.as[(Long, Double)].collect().toMap == base)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("HOF squared-distance pattern rewrites to native dist2_f, bit-equal") {
    def query() = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 30)
      .crossJoin(spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(col("vec_id") === 31).select(col("embedding").as("e2")))
      .select(col("vec_id"), aggregate(
        zip_with(col("embedding"), col("e2"),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v).as("d2"))
    val base = query().as[(Long, Double)].collect().toMap
    spark.experimental.extraOptimizations = Seq(RewriteHofVectorOps)
    try {
      val rewritten = query()
      val opt = rewritten.queryExecution.optimizedPlan.toString
      assert(opt.contains("dist2_f"),
        s"squared-diff HOF not rewritten to L2Dist2F:\n$opt")
      assert(rewritten.as[(Long, Double)].collect().toMap == base)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("non-canonical folds are left untouched") {
    spark.experimental.extraOptimizations = Seq(RewriteHofVectorOps)
    try {
      // zero != 0.0 → not a dot product; must NOT rewrite
      val shifted = spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(col("vec_id") < 5)
        .select(aggregate(
          zip_with(col("embedding"), col("embedding"),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(1.0), (acc, v) => acc + v).as("d"))
      val opt = shifted.queryExecution.optimizedPlan.toString
      assert(!opt.contains("dot_f"), s"over-eager rewrite:\n$opt")
      // and a sum-of-squares via different structure still evaluates fine
      assert(shifted.as[Double].collect().forall(_ > 1.0))
    } finally spark.experimental.extraOptimizations = Nil
  }
}
