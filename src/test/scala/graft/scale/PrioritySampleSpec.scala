package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q97 priority sampling: pinned against an independent JVM
  * reimplementation (MessageDigest md5 → 60-bit hash → double
  * priority), plus the prefix and weight-monotonicity properties that
  * make it a usable corpus-sampling primitive. */
class PrioritySampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  /** Independent replay: md5 hex → first 15 chars as long, priority =
    * w·2^60/(h+1) in doubles — no graft code involved. */
  private def refOrder(rows: Seq[(Long, Long, String)]): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { case (id, w, text) =>
      val hex = md.digest(text.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val p = w.toDouble * 1152921504606846976L.toDouble / (h + 1L).toDouble
      (id, p)
    }.sortBy { case (id, p) => (-p, id) }.map(_._1)
  }

  test("sample order matches the independent md5/priority replay") {
    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "n_chars", "text")
      .as[(Long, Long, String)].collect().toSeq
    val expect = refOrder(docs).take(100)
    val got = graft.operators.ScaleCatalogue.q97PrioritySample(spark, d)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got == expect)
  }

  test("top-k is a prefix of top-k' for k < k'") {
    val docs = graft.Tables.documents(spark, d)
    val k100 = graft.operators.ScaleCatalogue.prioritySample(docs, 100)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    val k150 = graft.operators.ScaleCatalogue.prioritySample(docs, 150)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(k150.take(100) == k100)
  }

  test("raising a document's weight can only improve its rank") {
    val docs = graft.Tables.documents(spark, d)
    val base = graft.operators.ScaleCatalogue.prioritySample(docs, 500)
      .select("rank", "doc_id").as[(Int, Long)].collect()
      .map(_.swap).toMap
    val boosted = graft.operators.ScaleCatalogue.prioritySample(
        docs.withColumn("n_chars",
          when(col("doc_id") === 42L, col("n_chars") * 10).otherwise(col("n_chars"))),
        500)
      .select("rank", "doc_id").as[(Int, Long)].collect()
      .map(_.swap).toMap
    assert(boosted(42L) <= base(42L),
      s"10x weight worsened rank: ${base(42L)} -> ${boosted(42L)}")
  }

  test("top-k plans as TakeOrderedAndProject, not a global-window sort") {
    val df = graft.operators.ScaleCatalogue.q97PrioritySample(spark, d)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected distributed top-k:\n$plan")
  }
}
