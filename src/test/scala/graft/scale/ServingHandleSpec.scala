package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The long-lived IVF serving handle ([[IvfIndex.open]] +
  * [[IvfIndex.topKWith]]): at nlist ∝ corpus, a fresh
  * `spark.read.parquet` per probe re-lists every cluster dir — a
  * per-read job the 100× scale point measured at 13.5× probe growth
  * from listing alone (bench_scale.json r17). The handle lists once.
  * Pins: handle probes are RESULT-identical to the path-based probe
  * (CDC state included — the handle caches only the main tree's
  * listing, never the CDC side tables), and the probe's cluster
  * partition filter survives in the handle plan. */
class ServingHandleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$d/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("handle probes ≡ path probes through the full CDC lifecycle; pruning survives") {
    val cents = Similarity.strideCentroids(emb, stride = 50)
      .localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-serving-handle").toString + "/idx"
    IvfIndex.build(emb.filter(col("vec_id") < 400), cents, dir)
    val handle = IvfIndex.open(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
    def viaPath() = IvfIndex.topK(spark, dir, queries, cents, k = 5)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    def viaHandle() = IvfIndex
      .topKWith(spark, handle, dir, queries, cents, k = 5)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(viaHandle() == viaPath(), "handle diverged on the built index")
    // CDC verbs mutate the SIDE tables — the handle must keep serving
    // exactly (it caches the main tree's listing only)
    IvfIndex.upsert(emb.filter(col("vec_id") === 1)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding")),
      cents, dir, rev = 1L)
    IvfIndex.delete(Seq(2L).toDF("vec_id"), dir)
    assert(viaHandle() == viaPath(),
      "handle diverged after upsert + delete — CDC state must never " +
        "bind to the cached listing")
    // the as-of twin serves history identically through the handle
    // (CDC trees are separate dirs — the cached main listing stays
    // complete under upsert/delete)
    def asOfVia(h: Option[org.apache.spark.sql.DataFrame]) = (h match {
      case Some(hd) => IvfIndex.topKAsOfWith(spark, hd, dir, queries,
        cents, k = 5, asOf = 2L)
      case None => IvfIndex.topKAsOf(spark, dir, queries, cents,
        k = 5, asOf = 2L)
    }).orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(asOfVia(Some(handle)) == asOfVia(None),
      "as-of handle diverged from the path-based snapshot read")
    // the pruned plan: the partition filter binds at planning, so the
    // cached file index still prunes
    val df = IvfIndex.topKWith(spark, handle, dir, queries, cents, k = 5)
    df.collect()
    def scans(plan: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      plan match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case p => p.children.flatMap(scans)
      }
    val idxScan = scans(df.queryExecution.executedPlan)
      .find(s => s.relation.location.rootPaths
        .exists(_.toString.contains("graft-serving-handle")) &&
        s.partitionFilters.nonEmpty)
      .getOrElse(fail("no partition-filtered scan through the handle"))
    assert(idxScan.partitionFilters.exists(_.toString.contains("cluster_id")))
  }
}
