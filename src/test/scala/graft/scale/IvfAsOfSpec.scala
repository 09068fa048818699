package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot (as-of) serving on the IVF vector index — the fifth index
  * family gains time travel (round-15 verdict item 1: "the embedding
  * index is precisely the one a 'run X used ANN state E' audit asks
  * about"). Machinery: an id→epoch registry (`_ivf_docs`, written
  * FIRST by append so a tear leaves harmless phantom rows, never
  * epoch-0-reading data), epoch stamps on tombstones and the revision
  * registry, and [[IvfIndex.topKAsOf]] gating all three under the
  * probe's partition filter. Every epoch is pinned against a FRESH
  * index built over that epoch's corpus under the SAME frozen
  * centroids; the staged tear serves the predecessor state until the
  * replay completes it; [[IvfIndex.rebuild]] is the history vacuum. */
class IvfAsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private lazy val centroids =
    Similarity.strideCentroids(emb, stride = 50).localCheckpoint()
  private def corpusA = emb.filter(col("vec_id") % 2 === 0)
  private def corpusB = emb.filter(col("vec_id") % 2 === 1)
  private def queries = emb.filter(col("vec_id").isin(1L, 2L))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  private def probeAsOf(dir: String, e: Long): Seq[(Long, Int, Long, Double)] =
    IvfIndex.topKAsOf(spark, dir, queries, centroids, k = 5, asOf = e)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq

  /** Ground truth for one epoch state: a fresh index over exactly that
    * corpus under the same frozen centroids. */
  private def want(corpus: DataFrame): Seq[(Long, Int, Long, Double)] = {
    val w = tmp("graft-ivf-asof-want")
    IvfIndex.build(corpus, centroids, w)
    IvfIndex.topK(spark, w, queries, centroids, k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
  }

  test("time travel: topKAsOf replays every epoch's exact ANN serve") {
    val dir = tmp("graft-ivf-asof")
    IvfIndex.build(corpusA, centroids, dir)              // epoch 0
    assert(IvfIndex.committedEpoch(spark, dir) == 0L)
    IvfIndex.append(corpusB, centroids, dir)             // epoch 1
    // CDC targets picked from the epoch-1 serve so the revision and
    // the take-down observably change history
    val e1 = probeAsOf(dir, 1L)
    assert(e1.nonEmpty, "fixture produced no neighbors at epoch 1")
    val tgt = e1.map(_._3).distinct.head
    val vic = e1.map(_._3).distinct.find(_ != tgt)
      .getOrElse(e1.map(_._3).head)
    // epoch 2: revise tgt's embedding (reversed components — its
    // nearest centroid may move, which is the hard case)
    val revised = emb.filter(col("vec_id") === tgt)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    IvfIndex.upsert(revised, centroids, dir, rev = 1L)   // epoch 2
    IvfIndex.delete(Seq(vic).toDF("vec_id"), dir)        // epoch 3
    assert(IvfIndex.committedEpoch(spark, dir) == 3L)

    val both = corpusA.unionByName(corpusB)
    val revisedCorpus = both.filter(col("vec_id") =!= tgt)
      .unionByName(revised)
    assert(probeAsOf(dir, 0L) == want(corpusA),
      "as-of epoch 0 diverged from a fresh build over corpus A")
    assert(probeAsOf(dir, 1L) == want(both),
      "as-of epoch 1 diverged from a fresh build over A+B")
    assert(probeAsOf(dir, 2L) == want(revisedCorpus),
      "as-of epoch 2 diverged from a fresh build over the revised corpus")
    assert(probeAsOf(dir, 3L) ==
      want(revisedCorpus.filter(col("vec_id") =!= vic)),
      "as-of epoch 3 diverged from a fresh build over the survivors")
    // as-of the committed epoch IS the current serve
    assert(probeAsOf(dir, 3L) ==
      IvfIndex.topK(spark, dir, queries, centroids, k = 5)
        .orderBy("query_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq)
    // the verbs are VISIBLE in history
    assert(probeAsOf(dir, 0L) != probeAsOf(dir, 1L),
      "the append left no trace in the snapshot history")
    // outside the committed history: loud refusal both ways
    intercept[IllegalArgumentException] {
      IvfIndex.topKAsOf(spark, dir, queries, centroids, 5, asOf = 4L)
    }
    intercept[IllegalArgumentException] {
      IvfIndex.topKAsOf(spark, dir, queries, centroids, 5, asOf = -1L)
    }
    // rebuild is the explicit vacuum: history folds to epoch 0
    IvfIndex.rebuild(spark, dir, centroids)
    assert(IvfIndex.committedEpoch(spark, dir) == 0L)
    assert(probeAsOf(dir, 0L) ==
      want(revisedCorpus.filter(col("vec_id") =!= vic)),
      "rebuilt epoch 0 must serve the pre-rebuild final state")
    intercept[IllegalArgumentException] {
      IvfIndex.topKAsOf(spark, dir, queries, centroids, 5, asOf = 1L)
    }
  }

  test("as-of probe stays partition-pruned: the cluster filter survives the epoch gates") {
    val dir = tmp("graft-ivf-asof-plan")
    IvfIndex.build(corpusA, centroids, dir)
    IvfIndex.append(corpusB, centroids, dir)
    val df = IvfIndex.topKAsOf(spark, dir, queries, centroids, k = 5,
      asOf = 1L)
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
        .exists(_.toString.contains("graft-ivf-asof-plan")) &&
        s.partitionFilters.nonEmpty)
      .getOrElse(fail("no partition-filtered scan over the index — " +
        "the epoch gates must not strip the probe's cluster pruning"))
    assert(idxScan.partitionFilters.exists(_.toString.contains("cluster_id")))
  }

  test("torn append serves the predecessor state until the replay completes it") {
    val dir = tmp("graft-ivf-asof-torn")
    IvfIndex.build(corpusA, centroids, dir)              // epoch 0
    // stage the docs-first tear: registry rows land (stamped e=1),
    // the data files never
    val mirror = tmp("graft-ivf-asof-mirror")
    copyDir(dir, mirror)
    IvfIndex.append(corpusB, centroids, mirror)
    copyDir(s"$mirror/_ivf_docs", s"$dir/_ivf_docs")
    // phantom registry rows advance the counter but gate in nothing
    assert(IvfIndex.committedEpoch(spark, dir) == 1L)
    assert(probeAsOf(dir, 1L) == probeAsOf(dir, 0L),
      "phantom registry rows served data that never landed")
    assert(probeAsOf(dir, 0L) == want(corpusA))
    // the replay completes the batch AT the residue's stamped epoch
    // (the registry anti-join re-stamps nothing)
    IvfIndex.append(corpusB, centroids, dir)
    assert(IvfIndex.committedEpoch(spark, dir) == 1L)
    assert(probeAsOf(dir, 1L) == want(corpusA.unionByName(corpusB)),
      "healed batch's snapshot diverged from a fresh build")
    assert(probeAsOf(dir, 0L) == want(corpusA))
  }

  private def copyDir(from: String, to: String): Unit = {
    val src = java.nio.file.Paths.get(from)
    val dst = java.nio.file.Paths.get(to)
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else {
        java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }
}
