package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot (as-of) serving on the IVF+PQ code index — the sixth
  * family, under BOTH frozen artifacts at once (coarse centroids and
  * stored codebooks): [[IvfPqIndex.topKAsOf]] gates main code rows by
  * their id's commit epoch, revisions by the registry at ≤ asOf,
  * deletions by the tombstones at ≤ asOf. Every epoch is pinned
  * against a fresh index built over that epoch's corpus under the
  * SAME centroids and codebooks; the next [[IvfPqIndex.build]] from
  * source is the history vacuum. */
class IvfPqAsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private lazy val centroids =
    Similarity.strideCentroids(emb, stride = 50).localCheckpoint()
  // both frozen artifacts are trained once over the FULL corpus and
  // shared by the lifecycle index and every ground-truth build — codes
  // are only comparable under identical codebooks
  private lazy val codebooks =
    Similarity.pqInitCodebooks(emb).localCheckpoint()
  private def corpusA = emb.filter(col("vec_id") % 2 === 0)
  private def corpusB = emb.filter(col("vec_id") % 2 === 1)
  private def queries = emb.filter(col("vec_id").isin(1L, 2L))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  private def probeAsOf(dir: String, e: Long): Seq[(Long, Int, Long)] =
    IvfPqIndex.topKAsOf(spark, dir, queries, centroids, k = 5, asOf = e)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long)].collect().toSeq

  private def want(corpus: DataFrame): Seq[(Long, Int, Long)] = {
    val w = tmp("graft-pq-asof-want")
    IvfPqIndex.build(corpus, centroids, w, codebooks = Some(codebooks))
    IvfPqIndex.topK(spark, w, queries, centroids, k = 5)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long)].collect().toSeq
  }

  test("time travel: topKAsOf replays every epoch's exact ADC serve") {
    val dir = tmp("graft-pq-asof")
    IvfPqIndex.build(corpusA, centroids, dir,
      codebooks = Some(codebooks))                       // epoch 0
    assert(IvfPqIndex.committedEpoch(spark, dir) == 0L)
    IvfPqIndex.append(corpusB, centroids, dir)           // epoch 1
    val e1 = probeAsOf(dir, 1L)
    assert(e1.nonEmpty, "fixture produced no neighbors at epoch 1")
    val tgt = e1.map(_._3).distinct.head
    val vic = e1.map(_._3).distinct.find(_ != tgt)
      .getOrElse(e1.map(_._3).head)
    val revised = emb.filter(col("vec_id") === tgt)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    IvfPqIndex.upsert(revised, centroids, dir, rev = 1L) // epoch 2
    IvfPqIndex.delete(Seq(vic).toDF("vec_id"), dir)      // epoch 3
    assert(IvfPqIndex.committedEpoch(spark, dir) == 3L)

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
    assert(probeAsOf(dir, 3L) ==
      IvfPqIndex.topK(spark, dir, queries, centroids, k = 5)
        .select(col("query_id"), col("rank"), col("vec_id"))
        .orderBy("query_id", "rank")
        .as[(Long, Int, Long)].collect().toSeq,
      "as-of the committed epoch must be the current serve")
    assert(probeAsOf(dir, 0L) != probeAsOf(dir, 1L),
      "the append left no trace in the snapshot history")
    intercept[IllegalArgumentException] {
      IvfPqIndex.topKAsOf(spark, dir, queries, centroids, 5, asOf = 4L)
    }
    intercept[IllegalArgumentException] {
      IvfPqIndex.topKAsOf(spark, dir, queries, centroids, 5, asOf = -1L)
    }
    // a fresh build from source is the history vacuum
    val survivors = revisedCorpus.filter(col("vec_id") =!= vic)
    IvfPqIndex.build(survivors, centroids, dir, codebooks = Some(codebooks))
    assert(IvfPqIndex.committedEpoch(spark, dir) == 0L)
    assert(probeAsOf(dir, 0L) == want(survivors),
      "rebuilt epoch 0 must serve the folded final state")
    intercept[IllegalArgumentException] {
      IvfPqIndex.topKAsOf(spark, dir, queries, centroids, 5, asOf = 1L)
    }
  }

  test("torn append serves the predecessor state until the replay completes it") {
    val dir = tmp("graft-pq-asof-torn")
    IvfPqIndex.build(corpusA, centroids, dir,
      codebooks = Some(codebooks))                       // epoch 0
    val mirror = tmp("graft-pq-asof-mirror")
    copyDir(dir, mirror)
    IvfPqIndex.append(corpusB, centroids, mirror)
    copyDir(s"$mirror/_pq_docs", s"$dir/_pq_docs")
    assert(IvfPqIndex.committedEpoch(spark, dir) == 1L)
    assert(probeAsOf(dir, 1L) == probeAsOf(dir, 0L),
      "phantom registry rows served code rows that never landed")
    assert(probeAsOf(dir, 0L) == want(corpusA))
    IvfPqIndex.append(corpusB, centroids, dir)
    assert(IvfPqIndex.committedEpoch(spark, dir) == 1L)
    assert(probeAsOf(dir, 1L) == want(corpusA.unionByName(corpusB)),
      "healed batch's snapshot diverged from a fresh build")
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
