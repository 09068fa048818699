package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The compressed layout's CODE-LEVEL fold ([[IvfPqIndex.compactTo]],
  * round 18): before it, IVF+PQ was the one maintained family whose
  * only history vacuum was a rebuild FROM SOURCE — raw embeddings the
  * index exists to not keep. The fold derives the current generation
  * purely from stored codes (main ∖ revised ∪ current-rev ∖ dead),
  * so it must be: result-invariant (serve before ≡ serve after),
  * geometry-restoring (one code file per cluster), the history vacuum
  * (epochs re-base to 0, CDC trees reset), generation-bumping (a
  * handle over the old dir refuses), and operable by the streaming
  * twin pin-aware. */
class IvfPqCompactSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$d/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  private def probe(dir: String, cents: org.apache.spark.sql.DataFrame) =
    IvfPqIndex.topK(spark, dir, emb.filter(col("vec_id") < 5), cents,
        k = 8, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
      .collect().toSeq

  private def lifecycle(dir: String,
      cents: org.apache.spark.sql.DataFrame): Unit = {
    IvfPqIndex.build(emb.filter(col("vec_id") % 5 =!= 4), cents, dir)
    IvfPqIndex.append(emb.filter(col("vec_id") % 5 === 4), cents, dir)
    val revised = emb.filter(col("vec_id") % 9 === 0)
      .withColumn("embedding", reverse(col("embedding")))
    IvfPqIndex.upsert(revised, cents, dir, rev = 1L)
    IvfPqIndex.delete(
      emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), dir)
  }

  test("compactTo folds CDC physically: serve-invariant, epoch re-base, " +
      "one file per cluster, CDC trees reset, generation bumped") {
    val cents = Similarity.strideCentroids(emb, 50).localCheckpoint()
    val dir = tmp("graft-pq-compact")
    lifecycle(dir, cents)
    assert(IvfPqIndex.committedEpoch(spark, dir) == 3L)
    val pre = probe(dir, cents)
    assert(pre.nonEmpty)
    val handle = IvfPqIndex.openHandle(spark, dir)
    Maintenance.compactInPlace(spark, dir,
      IvfPqIndex.compactTo(spark, _, _))
    // result-invariant: the fold changed bytes, never answers
    assert(probe(dir, cents) == pre,
      "fold diverged the served top-k — the code-level current-" +
        "generation derivation is wrong")
    // the fold is the history vacuum
    assert(IvfPqIndex.committedEpoch(spark, dir) == 0L)
    assert(IvfPqIndex.topKAsOf(spark, dir, emb.filter(col("vec_id") < 5),
        cents, k = 8, asOf = 0L, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
      .collect().toSeq == pre,
      "as-of(0) after the fold must equal the folded current state")
    // geometry restored: one code file per cluster dir
    val stats = IvfPqIndex.compactionStats(spark, dir)
    assert(stats.filesPerBucket <= 1.0,
      s"fold left ${stats.filesPerBucket} files per bucket")
    assert(!IvfPqIndex.needsCompaction(spark, dir))
    // the old directory's handle refuses — never an FNF loop
    assert(IvfPqIndex.isStale(spark, handle))
    intercept[StaleHandleException] {
      IvfPqIndex.topKWith(spark, handle, emb.filter(col("vec_id") < 5),
        cents, k = 8, nProbe = 3).collect()
    }
    // CDC verbs compose on the folded layout (fresh trees)
    IvfPqIndex.delete(Seq(pre.head.getLong(2)).toDF("vec_id"), dir)
    assert(IvfPqIndex.committedEpoch(spark, dir) == 1L)
    assert(probe(dir, cents) != pre)
  }

  test("the maintained PQ twin folds on geometry decay, skips under a " +
      "pin, and feed-bridges when given a feedDir") {
    val cents = Similarity.strideCentroids(emb, 1500).localCheckpoint()
    val dir = tmp("graft-pq-twin")
    IvfPqIndex.build(emb.filter(col("vec_id") < 320), cents, dir)
    (0 until 9).foreach { i =>
      IvfPqIndex.append(emb.filter(col("vec_id") >= 320 + i * 20 &&
        col("vec_id") < 340 + i * 20), cents, dir)
    }
    assert(IvfPqIndex.needsCompaction(spark, dir),
      "fixture must decay the cluster-file geometry")
    // a live pin blocks the fold (epoch keeps growing)
    val pins = SnapshotManifest.capture(spark, Seq(("pq", "ivfpq", dir)))
    SnapshotManifest.register(spark, pins, "pqrun")
    val ce = IvfPqIndex.committedEpoch(spark, dir)
    graft.streaming.IncrementalVectors.pqAppendBatchMaintained(
      dir, cents, compactEvery = 1L)(
      emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000L).as("vec_id"), col("embedding")),
      0L)
    assert(IvfPqIndex.committedEpoch(spark, dir) == ce + 1L,
      "pinned fold must be skipped (no re-base to 0)")
    // feedDir bridges: feed out through the pinned history, then fold.
    // The pin is at epoch 9 (build + 9 appends = ids 0..499); the
    // post-pin +1000 batch landed at epoch 10, so the feed-restore at
    // the pin must reconstruct exactly the 500 base ids — the epoch-0
    // baseline (ids < 320) plus the appended epochs' inserts — and
    // NOT the post-pin batch.
    val pinE = pins.head.epoch
    val feed = tmp("graft-pq-twin-feed")
    graft.streaming.IncrementalVectors.pqAppendBatchMaintained(
      dir, cents, compactEvery = 1L, feedDir = Some(feed))(
      emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 2000L).as("vec_id"), col("embedding")),
      0L)
    assert(IvfPqIndex.committedEpoch(spark, dir) == 0L,
      "with the feed bridge the fold must RUN (re-base to 0)")
    val feedRows = IvfPqIndex.changeFeed(spark, feed)
      .filter(col("e") <= pinE)
      .select(col("vec_id"), col("change"))
      .as[(Long, String)].collect().toSeq
    var live = emb.filter(col("vec_id") < 320).select(col("vec_id"))
      .as[Long].collect().toSet
    feedRows.foreach {
      case (id, "inserted") => live += id
      case (id, "deleted") => live -= id
      case _ => ()
    }
    val expected = emb.select(col("vec_id")).as[Long].collect().toSet
    assert(live == expected,
      "feed-restored membership at the pin must reconstruct the pinned " +
        "corpus (all base ids, none of the post-pin batch)")
  }
}
