package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pin-aware maintenance (round-16 verdict item 1): the as-of matrix
  * and the auto-compaction loops compose UNSAFELY unless the fold
  * honors live [[SnapshotManifest]] pins — any twin's compactEvery
  * firing would silently vacuum the history a pinned training run
  * still reads. Pins here: (a) a registered pin BLOCKS
  * [[Maintenance.maybeCompact]] (history intact, pinned as-of serves
  * unchanged) and [[SnapshotManifest.release]] reopens the fold;
  * (b) the `emitFeedFirst` escape hatch emits the change feed through
  * the pinned history FIRST, and feed-restore reproduces the pinned
  * top-k hash-equal after the vacuum — the documented
  * [[SnapshotManifest]] escape hatch, made mechanical; (c) the IVF
  * streaming twin's rebuild fold skips under a pin too. */
class MaintenancePinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("text"))
  private def corpusA = docs.filter(col("doc_id") < 200)
  private def corpusB = docs.filter(col("doc_id") >= 200 && col("doc_id") < 300)
  private def qTerms = docs.filter(col("doc_id") === 1)
    .select(explode(split(col("text"), " ")).as("term"))
    .distinct().orderBy(col("term").asc).limit(8)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  private def probeAsOf(dir: String, e: Long): Seq[(Int, Long, Long, Long)] =
    BmIndex.topKAsOf(spark, dir, qTerms, k = 15, asOf = e)
      .as[(Int, Long, Long, Long)].collect().toSeq

  test("a registered pin blocks the fold; release reopens it") {
    val dir = tmp("graft-pin-block")
    BmIndex.build(corpusA, dir)                         // epoch 0
    BmIndex.append(corpusB, dir)                        // epoch 1
    val pins = SnapshotManifest.capture(spark, Seq(("lex", "bm", dir)))
    assert(pins.head.epoch == 1L)
    SnapshotManifest.register(spark, pins, "run1")
    assert(Maintenance.pinnedEpochs(spark, dir) == Seq(("run1", 1L)))
    val pre = probeAsOf(dir, 1L)
    val folded = Maintenance.maybeCompact(spark, dir, epochId = 0L,
      every = 1L, needs = true, BmIndex.compactTo(spark, _, _))
    assert(!folded, "fold ran under a live pin")
    assert(BmIndex.committedEpoch(spark, dir) == 1L,
      "blocked fold must leave the history untouched")
    assert(probeAsOf(dir, 1L) == pre,
      "pinned as-of read changed under a blocked fold")
    // a second pin from another run co-exists; releasing one keeps
    // the other's gate closed
    SnapshotManifest.register(spark, pins, "run2")
    SnapshotManifest.release(spark, pins, "run1")
    assert(Maintenance.pinnedEpochs(spark, dir) == Seq(("run2", 1L)))
    assert(!Maintenance.maybeCompact(spark, dir, 0L, 1L, needs = true,
      BmIndex.compactTo(spark, _, _)))
    // last release reopens the fold
    SnapshotManifest.release(spark, pins, "run2")
    assert(Maintenance.maybeCompact(spark, dir, 0L, 1L, needs = true,
      BmIndex.compactTo(spark, _, _)), "release did not reopen the fold")
    assert(BmIndex.committedEpoch(spark, dir) == 0L,
      "the fold is the history vacuum — epochs re-base to 0")
  }

  test("a pin registered DURING the fold build aborts the swap — " +
      "never silently vacuumed (round-17 advisor)") {
    val dir = tmp("graft-pin-race")
    BmIndex.build(corpusA, dir)                         // epoch 0
    BmIndex.append(corpusB, dir)                        // epoch 1
    val pins = SnapshotManifest.capture(spark, Seq(("lex", "bm", dir)))
    val pre = probeAsOf(dir, 1L)
    // the race: maybeCompact's pin check passes (no pins yet), then a
    // training run registers while compactTo is building the fold
    val folded = Maintenance.maybeCompact(spark, dir, epochId = 0L,
      every = 1L, needs = true,
      compactTo = (src, dst) => {
        BmIndex.compactTo(spark, src, dst)
        SnapshotManifest.register(spark, pins, "laterun")
      })
    assert(!folded,
      "fold published despite a pin registered during its build — the " +
        "last-instant re-check must abort the swap")
    assert(BmIndex.committedEpoch(spark, dir) == 1L,
      "aborted fold must leave the pinned history untouched")
    assert(probeAsOf(dir, 1L) == pre)
    // the aborted fold's temp dir must not leak
    val tmpFold = new org.apache.hadoop.fs.Path(dir + ".__compact")
    assert(!tmpFold.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(tmpFold), "aborted fold leaked its .__compact build")
    // release reopens the fold as usual
    SnapshotManifest.release(spark, pins, "laterun")
    assert(Maintenance.maybeCompact(spark, dir, 0L, 1L, needs = true,
      BmIndex.compactTo(spark, _, _)))
    assert(BmIndex.committedEpoch(spark, dir) == 0L)
  }

  test("a register whose mkdirs recreates the layout dir BETWEEN the " +
      "retire and publish renames aborts the fold — never a nested " +
      "mis-publish that vacuums the only complete copy (round-18 " +
      "advisor)") {
    val dir = tmp("graft-pin-nest")
    BmIndex.build(corpusA, dir)                         // epoch 0
    BmIndex.append(corpusB, dir)                        // epoch 1
    val pins = SnapshotManifest.capture(spark, Seq(("lex", "bm", dir)))
    val pre = probeAsOf(dir, 1L)
    val published = Maintenance.compactInPlace(spark, dir,
      BmIndex.compactTo(spark, _, _),
      betweenRenames = () =>
        // another PROCESS's register lands in the swap window: its
        // mkdirs recreates the layout dir the retire rename just
        // moved aside — the publish rename would nest INSIDE it
        SnapshotManifest.register(spark, pins, "midswap"))
    assert(!published,
      "the mis-publish must be detected and unwind to the abort shape")
    assert(BmIndex.committedEpoch(spark, dir) == 1L,
      "aborted fold must restore the pre-fold history")
    assert(probeAsOf(dir, 1L) == pre,
      "pinned as-of read changed across the aborted swap")
    assert(Maintenance.pinnedEpochs(spark, dir) == Seq(("midswap", 1L)),
      "the racing pin's marker must survive into the restored layout")
    val conf = spark.sessionState.newHadoopConf()
    Seq(".__compact", ".__retired").foreach { sfx =>
      val p = new org.apache.hadoop.fs.Path(dir + sfx)
      assert(!p.getFileSystem(conf).exists(p),
        s"aborted swap leaked $sfx")
    }
    // release reopens the fold and a clean publish verifies through
    SnapshotManifest.release(spark, pins, "midswap")
    assert(Maintenance.compactInPlace(spark, dir,
      BmIndex.compactTo(spark, _, _)))
    assert(BmIndex.committedEpoch(spark, dir) == 0L)
    assert(BmIndex.topK(spark, dir, qTerms, k = 15).count() > 0L)
  }

  test("emitFeedFirst bridges the vacuum: feed-restore reproduces the pinned top-k") {
    val dir = tmp("graft-pin-bridge")
    BmIndex.build(corpusA, dir)                         // epoch 0
    BmIndex.append(corpusB, dir)                        // epoch 1 — THE PIN
    val pins = SnapshotManifest.capture(spark, Seq(("lex", "bm", dir)))
    SnapshotManifest.register(spark, pins, "trainrun")
    val pinE = pins.head.epoch
    // history moves on past the pin
    BmIndex.delete(Seq(7L).toDF("doc_id"), dir)         // epoch 2
    val pre = probeAsOf(dir, pinE)
    // drive the maintained streaming body with decayed geometry so the
    // REAL needsCompaction probe fires: each append lands one file per
    // touched term bucket
    (0 until 8).foreach { i =>
      graft.streaming.IncrementalRetrieval.appendBatch(dir)(
        docs.filter(col("doc_id") >= 300 + i * 10 &&
          col("doc_id") < 310 + i * 10), i.toLong)      // epochs 3..10
    }
    assert(BmIndex.needsCompaction(spark, dir),
      "fixture must decay the geometry enough to trigger the probe")
    val feed = tmp("graft-pin-bridge-feed")
    graft.streaming.IncrementalRetrieval.appendBatchMaintained(
      dir, compactEvery = 1L, feedDir = Some(feed))(
      docs.filter(col("doc_id") >= 380 && col("doc_id") < 390), 0L)
    assert(BmIndex.committedEpoch(spark, dir) == 0L,
      "with the feed bridge the fold must RUN (history re-based to 0)")
    // feed-restore at the pinned epoch: baseline (epoch-0 corpus) +
    // replayed deltas ≤ pin ≡ the pinned membership; rebuilding over it
    // must reproduce the pinned top-k HASH-EQUAL (scores included)
    val feedRows = BmIndex.changeFeed(spark, feed)
      .filter(col("e") <= pinE)
      .as[(Long, String, Option[Long], Long)].collect().toSeq
    var live = corpusA.select(col("doc_id")).as[Long].collect().toSet
    feedRows.sortBy(_._4).foreach {
      case (id, "inserted", _, _) => live += id
      case (id, "deleted", _, _) => live -= id
      case (id, "revised", _, _) => ()
      case r => fail(s"malformed feed row $r")
    }
    val restored = tmp("graft-pin-bridge-restored")
    BmIndex.build(docs.filter(col("doc_id")
      .isin(live.toSeq: _*)), restored)
    assert(BmIndex.topK(spark, restored, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq == pre,
      "feed-restored pinned state diverged from the pre-fold as-of read")
  }

  test("IVF twin: the rebuild fold skips under a pin, runs after release") {
    def emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // TWO clusters (huge stride) so every append touches both bucket
    // dirs and files-per-bucket grows by one per append
    val cents = Similarity.strideCentroids(emb, stride = 1500)
      .localCheckpoint()
    val dir = tmp("graft-pin-ivf") + "/idx"
    IvfIndex.build(emb.filter(col("vec_id") < 320), cents, dir)
    (0 until 9).foreach { i =>
      IvfIndex.append(emb.filter(col("vec_id") >= 320 + i * 20 &&
        col("vec_id") < 340 + i * 20), cents, dir)
    }
    assert(IvfIndex.needsCompaction(spark, dir),
      "fixture must decay the cluster-file geometry")
    val pins = SnapshotManifest.capture(spark, Seq(("sem", "ivf", dir)))
    SnapshotManifest.register(spark, pins, "ivfrun")
    val ce = IvfIndex.committedEpoch(spark, dir)
    graft.streaming.IncrementalVectors.appendBatchMaintained(
      dir, cents, compactEvery = 1L)(
      emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000L).as("vec_id"), col("embedding")),
      0L)
    assert(IvfIndex.committedEpoch(spark, dir) == ce + 1L,
      "pinned rebuild must be skipped (history keeps growing, no " +
        "re-base to 0)")
    SnapshotManifest.release(spark, pins, "ivfrun")
    graft.streaming.IncrementalVectors.appendBatchMaintained(
      dir, cents, compactEvery = 1L)(
      emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 2000L).as("vec_id"), col("embedding")),
      0L)
    assert(IvfIndex.committedEpoch(spark, dir) == 0L,
      "released pin must let the rebuild fold run (re-base to 0)")
  }

  test("rebuild abortIf: a failed last-instant check discards the " +
      "built fold and leaves the live index untouched") {
    def emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.strideCentroids(emb, stride = 1500)
      .localCheckpoint()
    val dir = tmp("graft-rebuild-abort") + "/idx"
    IvfIndex.build(emb.filter(col("vec_id") < 200), cents, dir)
    IvfIndex.append(emb.filter(col("vec_id") >= 200 &&
      col("vec_id") < 250), cents, dir)                    // epoch 1
    val ce = IvfIndex.committedEpoch(spark, dir)
    val pre = IvfIndex.topK(spark, dir,
        emb.filter(col("vec_id") < 3), cents, k = 5)
      .collect().toSeq
    val published = IvfIndex.rebuild(spark, dir, cents,
      abortIf = () => Some("pin landed during the build (staged)"))
    assert(!published, "abortIf must stop the publish")
    assert(IvfIndex.committedEpoch(spark, dir) == ce,
      "aborted rebuild must not vacuum the history")
    assert(IvfIndex.topK(spark, dir, emb.filter(col("vec_id") < 3),
      cents, k = 5).collect().toSeq == pre)
    val residue = new org.apache.hadoop.fs.Path(dir + ".__rebuild")
    assert(!residue.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(residue), "aborted rebuild leaked its temp build")
    // and the clean path still publishes
    assert(IvfIndex.rebuild(spark, dir, cents))
    assert(IvfIndex.committedEpoch(spark, dir) == 0L)
  }

  test("IVF twin: feedDir bridges a pinned rebuild — feed out first, " +
      "then fold (round-17 advisor: the twin lacked the escape hatch)") {
    def emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.strideCentroids(emb, stride = 1500)
      .localCheckpoint()
    val dir = tmp("graft-pin-ivf-feed") + "/idx"
    IvfIndex.build(emb.filter(col("vec_id") < 320), cents, dir)
    (0 until 9).foreach { i =>
      IvfIndex.append(emb.filter(col("vec_id") >= 320 + i * 20 &&
        col("vec_id") < 340 + i * 20), cents, dir)
    }
    assert(IvfIndex.needsCompaction(spark, dir))
    val pins = SnapshotManifest.capture(spark, Seq(("sem", "ivf", dir)))
    SnapshotManifest.register(spark, pins, "ivffeedrun")
    val pinE = pins.head.epoch
    val preIds = IvfIndex.corpus(spark, dir).select(col("vec_id"))
      .as[Long].collect().toSet
    val feed = tmp("graft-pin-ivf-feed-out")
    graft.streaming.IncrementalVectors.appendBatchMaintained(
      dir, cents, compactEvery = 1L, feedDir = Some(feed))(
      emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 3000L).as("vec_id"), col("embedding")),
      0L)
    assert(IvfIndex.committedEpoch(spark, dir) == 0L,
      "with the feed bridge the pinned rebuild must RUN (re-base to 0)")
    // the feed covers the pinned history: replaying deltas ≤ pin over
    // the epoch-0 BASELINE (the feed contract — epoch 0 is the build's
    // own membership, never emitted) reproduces the pinned membership;
    // the batch appended above landed at pinE+1, so it must NOT
    // appear ≤ pinE
    val feedRows = IvfIndex.changeFeed(spark, feed)
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
    assert(live == preIds,
      "feed-restored membership at the pin diverged from the pre-fold " +
        "corpus — the bridge does not cover the pinned history")
  }
}
