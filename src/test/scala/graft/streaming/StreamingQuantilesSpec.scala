package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.scale.{Sketch, SparkTestSession}

/** Streaming rank-quantile profile: batch ≡ stream as exact frame
  * equality (the KMV union is exact, so the streamed state after any
  * micro-batch sequence IS the batch sketch of everything streamed),
  * epoch-replay no-op, bounded state, crash-safe pointer flip. */
class StreamingQuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
    .select(col("lang"), col("n_chars"), col("doc_id"))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("streamed state equals the batch sketch of everything streamed; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("graft-squant") + "/state"
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamingQuantiles.run(
      mem.toDF().toDF("lang", "n_chars", "doc_id"),
      dir, "lang", "n_chars", "doc_id", k = 64,
      checkpoint = tmp("graft-squant-ckpt"))
    try {
      val rows = docs.as[(String, Long, Long)].collect().toSeq
      val (b1, rest) = rows.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    // batch ≡ stream: EXACT state equality, not estimate agreement
    val streamed = StreamingQuantiles.sample(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet
    val batch = Sketch.rankSample(docs, "lang", "n_chars", "doc_id", k = 64)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed == batch, "streamed KMV state != batch sketch")

    // estimates flow through the same algebra
    val est = StreamingQuantiles.quantiles(spark, dir, Seq(50))
      .as[(String, Long, Long)].collect().toSet
    val want = Sketch.rankQuantilesOf(
        Sketch.rankSample(docs, "lang", "n_chars", "doc_id", k = 64), Seq(50))
      .as[(String, Long, Long)].collect().toSet
    assert(est == want)

    // bounded state: ≤ k rows per group
    val perGroup = StreamingQuantiles.sample(spark, dir)
      .groupBy(col("g")).count().as[(String, Long)].collect()
    assert(perGroup.forall(_._2 <= 64), s"state overflowed k: $perGroup")

    // epoch replay (crash between state flip and checkpoint commit):
    // re-merging an already-merged batch must not change the state
    StreamingQuantiles.mergeBatch(dir, "lang", "n_chars", "doc_id", 64)(
      docs.limit(100), 999L)
    val replayed = StreamingQuantiles.sample(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(replayed == streamed, "epoch replay changed the state")

    // exactly one state dir survives (superseded epochs vacuumed)
    val dirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sample-"))
    assert(dirs.length == 1, s"vacuum left residue: ${dirs.toSeq}")
  }

  test("empty store serves empty state and empty estimates (cold start)") {
    val dir = tmp("graft-squant-cold") + "/state"
    assert(StreamingQuantiles.sample(spark, dir).isEmpty)
    assert(StreamingQuantiles.quantiles(spark, dir).isEmpty)
  }

  test("pointer publish is atomic: a pointer exists at every instant, crash residue is benign") {
    // round-14 advice item 3: the old single-`_current` flip deleted
    // the pointer before renaming the new one in — a crash in that
    // window lost ALL accumulated state (next merge read empty, then
    // vacuumed the orphaned previous dir). The numbered-pointer layout
    // must (a) never have zero pointers after the first merge, (b)
    // survive a staged crash-between-publish-and-GC (two pointers, two
    // state dirs) by serving the max pointer, and (c) read a legacy
    // single-`_current` store unchanged, then migrate it on merge.
    val dir = tmp("graft-squant-atomic") + "/state"
    def merge(epoch: Long, n: Int): Unit =
      StreamingQuantiles.mergeBatch(dir, "lang", "n_chars", "doc_id", 64)(
        docs.limit(n), epoch)
    merge(1L, 100)
    val f = new java.io.File(dir)
    def pointers = f.listFiles().toSeq
      .filter(_.getName.startsWith("_current-")).sortBy(_.getName)
    assert(pointers.length == 1, s"want one numbered pointer: $pointers")
    val s1 = StreamingQuantiles.sample(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet

    // staged crash: a second merge published its pointer but died
    // before GC — fabricate the residue by re-creating the superseded
    // state dir and a LOWER-seq pointer to it
    val ghost = new java.io.File(dir, "sample-0-ghost")
    ghost.mkdirs()
    StreamingQuantiles.sample(spark, dir).limit(1).write
      .mode("overwrite").parquet(ghost.toString)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_current-0000000000000000000"),
      "sample-0-ghost".getBytes)
    // readers take the MAX pointer — the ghost is invisible
    assert(StreamingQuantiles.sample(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet == s1,
      "reader followed a stale lower-seq pointer")
    // the next merge GCs the residue and keeps exactly one of each
    merge(2L, 200)
    assert(pointers.length == 1, s"stale pointer survived GC: $pointers")
    assert(!ghost.exists(), "superseded ghost state dir survived GC")

    // legacy layout: only a single `_current` file (pre round-14 store)
    val legacy = tmp("graft-squant-legacy") + "/state"
    StreamingQuantiles.mergeBatch(legacy, "lang", "n_chars", "doc_id", 64)(
      docs.limit(100), 1L)
    val lf = new java.io.File(legacy)
    val numbered = lf.listFiles().filter(_.getName.startsWith("_current-"))
    val stateName = new String(java.nio.file.Files.readAllBytes(
      numbered.head.toPath)).trim
    numbered.foreach(_.delete())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(legacy, "_current"), stateName.getBytes)
    val legacyState = StreamingQuantiles.sample(spark, legacy)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(legacyState.nonEmpty, "legacy single-_current store unreadable")
    // merge migrates: numbered pointer appears, legacy file removed
    StreamingQuantiles.mergeBatch(legacy, "lang", "n_chars", "doc_id", 64)(
      docs.limit(100), 2L)
    assert(lf.listFiles().exists(_.getName.startsWith("_current-")))
    assert(!new java.io.File(legacy, "_current").exists(),
      "legacy pointer not cleaned up after migration")
  }
}
