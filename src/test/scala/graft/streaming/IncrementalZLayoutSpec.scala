package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.scale.{Layout, SparkTestSession}

/** Streaming z-order ingest: batch ≡ stream at the layout level (same
  * rows, same pruned box-read results), epoch replay is a no-op, and
  * compaction serves identically afterwards. */
class IncrementalZLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def ev = graft.Tables.events(spark, d)
    .select(col("event_id"),
      pmod(col("user_id"), lit(256L)).as("xb"),
      pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("z").toString

  test("streamed layout equals the batch layout; replay no-op; box reads identical; compaction serves") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("graft-zstream")
    val mem = MemoryStream[(Long, Long, Long)]
    val q = IncrementalZLayout.run(
      mem.toDF().toDF("event_id", "xb", "yb"),
      dir, "event_id", col("xb"), col("yb"),
      checkpoint = tmp("graft-zstream-ckpt"))
    try {
      val rows = ev.as[(Long, Long, Long)].collect().toSeq
      val (b1, rest) = rows.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    // batch ≡ stream: identical row SET to a one-shot batch write
    def rowsOf(path: String) = spark.read.parquet(path)
      .select("event_id", "xb", "yb", "z", "z_bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batchDir = tmp("graft-zstream-ref")
    Layout.writeZOrdered(ev, col("xb"), col("yb"), batchDir)
    assert(rowsOf(dir) == rowsOf(batchDir),
      "streamed layout diverged from the batch layout")

    // epoch replay (crash between append and checkpoint commit): the
    // idempotent append leaves the layout untouched
    val before = spark.read.parquet(dir).count()
    IncrementalZLayout.appendBatch(dir, "event_id",
      col("xb"), col("yb"))(ev.limit(200), 999L)
    assert(spark.read.parquet(dir).count() == before,
      "epoch replay duplicated rows")

    // pruned box reads over the streamed layout equal brute force
    val brute = ev.filter(col("xb").between(4, 7) && col("yb").between(32, 63))
      .select("event_id").as[Long].collect().toSet
    val boxed = Layout.boxScanTight(spark.read.parquet(dir), 4, 7, 32, 63)
      .select("event_id").as[Long].collect().toSet
    assert(boxed == brute, "box read over the streamed layout diverged")

    // maintenance: compaction after the stream serves identically
    val dest = tmp("graft-zstream-compact")
    Layout.compactZOrderedTo(spark, dir, dest)
    assert(rowsOf(dest) == rowsOf(dir), "compaction changed streamed contents")
    assert(Layout.boxScanTight(spark.read.parquet(dest), 4, 7, 32, 63)
      .select("event_id").as[Long].collect().toSet == brute)
  }

  test("streamed take-downs: tombstoned ids leave readCurrent; replay no-op") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("graft-zstream-del")
    Layout.writeZOrdered(ev, col("xb"), col("yb"), dir)
    val mem = MemoryStream[Long]
    val q = IncrementalZLayout.runDeletes(
      mem.toDF().toDF("event_id"), dir, "event_id",
      checkpoint = tmp("graft-zstream-del-ckpt"))
    val victims = ev.filter(col("event_id") % 7 === 0)
      .select("event_id").as[Long].collect().toSeq
    try {
      val (v1, v2) = victims.splitAt(victims.length / 2)
      mem.addData(v1: _*); q.processAllAvailable()
      mem.addData(v2: _*); q.processAllAvailable()
    } finally q.stop()
    val served = Layout.readCurrent(spark, dir, "event_id")
      .select("event_id").as[Long].collect().toSet
    assert(served == ev.filter(col("event_id") % 7 =!= 0)
      .select("event_id").as[Long].collect().toSet,
      "streamed take-down diverged from the survivor set")
    // committed-replay is a no-op on the tombstone table
    val before = spark.read.parquet(s"$dir/_z_tombs").count()
    IncrementalZLayout.deleteBatch(dir, "event_id")(
      victims.toDF("event_id"), 99L)
    assert(spark.read.parquet(s"$dir/_z_tombs").count() == before,
      "take-down replay duplicated tombstones")
  }

  test("streamed revisions: moved keys re-home their bucket; epoch replay heals") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("graft-zstream-rev")
    Layout.writeZOrdered(ev, col("xb"), col("yb"), dir)
    val mem = MemoryStream[(Long, Long, Long)]
    val q = IncrementalZLayout.runRevisions(
      mem.toDF().toDF("event_id", "xb", "yb"), dir, "event_id",
      col("xb"), col("yb"), checkpoint = tmp("graft-zstream-rev-ckpt"))
    // two revision waves: the same %9 slice moves yb twice — the
    // SECOND epoch's generation must win
    val r1 = ev.filter(col("event_id") % 9 === 0)
      .withColumn("yb", pmod(col("yb") + lit(128L), lit(256L)))
      .as[(Long, Long, Long)].collect().toSeq
    val r2 = ev.filter(col("event_id") % 9 === 0)
      .withColumn("yb", pmod(col("yb") + lit(64L), lit(256L)))
      .as[(Long, Long, Long)].collect().toSeq
    try {
      mem.addData(r1: _*); q.processAllAvailable()
      mem.addData(r2: _*); q.processAllAvailable()
    } finally q.stop()
    val truth = ev.withColumn("yb",
        when(col("event_id") % 9 === 0, pmod(col("yb") + lit(64L), lit(256L)))
          .otherwise(col("yb")))
      .select("event_id", "xb", "yb")
      .as[(Long, Long, Long)].collect().toSet
    def served() = Layout.readCurrent(spark, dir, "event_id")
      .select("event_id", "xb", "yb")
      .as[(Long, Long, Long)].collect().toSet
    assert(served() == truth,
      "streamed revisions diverged from the latest-generation truth")
    // epoch replay (same epochId → same rev) is a pure heal
    val rowsBefore = spark.read.parquet(s"$dir/_z_rev_rows").count()
    IncrementalZLayout.upsertBatch(dir, "event_id",
      col("xb"), col("yb"))(r2.toDF("event_id", "xb", "yb"), 1L)
    assert(spark.read.parquet(s"$dir/_z_rev_rows").count() == rowsBefore &&
      served() == truth, "epoch replay changed the layout")
  }

  test("partial-commit heal: a torn append completes on replay without duplicates") {
    // stage the tear: append half a batch's rows manually (as if some
    // bucket files committed and the epoch then died), then replay the
    // FULL batch — the anti-join must append exactly the missing rows
    val dir = tmp("graft-ztear")
    val all = ev.limit(300)
    IncrementalZLayout.appendBatch(dir, "event_id",
      col("xb"), col("yb"))(all.filter(col("event_id") % 2 === 0), 0L)
    IncrementalZLayout.appendBatch(dir, "event_id",
      col("xb"), col("yb"))(all, 0L) // replay of the "full" epoch
    val got = spark.read.parquet(dir).select("event_id")
      .as[Long].collect().sorted.toSeq
    val want = all.select("event_id").as[Long].collect().sorted.toSeq
    assert(got == want,
      "torn-append replay must complete the epoch exactly once per row")
  }
}
