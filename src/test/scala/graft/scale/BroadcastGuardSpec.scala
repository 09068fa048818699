package graft.scale

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 advice item 3: CDC serving reads join the main tree
  * against revision registries / tombstone sets that are bounded by
  * COMPACTION DISCIPLINE, not by construction — between compactions
  * they grow without limit, and a forced `broadcast()` hint (which
  * AQE will not demote) turns a lazy compaction schedule into a
  * driver/executor OOM at 100 TB. [[IndexIo.maybeBroadcast]] gates
  * the hint on the optimizer's size estimate vs the session's
  * auto-broadcast threshold. This spec pins: (1) the hint applies
  * while the registry is small, (2) it is withheld past the
  * threshold and the join plans as a non-broadcast join, (3) both
  * plans are result-identical, and (4) a source-level grep gate that
  * no unbounded-registry broadcast is ever forced again. */
class BroadcastGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("z").toString

  private def planOf(df: DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  private def zRows(dir: String): Seq[(Long, Long, Long)] =
    Layout.readCurrent(spark, dir, "id")
      .select(col("id"), col("x"), col("y"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("z-layout CDC read: hint under the threshold, plain join past it, rows identical") {
    val dir = tmp("graft-bguard")
    val base = (0L until 64L).map(i => (i, i % 16L, i / 16L))
      .toDF("id", "x", "y")
    Layout.writeZOrdered(base, col("x"), col("y"), dir,
      bucketWidth = 64L, bits = 4)
    Layout.upsertZOrdered(Seq((3L, 9L, 3L)).toDF("id", "x", "y"), "id",
      col("x"), col("y"), dir, rev = 1L, bucketWidth = 64L, bits = 4)
    Layout.deleteZOrdered(Seq(5L).toDF("id"), "id", dir)

    // small registry (1 rev row, 1 tombstone): the hint applies and
    // the composed read carries broadcast joins
    val hinted = Layout.readCurrent(spark, dir, "id")
    val expected = zRows(dir)
    assert(expected.exists { case (id, x, _) => id == 3L && x == 9L } &&
      !expected.exists(_._1 == 5L), "CDC composition broken before the plan test")
    val p1 = planOf(hinted)
    assert(p1.contains("BroadcastHashJoin") || p1.contains("BroadcastExchange"),
      s"small registry should broadcast:\n$p1")

    // past the threshold (disabled = everything is past it): the hint
    // is withheld, the join strategy flips, rows stay identical
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val guarded = Layout.readCurrent(spark, dir, "id")
      val got = guarded.select(col("id"), col("x"), col("y"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == expected,
        "guarded (non-broadcast) plan changed the served rows")
      val p2 = planOf(guarded)
      assert(!p2.contains("BroadcastHashJoin") &&
        !p2.contains("BroadcastExchange"),
        s"guard must withhold the hint past the threshold:\n$p2")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("maybeBroadcast is the estimate-vs-threshold gate, not an unconditional hint") {
    val dir = Files.createTempDirectory("graft-bguard-unit").toString
    (0L until 1000L).map(i => (i, i * 2L)).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$dir/t")
    val t = spark.read.parquet(s"$dir/t")
    // under the default 10 MB threshold: hinted
    val hinted = IndexIo.maybeBroadcast(t.select(col("k")))
    val j1 = t.join(hinted.withColumnRenamed("k", "k2"),
      col("k") === col("k2"))
    assert(planOf(j1).contains("BroadcastExchange"),
      "small side under the threshold must carry the hint")
    // a 1-byte threshold: every estimate exceeds it — no hint, and
    // with auto-broadcast effectively off the join cannot broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try {
      val guarded = IndexIo.maybeBroadcast(t.select(col("k")))
      val j2 = t.join(guarded.withColumnRenamed("k", "k2"),
        col("k") === col("k2"))
      val p = planOf(j2)
      assert(!p.contains("BroadcastExchange"),
        s"estimate past the threshold must not hint:\n$p")
      assert(j2.count() == j1.count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("grep gate: no CDC registry/tombstone broadcast is forced anywhere in scale/") {
    // the unbounded-between-compactions tables are the rev registries
    // (reg/cr/revs/me/cur) and tombstone sets; a forced broadcast on
    // any of them reintroduces the OOM this round removed
    val root = java.nio.file.Paths.get("src/main/scala/graft/scale")
    assume(java.nio.file.Files.isDirectory(root), "source tree not visible")
    val banned = Seq("broadcast(reg", "broadcast(cr", "broadcast(revs",
      "broadcast(me)", "broadcast(cur", "broadcast(tombstones")
    import scala.jdk.CollectionConverters._
    val hits = java.nio.file.Files.list(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        banned.filter(text.contains).map(b => s"${p.getFileName}: $b")
      }.toList
    assert(hits.isEmpty,
      s"forced broadcast on an unbounded CDC table: ${hits.mkString(", ")}")
  }
}
