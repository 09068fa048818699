package graft.scale

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot (as-of) reads + change data feed on the z-order layout —
  * the SEVENTH family, closing the time-travel matrix: `_z_docs`
  * (id→epoch, written FIRST by the idempotent append), epoch stamps
  * on `_z_rev`/`_z_tombs`, [[Layout.readCurrentAsOf]] gating all
  * three, and [[Layout.emitChangeFeed]] deriving per-epoch id-level
  * deltas post-hoc at O(affected). Pins: every epoch ≡ a model
  * replay, current ≡ as-of(committed), the feed's restore contract
  * (baseline state + replayed deltas ≡ final state), feed
  * idempotence, and compaction as the history vacuum. */
class ZAsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("z").toString

  private val W = 64L // bucketWidth
  private val B = 4   // bits

  private def base = (0L until 64L).map(i => (i, i % 16L, i / 16L))
  private def appended = (100L until 116L).map(i => (i, i % 16L, 15L))

  private def build(dir: String): Unit = {
    Layout.writeZOrdered(base.toDF("id", "x", "y"),
      col("x"), col("y"), dir, W, B)                     // epoch 0
    Layout.appendZOrderedIdempotentK(appended.toDF("id", "x", "y"),
      "id", Seq(col("x"), col("y")), dir, W, B)          // epoch 1
    Layout.upsertZOrdered(
      Seq((3L, 9L, 3L), (100L, 1L, 2L)).toDF("id", "x", "y"),
      "id", col("x"), col("y"), dir, rev = 1L, W, B)     // epoch 2
    Layout.deleteZOrdered(Seq(5L, 101L).toDF("id"), "id", dir) // epoch 3
  }

  private def rowsAsOf(dir: String, e: Long): Set[(Long, Long, Long)] =
    Layout.readCurrentAsOf(spark, dir, "id", e)
      .select(col("id"), col("x"), col("y"))
      .as[(Long, Long, Long)].collect().toSet

  // the pure model of each epoch's state
  private def model(e: Long): Set[(Long, Long, Long)] = {
    var m = base.map(t => t._1 -> (t._2, t._3)).toMap
    if (e >= 1) m ++= appended.map(t => t._1 -> (t._2, t._3)).toMap
    if (e >= 2) m ++= Map(3L -> ((9L, 3L)), 100L -> ((1L, 2L)))
    if (e >= 3) m --= Seq(5L, 101L)
    m.map { case (id, (x, y)) => (id, x, y) }.toSet
  }

  test("time travel: readCurrentAsOf replays every epoch; current = as-of(committed)") {
    val dir = tmp("graft-z-asof")
    build(dir)
    assert(Layout.committedEpoch(spark, dir, "id") == 3L)
    (0L to 3L).foreach { e =>
      assert(rowsAsOf(dir, e) == model(e),
        s"as-of epoch $e diverged from the model replay")
    }
    assert(rowsAsOf(dir, 3L) ==
      Layout.readCurrent(spark, dir, "id")
        .select(col("id"), col("x"), col("y"))
        .as[(Long, Long, Long)].collect().toSet,
      "as-of the committed epoch must be the current serve")
    intercept[IllegalArgumentException] {
      Layout.readCurrentAsOf(spark, dir, "id", 4L)
    }
    intercept[IllegalArgumentException] {
      Layout.readCurrentAsOf(spark, dir, "id", -1L)
    }
    // compaction is the explicit vacuum: history folds to epoch 0
    val dest = tmp("graft-z-asof-cmp")
    Layout.compactZOrderedTo(spark, dir, dest,
      foldRevisionsBy = Some("id"))
    assert(Layout.committedEpoch(spark, dest, "id") == 0L)
    assert(rowsAsOf(dest, 0L) == model(3L),
      "compacted epoch 0 must serve the pre-compaction final state")
    intercept[IllegalArgumentException] {
      Layout.readCurrentAsOf(spark, dest, "id", 1L)
    }
  }

  test("box reads over the as-of view keep the z_bucket partition filter") {
    val dir = tmp("graft-z-asof-plan")
    build(dir)
    val df = Layout.boxScanTight(
      Layout.readCurrentAsOf(spark, dir, "id", asOf = 3L),
      xlo = 0, xhi = 7, ylo = 0, yhi = 7, bucketWidth = W, bits = B)
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
    // the MAIN layout scan (not the narrow registry side tables) must
    // carry the bucket filter — the box predicate pushes through the
    // epoch-gate joins and the rev-union
    val mainScans = scans(df.queryExecution.executedPlan)
      .filter(s => s.relation.location.rootPaths
        .exists(p => p.toString.contains("graft-z-asof-plan") &&
          !p.toString.contains("_z_")))
    assert(mainScans.nonEmpty, "no scan over the main layout in the plan")
    assert(mainScans.exists(_.partitionFilters
        .exists(_.toString.contains("z_bucket"))),
      s"z_bucket partition filter lost through the as-of view:\n" +
        mainScans.map(_.partitionFilters).mkString("; "))
  }

  test("change feed: per-epoch deltas restore the final state; emission self-heals") {
    val dir = tmp("graft-z-feed")
    build(dir)
    val feed = tmp("graft-z-feed-out")
    Layout.emitChangeFeed(spark, dir, "id", feed)
    val rows = Layout.changeFeed(spark, feed)
      .select(col("id"), col("change"), col("rev"), col("e"))
      .as[(Long, String, Option[Long], Long)].collect().toSeq
    assert(rows.map(_._4).toSet == Set(1L, 2L, 3L),
      "feed must cover exactly epochs 1..committed")
    assert(rows.filter(_._4 == 1L).map(r => (r._1, r._2)).toSet ==
      appended.map(t => (t._1, "inserted")).toSet,
      "epoch 1 must emit exactly the appended ids")
    assert(rows.filter(_._4 == 2L).map(r => (r._1, r._2)).toSet ==
      Set((3L, "revised"), (100L, "revised")))
    assert(rows.filter(_._4 == 3L).map(r => (r._1, r._2)).toSet ==
      Set((5L, "deleted"), (101L, "deleted")))
    // restore contract: baseline membership/revision state + replayed
    // deltas in epoch order ≡ the as-of state at the committed epoch
    var live = rowsAsOf(dir, 0L).map(_._1)
    var revs = Map.empty[Long, Long]
    rows.sortBy(_._4).foreach {
      case (id, "inserted", _, _) => live += id
      case (id, "revised", Some(r), _) =>
        revs += id -> r; live += id // upsert doubles as insert
      case (id, "deleted", _, _) => live -= id
      case r => fail(s"malformed feed row $r")
    }
    val finalRows = rowsAsOf(dir, 3L)
    assert(live == finalRows.map(_._1),
      "baseline + replayed deltas diverged from the final membership")
    // the replayed revision state matches the layout's registry
    val reg = spark.read.parquet(s"$dir/_z_rev")
      .groupBy(col("id")).agg(max(col("rev")).as("rev"))
      .as[(Long, Long)].collect().toMap
    assert(revs == reg,
      "replayed revision state diverged from the registry")
    // derived emission is idempotent: a second call writes nothing new
    val n0 = Layout.changeFeed(spark, feed).count()
    Layout.emitChangeFeed(spark, dir, "id", feed)
    assert(Layout.changeFeed(spark, feed).count() == n0,
      "feed re-emission duplicated epochs")
  }

  test("torn append: phantom registry rows serve nothing and emit nothing until healed") {
    val dir = tmp("graft-z-asof-torn")
    Layout.writeZOrdered(base.toDF("id", "x", "y"),
      col("x"), col("y"), dir, W, B)                     // epoch 0
    // stage the docs-first tear on a mirror, copy back ONLY _z_docs
    val mirror = tmp("graft-z-asof-mirror")
    copyDir(dir, mirror)
    Layout.appendZOrderedIdempotentK(appended.toDF("id", "x", "y"),
      "id", Seq(col("x"), col("y")), mirror, W, B)
    copyDir(s"$mirror/_z_docs", s"$dir/_z_docs")
    assert(Layout.committedEpoch(spark, dir, "id") == 1L)
    assert(rowsAsOf(dir, 1L) == rowsAsOf(dir, 0L),
      "phantom registry rows served data that never landed")
    // the feed HALTS at the phantom epoch (round-16 advice item 2):
    // an eagerly-pinned empty e=1 dir would freeze the hole forever —
    // the heal lands data at the SAME stamp and re-emission resumes
    // past done.max, never revisiting it
    val feed = tmp("graft-z-asof-torn-feed")
    Layout.emitChangeFeed(spark, dir, "id", feed)
    assert(!IndexIo.exists(spark, s"$feed/e=1"),
      "phantom epoch must not emit a dir until the heal")
    // the replay completes the batch AT the residue's stamped epoch
    Layout.appendZOrderedIdempotentK(appended.toDF("id", "x", "y"),
      "id", Seq(col("x"), col("y")), dir, W, B)
    assert(Layout.committedEpoch(spark, dir, "id") == 1L)
    assert(rowsAsOf(dir, 1L) == model(1L),
      "healed batch's snapshot diverged from the model")
    // re-emission now emits the healed epoch's full insert set — the
    // restore contract bridges the tear
    Layout.emitChangeFeed(spark, dir, "id", feed)
    assert(Layout.changeFeed(spark, feed)
      .filter(col("e") === 1L && col("change") === "inserted")
      .select(col("id")).as[Long].collect().toSet ==
      appended.map(_._1).toSet,
      "healed epoch's feed must carry its inserts")
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
