package graft.scale

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: interleave correctness (column vs driver twins),
  * the box-in-interval bound the serving read relies on, and the
  * measured claim — a z-clustered parquet table serves an axis-aligned
  * box read from a strict subset of its files. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("column zValue equals the driver-side twin on the corpus buckets") {
    val rows = graft.Tables.events(spark, d)
      .select(pmod(col("user_id"), lit(256L)).as("x"),
        pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("y"))
      .withColumn("z", Layout.zValue(col("x"), col("y")))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (x, y, z) =>
      assert(z == Layout.zValueOf(x, y), s"mismatch at ($x,$y)")
    }
  }

  test("interleave is spread(x) + 2*spread(y): monotone, so boxes map into [z(lo),z(hi)]") {
    for (x <- 0L to 63L; y <- 0L to 63L) {
      val z = Layout.zValueOf(x, y)
      assert(z == Layout.zValueOf(x, 0) + Layout.zValueOf(0, y))
      if (x > 0) assert(Layout.zValueOf(x - 1, y) < z)
      if (y > 0) assert(Layout.zValueOf(x, y - 1) < z)
    }
    val (zlo, zhi) = Layout.zRange(16, 31, 32, 63)
    for (x <- 16L to 31L; y <- 32L to 63L) {
      val z = Layout.zValueOf(x, y)
      assert(z >= zlo && z <= zhi)
    }
  }

  test("zIntervals is an EXACT cover: z in intervals <=> (x,y) in box") {
    // exhaustive over a 6-bit space, randomized boxes (fixed seed)
    val rnd = new scala.util.Random(7)
    val bits = 6
    val side = 1L << bits
    for (_ <- 1 to 25) {
      val (a, b) = (rnd.nextInt(side.toInt).toLong, rnd.nextInt(side.toInt).toLong)
      val (c, e) = (rnd.nextInt(side.toInt).toLong, rnd.nextInt(side.toInt).toLong)
      val (xlo, xhi) = (math.min(a, b), math.max(a, b))
      val (ylo, yhi) = (math.min(c, e), math.max(c, e))
      val ivs = Layout.zIntervals(xlo, xhi, ylo, yhi, bits)
      // disjoint, sorted, non-adjacent (fully merged)
      ivs.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1)
        case _ =>
      }
      val inIvs = (0L until side * side).filter(z =>
        ivs.exists { case (lo, hi) => z >= lo && z <= hi }).toSet
      val inBox = (for (x <- xlo to xhi; y <- ylo to yhi)
        yield Layout.zValueOf(x, y, bits)).toSet
      assert(inIvs == inBox, s"cover wrong for [$xlo,$xhi]x[$ylo,$yhi]")
      // tight cover never exceeds the coarse interval
      val (zlo, zhi) = Layout.zRange(xlo, xhi, ylo, yhi, bits)
      assert(ivs.head._1 >= zlo && ivs.last._2 <= zhi)
    }
  }

  test("zIntervalsK is an EXACT cover at k=3: z in intervals <=> (x,y,w) in box") {
    // exhaustive over a 4-bit 3-D space, randomized boxes (fixed seed)
    val rnd = new scala.util.Random(11)
    val bits = 4
    val side = 1 << bits
    for (_ <- 1 to 20) {
      def range() = {
        val (a, b) = (rnd.nextInt(side).toLong, rnd.nextInt(side).toLong)
        (math.min(a, b), math.max(a, b))
      }
      val dims = Seq.fill(3)(range())
      val (lo, hi) = (dims.map(_._1), dims.map(_._2))
      val ivs = Layout.zIntervalsK(lo, hi, bits)
      ivs.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1, "not fully merged")
        case _ =>
      }
      val inIvs = (0L until (1L << (3 * bits))).filter(z =>
        ivs.exists { case (l, h) => z >= l && z <= h }).toSet
      val inBox = (for {
        x <- lo(0) to hi(0); y <- lo(1) to hi(1); w <- lo(2) to hi(2)
      } yield Layout.zValueOfK(Seq(x, y, w), bits)).toSet
      assert(inIvs == inBox, s"3-D cover wrong for $lo..$hi")
    }
    // column twin agrees with the driver twin at k=3
    val rows = graft.Tables.events(spark, d)
      .select(pmod(col("user_id"), lit(16L)).as("x"),
        pmod(expr("unix_millis(ts) div 60000"), lit(16L)).as("y"),
        pmod(col("event_id"), lit(16L)).as("w"))
      .withColumn("z",
        Layout.zValueK(Seq(col("x"), col("y"), col("w")), bits))
      .limit(2000)
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (x, y, w, z) =>
      assert(z == Layout.zValueOfK(Seq(x, y, w), bits),
        s"k=3 column/driver mismatch at ($x,$y,$w)")
    }
    // the 2-D API is EXACTLY the k=2 case — no on-disk drift
    for (x <- 0L to 63L; y <- 0L to 63L)
      assert(Layout.zValueOf(x, y) == Layout.zValueOfK(Seq(x, y)))
  }

  test("k=3 layout: write, tight box read via boxScanTightK, lifecycle verbs compose") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-z3").resolve("z").toString
    val rows = (0L until 512L)
      .map(i => (i, i % 8L, (i / 8L) % 8L, (i / 64L) % 8L))
      .toDF("id", "x", "y", "w")
    val keys = Seq(col("x"), col("y"), col("w"))
    Layout.writeZOrderedK(rows.filter(col("id") < 300L), keys, base,
      bucketWidth = 32L, bits = 3)
    Layout.appendZOrderedK(rows.filter(col("id") >= 300L), keys, base,
      bucketWidth = 32L, bits = 3)
    // revision moves a row in all three dims (bucket migration)
    Layout.upsertZOrderedK(Seq((5L, 7L, 7L, 7L)).toDF("id", "x", "y", "w"),
      "id", keys, base, rev = 1L, bucketWidth = 32L, bits = 3)
    Layout.deleteZOrdered(Seq(6L).toDF("id"), "id", base)
    val served = Layout.readCurrent(spark, base, "id")
    val got = Layout.boxScanTightK(served, Seq(2L, 2L, 2L), Seq(7L, 7L, 7L),
        bucketWidth = 32L, bits = 3)
      .select(col("id")).as[Long].collect().toSet
    val truth = (0L until 512L).flatMap { i =>
      val (x0, y0, w0) =
        if (i == 5L) (7L, 7L, 7L) else (i % 8L, (i / 8L) % 8L, (i / 64L) % 8L)
      if (i != 6L && x0 >= 2 && y0 >= 2 && w0 >= 2) Some(i) else None
    }.toSet
    assert(got == truth,
      "k=3 tight box read over the CDC-composed layout diverged")
  }

  test("z-clustered layout serves a box read from a strict subset of files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder")
      .resolve("events_z").toString
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(256L)).as("xb"),
        pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))
    Layout.writeZOrdered(ev, col("xb"), col("yb"), dir)

    val zdf = spark.read.parquet(dir)
    // sf0.001 user ids span 0..14, so the x band must sit inside that
    val box = Layout.boxScan(zdf, col("xb"), col("yb"), 4, 7, 32, 63)
    box.collect()

    // correctness: identical to the brute filter with no z machinery
    val brute = ev.filter(col("xb").between(4, 7) && col("yb").between(32, 63))
      .select("event_id").as[Long].collect().toSet
    assert(box.select("event_id").as[Long].collect().toSet == brute)
    assert(brute.nonEmpty, "box landed on no rows — test data drifted")

    // pruning: the bucket-range filter must be a PARTITION filter and
    // keep the scan off most bucket directories
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case other => other.children.flatMap(scans)
      }
    val scan = scans(box.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("events_z")))
      .getOrElse(fail("no file scan over the z layout"))
    assert(scan.partitionFilters.exists(_.toString.contains("z_bucket")),
      s"bucket range must be a partition filter, got ${scan.partitionFilters}")
    val scanned = scan.metrics("numFiles").value
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val written = walk(new java.io.File(dir))
      .count(_.getName.endsWith(".parquet"))
    assert(written >= 4, s"layout produced only $written files")
    assert(scanned > 0 && scanned < written,
      s"box read not pruned: scanned $scanned of $written z-sorted files")

    // the tight (exact-cover) scan: same rows WITHOUT residual
    // per-dimension predicates, bucket pruning at least as good
    val tight = Layout.boxScanTight(zdf, 4, 7, 32, 63)
    assert(tight.select("event_id").as[Long].collect().toSet == brute)
    val tightScan = scans(tight.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("events_z")))
      .getOrElse(fail("no file scan in tight box read"))
    assert(tightScan.partitionFilters.exists(_.toString.contains("z_bucket")))
    assert(tightScan.metrics("numFiles").value <= scanned)
  }

  test("tight box read bounds its bucket predicate on fine-grained layouts") {
    // bucketWidth 64 → 1024 possible bucket dirs: a large box would
    // enumerate hundreds-to-thousands of bucket ids; past
    // MaxEnumeratedBuckets the filter must state merged ranges instead
    val dir = java.nio.file.Files.createTempDirectory("graft-ztight")
      .resolve("events_z").toString
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(256L)).as("xb"),
        pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))
    Layout.writeZOrdered(ev, col("xb"), col("yb"), dir, bucketWidth = 64L)
    val zdf = spark.read.parquet(dir)

    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case other => other.children.flatMap(scans)
      }
    def partitionFilterStr(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      val scan = scans(df.queryExecution.executedPlan)
        .find(_.relation.location.rootPaths.exists(_.toString.contains("events_z")))
        .getOrElse(fail("no file scan over the z layout"))
      assert(scan.partitionFilters.exists(_.toString.contains("z_bucket")),
        s"bucket predicate must stay a partition filter: ${scan.partitionFilters}")
      (scan, scan.partitionFilters.map(_.toString).mkString(";"))._2
    }

    // full box: the naive list would be all 1024 bucket ids
    val full = Layout.boxScanTight(zdf, 0, 255, 0, 255, bucketWidth = 64L)
    val allRows = ev.select("event_id").as[Long].collect().toSet
    assert(full.select("event_id").as[Long].collect().toSet == allRows)
    val pfFull = partitionFilterStr(full)
    assert(pfFull.length < 1000,
      s"unbounded bucket predicate (${pfFull.length} chars): ${pfFull.take(120)}…")

    // quarter box (y band): >100 bucket ids → range form, still pruned
    val quarter = Layout.boxScanTight(zdf, 0, 255, 0, 63, bucketWidth = 64L)
    val brute = ev.filter(col("yb").between(0, 63))
      .select("event_id").as[Long].collect().toSet
    assert(brute.nonEmpty && brute != allRows, "fixture box not selective")
    assert(quarter.select("event_id").as[Long].collect().toSet == brute)
    val pfQuarter = partitionFilterStr(quarter)
    assert(pfQuarter.length < 1000,
      s"unbounded bucket predicate: ${pfQuarter.take(120)}…")
    val scan = scans(quarter.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("events_z")))
      .get
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val written = walk(new java.io.File(dir))
      .count(_.getName.endsWith(".parquet"))
    val scanned = scan.metrics("numFiles").value
    assert(scanned > 0 && scanned < written,
      s"range-form bucket filter did not prune: $scanned of $written")

    // a small box still takes the enumerated isin path — same results
    // as the per-dimension brute filter
    val small = Layout.boxScanTight(zdf, 4, 7, 32, 63, bucketWidth = 64L)
    val bruteSmall = ev.filter(col("xb").between(4, 7) && col("yb").between(32, 63))
      .select("event_id").as[Long].collect().toSet
    assert(small.select("event_id").as[Long].collect().toSet == bruteSmall)
  }

  test("appendZOrdered grows the layout in place; reads see old+new pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zappend")
      .resolve("events_z").toString
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(256L)).as("xb"),
        pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))
    val (oldHalf, newHalf) =
      (ev.filter(col("event_id") % 2 === 0), ev.filter(col("event_id") % 2 === 1))
    Layout.writeZOrdered(oldHalf, col("xb"), col("yb"), dir)
    Layout.appendZOrdered(newHalf, col("xb"), col("yb"), dir)

    val zdf = spark.read.parquet(dir)
    val box = Layout.boxScan(zdf, col("xb"), col("yb"), 4, 7, 32, 63)
    val brute = ev.filter(col("xb").between(4, 7) && col("yb").between(32, 63))
      .select("event_id").as[Long].collect().toSet
    // mixed provenance: both halves contribute rows to the box
    val got = box.select("event_id").as[Long].collect().toSet
    assert(got == brute)
    assert(got.exists(_ % 2 == 0) && got.exists(_ % 2 == 1),
      "append test box must draw from both the base and appended half")
  }

  test("compactZOrderedTo folds appended small files to one per bucket; reads identical") {
    val base = java.nio.file.Files.createTempDirectory("graft-zcompact")
    val dir = base.resolve("events_z").toString
    val dest = base.resolve("events_z_c").toString
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(256L)).as("xb"),
        pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))
    Layout.writeZOrdered(ev.filter(col("event_id") % 3 === 0),
      col("xb"), col("yb"), dir)
    Layout.appendZOrdered(ev.filter(col("event_id") % 3 === 1),
      col("xb"), col("yb"), dir)
    Layout.appendZOrdered(ev.filter(col("event_id") % 3 === 2),
      col("xb"), col("yb"), dir)

    def filesPerBucket(path: String): Map[String, Int] = {
      val root = new java.io.File(path)
      root.listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("z_bucket="))
        .map(b => b.getName ->
          b.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val before = filesPerBucket(dir)
    assert(before.values.exists(_ >= 3),
      s"fixture should have append-decayed buckets, got $before")

    Layout.compactZOrderedTo(spark, dir, dest)
    val after = filesPerBucket(dest)
    assert(after.keySet == before.keySet, "compaction changed the bucket set")
    assert(after.values.forall(_ == 1),
      s"compaction must leave one file per bucket, got $after")

    // identical rows AND identical box-read results through both paths
    val all = spark.read.parquet(dir)
      .select("event_id", "xb", "yb", "z", "z_bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val allC = spark.read.parquet(dest)
      .select("event_id", "xb", "yb", "z", "z_bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(allC == all, "compaction changed layout contents")
    val boxC = Layout.boxScanTight(spark.read.parquet(dest), 4, 7, 32, 63)
      .select("event_id").as[Long].collect().toSet
    val brute = ev.filter(col("xb").between(4, 7) && col("yb").between(32, 63))
      .select("event_id").as[Long].collect().toSet
    assert(boxC == brute, "box read over the compacted layout diverged")

    // in-file z runs restored: each compacted file is fully z-sorted
    // (small file = one read partition, so collect preserves file order)
    new java.io.File(dest).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("z_bucket="))
      .flatMap(_.listFiles().filter(_.getName.endsWith(".parquet")))
      .foreach { f =>
        val zs = spark.read.parquet(f.toString).select("z")
          .as[Long].collect().toSeq
        assert(zs == zs.sorted, s"compacted file ${f.getName} not z-sorted")
      }
  }

  test("upsertZOrdered: revised rows serve from their NEW bucket; compaction folds") {
    val base = java.nio.file.Files.createTempDirectory("graft-zupsert")
    val dir = base.resolve("events_z").toString
    val dest = base.resolve("events_z_c").toString
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(256L)).as("xb"),
        pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))
    Layout.writeZOrdered(ev, col("xb"), col("yb"), dir)
    // user ids only span a few xb values at this sf — shift yb, which
    // covers the full 0..255 range, so rows cross boundaries both ways
    val revised = ev.filter(col("event_id") % 9 === 0)
      .withColumn("yb", pmod(col("yb") + lit(128L), lit(256L)))
    Layout.upsertZOrdered(revised, "event_id", col("xb"), col("yb"),
      dir, rev = 1L)

    // bucket migration across the two trees
    val migrated = spark.read.parquet(dir)
      .filter(col("event_id") % 9 === 0)
      .select(col("event_id"), col("z_bucket").as("ob"))
      .join(spark.read.parquet(s"$dir/_z_rev_rows")
        .select(col("event_id"), col("z_bucket").as("nb")), "event_id")
      .filter(col("ob") =!= col("nb")).count()
    assert(migrated > 0, "no revised row changed bucket — weak fixture")

    // box read over readCurrent equals the brute filter on REVISED data
    val revEv = ev.withColumn("yb",
      when(col("event_id") % 9 === 0, pmod(col("yb") + lit(128L), lit(256L)))
        .otherwise(col("yb")))
    def brute(b: (Int, Int, Int, Int)) = revEv
      .filter(col("xb").between(b._1, b._2) && col("yb").between(b._3, b._4))
      .select("event_id").as[Long].collect().toSet
    def got(path: String, b: (Int, Int, Int, Int)) = Layout
      .boxScanTight(Layout.readCurrent(spark, path, "event_id"),
        b._1, b._2, b._3, b._4)
      .select("event_id").as[Long].collect().toSet
    // y half-space: the +128 shift moves every revised row across it
    val box = (0, 255, 0, 127)
    assert(got(dir, box) == brute(box),
      "box read over the revised layout diverged from the revised truth")
    // rows crossed the boundary BOTH ways (in and out of the box)
    val before = ev.filter(col("xb").between(0, 255) &&
      col("yb").between(0, 127)).select("event_id").as[Long].collect().toSet
    assert((brute(box) -- before).nonEmpty && (before -- brute(box)).nonEmpty,
      "weak fixture: revision moved no rows across the box boundary")

    // replay heal + monotone refusal
    val rowsBefore = spark.read.parquet(s"$dir/_z_rev_rows").count()
    Layout.upsertZOrdered(revised, "event_id", col("xb"), col("yb"),
      dir, rev = 1L)
    assert(spark.read.parquet(s"$dir/_z_rev_rows").count() == rowsBefore,
      "upsert replay duplicated revision rows")
    Layout.upsertZOrdered(ev.filter(col("event_id") % 9 === 0), "event_id",
      col("xb"), col("yb"), dir, rev = 2L)
    assert(got(dir, box) == before,
      "rev-2 restore must restore the original box results")
    intercept[IllegalArgumentException] {
      Layout.upsertZOrdered(revised, "event_id", col("xb"), col("yb"),
        dir, rev = 1L)
    }
    Layout.upsertZOrdered(revised, "event_id", col("xb"), col("yb"),
      dir, rev = 3L)

    // revision-folding compaction: dest carries no registry, same reads
    Layout.compactZOrderedTo(spark, dir, dest,
      foldRevisionsBy = Some("event_id"))
    assert(!new java.io.File(s"$dest/_z_rev").exists() &&
      !new java.io.File(s"$dest/_z_rev_rows").exists())
    assert(got(dest, box) == brute(box),
      "revision-folding compaction changed box results")
    assert(spark.read.parquet(dest).count() == ev.count(),
      "folded layout must hold exactly one generation per row")
  }

  test("full CDC lifecycle with deleteZOrdered: tombstones reach both trees, fold required (q172)") {
    val base = java.nio.file.Files.createTempDirectory("graft-zcdc")
    val dir = base.resolve("events_z").toString
    val dest = base.resolve("events_z_c").toString
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(256L)).as("xb"),
        pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))
    Layout.writeZOrdered(ev.filter(col("event_id") % 3 === 0),
      col("xb"), col("yb"), dir)
    (1 to 2).foreach { i =>
      Layout.appendZOrdered(ev.filter(col("event_id") % 3 === i),
        col("xb"), col("yb"), dir)
    }
    val revised = ev.filter(col("event_id") % 9 === 0)
      .withColumn("yb", pmod(col("yb") + lit(128L), lit(256L)))
    Layout.upsertZOrdered(revised, "event_id", col("xb"), col("yb"),
      dir, rev = 1L)
    Layout.deleteZOrdered(
      ev.filter(col("event_id") % 7 === 0).select(col("event_id")),
      "event_id", dir)
    // replayed take-down is a no-op on the tombstone table
    val tombsBefore = spark.read.parquet(s"$dir/_z_tombs").count()
    Layout.deleteZOrdered(
      ev.filter(col("event_id") % 7 === 0).select(col("event_id")),
      "event_id", dir)
    assert(spark.read.parquet(s"$dir/_z_tombs").count() == tombsBefore,
      "delete replay duplicated tombstones")

    // serving truth: revised survivors only — a %63 id proves the
    // tombstone reached the REVISION tree, a plain %7 id the main tree
    val truth = ev.withColumn("yb",
        when(col("event_id") % 9 === 0,
          pmod(col("yb") + lit(128L), lit(256L)))
          .otherwise(col("yb")))
      .filter(col("event_id") % 7 =!= 0)
      .select("event_id").as[Long].collect().toSet
    def served(path: String) = Layout
      .boxScanTight(Layout.readCurrent(spark, path, "event_id"),
        0, 255, 0, 255)
      .select("event_id").as[Long].collect().toSet
    assert(served(dir) == truth,
      "post-delete serving diverged from the revised-survivor truth")
    assert(ev.filter(col("event_id") % 63 === 0).count() > 0,
      "weak fixture: no victim had a revised generation")

    // the scale claim: a bounded box read through the CDC-carrying
    // readCurrent (union + two broadcast anti-joins) still pushes the
    // z_bucket range as a PARTITION filter into BOTH trees
    val boxed = Layout.boxScanTight(
      Layout.readCurrent(spark, dir, "event_id"), 16, 31, 32, 63)
    boxed.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case other => other.children.flatMap(scans)
      }
    // the registry (_z_rev) and tombstones (_z_tombs) are O(revised)/
    // O(deleted) broadcast sides — no bucket filter expected there
    val layoutScans = scans(boxed.queryExecution.executedPlan).filter(s =>
      s.relation.location.rootPaths.exists(_.toString.contains("events_z")) &&
        !s.relation.location.rootPaths.exists(p =>
          p.toString.endsWith("_z_rev") || p.toString.endsWith("_z_tombs")))
    val (revScans, mainScans) = layoutScans.partition(
      _.relation.location.rootPaths.exists(_.toString.contains("_z_rev_rows")))
    assert(mainScans.nonEmpty && revScans.nonEmpty,
      "box read must scan both the main and the revision tree")
    (mainScans ++ revScans).foreach { sc =>
      assert(sc.partitionFilters.exists(_.toString.contains("z_bucket")),
        s"bucket range must stay a partition filter through readCurrent: " +
          s"${sc.relation.location.rootPaths.headOption} -> ${sc.partitionFilters}")
    }

    // geometry-only compaction of a CDC-carrying layout refuses loudly
    intercept[IllegalArgumentException] {
      Layout.compactZOrderedTo(spark, dir, dest)
    }
    // the fold serves identically and carries no CDC residue
    Layout.compactZOrderedTo(spark, dir, dest,
      foldRevisionsBy = Some("event_id"))
    assert(!new java.io.File(s"$dest/_z_tombs").exists() &&
      !new java.io.File(s"$dest/_z_rev").exists())
    assert(served(dest) == truth, "folded CDC layout changed the serve")
  }
}
