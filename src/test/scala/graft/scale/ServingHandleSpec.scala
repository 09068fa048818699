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

  private def scansOf(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    plan match {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansOf(q.plan)
      case p => p.children.flatMap(scansOf)
    }

  test("IvfPq handle probes ≡ path probes through CDC; pruning survives " +
      "(round-17 verdict item 1 — same nlist ∝ corpus dir geometry)") {
    val cents = Similarity.strideCentroids(emb, stride = 50)
      .localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pq-handle").toString + "/idx"
    IvfPqIndex.build(emb.filter(col("vec_id") < 400), cents, dir)
    val handle = IvfPqIndex.openHandle(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
    def viaPath() = IvfPqIndex.topK(spark, dir, queries, cents, k = 5)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    def viaHandle() = IvfPqIndex
      .topKWith(spark, handle, queries, cents, k = 5, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(viaHandle() == viaPath(), "PQ handle diverged on the built index")
    // CDC verbs mutate the SIDE tables only — the handle keeps serving
    IvfPqIndex.upsert(emb.filter(col("vec_id") === 1)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding")),
      cents, dir, rev = 1L)
    IvfPqIndex.delete(Seq(2L).toDF("vec_id"), dir)
    assert(viaHandle() == viaPath(),
      "PQ handle diverged after upsert + delete")
    // as-of through the handle ≡ the path-based snapshot read
    val asOfH = IvfPqIndex.topKAsOfWith(spark, handle, queries, cents,
        k = 5, asOf = 1L, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    val asOfP = IvfPqIndex.topKAsOf(spark, dir, queries, cents,
        k = 5, asOf = 1L)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(asOfH == asOfP, "PQ as-of handle diverged from the path read")
    // pruning binds at planning against the cached listing
    val df = IvfPqIndex.topKWith(spark, handle, queries, cents, k = 5,
      nProbe = 3)
    df.collect()
    val idxScan = scansOf(df.queryExecution.executedPlan)
      .find(s => s.relation.location.rootPaths
        .exists(_.toString.contains("graft-pq-handle")) &&
        s.partitionFilters.nonEmpty)
      .getOrElse(fail("no partition-filtered scan through the PQ handle"))
    assert(idxScan.partitionFilters.exists(_.toString.contains("cluster_id")))
  }

  test("a fold under a live handle REFUSES mechanically — never a " +
      "permanent FNF loop (round-17 verdict item 2)") {
    val cents = Similarity.strideCentroids(emb, stride = 50)
      .localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gen-handle").toString + "/idx"
    IvfIndex.build(emb.filter(col("vec_id") < 300), cents, dir)
    val queries = emb.filter(col("vec_id") < 5)
    val h0 = IvfIndex.openHandle(spark, dir)
    assert(h0.generation.nonEmpty, "build must stamp a generation")
    assert(!IvfIndex.isStale(spark, h0))
    val before = IvfIndex.topKWith(spark, h0, queries, cents, k = 5,
        nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(before.nonEmpty)
    // the fold: rebuild swaps the directory under the handle
    IvfIndex.rebuild(spark, dir, cents)
    assert(IvfIndex.isStale(spark, h0),
      "rebuild must move the generation stamp")
    val ex = intercept[StaleHandleException] {
      IvfIndex.topKWith(spark, h0, queries, cents, k = 5, nProbe = 3)
        .collect()
    }
    assert(ex.path == dir && ex.opened != ex.current)
    // the as-of twin refuses identically
    intercept[StaleHandleException] {
      IvfIndex.topKAsOfWith(spark, h0, queries, cents, k = 5, asOf = 0L,
        nProbe = 3).collect()
    }
    // recovery is mechanical: reopen, re-probe — same results (the
    // rebuild used the same centroids, so the serve is unchanged)
    val h1 = IvfIndex.reopen(spark, h0)
    assert(!IvfIndex.isStale(spark, h1))
    val after = IvfIndex.topKWith(spark, h1, queries, cents, k = 5,
        nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(after == before,
      "same-centroid rebuild must serve identically through a reopened " +
        "handle")
    // PQ twin: a build-over replaces the dir and the handle refuses
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft-gen-pq").toString + "/idx"
    IvfPqIndex.build(emb.filter(col("vec_id") < 300), cents, pqDir)
    val ph = IvfPqIndex.openHandle(spark, pqDir)
    assert(ph.generation.nonEmpty)
    IvfPqIndex.build(emb.filter(col("vec_id") < 350), cents, pqDir)
    assert(IvfPqIndex.isStale(spark, ph))
    intercept[StaleHandleException] {
      IvfPqIndex.topKWith(spark, ph, queries, cents, k = 5, nProbe = 3)
        .collect()
    }
    val ph1 = IvfPqIndex.reopen(spark, ph)
    assert(IvfPqIndex.topKWith(spark, ph1, queries, cents, k = 5,
      nProbe = 3).count() > 0L)
  }

  test("z-layout handle: serves ≡ path reads through CDC, refuses " +
      "after a fold, reopen recovers (third CorpusProportional family)") {
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(256L)).as("xb"),
        pmod(col("event_id"), lit(256L)).as("yb"))
      .localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-z-handle").toString + "/layout"
    Layout.writeZOrdered(ev, col("xb"), col("yb"), dir)
    val h = Layout.openHandle(spark, dir)
    assert(h.generation.nonEmpty, "writeZOrdered must stamp a generation")
    def viaPath() = Layout.boxScanTight(
        Layout.readCurrent(spark, dir, "event_id"), 16, 31, 32, 63)
      .select(col("event_id")).orderBy(col("event_id"))
      .as[Long].collect().toSeq
    def viaHandle() = Layout.boxScanTight(
        Layout.readCurrentWith(spark, h, "event_id"), 16, 31, 32, 63)
      .select(col("event_id")).orderBy(col("event_id"))
      .as[Long].collect().toSeq
    assert(viaHandle() == viaPath(), "z handle diverged on the built layout")
    // CDC verbs mutate side tables only — the handle keeps serving
    val victim = viaPath().headOption.getOrElse(0L)
    Layout.deleteZOrdered(Seq(victim).toDF("event_id"), "event_id", dir)
    assert(!Layout.isStale(spark, h),
      "a delete must not bump the generation")
    assert(viaHandle() == viaPath(),
      "z handle diverged after a delete — tombstones must bind fresh")
    // the as-of twin serves history identically through the handle
    val asOfH = Layout.boxScanTight(
        Layout.readCurrentAsOfWith(spark, h, "event_id", asOf = 0L),
        16, 31, 32, 63)
      .select(col("event_id")).orderBy(col("event_id"))
      .as[Long].collect().toSeq
    val asOfP = Layout.boxScanTight(
        Layout.readCurrentAsOf(spark, dir, "event_id", asOf = 0L),
        16, 31, 32, 63)
      .select(col("event_id")).orderBy(col("event_id"))
      .as[Long].collect().toSeq
    assert(asOfH == asOfP, "z as-of handle diverged from the path read")
    // a compaction fold replaces the directory: refuse, reopen, serve
    Maintenance.compactInPlace(spark, dir,
      Layout.compactZOrderedTo(spark, _, _,
        foldRevisionsBy = Some("event_id")))
    assert(Layout.isStale(spark, h), "fold must move the generation")
    intercept[StaleHandleException] { viaHandle() }
    val h1 = Layout.reopen(spark, h)
    assert(Layout.boxScanTight(
        Layout.readCurrentWith(spark, h1, "event_id"), 16, 31, 32, 63)
      .select(col("event_id")).orderBy(col("event_id"))
      .as[Long].collect().toSeq == viaPath(),
      "reopened z handle must serve the folded layout ≡ path read")
  }

  test("servingRead converts a MID-serve fold into the typed refusal — " +
      "never an unhealed FNF (round-18 advisor: requireFresh fires at " +
      "call time but the serve is lazy)") {
    val cents = Similarity.strideCentroids(emb, stride = 50)
      .localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-midserve").toString + "/idx"
    IvfIndex.build(emb.filter(col("vec_id") < 300), cents, dir)
    val queries = emb.filter(col("vec_id") < 5).localCheckpoint()
    val h = IvfIndex.openHandle(spark, dir)
    // the residual race, staged deterministically: the serving call's
    // generation check passes, THEN the fold replaces the directory
    // before the action evaluates the lazy plan — the first attempt
    // FNFs against the retired files, the retry re-enters the block,
    // and the fresh check converts the failure to the typed refusal
    var folded = false
    val ex = intercept[StaleHandleException] {
      IndexIo.servingRead {
        val df = IvfIndex.topKWith(spark, h, queries, cents, k = 5,
          nProbe = 3) // requireFresh passes on the first entry
        if (!folded) { folded = true; IvfIndex.rebuild(spark, dir, cents) }
        df.collect()
      }
    }
    assert(ex.path == dir && ex.opened != ex.current)
    // recovery is the usual reopen; the composed serve then succeeds
    val h1 = IvfIndex.reopen(spark, h)
    assert(IndexIo.servingRead {
      IvfIndex.topKWith(spark, h1, queries, cents, k = 5, nProbe = 3)
        .count()
    } > 0L)
  }

  test("appends do NOT invalidate the handle — listing-snapshot " +
      "semantics are generation-stable") {
    val cents = Similarity.strideCentroids(emb, stride = 50)
      .localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gen-append").toString + "/idx"
    IvfIndex.build(emb.filter(col("vec_id") < 200), cents, dir)
    val h = IvfIndex.openHandle(spark, dir)
    IvfIndex.append(emb.filter(col("vec_id") >= 200 &&
      col("vec_id") < 250), cents, dir)
    assert(!IvfIndex.isStale(spark, h),
      "append must not bump the generation — the handle stays readable")
    // the handle serves exactly its listing's history; no FNF, no refuse
    val queries = emb.filter(col("vec_id") < 5)
    assert(IvfIndex.topKWith(spark, h, queries, cents, k = 5,
      nProbe = 3).count() > 0L)
  }
}
