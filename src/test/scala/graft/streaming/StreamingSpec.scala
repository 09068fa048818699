package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{NotionBlock, PageRecord, PageStatus}
import graft.scale.SparkTestSession

class DrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def blocks(batch: String, n: Int): Seq[NotionBlock] =
    (0 until n).map(i =>
      NotionBlock(batch, i, "staging", s"Main/$batch.md", "text", s"$batch-$i"))

  test("W4 invariant: upload order equals block order; drain completes") {
    val st = MockNotionApi.reset("order")
    val api = new MockNotionApi("order")
    val df = (blocks("p1", 12) ++ blocks("p2", 7)).toDF()
    val (pages, failures, report) = Drain.run(spark, df,
      Map("Main" -> "https://notion.test/main"), api,
      Drain.Config(maxBlocks = 5, maxAttempts = 3))
    val ups = MockNotionApi.uploadsOf("order")
    // per page, uploaded order == blockIndex order, complete
    Seq("p1" -> 12, "p2" -> 7).foreach { case (b, n) =>
      val idx = ups.filter(_._2.blockBatch == b).map(_._2.blockIndex)
      assert(idx == (0 until n), s"order broken for $b: $idx")
    }
    assert(report.uploaded == 19)
    assert(report.succeededPages == Seq("p1", "p2"))
    assert(failures.isEmpty)
    // multi-iteration drain (W2 head-N loop): 12 blocks / 5 -> >= 3 iters
    assert(report.iterations >= 3)
    // J1: page created under the directory's parent url (J2)
    assert(st.pages("p1").startsWith("https://notion.test/main/"))
  }

  test("ST6 fail-fast + ST2/K8 attempts-then-DLQ; other pages unaffected") {
    val st = MockNotionApi.reset("failfast")
    val api = new MockNotionApi("failfast")
    // block p1:3 always fails with a NON-retryable status
    st.failStatus.set(400)
    st.failWhen.set(b => b.blockBatch == "p1" && b.blockIndex == 3)
    val df = (blocks("p1", 6) ++ blocks("p2", 4)).toDF()
    val (pages, failures, report) = Drain.run(spark, df,
      Map("Main" -> "u"), api, Drain.Config(maxBlocks = 10, maxAttempts = 3))
    val ups = MockNotionApi.uploadsOf("failfast")
    // p1 blocks 0-2 uploaded once (K6 cursor), 4-5 never (fail-fast)
    assert(ups.filter(_._2.blockBatch == "p1").map(_._2.blockIndex).sorted == Seq(0, 1, 2))
    // p2 fully uploaded
    assert(ups.filter(_._2.blockBatch == "p2").map(_._2.blockIndex) == Seq(0, 1, 2, 3))
    assert(report.deadLetteredPages == Seq("p1"))
    assert(report.succeededPages == Seq("p2"))
    assert(failures.count() == 1)
    assert(pages.filter($"status" === PageStatus.Fail).select("blockBatch")
      .as[String].collect().toSeq == Seq("p1"))
  }

  test("ST8 transient errors are retried with backoff and succeed") {
    val st = MockNotionApi.reset("retry")
    val api = new MockNotionApi("retry")
    st.failStatus.set(503)
    // fail the first 2 upload calls, then heal
    st.failWhen.set(_ => st.calls.get() <= 2)
    val df = blocks("p1", 3).toDF()
    val (_, failures, report) = Drain.run(spark, df, Map("Main" -> "u"), api,
      Drain.Config(maxBlocks = 10, maxAttempts = 2, backoffBaseMs = 1))
    assert(report.uploaded == 3)
    assert(failures.isEmpty)
    assert(st.failures.get() == 2) // two transient errors absorbed by ST8
  }

  test("K5 rate limiting spaces out API calls") {
    MockNotionApi.reset("rate")
    val api = new MockNotionApi("rate")
    val df = blocks("p1", 5).toDF()
    Drain.run(spark, df, Map("Main" -> "u"), api,
      Drain.Config(maxBlocks = 10, minIntervalMs = 20))
    import scala.jdk.CollectionConverters._
    val times = MockNotionApi.state("rate").callTimes.asScala.toSeq.sorted
    val gaps = times.sliding(2).map(p => (p(1) - p(0)) / 1000000L).toSeq
    // first gap unconstrained; subsequent gaps >= ~minInterval
    assert(gaps.drop(1).forall(_ >= 15), s"gaps too small: $gaps")
  }
}

class IngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("S11 readParentUrls: missing dir is empty config, bad FS propagates") {
    val missing = Files.createTempDirectory("graft-parenturl").resolve("nope")
    assert(Phase2.readParentUrls(spark, missing.toString).isEmpty)
    // a present tree with one parenturl.txt resolves (trailing newline trimmed)
    val staged = Files.createTempDirectory("graft-parenturl-ok")
    val sub = Files.createDirectories(staged.resolve("Main"))
    Files.writeString(sub.resolve("parenturl.txt"), "https://x.test/p1\n")
    val got = Phase2.readParentUrls(spark, staged.toString)
    assert(got.select("url").as[String].collect().toSeq == Seq("https://x.test/p1"))
    // a real FS fault (unknown scheme) is NOT swallowed into "no parents"
    intercept[Exception] {
      Phase2.readParentUrls(spark, "nosuchscheme://bucket/staging")
    }
  }

  test("streaming ingest: explode, ordinal order, idempotent replay") {
    val tmp = Files.createTempDirectory("graft-ingest")
    val staging = tmp.resolve("staging"); Files.createDirectories(staging)
    val blocksDir = tmp.resolve("blocks").toString
    val ckpt1 = tmp.resolve("ckpt1").toString

    Files.writeString(staging.resolve("a.md"),
      "# A\n\npara a\n\n- x\n- y\n\n```scala\nval z = 1\n```\n\n![diagram](img/d.png)\n")
    Files.writeString(staging.resolve("b.md"),
      "# B\n\n<!-- -->\n\npara b\n")
    Files.writeString(staging.resolve("ignore.txt"), "not md")

    Ingest.start(spark, staging.toString, blocksDir, ckpt1)
      .awaitTermination()
    val stored = graft.sinks.GraftBlocksStore.read(spark, blocksDir)
    // pathGlobFilter: only the two .md files
    assert(stored.select("key").distinct().count() == 2)
    // ordinals contiguous from 0 per batch; rich payload (language,
    // caption) survives the store — T14 parity
    val aBlocks = stored.filter($"key".endsWith("a.md"))
      .orderBy("blockIndex")
      .select("blockIndex", "blockType", "title", "language", "caption")
      .as[(Int, String, String, String, String)].collect().toSeq
    assert(aBlocks == Seq(
      (0, "heading_1", "A", "", ""), (1, "text", "para a", "", ""),
      (2, "bulleted_list_item", "x", "", ""),
      (3, "bulleted_list_item", "y", "", ""),
      (4, "code", "val z = 1", "scala", ""),
      (5, "image", "img/d.png", "", "diagram")))
    // F8: the comment artifact never became a block
    assert(stored.filter($"title" === "<!-- -->").count() == 0)

    // store → upload round trip: the sink receives the rich payload
    MockNotionApi.reset("ingest-rt")
    NotionForeachWriter.sinkInto(
        () => new MockNotionApi("ingest-rt"), Map.empty)(
      stored.filter($"key".endsWith("a.md")).orderBy("blockIndex"), 0L)
    val ups = MockNotionApi.uploadsOf("ingest-rt").map(_._2)
    assert(ups.exists(b => b.blockType == "code" && b.language == "scala"))
    assert(ups.exists(b => b.blockType == "image" && b.caption == "diagram"))

    // replay with a FRESH checkpoint (simulated redelivery): K3
    // first-writer-wins keeps the store exactly-once
    val before = stored.count()
    Ingest.start(spark, staging.toString, blocksDir, tmp.resolve("ckpt2").toString)
      .awaitTermination()
    assert(graft.sinks.GraftBlocksStore.read(spark, blocksDir).count() == before)

    // new file arrives -> only its blocks are appended
    Files.writeString(staging.resolve("c.md"), "# C\n")
    Ingest.start(spark, staging.toString, blocksDir, tmp.resolve("ckpt3").toString)
      .awaitTermination()
    val after = graft.sinks.GraftBlocksStore.read(spark, blocksDir)
    assert(after.count() == before + 1)
    assert(after.filter($"title" === "C").count() == 1)
  }
}

class StatusMachineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import StatusMachine._

  test("transition unit semantics: lifecycle and sticky terminals") {
    val e = (k: String, t: Long) => StatusEvent("b1", "k", k, t)
    var s = transition(None, e("stored", 1))
    assert(s.get.status == PageStatus.New)
    s = transition(s, e("upload_start", 2))
    assert(s.get.status == PageStatus.Uploading)
    s = transition(s, e("upload_success", 3))
    assert(s.get.status == PageStatus.Success)
    // terminal is sticky
    s = transition(s, e("upload_start", 4))
    assert(s.get.status == PageStatus.Success && s.get.statusTime == 3)
    // no backward move
    val s2 = transition(transition(None, e("upload_start", 1)), e("stored", 2))
    assert(s2.get.status == PageStatus.Uploading)
  }

  test("unknown-kind events for an unknown batch emit nothing (no phantom NEW)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StatusEvent]
    val q = StatusMachine.run(mem.toDS())
      .writeStream.format("memory").queryName("status_phantom")
      .outputMode(OutputMode.Update()).start()
    mem.addData(StatusEvent("ghost", "k", "upload_done", 5)) // typo'd kind
    mem.addData(StatusEvent("real", "k2", "stored", 6))
    q.processAllAvailable()
    val out = spark.table("status_phantom").as[PageRecord].collect()
    q.stop()
    assert(out.map(_.blockBatch).toSet == Set("real"),
      s"phantom record emitted: ${out.toSeq}")
  }

  test("same-millisecond terminal race resolves deterministically, both arrival orders") {
    implicit val sqlCtx = spark.sqlContext
    // fail and success at the SAME timeMs: the (time, rank, kind) total
    // order applies the lexically-first terminal kind first, which then
    // sticks — so FAIL must win regardless of insertion order (the old
    // (time, rank) key left the winner to shuffle arrival order and a
    // crash-replay could flip a persisted outcome)
    for ((evs, tag) <- Seq(
      (Seq(StatusEvent("bt", "k", "upload_fail", 1000),
        StatusEvent("bt", "k", "upload_success", 1000)), "failfirst"),
      (Seq(StatusEvent("bt", "k", "upload_success", 1000),
        StatusEvent("bt", "k", "upload_fail", 1000)), "successfirst"))) {
      val mem = MemoryStream[StatusEvent]
      val q = StatusMachine.run(mem.toDS())
        .writeStream.format("memory").queryName(s"status_tie_$tag")
        .outputMode(OutputMode.Update()).start()
      mem.addData(evs: _*)
      q.processAllAvailable()
      val out = spark.table(s"status_tie_$tag").as[PageRecord].collect()
      q.stop()
      assert(out.map(_.status).toSeq == Seq(PageStatus.Fail),
        s"$tag: tied terminals not deterministic: ${out.toSeq}")
    }
  }

  test("streaming mapGroupsWithState over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StatusEvent]
    val q = StatusMachine.run(mem.toDS())
      .writeStream.format("memory").queryName("status_out")
      .outputMode(OutputMode.Update()).start()
    mem.addData(
      StatusEvent("b1", "k1", "stored", 10),
      StatusEvent("b2", "k2", "stored", 11))
    q.processAllAvailable()
    mem.addData(
      StatusEvent("b1", "k1", "upload_start", 20),
      StatusEvent("b1", "k1", "upload_success", 30),
      StatusEvent("b2", "k2", "upload_start", 21),
      StatusEvent("b2", "k2", "upload_fail", 31))
    q.processAllAvailable()
    val out = spark.table("status_out").as[PageRecord].collect()
      .groupBy(_.blockBatch).map { case (k, v) => k -> v.maxBy(_.statusTime).status }
    q.stop()
    assert(out == Map("b1" -> PageStatus.Success, "b2" -> PageStatus.Fail))
  }
}

class MetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("observe-based metrics ride the job") {
    Metrics.install(spark)
    Metrics.clear()
    val df = Seq(
      ("b1", 0), ("b1", 1), ("b2", 0)
    ).toDF("blockBatch", "blockIndex")
    Metrics.observeBlocks(df, "ingest_metrics").count()
    // listener delivery is async-ish; spin briefly
    var tries = 0
    while (Metrics.get("ingest_metrics").isEmpty && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    val m = Metrics.get("ingest_metrics").get
    assert(m("blocks_stored") == 3L)
  }

  test("observed metrics reach the sink from a STREAMING query") {
    // QueryExecutionListener never fires for streaming micro-batches
    // (no executionName) — delivery must ride the progress listener
    implicit val sqlCtx = spark.sqlContext
    Metrics.install(spark)
    Metrics.clear()
    val mem = MemoryStream[(String, Int)]
    val q = Metrics.observeBlocks(
        mem.toDF().toDF("blockBatch", "blockIndex"), "stream_metrics")
      .writeStream.format("noop").start()
    try {
      mem.addData(("s1", 0), ("s1", 1), ("s2", 0), ("s2", 1), ("s2", 2))
      q.processAllAvailable()
      var tries = 0
      while (Metrics.get("stream_metrics").isEmpty && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val m = Metrics.get("stream_metrics")
      assert(m.exists(_("blocks_stored") == 5L),
        s"streaming observe never delivered: $m")
    } finally q.stop()
  }
}
