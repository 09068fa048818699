package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.model.NotionBlock
import graft.scale.SparkTestSession

/** The real HTTP client against an in-process stub server
  * ([[StubNotionServer]] — shared with EndToEndSpec's composed run):
  * retry schedule on 429/502/503/504 (upload_notion_blocks.py:164-181
  * — status=5, backoff_factor=0.2, raise after exhaustion),
  * Retry-After honored, non-retryable statuses fail immediately,
  * get-or-create idempotence, and the full drain sink end-to-end over
  * localhost HTTP with injected throttles. */
class HttpNotionApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def block(batch: String, i: Int): NotionBlock =
    NotionBlock(batch, i, "b", s"Main/$batch.md", "text", s"t$i")

  test("get-or-create is idempotent and creates only on 404") {
    val stub = new StubNotionServer
    try {
      val api = new HttpNotionApi(stub.base, backoffFactorMs = 1L)
      val u1 = api.getOrCreatePage("batch-1", "Main/a.md", "https://parent")
      val u2 = api.getOrCreatePage("batch-1", "Main/a.md", "https://parent")
      assert(u1 == "https://parent/batch-1" && u2 == u1,
        s"get-or-create not idempotent: $u1 vs $u2")
      assert(stub.pages.size() == 1)
    } finally stub.stop()
  }

  test("retryable statuses retry with exponential backoff then succeed; order preserved") {
    val stub = new StubNotionServer
    try {
      // 429, 502, 503, 504 — one of each, then success on attempt 5
      stub.failScript.add((429, None)); stub.failScript.add((502, None))
      stub.failScript.add((503, None)); stub.failScript.add((504, None))
      val api = new HttpNotionApi(stub.base, backoffFactorMs = 2L)
      val url = api.getOrCreatePage("b", "Main/b.md", "https://p")
      api.uploadBlock(url, block("b", 0))
      api.uploadBlock(url, block("b", 1))
      assert(stub.blockCalls.get() == 6,
        s"want 4 failures + 2 successes, got ${stub.blockCalls.get()}")
      import scala.jdk.CollectionConverters._
      assert(stub.uploads.asScala.toSeq == Seq("b:0", "b:1"),
        "upload order lost across retries")
      // backoff grows: gaps between the 4 retried attempts of block 0
      val ts = stub.sleepTimes.asScala.toSeq.take(5)
        .sliding(2).map(p => (p(1) - p(0)) / 1000000L).toSeq
      assert(ts.last >= 8L,
        s"4th retry should back off >= 2*2^3 ms, gaps were $ts")
    } finally stub.stop()
  }

  test("Retry-After header overrides the computed backoff") {
    val stub = new StubNotionServer
    try {
      stub.failScript.add((429, Some(1L))) // server demands 1 s
      val api = new HttpNotionApi(stub.base, backoffFactorMs = 1L)
      val url = api.getOrCreatePage("ra", "Main/ra.md", "https://p")
      val t0 = System.nanoTime()
      api.uploadBlock(url, block("ra", 0))
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(elapsedMs >= 1000L,
        s"client ignored Retry-After: waited only ${elapsedMs}ms")
    } finally stub.stop()
  }

  test("exhausted retries raise NotionApiError; non-retryable statuses raise immediately") {
    val stub = new StubNotionServer
    try {
      (1 to 6).foreach(_ => stub.failScript.add((503, None)))
      val api = new HttpNotionApi(stub.base, statusRetries = 5,
        backoffFactorMs = 1L)
      val url = api.getOrCreatePage("x", "Main/x.md", "https://p")
      val before = stub.blockCalls.get()
      val e = intercept[NotionApiError](api.uploadBlock(url, block("x", 0)))
      assert(e.status == 503)
      assert(stub.blockCalls.get() - before == 6,
        "want exactly 1 attempt + 5 status retries (reference Retry(status=5))")

      stub.failScript.add((400, None))
      val calls = stub.blockCalls.get()
      val e2 = intercept[NotionApiError](api.uploadBlock(url, block("x", 1)))
      assert(e2.status == 400)
      assert(stub.blockCalls.get() - calls == 1,
        "non-retryable status must not retry")
    } finally stub.stop()
  }

  test("malformed server escapes degrade to raw chars instead of crashing") {
    // round-14 advice: the \u guard was off by one — a value ENDING in
    // a truncated escape (\u12) passed it and substring(i+2, i+6) threw
    // StringIndexOutOfBounds; non-hex digits threw NumberFormatException
    // unguarded. A malformed server response must not crash the sink.
    val stub = new StubNotionServer
    try {
      // served verbatim as {"url":"AA-\uzzzz-\u12"}: one valid
      // escape, one non-hex, one truncated at end-of-value
      stub.pages.put("esc",
        "A" + "\\" + "u0041-" + "\\" + "uzzzz-" + "\\" + "u12")
      val api = new HttpNotionApi(stub.base, backoffFactorMs = 1L)
      val u = api.getOrCreatePage("esc", "Main/esc.md", "https://p")
      assert(u == "AA-uzzzz-u12",
        s"valid escape must decode, malformed must pass through raw: $u")
    } finally stub.stop()
  }

  test("drain sink end-to-end over real localhost HTTP with injected throttles") {
    val stub = new StubNotionServer
    try {
      // throttle twice mid-stream; the client's transport retry (not
      // the writer's) must absorb them invisibly
      stub.failScript.add((429, None)); stub.failScript.add((503, None))
      val base = stub.base
      import spark.implicits._
      val blocks = ((0 until 4).map(i => block("p1", i)) ++
        (0 until 3).map(i => block("p2", i))).toDF()
      NotionForeachWriter.sinkInto(
        () => new HttpNotionApi(base, backoffFactorMs = 1L),
        parents = Map("Main" -> "https://parent"))(blocks, 0L)
      import scala.jdk.CollectionConverters._
      assert(stub.uploads.asScala.toSeq ==
        Seq("p1:0", "p1:1", "p1:2", "p1:3", "p2:0", "p2:1", "p2:2"),
        s"order violated: ${stub.uploads.asScala.toSeq}")
      assert(stub.pages.size() == 2)
      assert(stub.pages.get("p1") == "https://parent/p1",
        "parenturl routing broke over HTTP")
    } finally stub.stop()
  }
}
