package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.model.NotionBlock
import graft.scale.SparkTestSession

/** SURVEY §5.3's property target: for ANY page sizes and ANY chunk size,
  * the concatenation of drained chunks equals the original block order
  * (W2/W4), and every page drains exactly once. */
class DrainPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("task-retry outcome conflicts resolve to success (at-least-once)") {
    // attempt 1 recorded a failure; the task replay succeeded — the
    // block IS uploaded, and the stale failure must not dead-letter it
    val resolved = Drain.resolveOutcomes(Seq(
      ("b", 3, false), ("b", 3, true),   // conflict -> success wins
      ("b", 4, true), ("b", 4, true),    // plain replay dup
      ("c", 0, false)))                  // genuine failure stays
      .sortBy(r => (r._1, r._2))
    assert(resolved == Seq(("b", 3, true), ("b", 4, true), ("c", 0, false)))
  }

  test("drains a pre-upgrade 6-column block store (no language/caption)") {
    MockNotionApi.reset("oldstore")
    val api = new MockNotionApi("oldstore")
    val oldStore = (0 until 3)
      .map(i => ("pg0", i, "b", "Main/pg0.md", "text", s"t$i"))
      .toDF("blockBatch", "blockIndex", "bucket", "key", "blockType", "title")
    val (_, _, report) = Drain.run(spark, oldStore, Map("Main" -> "u"), api)
    assert(report.uploaded == 3 && report.succeededPages == Seq("pg0"))
  }

  test("multi-iteration drain holds O(failing) ids on the driver, not O(backlog)") {
    val name = "bounded-driver"
    MockNotionApi.reset(name)
    val api = new MockNotionApi(name)
    // one page fails persistently (non-retryable status -> one attempt
    // per iteration); 60 healthy pages of 3 blocks drain over 3
    // iterations at maxBlocks=1
    MockNotionApi.state(name).failStatus.set(400)
    MockNotionApi.state(name).failWhen.set(b => b.blockBatch == "sick")
    val rows = (0 until 60).flatMap { p =>
      (0 until 3).map(i =>
        NotionBlock(f"pg$p%03d", i, "b", s"Main/pg$p.md", "text", s"pg$p-$i"))
    } :+ NotionBlock("sick", 0, "b", "Main/sick.md", "text", "s0")
    val (pages, failures, report) = Drain.run(spark, rows.toDF(),
      Map("Main" -> "u"), api, Drain.Config(maxBlocks = 1, maxAttempts = 2))
    assert(report.succeededPageCount == 60 && report.deadLetteredPageCount == 1)
    assert(report.succeededPages.size == 60)
    assert(report.deadLetteredPages == Seq("sick"))
    // the ONLY cross-iteration driver-held ids are the retry counters for
    // currently-failing batches — 1 here, never the 61-page backlog
    assert(report.peakRetryTracked == 1,
      s"driver held ${report.peakRetryTracked} retry ids; must track only " +
        "failing batches, not the backlog")
    assert(pages.count() == 61 && failures.count() == 1)
  }

  test("drain invariant holds for random page sizes and chunk sizes") {
    val gen = for {
      nPages <- Gen.choose(1, 4)
      sizes <- Gen.listOfN(nPages, Gen.choose(1, 12))
      maxBlocks <- Gen.choose(1, 7)
    } yield (sizes, maxBlocks)

    val prop = Prop.forAllNoShrink(gen) { case (sizes, maxBlocks) =>
      val name = s"prop-${sizes.mkString("_")}-$maxBlocks"
      MockNotionApi.reset(name)
      val api = new MockNotionApi(name)
      val rows = sizes.zipWithIndex.flatMap { case (n, p) =>
        (0 until n).map(i =>
          NotionBlock(s"pg$p", i, "b", s"Main/pg$p.md", "text", s"pg$p-$i"))
      }
      val (_, failures, report) = Drain.run(spark, rows.toDF(),
        Map("Main" -> "u"), api, Drain.Config(maxBlocks = maxBlocks))
      val ups = MockNotionApi.uploadsOf(name)
      val orderOk = sizes.indices.forall { p =>
        ups.filter(_._2.blockBatch == s"pg$p").map(_._2.blockIndex) ==
          (0 until sizes(p))
      }
      orderOk &&
        report.uploaded == sizes.sum &&
        report.succeededPages.size == sizes.size &&
        failures.isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
