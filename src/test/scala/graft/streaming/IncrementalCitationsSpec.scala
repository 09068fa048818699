package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.scale.{CitationIndex, Graph, SparkTestSession}

/** Streaming citation maintenance: after any micro-batch sequence the
  * served edges are EXACTLY the from-scratch derivation over
  * everything streamed, and an epoch replay is a no-op. */
class IncrementalCitationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("text"))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("streamed appends serve the exact from-scratch edge set; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("graft-incit") + "/idx"
    CitationIndex.build(docs.filter(col("doc_id") < 200), idx)

    val mem = MemoryStream[(Long, String)]
    val q = IncrementalCitations.run(
      mem.toDF().toDF("doc_id", "text"), idx,
      checkpoint = tmp("graft-incit-ckpt"))
    try {
      val b1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 350)
        .as[(Long, String)].collect().toSeq
      val b2 = docs.filter(col("doc_id") >= 350)
        .as[(Long, String)].collect().toSeq
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = CitationIndex.edgesWeighted(spark, idx)
      .as[(Long, Long, Long)].collect().toSet
    val want = Graph.citationEdgesWeighted(docs, n = 3, dfMin = 2,
        dfMax = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want, "streamed index diverged from from-scratch edges")
    assert(got.nonEmpty)
    assert(CitationIndex.consistent(spark, idx))

    // epoch replay: re-appending an already-committed batch is a no-op
    IncrementalCitations.appendBatch(idx)(
      docs.filter(col("doc_id") >= 350), 99L)
    assert(CitationIndex.edgesWeighted(spark, idx)
      .as[(Long, Long, Long)].collect().toSet == want,
      "epoch replay changed the edge set")
  }

  test("streamed take-downs serve the exact survivor edge set; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("graft-incit-del") + "/idx"
    val removals = docs.filter(col("doc_id") % 6 === 0)
    CitationIndex.build(docs, idx, slack = removals.count())

    val mem = MemoryStream[(Long, String)]
    val q = IncrementalCitations.runDeletes(
      mem.toDF().toDF("doc_id", "text"), idx,
      checkpoint = tmp("graft-incit-del-ckpt"))
    try {
      val b1 = removals.filter(col("doc_id") < 300)
        .as[(Long, String)].collect().toSeq
      val b2 = removals.filter(col("doc_id") >= 300)
        .as[(Long, String)].collect().toSeq
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = CitationIndex.edgesWeighted(spark, idx)
      .as[(Long, Long, Long)].collect().toSet
    val want = Graph.citationEdgesWeighted(
        docs.filter(col("doc_id") % 6 =!= 0), n = 3, dfMin = 2, dfMax = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      "streamed take-downs diverged from the survivor derivation")
    assert(got.nonEmpty)
    assert(CitationIndex.consistent(spark, idx))

    // epoch replay: re-deleting an already-tombstoned batch is a no-op
    IncrementalCitations.deleteBatch(idx)(
      docs.filter(col("doc_id") % 6 === 0 && col("doc_id") >= 300), 99L)
    assert(CitationIndex.edgesWeighted(spark, idx)
      .as[(Long, Long, Long)].collect().toSet == want,
      "take-down epoch replay changed the edge set")
  }

  test("streamed revisions serve the exact revised-corpus edge set; replay heals") {
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("graft-incit-rev") + "/idx"
    val base = docs.filter(col("doc_id") < 400)
    val pred = col("doc_id") % 9 === 0
    val rev = concat_ws(" ", reverse(split(col("text"), " ")))
    val revisions = base.filter(pred)
      .select(col("doc_id"), rev.as("text"), col("text").as("prev_text"))
    CitationIndex.build(base, idx, slack = revisions.count())

    val mem = MemoryStream[(Long, String, String)]
    val q = IncrementalCitations.runRevisions(
      mem.toDF().toDF("doc_id", "text", "prev_text"), idx,
      checkpoint = tmp("graft-incit-rev-ckpt"))
    try {
      val b1 = revisions.filter(col("doc_id") < 200)
        .as[(Long, String, String)].collect().toSeq
      val b2 = revisions.filter(col("doc_id") >= 200)
        .as[(Long, String, String)].collect().toSeq
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = CitationIndex.edgesWeighted(spark, idx)
      .as[(Long, Long, Long)].collect().toSet
    val want = Graph.citationEdgesWeighted(
        base.select(col("doc_id"),
          when(pred, rev).otherwise(col("text")).as("text")),
        n = 3, dfMin = 2, dfMax = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      "streamed revisions diverged from the revised-corpus derivation")
    assert(got.nonEmpty)
    assert(CitationIndex.consistent(spark, idx))

    // epoch replay at the same rev heals to a no-op
    IncrementalCitations.upsertBatch(idx)(
      revisions.filter(col("doc_id") >= 200), 1L)
    assert(CitationIndex.edgesWeighted(spark, idx)
      .as[(Long, Long, Long)].collect().toSet == want,
      "revision epoch replay changed the edge set")
  }
}
