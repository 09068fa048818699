package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.{Dedup, LshIndex, SparkTestSession}

/** Streaming incremental dedup against the at-rest LSH index: each
  * micro-batch matches against everything committed before it, ground
  * truth derived independently from the in-memory oracle-checked
  * pipeline; epoch replay is safe (idempotent append, no phantom
  * matches). */
class IncrementalNearDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("micro-batches dedup against initial corpus + earlier batches; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("graft-inds") + "/idx"
    val matches = tmp("graft-inds") + "/matches"
    LshIndex.build(docs.filter(col("doc_id") < 300), idx)

    val mem = MemoryStream[(Long, String)]
    val q = IncrementalNearDup.run(
      mem.toDF().toDF("doc_id", "text"), idx, matches,
      checkpoint = tmp("graft-inds-ckpt"))
    try {
      val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toSeq
      val b2 = docs.filter(col("doc_id") >= 400)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toSeq
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(matches)
      .select(col("new_doc"), col("corpus_doc"), col("matches"))
      .as[(Long, Long, Long)].collect().toSet

    // independent ground truth: the in-memory (q71-oracle-checked)
    // pipeline over the whole corpus — batch 1 must match only ids
    // < 300, batch 2 only ids < 400 (initial corpus + batch 1)
    val all = Dedup.minhashLshPairsPortable(docs, n = 5, numHashes = 16,
        bands = 4, minMatches = 8)
      .as[(Long, Long, Long)].collect() // (d1, d2, matches), d1 < d2
    val expect = all.collect {
      case (d1, d2, m) if d2 >= 300 && d2 < 400 && d1 < 300 => (d2, d1, m)
      case (d1, d2, m) if d2 >= 400 && d1 < 400 => (d2, d1, m)
    }.toSet
    assert(got == expect, s"stream matches $got != ground truth $expect")
    assert(got.nonEmpty, "fixture produced no cross matches")
    assert(LshIndex.consistent(spark, idx))

    // epoch replay (crash after matches write, before checkpoint
    // commit): the batch's ids are already committed, so the probe is
    // empty and the append is a no-op — no phantom matches, no
    // duplicate signatures
    val sigsBefore = spark.read.parquet(s"$idx/sigs").count()
    IncrementalNearDup.probeAndAppend(idx, matches, 8)(
      docs.filter(col("doc_id") >= 400), 99L)
    val replayed = spark.read.parquet(matches).filter(col("epoch") === 99L)
    assert(replayed.isEmpty, "replayed epoch emitted phantom matches")
    assert(spark.read.parquet(s"$idx/sigs").count() == sigsBefore,
      "replay duplicated signatures")
  }

  test("streamed revisions: final index serves like a batch rebuild from the revised corpus") {
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("graft-indrev") + "/idx"
    LshIndex.build(docs.filter(col("doc_id") < 400), idx)
    def probe() = LshIndex
      .dedupBatch(spark, idx, docs.filter(col("doc_id") >= 400),
        minMatches = 8)
      .orderBy(col("new_doc"), col("corpus_doc"))
      .as[(Long, Long, Long)].collect().toSeq

    val revised = docs.filter(col("doc_id") < 400 && col("doc_id") % 9 === 0)
      .withColumn("text", concat_ws(" ", reverse(split(col("text"), " "))))
    val rows = revised.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val (r1, r2) = rows.splitAt(rows.length / 2)

    val mem = MemoryStream[(Long, String)]
    val q = IncrementalNearDup.runRevisions(
      mem.toDF().toDF("doc_id", "text"), idx,
      checkpoint = tmp("graft-indrev-ckpt"))
    try {
      mem.addData(r1: _*); q.processAllAvailable()
      mem.addData(r2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(LshIndex.consistent(spark, idx))

    // final serving state == an index built from the revised corpus
    val ref = tmp("graft-indrev-ref") + "/idx"
    val revisedCorpus = docs.filter(col("doc_id") < 400)
      .withColumn("text",
        when(col("doc_id") % 9 === 0,
          concat_ws(" ", reverse(split(col("text"), " "))))
          .otherwise(col("text")))
    LshIndex.build(revisedCorpus, ref)
    val want = LshIndex
      .dedupBatch(spark, ref, docs.filter(col("doc_id") >= 400),
        minMatches = 8)
      .orderBy(col("new_doc"), col("corpus_doc"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(probe() == want,
      "streamed revisions diverged from a batch rebuild over revised texts")

    // epoch replay (same epoch id => same rev) is a pure heal
    val sigRows = spark.read.parquet(s"$idx/sigs").count()
    graft.scale.LshIndex.upsert(
      revised.filter(col("doc_id").isin(r1.map(_._1): _*)), idx, rev = 1L)
    assert(spark.read.parquet(s"$idx/sigs").count() == sigRows,
      "epoch replay duplicated revision rows")
    assert(probe() == want)
  }
}
