package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.{BmIndex, IvfIndex, IvfPqIndex, Similarity,
  SparkTestSession}

/** The last two serving layouts gain streaming twins: BM25
  * ([[IncrementalRetrieval]]) and IVF ([[IncrementalVectors]]).
  * Batch ≡ stream at the index level, epoch replays are no-ops (BM25
  * via the committed-id anti-join; IVF via the replay-safe
  * appendIdempotent — the plain append is deliberately non-deduping),
  * and the revision/take-down loops compose per the family rules. */
class IncrementalRetrievalVectorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("text"))
  private def emb = spark.read.parquet(s"$d/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def qTerms = docs.filter(col("doc_id") === 1)
    .select(explode(split(col("text"), " ")).as("term"))
    .distinct().orderBy(col("term").asc).limit(8)

  test("BM25 stream: micro-batches append exactly-once; serve equals a fresh build") {
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("graft-iret") + "/idx"
    BmIndex.build(docs.filter(col("doc_id") < 300), idx)
    val mem = MemoryStream[(Long, String)]
    val q = IncrementalRetrieval.run(
      mem.toDF().toDF("doc_id", "text"), idx,
      checkpoint = tmp("graft-iret-ckpt"))
    try {
      Seq((300L, 400L), (400L, 500L)).foreach { case (lo, hi) =>
        mem.addData(docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .as[(Long, String)].collect().toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(BmIndex.committedEpoch(spark, idx) == 2L)
    val got = BmIndex.topK(spark, idx, qTerms, 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val fresh = tmp("graft-iret-fresh") + "/idx"
    BmIndex.build(docs.filter(col("doc_id") < 500), fresh)
    assert(got == BmIndex.topK(spark, fresh, qTerms, 15)
      .as[(Int, Long, Long, Long)].collect().toSeq,
      "streamed index diverged from a fresh build, scores included")
    // epoch replay through the body is a pure no-op
    val b2 = docs.filter(col("doc_id") >= 400 && col("doc_id") < 500)
    IncrementalRetrieval.appendBatch(idx)(b2, 1L)
    assert(BmIndex.committedEpoch(spark, idx) == 2L &&
      BmIndex.topK(spark, idx, qTerms, 15)
        .as[(Int, Long, Long, Long)].collect().toSeq == got,
      "replayed epoch changed the index")
    // revision + take-down loops compose (direct body form)
    BmIndex.upsert(docs.filter(col("doc_id") === 2L)
      .withColumn("text", concat_ws(" ",
        filter(split(col("text"), " "), (_, i) => i % 2 === 0))),
      idx, rev = 3L)
    BmIndex.delete(Seq(3L).toDF("doc_id"), idx)
    val end = BmIndex.topK(spark, idx, qTerms, 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val fresh2 = tmp("graft-iret-fresh2") + "/idx"
    BmIndex.build(docs.filter(col("doc_id") < 500 && col("doc_id") =!= 3)
      .withColumn("text", when(col("doc_id") === 2L, concat_ws(" ",
        filter(split(col("text"), " "), (_, i) => i % 2 === 0)))
        .otherwise(col("text"))), fresh2)
    assert(end == BmIndex.topK(spark, fresh2, qTerms, 15)
      .as[(Int, Long, Long, Long)].collect().toSeq,
      "composed revision + take-down diverged from a fresh build")
  }

  test("IVF stream: idempotent micro-batch appends; serve equals a fresh build; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val cents = Similarity.strideCentroids(emb, 50).localCheckpoint()
    val idx = tmp("graft-ivec") + "/idx"
    IvfIndex.build(emb.filter(col("vec_id") < 300), cents, idx)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = IncrementalVectors.run(
      mem.toDF().toDF("vec_id", "embedding"), idx, cents,
      checkpoint = tmp("graft-ivec-ckpt"))
    try {
      Seq((300L, 400L), (400L, 2001L)).foreach { case (lo, hi) =>
        mem.addData(emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
          .as[(Long, Array[Float])].collect().toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(IvfIndex.committedEpoch(spark, idx) == 2L)
    val queries = emb.filter(col("vec_id").isin(1L, 2L))
    def probe(dir: String) =
      IvfIndex.topK(spark, dir, queries, cents, k = 5)
        .orderBy("query_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
    val got = probe(idx)
    val fresh = tmp("graft-ivec-fresh") + "/idx"
    IvfIndex.build(emb, cents, fresh)
    assert(got == probe(fresh),
      "streamed IVF index diverged from a fresh build")
    // replay through the idempotent body: no duplicate data rows
    val n0 = spark.read.parquet(idx).count()
    IncrementalVectors.appendBatch(idx, cents)(
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 400), 1L)
    assert(spark.read.parquet(idx).count() == n0 &&
      IvfIndex.committedEpoch(spark, idx) == 2L && probe(idx) == got,
      "replayed epoch duplicated rows or re-stamped an epoch")
  }

  test("IVF+PQ stream: idempotent code appends; serve equals a fresh build; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val cents = Similarity.strideCentroids(emb, 50).localCheckpoint()
    val cb = Similarity.pqInitCodebooks(emb).localCheckpoint()
    val idx = tmp("graft-ipq") + "/idx"
    IvfPqIndex.build(emb.filter(col("vec_id") < 300), cents, idx,
      codebooks = Some(cb))
    val mem = MemoryStream[(Long, Array[Float])]
    val q = IncrementalVectors.runPq(
      mem.toDF().toDF("vec_id", "embedding"), idx, cents,
      checkpoint = tmp("graft-ipq-ckpt"))
    try {
      Seq((300L, 400L), (400L, 2001L)).foreach { case (lo, hi) =>
        mem.addData(emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
          .as[(Long, Array[Float])].collect().toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(IvfPqIndex.committedEpoch(spark, idx) == 2L)
    val queries = emb.filter(col("vec_id").isin(1L, 2L))
    def probe(dir: String) =
      IvfPqIndex.topK(spark, dir, queries, cents, k = 5)
        .select(col("query_id"), col("rank"), col("vec_id"))
        .orderBy("query_id", "rank")
        .as[(Long, Int, Long)].collect().toSeq
    val got = probe(idx)
    val fresh = tmp("graft-ipq-fresh") + "/idx"
    IvfPqIndex.build(emb, cents, fresh, codebooks = Some(cb))
    assert(got == probe(fresh),
      "streamed PQ index diverged from a fresh build under the same codebooks")
    val n0 = spark.read.parquet(idx).count()
    IncrementalVectors.pqAppendBatch(idx, cents)(
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 400), 1L)
    assert(spark.read.parquet(idx).count() == n0 &&
      IvfPqIndex.committedEpoch(spark, idx) == 2L && probe(idx) == got,
      "replayed PQ epoch duplicated code rows or re-stamped an epoch")
  }
}
