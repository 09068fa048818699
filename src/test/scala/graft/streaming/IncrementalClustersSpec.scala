package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.scale.{ClusterStore, Dedup, SparkTestSession}

/** Streaming cluster maintenance: after any micro-batch sequence the
  * served assignments are EXACTLY the from-scratch clustering over
  * everything streamed (minus streamed take-downs), and an epoch
  * replay is a no-op. */
class IncrementalClustersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def truth(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    val chunks = rows.toDF("doc_id", "chunk_hash")
    val hub = chunks.groupBy(col("chunk_hash"))
      .agg(min(col("doc_id")).as("hub"))
    val edges = chunks.join(hub, Seq("chunk_hash"))
      .filter(col("doc_id") =!= col("hub"))
      .select(col("doc_id").as("d1"), col("hub").as("d2"))
    val cc =
      if (edges.isEmpty) Map.empty[Long, Long]
      else Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
    rows.map(_._1).distinct.map(d => d -> cc.getOrElse(d, d)).toMap
  }

  test("streamed chunk batches serve the exact from-scratch clustering; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("graft-incl") + "/store"
    // cold start: build over an empty frame
    ClusterStore.build(
      Seq.empty[(Long, Long)].toDF("doc_id", "chunk_hash"), store)

    val b1 = Seq(1L -> 100L, 2L -> 100L, 5L -> 200L, 6L -> 200L)
    val b2 = Seq(7L -> 100L, 7L -> 200L, 9L -> 300L) // bridges both comps
    val mem = MemoryStream[(Long, Long)]
    val q = IncrementalClusters.run(
      mem.toDF().toDF("doc_id", "chunk_hash"), store,
      checkpoint = tmp("graft-incl-ckpt"))
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val want = truth(b1 ++ b2)
    def got() = ClusterStore.assignments(spark, store)
      .as[(Long, Long)].collect().toMap
    assert(got() == want, "streamed store diverged from scratch clustering")
    assert(got()(7L) == 1L, "cross-batch hyperedge merge missing")
    assert(ClusterStore.consistent(spark, store))

    // epoch replay: re-appending a committed batch is a no-op
    IncrementalClusters.appendBatch(store)(
      b2.toDF("doc_id", "chunk_hash"), 99L)
    assert(got() == want, "epoch replay changed assignments")

    // streamed take-downs: delete the merged component's root
    val mem2 = MemoryStream[Long]
    val q2 = IncrementalClusters.runDeletes(
      mem2.toDF().toDF("doc_id"), store,
      checkpoint = tmp("graft-incl-del-ckpt"))
    try {
      mem2.addData(1L); q2.processAllAvailable()
    } finally q2.stop()
    assert(got() == truth((b1 ++ b2).filter(_._1 != 1L)),
      "streamed take-down diverged from the survivor clustering")
    assert(ClusterStore.consistent(spark, store))

    // streamed REVISIONS: doc 2 re-chunks from 100 to 200 — in one
    // epoch it leaves {2,7} (7 still bridges) and stays merged via
    // 200; doc 9 re-chunks to 100 and joins the component
    val mem3 = MemoryStream[(Long, Long)]
    val q3 = IncrementalClusters.runRevisions(
      mem3.toDF().toDF("doc_id", "chunk_hash"), store,
      checkpoint = tmp("graft-incl-rev-ckpt"))
    val r1 = Seq(2L -> 200L, 9L -> 100L)
    try {
      mem3.addData(r1: _*); q3.processAllAvailable()
    } finally q3.stop()
    val revised = Seq(2L -> 200L, 5L -> 200L, 6L -> 200L,
      7L -> 100L, 7L -> 200L, 9L -> 100L)
    assert(got() == truth(revised),
      "streamed revision diverged from the revised-corpus clustering")
    assert(ClusterStore.consistent(spark, store))
    // committed-replay of the revision batch is a pure no-op
    val (e1, _) = (spark.read.parquet(s"$store/_cs_meta").head().getLong(0), 0)
    IncrementalClusters.upsertBatch(store)(
      r1.toDF("doc_id", "chunk_hash"), 99L)
    assert(spark.read.parquet(s"$store/_cs_meta").head().getLong(0) == e1 &&
      got() == truth(revised),
      "revision epoch replay changed the store")
  }
}
