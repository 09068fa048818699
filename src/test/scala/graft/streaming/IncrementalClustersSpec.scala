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

  test("change feed: per-epoch deltas exact, compose to the final map, tail self-heals (q167)") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("graft-incl-cdf")
    val store = root + "/store"
    val feed = root + "/feed"
    // epoch 0 = the feed's baseline snapshot
    val b0 = Seq(1L -> 100L, 2L -> 100L, 5L -> 200L)
    ClusterStore.build(b0.toDF("doc_id", "chunk_hash"), store)
    val b1 = Seq(6L -> 200L, 9L -> 300L)          // epoch 1: inserts
    val b2 = Seq(7L -> 100L, 7L -> 300L)          // epoch 2: bridge 9 into {1,2}
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("doc_id", "chunk_hash").writeStream
      .foreachBatch(IncrementalClusters.withChangeFeed(store, feed)(
        IncrementalClusters.appendBatch(store)))
      .option("checkpointLocation", tmp("graft-incl-cdf-ckpt"))
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // epoch 3: a take-down through the same decorator
    IncrementalClusters.withChangeFeed(store, feed)(
      IncrementalClusters.deleteBatch(store))(Seq(1L).toDF("doc_id"), 99L)

    def feedRows(): Map[(Long, Long), (Long, Long, String)] =
      ClusterStore.changeFeed(spark, feed)
        .select(col("e"), col("doc_id"),
          coalesce(col("old_rep"), lit(-1L)),
          coalesce(col("new_rep"), lit(-1L)), col("change"))
        .as[(Long, Long, Long, Long, String)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val want = Map(
      (1L, 6L) -> ((-1L, 5L, "inserted")),
      (1L, 9L) -> ((-1L, 9L, "inserted")),
      (2L, 7L) -> ((-1L, 1L, "inserted")),
      (2L, 9L) -> ((9L, 1L, "relabeled")),
      (3L, 1L) -> ((1L, -1L, "deleted")),
      (3L, 2L) -> ((1L, 2L, "relabeled")),
      (3L, 7L) -> ((1L, 2L, "relabeled")),
      (3L, 9L) -> ((1L, 2L, "relabeled")))
    assert(feedRows() == want, "per-epoch feed deltas diverged from truth")

    // the CDF contract: baseline snapshot + replayed deltas ≡ final map
    val baseline = ClusterStore.assignmentsAsOf(spark, store, 0L)
      .as[(Long, Long)].collect().toMap
    val replayed = feedRows().toSeq.sortBy(_._1._1)
      .foldLeft(baseline) { case (m, ((_, doc), (_, nw, chg))) =>
        if (chg == "deleted") m - doc else m + (doc -> nw)
      }
    val fin = ClusterStore.assignments(spark, store)
      .as[(Long, Long)].collect().toMap
    assert(replayed == fin, "baseline + deltas failed to rebuild the final map")

    // tail self-heal: lose the last feed epoch (the crash window is
    // between a store commit and its feed write), re-emit, identical
    val before = feedRows()
    deleteDir(s"$feed/e=3")
    assert(feedRows() != before, "weak fixture: nothing deleted")
    ClusterStore.emitChangeFeed(spark, store, feed)
    assert(feedRows() == before, "healed feed diverged from the original")
    // and a no-change call emits nothing new
    ClusterStore.emitChangeFeed(spark, store, feed)
    assert(feedRows() == before)
  }

  private def deleteDir(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
  }
}
