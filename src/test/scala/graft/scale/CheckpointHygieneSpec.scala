package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r20 optimization round: the iterative checkpoint loops (directed
  * PageRank, Louvain, random walks, cluster-store pointer chase) now
  * RELEASE superseded localCheckpoint blocks deterministically
  * (CheckpointBridge) instead of leaving them to the async
  * ContextCleaner, and the serving paths overlap independent eager
  * control-plane actions (IndexIo.concurrently). This spec pins both:
  *  - results stay correct AND the returned frames stay re-usable
  *    (their own blocks are never released);
  *  - the persistent-RDD census is BOUNDED per call — the loops no
  *    longer leak one block set per round into the session;
  *  - concurrently returns both thunks' values and propagates
  *    exceptions unchanged.
  */
class CheckpointHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Number of currently-pinned RDDs in this session (localCheckpoint
    * registers its materialized RDD here until unpersisted). The
    * cleaner is async, so counts are compared with headroom. */
  private def pinned(): Int = spark.sparkContext.getPersistentRDDs.size

  test("concurrently returns both results and propagates exceptions") {
    assert(IndexIo.concurrently(1 + 1, "x" * 2) === ((2, "xx")))
    val boom = intercept[IllegalStateException] {
      IndexIo.concurrently(
        { Thread.sleep(10); 1 },
        throw new IllegalStateException("branch failure"))
    }
    assert(boom.getMessage === "branch failure")
  }

  test("directed PageRank releases superseded round state; result frame stays readable") {
    val und = Seq(1L -> 10L, 2L -> 10L, 1L -> 20L, 3L -> 20L, 2L -> 30L)
    val edges = und.toDF("src", "dst")
    val before = pinned()
    val pr = Graph.pageRankDirectedQ(edges, iterations = 6)
    val rows1 = pr.orderBy(col("node")).collect()
    // re-usable: acting twice reads the SAME retained blocks
    val rows2 = pr.orderBy(col("node")).collect()
    assert(rows1.sameElements(rows2))
    // 6 rounds used to pin 6 superseded states + e + base + state0;
    // with deterministic release only the FINAL state may stay pinned
    // (plus cleaner slack) — far fewer than one per round
    val leaked = pinned() - before
    assert(leaked <= 3,
      s"directedLoop leaked $leaked pinned RDDs for 6 rounds — " +
        "superseded checkpoint blocks are no longer being released")
  }

  test("multilevel Louvain bounds its pinned-RDD growth across calls") {
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 6L,
      6L -> 4L, 1L -> 4L)
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val before = pinned()
    val out = Graph.modularityCommunitiesMultilevelQ(edges, rounds = 2,
      levels = 3)
    val n1 = out.count()
    assert(n1 > 0)
    val leaked = pinned() - before
    // 3 levels × (labels per round + w + assign) used to stay pinned;
    // now only the final assign (plus cleaner slack) may remain
    assert(leaked <= 3,
      s"runMultilevel leaked $leaked pinned RDDs for 3 levels × 2 rounds")
  }

  test("random walks release previous segments' frontier/accumulator") {
    val und = Seq(1L -> 10L, 2L -> 10L, 1L -> 20L, 2L -> 30L, 3L -> 30L)
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val starts = Seq((1L, 1L), (2L, 2L)).toDF("walk_id", "node")
    val before = pinned()
    val walks = Graph.randomWalks(edges, starts, steps = 12,
      materializeEvery = 3)
    assert(walks.count() === 2 * 13)
    val leaked = pinned() - before
    // 12 steps at cadence 3 used to pin 3 superseded (cur, acc) pairs
    // plus the final pair and the edge pin; the final segment's pins
    // must survive (the returned frame reads them lazily)
    assert(leaked <= 3,
      s"randomWalks leaked $leaked pinned RDDs for 12 steps @ cadence 3")
  }

  test("cluster-store diff: parallel snapshot resolutions equal sequential") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt-hygiene").toString
    // (doc_id, chunk_hash): docs sharing a hash join one component
    val docs = (1L to 40L).flatMap(i => Seq((i, i % 7L), (i, 1000L + i)))
      .toDF("doc_id", "chunk_hash")
    ClusterStore.build(docs, dir)
    ClusterStore.append(
      (41L to 60L).flatMap(i => Seq((i, i % 7L), (i, 1000L + i)))
        .toDF("doc_id", "chunk_hash"), dir)
    ClusterStore.delete(Seq(5L, 7L).toDF("doc_id"), dir)
    val diff = ClusterStore.diffAsOf(spark, dir, from = 0L, to = 2L)
    val seq0 = ClusterStore.assignmentsAsOf(spark, dir, 0L)
      .select(col("doc_id"), col("rep").as("old_rep"))
    val seq2 = ClusterStore.assignmentsAsOf(spark, dir, 2L)
      .select(col("doc_id"), col("rep").as("new_rep"))
    val ref = seq0.join(seq2, Seq("doc_id"), "full_outer")
      .withColumn("change",
        when(col("old_rep").isNull, lit("inserted"))
          .when(col("new_rep").isNull, lit("deleted"))
          .when(col("old_rep") === col("new_rep"), lit("kept"))
          .otherwise(lit("relabeled")))
    assert(diff.orderBy(col("doc_id")).collect()
      .sameElements(ref.orderBy(col("doc_id")).collect()))
  }
}
