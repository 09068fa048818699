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

  /** Ids of currently-pinned RDDs in this session (localCheckpoint
    * registers its materialized RDD here until unpersisted). Leak
    * assertions compare the set DELTA — ids pinned after that were not
    * pinned before — not the raw census size, so another suite's
    * in-flight async unpersist (or a future concurrent runner) cannot
    * flake them (round-20 advice item 5). */
  private def pinnedIds(): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet
  private def newPins(before: Set[Int]): Int =
    (pinnedIds() -- before).size

  test("concurrently returns both results and propagates exceptions") {
    assert(IndexIo.concurrently(1 + 1, "x" * 2) === ((2, "xx")))
    val boom = intercept[IllegalStateException] {
      IndexIo.concurrently(
        { Thread.sleep(10); 1 },
        throw new IllegalStateException("branch failure"))
    }
    assert(boom.getMessage === "branch failure")
  }

  test("concurrently awaits the surviving branch before rethrowing " +
      "(round-20 advice item 2: no detached branch)") {
    val bFinished = new java.util.concurrent.atomic.AtomicBoolean(false)
    intercept[IllegalStateException] {
      IndexIo.concurrently(
        { Thread.sleep(5); throw new IllegalStateException("a died") },
        { Thread.sleep(150); bFinished.set(true); 42 })
    }
    // the failing call returned only AFTER branch b completed — b is
    // observed, never orphaned with its eager jobs running detached
    assert(bFinished.get(),
      "branch b was left running detached after branch a failed")
    // both-fail: the first branch's exception wins, the second rides
    // along as suppressed instead of vanishing
    val both = intercept[IllegalStateException] {
      IndexIo.concurrently[Int, Int](
        throw new IllegalStateException("first"),
        { Thread.sleep(10); throw new IllegalArgumentException("second") })
    }
    assert(both.getMessage === "first")
    assert(both.getSuppressed.exists(_.getMessage === "second"))
  }

  test("concurrently3 returns all three results and keeps the failure " +
      "discipline") {
    assert(IndexIo.concurrently3(1, "a", 2.5) === ((1, "a", 2.5)))
    val cFinished = new java.util.concurrent.atomic.AtomicBoolean(false)
    intercept[IllegalStateException] {
      IndexIo.concurrently3[Int, Int, Int](
        throw new IllegalStateException("dead"),
        2,
        { Thread.sleep(100); cFinished.set(true); 3 })
    }
    assert(cFinished.get())
  }

  test("topKAsOf on an invalid asOf unpins its eager checkpoints " +
      "(round-20 advice item 1)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt-asof").toString
    val vecs = (1L to 30L)
      .map(i => (i, Array.fill(4)((i % 5 + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.strideCentroids(vecs, 10)
    IvfIndex.build(vecs, cents, dir)
    val queries = Seq((1L, Array(1.0f, 1.0f, 1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val before = pinnedIds()
    intercept[IllegalArgumentException] {
      IvfIndex.topKAsOf(spark, dir, queries, cents, k = 3, asOf = 99L)
    }
    assert(newPins(before) === 0,
      "invalid-asOf probe left its registry/probe checkpoints pinned")
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft-ckpt-asof-pq").toString
    IvfPqIndex.build(vecs, cents, pqDir, m = 2, dim = 4, kc = 4)
    val before2 = pinnedIds()
    intercept[IllegalArgumentException] {
      IvfPqIndex.topKAsOf(spark, pqDir, queries, cents, k = 3, asOf = 99L)
    }
    assert(newPins(before2) === 0,
      "invalid-asOf PQ probe left its checkpoints pinned")
  }

  test("directed PageRank releases superseded round state; result frame stays readable") {
    val und = Seq(1L -> 10L, 2L -> 10L, 1L -> 20L, 3L -> 20L, 2L -> 30L)
    val edges = und.toDF("src", "dst")
    val before = pinnedIds()
    val pr = Graph.pageRankDirectedQ(edges, iterations = 6)
    val rows1 = pr.orderBy(col("node")).collect()
    // re-usable: acting twice reads the SAME retained blocks
    val rows2 = pr.orderBy(col("node")).collect()
    assert(rows1.sameElements(rows2))
    // 6 rounds used to pin 6 superseded states + e + base + state0;
    // with deterministic release only the FINAL state may stay pinned
    // (plus cleaner slack) — far fewer than one per round
    val leaked = newPins(before)
    assert(leaked <= 3,
      s"directedLoop leaked $leaked pinned RDDs for 6 rounds — " +
        "superseded checkpoint blocks are no longer being released")
  }

  test("multilevel Louvain bounds its pinned-RDD growth across calls") {
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 6L,
      6L -> 4L, 1L -> 4L)
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val before = pinnedIds()
    val out = Graph.modularityCommunitiesMultilevelQ(edges, rounds = 2,
      levels = 3)
    val n1 = out.count()
    assert(n1 > 0)
    val leaked = newPins(before)
    // 3 levels × (labels per round + w + assign) used to stay pinned;
    // now only the final assign (plus cleaner slack) may remain
    assert(leaked <= 3,
      s"runMultilevel leaked $leaked pinned RDDs for 3 levels × 2 rounds")
  }

  test("random walks release previous segments' frontier/accumulator") {
    val und = Seq(1L -> 10L, 2L -> 10L, 1L -> 20L, 2L -> 30L, 3L -> 30L)
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val starts = Seq((1L, 1L), (2L, 2L)).toDF("walk_id", "node")
    val before = pinnedIds()
    val walks = Graph.randomWalks(edges, starts, steps = 12,
      materializeEvery = 3)
    assert(walks.count() === 2 * 13)
    val leaked = newPins(before)
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
