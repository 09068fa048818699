package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Change data feeds on the LSH and BM25 indexes (round-15 verdict
  * item 3): per-epoch id-level deltas derived post-hoc from the epoch
  * stamps, `_SUCCESS`-gated idempotent dirs, inserts confirmed on the
  * per-doc/per-verb commit point so torn residue emits nothing. Pins
  * the restore contract — baseline membership/revision state +
  * replayed deltas ≡ the final state — re-emission idempotence, and
  * the BM25 ledger-membership gate under a staged tear. */
class IndexChangeFeedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("text"))
  private def corpusA = docs.filter(col("doc_id") < 200)
  private def corpusB = docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("doc_id")).as[Long].collect().toSet

  /** Replay a feed over a baseline membership/revision state. */
  private def replay(rows: Seq[(Long, String, Option[Long], Long)],
      live0: Set[Long]): (Set[Long], Map[Long, Long]) = {
    var live = live0
    var revs = Map.empty[Long, Long]
    rows.sortBy(_._4).foreach {
      case (id, "inserted", _, _) => live += id
      case (id, "revised", Some(r), _) => revs += id -> r
      case (id, "deleted", _, _) => live -= id
      case r => fail(s"malformed feed row $r")
    }
    (live, revs)
  }

  test("LSH feed: restore contract holds and re-emission is idempotent") {
    val dir = tmp("graft-lsh-feed")
    LshIndex.build(corpusA, dir)                         // epoch 0
    LshIndex.append(corpusB, dir)                        // epoch 1
    val tgt = 4L
    val revised = docs.filter(col("doc_id") === tgt)
      .withColumn("text", concat_ws(" ", reverse(split(col("text"), " "))))
    LshIndex.upsert(revised, dir, rev = 1L)              // epoch 2
    LshIndex.delete(Seq(7L, 11L).toDF("doc_id"), dir)    // epoch 3
    val feed = tmp("graft-lsh-feed-out")
    LshIndex.emitChangeFeed(spark, dir, feed)
    val rows = LshIndex.changeFeed(spark, feed)
      .as[(Long, String, Option[Long], Long)].collect().toSeq
    assert(rows.map(_._4).toSet == Set(1L, 2L, 3L),
      "feed must cover exactly epochs 1..committed")
    assert(rows.filter(_._4 == 1L).map(_._1).toSet == ids(corpusB))
    assert(rows.filter(_._4 == 2L).map(r => (r._1, r._3)).toSet ==
      Set((tgt, Some(1L))))
    assert(rows.filter(_._4 == 3L).map(_._1).toSet == Set(7L, 11L))
    val (live, revs) = replay(rows, ids(corpusA))
    assert(live == ids(corpusA) ++ ids(corpusB) -- Set(7L, 11L),
      "baseline + replayed deltas diverged from the final membership")
    val reg = LshIndex.revisions(spark, dir)
      .groupBy(col("doc_id")).agg(max(col("rev")).as("rev"))
      .as[(Long, Long)].collect().toMap
    assert(revs == reg, "replayed revision state diverged from the registry")
    val n0 = LshIndex.changeFeed(spark, feed).count()
    LshIndex.emitChangeFeed(spark, dir, feed)
    assert(LshIndex.changeFeed(spark, feed).count() == n0,
      "feed re-emission duplicated epochs")
  }

  test("BM25 feed: restore contract holds; a ledger-less residue epoch emits empty") {
    val dir = tmp("graft-bm-feed")
    BmIndex.build(corpusA, dir)                          // epoch 0
    // tear an append: ids + postings land (stamped e=1), ledger never
    val mirror = tmp("graft-bm-feed-mirror")
    copyDir(dir, mirror)
    BmIndex.append(corpusB, mirror)
    Seq("_bm_docs", "postings").foreach { sub =>
      copyDir(s"$mirror/$sub", s"$dir/$sub")
    }
    // the later verb allocates PAST the residue (epoch 2)
    BmIndex.delete(Seq(7L).toDF("doc_id"), dir)
    assert(BmIndex.committedEpoch(spark, dir) == 2L)
    val feed = tmp("graft-bm-feed-out")
    BmIndex.emitChangeFeed(spark, dir, feed)
    val rows = BmIndex.changeFeed(spark, feed)
      .as[(Long, String, Option[Long], Long)].collect().toSeq
    assert(rows.map(_._4).toSet == Set(2L),
      "the residue's ledger-less epoch must emit an EMPTY delta, " +
        "the committed delete its tombstone")
    assert(rows.map(r => (r._1, r._2)).toSet == Set((7L, "deleted")))
    val (live, _) = replay(rows, ids(corpusA))
    assert(live == ids(corpusA) - 7L,
      "baseline + replayed deltas diverged from the served membership")
    // re-emission stays idempotent
    BmIndex.emitChangeFeed(spark, dir, feed)
    assert(BmIndex.changeFeed(spark, feed).count() == rows.size.toLong)
  }

  test("IVF feed: restore contract holds; a torn append's phantom epoch emits empty") {
    val sfDir = "/root/testdata/sf0.001"
    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.strideCentroids(emb, stride = 50)
      .localCheckpoint()
    val dir = tmp("graft-ivf-feed") + "/idx"
    IvfIndex.build(emb.filter(col("vec_id") % 2 === 0), cents, dir) // e0
    IvfIndex.append(emb.filter(col("vec_id") % 2 === 1), cents, dir) // e1
    val revised = emb.filter(col("vec_id") === 4L)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    IvfIndex.upsert(revised, cents, dir, rev = 1L)                  // e2
    IvfIndex.delete(Seq(6L, 8L).toDF("vec_id"), dir)                // e3
    // stage a docs-first torn append on top: phantom rows at e4
    val mirror = tmp("graft-ivf-feed-mirror") + "/idx"
    copyDir(dir, mirror)
    IvfIndex.append(emb.filter(col("vec_id") === 3L)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding")),
      cents, mirror)
    copyDir(s"$mirror/_ivf_docs", s"$dir/_ivf_docs")
    assert(IvfIndex.committedEpoch(spark, dir) == 4L)
    val feed = tmp("graft-ivf-feed-out")
    IvfIndex.emitChangeFeed(spark, dir, feed)
    val rows = IvfIndex.changeFeed(spark, feed)
      .as[(Long, String, Option[Long], Long)].collect().toSeq
    assert(rows.map(_._4).toSet == Set(1L, 2L, 3L),
      "phantom epoch 4 must emit an EMPTY delta; epochs 1..3 their verbs")
    val odd = emb.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(rows.filter(_._4 == 1L).map(_._1).toSet == odd)
    assert(rows.filter(_._4 == 2L).map(r => (r._1, r._3)).toSet ==
      Set((4L, Some(1L))))
    assert(rows.filter(_._4 == 3L).map(_._1).toSet == Set(6L, 8L))
    // restore: baseline membership + deltas = the served membership
    var live = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id")).as[Long].collect().toSet
    rows.sortBy(_._4).foreach {
      case (id, "inserted", _, _) => live += id
      case (id, "revised", _, _) => live += id
      case (id, "deleted", _, _) => live -= id
      case r => fail(s"malformed feed row $r")
    }
    assert(live == IvfIndex.corpus(spark, dir).select(col("vec_id"))
      .as[Long].collect().toSet,
      "baseline + replayed deltas diverged from the served corpus")
    // re-emission stays idempotent
    IvfIndex.emitChangeFeed(spark, dir, feed)
    assert(IvfIndex.changeFeed(spark, feed).count() == rows.size.toLong)
  }

  test("IVF feed: emission halts at a torn epoch; the heal re-opens it — no frozen hole") {
    val sfDir = "/root/testdata/sf0.001"
    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.strideCentroids(emb, stride = 50)
      .localCheckpoint()
    val dir = tmp("graft-ivf-feed-heal") + "/idx"
    IvfIndex.build(emb.filter(col("vec_id") % 2 === 0), cents, dir)  // e0
    IvfIndex.append(emb.filter(col("vec_id") % 2 === 1), cents, dir) // e1
    // stage a docs-first tear at e2: registry rows land, data never
    val batch = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val mirror = tmp("graft-ivf-feed-heal-mirror") + "/idx"
    copyDir(dir, mirror)
    IvfIndex.append(batch, cents, mirror)
    copyDir(s"$mirror/_ivf_docs", s"$dir/_ivf_docs")
    assert(IvfIndex.committedEpoch(spark, dir) == 2L)
    val feed = tmp("graft-ivf-feed-heal-out")
    IvfIndex.emitChangeFeed(spark, dir, feed)
    val before = IvfIndex.changeFeed(spark, feed)
      .as[(Long, String, Option[Long], Long)].collect().toSeq
    assert(before.map(_._4).toSet == Set(1L),
      "emission must HALT at the torn epoch, not pin an empty dir " +
        "a later heal would invalidate")
    // the pruned confirmation probe is what detected the tear: its
    // executed plan must carry the cluster_id partition filter
    // (round-16 verdict item 4 — O(affected), not O(corpus))
    val probe = IvfIndex.unconfirmedInserts(spark, dir, 2L)
    assert(probe.count() > 0L)
    def scans(plan: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      plan match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case p => p.children.flatMap(scans)
      }
    val idxScan = scans(probe.queryExecution.executedPlan)
      .find(s => s.relation.location.rootPaths
        .exists(_.toString.contains("graft-ivf-feed-heal")) &&
        s.partitionFilters.nonEmpty)
      .getOrElse(fail("insert confirmation scanned the index without a " +
        "partition filter — the probe must prune to the epoch's clusters"))
    assert(idxScan.partitionFilters.exists(_.toString.contains("cluster_id")))
    // the streaming replay heals the tear at the ORIGINAL stamp...
    IvfIndex.appendIdempotent(batch, cents, dir)
    assert(IvfIndex.committedEpoch(spark, dir) == 2L,
      "heal must not allocate a new epoch")
    // ...and re-emission now emits exactly the healed epoch
    IvfIndex.emitChangeFeed(spark, dir, feed)
    val after = IvfIndex.changeFeed(spark, feed)
      .as[(Long, String, Option[Long], Long)].collect().toSeq
    assert(after.map(_._4).toSet == Set(1L, 2L))
    assert(after.filter(_._4 == 2L).map(_._1).toSet ==
      batch.select(col("vec_id")).as[Long].collect().toSet,
      "the healed epoch's feed must carry its full insert set — the " +
        "restore contract bridges the tear")
  }

  test("IVF+PQ feed: emission halts at a torn epoch; the heal re-opens it") {
    val sfDir = "/root/testdata/sf0.001"
    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.strideCentroids(emb, stride = 50)
      .localCheckpoint()
    val dir = tmp("graft-pq-feed-heal") + "/idx"
    IvfPqIndex.build(emb.filter(col("vec_id") % 2 === 0), cents, dir)  // e0
    IvfPqIndex.append(emb.filter(col("vec_id") % 2 === 1), cents, dir) // e1
    val batch = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val mirror = tmp("graft-pq-feed-heal-mirror") + "/idx"
    copyDir(dir, mirror)
    IvfPqIndex.append(batch, cents, mirror)
    copyDir(s"$mirror/_pq_docs", s"$dir/_pq_docs")
    assert(IvfPqIndex.committedEpoch(spark, dir) == 2L)
    val feed = tmp("graft-pq-feed-heal-out")
    IvfPqIndex.emitChangeFeed(spark, dir, feed)
    assert(IvfPqIndex.changeFeed(spark, feed)
      .as[(Long, String, Option[Long], Long)].collect().toSeq
      .map(_._4).toSet == Set(1L),
      "PQ emission must halt at the torn epoch")
    IvfPqIndex.appendIdempotent(batch, cents, dir)
    assert(IvfPqIndex.committedEpoch(spark, dir) == 2L)
    IvfPqIndex.emitChangeFeed(spark, dir, feed)
    val after = IvfPqIndex.changeFeed(spark, feed)
      .as[(Long, String, Option[Long], Long)].collect().toSeq
    assert(after.map(_._4).toSet == Set(1L, 2L))
    assert(after.filter(_._4 == 2L).map(_._1).toSet ==
      batch.select(col("vec_id")).as[Long].collect().toSet,
      "the healed PQ epoch's feed must carry its full insert set")
  }

  test("z-layout feed: halt-then-heal keeps the restore contract across a torn epoch") {
    val dir = tmp("graft-z-feed-heal") + "/z"
    val base = spark.range(0, 300)
      .select(col("id"), (col("id") % 97).as("x"), (col("id") % 89).as("y"))
    Layout.writeZOrderedK(base, Seq(col("x"), col("y")), dir)       // e0
    val b1 = spark.range(300, 400)
      .select(col("id"), (col("id") % 97).as("x"), (col("id") % 89).as("y"))
    Layout.appendZOrderedIdempotentK(b1, "id",
      Seq(col("x"), col("y")), dir)                                 // e1
    // tear e2: registry rows land, data never
    val b2 = spark.range(400, 450)
      .select(col("id"), (col("id") % 97).as("x"), (col("id") % 89).as("y"))
    val mirror = tmp("graft-z-feed-heal-mirror") + "/z"
    copyDir(dir, mirror)
    Layout.appendZOrderedIdempotentK(b2, "id",
      Seq(col("x"), col("y")), mirror)
    copyDir(s"$mirror/_z_docs", s"$dir/_z_docs")
    assert(Layout.committedEpoch(spark, dir, "id") == 2L)
    val feed = tmp("graft-z-feed-heal-out")
    Layout.emitChangeFeed(spark, dir, "id", feed)
    val before = Layout.changeFeed(spark, feed)
      .select(col("id"), col("change"), col("e"))
      .as[(Long, String, Long)].collect().toSeq
    assert(before.map(_._3).toSet == Set(1L),
      "z-layout emission must halt at the torn epoch")
    // heal (same batch through the idempotent verb), then re-emit
    Layout.appendZOrderedIdempotentK(b2, "id",
      Seq(col("x"), col("y")), dir)
    assert(Layout.committedEpoch(spark, dir, "id") == 2L)
    Layout.emitChangeFeed(spark, dir, "id", feed)
    val after = Layout.changeFeed(spark, feed)
      .select(col("id"), col("change"), col("e"))
      .as[(Long, String, Long)].collect().toSeq
    assert(after.map(_._3).toSet == Set(1L, 2L))
    assert(after.filter(_._3 == 2L).map(_._1).toSet ==
      (400L until 450L).toSet)
  }

  private def copyDir(from: String, to: String): Unit = {
    val src = java.nio.file.Paths.get(from)
    val dst = java.nio.file.Paths.get(to)
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else {
        java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }
}
