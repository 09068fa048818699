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
