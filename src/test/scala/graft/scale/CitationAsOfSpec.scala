package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot (as-of) serving + change data feed on the citation index
  * (round-14 verdict item 4): every verb's rows are batch-keyed, the
  * commit tables carry snapshot epochs, and
  * [[CitationIndex.edgesWeightedAsOf]] replays any committed epoch's
  * exact edge set — so a warm PageRank over `edgesAsOf(E)` is "rank
  * the citation graph as of snapshot E". The feed twin
  * ([[CitationIndex.emitChangeFeed]]) derives per-epoch edge deltas
  * post-hoc at O(affected), self-healing, with the restore contract
  * baseline + replayed deltas ≡ final. */
class CitationAsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def corpus = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("text"))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  private def got(dir: String): Set[(Long, Long, Long)] =
    CitationIndex.edgesWeighted(spark, dir)
      .as[(Long, Long, Long)].collect().toSet

  private def gotAsOf(dir: String, e: Long): Set[(Long, Long, Long)] =
    CitationIndex.edgesWeightedAsOf(spark, dir, e)
      .as[(Long, Long, Long)].collect().toSet

  private def want(docs: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    Graph.citationEdgesWeighted(docs, n = 3, dfMin = 2, dfMax = 4)
      .as[(Long, Long, Long)].collect().toSet

  private val s1 = corpus.filter(col("doc_id") < 200 && col("doc_id") % 2 === 0)
  private val s2 = corpus.filter(col("doc_id") < 200 && col("doc_id") % 2 === 1)

  test("time travel: edgesWeightedAsOf replays every epoch's exact state") {
    val dir = tmp("graft-cit-asof")
    CitationIndex.build(s1, dir, slack = 50L)            // epoch 0
    assert(CitationIndex.committedEpoch(spark, dir) == 0L)
    CitationIndex.append(s2, dir)                        // epoch 1
    // epoch 2: revise one doc's text (it leaves its old terms' edges,
    // may enter others)
    val tgt = 4L
    val newText = corpus.filter(col("doc_id") === 6L)
      .select(col("text")).as[String].head()
    val prevText = corpus.filter(col("doc_id") === tgt)
      .select(col("text")).as[String].head()
    CitationIndex.upsert(
      Seq((tgt, newText, prevText)).toDF("doc_id", "text", "prev_text"),
      dir, rev = 1L)
    // epoch 3: take down two docs
    CitationIndex.delete(
      corpus.filter(col("doc_id").isin(8L, 9L)), dir)
    assert(CitationIndex.committedEpoch(spark, dir) == 3L)

    val both = s1.unionByName(s2)
    val revised = both.filter(col("doc_id") =!= tgt)
      .unionByName(Seq((tgt, newText)).toDF("doc_id", "text"))
    val history = Seq(
      0L -> s1,
      1L -> both,
      2L -> revised,
      3L -> revised.filter(!col("doc_id").isin(8L, 9L)))
    history.foreach { case (e, docs) =>
      assert(gotAsOf(dir, e) == want(docs),
        s"as-of epoch $e diverged from that epoch's from-scratch truth")
    }
    // as-of the committed epoch IS the current serve
    assert(gotAsOf(dir, 3L) == got(dir))
    assert(gotAsOf(dir, 0L).nonEmpty, "fixture produced no edges")
    // outside the committed history: loud refusal both ways
    intercept[IllegalArgumentException] {
      CitationIndex.edgesWeightedAsOf(spark, dir, 4L)
    }
    intercept[IllegalArgumentException] {
      CitationIndex.edgesWeightedAsOf(spark, dir, -1L)
    }
    // compaction is the explicit vacuum: history folds to epoch 0
    val dest = tmp("graft-cit-asof-cmp")
    CitationIndex.compactTo(spark, dir, dest)
    assert(CitationIndex.committedEpoch(spark, dest) == 0L)
    assert(gotAsOf(dest, 0L) == got(dir),
      "compacted epoch 0 must serve the pre-compaction final state")
    intercept[IllegalArgumentException] {
      CitationIndex.edgesWeightedAsOf(spark, dest, 1L)
    }
  }

  test("change feed: baseline + replayed deltas equals the final edge set; emission self-heals") {
    val dir = tmp("graft-cit-feed")
    CitationIndex.build(s1, dir, slack = 50L)            // epoch 0
    CitationIndex.append(s2, dir)                        // epoch 1
    CitationIndex.delete(
      corpus.filter(col("doc_id").isin(2L, 11L)), dir)   // epoch 2
    val feed = tmp("graft-cit-feed-out")
    CitationIndex.emitChangeFeed(spark, dir, feed)
    val rows = CitationIndex.changeFeed(spark, feed)
      .select(col("src"), col("dst"), col("old_w"), col("new_w"),
        col("change"), col("e"))
      .as[(Long, Long, Option[Long], Option[Long], String, Long)]
      .collect()
    assert(rows.map(_._6).toSet == Set(1L, 2L),
      "feed must cover exactly epochs 1..committed")
    // restore: baseline snapshot + deltas in epoch order ≡ final
    var state = gotAsOf(dir, 0L)
      .map { case (s, t, w) => (s, t) -> w }.toMap
    rows.sortBy(_._6).foreach {
      case (s, t, _, _, "removed", _) => state -= ((s, t))
      case (s, t, _, Some(nw), _, _) => state += ((s, t) -> nw)
      case r => fail(s"malformed feed row $r")
    }
    assert(state.map { case ((s, t), w) => (s, t, w) }.toSet == got(dir),
      "baseline + replayed deltas diverged from the final edge set")
    // every delta row is honest: old_w is the edge's weight at e-1,
    // new_w at e (spot-check through the as-of reads)
    val byEpoch = rows.groupBy(_._6)
    byEpoch.foreach { case (e, rs) =>
      val before = gotAsOf(dir, e - 1L)
        .map { case (s, t, w) => (s, t) -> w }.toMap
      val after = gotAsOf(dir, e)
        .map { case (s, t, w) => (s, t) -> w }.toMap
      rs.foreach { case (s, t, ow, nw, _, _) =>
        assert(before.get((s, t)) == ow && after.get((s, t)) == nw,
          s"feed row ($s,$t) at epoch $e carries wrong weights")
      }
      // completeness: every edge that changed between e-1 and e is in
      // the feed for e
      val changed = (before.keySet ++ after.keySet)
        .filter(k => before.get(k) != after.get(k))
      assert(changed == rs.map(r => (r._1, r._2)).toSet,
        s"epoch $e feed missed or over-reported changed edges")
    }
    // derived emission is idempotent: a second call writes nothing new
    val n0 = CitationIndex.changeFeed(spark, feed).count()
    CitationIndex.emitChangeFeed(spark, dir, feed)
    assert(CitationIndex.changeFeed(spark, feed).count() == n0,
      "feed re-emission duplicated epochs")
  }

  test("torn batch residue is invisible at its own epoch and heals forward") {
    val dir = tmp("graft-cit-torn-asof")
    CitationIndex.build(s1, dir, slack = 50L)            // epoch 0
    // stage the tear: run the append on a mirror, copy every dir back
    // EXCEPT the commit table (_cit_docs)
    val mirror = tmp("graft-cit-torn-asof-mirror")
    copyDir(dir, mirror)
    CitationIndex.append(s2, mirror)
    Seq("post", "pairs", "dead_terms", "sub_terms", "deep_terms",
      "deep_df").foreach { sub =>
      copyDir(s"$mirror/$sub", s"$dir/$sub")
    }
    // the torn batch's rows are batch-keyed and its commit row never
    // landed: the snapshot counter holds and epoch 0 serves clean
    assert(CitationIndex.committedEpoch(spark, dir) == 0L)
    assert(gotAsOf(dir, 0L) == want(s1),
      "torn-batch residue leaked into the epoch-0 snapshot")
    assert(!CitationIndex.consistent(spark, dir), "tear went undetected")
    // the replay commits the batch at epoch 1; history stays exact
    CitationIndex.append(s2, dir)
    assert(CitationIndex.committedEpoch(spark, dir) == 1L)
    assert(gotAsOf(dir, 0L) == want(s1))
    assert(gotAsOf(dir, 1L) == want(s1.unionByName(s2)),
      "healed batch's snapshot diverged from the derivation")
    assert(CitationIndex.consistent(spark, dir))
  }

  test("round-16 nonce keys: residue cannot ride a later batch's colliding min id") {
    val dir = tmp("graft-cit-bkcollide")
    // slack = 500: no term can cross dfMax + slack on this corpus, so
    // the staged tear can never create deep-tier residue and the test
    // isolates the batch-KEY collision it exists to pin
    CitationIndex.build(s1, dir, slack = 500L)           // epoch 0
    // tear an append of the odd docs below 40 (min id 1): every data
    // table lands, the commit table never
    val torn = s2.filter(col("doc_id") < 40)
    val mirror = tmp("graft-cit-bkcollide-mirror")
    copyDir(dir, mirror)
    CitationIndex.append(torn, mirror)
    Seq("post", "pairs", "dead_terms", "sub_terms", "deep_terms",
      "deep_df").foreach { sub =>
      copyDir(s"$mirror/$sub", s"$dir/$sub")
    }
    // a later, DIFFERENTLY-GROUPED batch commits doc 1 — the torn
    // batch's min id. Under the legacy reconstructed grammar the
    // residue's key ("a1") would become constructible and its pair
    // and delta rows would gate into the snapshot, endpoints the torn
    // batch never committed included; the stored content-hash keys
    // make that collision unrepresentable.
    val b2 = corpus.filter(col("doc_id") === 1L)
    CitationIndex.append(b2, dir)                        // epoch 1
    assert(CitationIndex.committedEpoch(spark, dir) == 1L)
    assert(gotAsOf(dir, 0L) == want(s1),
      "torn-batch residue leaked into the epoch-0 snapshot")
    assert(gotAsOf(dir, 1L) == want(s1.unionByName(b2)),
      "torn-batch residue rode the later batch's colliding key " +
        "into the snapshot")
  }

  test("r21 collected-ledger probe: a legacy layout (null bk commit " +
      "rows) falls back to the constructed-key gate and serves the " +
      "same edges") {
    val dir = tmp("graft-cit-legacy-asof")
    CitationIndex.build(s1, dir, slack = 50L)            // epoch 0
    CitationIndex.append(s2, dir)                        // epoch 1
    val before0 = gotAsOf(dir, 0L)
    val before1 = gotAsOf(dir, 1L)
    // simulate a pre-round-16 layout: strip the stored batch key from
    // the BUILD-era commit rows (legacy rows read null bk; their rows'
    // own bk stays "b", exactly the mixed state an upgraded index has)
    // — the collected ledger then sees a null-bk group and must take
    // the legacy DataFrame key path
    val docs0 = spark.read.parquet(s"$dir/_cit_docs").localCheckpoint()
    docs0.withColumn("bk",
        when(col("bk") === "b", lit(null).cast("string"))
          .otherwise(col("bk")))
      .write.mode("overwrite").parquet(s"$dir/_cit_docs")
    assert(gotAsOf(dir, 0L) == before0,
      "legacy-key fallback diverged at epoch 0")
    assert(gotAsOf(dir, 1L) == before1,
      "legacy-key fallback diverged at epoch 1")
    assert(before1 == want(s1.unionByName(s2)))
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
