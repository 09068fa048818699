package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental union-find cluster store: maintained assignments ≡
  * from-scratch connected components over the chunk-share graph,
  * through cross-batch merges (one pointer row per absorbed root),
  * multi-hop chain chases, hub takeovers by smaller late arrivals,
  * component SPLITS under delete (stale chains through dead roots must
  * not serve), torn-epoch commits (invisible until meta, healed by
  * replay overwrite), and compaction (chains flattened to depth 1,
  * tombstones folded out physically, dead ids re-appendable). */
class ClusterStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  /** (doc, chunks...) rows to the store's input shape. */
  private def ch(rows: (Long, Seq[Long])*): DataFrame =
    rows.flatMap { case (d, hs) => hs.map(h => (d, h)) }
      .toDF("doc_id", "chunk_hash")

  private def got(dir: String): Map[Long, Long] =
    ClusterStore.assignments(spark, dir)
      .as[(Long, Long)].collect().toMap

  /** From-scratch ground truth: star edges to each chunk's min owner,
    * connected components, min-member labels, singletons self. */
  private def truth(chunks: DataFrame): Map[Long, Long] = {
    val hub = chunks.groupBy(col("chunk_hash"))
      .agg(min(col("doc_id")).as("hub"))
    val edges = chunks.join(hub, Seq("chunk_hash"))
      .filter(col("doc_id") =!= col("hub"))
      .select(col("doc_id").as("d1"), col("hub").as("d2"))
    val cc =
      if (edges.isEmpty) Map.empty[Long, Long]
      else Dedup.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap
    chunks.select(col("doc_id")).distinct().as[Long].collect()
      .map(d => d -> cc.getOrElse(d, d)).toMap
  }

  test("append equals a from-scratch clustering; merges cost one row per absorbed root") {
    // batch 1: comps {1,2} (chunk 100), {5,6} (chunk 200), singleton 9
    val b1 = ch(1L -> Seq(100L, 10L), 2L -> Seq(100L), 5L -> Seq(200L),
      6L -> Seq(200L), 9L -> Seq(300L))
    // batch 2: doc 7 bridges BOTH comps (chunks 100 + 200) — a
    // hyperedge merge of two existing components
    val b2 = ch(7L -> Seq(100L, 200L), 8L -> Seq(400L))
    val dir = tmp("graft-cs-basic")
    ClusterStore.build(b1, dir)
    assert(got(dir) == truth(b1))
    ClusterStore.append(b2, dir)
    val all = b1.unionByName(b2)
    assert(got(dir) == truth(all),
      "cross-batch hyperedge merge diverged from scratch clustering")
    assert(got(dir)(7L) == 1L && got(dir)(6L) == 1L,
      "merged component did not relabel to the global minimum")
    assert(ClusterStore.consistent(spark, dir))
    // singletons are free: no pointer rows for 9 or 8
    val srcs = spark.read.parquet(s"$dir/stars")
      .select(col("src")).as[Long].collect().toSet
    assert(!srcs.contains(9L) && !srcs.contains(8L),
      "singleton docs must not occupy pointer rows")
  }

  test("multi-hop chase: two successive merges resolve through the transition chain") {
    val b1 = ch(10L -> Seq(1L), 11L -> Seq(1L))          // comp {10,11}
    val b2 = ch(5L -> Seq(2L), 6L -> Seq(2L, 1L))        // merge -> rep 5
    val b3 = ch(3L -> Seq(3L), 4L -> Seq(3L, 2L))        // merge -> rep 3
    val dir = tmp("graft-cs-chain")
    ClusterStore.build(b1, dir)
    ClusterStore.append(b2, dir)
    ClusterStore.append(b3, dir)
    val all = b1.unionByName(b2).unionByName(b3)
    assert(got(dir) == truth(all))
    // doc 11's chain passes the absorbed roots 10 -> 5 -> 3
    val r = ClusterStore.resolve(spark, dir,
      Seq(11L).toDF("doc_id")).as[(Long, Long)].collect().toMap
    assert(r(11L) == 3L, s"chain chase resolved to ${r(11L)}, want 3")
  }

  test("hub takeover: a smaller late doc takes a chunk over and re-hangs the old hub") {
    val b1 = ch(20L -> Seq(7L), 21L -> Seq(7L))
    val b2 = ch(2L -> Seq(7L)) // smaller than the existing hub 20
    val dir = tmp("graft-cs-hub")
    ClusterStore.build(b1, dir)
    ClusterStore.append(b2, dir)
    assert(got(dir) == Map(20L -> 2L, 21L -> 2L, 2L -> 2L))
  }

  test("append replay and partial-overlap batches are no-ops for committed docs") {
    val b1 = ch(1L -> Seq(100L), 2L -> Seq(100L))
    val b2 = ch(2L -> Seq(100L), 3L -> Seq(100L, 500L)) // 2 already in
    val dir = tmp("graft-cs-replay")
    ClusterStore.build(b1, dir)
    ClusterStore.append(b2, dir)
    val after = got(dir)
    assert(after == truth(b1.unionByName(b2)))
    ClusterStore.append(b2, dir) // full replay of a committed batch
    assert(got(dir) == after, "committed replay changed assignments")
    assert(ClusterStore.consistent(spark, dir))
  }

  test("delete splits a component and severs stale chains through the dead root") {
    // one comp {1,2,3,4}: 1-2 share 100, 3-4 share 200, 1-3 share 300
    val b = ch(1L -> Seq(100L, 300L), 2L -> Seq(100L),
      3L -> Seq(200L, 300L), 4L -> Seq(200L))
    val dir = tmp("graft-cs-split")
    ClusterStore.build(b, dir)
    assert(got(dir) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // deleting 1 (the ROOT and the 100/300 hub) splits {2} from {3,4}
    ClusterStore.delete(Seq(1L).toDF("doc_id"), dir)
    assert(got(dir) == Map(2L -> 2L, 3L -> 3L, 4L -> 3L),
      "split components did not re-hub on the minimum survivors")
    assert(ClusterStore.consistent(spark, dir))
    // delete the rest of one side; re-delete is a no-op
    ClusterStore.delete(Seq(3L, 4L).toDF("doc_id"), dir)
    assert(got(dir) == Map(2L -> 2L))
    ClusterStore.delete(Seq(3L, 4L).toDF("doc_id"), dir)
    assert(got(dir) == Map(2L -> 2L))
    assert(ClusterStore.consistent(spark, dir))
  }

  test("append after delete probes live hubs only; tombstoned ids cannot re-enter") {
    val b = ch(1L -> Seq(100L), 2L -> Seq(100L), 3L -> Seq(200L))
    val dir = tmp("graft-cs-afterdel")
    ClusterStore.build(b, dir)
    ClusterStore.delete(Seq(1L).toDF("doc_id"), dir)
    // new doc shares 100: must connect to the SURVIVOR 2, not dead 1
    ClusterStore.append(ch(5L -> Seq(100L)), dir)
    assert(got(dir) == Map(2L -> 2L, 3L -> 3L, 5L -> 2L))
    // tombstoned 1 cannot be re-appended until compaction folds it out
    ClusterStore.append(ch(1L -> Seq(100L)), dir)
    assert(got(dir) == Map(2L -> 2L, 3L -> 3L, 5L -> 2L),
      "tombstoned id re-entered before compaction")
    val dest = tmp("graft-cs-afterdel-compact")
    ClusterStore.compactTo(spark, dir, dest)
    ClusterStore.append(ch(1L -> Seq(100L)), dest)
    assert(got(dest) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 5L -> 1L),
      "compaction did not make the dead id re-appendable")
  }

  test("torn epoch: residue is invisible, consistent() reports it, replay heals by overwrite") {
    val b1 = ch(1L -> Seq(100L), 2L -> Seq(100L))
    val b2 = ch(3L -> Seq(100L, 200L), 4L -> Seq(200L))
    val dir = tmp("graft-cs-torn")
    ClusterStore.build(b1, dir)
    val before = got(dir)
    // stage the tear: run the append on a mirror, copy its new epoch
    // dirs back WITHOUT the meta commit
    val mirror = tmp("graft-cs-torn-mirror")
    copyDir(dir, mirror)
    ClusterStore.append(b2, mirror)
    Seq("posts", "fwd", "stars", "tombs").foreach { sub =>
      copyDir(s"$mirror/$sub/e=1", s"$dir/$sub/e=1")
    }
    assert(!ClusterStore.consistent(spark, dir),
      "torn epoch went undetected")
    assert(got(dir) == before,
      "uncommitted epoch rows leaked into serving")
    ClusterStore.append(b2, dir) // the replay
    assert(ClusterStore.consistent(spark, dir))
    assert(got(dir) == truth(b1.unionByName(b2)),
      "replay over residue diverged from the derivation")
  }

  test("torn upsert's rev residue cannot be committed by a later verb at the same epoch") {
    // round-14 advice: upsert's rev/e=E registry dir used to be written
    // OUTSIDE writeEpoch's replace-as-a-unit discipline, and append/
    // delete never touched rev/ — so a torn upsert's residue was
    // committed by the next verb's meta flip at the same epoch number,
    // pinning those docs' membership generation to an epoch holding
    // none of their membership rows (currentRows drops them; compactTo
    // loses them physically). writeEpoch now owns rev/e=E for EVERY
    // verb (empty overwrite for append/delete/compact).
    val b0 = ch(1L -> Seq(100L), 2L -> Seq(100L), 5L -> Seq(200L))
    val dir = tmp("graft-cs-torn-rev")
    ClusterStore.build(b0, dir) // epoch 0
    // stage the tear: run an UPSERT of doc 2 on a mirror, copy its e=1
    // dirs back (rev/ included) WITHOUT the meta commit
    val mirror = tmp("graft-cs-torn-rev-mirror")
    copyDir(dir, mirror)
    ClusterStore.upsert(ch(2L -> Seq(300L)), mirror)
    Seq("posts", "fwd", "stars", "tombs", "rev").foreach { sub =>
      copyDir(s"$mirror/$sub/e=1", s"$dir/$sub/e=1")
    }
    assert(!ClusterStore.consistent(spark, dir), "tear went undetected")
    assert(got(dir) == truth(b0), "uncommitted residue leaked into serving")
    // a DIFFERENT verb now commits epoch 1: an append of a fresh doc.
    // Its meta flip must not also commit the upsert's rev/e=1 residue.
    ClusterStore.append(ch(9L -> Seq(900L)), dir)
    val all = b0.unionByName(ch(9L -> Seq(900L)))
    assert(got(dir).contains(2L),
      "doc 2's membership generation was pinned to the residue epoch")
    assert(got(dir) == truth(all),
      "torn-upsert rev residue was committed by the next verb's meta flip")
    assert(ClusterStore.consistent(spark, dir))
    // and compaction must carry every doc through
    val dest = tmp("graft-cs-torn-rev-cmp")
    ClusterStore.compactTo(spark, dir, dest)
    assert(got(dest) == got(dir),
      "compaction physically lost a residue-pinned doc")
  }

  test("compaction flattens chains to depth 1 and physically drops tombstoned postings") {
    val b1 = ch(10L -> Seq(1L), 11L -> Seq(1L))
    val b2 = ch(5L -> Seq(2L), 6L -> Seq(2L, 1L))
    val b3 = ch(3L -> Seq(3L), 4L -> Seq(3L, 2L))
    val dir = tmp("graft-cs-compact")
    ClusterStore.build(b1, dir)
    ClusterStore.append(b2, dir)
    ClusterStore.append(b3, dir)
    ClusterStore.delete(Seq(4L).toDF("doc_id"), dir)
    val dest = tmp("graft-cs-compact-dest")
    ClusterStore.compactTo(spark, dir, dest)
    assert(ClusterStore.consistent(spark, dest))
    assert(got(dest) == got(dir), "compaction moved an assignment")
    // depth 1: no pointer row's destination is another row's source
    val rows = spark.read.parquet(s"$dest/stars")
      .select(col("src"), col("dst")).as[(Long, Long)].collect()
    val srcs = rows.map(_._1).toSet
    assert(rows.forall { case (_, dst) => !srcs.contains(dst) },
      "compacted forest still has multi-hop chains")
    // physical drop: the tombstoned doc's postings are gone from disk
    val postDocs = spark.read.parquet(s"$dest/posts")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(!postDocs.contains(4L), "tombstoned postings survived the fold")
    val tombRows = spark.read.parquet(s"$dest/tombs")
    assert(tombRows.isEmpty, "compacted layout carries tombstones")
  }

  test("point resolve matches assignments and leaves unknown ids at self") {
    val b = ch(1L -> Seq(100L), 2L -> Seq(100L), 7L -> Seq(9L))
    val dir = tmp("graft-cs-resolve")
    ClusterStore.build(b, dir)
    val r = ClusterStore.resolve(spark, dir,
      Seq(2L, 7L, 99L).toDF("doc_id")).as[(Long, Long)].collect().toMap
    assert(r == Map(2L -> 1L, 7L -> 7L, 99L -> 99L))
  }

  test("in-place rebuild wipes a previous life's epochs and tombstones") {
    val b1 = ch(1L -> Seq(100L), 2L -> Seq(100L), 3L -> Seq(200L))
    val dir = tmp("graft-cs-rebuild")
    ClusterStore.build(b1, dir)
    ClusterStore.delete(Seq(1L).toDF("doc_id"), dir)
    ClusterStore.append(ch(4L -> Seq(200L)), dir)
    ClusterStore.build(b1, dir) // in-place rebuild
    assert(got(dir) == truth(b1),
      "rebuild inherited state from the previous life")
    assert(ClusterStore.consistent(spark, dir))
  }

  test("pointer-chase round bound scales with committed epochs (advice: long-lived stores)") {
    // chain depth legitimately grows one hop per absorbing epoch since
    // the last compaction — a fixed 64 would abort VALID reads on a
    // store taken through >64 append/delete epochs, misdiagnosed as
    // corruption (round-14 advice item 4)
    assert(ClusterStore.roundBound(0L) == 64L)
    assert(ClusterStore.roundBound(62L) == 64L)
    assert(ClusterStore.roundBound(63L) == 65L)
    assert(ClusterStore.roundBound(500L) == 502L)
  }

  test("upsert splits AND merges in one epoch; equals scratch clustering over revised chunks") {
    // comps: {1,2,3} via chunk 100, {5,6} via 200, singleton 9
    val base = ch(1L -> Seq(100L), 2L -> Seq(100L, 110L), 3L -> Seq(100L),
      5L -> Seq(200L), 6L -> Seq(200L), 9L -> Seq(300L))
    val dir = tmp("graft-cs-upsert")
    ClusterStore.build(base, dir)
    assert(got(dir) == truth(base))
    // revise doc 2: drops chunk 100/110 (it LEAVES {1,2,3} — no split
    // of the others since 1,3 still share 100) and gains 200 (it
    // MERGES into {5,6}) plus a fresh chunk 500
    val rev = ch(2L -> Seq(200L, 500L))
    ClusterStore.upsert(rev, dir)
    val revised = ch(1L -> Seq(100L), 2L -> Seq(200L, 500L),
      3L -> Seq(100L), 5L -> Seq(200L), 6L -> Seq(200L), 9L -> Seq(300L))
    assert(got(dir) == truth(revised),
      "split+merge upsert diverged from scratch clustering over revised chunks")
    assert(got(dir)(2L) == 2L && got(dir)(6L) == 2L && got(dir)(5L) == 2L,
      "doc 2 must now lead the {2,5,6} component")
    assert(got(dir)(1L) == 1L && got(dir)(3L) == 1L,
      "{1,3} must survive doc 2's departure intact")
    assert(ClusterStore.consistent(spark, dir))
    // committed replay is a PURE no-op: same epoch counter after
    val (e1, _) = (spark.read.parquet(s"$dir/_cs_meta").head().getLong(0), 0)
    ClusterStore.upsert(rev, dir)
    assert(spark.read.parquet(s"$dir/_cs_meta").head().getLong(0) == e1,
      "committed-replay upsert burned an epoch")
    assert(got(dir) == truth(revised))
    // revise BACK: doc 2 rejoins {1,3}, leaves {5,6}
    ClusterStore.upsert(ch(2L -> Seq(100L, 110L)), dir)
    assert(got(dir) == truth(base), "reverse revision must restore the base clustering")
    // a genuine component SPLIT: {1,2,3} hangs on chunk 100; revising
    // doc 1 (the hub AND the rep) away splits nothing structurally but
    // relabels; revising doc 2 away from 100 while 1 keeps it...
    // instead revise ALL of doc 3's chunks to fresh ones: {1,2} keep
    // 100, 3 becomes singleton-ish under 600
    ClusterStore.upsert(ch(3L -> Seq(600L)), dir)
    val afterSplit = ch(1L -> Seq(100L), 2L -> Seq(100L, 110L),
      3L -> Seq(600L), 5L -> Seq(200L), 6L -> Seq(200L), 9L -> Seq(300L))
    assert(got(dir) == truth(afterSplit),
      "membership-drop split diverged from scratch clustering")
    assert(got(dir)(3L) == 3L, "doc 3 must be its own representative now")
    // upsert doubles as insert; tombstoned ids stay dead
    ClusterStore.upsert(ch(11L -> Seq(100L)), dir)
    assert(got(dir)(11L) == 1L, "inserted doc must join chunk 100's component")
    ClusterStore.delete(Seq(11L).toDF("doc_id"), dir)
    ClusterStore.upsert(ch(11L -> Seq(100L)), dir)
    assert(!got(dir).contains(11L), "tombstoned id re-entered via upsert")
    assert(ClusterStore.consistent(spark, dir))
    // compaction folds superseded generations physically
    val dest = tmp("graft-cs-upsert-cmp")
    ClusterStore.compactTo(spark, dir, dest)
    val want = got(dir)
    assert(got(dest) == want, "compaction changed assignments")
    assert(spark.read.parquet(s"$dest/posts")
      .filter(col("doc_id") === 3L && col("chunk_hash") =!= 600L)
      .count() == 0L, "superseded membership rows survived compaction")
  }

  test("upsert merges across components through an external hub's root chain") {
    // two multi-hop components built across batches so roots have
    // transition history: {1,2} + {3,4} merged via doc 0 later
    val dir = tmp("graft-cs-upsert-ext")
    ClusterStore.build(ch(3L -> Seq(310L), 4L -> Seq(310L)), dir)
    ClusterStore.append(ch(1L -> Seq(101L), 2L -> Seq(101L)), dir)
    ClusterStore.append(ch(10L -> Seq(400L), 11L -> Seq(400L)), dir)
    // revise doc 4: keeps 310, gains 400 — merges {3,4} with {10,11}
    // through external hub 10's root
    ClusterStore.upsert(ch(4L -> Seq(310L, 400L)), dir)
    val revised = ch(3L -> Seq(310L), 4L -> Seq(310L, 400L),
      1L -> Seq(101L), 2L -> Seq(101L), 10L -> Seq(400L), 11L -> Seq(400L))
    assert(got(dir) == truth(revised),
      "external-hub merge diverged from scratch clustering")
    assert(got(dir)(11L) == 3L && got(dir)(4L) == 3L,
      "merged component must relabel to global min 3")
    assert(ClusterStore.consistent(spark, dir))
  }

  test("time travel: assignmentsAsOf replays every epoch's exact state (q164)") {
    val dir = tmp("graft-cs-asof")
    val b0 = ch(1L -> Seq(100L), 2L -> Seq(100L), 5L -> Seq(200L))
    val b1 = ch(6L -> Seq(200L), 9L -> Seq(300L))
    ClusterStore.build(b0, dir)                      // epoch 0
    ClusterStore.append(b1, dir)                     // epoch 1: {5,6} merge
    // epoch 2: doc 2 drops chunk 100 (splits {1,2}), gains 300
    // (merges with 9 through an external hub)
    ClusterStore.upsert(ch(2L -> Seq(300L)), dir)
    ClusterStore.delete(Seq(5L).toDF("doc_id"), dir) // epoch 3: {5,6} split
    assert(ClusterStore.committedEpoch(spark, dir) == 3L)
    val history = Seq(
      0L -> b0,
      1L -> b0.unionByName(b1),
      2L -> ch(1L -> Seq(100L), 2L -> Seq(300L), 5L -> Seq(200L),
        6L -> Seq(200L), 9L -> Seq(300L)),
      3L -> ch(1L -> Seq(100L), 2L -> Seq(300L), 6L -> Seq(200L),
        9L -> Seq(300L)))
    history.foreach { case (e, chunks) =>
      val gotE = ClusterStore.assignmentsAsOf(spark, dir, e)
        .as[(Long, Long)].collect().toMap
      assert(gotE == truth(chunks),
        s"as-of epoch $e diverged from that epoch's from-scratch truth")
    }
    // as-of the committed epoch IS the current serve
    assert(ClusterStore.assignmentsAsOf(spark, dir, 3L)
      .as[(Long, Long)].collect().toMap == got(dir))
    // outside the committed history: loud refusal both ways
    intercept[IllegalArgumentException] {
      ClusterStore.assignmentsAsOf(spark, dir, 4L)
    }
    intercept[IllegalArgumentException] {
      ClusterStore.assignmentsAsOf(spark, dir, -1L)
    }
    // compaction is the explicit vacuum: history folds to epoch 0 and
    // only the final state remains addressable
    val dest = tmp("graft-cs-asof-dst")
    ClusterStore.compactTo(spark, dir, dest)
    assert(ClusterStore.committedEpoch(spark, dest) == 0L)
    assert(ClusterStore.assignmentsAsOf(spark, dest, 0L)
      .as[(Long, Long)].collect().toMap == got(dir),
      "compacted epoch 0 must serve the pre-compaction final state")
  }

  test("cross-snapshot diff labels inserted/deleted/relabeled/kept exactly (q166)") {
    val dir = tmp("graft-cs-diff")
    // epoch 0: comps {1,2} (chunk 100), singletons 5, 7
    ClusterStore.build(ch(1L -> Seq(100L), 2L -> Seq(100L),
      5L -> Seq(200L), 7L -> Seq(500L)), dir)
    // epoch 1: doc 2 revises away from 1 and onto chunk 300, which the
    // brand-new doc 12 (an INSERT through upsert) also carries
    ClusterStore.upsert(ch(2L -> Seq(300L), 12L -> Seq(300L)), dir)
    // epoch 2: takedown of 5
    ClusterStore.delete(Seq(5L).toDF("doc_id"), dir)
    val diff = ClusterStore.diffAsOf(spark, dir, 0L, 2L)
      .select(col("doc_id"), col("old_rep"), col("new_rep"), col("change"))
      .as[(Long, Option[Long], Option[Long], String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(diff == Map(
      1L -> ((Some(1L), Some(1L), "kept")),       // lost 2, still rep 1
      2L -> ((Some(1L), Some(2L), "relabeled")),  // split then new comp
      5L -> ((Some(5L), None, "deleted")),
      7L -> ((Some(7L), Some(7L), "kept")),
      12L -> ((None, Some(2L), "inserted"))),
      "diff labels diverged from the epoch truth")
    // a self-diff is all kept; a backwards window refuses
    assert(ClusterStore.diffAsOf(spark, dir, 2L, 2L)
      .filter(col("change") =!= "kept").count() == 0L)
    intercept[IllegalArgumentException] {
      ClusterStore.diffAsOf(spark, dir, 2L, 0L)
    }
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
