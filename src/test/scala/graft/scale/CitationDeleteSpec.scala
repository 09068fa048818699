package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tombstone deletes for the citation index: delete ≡ rebuild on the
  * survivor corpus through every df transition deletion can cause —
  * band→sub (edges vanish, support rows persist), purgatory→band
  * (REVIVAL: edges appear among survivors from retained postings),
  * purgatory→sub, and the deep guard (a delete that would revive a
  * term whose postings were dropped refuses loudly). Plus mixed
  * append/delete lifecycles, torn-delete healing, and compaction
  * folding tombstones away (deleted ids become re-appendable). */
class CitationDeleteSpec extends AnyFunSuite {
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

  private def want(docs: org.apache.spark.sql.DataFrame,
      dfMin: Long = 2, dfMax: Long = 4): Set[(Long, Long, Long)] =
    Graph.citationEdgesWeighted(docs, n = 3, dfMin = dfMin, dfMax = dfMax)
      .as[(Long, Long, Long)].collect().toSet

  private def doc(id: Long, phrase: String) =
    (id, s"$phrase filler$id pad$id")

  test("delete equals a from-scratch derivation on the survivors; mixed lifecycle") {
    val dir = tmp("graft-citdel")
    val base = corpus.filter(col("doc_id") < 400)
    val victims = base.filter(col("doc_id") % 5 === 0)
    val survivors = base.filter(col("doc_id") % 5 =!= 0)
    val later = corpus.filter(col("doc_id") >= 400 && col("doc_id") < 500)
    // slack ≥ tombstone count makes the deep guard unreachable
    CitationIndex.build(base, dir, slack = victims.count())
    CitationIndex.delete(victims, dir)
    assert(CitationIndex.consistent(spark, dir))
    assert(got(dir) == want(survivors),
      "delete diverged from the survivor-corpus derivation")
    assert(got(dir).nonEmpty, "fixture produced no surviving edges")
    // re-delete is a no-op
    val after = got(dir)
    CitationIndex.delete(victims, dir)
    assert(got(dir) == after, "re-delete changed the edge set")
    // append AFTER delete: classification must run against survivor
    // postings (tombstoned docs excluded from dfBefore and reach-back)
    CitationIndex.append(later, dir)
    assert(CitationIndex.consistent(spark, dir))
    assert(got(dir) == want(survivors.unionByName(later)),
      "append-after-delete diverged from the survivor+batch derivation")
  }

  test("revival: a purgatory term falling back into the band regenerates surviving pairs") {
    // "delta epsilon zeta" df 5 > dfMax 4 -> dead; slack 2 keeps its
    // postings (purgatory); deleting one doc -> df 4: back in band
    val docs = Seq(
      doc(10, "delta epsilon zeta"), doc(11, "delta epsilon zeta"),
      doc(12, "delta epsilon zeta"), doc(13, "delta epsilon zeta"),
      doc(14, "delta epsilon zeta"),
      doc(1, "alpha beta gamma"), doc(2, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val dir = tmp("graft-citdel-rev")
    CitationIndex.build(docs, dir, slack = 2)
    assert(!got(dir).exists(e => e._1 >= 10),
      "dead-term edges present before the delete")
    val vic = docs.filter(col("doc_id") === 14)
    CitationIndex.delete(vic, dir)
    val after = got(dir)
    assert(after == want(docs.filter(col("doc_id") =!= 14)),
      "revival diverged from the survivor derivation")
    assert(after.contains((13L, 10L, 1L)),
      s"revived term did not regenerate pairs among survivors: $after")
    assert(CitationIndex.consistent(spark, dir))
    // and the revived term can die again by append
    CitationIndex.append(
      Seq(doc(15, "delta epsilon zeta")).toDF("doc_id", "text"), dir)
    assert(got(dir) == want(docs.filter(col("doc_id") =!= 14)
      .unionByName(Seq(doc(15, "delta epsilon zeta"))
        .toDF("doc_id", "text"))),
      "re-death after revival diverged")
  }

  test("band fall to sub kills stale survivor pairs; re-entry by append restores them") {
    // dfMin 3: a df-3 band term falling to df 2 leaves a stale pair
    // between the two SURVIVORS that only the sub mark can kill
    val docs = Seq(
      doc(1, "alpha beta gamma"), doc(2, "alpha beta gamma"),
      doc(3, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val dir = tmp("graft-citdel-sub")
    CitationIndex.build(docs, dir, n = 3, dfMin = 3, dfMax = 4, slack = 2)
    assert(got(dir).contains((2L, 1L, 1L)), "band edges missing at build")
    CitationIndex.delete(docs.filter(col("doc_id") === 3), dir)
    val surv = docs.filter(col("doc_id") =!= 3)
    assert(got(dir) == want(surv, dfMin = 3, dfMax = 4),
      "sub transition diverged from the survivor derivation")
    assert(!got(dir).contains((2L, 1L, 1L)),
      "stale survivor pair outlived the band fall (sub mark missing)")
    // re-entry: a new doc with the phrase brings df back to 3; the
    // reach-back regenerates and the sub mark lifts
    val more = Seq(doc(4, "alpha beta gamma")).toDF("doc_id", "text")
    CitationIndex.append(more, dir)
    val all = surv.unionByName(more)
    assert(got(dir) == want(all, dfMin = 3, dfMax = 4),
      "sub re-entry diverged")
    assert(got(dir).contains((2L, 1L, 1L)),
      "re-entered term did not restore the survivor pair")
    assert(CitationIndex.consistent(spark, dir))
  }

  test("purgatory falling straight below the band revives to sub, then re-enters") {
    // df 5 (dead, purgatory at slack 4) -> delete 4 docs -> df 1
    val docs = Seq(
      doc(10, "delta epsilon zeta"), doc(11, "delta epsilon zeta"),
      doc(12, "delta epsilon zeta"), doc(13, "delta epsilon zeta"),
      doc(14, "delta epsilon zeta"),
      doc(1, "alpha beta gamma"), doc(2, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val dir = tmp("graft-citdel-psub")
    CitationIndex.build(docs, dir, slack = 4)
    CitationIndex.delete(docs.filter(col("doc_id").between(11, 14)), dir)
    val surv = docs.filter(!col("doc_id").between(11, 14))
    assert(got(dir) == want(surv), "purgatory->sub transition diverged")
    assert(!got(dir).exists(e => e._1 >= 10 || e._2 >= 10),
      "edges survived a term's fall below dfMin")
    // re-entry from sub: one more doc with the phrase -> df 2
    val more = Seq(doc(15, "delta epsilon zeta")).toDF("doc_id", "text")
    CitationIndex.append(more, dir)
    assert(got(dir) == want(surv.unionByName(more)),
      "re-entry from purgatory-sub diverged")
    assert(got(dir).contains((15L, 10L, 1L)),
      "re-entered term missing the survivor pair")
  }

  test("deep guard: reviving a term whose postings were dropped refuses loudly") {
    // slack 0: df 5 goes DEEP (postings dropped); deleting one of its
    // docs would leave df 4 <= dfMax -> must refuse
    val docs = Seq(
      doc(10, "delta epsilon zeta"), doc(11, "delta epsilon zeta"),
      doc(12, "delta epsilon zeta"), doc(13, "delta epsilon zeta"),
      doc(14, "delta epsilon zeta"),
      doc(1, "alpha beta gamma"), doc(2, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val dir = tmp("graft-citdel-deep")
    CitationIndex.build(docs, dir, slack = 0)
    val ex = intercept[IllegalArgumentException] {
      CitationIndex.delete(docs.filter(col("doc_id") === 14), dir)
    }
    assert(ex.getMessage.contains("deep"), s"wrong refusal: ${ex.getMessage}")
    // the refused delete left no partial state behind
    assert(got(dir) == want(docs), "refused delete mutated the edge set")
    assert(CitationIndex.consistent(spark, dir))
    // a delete NOT pulling the deep term to the band proceeds: victims
    // that never contained it
    CitationIndex.delete(docs.filter(col("doc_id") === 2), dir)
    assert(got(dir) == want(docs.filter(col("doc_id") =!= 2)),
      "unrelated delete diverged with a deep term present")
  }

  test("deep decrement tracking: repeated safe deletes keep the exact counter") {
    // df 8 deep at slack 0; delete 3 docs one batch at a time -> df 5
    // stays > dfMax throughout, edges never appear
    val docs = (10L to 17L).map(i => doc(i, "delta epsilon zeta"))
      .toDF("doc_id", "text")
      .unionByName(Seq(doc(1, "alpha beta gamma"),
        doc(2, "alpha beta gamma")).toDF("doc_id", "text"))
    val dir = tmp("graft-citdel-deepok")
    CitationIndex.build(docs, dir, slack = 0)
    Seq(10L, 11L, 12L).foreach { id =>
      CitationIndex.delete(docs.filter(col("doc_id") === id), dir)
    }
    assert(got(dir) == want(docs.filter(col("doc_id") > 12 || col("doc_id") < 10)),
      "safe deep decrements diverged")
    // the counter is exact: one more round of 2 victims -> df 3 would
    // revive -> refuse
    val ex = intercept[IllegalArgumentException] {
      CitationIndex.delete(docs.filter(col("doc_id").isin(13L, 14L)), dir)
    }
    assert(ex.getMessage.contains("deep"))
  }

  test("torn deletes are detected and heal on replay") {
    val dir = tmp("graft-citdel-heal")
    val base = corpus.filter(col("doc_id") < 300)
    val victims = base.filter(col("doc_id") % 7 === 0)
    CitationIndex.build(base, dir, slack = victims.count())
    val ref = tmp("graft-citdel-heal-ref")
    copyDir(dir, ref)
    CitationIndex.delete(victims, ref)
    val target = got(ref)
    // stage the tear: run the real delete on a mirror, copy back
    // everything EXCEPT the tombstone commit
    val mirror = tmp("graft-citdel-mirror")
    copyDir(dir, mirror)
    CitationIndex.delete(victims, mirror)
    Seq("dead_terms", "sub_terms", "deep_df", "pairs").foreach { t =>
      deleteDir(s"$dir/$t")
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$mirror/$t")))
        copyDir(s"$mirror/$t", s"$dir/$t")
    }
    assert(!CitationIndex.consistent(spark, dir),
      "torn delete (deltas without tombs) not detected")
    CitationIndex.delete(victims, dir)
    assert(CitationIndex.consistent(spark, dir))
    assert(got(dir) == target, "healed delete diverges from the clean run")
    // delta keys not double-inserted by the replay
    Seq("dead_terms", "sub_terms", "deep_df").foreach { t =>
      val p = java.nio.file.Paths.get(s"$dir/$t")
      if (java.nio.file.Files.exists(p)) {
        val dups = spark.read.parquet(s"$dir/$t")
          .groupBy(col("term"), col("k")).count()
          .filter(col("count") > 1).count()
        assert(dups == 0L, s"replay double-inserted $t deltas")
      }
    }
  }

  test("compaction folds tombstones: physical drop, same edges, deleted ids re-appendable") {
    val dir = tmp("graft-citdel-cmp")
    val base = corpus.filter(col("doc_id") < 300)
    val victims = base.filter(col("doc_id") % 7 === 0)
    val survivors = base.filter(col("doc_id") % 7 =!= 0)
    CitationIndex.build(base, dir, slack = victims.count())
    CitationIndex.delete(victims, dir)
    val dest = tmp("graft-citdel-cmp-dst")
    CitationIndex.compactTo(spark, dir, dest)
    assert(CitationIndex.consistent(spark, dest))
    assert(got(dest) == got(dir), "compaction changed the edge set")
    // tombstoned docs physically gone from postings and the doc set
    assert(spark.read.parquet(s"$dest/post")
      .join(victims.select(col("doc_id")), Seq("doc_id")).count() == 0L,
      "compaction left tombstoned postings")
    assert(spark.read.parquet(s"$dest/_cit_docs")
      .join(victims.select(col("doc_id")), Seq("doc_id")).count() == 0L,
      "compaction left tombstoned doc ids committed")
    // a deleted id is re-appendable after compaction
    val back = victims.filter(col("doc_id") < 100)
    CitationIndex.append(back, dest)
    assert(got(dest) == want(survivors.unionByName(back)),
      "re-append of compacted-away ids diverged")
    assert(CitationIndex.consistent(spark, dest))
  }

  test("sub mark lifecycle: sub -> dead (via append) -> revived (via delete) serves band edges") {
    // the subtle interleaving: a sub-marked term dies by append (the
    // mark rides along, benign while dead) and later revives by
    // delete — the revival must CLEAR the stale sub mark or the
    // regenerated pairs are silently filtered forever
    val d1 = Seq(doc(1, "alpha beta gamma"), doc(2, "alpha beta gamma"),
      doc(3, "alpha beta gamma")).toDF("doc_id", "text")
    val dir = tmp("graft-citdel-sublife")
    CitationIndex.build(d1, dir, slack = 4)
    CitationIndex.delete(d1.filter(col("doc_id").isin(2L, 3L)), dir) // df 3 -> 1: fell, sub
    val d2 = (4L to 8L).map(i => doc(i, "alpha beta gamma"))
      .toDF("doc_id", "text")
    CitationIndex.append(d2, dir) // df 1 -> 6: newlyDead, sub mark still standing
    assert(got(dir) == want(d1.filter(col("doc_id") === 1).unionByName(d2)),
      "dead term served edges")
    CitationIndex.delete(d2.filter(col("doc_id").isin(7L, 8L)), dir) // df 6 -> 4: revival
    val surv = d1.filter(col("doc_id") === 1)
      .unionByName(d2.filter(!col("doc_id").isin(7L, 8L)))
    assert(got(dir) == want(surv),
      "revival under a stale sub mark diverged — the mark was not cleared")
    assert(got(dir).contains((4L, 1L, 1L)), "revived band edge missing")
    assert(CitationIndex.consistent(spark, dir))
  }

  test("in-place rebuild resets tombstones and sub marks") {
    // the deep guard's own error message recommends rebuild-with-
    // larger-slack; an in-place build must not inherit the previous
    // life's delete-era state
    val dir = tmp("graft-citdel-rebuild")
    val base = corpus.filter(col("doc_id") < 300)
    val victims = base.filter(col("doc_id") % 5 === 0)
    CitationIndex.build(base, dir, slack = victims.count())
    CitationIndex.delete(victims, dir)
    assert(got(dir) == want(base.filter(col("doc_id") % 5 =!= 0)))
    CitationIndex.build(base, dir, slack = 2 * victims.count())
    assert(got(dir) == want(base),
      "in-place rebuild inherited stale tombstones or sub marks")
    assert(CitationIndex.consistent(spark, dir))
  }

  test("delete between a torn append and its replay classifies against committed postings only") {
    val dir = tmp("graft-citdel-torninter")
    val base = corpus.filter(col("doc_id") < 300)
    val batch = corpus.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val victims = base.filter(col("doc_id") % 7 === 1)
    CitationIndex.build(base, dir, slack = victims.count() + 5)
    // stage the torn append: post rows land, docs never commit
    val mirror = tmp("graft-citdel-torninter-mirror")
    copyDir(dir, mirror)
    CitationIndex.append(batch, mirror)
    deleteDir(s"$dir/post"); copyDir(s"$mirror/post", s"$dir/post")
    assert(!CitationIndex.consistent(spark, dir))
    // the interleaved delete must recount df over COMMITTED postings —
    // residue rows would misclassify revival/fall transitions
    CitationIndex.delete(victims, dir)
    // now the torn append replays (heals) on the tombstoned index
    CitationIndex.append(batch, dir)
    assert(CitationIndex.consistent(spark, dir))
    val survPlusBatch = base.filter(col("doc_id") % 7 =!= 1)
      .unionByName(batch)
    assert(got(dir) == want(survPlusBatch),
      "delete over torn-append residue diverged from the derivation")
  }

  test("legacy pre-slack layout: deleting a doc of a postings-less dead term refuses loudly") {
    val docs = Seq(
      doc(10, "delta epsilon zeta"), doc(11, "delta epsilon zeta"),
      doc(12, "delta epsilon zeta"), doc(13, "delta epsilon zeta"),
      doc(14, "delta epsilon zeta"),
      doc(1, "alpha beta gamma"), doc(2, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val dir = tmp("graft-citdel-legacy")
    CitationIndex.build(docs, dir, slack = 0)
    // degrade to the legacy layout: plain-term dead table, no deep
    // tables, pre-slack meta
    val dead = spark.read.parquet(s"$dir/dead_terms").select(col("term"))
      .collect().map(_.getString(0)).toSeq
    deleteDir(s"$dir/dead_terms"); deleteDir(s"$dir/deep_terms")
    deleteDir(s"$dir/deep_df"); deleteDir(s"$dir/sub_terms")
    deleteDir(s"$dir/_cit_tombs")
    dead.toDF("term").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/dead_terms")
    spark.range(1).select(lit(3).as("n"), lit(2L).as("df_min"),
        lit(4L).as("df_max"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_cit_meta")
    // serving still works on the legacy layout
    assert(got(dir) == want(docs), "legacy layout stopped serving")
    // a delete touching the dead term cannot know its df (postings
    // gone, no counter) -> must refuse, never silently skip revival
    val ex = intercept[IllegalArgumentException] {
      CitationIndex.delete(docs.filter(col("doc_id") === 14), dir)
    }
    assert(ex.getMessage.contains("deep"), s"wrong refusal: ${ex.getMessage}")
    // a delete not touching it proceeds
    CitationIndex.delete(docs.filter(col("doc_id") === 2), dir)
    assert(got(dir) == want(docs.filter(col("doc_id") =!= 2)),
      "legacy-layout delete of an unrelated doc diverged")
  }

  private def copyDir(from: String, to: String): Unit = {
    val src = java.nio.file.Paths.get(from)
    val dst = java.nio.file.Paths.get(to)
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def deleteDir(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
  }
}
