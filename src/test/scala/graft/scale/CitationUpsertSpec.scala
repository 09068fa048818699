package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Document REVISION on the citation index (q160,
  * [[CitationIndex.upsert]]): a revised text moves term df in BOTH
  * directions in one batch, so every band transition append and
  * delete each own one side of must come out exactly — upsert ≡
  * rebuild over the revised corpus, through entered/died/fell/
  * revived transitions, replay healing, monotone refusal, the deep
  * guard, and compaction folding the superseded generations away. */
class CitationUpsertSpec extends AnyFunSuite {
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

  private def want(docs: DataFrame): Set[(Long, Long, Long)] =
    Graph.citationEdgesWeighted(docs, n = 3, dfMin = 2, dfMax = 4)
      .as[(Long, Long, Long)].collect().toSet

  /** The q160 revision rule: token order reversed — every shingle of
    * the doc changes, deterministically. */
  private def revText(c: org.apache.spark.sql.Column) =
    concat_ws(" ", reverse(split(c, " ")))

  private def revisedOf(docs: DataFrame, pred: org.apache.spark.sql.Column) =
    docs.filter(pred).select(col("doc_id"),
      revText(col("text")).as("text"), col("text").as("prev_text"))

  private def revisedCorpus(docs: DataFrame, pred: org.apache.spark.sql.Column) =
    docs.select(col("doc_id"),
      when(pred, revText(col("text"))).otherwise(col("text")).as("text"))

  test("upsert equals a from-scratch derivation over the revised corpus") {
    val dir = tmp("graft-citup")
    val base = corpus.filter(col("doc_id") < 400)
    val pred = col("doc_id") % 9 === 0
    val revised = revisedOf(base, pred)
    CitationIndex.build(base, dir, slack = revised.count())
    val before = got(dir)
    CitationIndex.upsert(revised, dir, rev = 1L)
    assert(CitationIndex.consistent(spark, dir))
    val after = got(dir)
    assert(after == want(revisedCorpus(base, pred)),
      "upsert diverged from the revised-corpus derivation")
    assert(after != before, "revision changed no edges — weak fixture")
    assert(after.nonEmpty)
    // replay is a pure heal
    CitationIndex.upsert(revised, dir, rev = 1L)
    assert(got(dir) == after, "upsert replay changed the edge set")
    // monotone refusal
    intercept[IllegalArgumentException] {
      CitationIndex.upsert(revised, dir, rev = 0L)
    }
    // rev-2 restore: upserting the ORIGINAL texts back must restore
    // the original edge set exactly
    val restore = base.filter(pred).select(col("doc_id"), col("text"),
      revText(col("text")).as("prev_text"))
    CitationIndex.upsert(restore, dir, rev = 2L)
    assert(CitationIndex.consistent(spark, dir))
    assert(got(dir) == before,
      "rev-2 restore of original texts must restore the original edges")
    intercept[IllegalArgumentException] {
      CitationIndex.upsert(revised, dir, rev = 1L) // below cur_rev now
    }
  }

  test("upsert drives every band transition exactly") {
    def doc(id: Long, phrase: String, tail: String = "") =
      (id, s"$phrase filler$id pad$id$tail")
    // fixture families (each phrase = one trigram term):
    //   "alpha beta gamma"    df 2 (docs 1,2)      — band
    //   "delta epsilon zeta"  df 5 (docs 10..14)   — purgatory (dead)
    //   "eta theta iota"      df 1 (doc 20)        — below band
    val docs = Seq(
      doc(1, "alpha beta gamma"), doc(2, "alpha beta gamma"),
      doc(10, "delta epsilon zeta"), doc(11, "delta epsilon zeta"),
      doc(12, "delta epsilon zeta"), doc(13, "delta epsilon zeta"),
      doc(14, "delta epsilon zeta"),
      doc(20, "eta theta iota"))
      .toDF("doc_id", "text")
    val dir = tmp("graft-citup-band")
    CitationIndex.build(docs, dir, slack = 2)
    assert(got(dir) == want(docs))

    // ONE upsert batch driving four transitions at once:
    //  doc 2:  "alpha beta gamma" -> "eta theta iota"
    //          band term falls below dfMin (fell), below-band term
    //          enters the band with reach-back to doc 20 (entered)
    //  doc 14: "delta epsilon zeta" -> "eta theta iota"
    //          purgatory term falls back into the band (revived),
    //          entered term's df rises to 3
    val rev1 = Seq(
      (2L, s"eta theta iota filler2 pad2", s"alpha beta gamma filler2 pad2"),
      (14L, s"eta theta iota filler14 pad14",
        s"delta epsilon zeta filler14 pad14"))
      .toDF("doc_id", "text", "prev_text")
    CitationIndex.upsert(rev1, dir, rev = 1L)
    assert(CitationIndex.consistent(spark, dir))
    val docs1 = Seq(
      doc(1, "alpha beta gamma"), doc(2, "eta theta iota"),
      doc(10, "delta epsilon zeta"), doc(11, "delta epsilon zeta"),
      doc(12, "delta epsilon zeta"), doc(13, "delta epsilon zeta"),
      doc(14, "eta theta iota"),
      doc(20, "eta theta iota"))
      .toDF("doc_id", "text")
    val after1 = got(dir)
    assert(after1 == want(docs1),
      "multi-transition upsert diverged from the revised derivation")
    // the revived term's edges exist among survivors (10..13)
    assert(after1.contains((13L, 10L, 1L)), "revival edges missing")
    // entered term's reach-back paired docs 2, 14, 20
    assert(after1.contains((14L, 2L, 1L)) && after1.contains((20L, 2L, 1L)),
      "entered-term reach-back edges missing")
    // fell term's edge (1,2) is gone
    assert(!after1.contains((2L, 1L, 1L)), "fell-term edge still served")

    // die-by-upsert: doc 20 revises INTO "delta epsilon zeta" — df
    // back to 5 > dfMax, the revived term dies again
    val rev2 = Seq((20L, s"delta epsilon zeta filler20 pad20",
      s"eta theta iota filler20 pad20")).toDF("doc_id", "text", "prev_text")
    CitationIndex.upsert(rev2, dir, rev = 2L)
    val docs2 = Seq(
      doc(1, "alpha beta gamma"), doc(2, "eta theta iota"),
      doc(10, "delta epsilon zeta"), doc(11, "delta epsilon zeta"),
      doc(12, "delta epsilon zeta"), doc(13, "delta epsilon zeta"),
      doc(14, "eta theta iota"),
      doc(20, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    assert(got(dir) == want(docs2),
      "die-by-upsert diverged from the revised derivation")
    assert(!got(dir).exists(e => e._1 == 13L && e._2 == 10L),
      "re-dead term's edges still served")
  }

  test("deep guard: an upsert removing a deep term's doc refuses loudly") {
    // df 5 > dfMax 4 + slack 0 -> deep; removing ONE doc would land
    // df 4 ≤ dfMax — a revival whose postings are gone
    val docs = (1L to 5L).map(i => (i, s"omega psi chi filler$i pad$i"))
      .toDF("doc_id", "text")
    val dir = tmp("graft-citup-deep")
    CitationIndex.build(docs, dir, slack = 0)
    val rev = Seq((1L, "kappa lambda mu filler1 pad1",
      "omega psi chi filler1 pad1")).toDF("doc_id", "text", "prev_text")
    val e = intercept[IllegalArgumentException] {
      CitationIndex.upsert(rev, dir, rev = 1L)
    }
    assert(e.getMessage.contains("revive deep term"),
      s"wrong refusal: ${e.getMessage}")
  }

  test("torn upserts are detected and heal on replay") {
    val dir = tmp("graft-citup-heal")
    val base = corpus.filter(col("doc_id") < 300)
    val pred = col("doc_id") % 7 === 0
    val revised = revisedOf(base, pred)
    CitationIndex.build(base, dir, slack = revised.count())
    val ref = tmp("graft-citup-heal-ref")
    copyDir(dir, ref)
    CitationIndex.upsert(revised, ref, rev = 1L)
    val target = got(ref)
    // stage the tear: everything EXCEPT the registry commit
    val mirror = tmp("graft-citup-mirror")
    copyDir(dir, mirror)
    CitationIndex.upsert(revised, mirror, rev = 1L)
    Seq("post", "pairs", "dead_terms", "sub_terms", "deep_df", "deep_terms")
      .foreach { t =>
        deleteDir(s"$dir/$t")
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$mirror/$t")))
          copyDir(s"$mirror/$t", s"$dir/$t")
      }
    assert(!CitationIndex.consistent(spark, dir),
      "torn upsert (rev rows without registry) not detected")
    // pre-registry, the uncommitted GENERATION cannot serve: every
    // pair row touching a revised doc's new text is rev-stamped and
    // gated behind the registry, so a new-only edge with a revised
    // endpoint must be absent. (Band-transition marks and
    // unchanged-doc pair rows are not generation-gated — revived
    // edges among unchanged docs may already surface, exactly like
    // delete's pre-tombs revival window; the contract there is
    // detect + heal under single-writer repair-before-serve.)
    val revIds = revised.select(col("doc_id")).as[Long].collect().toSet
    val newOnly = (target.map(e => (e._1, e._2)) --
      want(base).map(e => (e._1, e._2)))
      .filter(e => revIds.contains(e._1) || revIds.contains(e._2))
    assert(newOnly.nonEmpty, "weak fixture: no new-only revised edges")
    assert(got(dir).map(e => (e._1, e._2)).intersect(newOnly).isEmpty,
      "uncommitted generation's edges served before the registry commit")
    CitationIndex.upsert(revised, dir, rev = 1L)
    assert(CitationIndex.consistent(spark, dir))
    assert(got(dir) == target, "healed upsert diverges from the clean run")
    Seq("dead_terms", "sub_terms", "deep_df").foreach { t =>
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/$t"))) {
        val dups = spark.read.parquet(s"$dir/$t")
          .groupBy(col("term"), col("k")).count()
          .filter(col("count") > 1).count()
        assert(dups == 0L, s"replay double-inserted $t deltas")
      }
    }
  }

  test("compaction folds superseded generations; delete-after-upsert exact") {
    val dir = tmp("graft-citup-cmp")
    val base = corpus.filter(col("doc_id") < 300)
    val pred = col("doc_id") % 7 === 0
    val revised = revisedOf(base, pred)
    CitationIndex.build(base, dir, slack = 2L * revised.count())
    CitationIndex.upsert(revised, dir, rev = 1L)
    val served = got(dir)
    val dest = tmp("graft-citup-cmp-dst")
    CitationIndex.compactTo(spark, dir, dest)
    assert(CitationIndex.consistent(spark, dest))
    assert(got(dest) == served, "compaction changed the served edges")
    assert(spark.read.parquet(s"$dest/_cit_rev").count() == 0L,
      "compaction must reset the revision registry")
    // no superseded-generation rows survive the fold: every stored
    // posting/pair row is generation 0 again
    assert(spark.read.schema(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rev",
            org.apache.spark.sql.types.LongType))))
      .parquet(s"$dest/post").filter(col("rev") =!= 0L).count() == 0L)
    // delete a REVISED doc from the un-compacted index: victims pass
    // their current (revised) text; result equals the survivor
    // derivation over the revised corpus
    val victims = revisedCorpus(base, pred).filter(col("doc_id") % 14 === 0)
    CitationIndex.delete(victims, dir)
    assert(got(dir) == want(
      revisedCorpus(base, pred).filter(col("doc_id") % 14 =!= 0)),
      "delete-after-upsert diverged from the revised-survivor derivation")
  }

  test("full CDC lifecycle: build + append + upsert + delete compose (q163)") {
    // the q163 shape at spec scale: every maintenance verb once, in
    // production order, against one index — append's reach-back over
    // rows the later upsert supersedes, upsert's registry under the
    // later delete's generation-filtered recount, delete current-text
    // contract for revised victims (%9 ∩ %7).
    val dir = tmp("graft-citup-cdc")
    val base = corpus.filter(col("doc_id") < 300)
    val pred = col("doc_id") % 9 === 0
    val revised = revisedOf(base, pred)
    val victimPred = col("doc_id") % 7 === 0
    CitationIndex.build(base.filter(col("doc_id") % 5 =!= 4), dir,
      slack = revised.count() + base.filter(victimPred).count())
    CitationIndex.append(base.filter(col("doc_id") % 5 === 4), dir)
    CitationIndex.upsert(revised, dir, rev = 1L)
    CitationIndex.delete(revisedCorpus(base, pred).filter(victimPred), dir)
    assert(CitationIndex.consistent(spark, dir))
    val served = got(dir)
    assert(served == want(
      revisedCorpus(base, pred).filter(!victimPred)),
      "CDC lifecycle diverged from the revised-survivor derivation")
    assert(served.nonEmpty)
    // and the whole lifecycle folds at compaction
    val dest = tmp("graft-citup-cdc-dst")
    CitationIndex.compactTo(spark, dir, dest)
    assert(CitationIndex.consistent(spark, dest))
    assert(got(dest) == served, "compaction changed the CDC-served edges")
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
