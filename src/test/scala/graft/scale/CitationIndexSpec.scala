package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental citation-edge index: append ≡ rebuild through
  * band-entering and band-leaving terms (the df transitions that make
  * incremental maintenance nontrivial), torn-append healing at every
  * crash window, death permanence, and compaction. */
class CitationIndexSpec extends AnyFunSuite {
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

  private def want(docs: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    Graph.citationEdgesWeighted(docs, n = 3, dfMin = 2, dfMax = 4)
      .as[(Long, Long, Long)].collect().toSet

  test("append equals a from-scratch derivation across corpus slices") {
    val dir = tmp("graft-citidx")
    val s1 = corpus.filter(col("doc_id") % 3 === 0)
    val s2 = corpus.filter(col("doc_id") % 3 === 1)
    val s3 = corpus.filter(col("doc_id") % 3 === 2)
    CitationIndex.build(s1, dir)
    assert(got(dir) == want(s1), "build diverged from derivation")
    CitationIndex.append(s2, dir)
    assert(got(dir) == want(s1.unionByName(s2)),
      "first append diverged from the grown-corpus derivation")
    CitationIndex.append(s3, dir)
    assert(got(dir) == want(corpus),
      "second append diverged from the full-corpus derivation")
    assert(got(dir).nonEmpty, "fixture produced no edges")
    assert(CitationIndex.consistent(spark, dir))
    // fully-committed re-append is a no-op
    val before = got(dir)
    CitationIndex.append(s2, dir)
    assert(got(dir) == before, "re-append changed the edge set")
  }

  test("band transitions: a term entering the band reaches back; one exceeding dfMax kills its edges") {
    // hand-built corpus, n=3 shingles are exact phrases:
    // "alpha beta gamma" df: 1 -> enters band (df 2) on append
    // "delta epsilon zeta" df: 4 -> dies (df 5) on append
    def doc(id: Long, phrase: String) = (id, s"$phrase filler$id pad$id")
    val oldDocs = Seq(
      doc(1, "alpha beta gamma"),
      doc(10, "delta epsilon zeta"), doc(11, "delta epsilon zeta"),
      doc(12, "delta epsilon zeta"), doc(13, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      doc(2, "alpha beta gamma"),   // df(alpha..)=2: band entry
      doc(14, "delta epsilon zeta")) // df(delta..)=5: death
      .toDF("doc_id", "text")
    val all = oldDocs.unionByName(batch)
    val dir = tmp("graft-citidx-band")
    CitationIndex.build(oldDocs, dir)
    // before the append: delta-term clique edges exist, no alpha edges
    assert(got(dir) == want(oldDocs))
    assert(got(dir).exists(e => e._1 >= 10 && e._2 >= 10),
      "df-4 clique edges missing before the append")
    CitationIndex.append(batch, dir)
    val after = got(dir)
    assert(after == want(all), "band-transition append diverged")
    // the entry reached BACK: edge (2, 1) via the now-df-2 term
    assert(after.contains((2L, 1L, 1L)),
      s"band entry did not create the old-new edge: $after")
    // the death removed the whole df-5 clique
    assert(!after.exists(e => e._1 >= 10 || e._2 >= 10),
      s"edges of a term past dfMax survived: $after")
    assert(CitationIndex.consistent(spark, dir))

    // death is permanent: appending yet another doc with the dead
    // phrase must not resurrect anything
    CitationIndex.append(
      Seq(doc(15, "delta epsilon zeta")).toDF("doc_id", "text"), dir)
    assert(got(dir) == after, "a dead term resurrected")

    // compaction: same edges, dead residue physically gone
    val dest = tmp("graft-citidx-cmp")
    CitationIndex.compactTo(spark, dir, dest)
    assert(CitationIndex.consistent(spark, dest))
    assert(got(dest) == after, "compaction changed the edge set")
    assert(spark.read.parquet(s"$dest/pairs")
      .filter(col("src") >= 10).count() == 0L,
      "compaction left dead-term pair rows")
  }

  test("cold start: build over an empty frame, then append everything") {
    val dir = tmp("graft-citidx-cold")
    val slice = corpus.filter(col("doc_id") < 200)
    CitationIndex.build(corpus.limit(0), dir)
    assert(got(dir).isEmpty, "empty build served edges")
    CitationIndex.append(slice, dir)
    assert(got(dir) == want(slice), "cold-start append diverged")
    assert(got(dir).nonEmpty)
    assert(CitationIndex.consistent(spark, dir))
  }

  test("torn appends heal on replay at every crash window") {
    val base = corpus.filter(col("doc_id") < 300)
    val batch = corpus.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val ref = tmp("graft-citidx-heal-ref")
    CitationIndex.build(base, ref)
    CitationIndex.append(batch, ref)
    val target = got(ref)

    // tear 1: died after the post append (docs uncommitted) — the
    // residue split must keep the replay's classification identical
    val t1 = tmp("graft-citidx-heal1")
    CitationIndex.build(base, t1)
    // stage the crash: write the batch's postings exactly as append
    // would, then "die" before pairs/dead/docs
    run(t1, batch, stopAfterPost = true)
    assert(!CitationIndex.consistent(spark, t1), "tear not detected")
    CitationIndex.append(batch, t1)
    assert(CitationIndex.consistent(spark, t1))
    assert(got(t1) == target, "healed index (tear after post) diverges")
    // postings not double-inserted (df would silently shift)
    val dups = spark.read.parquet(s"$t1/post")
      .groupBy(col("term"), col("doc_id")).count()
      .filter(col("count") > 1).count()
    assert(dups == 0L, "replay double-inserted postings")

    // tear 2: died after pairs (dup support rows are benign)
    val t2 = tmp("graft-citidx-heal2")
    CitationIndex.build(base, t2)
    run(t2, batch, stopAfterPost = false)
    assert(!CitationIndex.consistent(spark, t2))
    CitationIndex.append(batch, t2)
    assert(CitationIndex.consistent(spark, t2))
    assert(got(t2) == target, "healed index (tear after pairs) diverges")
  }

  /** Stage a torn append: replicate append's post write (and optionally
    * the pairs write) without committing docs. */
  private def run(dir: String, batch: org.apache.spark.sql.DataFrame,
      stopAfterPost: Boolean): Unit = {
    // easiest faithful staging: run the real append against a COPY of
    // the directory, then copy back only the torn prefix's tables
    val mirror = tmp("graft-citidx-mirror")
    copyDir(dir, mirror)
    CitationIndex.append(batch, mirror)
    deleteDir(s"$dir/post"); copyDir(s"$mirror/post", s"$dir/post")
    if (!stopAfterPost) {
      deleteDir(s"$dir/pairs"); copyDir(s"$mirror/pairs", s"$dir/pairs")
    }
    // dead_terms/docs stay at their pre-append state: the torn prefix
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
