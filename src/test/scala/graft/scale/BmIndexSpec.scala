package graft.scale

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Materialized BM25 index: result-identity with the in-memory path,
  * the partition-pruned serving read, and O(batch) append equivalence
  * with a full rebuild. */
class BmIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
  private def qTerms = docs.filter(col("doc_id") === 1)
    .select(explode(split(col("text"), " ")).as("term"))
    .distinct().orderBy(col("term").asc).limit(8)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  test("indexed topK equals the in-memory path exactly; scan is partition-pruned") {
    val dir = tmp("graft-bmidx")
    BmIndex.build(docs, dir)
    val fromIndex = BmIndex.topK(spark, dir, qTerms, k = 15)
    val inMemory = Bm25.topK(docs, qTerms, k = 15)
    fromIndex.collect() // execute THIS plan so its scan metrics populate
    val a = fromIndex.as[(Int, Long, Long, Long)].collect().toSeq
    val b = inMemory.as[(Int, Long, Long, Long)].collect().toSeq
    assert(a == b, "indexed path diverged from the in-memory path")
    assert(a.nonEmpty)

    // pruning proof from the executed plan (IvfIndexSpec technique)
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case s: FileSourceScanExec => Seq(s)
        case ad: AdaptiveSparkPlanExec => scans(ad.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case other => other.children.flatMap(scans)
      }
    val postingScans = scans(fromIndex.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("postings")))
    assert(postingScans.nonEmpty, "no file scan over the postings layout")
    assert(postingScans.exists(
        _.partitionFilters.exists(_.toString.contains("term_bucket"))),
      s"probe must be a PARTITION filter, got ${postingScans.map(_.partitionFilters)}")
    // the executed plan may hold clones of the scan (reused stages);
    // the one that ran carries the numFiles metric — take the max
    val scanned = postingScans.map(_.metrics("numFiles").value).max
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val written = walk(new java.io.File(s"$dir/postings"))
      .count(_.getName.endsWith(".parquet"))
    assert(scanned > 0 && scanned < written,
      s"probe not pruned: scanned $scanned of $written posting files")
  }

  test("append == rebuild: postings land in place, stats become old+delta") {
    val (oldHalf, newHalf) =
      (docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
    val grown = tmp("graft-bmidx-grow")
    BmIndex.build(oldHalf, grown)
    BmIndex.append(newHalf, grown)
    val rebuilt = tmp("graft-bmidx-full")
    BmIndex.build(docs, rebuilt)

    val a = BmIndex.topK(spark, grown, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val b = BmIndex.topK(spark, rebuilt, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(a == b, "append-grown index diverged from a full rebuild")
    // results must draw on appended docs too (odd ids present)
    assert(a.exists(_._2 % 2 == 1), "no appended doc in the top-k")

    val st = spark.read.parquet(s"$grown/_bm_stats").collect()(0)
    assert(st.getLong(0) == docs.count(), "stats n_docs != corpus size")
  }

  test("re-append is a no-op: dup doc_ids are skipped, stats and results unchanged") {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    def postingFiles(dir: String): Int =
      walk(new java.io.File(s"$dir/postings"))
        .count(_.getName.endsWith(".parquet"))
    val dir = tmp("graft-bmidx-dup")
    BmIndex.build(docs, dir)
    val before = BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val stBefore = spark.read.parquet(s"$dir/_bm_stats").collect()(0)
    val filesBefore = postingFiles(dir)

    // whole-corpus re-append AND a mixed batch re-appending half of it:
    // only genuinely new ids may land
    BmIndex.append(docs, dir)
    assert(postingFiles(dir) == filesBefore, "no-op append wrote postings")
    val after = BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(after == before, "re-append changed served results")
    val stAfter = spark.read.parquet(s"$dir/_bm_stats").collect()(0)
    assert(stAfter.getLong(0) == stBefore.getLong(0) &&
      stAfter.getLong(1) == stBefore.getLong(1), "re-append moved stats")
    assert(BmIndex.consistent(spark, dir))

    // mixed batch: half dup, half new — equals building the union once
    val half = tmp("graft-bmidx-mixed")
    BmIndex.build(docs.filter(col("doc_id") % 2 === 0), half)
    BmIndex.append(docs, half) // contains already-committed evens
    val grown = BmIndex.topK(spark, half, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(grown == before, "mixed re-append diverged from full build")
    assert(BmIndex.consistent(spark, half))
    val stMixed = spark.read.parquet(s"$half/_bm_stats").collect()(0)
    assert(stMixed.getLong(0) == stBefore.getLong(0) &&
      stMixed.getLong(1) == stBefore.getLong(1))
  }

  test("consistent() detects a torn append (id table ahead of stats)") {
    val dir = tmp("graft-bmidx-torn")
    BmIndex.build(docs.filter(col("doc_id") % 2 === 0), dir)
    assert(BmIndex.consistent(spark, dir))
    // simulate dying after the ids write, before postings/stats
    docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"))
      .write.mode("append").parquet(s"$dir/_bm_docs")
    assert(!BmIndex.consistent(spark, dir), "torn append not detected")
  }

  test("delete: tombstoned docs stop scoring and scores equal an index never holding them") {
    val survivors = docs.filter(col("doc_id") % 7 =!= 0)
    val dead = docs.filter(col("doc_id") % 7 === 0).select(col("doc_id"))
    val dir = tmp("graft-bmidx-del")
    BmIndex.build(docs, dir)
    BmIndex.delete(dead, dir)
    assert(BmIndex.consistent(spark, dir))
    val got = BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    // the STRONG equivalence: not just excluded from results — IDF and
    // avgdl shift too, so scores must match a fresh survivor-only build
    val fresh = tmp("graft-bmidx-del-ref")
    BmIndex.build(survivors, fresh)
    val want = BmIndex.topK(spark, fresh, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == want,
      "post-delete scoring diverged from an index built without the docs")
    assert(got.nonEmpty)

    // idempotent replay + unknown-id no-op
    BmIndex.delete(dead, dir)
    BmIndex.delete(Seq(999999L).toDF("doc_id"), dir)
    assert(spark.read.parquet(s"$dir/_bm_tombstones")
      .groupBy(col("doc_id")).count().filter(col("count") > 1).count() == 0L,
      "delete replay duplicated tombstones")
    assert(BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq == got)

    // compaction folds: physical rows gone, results unchanged,
    // destination tombstone-free
    val dest = tmp("graft-bmidx-del-cmp")
    BmIndex.compactTo(spark, dir, dest)
    assert(BmIndex.consistent(spark, dest))
    assert(BmIndex.topK(spark, dest, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq == want)
    assert(spark.read.parquet(s"$dest/postings").as("p")
      .join(dead.as("d"), col("p.doc_id") === col("d.doc_id"), "left_semi")
      .count() == 0L, "compaction left tombstoned postings behind")
    assert(BmIndex.tombstones(spark, dest).count() == 0L,
      "compacted index must start tombstone-free")
  }

  test("upsert: revised docs score like a rebuild from revised texts, stats dl-deltas included") {
    // revision rule: drop every second token — dl changes, so avgdl
    // (and through it every score) must shift exactly
    val revisedDocs = docs.withColumn("text",
      when(col("doc_id") % 9 === 0,
        concat_ws(" ", filter(split(col("text"), " "),
          (_, i) => i % 2 === 0)))
        .otherwise(col("text")))
    val dir = tmp("graft-bmidx-upsert")
    BmIndex.build(docs, dir)
    val before = BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    BmIndex.upsert(revisedDocs.filter(col("doc_id") % 9 === 0), dir, rev = 1L)
    assert(BmIndex.consistent(spark, dir))
    // THE equivalence: scores equal an index built from revised texts
    val ref = tmp("graft-bmidx-upsert-ref")
    BmIndex.build(revisedDocs, ref)
    val got = BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val want = BmIndex.topK(spark, ref, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == want,
      "upsert-then-probe diverged from a rebuild over revised texts")
    assert(got != before, "revision changed no scores — bad fixture")

    // replay no-op + monotone refusal
    val postRows = spark.read.parquet(s"$dir/postings").count()
    BmIndex.upsert(revisedDocs.filter(col("doc_id") % 9 === 0), dir, rev = 1L)
    assert(spark.read.parquet(s"$dir/postings").count() == postRows,
      "upsert replay duplicated postings")
    assert(BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq == got)
    BmIndex.upsert(docs.filter(col("doc_id") % 9 === 0), dir, rev = 2L)
    assert(BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq == before,
      "rev-2 restore of original texts must restore original scores")
    intercept[IllegalArgumentException] {
      BmIndex.upsert(revisedDocs.filter(col("doc_id") % 9 === 0), dir,
        rev = 1L)
    }

    // delete AFTER revision subtracts the CURRENT dl (no double count)
    BmIndex.upsert(revisedDocs.filter(col("doc_id") % 9 === 0), dir, rev = 3L)
    BmIndex.delete(docs.filter(col("doc_id") % 9 === 0)
      .select(col("doc_id")), dir)
    val refDel = tmp("graft-bmidx-upsert-refdel")
    BmIndex.build(revisedDocs.filter(col("doc_id") % 9 =!= 0), refDel)
    assert(BmIndex.topK(spark, dir, qTerms, k = 15)
        .as[(Int, Long, Long, Long)].collect().toSeq ==
      BmIndex.topK(spark, refDel, qTerms, k = 15)
        .as[(Int, Long, Long, Long)].collect().toSeq,
      "delete-after-revision stats drifted from a survivors-only rebuild")

    // compaction folds generations and resets the registry
    val dest = tmp("graft-bmidx-upsert-c")
    BmIndex.compactTo(spark, dir, dest)
    assert(BmIndex.consistent(spark, dest))
    assert(BmIndex.revisions(spark, dest).count() == 0L)
    assert(BmIndex.topK(spark, dest, qTerms, k = 15)
        .as[(Int, Long, Long, Long)].collect().toSeq ==
      BmIndex.topK(spark, dir, qTerms, k = 15)
        .as[(Int, Long, Long, Long)].collect().toSeq,
      "compacted index serves differently")
    assert(spark.read.parquet(s"$dest/postings")
      .groupBy(col("doc_id"), col("term")).count()
      .filter(col("count") > 1).count() == 0L,
      "compaction left superseded posting generations behind")
  }

  test("in-place rebuild resets tombstones (advice: recycled dir must not inherit deletes)") {
    // the scaladoc prescribes "rebuild (idempotent overwrite)" as the
    // torn-append recovery — a rebuild into a dir that previously saw
    // delete() must not inherit its tombstones: the same doc ids are
    // live again, and stale tombstones would both hide them from topK
    // and mis-adjust the BM25 stats (round-14 advice item 2)
    val dir = tmp("graft-bmidx-rebuild")
    BmIndex.build(docs, dir)
    val before = BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    BmIndex.delete(docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id")), dir)
    assert(BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq != before,
      "delete changed nothing — bad fixture")
    BmIndex.build(docs, dir) // recovery rebuild, ids reused
    assert(BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq == before,
      "rebuild inherited stale tombstones")
    assert(BmIndex.consistent(spark, dir))
  }

  test("full CDC lifecycle: build + append + upsert + delete net the stats exactly (q169)") {
    // every verb moves n_docs/sum_dl/df; a probed score is only right
    // if the ledger nets the four to exactly the revised-survivor
    // corpus's stats — including victims whose CURRENT generation is
    // the revised one (tombstone subtracts the revised dl, the
    // revision delta stays counted).
    val dir = tmp("graft-bmidx-cdc")
    BmIndex.build(docs.filter(col("doc_id") % 5 =!= 4), dir)
    BmIndex.append(docs.filter(col("doc_id") % 5 === 4), dir)
    val revised = docs.filter(col("doc_id") % 9 === 0)
      .withColumn("text", concat_ws(" ",
        filter(split(col("text"), " "), (_, i) => i % 2 === 0)))
    BmIndex.upsert(revised, dir, rev = 1L)
    BmIndex.delete(docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id")), dir)
    assert(BmIndex.consistent(spark, dir))
    val got = BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    // twin: an index built once over the revised survivors
    val refDir = tmp("graft-bmidx-cdc-ref")
    val survivorCorpus = docs
      .withColumn("text", when(col("doc_id") % 9 === 0,
          concat_ws(" ",
            filter(split(col("text"), " "), (_, i) => i % 2 === 0)))
        .otherwise(col("text")))
      .filter(col("doc_id") % 7 =!= 0)
    BmIndex.build(survivorCorpus, refDir)
    val want = BmIndex.topK(spark, refDir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == want,
      "CDC lifecycle scores diverged from the revised-survivor rebuild")
    assert(got.nonEmpty)
    assert(!got.exists(_._2 % 7 == 0), "a deleted doc still scored")
  }
}
