package graft.scale

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Materialized LSH signature index: batch-vs-corpus dedup equals the
  * in-memory LSH pipeline restricted to cross pairs, append equals a
  * full rebuild, re-append is a no-op, torn appends are detected, and
  * the probe read is partition-pruned. */
class LshIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
  private def corpus = docs.filter(col("doc_id") < 400)
  private def batch = docs.filter(col("doc_id") >= 400)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  private def result(dir: String) = LshIndex
    .dedupBatch(spark, dir, batch, minMatches = 8)
    .orderBy(col("new_doc"), col("corpus_doc"))
    .as[(Long, Long, Long)].collect().toSeq

  test("dedupBatch equals the in-memory LSH pipeline's cross pairs; probe is partition-pruned") {
    val dir = tmp("graft-lshidx")
    LshIndex.build(corpus, dir)
    val probe = LshIndex.dedupBatch(spark, dir, batch, minMatches = 8)
    probe.collect() // execute THIS plan so its scan metrics populate
    val fromIndex = probe
      .orderBy(col("new_doc"), col("corpus_doc"))
      .as[(Long, Long, Long)].collect().toSeq

    // ground truth: the fully-oracle-checked in-memory portable
    // pipeline over the WHOLE corpus, restricted to cross pairs
    // (minhashLshPairsPortable emits d1 < d2, so corpus side is d1)
    val inMemory = Dedup
      .minhashLshPairsPortable(docs, n = 5, numHashes = 16, bands = 4,
        minMatches = 8)
      .filter(col("d1") < 400 && col("d2") >= 400)
      .select(col("d2").as("new_doc"), col("d1").as("corpus_doc"),
        col("matches"))
      .orderBy(col("new_doc"), col("corpus_doc"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(fromIndex == inMemory,
      "indexed incremental dedup diverged from the in-memory pipeline")
    assert(fromIndex.nonEmpty, "no cross near-dup pairs in the fixture")

    // pruning proof from the executed plan (BmIndexSpec technique)
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case s: FileSourceScanExec => Seq(s)
        case ad: AdaptiveSparkPlanExec => scans(ad.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case other => other.children.flatMap(scans)
      }
    val bandScans = scans(probe.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("bands")))
    assert(bandScans.nonEmpty, "no file scan over the bands layout")
    assert(bandScans.exists(
        _.partitionFilters.exists(_.toString.contains("band_bucket"))),
      s"probe must be a PARTITION filter, got ${bandScans.map(_.partitionFilters)}")
  }

  test("append == rebuild; probing with already-committed docs is empty") {
    val grown = tmp("graft-lshidx-grow")
    LshIndex.build(corpus.filter(col("doc_id") % 2 === 0), grown)
    LshIndex.append(corpus.filter(col("doc_id") % 2 === 1), grown)
    val rebuilt = tmp("graft-lshidx-full")
    LshIndex.build(corpus, rebuilt)
    assert(result(grown) == result(rebuilt),
      "append-grown index diverged from a full rebuild")
    assert(LshIndex.consistent(spark, grown))

    // probing the index with its own committed docs: every id is
    // anti-joined out, so the probe is empty rather than the corpus
    // reporting itself as its own duplicate
    assert(LshIndex.dedupBatch(spark, grown, corpus, minMatches = 1).isEmpty)
  }

  test("cold start: build over an empty frame, then append the corpus") {
    val dir = tmp("graft-lshidx-cold")
    LshIndex.build(corpus.limit(0), dir)
    assert(LshIndex.dedupBatch(spark, dir, batch, minMatches = 1).isEmpty,
      "empty index produced candidates")
    LshIndex.append(corpus, dir)
    val rebuilt = tmp("graft-lshidx-cold-ref")
    LshIndex.build(corpus, rebuilt)
    assert(result(dir) == result(rebuilt),
      "cold-start append diverged from a direct build")
    assert(LshIndex.consistent(spark, dir))
  }

  test("re-append is a no-op: signatures not duplicated, results unchanged") {
    def sigRows(dir: String): Long = spark.read.parquet(s"$dir/sigs").count()
    val dir = tmp("graft-lshidx-dup")
    LshIndex.build(corpus, dir)
    val before = result(dir)
    val rowsBefore = sigRows(dir)
    LshIndex.append(corpus, dir) // every id already committed
    assert(sigRows(dir) == rowsBefore, "no-op append wrote signatures")
    assert(result(dir) == before, "re-append changed probe results")
    assert(LshIndex.consistent(spark, dir))

    // mixed batch: half dup, half new — equals building the union once
    val half = tmp("graft-lshidx-mixed")
    LshIndex.build(corpus.filter(col("doc_id") % 2 === 0), half)
    LshIndex.append(corpus, half)
    assert(result(half) == before, "mixed re-append diverged from full build")
    assert(sigRows(half) == rowsBefore, "mixed re-append duplicated signatures")
  }

  test("compactTo: file geometry consolidated, contents and probes identical") {
    def files(dir: String, part: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$dir/$part")).count(_.getName.endsWith(".parquet"))
    }
    val dir = tmp("graft-lshidx-cmp")
    LshIndex.build(corpus.filter(col("doc_id") < 100), dir)
    // five appends accumulate small files
    for (k <- 1 to 5)
      LshIndex.append(
        corpus.filter(col("doc_id") >= k * 100 - 100 + 100 &&
          col("doc_id") < k * 100 + 100), dir)
    val before = result(dir)
    val dest = tmp("graft-lshidx-cmp-out")
    LshIndex.compactTo(spark, dir, dest)
    assert(LshIndex.consistent(spark, dest), "compacted index inconsistent")
    assert(result(dest) == before, "compaction changed probe results")
    assert(files(dest, "sigs") < files(dir, "sigs"),
      s"sigs not consolidated: ${files(dest, "sigs")} vs ${files(dir, "sigs")}")
    assert(files(dest, "bands") <= LshIndex.Buckets,
      s"bands not one-file-per-bucket: ${files(dest, "bands")}")
    // source untouched
    assert(LshIndex.consistent(spark, dir) && result(dir) == before)
  }

  test("consistent() detects a torn append (id table ahead of meta)") {
    val dir = tmp("graft-lshidx-torn")
    LshIndex.build(corpus.filter(col("doc_id") % 2 === 0), dir)
    assert(LshIndex.consistent(spark, dir))
    // simulate dying after the ids write, before sigs/bands/meta
    corpus.filter(col("doc_id") % 2 === 1).select(col("doc_id"))
      .write.mode("append").parquet(s"$dir/_lsh_docs")
    assert(!LshIndex.consistent(spark, dir), "torn append not detected")
  }

  test("torn append heals on replay: index equals the never-crashed one at every tear point") {
    val base = corpus.filter(col("doc_id") < 300)
    val batch = corpus.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val probe = corpus.filter(col("doc_id") >= 400)
    // reference: an append that never crashed
    val ref = tmp("graft-lshidx-heal-ref")
    LshIndex.build(base, ref)
    LshIndex.append(batch, ref)
    val want = LshIndex.dedupBatch(spark, ref, probe, minMatches = 8)
      .select(col("new_doc"), col("corpus_doc"), col("matches"))
      .as[(Long, Long, Long)].collect().toSet

    // tear 1: died after the ids write — the epoch-replay hole that
    // used to silently drop the batch's signatures forever
    val t1 = tmp("graft-lshidx-heal1")
    LshIndex.build(base, t1)
    batch.select(col("doc_id")).write.mode("append")
      .parquet(s"$t1/_lsh_docs")
    assert(!LshIndex.consistent(spark, t1))
    LshIndex.append(batch, t1) // the foreachBatch replay
    assert(LshIndex.consistent(spark, t1), "replay did not heal tear 1")
    val got1 = LshIndex.dedupBatch(spark, t1, probe, minMatches = 8)
      .select(col("new_doc"), col("corpus_doc"), col("matches"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got1 == want, "healed index (tear after ids) diverges")

    // tear 2: died after ids + bands, before sigs — replayed bands are
    // duplicated but benign (candidate dedup); sigs stay single-copy so
    // match counts are exact
    val t2 = tmp("graft-lshidx-heal2")
    LshIndex.build(base, t2)
    val meta = spark.read.parquet(s"$t2/_lsh_meta").collect()(0)
    batch.select(col("doc_id")).write.mode("append")
      .parquet(s"$t2/_lsh_docs")
    // replicate the internal bands write for the batch (crash before sigs)
    val sig = LshIndex.signaturesFor(batch, meta.getInt(1), meta.getInt(2))
    LshIndex.writeBandsFor(sig, t2, meta.getInt(3), meta.getInt(2))
    assert(!LshIndex.consistent(spark, t2))
    LshIndex.append(batch, t2)
    assert(LshIndex.consistent(spark, t2), "replay did not heal tear 2")
    val got2 = LshIndex.dedupBatch(spark, t2, probe, minMatches = 8)
      .select(col("new_doc"), col("corpus_doc"), col("matches"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 == want, "healed index (tear after bands) diverges")
    // signatures must not be duplicated by the heal
    val sigCount = spark.read.parquet(s"$t2/sigs")
      .groupBy(col("doc_id")).count().filter(col("count") > 1).count()
    assert(sigCount == 0L, "heal duplicated signatures")

    // tear 3: died after ids + bands + sigs, before meta — ALL data
    // landed, only the commit point is stale. The replay finds nothing
    // fresh; it must still refresh meta rather than return with the
    // index permanently inconsistent
    val t3 = tmp("graft-lshidx-heal3")
    LshIndex.build(base, t3)
    val meta3 = spark.read.parquet(s"$t3/_lsh_meta").collect()(0)
    batch.select(col("doc_id")).write.mode("append")
      .parquet(s"$t3/_lsh_docs")
    val sig3 = LshIndex.signaturesFor(batch, meta3.getInt(1), meta3.getInt(2))
    LshIndex.writeBandsFor(sig3, t3, meta3.getInt(3), meta3.getInt(2))
    sig3.write.mode("append").parquet(s"$t3/sigs")
    assert(!LshIndex.consistent(spark, t3))
    LshIndex.append(batch, t3)
    assert(LshIndex.consistent(spark, t3), "replay did not heal tear 3 (meta-only)")
    val got3 = LshIndex.dedupBatch(spark, t3, probe, minMatches = 8)
      .select(col("new_doc"), col("corpus_doc"), col("matches"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got3 == want, "healed index (tear after sigs) diverges")
  }

  test("delete: tombstoned corpus docs vanish from probes; compaction folds them physically") {
    val dir = tmp("graft-lshidx-del")
    LshIndex.build(corpus, dir)
    val before = result(dir)
    assert(before.nonEmpty, "fixture has no cross pairs")
    // tombstone every corpus doc that currently matches the probe
    val deadIds = before.map(_._2).distinct
    LshIndex.delete(deadIds.toDF("doc_id"), dir)
    assert(LshIndex.consistent(spark, dir))
    assert(result(dir).isEmpty,
      "tombstoned corpus docs still matched as near-dup candidates")
    // equivalence with an index never holding them
    val fresh = tmp("graft-lshidx-del-ref")
    LshIndex.build(corpus.filter(!col("doc_id").isin(deadIds: _*)), fresh)
    assert(result(dir) == result(fresh))

    // idempotent replay + unknown-id no-op
    LshIndex.delete(deadIds.toDF("doc_id"), dir)
    LshIndex.delete(Seq(999999L).toDF("doc_id"), dir)
    assert(spark.read.parquet(s"$dir/_lsh_tombstones")
      .groupBy(col("doc_id")).count().filter(col("count") > 1).count() == 0L,
      "delete replay duplicated tombstones")

    // compaction folds the tombstones away physically
    val dest = tmp("graft-lshidx-del-cmp")
    LshIndex.compactTo(spark, dir, dest)
    assert(LshIndex.consistent(spark, dest))
    assert(result(dest) == result(fresh))
    assert(spark.read.parquet(s"$dest/sigs")
      .filter(col("doc_id").isin(deadIds: _*)).count() == 0L,
      "compaction left tombstoned signatures behind")
    assert(spark.read.parquet(s"$dest/bands")
      .filter(col("doc_id").isin(deadIds: _*)).count() == 0L,
      "compaction left tombstoned band rows behind")
    assert(LshIndex.tombstones(spark, dest).count() == 0L,
      "compacted index must start tombstone-free")
    // appending a tombstoned id does NOT resurrect it (still committed)
    LshIndex.append(corpus.filter(col("doc_id").isin(deadIds: _*)), dir)
    assert(result(dir).isEmpty, "append resurrected a tombstoned doc")
  }

  test("docs shorter than n tokens: consistent() true, replay no-op, never candidates") {
    // round-14 advice item 1: portableSignatures filters size(w) >= n
    // but build/append commit EVERY doc_id — without placeholder sig
    // rows one short doc makes consistent() permanently false
    // (indistinguishable from the gone-batch tear) and keeps append's
    // freshData non-empty forever
    val dir = tmp("graft-lshidx-short")
    val mixed = corpus.limit(50).unionByName(
      Seq((9001L, "tiny"), (9002L, "two words")).toDF("doc_id", "text"),
      allowMissingColumns = true)
    LshIndex.build(mixed, dir)
    assert(LshIndex.consistent(spark, dir),
      "healthy index with short docs reported torn")
    // replay of the same batch is a genuine no-op (meta-heal branch
    // reachable): sigs row count stable, no new part files
    val rows = spark.read.parquet(s"$dir/sigs").count()
    LshIndex.append(mixed, dir)
    assert(spark.read.parquet(s"$dir/sigs").count() == rows,
      "replay with short docs re-appended data")
    assert(LshIndex.consistent(spark, dir))
    // short docs have no band rows, so they can never be candidates —
    // in particular two short docs must NOT alias into one bk="" bucket
    assert(spark.read.parquet(s"$dir/bands")
      .filter(col("doc_id") >= 9000L).count() == 0L,
      "short docs produced band rows")
    val probe = LshIndex.dedupBatch(spark, dir,
      Seq((9100L, "tiny")).toDF("doc_id", "text"), minMatches = 1)
    assert(probe.filter(col("corpus_doc") >= 9000L).isEmpty,
      "a short doc matched as a candidate")
    // delete + compact lifecycle survives placeholder rows
    LshIndex.delete(Seq(9001L).toDF("doc_id"), dir)
    val dest = tmp("graft-lshidx-short-c")
    LshIndex.compactTo(spark, dir, dest)
    assert(LshIndex.consistent(spark, dest))
    assert(spark.read.parquet(s"$dest/sigs")
      .filter(col("doc_id") === 9001L).isEmpty,
      "compaction kept a tombstoned short doc's placeholder")
  }

  test("in-place rebuild resets tombstones (advice: recycled dir must not inherit deletes)") {
    val dir = tmp("graft-lshidx-rebuild")
    LshIndex.build(corpus, dir)
    val before = result(dir)
    val victims = result(dir).map(_._2).distinct.take(3)
    LshIndex.delete(victims.toDF("doc_id"), dir)
    assert(result(dir) != before, "delete changed nothing — bad fixture")
    // torn-append recovery = rebuild into the SAME dir with ids reused
    LshIndex.build(corpus, dir)
    assert(result(dir) == before,
      "rebuild inherited stale tombstones — live docs hidden from probes")
    assert(LshIndex.consistent(spark, dir))
  }

  test("upsert: revision serves like a rebuild from revised texts; replay/monotonicity/compaction") {
    val revisedCorpus = corpus.withColumn("text",
      when(col("doc_id") % 9 === 0,
        concat_ws(" ", reverse(split(col("text"), " "))))
        .otherwise(col("text")))
    val dir = tmp("graft-lshidx-upsert")
    LshIndex.build(corpus, dir)
    val beforeUpsert = result(dir)
    LshIndex.upsert(
      revisedCorpus.filter(col("doc_id") % 9 === 0), dir, rev = 1L)
    assert(LshIndex.consistent(spark, dir))
    // THE equivalence: probe == an index built from the revised corpus
    val ref = tmp("graft-lshidx-upsert-ref")
    LshIndex.build(revisedCorpus, ref)
    val got = result(dir)
    assert(got == result(ref),
      "upsert-then-probe diverged from a rebuild over revised texts")
    assert(got != beforeUpsert,
      "revision changed nothing — bad fixture (no revised doc near-dup)")

    // replay of the same (batch, rev) is a no-op at every table
    val sigRows = spark.read.parquet(s"$dir/sigs").count()
    val revRows = LshIndex.revisions(spark, dir).count()
    LshIndex.upsert(
      revisedCorpus.filter(col("doc_id") % 9 === 0), dir, rev = 1L)
    assert(spark.read.parquet(s"$dir/sigs").count() == sigRows,
      "upsert replay duplicated signatures")
    assert(LshIndex.revisions(spark, dir).count() == revRows,
      "upsert replay duplicated registry rows")
    assert(result(dir) == got)

    // a SECOND revision supersedes the first; compaction folds to it
    LshIndex.upsert(corpus.filter(col("doc_id") % 9 === 0), dir, rev = 2L)
    assert(result(dir) == beforeUpsert,
      "rev-2 re-upsert of the ORIGINAL texts must restore original probes")
    // a LOWER-than-current rev is refused loudly, never silently served
    intercept[IllegalArgumentException] {
      LshIndex.upsert(
        revisedCorpus.filter(col("doc_id") % 9 === 0), dir, rev = 1L)
    }
    val dest = tmp("graft-lshidx-upsert-c")
    LshIndex.compactTo(spark, dir, dest)
    assert(LshIndex.consistent(spark, dest))
    assert(result(dest) == beforeUpsert,
      "compacted index must serve the current generation")
    assert(LshIndex.revisions(spark, dest).count() == 0L,
      "compaction must reset the revision registry")
    // exactly one sig row per doc after folding
    assert(spark.read.parquet(s"$dest/sigs")
      .groupBy(col("doc_id")).count().filter(col("count") > 1).count() == 0L,
      "compaction left superseded generations behind")

    // upsert cannot revive a tombstoned doc
    val victim = got.map(_._2).distinct.head
    LshIndex.delete(Seq(victim).toDF("doc_id"), dir)
    val afterDel = result(dir)
    LshIndex.upsert(corpus.filter(col("doc_id") === victim), dir, rev = 3L)
    assert(result(dir) == afterDel, "upsert revived a tombstoned doc")
  }

  test("gone-batch tear is NOT laundered by a later append of a different batch") {
    val base = corpus.filter(col("doc_id") < 300)
    val gone = corpus.filter(col("doc_id") >= 300 && col("doc_id") < 350)
    val later = corpus.filter(col("doc_id") >= 350 && col("doc_id") < 400)
    val dir = tmp("graft-lshidx-gone")
    LshIndex.build(base, dir)
    // tear after the ids write; the batch is then LOST (never replayed)
    gone.select(col("doc_id")).write.mode("append")
      .parquet(s"$dir/_lsh_docs")
    assert(!LshIndex.consistent(spark, dir))
    // a later append of a DIFFERENT batch recounts _lsh_docs into meta —
    // the detector must still see the orphaned, signature-less ids
    LshIndex.append(later, dir)
    assert(!LshIndex.consistent(spark, dir),
      "different-batch append laundered a gone-batch tear")
    // replaying the gone batch finally heals everything
    LshIndex.append(gone, dir)
    assert(LshIndex.consistent(spark, dir), "gone-batch replay did not heal")
  }

  test("full CDC lifecycle: build + append + upsert + delete compose (q170)") {
    // the candidate-generation composition: append's bands that a
    // later upsert supersedes, the upsert registry under a later
    // delete's tombstones — probe must equal an index that never held
    // anything but the revised survivors.
    val dir = tmp("graft-lshidx-cdc")
    LshIndex.build(corpus.filter(col("doc_id") % 5 =!= 4), dir)
    LshIndex.append(corpus.filter(col("doc_id") % 5 === 4), dir)
    val revised = corpus.filter(col("doc_id") % 9 === 0)
      .withColumn("text", concat_ws(" ", reverse(split(col("text"), " "))))
    LshIndex.upsert(revised, dir, rev = 1L)
    LshIndex.delete(
      corpus.filter(col("doc_id") % 7 === 0).select(col("doc_id")), dir)
    assert(LshIndex.consistent(spark, dir))
    val got = result(dir)
    val refDir = tmp("graft-lshidx-cdc-ref")
    LshIndex.build(corpus
      .withColumn("text", when(col("doc_id") % 9 === 0,
          concat_ws(" ", reverse(split(col("text"), " "))))
        .otherwise(col("text")))
      .filter(col("doc_id") % 7 =!= 0), refDir)
    assert(got == result(refDir),
      "CDC lifecycle probe diverged from the revised-survivor rebuild")
    assert(got.nonEmpty)
    assert(!got.exists(_._2 % 7 == 0), "a deleted corpus doc still matched")
  }
}
