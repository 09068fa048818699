package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Replay-heal contract of [[BmIndex.appendIdempotent]] — the
  * round-16 advisor's high item: the plain [[BmIndex.append]]
  * anti-joins `_bm_docs`, its FIRST write, so replaying a crash that
  * died after the id write silently loses the batch's postings, stats
  * delta, and ledger row. The healing variant must turn EVERY torn
  * prefix (ids-only, ids+postings, ids+postings+stats — staged by
  * [[BmIndex.stageTornAppend]], never the ledger) back into the exact
  * state a clean append produces: same current top-k scores, same
  * committed epoch, same as-of history, [[BmIndex.consistent]] true
  * again. Also pins the no-op replay of a fully-committed epoch and
  * the loud refusal when residue was overtaken by a later commit
  * (heal-at-original-stamp is only sound while the replay is the next
  * verb — the single-writer streaming loop's invariant). */
class BmHealSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("text"))
  private def corpusA = docs.filter(col("doc_id") < 200)
  private def corpusB = docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)
  private def corpusC = docs.filter(col("doc_id") >= 400 && col("doc_id") < 500)
  private def qTerms = docs.filter(col("doc_id") === 1)
    .select(explode(split(col("text"), " ")).as("term"))
    .distinct().orderBy(col("term").asc).limit(8)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  private def probe(dir: String): Seq[(Int, Long, Long, Long)] =
    BmIndex.topK(spark, dir, qTerms, k = 15)
      .as[(Int, Long, Long, Long)].collect().toSeq

  private def probeAsOf(dir: String, e: Long): Seq[(Int, Long, Long, Long)] =
    BmIndex.topKAsOf(spark, dir, qTerms, k = 15, asOf = e)
      .as[(Int, Long, Long, Long)].collect().toSeq

  /** Ground truth: a fresh clean-path index over the same corpus. */
  private def want(corpus: DataFrame): Seq[(Int, Long, Long, Long)] = {
    val w = tmp("graft-bm-heal-want")
    BmIndex.build(corpus, w)
    probe(w)
  }

  for (stage <- 1 to 3)
    test(s"replay heals a stage-$stage torn append (scores, epoch, history)") {
      val dir = tmp(s"graft-bm-heal-s$stage")
      BmIndex.build(corpusA, dir)                     // epoch 0
      BmIndex.stageTornAppend(corpusB, dir, stage)    // torn epoch 1
      assert(BmIndex.committedEpoch(spark, dir) == 0L,
        "ledger-less residue advanced the snapshot counter")
      assert(!BmIndex.consistent(spark, dir) || stage == 3,
        "stage-1/2 tears must be detectable (stats behind the ids)")
      // the foreachBatch replay: same batch, through the healing verb
      BmIndex.appendIdempotent(corpusB, dir)
      assert(BmIndex.consistent(spark, dir),
        s"stage-$stage heal left the index inconsistent")
      assert(BmIndex.committedEpoch(spark, dir) == 1L,
        "heal must commit exactly one epoch at the residue's stamp")
      val clean = want(corpusA.unionByName(corpusB))
      assert(probe(dir) == clean,
        s"stage-$stage heal diverged from a clean append (scores)")
      assert(probeAsOf(dir, 0L) == want(corpusA),
        "heal leaked batch rows into the epoch-0 snapshot")
      assert(probeAsOf(dir, 1L) == clean,
        "healed epoch must serve the full batch as-of its own commit")
    }

  test("replay heals a postings write torn MID-JOB-COMMIT " +
      "(partial term buckets visible — round-17 advisor medium)") {
    // ids land fully, postings land for only half the term buckets:
    // the sequential-task-move crash window. Docs whose terms span
    // kept AND dropped buckets are the hazard — a doc-granular heal
    // would skip them and leave their postings permanently incomplete.
    val dir = tmp("graft-bm-heal-partial")
    BmIndex.build(corpusA, dir)                         // epoch 0
    BmIndex.stageTornAppendPartialPostings(corpusB, dir,
      keepBucket = _ % 2 == 0)                          // torn epoch 1
    assert(BmIndex.committedEpoch(spark, dir) == 0L)
    BmIndex.appendIdempotent(corpusB, dir)              // the replay
    assert(BmIndex.consistent(spark, dir),
      "partial-bucket heal left the index inconsistent")
    assert(BmIndex.committedEpoch(spark, dir) == 1L)
    val clean = want(corpusA.unionByName(corpusB))
    assert(probe(dir) == clean,
      "partial-bucket heal diverged from a clean append — the " +
        "(doc_id, term_bucket) anti-join missed a dropped bucket")
    assert(probeAsOf(dir, 0L) == want(corpusA))
    assert(probeAsOf(dir, 1L) == clean)
  }

  test("fully-committed replay is a complete no-op") {
    val dir = tmp("graft-bm-heal-noop")
    BmIndex.build(corpusA, dir)
    BmIndex.appendIdempotent(corpusB, dir)            // clean epoch 1
    val before = probe(dir)
    val nDocFiles = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$dir/_bm_docs")).count()
    BmIndex.appendIdempotent(corpusB, dir)            // replay
    assert(BmIndex.committedEpoch(spark, dir) == 1L,
      "no-op replay must not commit a second epoch")
    assert(probe(dir) == before)
    assert(java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$dir/_bm_docs")).count() == nDocFiles,
      "no-op replay wrote id files")
    assert(BmIndex.consistent(spark, dir))
  }

  test("clean appendIdempotent ≡ clean append, and later CDC verbs compose") {
    val a = tmp("graft-bm-heal-eq-a")
    val b = tmp("graft-bm-heal-eq-b")
    BmIndex.build(corpusA, a); BmIndex.build(corpusA, b)
    BmIndex.append(corpusB, a)
    BmIndex.appendIdempotent(corpusB, b)
    assert(probe(a) == probe(b),
      "healing variant diverged from plain append on the clean path")
    // stats algebra survives a later delete identically on both
    val vic = probe(a).map(_._2).head
    BmIndex.delete(Seq(vic).toDF("doc_id"), a)
    BmIndex.delete(Seq(vic).toDF("doc_id"), b)
    assert(probe(a) == probe(b),
      "post-heal stats diverged under a delete (ledger re-base wrong)")
  }

  test("overtaken residue refuses loudly — rebuild is the recovery") {
    val dir = tmp("graft-bm-heal-overtaken")
    BmIndex.build(corpusA, dir)                       // epoch 0
    BmIndex.stageTornAppend(corpusB, dir, 1)          // torn epoch 1
    // another verb commits PAST the residue (epoch 2 — nextEpoch
    // allocates beyond the stamped residue)
    BmIndex.append(corpusC, dir)
    assert(BmIndex.committedEpoch(spark, dir) == 2L)
    val ex = intercept[IllegalArgumentException] {
      BmIndex.appendIdempotent(corpusB, dir)
    }
    assert(ex.getMessage.contains("overtaken"))
  }

  test("heal with a torn batch that also carries brand-new docs") {
    // replays are deterministic per epoch, but the guard must not rely
    // on it: a batch whose residue covers only part of its ids heals
    // the rest under the SAME original stamp
    val dir = tmp("graft-bm-heal-mixed")
    BmIndex.build(corpusA, dir)
    BmIndex.stageTornAppend(corpusB, dir, 1)
    val widened = corpusB.unionByName(corpusC)
    BmIndex.appendIdempotent(widened, dir)
    assert(BmIndex.consistent(spark, dir))
    assert(BmIndex.committedEpoch(spark, dir) == 1L)
    assert(probe(dir) == want(corpusA.unionByName(widened)))
  }
}
