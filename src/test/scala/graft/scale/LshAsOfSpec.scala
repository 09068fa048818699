package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot (as-of) serving on the LSH index: epoch-stamped commit
  * tables + the sig-row-as-per-doc-commit rule let
  * [[LshIndex.dedupBatchAsOf]] replay the near-dup probe exactly as
  * the index stood at any committed epoch — the reproducible-training
  * read "which of these documents were near-dups of the corpus at
  * snapshot E". Every epoch's probe is pinned against a FRESH index
  * built over that epoch's corpus state; torn-append residue is
  * invisible to snapshots; compactTo is the history vacuum. */
class LshAsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("text"))
  private def corpusA = docs.filter(col("doc_id") < 200)
  private def corpusB = docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)
  private def batch = docs.filter(col("doc_id") >= 400)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  private def probeAsOf(dir: String, e: Long): Seq[(Long, Long, Long)] =
    LshIndex.dedupBatchAsOf(spark, dir, batch, minMatches = 8, asOf = e)
      .orderBy(col("new_doc"), col("corpus_doc"))
      .as[(Long, Long, Long)].collect().toSeq

  /** Ground truth for one epoch state: a fresh index over exactly that
    * corpus, probed the ordinary way. */
  private def want(corpus: DataFrame): Seq[(Long, Long, Long)] = {
    val w = tmp("graft-lsh-asof-want")
    LshIndex.build(corpus, w)
    LshIndex.dedupBatch(spark, w, batch, minMatches = 8)
      .orderBy(col("new_doc"), col("corpus_doc"))
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("time travel: dedupBatchAsOf replays every epoch's exact probe") {
    val dir = tmp("graft-lsh-asof")
    LshIndex.build(corpusA, dir)                         // epoch 0
    assert(LshIndex.committedEpoch(spark, dir) == 0L)
    LshIndex.append(corpusB, dir)                        // epoch 1
    // pick CDC targets that are visible in the probe results, so the
    // revision and the take-down observably change history
    val e1 = probeAsOf(dir, 1L)
    assert(e1.nonEmpty, "fixture produced no cross pairs at epoch 1")
    val tgt = e1.map(_._2).distinct.head
    val vic = e1.map(_._2).distinct.find(_ != tgt)
      .getOrElse(e1.map(_._2).head)
    // epoch 2: revise tgt's text (reversed tokens — new signatures)
    val revised = docs.filter(col("doc_id") === tgt)
      .select(col("doc_id"),
        concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
    LshIndex.upsert(revised, dir, rev = 1L)
    // epoch 3: take down vic
    LshIndex.delete(Seq(vic).toDF("doc_id"), dir)
    assert(LshIndex.committedEpoch(spark, dir) == 3L)

    val both = corpusA.unionByName(corpusB)
    val revisedCorpus = both.filter(col("doc_id") =!= tgt)
      .unionByName(revised)
    assert(probeAsOf(dir, 0L) == want(corpusA),
      "as-of epoch 0 diverged from a fresh build over corpus A")
    assert(probeAsOf(dir, 1L) == want(both),
      "as-of epoch 1 diverged from a fresh build over A+B")
    assert(probeAsOf(dir, 2L) == want(revisedCorpus),
      "as-of epoch 2 diverged from a fresh build over the revised corpus")
    assert(probeAsOf(dir, 3L) ==
      want(revisedCorpus.filter(col("doc_id") =!= vic)),
      "as-of epoch 3 diverged from a fresh build over the survivors")
    // as-of the committed epoch IS the current serve
    assert(probeAsOf(dir, 3L) ==
      LshIndex.dedupBatch(spark, dir, batch, minMatches = 8)
        .orderBy(col("new_doc"), col("corpus_doc"))
        .as[(Long, Long, Long)].collect().toSeq)
    // the revision and the delete are VISIBLE in history (epochs differ)
    assert(probeAsOf(dir, 1L) != probeAsOf(dir, 2L) ||
      probeAsOf(dir, 2L) != probeAsOf(dir, 3L),
      "CDC verbs left no trace in the snapshot history")
    // outside the committed history: loud refusal both ways
    intercept[IllegalArgumentException] {
      LshIndex.dedupBatchAsOf(spark, dir, batch, 8, asOf = 4L)
    }
    intercept[IllegalArgumentException] {
      LshIndex.dedupBatchAsOf(spark, dir, batch, 8, asOf = -1L)
    }
    // compaction is the explicit vacuum: history folds to epoch 0
    val dest = tmp("graft-lsh-asof-cmp")
    LshIndex.compactTo(spark, dir, dest)
    assert(LshIndex.committedEpoch(spark, dest) == 0L)
    assert(probeAsOf(dest, 0L) == probeAsOf(dir, 3L),
      "compacted epoch 0 must serve the pre-compaction final state")
    intercept[IllegalArgumentException] {
      LshIndex.dedupBatchAsOf(spark, dest, batch, 8, asOf = 1L)
    }
  }

  test("torn-append residue is invisible to snapshots and heals forward") {
    val dir = tmp("graft-lsh-asof-torn")
    LshIndex.build(corpusA, dir)                         // epoch 0
    // stage the tear: run the append on a mirror, copy back ids and
    // bands but NOT sigs (the per-doc commit point) and NOT meta
    val mirror = tmp("graft-lsh-asof-mirror")
    copyDir(dir, mirror)
    LshIndex.append(corpusB, mirror)
    Seq("_lsh_docs", "bands").foreach { sub =>
      copyDir(s"$mirror/$sub", s"$dir/$sub")
    }
    assert(LshIndex.committedEpoch(spark, dir) == 0L,
      "sig-less id residue advanced the snapshot counter")
    assert(probeAsOf(dir, 0L) == want(corpusA),
      "torn-append residue leaked into the epoch-0 snapshot")
    assert(!LshIndex.consistent(spark, dir), "tear went undetected")
    // the replay completes the batch; history stays exact
    LshIndex.append(corpusB, dir)
    assert(LshIndex.committedEpoch(spark, dir) == 1L)
    assert(probeAsOf(dir, 0L) == want(corpusA))
    assert(probeAsOf(dir, 1L) == want(corpusA.unionByName(corpusB)),
      "healed batch's snapshot diverged from a fresh build")
    assert(LshIndex.consistent(spark, dir))
  }

  test("round-15 advice: a later verb never reuses a torn append's stamped epoch") {
    val dir = tmp("graft-lsh-asof-collide")
    LshIndex.build(corpusA, dir)                         // epoch 0
    // tear: the id rows land stamped e=1, the data never
    val mirror = tmp("graft-lsh-asof-collide-mirror")
    copyDir(dir, mirror)
    LshIndex.append(corpusB, mirror)
    copyDir(s"$mirror/_lsh_docs", s"$dir/_lsh_docs")
    // the later verb must allocate PAST the residue's raw stamp — a
    // reused number would, after the heal below, put the residue
    // inside a snapshot a DIFFERENT verb committed
    val vic = probeAsOf(dir, 0L).map(_._2).headOption.getOrElse(0L)
    LshIndex.delete(Seq(vic).toDF("doc_id"), dir)
    assert(LshIndex.committedEpoch(spark, dir) == 2L,
      "the delete reused the torn append's stamped epoch number")
    assert(probeAsOf(dir, 1L) == probeAsOf(dir, 0L),
      "unhealed residue served at its stamped epoch")
    assert(probeAsOf(dir, 2L) ==
      want(corpusA.filter(col("doc_id") =!= vic)))
    // the replay completes the batch AT ITS OWN epoch: the heal lands
    // at e=1 and the delete's snapshot stays exactly what it was
    LshIndex.append(corpusB, dir)
    assert(LshIndex.committedEpoch(spark, dir) == 2L)
    assert(probeAsOf(dir, 1L) == want(corpusA.unionByName(corpusB)),
      "healed batch must serve at its own stamped epoch")
    assert(probeAsOf(dir, 2L) == want(corpusA.unionByName(corpusB)
      .filter(col("doc_id") =!= vic)),
      "the later verb's snapshot must compose heal + delete")
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
