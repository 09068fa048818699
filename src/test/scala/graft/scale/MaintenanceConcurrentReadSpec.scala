package graft.scale

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reader-safe compaction publish (round-16 verdict item 5): the
  * retire→publish window of [[Maintenance.compactInPlace]] swaps the
  * layout dir through two renames and then vacuums the retired copy —
  * a concurrent external reader can catch the dir-absent instant or a
  * scan planned over vanishing retired files. The documented contract
  * is [[Maintenance.withReaderRetry]]: FileNotFound-rooted failures
  * are transient (both sides of the swap are complete layouts), so
  * re-planning the read is the correct recovery. This spec HAMMERS
  * probes against a fold loop from a second thread and pins (a) zero
  * errors survive the wrapper, and (b) every result equals the
  * expected serve — a retried read sees the old or the new state,
  * never a torn one. */
class MaintenanceConcurrentReadSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("text"))
  private def qTerms = docs.filter(col("doc_id") === 1)
    .select(explode(split(col("text"), " ")).as("term"))
    .distinct().orderBy(col("term").asc).limit(8)

  test("concurrent probes never error and never see a torn state across repeated folds") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-conc-read").resolve("idx").toString
    BmIndex.build(docs.filter(col("doc_id") < 300), dir)
    val want = BmIndex.topK(spark, dir, qTerms, k = 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(want.nonEmpty, "fixture must produce hits")

    val stop = new AtomicBoolean(false)
    val folds = new AtomicInteger(0)
    val folder = new Thread(() => {
      // fold in place repeatedly — every iteration crosses the
      // retire→publish window the readers are racing. The inter-fold
      // gap mirrors the real cadence (maybeCompact fires every N-th
      // epoch, never back-to-back): a zero-gap loop would retire each
      // publish before any concurrent read can finish planning over
      // it, a starvation no real schedule produces
      while (!stop.get() && folds.get() < 5) {
        Maintenance.compactInPlace(spark, dir,
          BmIndex.compactTo(spark, _, _))
        folds.incrementAndGet()
        Thread.sleep(1500)
      }
    })
    folder.setDaemon(true)
    folder.start()

    var reads = 0
    var mismatches = 0
    val errors = scala.collection.mutable.ArrayBuffer.empty[Throwable]
    while (folder.isAlive && reads < 200) {
      try {
        val got = Maintenance.withReaderRetry() {
          BmIndex.topK(spark, dir, qTerms, k = 10)
            .as[(Int, Long, Long, Long)].collect().toSeq
        }
        reads += 1
        if (got != want) mismatches += 1
      } catch {
        case t: Throwable => errors += t
      }
    }
    stop.set(true)
    folder.join(120000)
    assert(folds.get() >= 2,
      s"fixture raced too few folds (${folds.get()}) to exercise the window")
    assert(reads >= 10, s"fixture completed too few reads ($reads)")
    assert(errors.isEmpty,
      s"${errors.size} reads failed through the retry contract; first: " +
        errors.headOption.map(_.toString).getOrElse(""))
    assert(mismatches == 0,
      s"$mismatches reads saw a state that is neither old nor new — " +
        "the swap published a torn layout")
  }

  test("withReaderRetry heals a condition-less SparkException whose " +
      "FileNotFound detail survives only in the message (round-18 " +
      "advisor: remote exceptions that fail to deserialize keep no " +
      "cause chain and declare no error condition)") {
    var calls = 0
    val got = Maintenance.withReaderRetry(attempts = 3, backoffMs = 1L) {
      calls += 1
      if (calls == 1)
        throw new org.apache.spark.SparkException(
          "Job aborted due to stage failure: File " +
            "file:/tmp/idx/cluster_id=3/part-0.parquet does not exist. " +
            "It is possible the underlying files have been updated.")
      42
    }
    assert(got == 42 && calls == 2,
      s"message-only FNF in a condition-less SparkThrowable must retry " +
        s"(calls=$calls)")
  }

  test("a SparkThrowable with a DIFFERENT declared condition is " +
      "authoritative — never retried, even when its message says " +
      "'does not exist'") {
    var calls = 0
    intercept[Exception] {
      Maintenance.withReaderRetry(attempts = 3, backoffMs = 1L) {
        calls += 1
        throw new Exception("The table or view `t` does not exist")
          with org.apache.spark.SparkThrowable {
            override def getCondition: String = "TABLE_OR_VIEW_NOT_FOUND"
          }
      }
    }
    assert(calls == 1,
      s"a declared non-path condition must not burn the retry budget " +
        s"(calls=$calls)")
  }

  test("a declared PATH_NOT_FOUND condition retries regardless of message") {
    var calls = 0
    val got = Maintenance.withReaderRetry(attempts = 3, backoffMs = 1L) {
      calls += 1
      if (calls == 1)
        throw new Exception("opaque")
          with org.apache.spark.SparkThrowable {
            override def getCondition: String = "PATH_NOT_FOUND"
          }
      7
    }
    assert(got == 7 && calls == 2)
  }
}
