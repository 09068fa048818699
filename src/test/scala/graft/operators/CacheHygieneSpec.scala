package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.scale.SparkTestSession

/** Round-3/4 both shipped cache-leak fixes (q61's profile cache, KMeans'
  * Lloyd-loop persist, q67's localCheckpoint residue). This spec is the
  * regression guard the fixes were missing: a FULL catalogue run must
  * leave the block store exactly as it found it, so the next stray
  * `.cache()` fails a test instead of silently pinning executor memory
  * across every later query of a long-lived session.
  */
class CacheHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("full catalogue run pins no RDD blocks it does not release") {
    val d = "/root/testdata/sf0.001"
    // snapshot first: suites sharing this SparkSession may legitimately
    // hold pinned blocks — the assertion is on what THIS run adds
    val before = spark.sparkContext.getPersistentRDDs.keySet
    graft.SparkEntry.queries.foreach { case (name, f) =>
      withClue(s"query $name: ") { f(spark, d).count() }
    }
    // Two classes of pins can remain: (a) blocks backing a returned
    // frame's localCheckpoint — the DOCUMENTED lifecycle (see
    // Dedup.lshCandidates / IvfIndex.topK scaladoc) is that the
    // ContextCleaner reaps them once the caller drops the frame, which
    // the loop above just did; (b) genuine `.cache()` leaks, which the
    // CacheManager holds STRONGLY and no GC ever frees. Emulate the
    // caller dropping everything (GC + let the async cleaner drain) so
    // class (a) evaporates and the assertion catches exactly class (b).
    def leaked() = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
    var tries = 0
    while (leaked().nonEmpty && tries < 25) {
      System.gc(); Thread.sleep(200); tries += 1
    }
    val left = leaked()
    assert(left.isEmpty,
      s"catalogue run left ${left.size} pinned RDD(s) that survive GC " +
        "(strongly-held cache, not checkpoint lifecycle): " +
        left.map { case (id, r) =>
          s"#$id ${r.name} [${r.getStorageLevel.description}]"
        }.mkString("; "))
  }
}
