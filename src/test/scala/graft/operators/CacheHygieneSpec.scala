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
    val leaked = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
    assert(leaked.isEmpty,
      s"catalogue run left ${leaked.size} pinned RDD(s): " +
        leaked.map { case (id, r) =>
          s"#$id ${r.name} [${r.getStorageLevel.description}]"
        }.mkString("; "))
  }
}
