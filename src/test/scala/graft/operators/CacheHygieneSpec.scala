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

  test("full catalogue run pins no RDD blocks it does not release, " +
      "and compiles every stage (zero CodeGenerator errors)") {
    val d = "/root/testdata/sf0.001"
    // snapshot first: suites sharing this SparkSession may legitimately
    // hold pinned blocks — the assertion is on what THIS run adds
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // round-17 verdict item 3: a whole-stage codegen compile failure
    // (janino) only LOGS an error and silently falls back to the
    // interpreted path — an interpreted global aggregate on the fact
    // side would be a real cost at 100 TB, and nothing named the
    // query. Watch the CodeGenerator logger across the run and fail
    // loudly with the query names instead.
    val codegenErrors =
      new java.util.concurrent.CopyOnWriteArrayList[String]()
    var current = "<none>"
    val appender = new org.apache.logging.log4j.core.appender
        .AbstractAppender("graft-codegen-watch", null, null, true,
          org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(
          e: org.apache.logging.log4j.core.LogEvent): Unit =
        if (e.getLevel.isMoreSpecificThan(
              org.apache.logging.log4j.Level.ERROR) &&
            e.getLoggerName.contains("CodeGenerator"))
          codegenErrors.add(
            s"$current: ${e.getMessage.getFormattedMessage.take(160)}")
    }
    appender.start()
    val logCtx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val rootCfg = logCtx.getConfiguration.getRootLogger
    rootCfg.addAppender(appender,
      org.apache.logging.log4j.Level.ERROR, null)
    logCtx.updateLoggers()
    try {
      graft.SparkEntry.queries.foreach { case (name, f) =>
        current = name
        withClue(s"query $name: ") { f(spark, d).count() }
      }
    } finally {
      rootCfg.removeAppender("graft-codegen-watch")
      logCtx.updateLoggers()
      appender.stop()
    }
    assert(codegenErrors.isEmpty,
      s"whole-stage codegen fell back to interpreted on: " +
        codegenErrors.toArray.mkString("; "))
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
