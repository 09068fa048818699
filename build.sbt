ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mediawikitonotionspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Per-test durations in the report (-oD): the round-20 driver test run
// expired its window with no way to tell WHICH suites carry the time —
// the duration flag makes every future timing attributable from the
// log alone.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")

// ---- PARALLEL FORKED TEST GROUPS (round-20 verdict item 1) ----
// One sequential JVM ran the full suite in 84.6 min on this box
// (2026-08-18: 566 tests, test-body sum 57 min, no dominating suite —
// the time is spread across ~25 suites of 40-380 s), which is why the
// round-20 driver's test window expired on an all-passing tail. Suites
// are now LPT-packed into N forked JVMs by measured weight (unknown
// suites default to 15 s and slot in); each group gets its own
// SparkSession, suites inside a group stay sequential, and the shared
// target/<family> fixture caches are guarded by a cross-process file
// lock (ScaleCatalogue.cachedIndexDir), so groups never tear a
// first-build. N defaults to cores/5 capped at 6 (local[4] sessions +
// driver overhead ≈ full machine at 6 groups on 32 cores; 1 on a
// 4-core box = the old sequential behavior). Override with
// SPARK_GRAFT_TEST_GROUPS. Measured: 84.6 min -> see
// OPTIMIZATION_r21.md.
val measuredSuiteSec: Map[String, Int] = Map(
  "ClusterStoreSpec" -> 377, "CitationDeleteSpec" -> 274,
  "LshIndexSpec" -> 182, "CitationUpsertSpec" -> 180,
  "BmAsOfSpec" -> 145, "MaintenancePinSpec" -> 144,
  "BmHealSpec" -> 144, "CitationAsOfSpec" -> 139,
  "BmIndexSpec" -> 134, "GraphSpec" -> 117,
  "IndexChangeFeedSpec" -> 84, "IvfPqIndexSpec" -> 79,
  "CitationIndexSpec" -> 77, "ServingHandleSpec" -> 71,
  "IvfIndexSpec" -> 69, "IncrementalClustersSpec" -> 63,
  "DrainPropertySpec" -> 61, "IncrementalRetrievalVectorsSpec" -> 60,
  "IncrementalCitationsSpec" -> 52, "BoundedDrainSpec" -> 51,
  "EndToEndSpec" -> 48, "GraftKeyIndexSpec" -> 46,
  "IvfAsOfSpec" -> 46, "IncrementalNearDupSpec" -> 46,
  "IvfPqCompactSpec" -> 42, "SnapshotManifestSpec" -> 38,
  "HandlePropertySpec" -> 35, "LshAsOfSpec" -> 35,
  "CheckpointHygieneSpec" -> 35, "ObjectStoreRealismSpec" -> 30,
  "ContinuousPhase2Spec" -> 30, "StreamingCompactionSpec" -> 25,
  "LayoutContractSpec" -> 25, "BenchAdjudicationSpec" -> 25,
  "IvfPqAsOfSpec" -> 20, "CorpusMixPropertySpec" -> 20,
  "ScaleSpec" -> 20, "PlanShapeSpec" -> 20)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  val n = sys.env.get("SPARK_GRAFT_TEST_GROUPS")
    .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
    .getOrElse {
      val cores = java.lang.Runtime.getRuntime.availableProcessors()
      math.min(6, math.max(1, cores / 5))
    }
  if (n <= 1)
    Seq(Tests.Group("tests", tests, Tests.SubProcess(forkOpts)))
  else {
    def weight(t: TestDefinition): Int =
      measuredSuiteSec.getOrElse(t.name.split('.').last, 15)
    val sorted = tests.sortBy(t => (-weight(t), t.name))
    val buckets = Array.fill(n)(List.empty[TestDefinition])
    val load = Array.fill(n)(0)
    sorted.foreach { t =>
      val i = load.zipWithIndex.minBy { case (l, idx) => (l, idx) }._2
      buckets(i) = t :: buckets(i)
      load(i) += weight(t)
    }
    buckets.zipWithIndex.toSeq.map { case (ts, i) =>
      Tests.Group(s"g$i", ts.reverse, Tests.SubProcess(forkOpts))
    }
  }
}
// allow the groups to actually run concurrently (sbt's default caps
// forked test groups at 1)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(24),
  Tags.limit(Tags.ForkedTestGroup, 8))
// Forked run output goes through sbt's logger by default, which
// prefixes every line with "[info] " — that breaks line-oriented
// consumers of Bench/Verify stdout (a JSON artifact line must land
// verbatim). StdoutOutput passes the child's stdout straight through.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
