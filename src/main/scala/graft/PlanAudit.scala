package graft

import org.apache.spark.sql.SparkSession

/** Full-catalogue plan audit: flags CartesianProduct and
  * BroadcastNestedLoopJoin in every benched query's executed plan.
  *
  * CartesianProduct anywhere is a regression, and so is a query that
  * fails to plan at all — both exit nonzero.
  * BroadcastNestedLoopJoin hits are expected ONLY for the deliberate
  * one-row broadcast scalars (in-plan corpus stats / node counts /
  * codebook tables / histogram extents — q34/q51/q76/q82/q86/q87/q90/
  * q92-q96/q102/q103/q105/q114 class); a BNLJ against anything
  * row-proportional is a bug.
  *
  * Also reports (non-fatal) every query whose plan contains a Window
  * with an EMPTY partitionSpec — the single-partition sort that
  * funnels its input through one task at 100 TB (the q61/q131
  * two-level recipe exists to avoid it). Expected hits are the
  * bounded top-k rank stanzas (a row_number over a ≤100-row
  * post-limit frame); a global window over row-proportional input is
  * a bug. Reported not gated because the bounded cases are legitimate
  * and numerous — the line makes a NEW unbounded one visible in the
  * round-over-round diff.
  *
  * Usage: `sbt "runMain graft.PlanAudit"` (SPARK_GRAFT_SF_DIR,
  * default sf0.001). Round-11 baseline: 0 cartesian, 18 deliberate
  * one-row BNLJ.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var cartesians = 0
    var errors = 0
    var globalWindows = 0
    SparkEntry.benchQueries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val plan = qe.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        // pre-AQE physical tree: AdaptiveSparkPlanExec hides children
        // from collect, sparkPlan doesn't
        val gw = qe.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
        }.size
        if (cart) cartesians += 1
        if (gw > 0) globalWindows += 1
        if (cart || bnlj || gw > 0)
          println(s"AUDIT $name cartesian=$cart bnlj=$bnlj gwindow=$gw")
      } catch { case e: Throwable =>
        // a query that cannot PLAN must fail the gate too — an ERROR
        // line alone would let a broken query pass the cartesian sweep
        errors += 1
        println(s"AUDIT $name ERROR ${Option(e.getMessage).getOrElse("?").take(80)}")
      }
    }
    println(s"AUDIT done cartesians=$cartesians errors=$errors " +
      s"global_windows=$globalWindows")
    spark.stop()
    if (cartesians > 0 || errors > 0) sys.exit(1)
  }
}
