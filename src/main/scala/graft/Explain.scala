package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection tool: prints `.explain("formatted")` for one or more
  * catalogue queries so plan shape (pushdown, broadcast, codegen spans,
  * shuffle count) can be reviewed per operator.
  *
  * Usage: `sbt "runMain graft.Explain q52_embed_neardup [q34_ann_brute ...]"`
  * (runs against SPARK_GRAFT_SF_DIR, default sf0.001).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // benchQueries = the production forms (what Bench times), which is
    // what plan review should look at
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchQueries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.benchQueries.get(name) match {
        case Some(fn) =>
          println(s"\n===== $name =====")
          fn(spark, sfDir).explain("formatted")
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
