package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional subset for local iteration: SPARK_GRAFT_ONLY=q74,q72
    // (substring match on query names). Unset = full catalogue.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) // empty var == unset == full catalogue
    def selected(name: String): Boolean =
      only.forall(_.exists(name.contains))
    // Warmup at the smallest SF: JIT, codegen cache, file-index and
    // parquet-footer caches — mirrors a warm cluster; per-query numbers
    // then measure the query, not session startup.
    SparkEntry.queries.toSeq.sortBy(_._1).filter(q => selected(q._1))
      .foreach { case (_, fn) =>
        try fn(spark, "/root/testdata/sf0.001").count()
        catch { case _: Throwable => () }
      }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => selected(q._1)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
