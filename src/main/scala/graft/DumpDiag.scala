package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-split task-time instrumentation for the bench dump scans — the
  * attribution tool for round-over-round `dump_scan_*` steps (the Bench
  * noise machinery adjudicates whole-query medians; this answers WHERE
  * a slow scan spends its time: skewed splits, serialized scheduling,
  * or uniform per-split cost).
  *
  * Prints, for each scan: split count, wall time, per-task durations
  * (sorted), the sum of task run times vs wall (parallel efficiency),
  * and the launch-time spread (a near-zero spread proves all tasks
  * started together — any serialization then lives INSIDE tasks).
  */
object DumpDiag {
  def main(args: Array[String]): Unit = {
    val cpus = 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mb = sys.env.getOrElse("SPARK_GRAFT_DUMP_MB", "384").toInt
    val dir = Paths.get("target", "bench-dump")
    val xml = BenchDump.plainXml(dir, mb)
    val (bz2, _) = BenchDump.multistreamBz2(dir, mb)

    case class T(taskId: Long, launch: Long, finish: Long, run: Long,
      deser: Long, gc: Long)
    val tasks = new scala.collection.mutable.ArrayBuffer[T]
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) tasks.synchronized {
          tasks += T(e.taskInfo.taskId, e.taskInfo.launchTime,
            e.taskInfo.finishTime, e.taskMetrics.executorRunTime,
            e.taskMetrics.executorDeserializeTime,
            e.taskMetrics.jvmGCTime)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def scan(path: String, splitMb: Int) = spark.read
      .format("mediawiki")
      .option("splitSize", (splitMb.toLong * 1024 * 1024).toString)
      .load(path)

    def drive(name: String, path: String, splitMb: Int): Unit = {
      // warm once (JIT + page cache), then measure
      scan(path, splitMb).agg(sum(length(col("text")))).collect()
      (1 to 2).foreach { rep =>
        tasks.synchronized(tasks.clear())
        val t0 = System.nanoTime()
        scan(path, splitMb).agg(sum(length(col("text")))).collect()
        val wallMs = (System.nanoTime() - t0) / 1e6
        Thread.sleep(300) // let the listener bus drain
        val ts = tasks.synchronized(tasks.toVector)
          .sortBy(_.launch)
        val scanTasks = ts.filter(_.run > 50) // the split tasks, not the 1-row reduce
        val runs = scanTasks.map(_.run).sorted
        val launch0 = if (ts.nonEmpty) ts.map(_.launch).min else 0L
        println(f"[dumpdiag] $name rep$rep wall=${wallMs / 1000}%.3fs " +
          f"tasks=${ts.size} scanTasks=${scanTasks.size} " +
          f"sumRun=${ts.map(_.run).sum / 1000.0}%.2fs " +
          f"gc=${ts.map(_.gc).sum / 1000.0}%.2fs " +
          f"parEff=${ts.map(_.run).sum / wallMs}%.1fx")
        println(s"[dumpdiag] $name rep$rep runMs(sorted)=" +
          runs.mkString(","))
        println(s"[dumpdiag] $name rep$rep launchOffsetsMs=" +
          ts.map(t => t.launch - launch0).mkString(","))
        println(s"[dumpdiag] $name rep$rep finishOffsetsMs=" +
          ts.map(t => t.finish - launch0).sorted.mkString(","))
      }
    }

    println(s"[dumpdiag] xml_mb=${Files.size(xml) / 1e6}")
    drive("xml", xml.toString, 32)
    drive("bz2", bz2.toString, 2)
    spark.stop()
  }
}
