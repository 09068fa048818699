package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.SparkTestSession

/** A7 as a live stream: 1-minute tumbling sums over an event-time
  * watermark (the dashboard metric widgets, mw_to_notion_stack.py:741+,
  * upgraded from processing-time to event-time — the reference has no
  * watermarking at all, §2.9, so this is the Spark-native improvement). */
class WindowedMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int, sec: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("tumbling 1-minute sums with watermark; late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = mem.toDF().toDF("ts", "metric", "value")
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute").as("w"), col("metric"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("w.start").as("wstart"), col("metric"), col("n"), col("v"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()

    mem.addData((ts(0, 10), "blocks", 1.0), (ts(0, 40), "blocks", 2.0),
      (ts(1, 5), "blocks", 4.0))
    q.processAllAvailable()
    // advance watermark far past minute 0 and 1 -> those windows finalize
    mem.addData((ts(9, 0), "blocks", 8.0))
    q.processAllAvailable()
    // LATE: minute 0 arrives after the watermark passed -> dropped
    mem.addData((ts(0, 50), "blocks", 100.0))
    q.processAllAvailable()
    mem.addData((ts(20, 0), "blocks", 16.0))
    q.processAllAvailable()

    val out = spark.table("win_out")
      .select(col("wstart").cast("string"), col("n"), col("v"))
      .as[(String, Long, Double)].collect()
      .map { case (k, n, v) => k -> ((n, v)) }.toMap
    q.stop()
    assert(out("2024-01-01 10:00:00") == ((2L, 3.0)), s"got $out")   // late 100.0 dropped
    assert(out("2024-01-01 10:01:00") == ((1L, 4.0)), s"got $out")
  }

  test("streaming windowed metrics equal the batch computation (q09 shape)") {
    val d = "/root/testdata/sf0.001"
    // batch reference
    val batch = graft.operators.Catalogue.q09WindowMetrics(spark, d)
      .select(col("wstart").cast("string"), col("event_type"), col("n"),
        col("sum_value_c"))
      .as[(String, String, Long, Long)].collect().toSet
    // same aggregation as a file-source stream (complete drain, no
    // watermark: the reference's dashboards aggregate ALL data)
    // normalize ts the same way Tables.eventsRaw does — the testdata
    // generation decides whether the footer is TIMESTAMP(NANOS) (read
    // as long, rebuilt below) or TIMESTAMP(MICROS) (read natively as
    // TimestampType, no rebuild) — a hard-coded LongType schema would
    // silently misread a MICROS generation 1000× off
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    } catch { case _: Throwable => () }
    val schema = spark.read.parquet(s"$d/events.parquet").schema
    val tsIsNanosLong =
      schema("ts").dataType == org.apache.spark.sql.types.LongType
    // file stream sources need a directory — stage the single file
    val streamDir = java.nio.file.Files.createTempDirectory("graft-evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/events.parquet"),
      streamDir.resolve("events.parquet"))
    val raw = spark.readStream.schema(schema).parquet(streamDir.toString)
    val stream = (if (tsIsNanosLong)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(col("w.start").cast("string").as("wstart"), col("event_type"),
        col("n"), col("sum_value_c"))
    val q = stream.writeStream.format("memory").queryName("q09_stream")
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("q09_stream")
      .as[(String, String, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream/batch divergence: ${(streamed diff batch).take(3)} vs ${(batch diff streamed).take(3)}")
  }
}
