package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.SparkTestSession

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("duplicates within the horizon dropped; first occurrence kept") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamingDedup.firstSeen(
      mem.toDF().toDF("ts", "doc_id", "text"), "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdedup_out")
      .outputMode(OutputMode.Append()).start()

    mem.addData((ts(0), 1L, "alpha"), (ts(1), 2L, "beta"))
    q.processAllAvailable()
    // same content re-uploaded inside the horizon -> dropped
    mem.addData((ts(2), 3L, "alpha"), (ts(3), 4L, "gamma"))
    q.processAllAvailable()
    val kept = spark.table("sdedup_out").select("doc_id")
      .as[Long].collect().toSet
    q.stop()
    assert(kept == Set(1L, 2L, 4L), s"got $kept")
  }
}
