package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.SparkTestSession

class StreamingSessionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("session_window merges within the gap and closes after it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = StreamingSessions.sessions(
      mem.toDF().toDF("ts", "user_id"), gap = "5 minutes", watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()

    // burst 1: three events within the gap → ONE session; then a quiet
    // period > gap; burst 2 → a second session
    mem.addData((ts(0), "u1"), (ts(2), "u1"), (ts(4, 30), "u1"))
    q.processAllAvailable()
    mem.addData((ts(20), "u1"), (ts(21), "u1"))
    q.processAllAvailable()
    // advance the watermark far past both bursts so they finalize
    mem.addData((ts(59), "u2"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_out")
      .select("user_id", "session_start", "session_end", "events")
      .as[(String, Timestamp, Timestamp, Long)].collect()
      .filter(_._1 == "u1").sortBy(_._2.getTime)
    assert(got.length == 2, s"expected 2 closed sessions, got ${got.toSeq}")
    assert(got(0)._4 == 3 && got(0)._2 == ts(0))
    // session end = last event + gap (the inactivity horizon)
    assert(got(0)._3 == Timestamp.valueOf("2024-01-01 10:09:30"))
    assert(got(1)._4 == 2 && got(1)._2 == ts(20))
  }
}
