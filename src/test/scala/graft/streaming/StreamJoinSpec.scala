package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.SparkTestSession

class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("interval join matches within the look-back and not outside") {
    implicit val sqlCtx = spark.sqlContext
    val errors = MemoryStream[(Timestamp, String, String)]
    val clicks = MemoryStream[(Timestamp, String, String)]
    val joined = StreamJoin.intervalJoin(
      errors.toDF().toDF("ts", "user_id", "payload"),
      clicks.toDF().toDF("ts", "user_id", "payload"),
      key = "user_id", lookback = "10 minutes", watermark = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode(OutputMode.Append()).start()

    // u1: click at 10:00 → error at 10:05 joins (within 10 min);
    //     click at 10:30 is AFTER the error — must not join
    // u2: click at 9:50... (can't go below 10:00 here) click at 10:00,
    //     error at 10:20 → 20 min gap exceeds the look-back — no join
    clicks.addData((ts(0), "u1", "c1"), (ts(30), "u1", "c2"),
      (ts(0), "u2", "c3"))
    errors.addData((ts(5), "u1", "e1"), (ts(20), "u2", "e2"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sj_out")
      .select($"k", $"l.payload".as[String], $"r.payload".as[String])
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == Set(("u1", "e1", "c1")),
      s"expected exactly the in-window pair, got $got")
  }
}
