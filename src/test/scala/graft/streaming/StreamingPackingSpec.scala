package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.SparkTestSession

/** Streaming packing must place documents exactly where the batch
  * operator would when fed in the same order — offsets continue across
  * micro-batches through per-shard state. */
class StreamingPackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streamed placements equal batch placements; offsets survive the batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id") % 4, col("doc_id"),
        graft.scale.Packing.tokenCount(col("text")))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._2)
    val (b1, b2) = docs.splitAt(docs.length / 2)

    val mem = MemoryStream[(Long, Long, Long)]
    val out = java.nio.file.Files
      .createTempDirectory("graft-spk").toString
    val q = StreamingPacking.placements(mem.toDS(), seqLen = 512L)
      .writeStream.format("parquet")
      .option("path", s"$out/rows")
      .option("checkpointLocation", s"$out/ckpt")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$out/rows")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._4, r._5, r._6)).toMap

    val batch = graft.scale.Packing
      .placements(graft.Tables.documents(spark, d), col("doc_id") % 4)
      .withColumn("bin_first", expr("cstart div 512"))
      .withColumn("bin_last", expr("(cstart + tk - 1) div 512"))
      .select("shard", "doc_id", "cstart", "bin_first", "bin_last")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

    assert(streamed.size == batch.size)
    assert(streamed == batch,
      "streaming placements diverge from the batch layout")
    // the batch split must actually cross shard offsets (placements in
    // b2 with nonzero cstart) or the state carry-over went untested
    val b2ids = b2.map(_._2).toSet
    assert(streamed.exists { case ((_, id), (cs, _, _)) =>
      b2ids.contains(id) && cs > 0
    }, "no second-batch doc continued a shard offset")
  }
}
