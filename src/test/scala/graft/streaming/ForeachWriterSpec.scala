package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.model.NotionBlock
import graft.scale.SparkTestSession

class ForeachWriterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("writeStream.foreach uploads blocks in order with fail-fast") {
    MockNotionApi.reset("fw")
    implicit val sqlCtx = spark.sqlContext
    val st = MockNotionApi.state("fw")
    st.failStatus.set(400)
    st.failWhen.set(b => b.blockBatch == "bad" && b.blockIndex == 1)
    val mem = MemoryStream[NotionBlock]
    val q = mem.toDS().toDF()
      .writeStream
      .foreachBatch(NotionForeachWriter.sinkInto(
        () => new MockNotionApi("fw"), Map("Main" -> "https://n.test/m")))
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (0 until 4).map(i => NotionBlock("good", i, "b", "Main/good.md", "text", s"g$i")) ++
      (0 until 3).map(i => NotionBlock("bad", i, "b", "Main/bad.md", "text", s"b$i")): _*)
    q.processAllAvailable()
    q.stop()
    val ups = MockNotionApi.uploadsOf("fw")
    assert(ups.filter(_._2.blockBatch == "good").map(_._2.blockIndex) == Seq(0, 1, 2, 3))
    // bad page: block 0 uploaded, 1 failed (non-retryable), 2 skipped
    assert(ups.filter(_._2.blockBatch == "bad").map(_._2.blockIndex) == Seq(0))
    assert(ups.head._1.startsWith("https://n.test/m/"))
  }
}
