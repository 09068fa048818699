package graft.sinks

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, PhysicalWriteInfo}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

import graft.scale.SparkTestSession

/** K3/K4 conditional-insert semantics through the DSv2 write path
  * (reference store_notion_blocks.py:128-150:
  * `ConditionExpression=Attr("BlockBatch").not_exists()`). */
class GraftBlocksSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(batch: String, n: Int) =
    (0 until n).map(i => (batch, i, "staging", s"Main/$batch.md",
      "text", s"$batch-$i", null: String, null: String))
      .toDF("blockBatch", "blockIndex", "bucket", "key",
        "blockType", "title", "language", "caption")

  private def freshDir(): String =
    Files.createTempDirectory("graft-sink").toString

  test("batch append + first-writer-wins on blockBatch") {
    val dir = freshDir()
    rows("b1", 3).union(rows("b2", 2)).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    assert(GraftBlocksStore.read(spark, dir).count() == 5)

    // second write: b2 replayed (must be dropped whole), b3 new
    rows("b2", 2).union(rows("b3", 4)).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    val stored = GraftBlocksStore.read(spark, dir)
    assert(stored.count() == 9)
    assert(stored.groupBy("blockBatch").count().as[(String, Long)]
      .collect().toMap == Map("b1" -> 3L, "b2" -> 2L, "b3" -> 4L))
    // keys ledger agrees
    assert(GraftBlocksStore.committedKeys(spark, dir) == Set("b1", "b2", "b3"))
  }

  test("visibility is log-driven: crash residue in staging/data never surfaces") {
    val dir = freshDir()
    rows("b1", 3).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    // simulate task residue: an orphan staged file and an unlogged data file
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val staged = GraftBlocksLog.stagingDir(new Path(dir))
    fs.mkdirs(staged)
    rows("zz", 5).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/_tmp_residue")
    val part = fs.listStatus(new Path(s"$dir/_tmp_residue"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(part, new Path(staged, "orphan-0-1.parquet"))
    rows("zz", 5).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/_tmp_residue2")
    val part2 = fs.listStatus(new Path(s"$dir/_tmp_residue2"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(part2, new Path(GraftBlocksLog.dataDir(new Path(dir)),
      "unlogged.parquet"))

    val stored = GraftBlocksStore.read(spark, dir)
    assert(stored.count() == 3)
    assert(!stored.select("blockBatch").as[String].collect().contains("zz"))
  }

  test("streaming epoch replay is exactly-once via queryId#epochId txn") {
    val dir = freshDir()
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val schema = GraftBlocksTableSink.DefaultSchema
    val table = new GraftBlocksTableSink(dir, schema, "blockBatch")

    def info(qid: String): LogicalWriteInfo = new LogicalWriteInfo {
      override def queryId(): String = qid
      override def schema(): StructType = GraftBlocksTableSink.DefaultSchema
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
    }
    def internalRows(batch: String, n: Int): Seq[InternalRow] = {
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(schema)
      val ser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(enc)
        .createSerializer()
      (0 until n).map(i => ser(org.apache.spark.sql.Row(
        batch, i, "staging", s"Main/$batch.md", "text", s"$batch-$i",
        null, null)).copy())
    }
    def writeEpoch(qid: String, epoch: Long, batch: String): Unit = {
      val write = table.newWriteBuilder(info(qid)).build()
      val sw = write.toStreaming
      val w = sw.createStreamingWriterFactory(null).createWriter(0, 7L, epoch)
      internalRows(batch, 4).foreach(w.write)
      sw.commit(epoch, Array(w.commit()))
    }

    writeEpoch("q-A", 0L, "e0")
    assert(GraftBlocksStore.read(spark, dir).count() == 4)
    // crash-replay of epoch 0: same query id, same epoch — no-op,
    // and its staged files are cleaned up
    writeEpoch("q-A", 0L, "e0")
    assert(GraftBlocksStore.read(spark, dir).count() == 4)
    assert(!fs.exists(GraftBlocksLog.stagingDir(root)) ||
      fs.listStatus(GraftBlocksLog.stagingDir(root)).isEmpty)
    // next epoch appends
    writeEpoch("q-A", 1L, "e1")
    assert(GraftBlocksStore.read(spark, dir).count() == 8)
  }

  test("stale-snapshot race: commit heals a mixed file under the store lock") {
    val dir = freshDir()
    val schema = GraftBlocksTableSink.DefaultSchema
    val table = new GraftBlocksTableSink(dir, schema, "blockBatch")
    val info = new LogicalWriteInfo {
      override def queryId(): String = "batch"
      override def schema(): StructType = GraftBlocksTableSink.DefaultSchema
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
    }
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val ser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(enc)
      .createSerializer()
    def internalRows(batch: String, n: Int): Seq[InternalRow] =
      (0 until n).map(i => ser(org.apache.spark.sql.Row(
        batch, i, "staging", s"Main/$batch.md", "text", s"$batch-$i",
        null, null)).copy())

    // two writes planned against the SAME (empty) snapshot
    val w1 = table.newWriteBuilder(info).build().toBatch
    val w2 = table.newWriteBuilder(info).build().toBatch
    val d1 = w1.createBatchWriterFactory(null).createWriter(0, 1L)
    (internalRows("shared", 3) ++ internalRows("only1", 2)).foreach(d1.write)
    val d2 = w2.createBatchWriterFactory(null).createWriter(0, 2L)
    (internalRows("shared", 3) ++ internalRows("only2", 5)).foreach(d2.write)
    w1.commit(Array(d1.commit()))
    w2.commit(Array(d2.commit())) // 'shared' lost the race; 'only2' survives

    val stored = GraftBlocksStore.read(spark, dir)
    assert(stored.groupBy("blockBatch").count().as[(String, Long)]
      .collect().toMap ==
      Map("shared" -> 3L, "only1" -> 2L, "only2" -> 5L))
    assert(GraftBlocksStore.committedKeys(spark, dir) ==
      Set("shared", "only1", "only2"))
  }

  test("writeTo through GraftCatalog: create then append, FWW preserved") {
    val wh = freshDir()
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    rows("c1", 3).writeTo("graft.blocks").create()
    rows("c1", 3).union(rows("c2", 2)).writeTo("graft.blocks").append()
    val stored = GraftBlocksStore.read(spark, s"$wh/blocks")
    assert(stored.groupBy("blockBatch").count().as[(String, Long)]
      .collect().toMap == Map("c1" -> 3L, "c2" -> 2L))
    intercept[Exception] { // append-only store: no overwrite surface
      rows("c3", 1).writeTo("graft.blocks").replace()
    }
  }

  test("legacy store without a log reads as plain parquet") {
    val dir = freshDir()
    rows("old", 4).write.mode("append").parquet(dir)
    assert(GraftBlocksStore.read(spark, dir).count() == 4)
  }

  test("legacy PARTITIONED store (key=… subdirs, no top-level files) still reads") {
    // pre-sink foreachBatch stores were sometimes written partitioned:
    // data lives under blockBatch=…/ subdirectories with NO top-level
    // *.parquet files — a files-only data probe would silently hide it
    // behind the empty typed frame
    val dir = freshDir()
    rows("p1", 3).union(rows("p2", 2))
      .write.partitionBy("blockBatch").mode("append").parquet(dir)
    assert(GraftBlocksStore.read(spark, dir).count() == 5,
      "partitioned legacy rows hidden by the files-only data probe")
  }

  test("a failed write's lease residue must not hide legacy rows") {
    // lease acquire creates _graft_log/ BEFORE adoption validation; a
    // failed first write on a legacy store leaves the dir with only
    // _lease — read() must still take the legacy branch (log detection
    // requires real log state, not the bare directory)
    val dir = freshDir()
    rows("old", 4).write.mode("append").parquet(dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val leaseDir = GraftBlocksLog.logDir(fs.makeQualified(p))
    fs.mkdirs(leaseDir)
    val out = fs.create(new Path(leaseDir, "_lease"), true)
    out.write("dead-owner\n0\n".getBytes("UTF-8")); out.close()
    assert(GraftBlocksStore.read(spark, dir).count() == 4,
      "legacy rows hidden by lease-only _graft_log residue")
    // and a lease-only EMPTY root reads as an empty typed frame, not a
    // schema-inference failure
    val empty = freshDir()
    val ep = fs.makeQualified(new Path(empty))
    fs.mkdirs(GraftBlocksLog.logDir(ep))
    val out2 = fs.create(new Path(GraftBlocksLog.logDir(ep), "_lease"), true)
    out2.write("dead-owner\n0\n".getBytes("UTF-8")); out2.close()
    assert(GraftBlocksStore.read(spark, empty).count() == 0)
  }

  test("null batch key is rejected (store partition key contract)") {
    val dir = freshDir()
    val bad = Seq((null: String, 0)).toDF("blockBatch", "blockIndex")
    val ex = intercept[Exception] {
      bad.write.format("graft-blocks").option("path", dir)
        .mode("append").save()
    }
    assert(ex.getMessage != null)
  }
}
