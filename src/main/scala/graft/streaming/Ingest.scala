package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.convert.MarkdownBlocks

/** Phase-2 ingest: staged `.md` objects → exploded, ordinally-indexed
  * block rows in the blocks store (the StoreNotionBlocks lambda,
  * SURVEY §3.2), as Structured Streaming.
  *
  *  - ST1: file source with `pathGlobFilter=*.md` (the S3-suffix
  *    notification filter, pushed down to listing)
  *  - T13: batch ids are deterministic — xxhash64(path, mtime,
  *    content length) — so replays are idempotent and "re-upload =
  *    new page" holds even when a rewrite lands within one mtime
  *    granularity tick (the length term separates it)
  *  - T11/T12: markdown → ordered blocks via a flatMap generator +
  *    posexplode ordinal
  *  - F8: pandoc comment artifacts filtered
  *  - K3: idempotent append through the `graft-blocks` DSv2 sink —
  *    first-writer-wins on blockBatch (the reference's
  *    `ConditionExpression=Attr("BlockBatch").not_exists()`), with
  *    `queryId#epochId` transactional commits for exactly-once
  *    micro-batches and log-driven visibility (see
  *    [[graft.sinks.GraftBlocksDataSource]])
  */
object Ingest {

  private val parseUdf = udf { (text: String) =>
    MarkdownBlocks.parseRich(text)
      .filterNot(b => MarkdownBlocks.isPandocCommentArtifact(b.blockType, b.title))
      .map(b => (b.blockType, b.title, b.language, b.caption))
  }

  /** Shared batch transform: staged file rows → block rows.
    * Input schema: (path string, modificationTime timestamp,
    * content binary). */
  def explodeBlocks(staged: DataFrame): DataFrame = {
    staged
      .withColumn("key",
        regexp_replace(col("path"), "^file:/*", "/"))
      // deterministic batch identity (T13): hash of (key, mtime,
      // content length). Length is in the key so a file rewritten twice
      // within one mtime granularity tick still mints a fresh batch
      // when its size changed — without it the second rewrite collided
      // with the first and the store's first-writer-wins probe silently
      // dropped the newer content. Residual conflation (same key, same
      // mtime tick, same byte length, different bytes) and the 63-bit
      // birthday bound are stated limits of hash-derived identity; a
      // content-hash key would close both at the cost of hashing every
      // payload per epoch.
      .withColumn("blockBatch",
        concat(lit("b"),
          abs(xxhash64(col("key"), col("modificationTime"),
            length(col("content")))).cast("string")))
      .withColumn("markdown", col("content").cast("string"))
      .select(col("blockBatch"), col("key"),
        posexplode(parseUdf(col("markdown"))).as(Seq("blockIndex", "block")))
      .select(col("blockBatch"),
        col("blockIndex").cast("int").as("blockIndex"),
        lit("staging").as("bucket"), col("key"),
        col("block._1").as("blockType"), col("block._2").as("title"),
        col("block._3").as("language"), col("block._4").as("caption"))
  }

  /** The staged-`.md` file-source stream (ST1): shared by the
    * batch-drain pipeline ([[start]]) and the continuous one
    * ([[Phase2.runContinuous]]). */
  def stagedStream(spark: SparkSession, stagingDir: String): DataFrame =
    spark.readStream
      .format("binaryFile")
      .option("pathGlobFilter", "*.md")
      .option("recursiveFileLookup", "true") // staging tree is per-namespace
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(stagingDir)

  /** Start the streaming ingest into a parquet blocks store. */
  def start(spark: SparkSession, stagingDir: String, blocksDir: String,
      checkpointDir: String): StreamingQuery =
    explodeBlocks(stagedStream(spark, stagingDir)).writeStream
      .format("graft-blocks")
      .option("path", blocksDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
