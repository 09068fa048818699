package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.PageStatus

/** Phase-2 orchestrator: one call = the reference's whole event-driven
  * pipeline (SURVEY §3.2-3.3) in batch-drain form — staged `.md` tree →
  * idempotent block store → ordered rate-limited drain → final page
  * statuses + dead-letter failures.
  */
object Phase2 {

  /** S11: per-directory `parenturl.txt` config discovery
    * (upload_notion_blocks.py:217-225; layout README.md:139-168). */
  def readParentUrls(spark: SparkSession, stagingDir: String): Map[String, String] = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val rows =
      try spark.read.format("binaryFile")
        .option("pathGlobFilter", "parenturl.txt")
        .option("recursiveFileLookup", "true")
        .schema(schema)
        .load(stagingDir)
        .select(
          regexp_replace(regexp_replace(col("path"), "^file:/*", "/"), "/[^/]*$", "")
            .as("dir"),
          // NB: Spark's trim() strips only spaces — strip all whitespace
          // (the file usually ends with a newline)
          regexp_replace(col("content").cast("string"), "^\\s+|\\s+$", "")
            .as("url"))
        .collect()
      catch {
        // only "nothing staged there" is a benign empty config — the
        // reference treats a missing parenturl.txt the same way
        // (upload_notion_blocks.py:217-225). Real IO faults (permissions,
        // unknown scheme, transient FS errors) must propagate: swallowing
        // them here would silently route every page to the failure path.
        case _: org.apache.spark.sql.AnalysisException =>
          Array.empty[org.apache.spark.sql.Row]
        case _: java.io.FileNotFoundException =>
          Array.empty[org.apache.spark.sql.Row]
      }
    rows.map(r => r.getString(0) -> r.getString(1)).toMap
  }

  case class Result(
      pages: DataFrame,
      failures: DataFrame,
      report: Drain.Report)

  /** Run ingest + drain end-to-end. `workDir` holds the block store and
    * streaming checkpoint (the DynamoDB-tables role). */
  def run(spark: SparkSession, stagingDir: String, workDir: String,
      api: NotionApi, cfg: Drain.Config = Drain.Config()): Result = {
    val blocksDir = s"$workDir/blocks"
    Ingest.start(spark, stagingDir, blocksDir, s"$workDir/checkpoint")
      .awaitTermination()
    // log-driven read: only files a sink commit published are visible
    // (legacy plain-parquet stores still read as before; mergeSchema in
    // both paths covers stores mixing 6- and 8-column files)
    val blocks = graft.sinks.GraftBlocksStore.read(spark, blocksDir)
    val parents = readParentUrls(spark, stagingDir)
    val (pages, failures, report) = Drain.run(spark, blocks, parents, api, cfg)
    Result(pages, failures, report)
  }
}
