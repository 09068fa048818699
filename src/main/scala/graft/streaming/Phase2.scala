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
    * (upload_notion_blocks.py:217-225; layout README.md:139-168) as the
    * (dir, url) dimension DataFrame the drain joins on (J2) — never
    * collected to the driver, so the config scales with the staging
    * tree, not with driver memory. */
  def readParentUrls(spark: SparkSession, stagingDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    try {
      val dim = spark.read.format("binaryFile")
        .option("pathGlobFilter", "parenturl.txt")
        .option("recursiveFileLookup", "true")
        .schema(schema)
        .load(stagingDir)
        .select(
          Drain.dirOf(regexp_replace(col("path"), "^file:/*", "/")).as("dir"),
          // NB: Spark's trim() strips only spaces — strip all whitespace
          // (the file usually ends with a newline)
          regexp_replace(col("content").cast("string"), "^\\s+|\\s+$", "")
            .as("url"))
      // force the file-index resolution NOW so a bad root fails here,
      // with the intended missing-vs-fault distinction, not mid-drain
      dim.queryExecution.assertAnalyzed()
      dim.isEmpty
      dim
    } catch {
      // only "nothing staged there" is a benign empty config — the
      // reference treats a missing parenturl.txt the same way
      // (upload_notion_blocks.py:217-225). Real IO faults (permissions,
      // unknown scheme, transient FS errors) must propagate: swallowing
      // them here would silently route every page to the failure path.
      case _: org.apache.spark.sql.AnalysisException =>
        emptyDim(spark)
      case _: java.io.FileNotFoundException =>
        emptyDim(spark)
    }
  }

  private def emptyDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String)].toDF("dir", "url")
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
