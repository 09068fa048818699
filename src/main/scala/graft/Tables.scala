package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Every query receives an `sfDir` (e.g. /root/testdata/sf0.01) and reads
  * single-parquet tables from it. Loaders are plain `spark.read.parquet`
  * so Catalyst sees a relation it can push filters/projections into —
  * at 100 TB these would be partitioned/bucketed tables behind the same
  * names and every downstream plan is unchanged.
  */
object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  // SCHEMA memoized per (session, path): every schema-less
  // spark.read.parquet call re-reads the footer to infer the schema —
  // measurable fixed cost when a catalogue of 80 queries opens the same
  // handful of tables. Only the schema is cached, NOT the DataFrame:
  // returning a shared relation object gives every caller the same
  // attribute ids and breaks self-joins with ambiguity errors. The
  // corpus is immutable for a session's lifetime (the driver's
  // generated testdata), so the cached schema stays valid.
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), org.apache.spark.sql.types.StructType]

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.getOrElseUpdate((spark, path),
      spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** events.parquet's `ts` has shipped in two parquet encodings across
    * testdata generations, both of which need normalization to a plain
    * TimestampType column holding the instants DuckDB sees:
    *
    *  - TIMESTAMP(NANOS): Spark 4 rejects it by default
    *    (PARQUET_TYPE_ILLEGAL). Read nanos as long and rebuild via
    *    `timestamp_micros(ts div 1000)` — the data is
    *    microsecond-precision, so the division is lossless.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): with
    *    inferTimestampNTZ left at its default Spark 4 would infer
    *    TIMESTAMP_NTZ, forcing a session-timezone-DEPENDENT cast back
    *    to TimestampType that also blocks parquet predicate pushdown
    *    on ts (the filter lands on the cast, not the column). Instead
    *    inferTimestampNTZ is disabled before schema inference, so the
    *    column is read natively as TimestampType: timezone-independent
    *    (parquet micros-since-epoch interpreted as instants, exactly
    *    DuckDB's reading) and filters reach the scan as PushedFilters.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // Both confs must hold at EXECUTION too, not just schema
    // inference — set them even on the schema-cached path. They are
    // SESSION-WIDE and deliberately never restored: every parquet read
    // in this harness flows through this object, and flip-flopping the
    // confs per call would make concurrently-planned reads (Bench's
    // warmups, streaming epochs) race on global state. The observable
    // effect on a foreign read in the same session is that TIMESTAMP
    // (MICROS, isAdjustedToUTC=false) columns arrive as TimestampType
    // rather than TIMESTAMP_NTZ — the interpretation this engine wants
    // everywhere (instants, DuckDB's reading, pushdown-friendly). A
    // caller embedding graft in a session that needs NTZ inference
    // should scope its own reads' confs.
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    } catch { case _: Throwable => () }
    val schema = schemaCache.getOrElseUpdate((spark, path),
      spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // pre-conf cached schema; same reinterpretation
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
