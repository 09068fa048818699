package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * SURVEY §7.2's minimum slice: scan → transform → generate → window →
    * aggregate over the `events` table, treating each user's events as a
    * "page" whose props explode into indexed blocks, drained in ordered
    * head-50 batches and tallied (reference: the full phase-2 drain loop,
    * upload_notion_blocks.py:257-337).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    ev.withColumn("block_index", row_number().over(w) - 1)
      .filter(col("block_index") < 50)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("uploaded_blocks"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("fail_count"))
      .withColumn("result", when(col("fail_count") > 0, "FAIL").otherwise("SUCCESS"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.operators.Catalogue.all ++ graft.operators.ScaleCatalogue.all ++
      graft.operators.WindowCatalogue.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.operators.Catalogue.oracles ++ graft.operators.ScaleCatalogue.oracles ++
      graft.operators.WindowCatalogue.oracles

  /** What Bench times: the production forms. Differs from `queries` only
    * where the oracle-compared query deliberately carries verification
    * apparatus the production operator doesn't pay for — q65's exact
    * distinct alongside its HLL++ sketch (round-5 verdict item 5). */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries + ("q65_approx_profile" ->
      (graft.operators.ScaleCatalogue.q65SketchProfile _))
}
