package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared IO shim for the persisted index layouts ([[LshIndex]],
  * [[CitationIndex]], …): schema-explicit parquet reads that tolerate
  * absent AND file-less directories — a zero-row write (the documented
  * build-over-an-empty-frame cold start, an all-duplicate append)
  * leaves a directory schema inference cannot read, and every index
  * reader must keep working through it. One definition so the
  * tolerance semantics cannot drift between index families. */
private[scale] object IndexIo {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def emptyFrame(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  def readOr(spark: SparkSession, path: String, schema: StructType): DataFrame =
    if (!exists(spark, path)) emptyFrame(spark, schema)
    else spark.read.schema(schema).parquet(path)

  /** Size-guarded broadcast hint for the CDC serving reads (round-14
    * advice): every index family joins its main tree against a
    * revision registry or tombstone set that is O(revised)/O(deleted)
    * *by compaction discipline* — but grows without bound between
    * compactions, and a forced `broadcast()` hint has no size guard
    * (AQE will not demote a hint), so a lazy compaction schedule turns
    * the hint into a driver/executor OOM at 100 TB. Gate the hint on
    * the optimizer's own size estimate (for these parquet-backed
    * registries that is actual file bytes — exactly the signal that
    * grows with revisions and resets at compaction) against the
    * session's auto-broadcast threshold: within it, keep the hint
    * (estimates after aggregation can otherwise lose the broadcast to
    * conservative planning); past it, fall back to a plain join that
    * Catalyst/AQE plan from true runtime sizes. Threshold <= 0
    * (user disabled broadcast) always falls back. */
  def maybeBroadcast(df: DataFrame): DataFrame = {
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thr > 0 &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes <= thr)
      org.apache.spark.sql.functions.broadcast(df)
    else df
  }
}
