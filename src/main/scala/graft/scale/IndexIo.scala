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
}
