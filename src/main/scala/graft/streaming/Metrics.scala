package graft.streaming

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** K10/A3: pipeline metrics without a second pass over the data.
  *
  * The reference hand-batches EMF metric blobs to dodge CloudWatch
  * limits (store_notion_blocks.py:54-72); the Spark-native replacement
  * is `Dataset.observe` — metrics ride the existing job, delivered via
  * QueryExecutionListener, no extra action and no driver-side loop.
  */
object Metrics {

  private val sink = TrieMap.empty[String, Map[String, Any]]

  private lazy val listenerInstalled = TrieMap.empty[SparkSession, Boolean]

  def install(spark: SparkSession): Unit =
    listenerInstalled.getOrElseUpdate(spark, {
      // batch delivery: QueryExecutionListener fires for NAMED batch
      // actions only — Spark's ExecutionListenerBus forwards execution
      // ends only when executionName is defined, which STREAMING
      // micro-batches never set, so this listener alone silently
      // delivers nothing for a writeStream query
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = {
          qe.observedMetrics.foreach { case (name, row) =>
            sink.put(name, row.schema.fieldNames.zip(row.toSeq).toMap)
          }
        }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
      // streaming delivery: observed metrics ride each micro-batch's
      // progress event instead
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryIdle(e: QueryIdleEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit = {
            e.progress.observedMetrics.forEach { (name, row) =>
              sink.put(name, row.schema.fieldNames.zip(row.toSeq).toMap)
            }
          }
        })
      true
    })

  /** Attach block/page counters to a blocks DataFrame (A1/A3-shaped). */
  def observeBlocks(df: DataFrame, name: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("blocks_stored"),
      approx_count_distinct(col("blockBatch")).as("pages_seen"))

  /** Last observed values for a metric name (None until a job ran). */
  def get(name: String): Option[Map[String, Any]] = sink.get(name)

  def clear(): Unit = sink.clear()
}
