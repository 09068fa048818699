package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** `Dataset.localCheckpoint()` pins its materialized RDD in the block
  * store, but `Dataset.unpersist()` only clears CacheManager entries
  * from `persist()` — checkpoint residue is unreachable through the
  * public Dataset API and otherwise lingers until the ContextCleaner
  * happens to GC it. This helper releases it deterministically.
  *
  * Only call once the checkpointed data can never be read again: a
  * local checkpoint truncates lineage, so the DataFrame is
  * unrecomputable after unpinning.
  */
object CheckpointBridge {
  /** Unpersist the block-store data behind a locally-checkpointed
    * DataFrame. No-op for plans that are not a checkpoint LogicalRDD. */
  def unpinCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
