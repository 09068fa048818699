package graft.streaming

import org.apache.spark.sql.{ForeachWriter, Row}
import org.apache.spark.util.CollectionAccumulator
import graft.model.NotionBlock

/** Streaming-native form of the upload sink: a `ForeachWriter` with
  * K5's rate limit + ST8's retry in the writer, one writer per partition
  * per epoch.
  *
  * Ordering note: streaming plans reject sorts, so the W4 guarantee is
  * established inside `foreachBatch`, where each micro-batch is a plain
  * DataFrame: `coalesce(1).sortWithinPartitions(batch, index)` and then
  * drive this writer per partition (see [[NotionForeachWriter.sinkInto]]
  * and ForeachWriterSpec). `writeStream.foreach(writer)` directly is
  * only order-safe if the upstream produces ordered single-partition
  * batches.
  *
  * Failure routing: a page whose upload ultimately fails must never
  * vanish silently — every give-up is logged with its cause, and when a
  * `failures` accumulator is supplied (driver-side, readable after each
  * epoch) the (blockBatch, error) pair is recorded there for K8
  * dead-letter routing, mirroring Drain's failures output.
  *
  * The API client is constructed lazily in `open` on the executor — the
  * reference's warm-container client cache (upload_notion_blocks.py:51,
  * 157-160) becomes a per-writer lazy singleton.
  */
class NotionForeachWriter(
    apiFactory: () => NotionApi,
    parents: Map[String, String],
    minIntervalMs: Long = 0L,
    httpRetries: Int = 5,
    backoffBaseMs: Long = 1L,
    failures: CollectionAccumulator[(String, String)] = null)
  extends ForeachWriter[Row] with org.apache.spark.internal.Logging {

  @transient private var api: NotionApi = _
  @transient private var lastCall = 0L
  @transient private var failedBatches: scala.collection.mutable.Set[String] = _
  @transient private var cachedBatch: String = _
  @transient private var cachedPageUrl: String = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    api = apiFactory()
    lastCall = 0L
    failedBatches = scala.collection.mutable.Set.empty[String]
    cachedBatch = null
    cachedPageUrl = null
    true
  }

  override def process(r: Row): Unit = {
    // rich payload columns are optional in the incoming frame (older
    // stores lack them) — default to empty rather than failing the sink
    def optField(name: String): String =
      if (r.schema.fieldNames.contains(name))
        Option(r.getAs[String](name)).getOrElse("")
      else ""
    val b = NotionBlock(
      r.getAs[String]("blockBatch"), r.getAs[Int]("blockIndex"),
      r.getAs[String]("bucket"), r.getAs[String]("key"),
      r.getAs[String]("blockType"), r.getAs[String]("title"),
      optField("language"), optField("caption"))
    if (failedBatches.contains(b.blockBatch)) return // ST6 fail-fast
    val dir = b.key.lastIndexOf('/') match {
      case -1 => ""
      case i => b.key.substring(0, i)
    }
    val parentUrl = parents.getOrElse(dir, "https://notion.test/default")
    try {
      // rows arrive batch-sorted: one get-or-create per PAGE
      val pageUrl =
        if (b.blockBatch == cachedBatch) cachedPageUrl
        else {
          val u = api.getOrCreatePage(b.blockBatch, b.key, parentUrl)
          cachedBatch = b.blockBatch; cachedPageUrl = u; u
        }
      if (minIntervalMs > 0 && lastCall != 0L) {
        val since = (System.nanoTime() - lastCall) / 1000000L
        if (since < minIntervalMs) Thread.sleep(minIntervalMs - since)
      }
      try {
        var attempt = 0
        var done = false
        while (!done) {
          try { api.uploadBlock(pageUrl, b); done = true }
          catch {
            case e: NotionApiError
                if NotionApiError.retryableStatuses(e.status) && attempt < httpRetries =>
              Thread.sleep(backoffBaseMs * (1L << attempt)); attempt += 1
          }
        }
      } finally lastCall = System.nanoTime()
      // throttle clock advances even when the upload gave up — a failed
      // block must not let the next one bypass the K5 interval
    } catch {
      case t: Throwable =>
        logWarning(s"streaming upload: giving up on page ${b.blockBatch} " +
          s"at block ${b.blockIndex}", t)
        if (failures != null)
          failures.add((b.blockBatch,
            Option(t.getMessage).getOrElse(t.getClass.getName)))
        failedBatches += b.blockBatch
    }
  }

  override def close(errorOrNull: Throwable): Unit = ()
}

object NotionForeachWriter {
  import org.apache.spark.sql.DataFrame

  /** The ordered foreachBatch sink: sort each micro-batch into one
    * partition (W4/ST4) and drive the writer over it. Use as
    * `blocks.writeStream.foreachBatch(NotionForeachWriter.sinkInto(...))`.
    * Pass a `failures` accumulator to receive (blockBatch, error) pairs
    * for dead-letter routing after each epoch. */
  def sinkInto(apiFactory: () => NotionApi, parents: Map[String, String],
      minIntervalMs: Long = 0L,
      failures: CollectionAccumulator[(String, String)] = null): (DataFrame, Long) => Unit = {
    (batch: DataFrame, epochId: Long) =>
      batch.coalesce(1)
        .sortWithinPartitions(org.apache.spark.sql.functions.col("blockBatch"),
          org.apache.spark.sql.functions.col("blockIndex"))
        .foreachPartition { (it: Iterator[Row]) =>
          val w = new NotionForeachWriter(apiFactory, parents, minIntervalMs,
            failures = failures)
          if (w.open(0L, epochId)) {
            try it.foreach(w.process)
            finally w.close(null)
          }
        }
  }
}
