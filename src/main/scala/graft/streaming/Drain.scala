package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.util.CollectionAccumulator
import graft.model.{NotionBlock, PageStatus}

/** The ordered, rate-limited, fail-fast drain sink — the whole phase-2
  * upload loop (SURVEY §3.3) as one batch-iterative operator:
  *
  *  - W2/S7: per-batch ordered head-`maxBlocks` chunks per iteration
  *  - W4: upload order == blockIndex order, enforced by
  *    `coalesce(1).sortWithinPartitions` feeding a single writer
  *  - ST4: the global semaphore becomes structural — one sink partition
  *  - K5: token-bucket rate limiting between API calls
  *  - ST8: retry with exponential backoff on 429/502/503/504
  *  - ST6: first failing block aborts its page for the iteration;
  *    remaining blocks skipped
  *  - ST2/K8: failed pages retry up to `maxAttempts` iterations (SQS
  *    redelivery), then dead-letter into the failures output
  *  - K6: uploaded blocks leave the pending set (delete-as-cursor), so
  *    retries resume exactly at the failure point
  *
  * Results are reported through a CollectionAccumulator — the
  * cluster-safe channel for sink-side outcomes.
  */
object Drain extends org.apache.spark.internal.Logging {

  case class Config(
      maxBlocks: Int = 50,
      minIntervalMs: Long = 0L,
      maxAttempts: Int = 5,
      httpRetries: Int = 5,
      backoffBaseMs: Long = 1L)

  /** Drain outcome. `succeededPages`/`deadLetteredPages` are a sorted
    * driver-side convenience CAPPED at [[ReportPageCap]] ids each (the
    * full sets are the returned status/failures DataFrames);
    * `succeededPageCount`/`deadLetteredPageCount` always carry the full
    * cardinalities. */
  case class Report(
      iterations: Int,
      uploaded: Long,
      succeededPages: Seq[String],
      deadLetteredPages: Seq[String],
      succeededPageCount: Long = -1L,
      deadLetteredPageCount: Long = -1L,
      /** Peak size of the only cross-iteration driver-held id state (the
        * retry counters for batches whose last touch failed) — the
        * observable witness that a drain holds O(failing), not
        * O(backlog), ids on the driver. */
      peakRetryTracked: Int = -1)

  /** Cap on the page-id lists materialized into [[Report]] — keeps the
    * driver O(1) in the backlog size even when a month-long drain
    * completes millions of pages. */
  val ReportPageCap = 10000

  /** Directory of a storage key/path: everything before the last '/',
    * "" when there is none. THE dir derivation for the J2 parent-URL
    * join — [[Phase2.readParentUrls]] keys its dimension with the same
    * helper, so the two sides cannot drift. */
  def dirOf(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(key.contains("/"), regexp_replace(key, "/[^/]*$", ""))
      .otherwise(lit(""))

  /** Resolve at-least-once accumulator rows per (batch, index): a
    * retried task re-adds its rows (the reference's SQS redelivery) and
    * a retry can CHANGE an outcome — fail on attempt 1, succeed on the
    * replay. Any recorded success means the block IS uploaded; treating
    * the stale failure as authoritative would dead-letter a fully
    * uploaded page. */
  private[streaming] def resolveOutcomes(
      rows: Seq[(String, Int, Boolean)]): Seq[(String, Int, Boolean)] =
    rows.distinct.groupBy(r => (r._1, r._2))
      .map { case ((b, i), vs) => (b, i, vs.exists(_._3)) }.toSeq

  val DefaultParentUrl = "https://notion.test/default"

  /** Map-dimension convenience (tests, small configs): the map becomes
    * the (dir, url) dimension DataFrame of the join form. */
  def run(spark: SparkSession, blocks: DataFrame, parents: Map[String, String],
      api: NotionApi, cfg: Config): (DataFrame, DataFrame, Report) = {
    import spark.implicits._
    run(spark, blocks, parents.toSeq.toDF("dir", "url"), api, cfg)
  }
  def run(spark: SparkSession, blocks: DataFrame, parents: Map[String, String],
      api: NotionApi): (DataFrame, DataFrame, Report) =
    run(spark, blocks, parents, api, Config())

  /** Run the drain to completion.
    *
    * @param blocks     pending blocks (NotionBlock shape)
    * @param parentsDim (dir, url) dimension DataFrame, J2 — joined onto
    *                   the blocks by key directory (the reference's
    *                   per-directory parenturl.txt resolution), never
    *                   collected to the driver
    * @return (finalPageStatus DataFrame, failures DataFrame, report)
    */
  def run(spark: SparkSession, blocks: DataFrame, parentsDim: DataFrame,
      api: NotionApi, cfg: Config = Config()): (DataFrame, DataFrame, Report) = {
    import spark.implicits._

    // pad rich-payload columns absent from pre-upgrade block stores —
    // case-class defaults are NOT applied by Spark encoders, so an old
    // 6-column store would otherwise fail .as[NotionBlock] resolution
    val padded = Seq("language", "caption").foldLeft(blocks) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(""))
    }
    // J2 as a JOIN: key directory → parent URL, resolved once up front.
    // The dimension is one row per staged directory — dimension-sized,
    // so the optimizer broadcasts it; a driver-collected Map would cap
    // the config at driver memory for no reason.
    val withParent = padded
      .withColumn("dir", dirOf(col("key")))
      .join(parentsDim.withColumnRenamed("url", "__parentUrl"),
        Seq("dir"), "left")
      .withColumn("parentUrl",
        coalesce(col("__parentUrl"), lit(DefaultParentUrl)))
      .drop("dir", "__parentUrl")
    var pending = withParent.cache()
    // cross-iteration page-id state lives in DataFrames, NOT driver
    // collections: a full backlog drain completes every page, and a
    // driver Set holding every drained id is exactly the scale bug the
    // key-set closure fix removed from the sink. The driver holds only
    // per-iteration deltas (bounded by the touched chunk) plus the
    // `attempts` counters for batches whose LAST touch was a failure.
    var doneDf = spark.emptyDataset[String].toDF("blockBatch")
    var deadDf = spark.emptyDataset[String].toDF("blockBatch")
    var deadNonEmpty = false
    var doneNonEmpty = false
    val attempts = scala.collection.mutable.Map.empty[String, Int]
    var peakRetry = 0
    var uploadedTotal = 0L
    var iter = 0
    var stalled = false

    // drop dead-lettered batches via an anti-join — an `isin(dead...)`
    // expression (or a driver-collected set) grows with the DLQ and
    // would bloat the plan and the driver on a long-running drain
    def withoutDead(df: DataFrame): DataFrame =
      if (!deadNonEmpty) df
      else df.join(deadDf, Seq("blockBatch"), "left_anti")

    while (!stalled && iter < 10000 && !withoutDead(pending).isEmpty) {
      iter += 1
      val live = withoutDead(pending)
      // W2: ordered head-N per batch
      val w = Window.partitionBy(col("blockBatch")).orderBy(col("blockIndex").asc)
      val chunk = live.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= cfg.maxBlocks)
        .drop("rn")

      val results: CollectionAccumulator[(String, Int, Boolean)] =
        spark.sparkContext.collectionAccumulator[(String, Int, Boolean)]("drainResults")
      val c = cfg

      // ST4/W4: single ordered writer partition (coalesce(1) makes a
      // global sort redundant — sortWithinPartitions IS the total order)
      chunk.coalesce(1)
        .sortWithinPartitions(col("blockBatch"), col("blockIndex"))
        .select(struct(
          col("blockBatch"), col("blockIndex"), col("bucket"), col("key"),
          col("blockType"), col("title"), col("language"), col("caption"))
          .as("_1"), col("parentUrl").as("_2"))
        .as[(NotionBlock, String)]
        .foreachPartition { (it: Iterator[(NotionBlock, String)]) =>
          var lastCall = 0L
          val failedBatches = scala.collection.mutable.Set.empty[String]
          // rows arrive sorted by batch: get-or-create once per PAGE,
          // not once per block (and the real API call stays throttled
          // by the K5 interval below, reference-faithful)
          var cachedBatch: String = null
          var cachedPageUrl: String = null
          it.foreach { case (b, parentUrl) =>
            if (failedBatches.contains(b.blockBatch)) {
              // ST6 fail-fast: skip the rest of a failed page
            } else {
              val ok =
                try {
                  val pageUrl =
                    if (b.blockBatch == cachedBatch) cachedPageUrl
                    else {
                      val u = api.getOrCreatePage(b.blockBatch, b.key, parentUrl)
                      cachedBatch = b.blockBatch; cachedPageUrl = u; u
                    }
                  // K5 rate limit
                  if (c.minIntervalMs > 0) {
                    val since = (System.nanoTime() - lastCall) / 1000000L
                    if (lastCall != 0L && since < c.minIntervalMs)
                      Thread.sleep(c.minIntervalMs - since)
                  }
                  // ST8 retry with backoff
                  var attempt = 0
                  var success = false
                  var lastErr: Throwable = null
                  while (!success && attempt <= c.httpRetries) {
                    try {
                      api.uploadBlock(pageUrl, b)
                      success = true
                    } catch {
                      case e: NotionApiError
                          if NotionApiError.retryableStatuses(e.status) &&
                            attempt < c.httpRetries =>
                        lastErr = e
                        Thread.sleep(c.backoffBaseMs * (1L << attempt))
                        attempt += 1
                      case e: Throwable =>
                        lastErr = e
                        attempt = c.httpRetries + 1
                    }
                  }
                  lastCall = System.nanoTime()
                  if (!success && lastErr != null)
                    Drain.logWarning(s"drain: giving up on block " +
                      s"(${b.blockBatch}, ${b.blockIndex}) after " +
                      s"$attempt attempt(s)", lastErr)
                  success
                } catch {
                  case t: Throwable =>
                    Drain.logWarning(s"drain: page setup failed for " +
                      s"(${b.blockBatch}, ${b.blockIndex})", t)
                    false
                }
              if (!ok) failedBatches += b.blockBatch
              results.add((b.blockBatch, b.blockIndex, ok))
            }
          }
        }

      import scala.jdk.CollectionConverters._
      val res = resolveOutcomes(results.value.asScala.toSeq)
      val okRows = res.filter(_._3).map(r => (r._1, r._2))
      val failedBatchesNow = res.filter(!_._3).map(_._1).distinct
      uploadedTotal += okRows.size

      val deadDelta = failedBatchesNow.filter { b =>
        val a = attempts.getOrElse(b, 0) + 1
        attempts(b) = a
        a >= cfg.maxAttempts  // K8 DLQ
      }
      if (deadDelta.nonEmpty) {
        deadDf = deadDf.union(deadDelta.toDF("blockBatch"))
        deadNonEmpty = true
        deadDelta.foreach(attempts.remove) // dead batches never retry
      }
      // a batch whose touch this iteration was all-success is progressing:
      // reset its counter so `attempts` holds only batches whose LAST
      // touch failed (K8 counts consecutive failed deliveries)
      okRows.map(_._1).distinct.diff(failedBatchesNow)
        .foreach(attempts.remove)
      peakRetry = math.max(peakRetry, attempts.size)

      // K6: delete uploaded rows (anti join on the composite key)
      if (okRows.nonEmpty) {
        val uploadedDf = okRows.toDF("blockBatch", "blockIndex")
        var newPending = pending
          .join(uploadedDf, Seq("blockBatch", "blockIndex"), "left_anti")
        // truncate the growing anti-join lineage periodically, else a
        // long drain recomputes the whole chain each iteration
        if (iter % 8 == 0) newPending = newPending.localCheckpoint()
        val cached = newPending.cache()
        pending.unpersist()
        pending = cached
      }
      // batches fully drained and not failed -> SUCCESS. Derived
      // distributively: anti-join this iteration's touched batches
      // (driver-held, bounded by the chunk) against the pending set and
      // the DLQ — the drained DELTA is unioned into the done DataFrame
      // without ever collecting an id to the driver.
      val seen = res.map(_._1).distinct
      if (seen.nonEmpty) {
        val drained = seen.toDF("blockBatch")
          .join(pending.select("blockBatch").distinct(),
            Seq("blockBatch"), "left_anti")
        val drainedLive =
          if (deadNonEmpty)
            drained.join(deadDf, Seq("blockBatch"), "left_anti")
          else drained
        // materialize the chunk-bounded delta NOW: its plan references
        // THIS iteration's pending snapshot, whose cache is unpersisted
        // next iteration — a lazy union would recompute the whole
        // anti-join chain from the last checkpoint when it finally runs
        doneDf = doneDf.union(drainedLive.localCheckpoint())
        doneNonEmpty = true
      }
      // flatten the growing union tree periodically (cheap — every
      // branch is an in-memory checkpointed delta)
      if (iter % 8 == 0) {
        doneDf = doneDf.localCheckpoint()
        if (deadNonEmpty) deadDf = deadDf.localCheckpoint()
      }
      // nothing progressed (e.g. all pending batches dead) — stop
      stalled = okRows.isEmpty && failedBatchesNow.isEmpty
    }

    // pages still pending at loop exit (the iteration cap, or a stall)
    // must not vanish from the outputs: dead-letter them loudly so the
    // status lifecycle receives a terminal state
    val leftoverDf = {
      val base = withoutDead(pending).select("blockBatch").distinct()
      if (doneNonEmpty) base.join(doneDf, Seq("blockBatch"), "left_anti")
      else base
    }
    val leftoverCount = leftoverDf.count()
    if (leftoverCount > 0) {
      logWarning(s"drain: $leftoverCount page(s) still pending at " +
        s"loop exit after $iter iteration(s) — dead-lettering")
      deadDf = deadDf.union(leftoverDf)
      deadNonEmpty = true
    }
    doneDf = doneDf.distinct().localCheckpoint()
    deadDf = deadDf.distinct().localCheckpoint()

    val now = System.currentTimeMillis()
    val finalPages = doneDf
      .select(col("blockBatch"), lit(PageStatus.Success).as("status"))
      .union(deadDf
        .select(col("blockBatch"), lit(PageStatus.Fail).as("status")))
      .withColumn("statusTime", lit(now))
    val failures = deadDf.withColumn("eventTime", lit(now))
    // Report id lists: sorted, CAPPED — the DataFrames above are the
    // authoritative full sets
    val doneCount = doneDf.count()
    val deadCount = deadDf.count()
    val doneSample = doneDf.orderBy("blockBatch").limit(ReportPageCap)
      .as[String].collect().toSeq
    val deadSample = deadDf.orderBy("blockBatch").limit(ReportPageCap)
      .as[String].collect().toSeq
    pending.unpersist()
    (finalPages, failures,
      Report(iter, uploadedTotal, doneSample, deadSample,
        doneCount, deadCount, peakRetry))
  }
}
