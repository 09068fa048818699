package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The streaming form of the [[graft.scale.IvfIndex]] vector-index
  * maintenance — the ANN member of the foreachBatch family, and the
  * last serving layout without a streaming twin: every micro-batch of
  * arriving (vec_id, embedding) rows assigns under the FROZEN
  * centroids (the append contract — re-clustering is [[maintain]]'s
  * deliberate corpus-wide event) and lands inside the live
  * `cluster_id=N/` dirs, so the at-rest index continuously serves
  * partition-pruned ANN probes — historical epochs included
  * ([[graft.scale.IvfIndex.topKAsOf]]) — while the stream runs.
  *
  * Delivery contract: exactly-once at the index level through
  * [[graft.scale.IvfIndex.appendIdempotent]] (the plain append is
  * deliberately non-deduping, so the twin routes through the
  * replay-safe variant: landed rows are anti-joined inside the
  * batch's own assigned clusters — a partition-pruned probe — and the
  * id→epoch registry never re-stamps). Revisions and take-downs
  * follow the family rules (epoch-driven monotone rev; tombstone
  * anti-joins). Single-writer per dir. */
object IncrementalVectors extends org.apache.spark.internal.Logging {

  /** The ingest foreachBatch body, usable directly in batch replays. */
  def appendBatch(indexDir: String, centroids: DataFrame,
      centroidCount: Option[Long] = None)(
      batch: DataFrame, epochId: Long): Unit =
    graft.scale.IvfIndex.appendIdempotent(batch, centroids, indexDir,
      centroidCount)

  /** [[appendBatch]] with MAINTENANCE operated: every `every`-th epoch
    * consult the geometry probe ([[graft.scale.IvfIndex
    * .needsCompaction]]) and fold with [[graft.scale.IvfIndex
    * .rebuild]] under the SAME centroids — a same-quantizer rebuild
    * re-homes nothing (assignment is deterministic), folds revisions
    * and tombstones physically, and restores one-file-per-cluster
    * geometry; it carries its own crash-safe build-retire-publish
    * swap and heals its own windows, so no extra machinery is needed.
    * Re-CLUSTERING (new centroids, [[graft.scale.IvfIndex
    * .driftRatio]]-triggered) stays a deliberate operator event — the
    * probes' centroids argument must change with it.
    *
    * `feedDir` is the pin ESCAPE HATCH every other maintained twin
    * carries (round-17 advisor): with live pins and no feedDir the
    * rebuild is skipped (a long-lived pin blocks compaction until
    * released); with a feedDir the twin emits
    * [[graft.scale.IvfIndex.emitChangeFeed]] FIRST so the pinned
    * history's deltas survive the vacuum, then folds — the documented
    * feed-restore contract bridges the pinned run. */
  def appendBatchMaintained(indexDir: String, centroids: DataFrame,
      centroidCount: Option[Long] = None, compactEvery: Long = 8L,
      feedDir: Option[String] = None)(
      batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    appendBatch(indexDir, centroids, centroidCount)(batch, epochId)
    if (compactEvery > 0L && epochId % compactEvery == compactEvery - 1L &&
        graft.scale.IvfIndex.needsCompaction(spark, indexDir)) {
      // pin gate ([[graft.scale.Maintenance.maybeCompact]]'s contract,
      // applied to the rebuild fold this twin uses instead of
      // compactInPlace): a registered SnapshotManifest pin is a live
      // run still reading this index's history — never vacuum under it
      val pins = graft.scale.Maintenance.pinnedEpochs(spark, indexDir)
      if (pins.isEmpty)
        // re-check at the last instant before the swap: a pin
        // registered while the rebuild BUILDS (a multi-second window)
        // must not be silently consumed — the same abortIf contract
        // Maintenance.maybeCompact carries (round-17 advisor, applied
        // to this twin's rebuild fold too)
        graft.scale.IvfIndex.rebuild(spark, indexDir, centroids,
          centroidCount, abortIf = () => {
            val late = graft.scale.Maintenance.pinnedEpochs(spark, indexDir)
            if (late.isEmpty) None
            else Some(s"pins ${late.map { case (r, e) => s"$r@e=$e" }
              .mkString(", ")} registered during the rebuild build")
          })
      else feedDir match {
        case Some(fd) =>
          graft.scale.IvfIndex.emitChangeFeed(spark, indexDir, fd)
          graft.scale.IvfIndex.rebuild(spark, indexDir, centroids,
            centroidCount)
        case None =>
          logWarning(s"incremental-vectors: skipping rebuild at $indexDir" +
            s" — live manifest pins ${pins.map { case (r, e) => s"$r@e=$e" }
              .mkString(", ")} still read its history (release the pins " +
            "or pass feedDir to bridge via the change feed)")
      }
    }
  }

  /** Run the ingest loop over a streaming (vec_id, embedding) source.
    * `indexDir` must hold a built [[graft.scale.IvfIndex]] under
    * `centroids`. `compactEvery` > 0 runs the maintained body. */
  def run(rows: DataFrame, indexDir: String, centroids: DataFrame,
      checkpoint: String, centroidCount: Option[Long] = None,
      compactEvery: Long = 0L,
      feedDir: Option[String] = None): StreamingQuery =
    rows.writeStream
      .foreachBatch(
        if (compactEvery > 0L)
          appendBatchMaintained(indexDir, centroids, centroidCount,
            compactEvery, feedDir) _
        else appendBatch(indexDir, centroids, centroidCount) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** The REVISION loop — [[graft.scale.IvfIndex.upsert]] per
    * micro-batch of re-embedded rows (cluster migration allowed —
    * that is the point); epoch id + 1 is the monotone revision, so a
    * replayed epoch heals via the (vec, rev) anti-joins. */
  def runRevisions(rows: DataFrame, indexDir: String,
      centroids: DataFrame, checkpoint: String,
      centroidCount: Option[Long] = None): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.scale.IvfIndex.upsert(batch, centroids, indexDir,
          rev = epochId + 1L, centroidCount)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** The take-down loop — [[graft.scale.IvfIndex.delete]] per
    * micro-batch of victim vec ids; probes exclude them immediately,
    * physical rows wait for the next rebuild's fold. Replays are
    * idempotent (the tombstone anti-join). */
  def runDeletes(removals: DataFrame, indexDir: String,
      checkpoint: String): StreamingQuery =
    removals.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.scale.IvfIndex.delete(batch, indexDir)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  // ---- the COMPRESSED layout's loops ([[graft.scale.IvfPqIndex]]):
  // identical family contracts under BOTH frozen artifacts (coarse
  // centroids + stored codebooks — the encode reads the codebooks
  // back from the index, so a caller cannot even supply wrong ones).
  // The seventh and last maintained serving layout to stream. ----

  /** PQ ingest body — replay-safe via
    * [[graft.scale.IvfPqIndex.appendIdempotent]]. */
  def pqAppendBatch(indexDir: String, centroids: DataFrame,
      centroidCount: Option[Long] = None)(
      batch: DataFrame, epochId: Long): Unit =
    graft.scale.IvfPqIndex.appendIdempotent(batch, centroids, indexDir,
      centroidCount)

  /** [[pqAppendBatch]] with MAINTENANCE operated — the compressed
    * layout's fold is the round-18 [[graft.scale.IvfPqIndex
    * .compactTo]] (a CODE-LEVEL fold: no raw vectors, no re-encode),
    * run through [[graft.scale.Maintenance.maybeCompact]] like every
    * other maintained twin: every `every`-th epoch consult the
    * geometry probe and fold in place, pin-aware (a live
    * [[graft.scale.SnapshotManifest]] pin blocks the fold, or
    * `feedDir` emits [[graft.scale.IvfPqIndex.emitChangeFeed]] first
    * and the fold proceeds — the feed-restore bridge). The fold
    * carries compactInPlace's last-instant pin re-check, so a pin
    * registered during the fold build aborts the swap. */
  def pqAppendBatchMaintained(indexDir: String, centroids: DataFrame,
      centroidCount: Option[Long] = None, compactEvery: Long = 8L,
      feedDir: Option[String] = None)(
      batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    graft.scale.Maintenance.healSwap(spark, indexDir)
    pqAppendBatch(indexDir, centroids, centroidCount)(batch, epochId)
    graft.scale.Maintenance.maybeCompact(spark, indexDir, epochId,
      compactEvery,
      graft.scale.IvfPqIndex.needsCompaction(spark, indexDir),
      graft.scale.IvfPqIndex.compactTo(spark, _, _),
      emitFeedFirst = feedDir.map(fd =>
        () => graft.scale.IvfPqIndex.emitChangeFeed(spark, indexDir, fd)))
  }

  /** Run the PQ ingest loop over a streaming (vec_id, embedding)
    * source; `indexDir` must hold a built [[graft.scale.IvfPqIndex]]
    * under `centroids`. `compactEvery` > 0 runs the maintained body. */
  def runPq(rows: DataFrame, indexDir: String, centroids: DataFrame,
      checkpoint: String,
      centroidCount: Option[Long] = None,
      compactEvery: Long = 0L,
      feedDir: Option[String] = None): StreamingQuery =
    rows.writeStream
      .foreachBatch(
        if (compactEvery > 0L)
          pqAppendBatchMaintained(indexDir, centroids, centroidCount,
            compactEvery, feedDir) _
        else pqAppendBatch(indexDir, centroids, centroidCount) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** PQ revision loop — [[graft.scale.IvfPqIndex.upsert]], epoch-driven
    * monotone rev. */
  def runPqRevisions(rows: DataFrame, indexDir: String,
      centroids: DataFrame, checkpoint: String,
      centroidCount: Option[Long] = None): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.scale.IvfPqIndex.upsert(batch, centroids, indexDir,
          rev = epochId + 1L, centroidCount)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** PQ take-down loop — [[graft.scale.IvfPqIndex.delete]]. */
  def runPqDeletes(removals: DataFrame, indexDir: String,
      checkpoint: String): StreamingQuery =
    removals.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.scale.IvfPqIndex.delete(batch, indexDir)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
