package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming dedup-cluster maintenance: the
  * [[graft.scale.ClusterStore]] append/delete loops as Structured
  * Streaming foreachBatch sinks. Each micro-batch of (doc_id,
  * chunk_hash) rows commits one store epoch; the store's epoch-dir
  * protocol makes foreachBatch's at-least-once delivery EXACTLY-ONCE
  * at the state level — a replayed micro-batch either recomputes and
  * overwrites its own torn epoch dirs or, once committed, anti-joins
  * away entirely. Batch ≡ stream is therefore exact; the
  * ClusterStoreSpec equality pins carry over verbatim.
  *
  * SINGLE WRITER: [[graft.scale.ClusterStore]] is a single-writer
  * layout — do NOT run the ingest and take-down loops concurrently
  * against one store dir (both compute their epoch from the same meta
  * pointer; interleaved commits would collide on an epoch number).
  * Route both feeds through one serialized maintenance schedule:
  * either one foreachBatch stream whose body applies the epoch's
  * removals after its appends, or alternating, never-overlapping runs
  * of the two loops. */
object IncrementalClusters {

  /** The ingest foreachBatch body, usable directly in batch replays. */
  def appendBatch(storeDir: String)(batch: DataFrame, epochId: Long): Unit =
    graft.scale.ClusterStore.append(batch, storeDir)

  /** The take-down foreachBatch body. */
  def deleteBatch(storeDir: String)(batch: DataFrame, epochId: Long): Unit =
    graft.scale.ClusterStore.delete(batch, storeDir)

  /** Run the ingest loop over a streaming (doc_id, chunk_hash) source
    * — typically the q104 chunker applied to a document stream.
    * `storeDir` must hold a built [[graft.scale.ClusterStore]] (build
    * over an empty frame for a cold start). */
  def run(chunks: DataFrame, storeDir: String,
      checkpoint: String): StreamingQuery =
    chunks.writeStream
      .foreachBatch(appendBatch(storeDir) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** [[appendBatch]] with the compaction discipline OPERATED
    * (round-15 verdict item 4): every `compactEvery`-th epoch consult
    * [[graft.scale.ClusterStore.needsCompaction]] and fold in place
    * behind the crash-safe retire-rename-vacuum swap
    * ([[graft.scale.Maintenance]]). The fold vacuums as-of history —
    * and it is PIN-AWARE: a [[graft.scale.SnapshotManifest.register]]ed
    * pin blocks it (the probe retries next period) unless `feedDir`
    * is given, in which case the change feed is emitted through the
    * pinned history FIRST and the fold proceeds (the feed-restore
    * contract bridges the vacuum — [[graft.scale.Maintenance
    * .maybeCompact]]). */
  def appendBatchMaintained(storeDir: String, compactEvery: Long = 8L,
      feedDir: Option[String] = None)(
      batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    graft.scale.Maintenance.healSwap(spark, storeDir)
    appendBatch(storeDir)(batch, epochId)
    graft.scale.Maintenance.maybeCompact(spark, storeDir, epochId,
      compactEvery,
      graft.scale.ClusterStore.needsCompaction(spark, storeDir),
      graft.scale.ClusterStore.compactTo(spark, _, _),
      emitFeedFirst = feedDir.map(fd =>
        () => graft.scale.ClusterStore.emitChangeFeed(spark, storeDir,
          fd)))
  }

  /** [[run]] with the maintained body (compactEvery > 0). */
  def runMaintained(chunks: DataFrame, storeDir: String,
      checkpoint: String, compactEvery: Long = 8L): StreamingQuery =
    chunks.writeStream
      .foreachBatch(appendBatchMaintained(storeDir, compactEvery) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** Run the take-down loop over a streaming removal feed (doc_id).
    * Component splits are applied per micro-batch; serving between
    * batches always reflects a committed prefix of the feed. */
  def runDeletes(removals: DataFrame, storeDir: String,
      checkpoint: String): StreamingQuery =
    removals.writeStream
      .foreachBatch(deleteBatch(storeDir) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** The REVISION loop — the q161 upsert verb as a running pipeline:
    * each micro-batch carries re-chunked (doc_id, chunk_hash) rows
    * for re-fetched documents, and the store rewires their components
    * in one epoch (splits via severed chunks, merges via new shared
    * ones). Replay safety needs no epoch bookkeeping here: a
    * committed revision replays as a chunk-set-equality no-op inside
    * [[graft.scale.ClusterStore.upsert]] itself, and a torn epoch
    * recomputes and overwrites its own dirs — the same state-level
    * exactly-once the append loop carries. The single-writer rule
    * above applies across all three loops. */
  def upsertBatch(storeDir: String)(batch: DataFrame, epochId: Long): Unit =
    graft.scale.ClusterStore.upsert(batch, storeDir)

  def runRevisions(chunks: DataFrame, storeDir: String,
      checkpoint: String): StreamingQuery =
    chunks.writeStream
      .foreachBatch(upsertBatch(storeDir) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** CHANGE-DATA-FEED decorator: wrap any of the three batch bodies so
    * every committed store epoch also lands its assignment delta in
    * `feedDir/e=N` (doc_id, old_rep, new_rep, change). Emission is
    * [[graft.scale.ClusterStore.emitChangeFeed]] — DERIVED from the
    * store's epoch dirs, not captured in-flight, so it self-heals: a
    * crash between the store commit and the feed write is repaired by
    * the next batch's call, and a replayed batch (store no-op) emits
    * nothing new. Downstream incremental exporters tail the feed
    * instead of re-diffing snapshots:
    * {{{
    * chunks.writeStream.foreachBatch(
    *   IncrementalClusters.withChangeFeed(store, feed)(
    *     IncrementalClusters.appendBatch(store)))
    * }}} */
  def withChangeFeed(storeDir: String, feedDir: String,
      baseline: Long = 0L)(body: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, epochId) => {
      body(batch, epochId)
      graft.scale.ClusterStore.emitChangeFeed(
        batch.sparkSession, storeDir, feedDir, baseline)
    }
}
