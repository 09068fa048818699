package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The streaming form of the [[graft.scale.CitationIndex]] maintenance
  * loop — the graph family's input kept current AS documents arrive,
  * in the [[IncrementalNearDup]] foreachBatch shape: every micro-batch
  * appends into the persisted citation index (O(batch) postings,
  * band-transition classification, dead-term accrual), so any graph
  * query ([[graft.scale.Graph.pageRankDirectedResumeQ]] included —
  * warm ranks + fresh edges compose into the fully-incremental graph
  * pipeline) reads edges that are exactly the from-scratch derivation
  * over everything streamed. The symmetric TAKE-DOWN loop streams
  * (doc_id, text) removal requests through
  * [[graft.scale.CitationIndex.delete]] — O(batch) tombstoning with
  * exact band revival from the purgatory tier, so a takedown/
  * right-to-be-forgotten feed maintains the same delete≡rebuild
  * equality the batch spec pins.
  *
  * Delivery contract: both loops are exactly-once-EFFECTIVE under
  * epoch replay — append anti-joins the committed-doc table, delete
  * anti-joins the tombstone table (committed LAST), both heal their
  * own torn prefixes via deterministic recompute + keyed-delta
  * anti-joins, and never double-insert postings or double-count df.
  * Batch ≡ stream is therefore EXACT (the CitationIndexSpec /
  * CitationDeleteSpec equality pins carry over verbatim), not
  * approximate.
  *
  * SINGLE WRITER: [[graft.scale.CitationIndex]] is a single-writer
  * layout — do NOT run the ingest and take-down loops concurrently
  * against one index dir (a delete epoch recounting df mid-append
  * would classify against a half-written batch, and vice versa).
  * Route both feeds through one serialized maintenance schedule:
  * either one foreachBatch stream whose body applies the epoch's
  * removals after its appends, or alternating, never-overlapping
  * runs of the two loops. */
object IncrementalCitations {

  /** The foreachBatch body, usable directly in batch replays/tests. */
  def appendBatch(indexDir: String)(batch: DataFrame, epochId: Long): Unit =
    graft.scale.CitationIndex.append(batch, indexDir)

  /** The take-down foreachBatch body. */
  def deleteBatch(indexDir: String)(batch: DataFrame, epochId: Long): Unit =
    graft.scale.CitationIndex.delete(batch, indexDir)

  /** Run the loop over a streaming `docs` source (doc_id, text).
    * `indexDir` must hold a built [[graft.scale.CitationIndex]] (build
    * over an empty frame for a cold start). */
  def run(docs: DataFrame, indexDir: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch(appendBatch(indexDir) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** [[appendBatch]] with the compaction discipline OPERATED
    * (round-15 verdict item 4): every `compactEvery`-th epoch consult
    * [[graft.scale.CitationIndex.needsCompaction]] and fold in place
    * behind the crash-safe retire-rename-vacuum swap
    * ([[graft.scale.Maintenance]]). The fold vacuums as-of history —
    * and it is PIN-AWARE: a [[graft.scale.SnapshotManifest.register]]ed
    * pin blocks it (the probe retries next period) unless `feedDir`
    * is given, in which case the change feed is emitted through the
    * pinned history FIRST and the fold proceeds (the feed-restore
    * contract bridges the vacuum — [[graft.scale.Maintenance
    * .maybeCompact]]). */
  def appendBatchMaintained(indexDir: String, compactEvery: Long = 8L,
      feedDir: Option[String] = None)(
      batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    graft.scale.Maintenance.healSwap(spark, indexDir)
    appendBatch(indexDir)(batch, epochId)
    graft.scale.Maintenance.maybeCompact(spark, indexDir, epochId,
      compactEvery,
      graft.scale.CitationIndex.needsCompaction(spark, indexDir),
      graft.scale.CitationIndex.compactTo(spark, _, _),
      emitFeedFirst = feedDir.map(fd =>
        () => graft.scale.CitationIndex.emitChangeFeed(spark, indexDir,
          fd)))
  }

  /** [[run]] with the maintained body (compactEvery > 0). */
  def runMaintained(docs: DataFrame, indexDir: String,
      checkpoint: String, compactEvery: Long = 8L): StreamingQuery =
    docs.writeStream
      .foreachBatch(appendBatchMaintained(indexDir, compactEvery) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** Run the take-down loop over a streaming removal feed (doc_id,
    * text — the text re-derives victim postings, deep hits included).
    * The index's own guard applies per micro-batch: a batch that
    * would revive a deep term fails the epoch loudly rather than
    * corrupting the edge set. */
  def runDeletes(removals: DataFrame, indexDir: String,
      checkpoint: String): StreamingQuery =
    removals.writeStream
      .foreachBatch(deleteBatch(indexDir) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** The REVISION loop — q160's upsert verb as a running pipeline:
    * each micro-batch carries re-fetched documents as (doc_id, text,
    * prev_text) and the index takes every band transition the content
    * change implies, in place. The foreachBatch epoch id (+1, to stay
    * positive) is the monotone revision number, so a replayed epoch
    * is a pure heal via upsert's (doc, rev) registry anti-joins —
    * exactly the [[IncrementalNearDup.runRevisions]] contract. The
    * single-writer rule above applies across all three loops. */
  def upsertBatch(indexDir: String)(batch: DataFrame, epochId: Long): Unit =
    graft.scale.CitationIndex.upsert(batch, indexDir, rev = epochId + 1L)

  def runRevisions(docs: DataFrame, indexDir: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch(upsertBatch(indexDir) _)
      .option("checkpointLocation", checkpoint)
      .start()
}
