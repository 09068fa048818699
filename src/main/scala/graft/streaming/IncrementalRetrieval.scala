package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The streaming form of the [[graft.scale.BmIndex]] retrieval-index
  * maintenance — the BM25 member of the
  * [[IncrementalNearDup]]/[[IncrementalCitations]] foreachBatch
  * family: every micro-batch of arriving documents appends into the
  * live term-bucket dirs (O(batch) postings + a one-row stats
  * update), so the at-rest index continuously serves probe-pruned
  * BM25 top-k — historical epochs included ([[graft.scale.BmIndex
  * .topKAsOf]]) — while the stream runs.
  *
  * Delivery contract: exactly-once at the INDEX level through
  * [[graft.scale.BmIndex.appendIdempotent]] — the plain append's
  * anti-join targets `_bm_docs`, the FIRST write of its protocol, so
  * a replay of a crash that died between the id write and the
  * postings/stats/ledger writes would see the whole batch as
  * committed and silently lose its postings and stats delta; the
  * replay-healing variant anti-joins the id write against the full
  * registry but the postings write against the docs landed inside
  * the batch's own term buckets, re-bases stats off the last ledger
  * row, and commits the residue's original epoch — so every torn
  * window heals on the replay (BmHealSpec stages all three).
  * Revision and take-down loops follow [[IncrementalNearDup]]'s
  * rules: the micro-batch epoch drives the monotone revision stamp,
  * and every verb's (id, rev)/(id) anti-joins turn replays into pure
  * heals. Single-writer per dir, as everywhere in the family. */
object IncrementalRetrieval {

  /** The ingest foreachBatch body, usable directly in batch replays. */
  def appendBatch(indexDir: String)(batch: DataFrame,
      epochId: Long): Unit =
    graft.scale.BmIndex.appendIdempotent(batch, indexDir)

  /** [[appendBatch]] with the compaction discipline OPERATED: every
    * `compactEvery`-th epoch consult
    * [[graft.scale.BmIndex.needsCompaction]] and fold in place behind
    * the crash-safe retire-rename-vacuum swap
    * ([[graft.scale.Maintenance]]). The fold vacuums as-of history —
    * and it is PIN-AWARE: a [[graft.scale.SnapshotManifest.register]]ed
    * pin blocks it (the probe retries next period), unless `feedDir`
    * is given, in which case the change feed is emitted through the
    * pinned history FIRST and the fold proceeds — the feed-restore
    * contract bridges the vacuum (MaintenancePinSpec pins both). */
  def appendBatchMaintained(indexDir: String, compactEvery: Long = 8L,
      feedDir: Option[String] = None)(
      batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    graft.scale.Maintenance.healSwap(spark, indexDir)
    appendBatch(indexDir)(batch, epochId)
    graft.scale.Maintenance.maybeCompact(spark, indexDir, epochId,
      compactEvery,
      graft.scale.BmIndex.needsCompaction(spark, indexDir),
      graft.scale.BmIndex.compactTo(spark, _, _),
      emitFeedFirst = feedDir.map(fd =>
        () => graft.scale.BmIndex.emitChangeFeed(spark, indexDir, fd)))
  }

  /** Run the ingest loop over a streaming (doc_id, text) source.
    * `indexDir` must hold a built [[graft.scale.BmIndex]] (build over
    * an empty frame for a cold start). `compactEvery` > 0 runs the
    * maintained body. */
  def run(docs: DataFrame, indexDir: String, checkpoint: String,
      compactEvery: Long = 0L): StreamingQuery =
    docs.writeStream
      .foreachBatch(
        if (compactEvery > 0L)
          appendBatchMaintained(indexDir, compactEvery) _
        else appendBatch(indexDir) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** The REVISION loop — [[graft.scale.BmIndex.upsert]] per
    * micro-batch of re-fetched (doc_id, text) rows; epoch id + 1 is
    * the monotone revision ([[IncrementalNearDup.runRevisions]]'s
    * rule), so a replayed epoch heals via the (doc, rev) anti-joins.
    * Uncommitted or tombstoned ids are ignored by upsert's contract —
    * route genuinely-new docs through [[run]]. */
  def runRevisions(docs: DataFrame, indexDir: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.scale.BmIndex.upsert(batch, indexDir, rev = epochId + 1L)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** The take-down loop — [[graft.scale.BmIndex.delete]] per
    * micro-batch of victim doc ids; scores shift immediately
    * (n_docs/avgdl net of tombstones), physical rows wait for the
    * compaction fold. Replays are idempotent (the tombstone
    * anti-join). */
  def runDeletes(removals: DataFrame, indexDir: String,
      checkpoint: String): StreamingQuery =
    removals.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.scale.BmIndex.delete(batch, indexDir)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
