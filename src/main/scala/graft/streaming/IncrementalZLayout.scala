package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery

/** The streaming form of the [[graft.scale.Layout]] z-order ingest —
  * the seventh serving layout's twin in the
  * [[IncrementalNearDup]]/[[IncrementalClusters]] foreachBatch family:
  * every micro-batch of arriving rows routes into the live z-bucket
  * directories ([[graft.scale.Layout.appendZOrderedIdempotent]]), so
  * the at-rest layout continuously serves pruned box reads over
  * everything ingested so far while the stream runs.
  *
  * Delivery contract: exactly-once at the LAYOUT level — the append is
  * idempotent under epoch replay (the batch's ids are anti-joined
  * against the rows already landed in the touched buckets, a
  * partition-pruned probe), so a crash anywhere inside an epoch
  * re-appends only what didn't commit and a fully-landed replay is a
  * no-op. Per-epoch cost is O(batch) + O(touched buckets) read —
  * nothing layout-proportional, the property that lets the loop run
  * per crawl slice indefinitely.
  *
  * Maintenance stays a single-operator concern: after enough appends
  * decay the file geometry, pause-or-drain and fold with
  * [[graft.scale.Layout.compactZOrderedTo]] (box-read identity and
  * one-file-per-bucket geometry are ZOrderSpec/q152-pinned).
  */
object IncrementalZLayout {

  /** The foreachBatch body, usable directly in batch replays/tests. */
  def appendBatch(dir: String, idCol: String, x: Column, y: Column,
      bucketWidth: Long = 4096L, bits: Int = 8)(
      batch: DataFrame, epochId: Long): Unit =
    graft.scale.Layout.appendZOrderedIdempotent(
      batch, idCol, x, y, dir, bucketWidth, bits)

  /** [[appendBatch]] with the compaction discipline OPERATED
    * (round-15 verdict item 4): every `compactEvery`-th epoch consult
    * [[graft.scale.Layout.needsCompaction]] and fold in place with
    * the revision-folding copy-compaction behind the crash-safe
    * retire-rename-vacuum swap. The fold vacuums as-of history —
    * and it is PIN-AWARE: a [[graft.scale.SnapshotManifest.register]]ed
    * pin blocks it (the probe retries next period) unless `feedDir`
    * is given, in which case the change feed is emitted through the
    * pinned history FIRST and the fold proceeds (the feed-restore
    * contract bridges the vacuum — [[graft.scale.Maintenance
    * .maybeCompact]]). */
  def appendBatchMaintained(dir: String, idCol: String, x: Column,
      y: Column, bucketWidth: Long = 4096L, bits: Int = 8,
      compactEvery: Long = 8L, feedDir: Option[String] = None)(
      batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    graft.scale.Maintenance.healSwap(spark, dir)
    appendBatch(dir, idCol, x, y, bucketWidth, bits)(batch, epochId)
    graft.scale.Maintenance.maybeCompact(spark, dir, epochId,
      compactEvery, graft.scale.Layout.needsCompaction(spark, dir),
      graft.scale.Layout.compactZOrderedTo(spark, _, _,
        foldRevisionsBy = Some(idCol)),
      emitFeedFirst = feedDir.map(fd =>
        () => graft.scale.Layout.emitChangeFeed(spark, dir, idCol, fd)))
  }

  /** Run the ingest over a streaming source; `x`/`y` are the two
    * cluster dimensions (already bucketized to the layout's bit
    * range). `compactEvery` > 0 runs the maintained body. */
  def run(rows: DataFrame, dir: String, idCol: String, x: Column,
      y: Column, checkpoint: String, bucketWidth: Long = 4096L,
      bits: Int = 8, compactEvery: Long = 0L): StreamingQuery =
    rows.writeStream
      .foreachBatch(
        if (compactEvery > 0L)
          appendBatchMaintained(dir, idCol, x, y, bucketWidth, bits,
            compactEvery) _
        else appendBatch(dir, idCol, x, y, bucketWidth, bits) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** The REVISION foreachBatch body — the route for a known id whose
    * coordinates MOVED (the append path is replay-idempotent, not
    * key-idempotent: a moved key through append would double-serve;
    * see [[graft.scale.Layout.appendZOrderedIdempotent]]). The
    * micro-batch epoch drives the monotone revision stamp
    * ([[IncrementalNearDup]]'s rule), so a replayed epoch heals via
    * the (id, rev) anti-joins and a later epoch always outranks an
    * earlier generation. */
  def upsertBatch(dir: String, idCol: String, x: Column, y: Column,
      bucketWidth: Long = 4096L, bits: Int = 8)(
      batch: DataFrame, epochId: Long): Unit =
    graft.scale.Layout.upsertZOrdered(batch, idCol, x, y, dir,
      rev = epochId + 1L, bucketWidth, bits)

  /** Run the revision loop over a streaming re-crawl feed. */
  def runRevisions(rows: DataFrame, dir: String, idCol: String,
      x: Column, y: Column, checkpoint: String,
      bucketWidth: Long = 4096L, bits: Int = 8): StreamingQuery =
    rows.writeStream
      .foreachBatch(upsertBatch(dir, idCol, x, y, bucketWidth, bits) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** The take-down foreachBatch body
    * ([[graft.scale.Layout.deleteZOrdered]]): victim ids tombstone in
    * `_z_tombs`, `readCurrent` drops every generation immediately, the
    * next revision-folding compaction folds them physically. Replay
    * safety is the tombstone anti-join — a committed batch re-lands
    * nothing. Single-writer rule as everywhere in this family: never
    * run ingest and take-down loops concurrently against one dir. */
  def deleteBatch(dir: String, idCol: String)(
      batch: DataFrame, epochId: Long): Unit =
    graft.scale.Layout.deleteZOrdered(batch, idCol, dir)

  /** Run the take-down loop over a streaming removal feed (idCol). */
  def runDeletes(removals: DataFrame, dir: String, idCol: String,
      checkpoint: String): StreamingQuery =
    removals.writeStream
      .foreachBatch(deleteBatch(dir, idCol) _)
      .option("checkpointLocation", checkpoint)
      .start()
}
