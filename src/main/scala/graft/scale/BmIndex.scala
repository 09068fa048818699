package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized inverted-index layout for [[Bm25]] — the serving form
  * its scaladoc promises: postings bucketed by term on disk so a query
  * probe becomes a PARTITION filter (the same trick as
  * [[IvfIndex]]'s cluster_id dirs and [[Layout]]'s z buckets).
  *
  * Layout under `dir`:
  * {{{
  *   postings/term_bucket=N/…   (doc_id, term, tf, dl) rows, term-sorted
  *   _bm_stats/…                one row: (n_docs, sum_dl)
  *   _bm_tombstones/…           deleted (doc_id, dl) ([[delete]]; probes
  *                              anti-join + stats adjust, [[compactTo]]
  *                              folds)
  * }}}
  *
  * Serving read: the probe terms' bucket ids are driver-computed
  * (control-plane arithmetic over the tiny query-term set — the
  * IvfIndex probe-id precedent), listed as a partition filter, and the
  * surviving postings broadcast-join the term set. Scoring reuses
  * [[Bm25.rank]] verbatim with avgdl derived from the stored stats
  * exactly as Spark's `avg` derives it (long sum / long count in
  * double space), so the indexed path is result-identical to the
  * in-memory path by construction — BmIndexSpec pins equality, the
  * pruned scan, and q102 rides q92's oracle.
  *
  * `append` grows the index O(batch): new docs' postings land inside
  * the existing bucket dirs and the one-row stats table is re-derived
  * as old + batch delta. The new-doc contract is ENFORCED, not hoped:
  * `_bm_docs` records every committed doc_id, and `append` anti-joins
  * the batch against it — re-appending an existing document is a
  * no-op, never a posting double-count (BmIndexSpec pins it). The
  * anti-join scans only the narrow id table; at block-store doc counts
  * the same probe swaps to the sharded GraftKeyIndex bloom without
  * changing the contract.
  *
  * Write protocol (single-writer; no atomic multi-file commit exists
  * over raw parquet dirs): ids first, postings second, stats LAST as
  * the commit point. EVERY torn prefix is then detectable by the
  * cheap [[consistent]] probe (stats.n_docs vs count(_bm_docs)):
  * dying before the postings write leaves recorded-but-absent ids,
  * dying before the stats write leaves stats behind the id table —
  * both mismatch; and served results never silently skew, because
  * committed docs' postings and stats still agree with each other.
  * Recovery from a detected torn append = rebuild (idempotent
  * overwrite), the `_graft_built`-marker staleness discipline.
  */
object BmIndex {

  val Buckets = 64L

  private def bucketed(docs: DataFrame): DataFrame =
    Bm25.postingsOf(docs)
      .withColumn("term_bucket",
        pmod(graft.functions.Md5_64.md5_64(col("term")), lit(Buckets)))

  private def statsDelta(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("sum_dl"))

  private def writePostings(docs: DataFrame, dir: String,
      mode: String): Unit =
    bucketed(docs)
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term"))
      .write.partitionBy("term_bucket").mode(mode)
      .parquet(s"$dir/postings")

  def build(docs: DataFrame, dir: String): Unit = {
    docs.select(col("doc_id")).write.mode("overwrite")
      .parquet(s"$dir/_bm_docs")
    writePostings(docs, dir, "overwrite")
    // Rebuild (idempotent overwrite) is the documented torn-append
    // recovery; a dir that previously saw delete() still holds
    // `_bm_tombstones`, and inheriting it would hide live docs from
    // topK/dedupBatch and skew adjustedStats whenever the rebuilt
    // corpus reuses doc ids (round-14 advice item 2 — the
    // CitationIndex.build delete-era reset pattern). Reset BEFORE the
    // stats commit point.
    docs.sparkSession.range(0)
      .select(col("id").as("doc_id"), col("id").as("dl"))
      .write.mode("overwrite").parquet(s"$dir/_bm_tombstones")
    statsDelta(docs).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/_bm_stats")
  }

  /** O(batch) growth: the batch anti-joins the committed-id table (dup
    * doc_ids are skipped — re-append is a no-op), fresh postings
    * append into existing bucket dirs, and the one-row stats table
    * becomes old + fresh delta (both read to the driver — one row
    * each — so the overwrite never reads what it writes). Write order
    * ids → postings → stats; see the object scaladoc for the torn-
    * append detection this ordering buys. */
  def append(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val old = spark.read.parquet(s"$dir/_bm_stats")
      .select(col("n_docs"), col("sum_dl")).collect()(0)
    val committed = spark.read.parquet(s"$dir/_bm_docs")
    val fresh = docs.join(committed.select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    val delta = statsDelta(fresh).collect()(0)
    if (delta.getLong(0) == 0L) return // every doc_id already committed
    fresh.select(col("doc_id")).write.mode("append")
      .parquet(s"$dir/_bm_docs")
    writePostings(fresh, dir, "append")
    spark.range(1)
      .select(lit(old.getLong(0) + delta.getLong(0)).as("n_docs"),
        lit(old.getLong(1) + delta.getLong(1)).as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_bm_stats")
  }

  /** Tombstone table (doc_id, dl) — absent until the first [[delete]];
    * reads as empty when missing so pre-tombstone indexes work
    * unchanged. `dl` is captured at delete time (one postings scan per
    * delete batch — index-sized, and deletes are the rare op) so probe-
    * time stats adjustment is a one-row aggregate, never a scan. */
  private[scale] def tombstones(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_bm_tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(p.toString)
    else spark.range(0).select(col("id").as("doc_id"),
      col("id").as("dl"))
  }

  /** Tombstone delete: the doc's postings stay on disk until
    * [[compactTo]], but [[topK]] excludes it NOW and re-derives the
    * BM25 stats (n_docs, avgdl) net of tombstones, so `delete(X)` then
    * probe is SCORE-identical to an index built without X (BmIndexSpec
    * pins the equivalence — IDF and avgdl both shift when a document
    * leaves the corpus, and a probe-side anti-join alone would get the
    * ranks right but the scores wrong). Only committed, not-yet-dead
    * ids are recorded: unknown-id deletes are no-ops, replays are
    * idempotent. A doc with no postings (empty text) carries dl=0 —
    * it only ever contributed n_docs to the stats. */
  def delete(docIds: DataFrame, dir: String): Unit = {
    val spark = docIds.sparkSession
    val committed = spark.read.parquet(s"$dir/_bm_docs")
    val fresh = docIds.select(col("doc_id")).distinct()
      .join(committed.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .join(tombstones(spark, dir).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    // dl per doc from its postings (every posting row carries the
    // doc's length); docs with no postings fall back to 0
    val dls = spark.read.parquet(s"$dir/postings")
      .groupBy(col("doc_id")).agg(max(col("dl")).as("pdl"))
    val dead = fresh
      .join(dls, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pdl"), lit(0L)).cast("long").as("dl"))
      .localCheckpoint()
    if (dead.count() > 0L)
      dead.write.mode("append").parquet(s"$dir/_bm_tombstones")
  }

  /** Fold-compaction into a fresh directory (the [[LshIndex.compactTo]]
    * crash-safety shape: `destDir` is torn-detectable until its stats
    * land; the source stays untouched): tombstoned docs' rows are
    * physically dropped from ids and postings, stats are re-derived
    * net of tombstones, and the destination starts tombstone-free.
    * Also consolidates file geometry (one file per term bucket). */
  def compactTo(spark: SparkSession, dir: String, destDir: String): Unit = {
    val dead = tombstones(spark, dir).select(col("doc_id")).localCheckpoint()
    val docs = spark.read.parquet(s"$dir/_bm_docs")
      .join(dead, Seq("doc_id"), "left_anti").localCheckpoint()
    docs.coalesce(1).write.mode("overwrite").parquet(s"$destDir/_bm_docs")
    spark.read.parquet(s"$dir/postings")
      .join(dead, Seq("doc_id"), "left_anti")
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term"))
      .write.partitionBy("term_bucket").mode("overwrite")
      .parquet(s"$destDir/postings")
    // "the destination starts tombstone-free" must hold even for a
    // recycled destDir (ping-pong compaction) — same inherited-
    // tombstone hazard as build()
    spark.range(0).select(col("id").as("doc_id"), col("id").as("dl"))
      .write.mode("overwrite").parquet(s"$destDir/_bm_tombstones")
    adjustedStats(spark, dir).coalesce(1)
      .write.mode("overwrite").parquet(s"$destDir/_bm_stats")
  }

  /** Stored stats net of tombstones — one row minus one row, both
    * driver-scalar reads. */
  private def adjustedStats(spark: SparkSession, dir: String): DataFrame = {
    val old = spark.read.parquet(s"$dir/_bm_stats")
      .select(col("n_docs"), col("sum_dl")).collect()(0)
    val deadAgg = tombstones(spark, dir)
      .agg(count(lit(1)).as("nd"), sum(col("dl")).as("ddl")).collect()(0)
    val nd = deadAgg.getLong(0)
    val ddl = if (deadAgg.isNullAt(1)) 0L else deadAgg.getLong(1)
    spark.range(1)
      .select(lit(old.getLong(0) - nd).as("n_docs"),
        lit(old.getLong(1) - ddl).as("sum_dl"))
  }

  /** Torn-append detector: under the ids → postings → stats write
    * order, every interrupted [[append]] prefix leaves the committed-id
    * count ahead of the stats row. One narrow-column count — no
    * postings scan. Tombstones must reference committed docs only (an
    * orphan means a delete raced a compaction swap). */
  def consistent(spark: SparkSession, dir: String): Boolean = {
    val st = spark.read.parquet(s"$dir/_bm_stats")
      .select(col("n_docs")).collect()(0).getLong(0)
    val ids = spark.read.parquet(s"$dir/_bm_docs")
    val orphanDead = tombstones(spark, dir).select(col("doc_id"))
      .join(ids, Seq("doc_id"), "left_anti").count()
    st == ids.count() && orphanDead == 0L
  }

  /** BM25 top-k served from the materialized layout: probed bucket ids
    * as a partition filter, stored stats as the broadcast scalar. */
  def topK(spark: SparkSession, dir: String, queryTerms: DataFrame,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.select(col("term")).distinct()
    // control-plane: bucket ids of the (tiny) probe set, driver-side
    val buckets = terms.collect().map(r =>
      graft.functions.Md5_64.hash60(r.getString(0)) % Buckets)
      .distinct.toSeq
    val probed = spark.read.parquet(s"$dir/postings")
      .filter(col("term_bucket").isin(buckets: _*))
      .join(broadcast(terms), Seq("term"))
      // tombstoned docs stop scoring the moment delete() commits
      .join(tombstones(spark, dir).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    // stats NET of tombstones: IDF and avgdl shift when docs leave the
    // corpus — delete(X) then topK must score exactly like an index
    // that never held X
    val stats = adjustedStats(spark, dir)
      .select(col("n_docs").cast("double").as("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    Bm25.rank(probed, stats, k, k1, b)
  }
}
