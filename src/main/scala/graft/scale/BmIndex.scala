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
  *   _bm_rev/…                  (doc_id, rev, old_dl, new_dl) revision
  *                              registry ([[upsert]]; probes serve each
  *                              doc's max revision, stats shift by the
  *                              latest dl delta, [[compactTo]] folds)
  *   _bm_epochs/…               (e, n_docs, sum_dl) snapshot ledger —
  *                              one row per committed verb, appended
  *                              LAST (the per-epoch commit point), so
  *                              [[topKAsOf]] reads any epoch's EXACT
  *                              post-verb statistics from one tiny row
  *                              instead of re-aggregating the corpus
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

  import org.apache.spark.sql.types.{LongType, StringType, StructField,
    StructType}

  // explicit schema for every postings read: build/append-era files
  // lack the rev column ([[upsert]]-era files carry it), and plain
  // schema inference without mergeSchema would resolve to whichever
  // file it sampled — the IndexIo.readOr discipline
  private val postingSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("term", StringType),
    StructField("tf", LongType), StructField("dl", LongType),
    StructField("rev", LongType), StructField("term_bucket", LongType)))

  private def readPostings(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(postingSchema).parquet(s"$dir/postings")

  private def bucketed(docs: DataFrame): DataFrame =
    Bm25.postingsOf(docs)
      .withColumn("term_bucket",
        pmod(graft.functions.Md5_64.md5_64(col("term")), lit(Buckets)))

  // coalesce: an empty frame sums to NULL, and a NULL sum_dl baked
  // into _bm_stats poisons every later stats read — build over an
  // empty frame (the LshIndex-documented cold start) must write (0, 0)
  // (found by BmIndexPropertySpec's delete-everything-then-serve
  // history, which needs the same zero on the rebuild twin)
  private def statsDelta(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(size(split(col("text"), " ")).cast("long")), lit(0L))
        .as("sum_dl"))

  private def writePostings(docs: DataFrame, dir: String,
      mode: String): Unit =
    bucketed(docs)
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term"))
      .write.partitionBy("term_bucket").mode(mode)
      .parquet(s"$dir/postings")

  /** Snapshot ledger `(e, n_docs, sum_dl)` — one row per committed
    * verb (appended LAST, the per-epoch commit point); absent on a
    * pre-snapshot index (reads empty; [[committedEpoch]] then treats
    * the whole current state as epoch 0). */
  private def epochsLedger(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_bm_epochs")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(p.toString)
    else spark.range(0).select(col("id").as("e"), col("id").as("n_docs"),
      col("id").as("sum_dl"))
  }

  /** Append the epoch-E ledger row carrying the CURRENT adjusted
    * stats; idempotent by epoch (a replayed verb's second attempt
    * skips). */
  private def commitEpoch(spark: SparkSession, dir: String,
      e: Long): Unit = {
    val exists = epochsLedger(spark, dir).filter(col("e") === e)
      .limit(1).count() > 0L
    if (!exists)
      adjustedStats(spark, dir).select(lit(e).as("e"),
          col("n_docs"), col("sum_dl"))
        .coalesce(1).write.mode("append").parquet(s"$dir/_bm_epochs")
  }

  /** The committed snapshot counter: the ledger's max epoch; 0 on a
    * pre-snapshot index that has stats (its whole state reads as
    * epoch 0); −1 on a cold dir. */
  def committedEpoch(spark: SparkSession, dir: String): Long = {
    val r = epochsLedger(spark, dir).agg(max(col("e"))).collect()(0)
    if (!r.isNullAt(0)) r.getLong(0)
    else if (IndexIo.exists(spark, s"$dir/_bm_stats")) 0L
    else -1L
  }

  /** Epoch a mutating verb stamps its rows with. NOT simply
    * [[committedEpoch]] + 1 (round-15 advice item 2): a torn verb's
    * rows are stamped but never ledger-committed, so allocating from
    * the ledger alone would let the NEXT successful verb reuse the
    * residue's epoch number — its ledger row would then legitimize
    * the residue rows at that snapshot while its statistics exclude
    * them. Allocating past the max epoch STAMPED anywhere (committed
    * or not) keeps residue epochs permanently ledger-less, and
    * [[topKAsOf]]'s ledger-membership gate keeps them invisible.
    * Three narrow single-column aggregates over the epoch-stamped
    * tables — verb-time cost, never probe-time. */
  private def nextEpoch(spark: SparkSession, dir: String): Long = {
    val stamped = IndexIo.readOr(spark, s"$dir/_bm_docs", docEpochSchema)
      .select(col("e"))
      .unionByName(
        IndexIo.readOr(spark, s"$dir/_bm_tombstones", tombEpochSchema)
          .select(col("e")))
      .unionByName(IndexIo.readOr(spark, s"$dir/_bm_rev", revEpochSchema)
        .select(col("e")))
      .agg(max(coalesce(col("e"), lit(0L)))).collect()(0)
    val raw = if (stamped.isNullAt(0)) -1L else stamped.getLong(0)
    math.max(committedEpoch(spark, dir), raw) + 1L
  }

  /** Round-15 advice item 1: on a pre-ledger index (stats exist, no
    * `_bm_epochs`), the FIRST mutating verb must pin epoch 0's TRUE
    * pre-verb statistics before writing anything — otherwise
    * [[commitEpoch]] only ever records e ≥ 1 rows and
    * [[topKAsOf]](asOf = 0) would fall back to the CURRENT post-verb
    * stats, silently breaking the "historical idf/avgdl are EXACT"
    * contract. Idempotent (only fires while the ledger is empty);
    * called by every verb before its first write. */
  private def ensureEpoch0Ledger(spark: SparkSession, dir: String): Unit =
    if (IndexIo.exists(spark, s"$dir/_bm_stats") &&
        epochsLedger(spark, dir).limit(1).count() == 0L)
      adjustedStats(spark, dir)
        .select(lit(0L).as("e"), col("n_docs"), col("sum_dl"))
        .coalesce(1).write.mode("append").parquet(s"$dir/_bm_epochs")

  def build(docs: DataFrame, dir: String): Unit = {
    docs.select(col("doc_id")).withColumn("e", lit(0L))
      .write.mode("overwrite")
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
    // the revision registry carries the same recycled-dir hazard
    docs.sparkSession.range(0)
      .select(col("id").as("doc_id"), col("id").as("rev"),
        col("id").as("old_dl"), col("id").as("new_dl"))
      .write.mode("overwrite").parquet(s"$dir/_bm_rev")
    statsDelta(docs).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/_bm_stats")
    // snapshot ledger resets with the dir: epoch 0 = the build state
    statsDelta(docs).select(lit(0L).as("e"), col("n_docs"), col("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_bm_epochs")
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
    ensureEpoch0Ledger(spark, dir)
    val e = nextEpoch(spark, dir)
    fresh.select(col("doc_id")).withColumn("e", lit(e))
      .write.mode("append")
      .parquet(s"$dir/_bm_docs")
    writePostings(fresh, dir, "append")
    spark.range(1)
      .select(lit(old.getLong(0) + delta.getLong(0)).as("n_docs"),
        lit(old.getLong(1) + delta.getLong(1)).as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_bm_stats")
    commitEpoch(spark, dir, e)
  }

  /** [[append]] made replay-HEALING — the foreachBatch exactly-once
    * contract ([[graft.streaming.IncrementalRetrieval]]). The plain
    * [[append]]'s anti-join targets `_bm_docs`, the FIRST write of the
    * protocol, so a crash between the id write and the
    * postings/stats/ledger writes makes a replay see the whole batch
    * as committed and return early — the batch's postings, stats
    * delta, and ledger row are silently lost (plain append's
    * documented torn recovery is rebuild). This variant distinguishes
    * CONFIRMED ids (stamped with a ledger-committed epoch) from torn
    * residue:
    *
    *  - the batch anti-joins confirmed ids only, so residue docs stay
    *    in the work set;
    *  - missing id rows are written by an anti-join against the FULL
    *    registry (a doc never gets a second `_bm_docs` row —
    *    [[consistent]]'s n_docs == count(_bm_docs) invariant holds
    *    through every heal);
    *  - missing postings anti-join the doc ids already landed inside
    *    the batch's OWN term buckets — a partition-pruned probe, the
    *    [[IvfIndex.appendIdempotent]]/[[LshIndex.append]] shape;
    *  - the stats row is re-derived from the LAST LEDGER ROW (the
    *    adjusted stats at the last commit) + the batch delta, never
    *    from the current `_bm_stats` row, which a
    *    crash-after-stats-write tear leaves already advanced;
    *  - the ledger commit at the residue's ORIGINAL epoch stamp
    *    finishes the heal (no re-stamp, so the as-of history gains
    *    exactly one epoch however many replays it takes).
    *
    * A fully-committed replay is a complete no-op. Heal-at-original-
    * stamp requires that no epoch committed PAST the residue — always
    * true in the single-writer streaming loop, where the replay is the
    * very next verb on the dir; residue that WAS overtaken (some other
    * verb committed a later epoch first) can never heal consistently
    * and the verb refuses loudly — rebuild is the recovery, exactly
    * plain append's contract. CDC residue from a torn delete/upsert is
    * out of scope (those verbs carry their own (id)/(id, rev)
    * anti-join heals); [[consistent]] still detects any unreplayed
    * tear. */
  def appendIdempotent(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    ensureEpoch0Ledger(spark, dir)
    val okEs = epochsLedger(spark, dir).select(col("e"))
      .unionByName(spark.range(1).select(lit(0L).as("e")))
      .distinct().localCheckpoint()
    val reg = IndexIo.readOr(spark, s"$dir/_bm_docs", docEpochSchema)
      .withColumn("e", coalesce(col("e"), lit(0L)))
    val confirmed = reg
      .join(IndexIo.maybeBroadcast(okEs), Seq("e"), "left_semi")
      .select(col("doc_id"))
    val fresh = docs.join(confirmed, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val delta = statsDelta(fresh).collect()(0)
    if (delta.getLong(0) == 0L) return // fully-committed replay
    // residue = this batch's ids already stamped but never
    // ledger-confirmed; one torn verb leaves exactly one epoch (the id
    // write is a single atomic job)
    val resEs = reg
      .join(IndexIo.maybeBroadcast(okEs), Seq("e"), "left_anti")
      .join(fresh.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("e")).distinct().collect().map(_.getLong(0)).sorted
    require(resEs.length <= 1,
      s"batch overlaps torn residue from ${resEs.length} distinct " +
        s"epochs (${resEs.mkString(", ")}) — one commit cannot heal " +
        "two tears; rebuild is the recovery")
    val ce = committedEpoch(spark, dir)
    val e = resEs.headOption match {
      case Some(r) =>
        require(r > ce,
          s"torn-append residue at epoch $r was overtaken by committed " +
            s"epoch $ce — it can no longer heal in place; rebuild is " +
            "the recovery")
        r
      case None => nextEpoch(spark, dir)
    }
    // 1. ids (skip rows that landed before the tear)
    val missingIds = fresh.select(col("doc_id"))
      .join(reg.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (missingIds.count() > 0L)
      missingIds.withColumn("e", lit(e))
        .write.mode("append").parquet(s"$dir/_bm_docs")
    // 2. postings — landed docs probed inside the batch's own buckets.
    // The anti-join key is (doc_id, term_bucket), NOT doc_id alone: one
    // doc's postings span several term_bucket partition FILES written
    // by a single job, and FileOutputCommitter moves task outputs
    // sequentially — a crash mid-job-commit can leave a doc's postings
    // visible in some buckets and missing in others. A doc-granular
    // probe would skip such a doc entirely (its stats counted, its
    // postings permanently incomplete); the per-bucket key heals
    // exactly the missing files at unchanged probe cost (same pruned
    // bucket scan, one extra tiny join column).
    val bucketedFresh = bucketed(fresh).localCheckpoint()
    val bks = bucketedFresh.select(col("term_bucket")).distinct()
      .collect().map(_.getLong(0)).toIndexedSeq
    val landedBuckets = readPostings(spark, dir)
      .filter(col("term_bucket").isin(bks: _*))
      .filter(col("rev").isNull)
      .select(col("doc_id"), col("term_bucket")).distinct()
    val freshPost = bucketedFresh
      .join(landedBuckets, Seq("doc_id", "term_bucket"), "left_anti")
      .localCheckpoint()
    if (freshPost.count() > 0L)
      freshPost.repartition(col("term_bucket"))
        .sortWithinPartitions(col("term"))
        .write.partitionBy("term_bucket").mode("append")
        .parquet(s"$dir/postings")
    // 3. stats re-based off the last ledger row: target adjusted stats
    // are ledgerLast + delta, un-adjusted back to the base-row
    // semantic (base.n = adj.n + dead.n; base.sdl = adj.sdl − rdl +
    // ddl — [[adjustedStats]]'s algebra inverted)
    val ledgerLast = epochsLedger(spark, dir)
      .orderBy(col("e").desc).limit(1)
      .select(col("n_docs"), col("sum_dl")).collect()(0)
    val deadAgg = tombstones(spark, dir)
      .agg(count(lit(1)).as("nd"), sum(col("dl")).as("ddl")).collect()(0)
    val nd = deadAgg.getLong(0)
    val ddl = if (deadAgg.isNullAt(1)) 0L else deadAgg.getLong(1)
    val revAgg = currentRevs(spark, dir)
      .agg(sum(col("new_dl") - col("old_dl"))).collect()(0)
    val rdl = if (revAgg.isNullAt(0)) 0L else revAgg.getLong(0)
    spark.range(1)
      .select(lit(ledgerLast.getLong(0) + delta.getLong(0) + nd)
          .as("n_docs"),
        lit(ledgerLast.getLong(1) + delta.getLong(1) - rdl + ddl)
          .as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_bm_stats")
    commitEpoch(spark, dir, e)
  }

  /** Test hook (BmHealSpec): perform [[append]]'s write protocol up to
    * `stage` writes — 1 = ids only, 2 = ids + postings, 3 = ids +
    * postings + stats — and never the ledger row, staging each torn-
    * append window without a real crash. */
  private[scale] def stageTornAppend(docs: DataFrame, dir: String,
      stage: Int): Unit = {
    require(stage >= 1 && stage <= 3, "stage must be 1, 2, or 3")
    val spark = docs.sparkSession
    val old = spark.read.parquet(s"$dir/_bm_stats")
      .select(col("n_docs"), col("sum_dl")).collect()(0)
    val committed = spark.read.parquet(s"$dir/_bm_docs")
    val fresh = docs.join(committed.select(col("doc_id")),
      Seq("doc_id"), "left_anti").localCheckpoint()
    val delta = statsDelta(fresh).collect()(0)
    ensureEpoch0Ledger(spark, dir)
    val e = nextEpoch(spark, dir)
    fresh.select(col("doc_id")).withColumn("e", lit(e))
      .write.mode("append").parquet(s"$dir/_bm_docs")
    if (stage >= 2) writePostings(fresh, dir, "append")
    if (stage >= 3)
      spark.range(1)
        .select(lit(old.getLong(0) + delta.getLong(0)).as("n_docs"),
          lit(old.getLong(1) + delta.getLong(1)).as("sum_dl"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/_bm_stats")
  }

  /** Test hook (BmHealSpec): [[stageTornAppend]] with the POSTINGS
    * write itself torn mid-job-commit — ids land in full, but only the
    * term buckets satisfying `keepBucket` become visible, modeling
    * FileOutputCommitter's sequential per-task output moves dying
    * midway. The docs whose terms span kept AND dropped buckets are
    * exactly the partial-visibility hazard the heal's
    * (doc_id, term_bucket) anti-join exists for: a doc-granular probe
    * would see such a doc "landed" and skip its missing buckets. */
  private[scale] def stageTornAppendPartialPostings(docs: DataFrame,
      dir: String, keepBucket: Long => Boolean): Unit = {
    val spark = docs.sparkSession
    val committed = spark.read.parquet(s"$dir/_bm_docs")
    val fresh = docs.join(committed.select(col("doc_id")),
      Seq("doc_id"), "left_anti").localCheckpoint()
    ensureEpoch0Ledger(spark, dir)
    val e = nextEpoch(spark, dir)
    fresh.select(col("doc_id")).withColumn("e", lit(e))
      .write.mode("append").parquet(s"$dir/_bm_docs")
    val bf = bucketed(fresh).localCheckpoint()
    val kept = bf.select(col("term_bucket")).distinct()
      .collect().map(_.getLong(0)).filter(keepBucket).toIndexedSeq
    require(kept.nonEmpty, "keepBucket dropped every bucket — use " +
      "stageTornAppend(stage = 1) to model the no-postings tear")
    bf.filter(col("term_bucket").isin(kept: _*))
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term"))
      .write.partitionBy("term_bucket").mode("append")
      .parquet(s"$dir/postings")
  }

  /** Revision registry `(doc_id, rev, old_dl, new_dl)` — one row per
    * [[upsert]] of a doc (absent until the first upsert; reads empty).
    * A doc's CURRENT revision is its max-rev row. The two document
    * lengths ride along so probe-time stats adjustment stays a
    * registry-sized aggregate: each doc's LATEST row contributes
    * (new_dl − old_dl) where old_dl is the length the doc had at
    * build/append time — the only generation whose dl is baked into
    * the base `_bm_stats` row (intermediate revisions never touched
    * the base stats, so only first-vs-latest matters). */
  private[scale] def revisions(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_bm_rev")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(p.toString)
    else spark.range(0).select(col("id").as("doc_id"), col("id").as("rev"),
      col("id").as("old_dl"), col("id").as("new_dl"))
  }

  private def currentRevs(spark: SparkSession, dir: String): DataFrame =
    revisions(spark, dir)
      .groupBy(col("doc_id"))
      .agg(max(struct(col("rev"), col("old_dl"), col("new_dl"))).as("m"))
      .select(col("doc_id"), col("m.rev").as("cur_rev"),
        col("m.old_dl").as("old_dl"), col("m.new_dl").as("new_dl"))

  /** Compaction-need probe ([[IndexIo.compactionStats]]): posting
    * files per term bucket (append decay) and rev/tombstone bytes vs
    * the posting tree (CDC decay). Listing-only cost. */
  def compactionStats(spark: SparkSession,
      dir: String): IndexIo.CompactionStats =
    IndexIo.compactionStats(spark, s"$dir/postings",
      Seq(s"$dir/_bm_rev", s"$dir/_bm_tombstones"))

  /** The decision [[compactionStats]] exists to make: time to
    * [[compactTo]]? */
  def needsCompaction(spark: SparkSession, dir: String,
      maxFilesPerBucket: Double = 8.0,
      maxCdcFraction: Double = 0.2): Boolean =
    compactionStats(spark, dir)
      .needsCompaction(maxFilesPerBucket, maxCdcFraction)

  /** Keep each doc's CURRENT generation of posting rows: never-revised
    * docs keep their rev-null rows, revised docs keep exactly their
    * max-rev rows ([[LshIndex]]'s currentOnly discipline — one
    * size-guarded join against the O(revised docs) registry,
    * [[IndexIo.maybeBroadcast]]). */
  private def currentOnly(rows: DataFrame, revs: DataFrame): DataFrame =
    rows.join(
        IndexIo.maybeBroadcast(revs.select(col("doc_id"), col("cur_rev"))),
        Seq("doc_id"), "left")
      .filter((col("cur_rev").isNull && col("rev").isNull) ||
        col("rev") === col("cur_rev"))
      .drop("cur_rev")

  /** Document REVISION — [[LshIndex.upsert]]'s verb on the postings
    * index, with the extra obligation LSH doesn't have: BM25 scores
    * depend on corpus statistics, and a revised document changes its
    * own length, so `n_docs` stays put while `sum_dl` must shift by
    * (new_dl − old_dl). The registry rows carry both lengths;
    * [[adjustedStats]] folds the LATEST row per doc, so stats are
    * exact for any number of supersessions without ever rereading the
    * corpus. New postings land rev-stamped inside the live term-bucket
    * dirs; probes filter to current generations (one broadcast join);
    * a doc whose revised text drops a term stops matching on it the
    * moment the registry row commits, and a term it gains starts
    * matching. Monotone caller-supplied rev; replaying the same
    * (batch, rev) is a no-op at every tear point (postings anti-join
    * on (doc, rev), registry anti-join on (doc, rev)); write order
    * postings → registry LAST as the visibility point. Uncommitted or
    * tombstoned ids are ignored (append/compact first — verbs stay
    * orthogonal). q157 proves upsert ≡ rebuild-from-revised by oracle,
    * scores included. */
  def upsert(docs: DataFrame, dir: String, rev: Long): Unit = {
    require(rev > 0L, "revision must be positive")
    val spark = docs.sparkSession
    val committed = spark.read.parquet(s"$dir/_bm_docs")
    val revised = docs
      .join(committed.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .join(tombstones(spark, dir).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (revised.isEmpty) return
    val cur = currentRevs(spark, dir).localCheckpoint()
    val stale = cur
      .join(revised.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .filter(col("cur_rev") > lit(rev)).count()
    require(stale == 0L,
      s"upsert rev=$rev is older than the current revision of $stale " +
        "docs — revisions must be monotone per doc")
    ensureEpoch0Ledger(spark, dir)
    // heal guard: (doc, rev) posting rows that already landed
    val landed = readPostings(spark, dir)
      .filter(col("rev") === rev).select(col("doc_id")).distinct()
    val fresh = revised.join(landed, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (fresh.count() > 0L)
      bucketed(fresh).withColumn("rev", lit(rev))
        .repartition(col("term_bucket"))
        .sortWithinPartitions(col("term"))
        .write.partitionBy("term_bucket").mode("append")
        .parquet(s"$dir/postings")
    // registry LAST (visibility point): old_dl = the dl baked into the
    // base stats (a prior registry row's old_dl if one exists, else
    // the doc's original posting dl, else 0 for a no-postings doc)
    val origDl = readPostings(spark, dir)
      .filter(col("rev").isNull)
      .groupBy(col("doc_id")).agg(max(col("dl")).as("first_dl"))
    val freshReg = revised
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("new_dl"))
      .join(cur.select(col("doc_id"), col("old_dl").as("prev_old")),
        Seq("doc_id"), "left")
      .join(origDl, Seq("doc_id"), "left")
      .select(col("doc_id"), lit(rev).as("rev"),
        coalesce(col("prev_old"), col("first_dl"), lit(0L)).as("old_dl"),
        col("new_dl"))
      .join(revisions(spark, dir).filter(col("rev") === rev)
        .select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (freshReg.count() > 0L) {
      val e = nextEpoch(spark, dir)
      freshReg.withColumn("e", lit(e))
        .write.mode("append").parquet(s"$dir/_bm_rev")
      commitEpoch(spark, dir, e)
    }
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
    // dl per doc from its CURRENT-generation postings (a revised doc's
    // stats contribution is first_dl + (new_dl − first_dl) = its
    // current dl, so the tombstone must subtract exactly that); docs
    // with no postings fall back to 0
    val dls = currentOnly(readPostings(spark, dir),
        currentRevs(spark, dir))
      .groupBy(col("doc_id")).agg(max(col("dl")).as("pdl"))
    val dead = fresh
      .join(dls, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pdl"), lit(0L)).cast("long").as("dl"))
      .localCheckpoint()
    if (dead.count() > 0L) {
      ensureEpoch0Ledger(spark, dir)
      val e = nextEpoch(spark, dir)
      dead.withColumn("e", lit(e))
        .write.mode("append").parquet(s"$dir/_bm_tombstones")
      commitEpoch(spark, dir, e)
    }
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
    // the fold is the history vacuum: survivors re-base to epoch 0
    docs.select(col("doc_id"), lit(0L).as("e"))
      .coalesce(1).write.mode("overwrite").parquet(s"$destDir/_bm_docs")
    // revisions FOLD too: only each doc's current generation survives,
    // written rev-less, and the destination registry resets — the
    // adjusted stats already carry the revision dl deltas, so the
    // folded base row is exact
    currentOnly(readPostings(spark, dir), currentRevs(spark, dir))
      .join(dead, Seq("doc_id"), "left_anti")
      .drop("rev")
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term"))
      .write.partitionBy("term_bucket").mode("overwrite")
      .parquet(s"$destDir/postings")
    // "the destination starts tombstone-free" must hold even for a
    // recycled destDir (ping-pong compaction) — same inherited-
    // tombstone hazard as build()
    spark.range(0).select(col("id").as("doc_id"), col("id").as("dl"))
      .write.mode("overwrite").parquet(s"$destDir/_bm_tombstones")
    spark.range(0).select(col("id").as("doc_id"), col("id").as("rev"),
        col("id").as("old_dl"), col("id").as("new_dl"))
      .write.mode("overwrite").parquet(s"$destDir/_bm_rev")
    adjustedStats(spark, dir).coalesce(1)
      .write.mode("overwrite").parquet(s"$destDir/_bm_stats")
    adjustedStats(spark, dir)
      .select(lit(0L).as("e"), col("n_docs"), col("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$destDir/_bm_epochs")
  }

  /** Stored stats net of tombstones and revisions — the base row
    * (build/append era) plus each revised doc's LATEST (new_dl −
    * old_dl) length delta, minus the tombstoned docs' current
    * contributions. Registry-sized aggregates, driver-scalar reads —
    * the corpus is never re-scanned. */
  private def adjustedStats(spark: SparkSession, dir: String): DataFrame = {
    val old = spark.read.parquet(s"$dir/_bm_stats")
      .select(col("n_docs"), col("sum_dl")).collect()(0)
    val deadAgg = tombstones(spark, dir)
      .agg(count(lit(1)).as("nd"), sum(col("dl")).as("ddl")).collect()(0)
    val nd = deadAgg.getLong(0)
    val ddl = if (deadAgg.isNullAt(1)) 0L else deadAgg.getLong(1)
    // latest revision delta per doc — INCLUDING tombstoned docs: a
    // delete() after a revision captures the doc's CURRENT dl in its
    // tombstone row, so the ledger per such doc reads
    // base(old_dl) + delta(new−old) − tombstone(new) = 0 exactly;
    // dropping the delta here would leave base − new ≠ 0
    val revAgg = currentRevs(spark, dir)
      .agg(sum(col("new_dl") - col("old_dl")).as("rdl")).collect()(0)
    val rdl = if (revAgg.isNullAt(0)) 0L else revAgg.getLong(0)
    spark.range(1)
      .select(lit(old.getLong(0) - nd).as("n_docs"),
        lit(old.getLong(1) + rdl - ddl).as("sum_dl"))
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
    // revision registry rows must reference committed docs, and every
    // registered (doc, rev) must have posting rows landed (registry is
    // the upsert visibility point; a registered-but-dataless revision
    // means the postings→registry order was violated or files were
    // lost) — docs whose revised text is EMPTY legitimately have no
    // postings, recorded as new_dl = 0
    val revs = revisions(spark, dir)
    val orphanRev = revs.join(ids, Seq("doc_id"), "left_anti").count()
    val dataless = revs.filter(col("new_dl") > 0L)
      .select(col("doc_id"), col("rev"))
      .join(readPostings(spark, dir)
          .select(col("doc_id"), col("rev")).na.drop().distinct(),
        Seq("doc_id", "rev"), "left_anti").count()
    st == ids.count() && orphanDead == 0L && orphanRev == 0L &&
      dataless == 0L
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
    // revised docs score on their CURRENT generation only (broadcast
    // registry filter); tombstoned docs stop scoring the moment
    // delete() commits
    val probed = currentOnly(readPostings(spark, dir)
        .filter(col("term_bucket").isin(buckets: _*)),
        currentRevs(spark, dir))
      .join(broadcast(terms), Seq("term"))
      .join(tombstones(spark, dir).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    // stats NET of tombstones: IDF and avgdl shift when docs leave the
    // corpus — delete(X) then topK must score exactly like an index
    // that never held X. try_divide: an index whose every doc was
    // tombstoned has n_docs 0 — it must serve an EMPTY top-k (probed
    // is already empty, the null avgdl never scores a row), not throw
    // on the avgdl division (found by BmIndexPropertySpec's random
    // delete-everything history)
    val stats = adjustedStats(spark, dir)
      .select(col("n_docs").cast("double").as("n_docs"),
        try_divide(col("sum_dl").cast("double"),
          col("n_docs").cast("double")).as("avgdl"))
    Bm25.rank(probed, stats, k, k1, b)
  }

  private val feedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("change", StringType),
    StructField("rev", LongType), StructField("e", LongType)))

  /** CHANGE DATA FEED — [[LshIndex.emitChangeFeed]]'s contract on the
    * BM25 index: persist each committed epoch's id-level delta to
    * `feedDir/e=N` as (doc_id, change ∈ inserted/revised/deleted,
    * rev), derived POST-HOC from the epoch stamps at O(affected) per
    * epoch. Emission gates on LEDGER MEMBERSHIP: an epoch with no
    * `_bm_epochs` row is a torn verb's residue and emits an EMPTY
    * delta (its rows never served, so nothing changed). Each dir is
    * an idempotent `_SUCCESS`-gated overwrite; re-emission after new
    * commits writes exactly the missing epochs. Restore contract
    * (spec-pinned): baseline membership/revision state + replayed
    * deltas ≡ the as-of state at the last emitted epoch. Emit before
    * [[compactTo]] — the fold vacuums the history the feed derives
    * from.
    *
    * Unlike [[IvfIndex.emitChangeFeed]], BM25 keeps the eager empty
    * dir for a ledger-less epoch — and that is CORRECT here, not the
    * frozen-hole hazard round-16 advice item 2 fixed on the vector/z
    * feeds: the window only reaches epochs ≤ [[committedEpoch]] (the
    * max LEDGER epoch), and a ledger-less epoch BELOW a committed one
    * is permanently unhealable by construction —
    * [[appendIdempotent]] refuses overtaken residue (its guard), so
    * no later heal can ever give that epoch content. A residue epoch
    * that CAN still heal is above every committed epoch, outside the
    * window, and the heal commits its ledger row before the feed can
    * ever reach it. */
  def emitChangeFeed(spark: SparkSession, dir: String, feedDir: String,
      baseline: Long = 0L): Unit = {
    val committed = committedEpoch(spark, dir)
    require(baseline >= 0L && baseline <= committed,
      s"feed baseline $baseline outside committed history [0, $committed]")
    val fs = new org.apache.hadoop.fs.Path(feedDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val done = Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$feedDir/e=*/_SUCCESS")))
      .getOrElse(Array.empty)
      .map(_.getPath.getParent.getName.stripPrefix("e=").toLong)
    val from = math.max(baseline, if (done.isEmpty) -1L else done.max) + 1L
    if (from > committed) return
    val okEs = epochsLedger(spark, dir).select(col("e"))
      .collect().map(_.getLong(0)).toSet
    (from to committed).foreach { n =>
      val rows = if (!okEs.contains(n))
        IndexIo.emptyFrame(spark, feedSchema).drop("e")
      else {
        val ins = IndexIo.readOr(spark, s"$dir/_bm_docs", docEpochSchema)
          .filter(coalesce(col("e"), lit(0L)) === n)
          .select(col("doc_id"), lit("inserted").as("change"),
            lit(null).cast("long").as("rev"))
        // explicit epoch schemas: build()'s reset files predate the e
        // column, and inference would resolve to whichever file it
        // sampled (the readAt discipline)
        val rev = IndexIo.readOr(spark, s"$dir/_bm_rev", revEpochSchema)
          .filter(coalesce(col("e"), lit(0L)) === n)
          .select(col("doc_id"), lit("revised").as("change"), col("rev"))
        val del = IndexIo.readOr(spark, s"$dir/_bm_tombstones",
            tombEpochSchema)
          .filter(coalesce(col("e"), lit(0L)) === n)
          .select(col("doc_id"), lit("deleted").as("change"),
            lit(null).cast("long").as("rev"))
        ins.unionByName(rev).unionByName(del)
      }
      rows.coalesce(1).write.mode("overwrite").parquet(s"$feedDir/e=$n")
    }
  }

  /** Read the feed (all epochs; filter `e` for a window). */
  def changeFeed(spark: SparkSession, feedDir: String): DataFrame =
    IndexIo.readOr(spark, feedDir, feedSchema)

  // explicit schemas for the as-of readers: mixed legacy/epoch-stamped
  // files must always surface the e column (null → 0)
  private val docEpochSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("e", LongType)))
  private val tombEpochSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("dl", LongType),
    StructField("e", LongType)))
  private val revEpochSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("rev", LongType),
    StructField("old_dl", LongType), StructField("new_dl", LongType),
    StructField("e", LongType)))

  /** Epoch-gated CDC table read for the as-of path. Two gates, both
    * required: `e ≤ asOf` (the snapshot boundary) AND `e` is a
    * LEDGER-COMMITTED epoch (round-15 advice item 2 — a torn verb's
    * residue rows carry a stamped epoch that never got its ledger
    * row; without the membership gate they would serve at every
    * later snapshot with statistics that exclude them). Epoch 0 is
    * always admitted: build commits it, [[ensureEpoch0Ledger]]
    * backfills it on legacy indexes, and a pre-ledger index that no
    * verb ever touched has no ledger at all yet its whole state IS
    * epoch 0. The committed-epoch set arrives as a DRIVER-SIDE
    * literal (one row per committed verb — control-plane sized by
    * construction, collected once per probe by [[topKAsOf]]), so the
    * membership gate is an `isin` the scan can evaluate inline
    * instead of a per-table broadcast semi-join (r20 optimization —
    * one ledger job per probe, not three, and no join build per
    * gated table). SIZE-GUARDED since r21 (round-20 verdict item 5):
    * past [[IndexIo.IsinGateMaxLiterals]] committed epochs the gate
    * falls back to a broadcast LocalRelation semi-join built from the
    * same collected ledger — bounded plan size, no extra scan, same
    * rows (BmAsOfSpec exercises both sides of the threshold). */
  private def readAt(spark: SparkSession, path: String,
      schema: StructType, asOf: Long, committedEs: Seq[Long]): DataFrame =
    IndexIo.gateMembership(
      IndexIo.readOr(spark, path, schema)
        .withColumn("e", coalesce(col("e"), lit(0L)))
        .filter(col("e") <= asOf),
      "e", committedEs)

  /** SNAPSHOT BM25 top-k — [[topK]] exactly as the index stood when
    * epoch `asOf` committed, SCORES INCLUDED: postings gate by their
    * doc's commit epoch and by the registry rows at ≤ asOf (later
    * revisions serve their OLD generation), tombstones at ≤ asOf, and
    * the corpus statistics come from the `_bm_epochs` ledger row the
    * epoch's verb committed — so historical idf/avgdl are EXACT
    * without re-aggregating anything (the one-tiny-row read that
    * makes "score these queries against the corpus as of snapshot E"
    * an O(probe) operation). The ledger row is each verb's LAST
    * write, so a torn verb never advances [[committedEpoch]] and its
    * residue is invisible to snapshots (BmAsOfSpec stages the tear).
    * Valid for any 0 ≤ asOf ≤ [[committedEpoch]]; [[compactTo]] is
    * the history vacuum. */
  def topKAsOf(spark: SparkSession, dir: String, queryTerms: DataFrame,
      k: Int, asOf: Long, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // ONE ledger read per probe (r20 optimization): the ledger is one
    // row per committed verb — control-plane sized by construction —
    // yet this path used to run three separate Spark jobs against it
    // (the committedEpoch aggregate, the okEs distinct+localCheckpoint,
    // the ledgerRow collect). Collect it once and derive the committed
    // counter, the residue-gate epoch set, and the pinned statistics
    // row locally; results are bit-identical (BmAsOfSpec pins the
    // torn-residue gating, q180/q189/q190 ride the DuckDB oracle).
    val ledger = epochsLedger(spark, dir)
      .select(col("e"), col("n_docs"), col("sum_dl")).collect().toSeq
    val ce =
      if (ledger.nonEmpty) ledger.map(_.getLong(0)).max
      else if (IndexIo.exists(spark, s"$dir/_bm_stats")) 0L
      else -1L
    require(asOf >= 0L && asOf <= ce,
      s"as-of epoch $asOf outside the committed history [0, $ce]" +
        (if (ce < 0L) " — cold index, nothing committed" else ""))
    val terms = queryTerms.select(col("term")).distinct()
    val buckets = terms.collect().map(r =>
      graft.functions.Md5_64.hash60(r.getString(0)) % Buckets)
      .distinct.toSeq
    // committed-epoch set for the residue gate: ledger epochs + 0
    val okEs = (ledger.map(_.getLong(0)) :+ 0L).distinct
    val docsAt = readAt(spark, s"$dir/_bm_docs", docEpochSchema, asOf, okEs)
      .select(col("doc_id"))
    val revsAt = readAt(spark, s"$dir/_bm_rev", revEpochSchema, asOf, okEs)
      .groupBy(col("doc_id"))
      .agg(max(struct(col("rev"), col("old_dl"), col("new_dl"))).as("m"))
      .select(col("doc_id"), col("m.rev").as("cur_rev"))
    val probed = readPostings(spark, dir)
      .filter(col("term_bucket").isin(buckets: _*))
      .join(IndexIo.maybeBroadcast(revsAt), Seq("doc_id"), "left")
      .filter((col("cur_rev").isNull && col("rev").isNull) ||
        col("rev") === col("cur_rev"))
      .drop("cur_rev")
      .join(docsAt, Seq("doc_id"), "left_semi")
      .join(broadcast(terms), Seq("term"))
      .join(readAt(spark, s"$dir/_bm_tombstones", tombEpochSchema, asOf,
        okEs).select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    // the epoch's exact post-verb statistics from the ledger (a
    // pre-snapshot legacy index has no ledger — its whole state IS
    // epoch 0, served by the adjusted current stats); derived from
    // the one collected ledger read above, no extra job
    val ledgerRow = ledger.filter(_.getLong(0) <= asOf)
      .sortBy(-_.getLong(0)).headOption
    val statsBase = ledgerRow match {
      case None => adjustedStats(spark, dir)
      case Some(r) => spark.range(1).select(
        lit(r.getLong(1)).as("n_docs"),
        lit(r.getLong(2)).as("sum_dl"))
    }
    val stats = statsBase
      .select(col("n_docs").cast("double").as("n_docs"),
        try_divide(col("sum_dl").cast("double"),
          col("n_docs").cast("double")).as("avgdl"))
    Bm25.rank(probed, stats, k, k1, b)
  }
}
