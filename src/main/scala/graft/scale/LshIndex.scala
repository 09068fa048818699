package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized MinHash-LSH signature index — the INCREMENTAL half the
  * dedup family lacked: [[Dedup.minhashLshPairsPortable]] answers
  * "which documents in this corpus are near-dups of each other", but a
  * production pipeline almost never re-asks that; it asks "which of
  * TODAY'S crawl are near-dups of the corpus I already hold" — and at
  * 100 TB the corpus side must not be re-shingled, re-hashed, or
  * re-banded per batch. This index persists the per-document MinHash
  * signatures and banded bucket keys once, grows O(batch) on append
  * (the [[BmIndex]] discipline), and serves batch-vs-corpus dedup
  * probes touching only the band partitions the batch actually hashes
  * into.
  *
  * Layout under `dir`:
  * {{{
  *   bands/band_bucket=N/…   (doc_id, band, bk) — the LSH candidate side
  *   sigs/…                  (doc_id, sig array<long>) — verification side
  *   _lsh_docs/…             committed doc_ids (append anti-join target)
  *   _lsh_meta/…             one row: (n_docs, n, num_hashes, bands)
  *   _lsh_tombstones/…       deleted doc_ids ([[delete]]; probes
  *                           anti-join it, [[compactTo]] folds it)
  *   _lsh_rev/…              (doc_id, rev) revision registry
  *                           ([[upsert]]; probes serve each doc's max
  *                           revision, [[compactTo]] folds superseded
  *                           generations and resets it)
  * }}}
  *
  * Hash family: the portable md5-derived universal-hash MinHash of
  * [[Dedup.minhashLshPairsPortable]] (one md5 per distinct shingle,
  * [[graft.functions.MinHashAgg]] fold), so every stored signature is
  * bit-reproducible by an external engine and q113 is hash-checked
  * end to end, index build included.
  *
  * Serving read ([[dedupBatch]]): the batch's banded keys are computed
  * O(batch); their DISTINCT `band_bucket` values (≤ [[Buckets]] rows —
  * bounded control plane regardless of batch size) become a partition
  * filter on `bands/`, so a small probe batch reads a few band dirs,
  * not the corpus index. Candidates = equi-join on (band, bk);
  * verification joins the candidate corpus ids against `sigs/` and
  * counts equal signature components — identical algebra to the
  * in-memory path, so LshIndexSpec pins result equality against
  * minhashLshPairsPortable restricted to cross pairs.
  *
  * Write protocol (single-writer): docs → bands → sigs → meta LAST as
  * the commit point, and [[append]] is SELF-HEALING under replay — the
  * id write anti-joins `_lsh_docs` while the DATA writes anti-join
  * `sigs` (the last-written data table), so every torn prefix repairs
  * on the next append of the same batch (the exactly-once contract a
  * foreachBatch caller like [[graft.streaming.IncrementalNearDup]]
  * needs, not just detectability):
  *  - crash after ids → replay re-writes bands+sigs (ids skip);
  *  - crash after bands → replay re-writes bands (duplicate band rows
  *    are BENIGN: candidate generation dedups on the pair, and
  *    [[compactTo]] drops the redundancy) then sigs;
  *  - crash after sigs → replay only refreshes meta, which is derived
  *    from a recount of `_lsh_docs`, never from stale meta arithmetic.
  * Signatures are never double-inserted (the sigs anti-join), so
  * verification counts stay exact. [[consistent]] still detects a torn
  * state that has NOT yet been replayed — meta is the commit point.
  */
object LshIndex {

  /** Band-bucket partition dirs; probe-side distinct is bounded by
    * this, so the control-plane collect in [[dedupBatch]] is O(64)
    * whatever the batch size. */
  val Buckets = 64L

  private def md5_64(c: org.apache.spark.sql.Column) =
    graft.functions.Md5_64.md5_64(c)

  /** (doc_id, sig array<long>) — delegates to the SHARED
    * [[Dedup.portableSignatures]] definition: the index stores these
    * values, so the hash algebra must live in exactly one place. */
  private def signatures(docs: DataFrame, n: Int,
      numHashes: Int): DataFrame =
    Dedup.portableSignatures(docs, n, numHashes)

  /** (doc_id, band, bk, band_bucket): [[Dedup.portableBandKeys]] plus
    * the index's partition bucket — bucket = md5-hash of (band, key)
    * mod [[Buckets]] so collisions between DIFFERENT bands' keyspaces
    * cannot alias a candidate (band is part of both the join key and
    * the bucket hash). */
  private def banded(sig: DataFrame, bands: Int, r: Int): DataFrame =
    Dedup.portableBandKeys(sig, bands, r)
      .withColumn("band_bucket",
        pmod(md5_64(concat_ws(":", col("band"), col("bk"))), lit(Buckets)))

  /** Test hooks for the torn-append heal spec: reproduce the exact
    * internal signature/bands artifacts so a crash point can be staged
    * without a real crash. */
  private[scale] def signaturesFor(docs: DataFrame, n: Int,
      numHashes: Int): DataFrame = signatures(docs, n, numHashes)
  private[scale] def writeBandsFor(sig: DataFrame, dir: String,
      bands: Int, numHashes: Int): Unit =
    banded(sig, bands, numHashes / bands)
      .repartition(col("band_bucket"))
      .sortWithinPartitions(col("band"), col("bk"))
      .write.partitionBy("band_bucket").mode("append").parquet(s"$dir/bands")

  import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType,
    StringType, StructField, StructType}

  // `e` = snapshot epoch on the three epoch-stamped tables (docs,
  // tombstones, revision registry); legacy files read null → 0. A
  // doc's rows serve as-of E iff its docs row landed at epoch ≤ E AND
  // its sig row exists (sigs is append's LAST data write, so the sig
  // row is the per-doc commit point — torn-append residue ids are
  // invisible to snapshots until the replay completes them);
  // revisions gate by the registry rows at ≤ E, deletions by the
  // tombstone rows at ≤ E.
  private val docIdSchema = StructType(Seq(StructField("doc_id", LongType),
    StructField("e", LongType)))
  // rev is nullable by design: rows written by build/append carry no
  // revision (read back null through the explicit schema), rows written
  // by [[upsert]] carry the revision they belong to — so every
  // pre-upsert index keeps working unchanged and the two row
  // generations coexist in one layout
  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType)),
    StructField("rev", LongType)))
  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("bk", StringType), StructField("rev", LongType),
    StructField("band_bucket", LongType)))
  private val revSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("rev", LongType),
    StructField("e", LongType)))

  private def readOr(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    IndexIo.readOr(spark, path, schema)

  /** Revision registry `(doc_id, rev)` — one row per [[upsert]] of a
    * doc; a doc's CURRENT revision is its max. Absent (reads empty)
    * until the first upsert. */
  private[scale] def revisions(spark: SparkSession, dir: String): DataFrame =
    readOr(spark, s"$dir/_lsh_rev", revSchema)

  private def currentRevs(spark: SparkSession, dir: String): DataFrame =
    revisions(spark, dir).groupBy(col("doc_id"))
      .agg(max(col("rev")).as("cur_rev"))

  /** Compaction-need probe ([[IndexIo.compactionStats]]): band files
    * per bucket dir (append decay) and rev/tombstone bytes vs the
    * band tree (CDC decay). Listing-only cost. */
  def compactionStats(spark: SparkSession,
      dir: String): IndexIo.CompactionStats =
    IndexIo.compactionStats(spark, s"$dir/bands",
      Seq(s"$dir/_lsh_rev", s"$dir/_lsh_tombstones"))

  /** The decision [[compactionStats]] exists to make: time to
    * [[compactTo]]? */
  def needsCompaction(spark: SparkSession, dir: String,
      maxFilesPerBucket: Double = 8.0,
      maxCdcFraction: Double = 0.2): Boolean =
    compactionStats(spark, dir)
      .needsCompaction(maxFilesPerBucket, maxCdcFraction)

  /** Keep only each doc's CURRENT generation of rows: never-revised
    * docs keep their rev-null build/append rows; revised docs keep
    * exactly the rows stamped with their max revision (their original
    * rev-null rows and any superseded revision rows become invisible).
    * `revs` is O(revised docs) — broadcast-hinted only while its size
    * estimate stays under the auto-broadcast threshold
    * ([[IndexIo.maybeBroadcast]]: between compactions the registry
    * grows without bound, and a forced hint would OOM before the
    * compaction discipline folds it). */
  private def currentOnly(rows: DataFrame, revs: DataFrame): DataFrame =
    rows.join(IndexIo.maybeBroadcast(revs), Seq("doc_id"), "left")
      .filter((col("cur_rev").isNull && col("rev").isNull) ||
        col("rev") === col("cur_rev"))
      .drop("cur_rev")

  private def writeParts(docs: DataFrame, dir: String, mode: String,
      n: Int, numHashes: Int, bands: Int): Unit = {
    val sig = signatures(docs, n, numHashes).localCheckpoint()
    // bands BEFORE sigs: the append healer anti-joins sigs, so sigs
    // landing means the batch's bands landed too (see the write
    // protocol in the class doc). Only REAL signatures are banded — a
    // placeholder's empty band slice would serialize to bk="" and
    // alias every short doc into one candidate bucket.
    banded(sig, bands, numHashes / bands)
      .repartition(col("band_bucket"))
      .sortWithinPartitions(col("band"), col("bk"))
      .write.partitionBy("band_bucket").mode(mode).parquet(s"$dir/bands")
    // Docs with fewer than n tokens have no shingles — they can never
    // match anything — but their ids ARE committed to `_lsh_docs`, so
    // without a sig row of their own every such doc (a) makes
    // [[consistent]]'s id-vs-sig probe permanently false on a HEALTHY
    // index, indistinguishable from the gone-batch tear, and (b) stays
    // "fresh" in [[append]]'s sigs anti-join forever, so batch replays
    // re-append empty part files and the meta-heal no-op branch is
    // unreachable (round-14 advice item 1). An empty signature array
    // keeps sigs 1:1 with committed ids; verification is unaffected
    // (no band rows → never a candidate; zip_with over [] counts 0).
    val placeholder = docs.select(col("doc_id"))
      .join(sig.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("sig", array().cast("array<long>"))
    sig.unionByName(placeholder).write.mode(mode).parquet(s"$dir/sigs")
  }

  private def writeMeta(spark: SparkSession, dir: String, nDocs: Long,
      n: Int, numHashes: Int, bands: Int): Unit =
    spark.range(1)
      .select(lit(nDocs).as("n_docs"), lit(n).as("n"),
        lit(numHashes).as("num_hashes"), lit(bands).as("bands"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_lsh_meta")

  def build(docs: DataFrame, dir: String, n: Int = 5, numHashes: Int = 16,
      bands: Int = 4): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val ids = docs.select(col("doc_id")).localCheckpoint()
    ids.withColumn("e", lit(0L))
      .write.mode("overwrite").parquet(s"$dir/_lsh_docs")
    writeParts(docs, dir, "overwrite", n, numHashes, bands)
    // An in-place rebuild is the documented torn-append recovery; a dir
    // that previously saw delete() still holds `_lsh_tombstones`, and
    // inheriting it would silently hide live docs from every probe
    // whenever the rebuilt corpus reuses doc ids (round-14 advice
    // item 2 — the CitationIndex.build delete-era reset pattern). The
    // revision registry carries the same hazard: stale (doc_id, rev)
    // rows would hide the rebuild's rev-null rows of those docs.
    val spark = docs.sparkSession
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docIdSchema)
      .write.mode("overwrite").parquet(s"$dir/_lsh_tombstones")
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], revSchema)
      .write.mode("overwrite").parquet(s"$dir/_lsh_rev")
    writeMeta(spark, dir, ids.count(), n, numHashes, bands)
  }

  /** O(batch) growth, self-healing under replay (class-doc protocol):
    * the id write anti-joins `_lsh_docs`, the data writes anti-join
    * `sigs`, so a crash anywhere inside a previous append of the SAME
    * batch is repaired by calling append again; meta is rewritten LAST
    * from a recount of `_lsh_docs` (never stale-meta arithmetic). A
    * fully-committed re-append is a complete no-op. */
  def append(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val meta = spark.read.parquet(s"$dir/_lsh_meta").collect()(0)
    val (n, numHashes, bands) = (meta.getInt(1), meta.getInt(2),
      meta.getInt(3))
    val committed = readOr(spark, s"$dir/_lsh_docs", docIdSchema)
    val freshIds = docs.select(col("doc_id"))
      .join(committed.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val signed = readOr(spark, s"$dir/sigs", sigSchema).select(col("doc_id"))
    val freshData = docs.join(signed, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (freshIds.count() == 0L && freshData.count() == 0L) {
      // Third tear window: a prior append of this batch died AFTER the
      // sigs write but BEFORE meta — all data landed, only the commit
      // point is stale. Refresh meta iff it disagrees with the
      // committed-id count; a fully-committed re-append stays a no-op.
      val total = readOr(spark, s"$dir/_lsh_docs", docIdSchema).count()
      if (meta.getLong(0) != total)
        writeMeta(spark, dir, total, n, numHashes, bands)
      return
    }
    if (freshIds.count() > 0L)
      freshIds.withColumn("e", lit(nextEpoch(spark, dir)))
        .write.mode("append").parquet(s"$dir/_lsh_docs")
    if (freshData.count() > 0L)
      writeParts(freshData, dir, "append", n, numHashes, bands)
    val total = readOr(spark, s"$dir/_lsh_docs", docIdSchema).count()
    writeMeta(spark, dir, total, n, numHashes, bands)
  }

  /** Document REVISION — the CDC verb the lifecycle lacked (build/
    * append/probe/delete/compact all treat content as immutable, and
    * re-admitting a changed document previously required a full
    * compaction): re-signature already-committed docs against their
    * NEW text in place. New rows (sigs and bands) are stamped with
    * `rev`; the `_lsh_rev` registry records (doc_id, rev); every probe
    * filters to each doc's current generation ([[currentOnly]] — a
    * broadcast join against the O(revised docs) registry), so a
    * revised doc's stale signature stops matching the moment the
    * registry row commits, and `upsert(X, rev) ≡ rebuild with X's new
    * text` is oracle-provable (q156). Ids never change: `_lsh_docs`,
    * meta, and tombstones are untouched — a tombstoned doc cannot be
    * revived by upsert (same contract as append), and docs in the
    * batch that are NOT yet committed are ignored (append them first;
    * keeping the verbs orthogonal keeps each one's crash story small).
    *
    * `rev` is CALLER-SUPPLIED and monotone (a crawl epoch, an ingest
    * sequence number): replaying the same (batch, rev) is a no-op at
    * every tear point — data writes anti-join existing (doc_id, rev)
    * sig rows, the registry write anti-joins existing registry rows —
    * and a LOWER-than-current rev is rejected loudly rather than
    * silently serving the older generation. Write order: bands → sigs
    * → registry LAST as the visibility point (probes keep serving the
    * previous generation until the registry row lands; superseded
    * rows are reclaimed by [[compactTo]]). */
  def upsert(docs: DataFrame, dir: String, rev: Long): Unit = {
    require(rev > 0L, "revision must be positive")
    val spark = docs.sparkSession
    val meta = spark.read.parquet(s"$dir/_lsh_meta").collect()(0)
    val (n, numHashes, bands) = (meta.getInt(1), meta.getInt(2),
      meta.getInt(3))
    val committed = readOr(spark, s"$dir/_lsh_docs", docIdSchema)
    val revised = docs
      .join(committed.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .join(tombstones(spark, dir), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (revised.isEmpty) return
    val stale = currentRevs(spark, dir)
      .join(revised.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .filter(col("cur_rev") > lit(rev)).count()
    require(stale == 0L,
      s"upsert rev=$rev is older than the current revision of $stale " +
        "docs — revisions must be monotone per doc")
    // heal guard: rows of THIS (doc, rev) that already landed
    val landed = readOr(spark, s"$dir/sigs", sigSchema)
      .filter(col("rev") === rev).select(col("doc_id"))
    val fresh = revised.join(landed, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (fresh.count() > 0L) {
      val sig = signatures(fresh, n, numHashes).localCheckpoint()
      banded(sig, bands, numHashes / bands)
        .withColumn("rev", lit(rev))
        .repartition(col("band_bucket"))
        .sortWithinPartitions(col("band"), col("bk"))
        .write.partitionBy("band_bucket").mode("append")
        .parquet(s"$dir/bands")
      val placeholder = fresh.select(col("doc_id"))
        .join(sig.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .withColumn("sig", array().cast("array<long>"))
      sig.unionByName(placeholder).withColumn("rev", lit(rev))
        .write.mode("append").parquet(s"$dir/sigs")
    }
    // visibility point: the registry row flips probes to the new
    // generation; replays skip rows already present
    val freshReg = revised.select(col("doc_id"), lit(rev).as("rev"))
      .join(revisions(spark, dir).filter(col("rev") === rev),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (freshReg.count() > 0L)
      freshReg.withColumn("e", lit(nextEpoch(spark, dir)))
        .write.mode("append").parquet(s"$dir/_lsh_rev")
  }

  /** Torn-append detector, two-sided. Under the docs → bands → sigs →
    * meta write order an interrupted [[append]] prefix leaves EITHER
    * (a) meta behind the committed-id count (crash before meta), or
    * (b) committed ids with no signatures (crash after the id write,
    * batch never replayed — the "gone batch" tear). (a) alone is not
    * enough: a LATER append of a different batch recounts `_lsh_docs`
    * into fresh meta, which would launder (b) invisible while those
    * orphaned ids silently never match in [[dedupBatch]]. So this also
    * checks the id count against the signature-side doc count (sigs
    * never double-insert — the append anti-join — so a plain distinct
    * count is exact). Two narrow counts, no signature-array scan.
    * Recovery for (a)/partial data: re-run [[append]] with the same
    * batch (class-doc protocol); recovery for (b) needs the batch
    * replayed or a rebuild. */
  def consistent(spark: SparkSession, dir: String): Boolean = {
    val st = spark.read.parquet(s"$dir/_lsh_meta")
      .select(col("n_docs")).collect()(0).getLong(0)
    val ids = readOr(spark, s"$dir/_lsh_docs", docIdSchema)
    val nIds = ids.count()
    val nSigs = readOr(spark, s"$dir/sigs", sigSchema)
      .select(col("doc_id")).distinct().count()
    // tombstones must reference committed docs only — an orphaned
    // tombstone means a delete raced a compaction swap
    val orphanDead = tombstones(spark, dir)
      .join(ids, Seq("doc_id"), "left_anti").count()
    // revision registry rows must reference committed docs, and every
    // registered (doc, rev) must have its sig rows landed (the upsert
    // registry is the visibility point — rows without data mean the
    // bands→sigs→registry order was violated or files were lost)
    val revs = revisions(spark, dir)
    val orphanRev = revs.join(ids, Seq("doc_id"), "left_anti").count()
    val dataless = revs.join(
      readOr(spark, s"$dir/sigs", sigSchema)
        .select(col("doc_id"), col("rev")).na.drop(),
      Seq("doc_id", "rev"), "left_anti").count()
    st == nIds && nIds == nSigs && orphanDead == 0L &&
      orphanRev == 0L && dataless == 0L
  }

  /** Tombstone table (doc_id) — absent until the first [[delete]].
    * Reads as empty when missing so every pre-tombstone index keeps
    * working unchanged. */
  private[scale] def tombstones(spark: SparkSession, dir: String): DataFrame =
    readOr(spark, s"$dir/_lsh_tombstones", docIdSchema)

  /** Committed docs whose per-doc commit point (the sig row — append's
    * LAST data write) has landed: a torn append's id residue never
    * appears here, so snapshots cannot see half-written docs. */
  private def committedDocs(spark: SparkSession, dir: String): DataFrame =
    readOr(spark, s"$dir/_lsh_docs", docIdSchema)
      .join(readOr(spark, s"$dir/sigs", sigSchema)
        .select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")

  /** The committed snapshot counter ([[CitationIndex.committedEpoch]]'s
    * contract on this index): max epoch across sig-confirmed doc rows,
    * tombstones, and the revision registry. 0 right after [[build]]
    * (legacy rows read as epoch 0); −1 on a cold dir. */
  def committedEpoch(spark: SparkSession, dir: String): Long = {
    val es = committedDocs(spark, dir).select(col("e"))
      .unionByName(tombstones(spark, dir).select(col("e")))
      .unionByName(revisions(spark, dir).select(col("e")))
    val r = es.agg(max(coalesce(col("e"), lit(0L)))).collect()(0)
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  /** Epoch a mutating verb stamps its rows with. NOT
    * [[committedEpoch]] + 1 (round-15 advice item 2): that counter
    * deliberately ignores sig-UNCONFIRMED id rows (torn-append
    * residue), so allocating from it would hand the residue's epoch
    * number to the NEXT verb — and a replay that later completes the
    * residue's sigs would make those docs visible at an epoch a
    * DIFFERENT verb committed. Allocating past the max epoch stamped
    * on the RAW tables (confirmed or not) keeps every residue epoch
    * its own: after a heal, the residue serves from its original
    * stamp, never inside another verb's snapshot. */
  private def nextEpoch(spark: SparkSession, dir: String): Long = {
    val es = readOr(spark, s"$dir/_lsh_docs", docIdSchema).select(col("e"))
      .unionByName(tombstones(spark, dir).select(col("e")))
      .unionByName(revisions(spark, dir).select(col("e")))
    val r = es.agg(max(coalesce(col("e"), lit(0L)))).collect()(0)
    (if (r.isNullAt(0)) -1L else r.getLong(0)) + 1L
  }

  /** SNAPSHOT near-dup probe — [[dedupBatch]] exactly as the index
    * stood when epoch `asOf` committed: the reproducible-training read
    * "which of these documents were near-dups of the corpus AT
    * snapshot E". Corpus docs gate by their sig-confirmed commit epoch
    * (later appends invisible), generations by the registry rows at
    * ≤ asOf (later revisions serve their OLD signatures), deletions by
    * the tombstone rows at ≤ asOf (later take-downs still serve).
    * Serving history costs three narrow epoch filters; [[compactTo]]
    * is the vacuum (survivors re-base to epoch 0). Valid for any
    * 0 ≤ asOf ≤ [[committedEpoch]]. */
  def dedupBatchAsOf(spark: SparkSession, dir: String, batch: DataFrame,
      minMatches: Int, asOf: Long): DataFrame = {
    // ONE materialization of the sig-confirmed doc registry (r20
    // optimization): committedEpoch used to re-derive committedDocs
    // (an _lsh_docs read + sigs semi-join) for the require alone, and
    // docsAt derived it AGAIN for the snapshot gate — two identical
    // control-plane jobs per probe. Checkpoint it once; the counter
    // aggregate and the ≤asOf membership filter both read the
    // materialized blocks. Same gating semantics bit for bit
    // (LshAsOfSpec + the q179 oracle pin it).
    val cd = committedDocs(spark, dir).localCheckpoint()
    val ceRow = cd.select(col("e"))
      .unionByName(tombstones(spark, dir).select(col("e")))
      .unionByName(revisions(spark, dir).select(col("e")))
      .agg(max(coalesce(col("e"), lit(0L)))).collect()(0)
    val ce = if (ceRow.isNullAt(0)) -1L else ceRow.getLong(0)
    require(asOf >= 0L && asOf <= ce,
      s"as-of epoch $asOf outside the committed history [0, $ce]" +
        (if (ce < 0L) " — cold index, nothing committed" else ""))
    val meta = spark.read.parquet(s"$dir/_lsh_meta").collect()(0)
    val (n, numHashes, bands) = (meta.getInt(1), meta.getInt(2),
      meta.getInt(3))
    val docsAt = cd
      .filter(coalesce(col("e"), lit(0L)) <= asOf)
      .select(col("doc_id"))
    val probe = batch.join(docsAt, Seq("doc_id"), "left_anti")
    val sig = signatures(probe, n, numHashes).localCheckpoint()
    val bk = banded(sig, bands, numHashes / bands).localCheckpoint()
    val buckets = bk.select(col("band_bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val revsAt = revisions(spark, dir)
      .filter(coalesce(col("e"), lit(0L)) <= asOf)
      .groupBy(col("doc_id")).agg(max(col("rev")).as("cur_rev"))
      .localCheckpoint()
    val idx = currentOnly(readOr(spark, s"$dir/bands", bandSchema)
        .filter(col("band_bucket").isin(buckets: _*)), revsAt)
      .join(docsAt, Seq("doc_id"), "left_semi")
    val cand = idx.as("c").join(bk.as("q"),
        col("c.band") === col("q.band") && col("c.bk") === col("q.bk"))
      .select(col("q.doc_id").as("new_doc"), col("c.doc_id").as("corpus_doc"))
      .distinct()
    val corpusSig = currentOnly(readOr(spark, s"$dir/sigs", sigSchema), revsAt)
      .join(docsAt, Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("corpus_doc"), col("sig").as("sig_c"))
    val batchSig = sig.select(col("doc_id").as("new_doc"),
      col("sig").as("sig_q"))
    val dead = tombstones(spark, dir)
      .filter(coalesce(col("e"), lit(0L)) <= asOf)
      .select(col("doc_id").as("corpus_doc"))
    cand.join(dead, Seq("corpus_doc"), "left_anti")
      .join(batchSig, "new_doc").join(corpusSig, "corpus_doc")
      .select(col("new_doc"), col("corpus_doc"),
        size(filter(zip_with(col("sig_q"), col("sig_c"), (x, y) => x === y),
          b => b)).cast("long").as("matches"))
      .filter(col("matches") >= minMatches)
  }

  /** Tombstone delete — the takedown/right-to-be-forgotten path the
    * append-only contract lacked: the doc's physical rows stay until
    * [[compactTo]] folds them, but every probe excludes it NOW (the
    * [[dedupBatch]] anti-join), so `delete(X)` followed by a probe is
    * result-identical to an index built without X (LshIndexSpec pins
    * the equivalence). Only committed, not-yet-tombstoned ids are
    * recorded — deleting an unknown id is a no-op and replaying a
    * delete is idempotent (the append self-heal discipline). A
    * tombstoned id stays excluded until compaction; re-admitting a
    * document after takedown means compacting first (the id leaves
    * `_lsh_docs`) and appending fresh — silent resurrection via append
    * is impossible because append skips committed ids. */
  def delete(docIds: DataFrame, dir: String): Unit = {
    val spark = docIds.sparkSession
    val committed = readOr(spark, s"$dir/_lsh_docs", docIdSchema)
    val fresh = docIds.select(col("doc_id")).distinct()
      .join(committed.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .join(tombstones(spark, dir), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (fresh.count() > 0L)
      fresh.withColumn("e", lit(nextEpoch(spark, dir)))
        .write.mode("append").parquet(s"$dir/_lsh_tombstones")
  }

  /** Copy-compaction: every [[append]] adds small files to sigs/ and
    * the band partition dirs (the classic many-small-files decay of an
    * append-friendly layout); this rewrites the WHOLE index into
    * `destDir` with one file per band bucket and a consolidated sigs/
    * — identical contents, fresh file geometry. Compacting into a NEW
    * dir instead of in place is the crash-safety choice: a death
    * mid-compaction leaves `destDir` torn (detectable — its meta is
    * written LAST, the [[build]] commit-point order) and the source
    * index untouched; the caller swaps directories only after
    * [[consistent]] passes on the destination. Cost is one full index
    * scan + one bucket shuffle — index-sized, never corpus-sized. */
  def compactTo(spark: SparkSession, dir: String, destDir: String): Unit = {
    val meta = spark.read.parquet(s"$dir/_lsh_meta").collect()(0)
    // tombstones FOLD here: deleted docs' rows are physically dropped
    // from every table and the destination starts tombstone-free —
    // compaction is the only operation that reclaims deleted ids
    val dead = tombstones(spark, dir).localCheckpoint()
    val docs = readOr(spark, s"$dir/_lsh_docs", docIdSchema)
      .join(dead, Seq("doc_id"), "left_anti").localCheckpoint()
    // the fold is the history vacuum (ClusterStore.compactTo's
    // bargain): every surviving doc re-bases to epoch 0
    docs.select(col("doc_id"), lit(0L).as("e")).coalesce(1)
      .write.mode("overwrite").parquet(s"$destDir/_lsh_docs")
    // revisions FOLD too: only each doc's current generation survives,
    // written rev-less (the fresh-build form), and the destination's
    // registry resets — compaction is what reclaims superseded rows
    val revs = currentRevs(spark, dir).localCheckpoint()
    currentOnly(readOr(spark, s"$dir/sigs", sigSchema), revs)
      .join(dead, Seq("doc_id"), "left_anti")
      .drop("rev").coalesce(1)
      .write.mode("overwrite").parquet(s"$destDir/sigs")
    currentOnly(readOr(spark, s"$dir/bands", bandSchema), revs)
      .join(dead, Seq("doc_id"), "left_anti")
      .drop("rev")
      .repartition(col("band_bucket"))
      .sortWithinPartitions(col("band"), col("bk"))
      .write.partitionBy("band_bucket").mode("overwrite")
      .parquet(s"$destDir/bands")
    // "the destination starts tombstone-free" must hold even when
    // destDir is a recycled dir (e.g. ping-pong compaction between two
    // fixed paths) — same inherited-tombstone hazard as build()
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docIdSchema)
      .write.mode("overwrite").parquet(s"$destDir/_lsh_tombstones")
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], revSchema)
      .write.mode("overwrite").parquet(s"$destDir/_lsh_rev")
    writeMeta(spark, destDir, docs.count(), meta.getInt(1),
      meta.getInt(2), meta.getInt(3))
  }

  private val feedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("change", StringType),
    StructField("rev", LongType), StructField("e", LongType)))

  /** CHANGE DATA FEED — [[ClusterStore.emitChangeFeed]]'s contract on
    * the LSH index: persist each committed epoch's id-level delta to
    * `feedDir/e=N` as (doc_id, change ∈ inserted/revised/deleted,
    * rev), at O(affected) cost per epoch — exactly the rows the
    * epoch's verb committed, derived POST-HOC from the epoch stamps.
    * Inserts additionally confirm their per-doc commit point (the sig
    * row), so a torn append's id residue emits an EMPTY delta until
    * its replay heals it (re-derive by deleting that epoch's feed
    * dir). Each dir is an idempotent overwrite gated on `_SUCCESS`; a
    * crash between an index commit and its feed write leaves no hole
    * — the next call re-derives the missing epochs. Restore contract
    * (spec-pinned): baseline membership/revision state + replayed
    * deltas ≡ the as-of state at the last emitted epoch. Feeds for
    * epochs folded away by [[compactTo]] cannot be derived after the
    * fold — emit before compacting. */
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
    val confirmed = committedDocs(spark, dir).localCheckpoint()
    (from to committed).foreach { n =>
      val ins = confirmed
        .filter(coalesce(col("e"), lit(0L)) === n)
        .select(col("doc_id"), lit("inserted").as("change"),
          lit(null).cast("long").as("rev"))
      val rev = revisions(spark, dir)
        .filter(coalesce(col("e"), lit(0L)) === n)
        .select(col("doc_id"), lit("revised").as("change"), col("rev"))
      val del = tombstones(spark, dir)
        .filter(coalesce(col("e"), lit(0L)) === n)
        .select(col("doc_id"), lit("deleted").as("change"),
          lit(null).cast("long").as("rev"))
      ins.unionByName(rev).unionByName(del).coalesce(1)
        .write.mode("overwrite").parquet(s"$feedDir/e=$n")
    }
  }

  /** Read the feed (all epochs; filter `e` for a window). */
  def changeFeed(spark: SparkSession, feedDir: String): DataFrame =
    IndexIo.readOr(spark, feedDir, feedSchema)

  /** Batch-vs-corpus near-dup probe: which of `batch`'s documents are
    * near-duplicates of ALREADY-INDEXED documents. Returns
    * `(new_doc, corpus_doc, matches)` for every cross pair agreeing on
    * ≥ minMatches of the stored signature components. Batch-internal
    * pairs are out of scope (that is the in-memory
    * [[Dedup.minhashLshPairsPortable]] on the batch alone); docs whose
    * ids are already committed are excluded from the probe side —
    * re-probing the corpus with itself would report every doc as its
    * own neighbor's dup. */
  def dedupBatch(spark: SparkSession, dir: String, batch: DataFrame,
      minMatches: Int): DataFrame = {
    val meta = spark.read.parquet(s"$dir/_lsh_meta").collect()(0)
    val (n, numHashes, bands) = (meta.getInt(1), meta.getInt(2),
      meta.getInt(3))
    val committed = readOr(spark, s"$dir/_lsh_docs", docIdSchema)
    val probe = batch.join(committed.select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    val sig = signatures(probe, n, numHashes).localCheckpoint()
    val bk = banded(sig, bands, numHashes / bands).localCheckpoint()
    // control-plane: ≤ Buckets distinct partition ids whatever |batch|
    val buckets = bk.select(col("band_bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq
    // revised docs serve their CURRENT generation only: stale band
    // rows must not generate candidates (they would over-recall vs an
    // index built from the current texts) and stale signatures must
    // not verify — both filters are one broadcast join against the
    // O(revised docs) registry
    val revs = currentRevs(spark, dir).localCheckpoint()
    val idx = currentOnly(readOr(spark, s"$dir/bands", bandSchema)
      .filter(col("band_bucket").isin(buckets: _*)), revs)
    val cand = idx.as("c").join(bk.as("q"),
        col("c.band") === col("q.band") && col("c.bk") === col("q.bk"))
      .select(col("q.doc_id").as("new_doc"), col("c.doc_id").as("corpus_doc"))
      .distinct()
    val corpusSig = currentOnly(readOr(spark, s"$dir/sigs", sigSchema), revs)
      .select(col("doc_id").as("corpus_doc"), col("sig").as("sig_c"))
    val batchSig = sig.select(col("doc_id").as("new_doc"),
      col("sig").as("sig_q"))
    // tombstoned corpus docs are invisible to probes the moment
    // delete() commits — physical rows wait for compactTo
    val dead = tombstones(spark, dir)
      .select(col("doc_id").as("corpus_doc"))
    cand.join(dead, Seq("corpus_doc"), "left_anti")
      .join(batchSig, "new_doc").join(corpusSig, "corpus_doc")
      .select(col("new_doc"), col("corpus_doc"),
        size(filter(zip_with(col("sig_q"), col("sig_c"), (x, y) => x === y),
          b => b)).cast("long").as("matches"))
      .filter(col("matches") >= minMatches)
  }
}
