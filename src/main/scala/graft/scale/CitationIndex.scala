package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained citation edges — the "index, don't
  * recompute" move for the graft family's INPUT. Every graph query
  * reads [[Graph.citationEdges]]-shaped edges; today those rebuild
  * from scratch whenever the corpus changes, and at 100 TB the
  * re-tokenize + re-self-join per ingest is the cost the LSH/BM/IVF
  * indexes already refuse to pay on their sides. This index persists
  * the posting and edge-support state once, grows O(batch) per
  * append, shrinks O(batch) per [[delete]], and stays EXACTLY equal
  * to a from-scratch derivation on the current committed-minus-
  * deleted corpus (CitationIndexSpec pins the equality through
  * band-entering, band-leaving, band-falling and band-reviving
  * transitions).
  *
  * Why incremental df-band maintenance is subtle, and why it is
  * possible: an edge exists between two docs sharing an n-gram whose
  * document frequency lies in [dfMin, dfMax]. Appending documents
  * moves df up — a term below dfMin may ENTER the band (edges appear
  * among ALL its docs, old ones included) and a band term may EXCEED
  * dfMax (every edge it supported must vanish). Deleting documents
  * moves df DOWN, which breaks the append-only world's one comfort —
  * df monotonicity — in both directions: a band term may fall below
  * dfMin (its edges must vanish while its support rows persist), and
  * a term past dfMax may fall BACK into the band (its edges must
  * appear among the surviving docs). Three structural choices make
  * all four transitions maintainable without corpus-wide recompute:
  *
  *  1. TIERED POSTING RETENTION. `post/` keeps postings for every
  *     term with df ≤ dfMax + slack — the band, the below-band tail,
  *     and the PURGATORY tier (dfMax, dfMax+slack]. `slack` is the
  *     revival budget: a term can only fall back into the band if
  *     deletes remove ≥ df − dfMax of its docs, so any term a
  *     realistic delete wave could revive still has its postings,
  *     and revival regenerates its surviving pairs exactly. Terms
  *     past dfMax + slack ("deep" — the stopword mass whose posting
  *     lists are exactly what the band design refuses to store) drop
  *     their postings, and instead carry an EXACT df counter
  *     (`deep_df/`, signed keyed deltas): a delete that would pull a
  *     deep term to df ≤ dfMax is DETECTED and refused loudly
  *     (rebuild/compact required) rather than silently missing the
  *     revived edges. With slack ≥ the tombstone count the refusal is
  *     unreachable by arithmetic (hits ≤ tombstones ≤ slack < df − dfMax).
  *  2. PER-TERM SUPPORT ROWS. `pairs/` stores (src, dst, term)
  *     SUPPORT rows, not collapsed edges, so membership churn is a
  *     read-side filter: dead terms (df > dfMax now), sub terms
  *     (fell below dfMin via deletes, stale pairs on disk), and
  *     tombstoned endpoints are each one anti-join; the weighted edge
  *     (`w` = countDistinct(term)) falls out of the same table.
  *  3. SIGNED KEYED DELTAS for non-monotone state. Dead status and
  *     sub status change direction over time, so `dead_terms/` and
  *     `sub_terms/` hold (term, k, s = ±1) rows and `deep_df/` holds
  *     (term, k, d) count deltas, with k a deterministic per-batch
  *     key (min doc id + an id-set content hash — replays reproduce
  *     it, distinct batches never collide). Current status = sign of the
  *     per-term sum. Replay-healing is an anti-join on (term, k):
  *     a crashed batch's recompute is deterministic, so re-inserting
  *     is exactly the rows the tear lost.
  *
  * Layout under `dir`:
  * {{{
  *   post/tb=N/…      (term, doc_id) for every term with df ≤
  *                    dfMax + slack; md5-bucketed so append/delete
  *                    reads prune to the batch's term buckets
  *   pairs/…          (src, dst, term) edge-support rows (src > dst —
  *                    newer cites older); stale rows are filtered at
  *                    read and folded at compaction
  *   dead_terms/…     (term, k, s): signed deltas; dead now ⇔ Σs > 0
  *   sub_terms/…      (term, k, s): signed deltas; sub now ⇔ Σs > 0
  *                    (band-era pairs exist but df fell below dfMin)
  *   deep_terms/…     terms that crossed dfMax + slack (postings
  *                    dropped; terminal under appends, guarded by
  *                    deep_df under deletes)
  *   deep_df/…        (term, k, d): exact df deltas for deep terms
  *   _cit_tombs/…     tombstoned doc ids — appended LAST by delete
  *   _cit_rev/…       (doc_id, rev) revision registry — appended LAST
  *                    by [[upsert]]; a doc's current generation is its
  *                    max rev (0 = never revised), and postings/pairs
  *                    carry generation stamps matched against it at
  *                    read ([[compactTo]] folds superseded generations
  *                    and resets it)
  *   _cit_meta/…      one row: (n, df_min, df_max, slack)
  *   _cit_docs/…      committed doc ids — appended LAST by append
  * }}}
  *
  * Write protocol (single-writer): append writes post → pairs → dead
  * → deep_df → deep_terms → sub → docs LAST; delete writes deep_df →
  * dead → sub → pairs → tombs LAST. Both are SELF-HEALING under
  * replay: the batch anti-joins its commit table first (docs for
  * append, tombs for delete), so a fully-committed re-run is a no-op;
  * a torn run leaves the batch fresh, the replay recomputes the batch
  * state deterministically (classification runs against survivor
  * postings that exclude the batch's own ids — for delete, the
  * replay also excludes its own key's delta rows before reading
  * deep_df, so a torn decrement cannot double-count), delta writes
  * anti-join (term, k), posting writes anti-join existing (term,
  * doc_id) rows, and duplicated pair support rows are BENIGN
  * (countDistinct at read, folded by [[compactTo]]).
  *
  * A tombstoned doc id cannot be re-appended (it stays in _cit_docs
  * until compaction folds it out); re-ingest after takedown is a
  * compact-then-append.
  *
  * Scale shape: append/delete compute O(batch postings); index reads
  * are bucket-pruned to the batch's terms; pair generation joins only
  * the touched terms' posting lists, each ≤ dfMax (+slack for the
  * purgatory recount) rows. Read-side filters are the dead/sub delta
  * sums (O(churned terms)) and two tombstone anti-joins (O(deleted
  * docs)) — nothing corpus-wide anywhere. The storage trade is
  * explicit: purgatory retention costs the postings of terms with
  * df ≤ dfMax + slack, i.e. the revival budget is paid in storage,
  * never in recompute.
  */
object CitationIndex {

  val Buckets = 64L

  private def md5_64(c: Column) = graft.functions.Md5_64.md5_64(c)

  /** Order-independent 64-bit content hash of a batch's distinct id
    * set (xor-fold of per-id xxhash64) — the collision term in the
    * batch-key grammar (round-15 advice item 3). Deterministic per id
    * SET, so a replay of the same batch reproduces the key and its
    * (term, k) anti-joins heal; two DIFFERENT batches sharing a min id
    * no longer share a key, so a torn batch's residue rows can never
    * gate in under a later batch's commit. */
  private def idSetHash(ids: DataFrame): String = {
    val r = ids.agg(expr("bit_xor(xxhash64(doc_id))")).collect()(0)
    java.lang.Long.toHexString(if (r.isNullAt(0)) 0L else r.getLong(0))
  }

  private def withBucket(post: DataFrame): DataFrame =
    post.withColumn("tb", pmod(md5_64(col("term")), lit(Buckets)))

  private def writeMeta(spark: SparkSession, dir: String, n: Int,
      dfMin: Long, dfMax: Long, slack: Long): Unit =
    spark.range(1)
      .select(lit(n).as("n"), lit(dfMin).as("df_min"),
        lit(dfMax).as("df_max"), lit(slack).as("slack"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_cit_meta")

  /** (n, dfMin, dfMax, slack); slack defaults to 0 for indexes
    * written before the delete tier existed. */
  private def readMeta(spark: SparkSession, dir: String): (Int, Long, Long, Long) = {
    val df = spark.read.parquet(s"$dir/_cit_meta")
    val hasSlack = df.schema.fieldNames.contains("slack")
    val r = df.collect()(0)
    (r.getInt(0), r.getLong(1), r.getLong(2),
      if (hasSlack) r.getAs[Long]("slack") else 0L)
  }

  private def exists(spark: SparkSession, path: String): Boolean =
    IndexIo.exists(spark, path)

  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

  // `bk` = writing batch's key ("b" for build/compact, append's
  // "a<minid>", delete's "d<minid>", upsert's "u<minid>.<rev>") on
  // every non-commit row; `e` = commit epoch on the three COMMIT
  // tables only (docs, tombs, rev). Together they are the snapshot
  // machinery: a row serves as-of epoch E iff its batch's commit row
  // landed at epoch ≤ E — exact under torn writes (residue's commit
  // row never lands at its own epoch) and under interleaved replays
  // (the batch's rows keep their bk; only the commit row's e counts).
  // Legacy files read null bk → "b" (pre-snapshot history = epoch 0)
  // and null e → 0.
  private val postSchema = StructType(Seq(
    StructField("term", StringType), StructField("doc_id", LongType),
    StructField("rev", LongType), StructField("bk", StringType),
    StructField("tb", LongType)))
  private val pairSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType),
    StructField("term", StringType),
    StructField("src_rev", LongType), StructField("dst_rev", LongType),
    StructField("bk", StringType)))
  private val revSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("rev", LongType),
    StructField("e", LongType), StructField("bk", StringType)))
  private val deltaSchema = StructType(Seq(
    StructField("term", StringType), StructField("k", StringType),
    StructField("s", LongType)))
  private val termSchema = StructType(Seq(StructField("term", StringType),
    StructField("bk", StringType)))
  private val docSchema = StructType(Seq(StructField("doc_id", LongType),
    StructField("e", LongType), StructField("bk", StringType)))

  private def readOr(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    IndexIo.readOr(spark, path, schema)

  /** Postings with their generation stamp — files written before the
    * revision verb existed lack the `rev` column and read as
    * generation 0 (the never-revised generation). */
  private def postRows(spark: SparkSession, dir: String): DataFrame =
    readOr(spark, s"$dir/post", postSchema)
      .withColumn("rev", coalesce(col("rev"), lit(0L)))

  /** Revision registry (doc_id, rev) — append-only; a doc's CURRENT
    * generation is its max registered rev, 0 if never revised. The
    * registry row is [[upsert]]'s commit point (written LAST). */
  private def revisions(spark: SparkSession, dir: String): DataFrame =
    readOr(spark, s"$dir/_cit_rev", revSchema)

  private def curRevs(spark: SparkSession, dir: String): DataFrame =
    revisions(spark, dir).groupBy(col("doc_id"))
      .agg(max(col("rev")).as("cur_rev"))

  /** Keep only each doc's CURRENT-generation rows of a rev-carrying
    * postings frame — one size-guarded join against the O(revised
    * docs) registry ([[IndexIo.maybeBroadcast]]: the registry grows
    * without bound between compactions, so the broadcast hint must
    * not be forced). The df recounts and pair regenerations in
    * append/delete/upsert all count a revised doc's postings exactly
    * once through this filter. */
  private def currentGen(rows: DataFrame, cr: DataFrame): DataFrame =
    rows.join(IndexIo.maybeBroadcast(cr), Seq("doc_id"), "left")
      .filter(col("rev") === coalesce(col("cur_rev"), lit(0L)))
      .drop("cur_rev")

  /** Signed (term, k, s) delta table reader; legacy plain-`term`
    * dead_terms files surface null k/s and read as one "b"/+1 row
    * (always-dead), preserving the pre-delete layout's meaning. */
  private def deltas(spark: SparkSession, dir: String, name: String): DataFrame =
    readOr(spark, s"$dir/$name", deltaSchema)
      .select(col("term"), coalesce(col("k"), lit("b")).as("k"),
        coalesce(col("s"), lit(1L)).as("s"))

  /** Terms whose signed delta sum is positive (current members). */
  private def nowSet(d: DataFrame): DataFrame =
    d.groupBy(col("term")).agg(sum(col("s")).as("s"))
      .filter(col("s") > 0).select(col("term"))

  private def deadNow(spark: SparkSession, dir: String): DataFrame =
    nowSet(deltas(spark, dir, "dead_terms"))

  private def subNow(spark: SparkSession, dir: String): DataFrame =
    nowSet(deltas(spark, dir, "sub_terms"))

  /** Terms whose postings are gone. Legacy pre-slack layouts (no
    * deep_terms table) dropped EVERY dead term's postings at write
    * time, so there the whole current dead set is deep — without this
    * fallback a delete on a legacy index would silently skip revival
    * instead of refusing loudly. */
  private def deepTerms(spark: SparkSession, dir: String): DataFrame =
    if (!exists(spark, s"$dir/deep_terms") && exists(spark, s"$dir/dead_terms"))
      deadNow(spark, dir)
    else readOr(spark, s"$dir/deep_terms", termSchema).select(col("term"))

  private def tombstones(spark: SparkSession, dir: String): DataFrame =
    readOr(spark, s"$dir/_cit_tombs", docSchema)

  /** Append delta rows healing replays: existing (term, k) rows win. */
  private def appendDeltas(spark: SparkSession, dir: String, name: String,
      rows: DataFrame): Unit = {
    val fresh = rows.join(
      readOr(spark, s"$dir/$name", deltaSchema).select(col("term"), col("k")),
      Seq("term", "k"), "left_anti")
    if (fresh.limit(1).count() > 0L)
      fresh.write.mode("append").parquet(s"$dir/$name")
  }

  /** All-pairs support rows for one side: (src, dst, term, src_rev,
    * dst_rev) with src > dst over the given rev-carrying postings. The
    * generation stamps ride into `pairs/` so a support row written
    * against generation g of an endpoint stops serving the moment a
    * later generation registers — the read filter is stamp equality
    * against the registry, never a rewrite of old rows. */
  private def pairsOf(a: DataFrame, b: DataFrame): DataFrame =
    a.as("a").join(b.as("b"),
        col("a.term") === col("b.term") &&
          col("a.doc_id") > col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"),
        col("a.term").as("term"), col("a.rev").as("src_rev"),
        col("b.rev").as("dst_rev"))

  /** `slack` sizes the purgatory tier (revival budget — see class
    * doc); slack = 0 reproduces the append-only layout exactly
    * (every dead term is deep, deletes that would revive refuse). */
  def build(docs: DataFrame, dir: String, n: Int = 3, dfMin: Long = 2,
      dfMax: Long = 4, slack: Long = 0L): Unit = {
    require(n >= 1 && dfMin >= 2 && dfMax >= dfMin && slack >= 0)
    val spark = docs.sparkSession
    writeMeta(spark, dir, n, dfMin, dfMax, slack)
    val post = Graph.allPostings(docs, n).localCheckpoint()
    val df = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val deep = df.filter(col("df") > dfMax + slack)
      .select(col("term"), col("df")).localCheckpoint()
    val retained = post.join(deep.select(col("term")), Seq("term"), "left_anti")
      .localCheckpoint()
    withBucket(retained.withColumn("bk", lit("b"))).repartition(col("tb"))
      .sortWithinPartitions(col("term"))
      .write.partitionBy("tb").mode("overwrite").parquet(s"$dir/post")
    val band = df.filter(col("df").between(dfMin, dfMax)).select(col("term"))
    val bp = retained.join(band, Seq("term"))
      .withColumn("rev", lit(0L)).localCheckpoint()
    pairsOf(bp, bp).withColumn("bk", lit("b"))
      .write.mode("overwrite").parquet(s"$dir/pairs")
    df.filter(col("df") > dfMax).select(col("term"))
      .select(col("term"), lit("b").as("k"), lit(1L).as("s"))
      .write.mode("overwrite").parquet(s"$dir/dead_terms")
    deep.select(col("term"), lit("b").as("bk"))
      .write.mode("overwrite").parquet(s"$dir/deep_terms")
    deep.select(col("term"), lit("b").as("k"), col("df").as("s"))
      .write.mode("overwrite").parquet(s"$dir/deep_df")
    // reset the delete-era tables too: an IN-PLACE rebuild (the remedy
    // the deep guard's error message recommends) must not inherit
    // stale tombstones or sub marks from the previous life of `dir`
    IndexIo.emptyFrame(spark, deltaSchema)
      .write.mode("overwrite").parquet(s"$dir/sub_terms")
    IndexIo.emptyFrame(spark, docSchema)
      .write.mode("overwrite").parquet(s"$dir/_cit_tombs")
    IndexIo.emptyFrame(spark, revSchema)
      .write.mode("overwrite").parquet(s"$dir/_cit_rev")
    docs.select(col("doc_id")).distinct().withColumn("e", lit(0L))
      .withColumn("bk", lit("b"))
      .write.mode("overwrite").parquet(s"$dir/_cit_docs")
  }

  /** The committed snapshot counter: max commit epoch across the three
    * commit tables (docs for appends, tombs for deletes, the registry
    * for upserts) — the handle a reproducible-training caller records
    * at ingest time to pin an [[edgesWeightedAsOf]] snapshot later.
    * 0 right after [[build]] (pre-snapshot/legacy rows read as epoch
    * 0); −1 on a cold dir. */
  def committedEpoch(spark: SparkSession, dir: String): Long = {
    val es = readOr(spark, s"$dir/_cit_docs", docSchema).select(col("e"))
      .unionByName(readOr(spark, s"$dir/_cit_tombs", docSchema)
        .select(col("e")))
      .unionByName(readOr(spark, s"$dir/_cit_rev", revSchema)
        .select(col("e")))
    val r = es.agg(max(coalesce(col("e"), lit(0L)))).collect()(0)
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  /** O(batch) growth, self-healing under replay — see the class-doc
    * protocol. */
  def append(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val (n, dfMin, dfMax, slack) = readMeta(spark, dir)
    val committed = readOr(spark, s"$dir/_cit_docs", docSchema)
    val fresh = docs.join(committed.select(col("doc_id")),
      Seq("doc_id"), "left_anti").localCheckpoint()
    if (fresh.count() == 0L) return
    val freshIds = fresh.select(col("doc_id")).distinct().localCheckpoint()
    val k = "a" + freshIds.agg(min(col("doc_id"))).collect()(0).getLong(0) +
      "." + idSetHash(freshIds)
    val deep = deepTerms(spark, dir).localCheckpoint()
    // deep terms: postings stopped — their df advances by counter
    val allB = Graph.allPostings(fresh, n).localCheckpoint()
    val deepHits = allB.join(deep, Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("s"))
      .select(col("term"), lit(k).as("k"), col("s")).localCheckpoint()
    // batch postings below the deep tier (purgatory stays current);
    // appended docs are generation 0 (never revised)
    val batchPost = allB.join(deep, Seq("term"), "left_anti")
      .withColumn("rev", lit(0L))
      .localCheckpoint()
    val batchTerms = batchPost.select(col("term")).distinct()
      .localCheckpoint()
    // control-plane: ≤ Buckets distinct partition ids whatever |batch|
    val buckets = withBucket(batchTerms).select(col("tb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val touched = postRows(spark, dir)
      .filter(col("tb").isin(buckets: _*))
      .join(batchTerms, Seq("term"))
      .select(col("term"), col("doc_id"), col("rev"))
      .localCheckpoint()
    // crash-residue split: dfBefore counts COMMITTED postings only —
    // a semi-join against _cit_docs, not an anti-join against this
    // batch's ids (round-15 advice item 3's verb-side twin: residue
    // postings of a DIFFERENTLY-GROUPED torn batch are uncommitted
    // but not ours, and counting them would misclassify df
    // transitions). Committed excludes this batch (its ids commit
    // last) and every torn attempt's, whoever wrote it; tombstoned
    // docs and superseded generations drop as before.
    val preRows = currentGen(
      touched.join(committed.select(col("doc_id")), Seq("doc_id"),
          "left_semi")
        .join(tombstones(spark, dir), Seq("doc_id"), "left_anti"),
      curRevs(spark, dir))
      .localCheckpoint()
    val newRows = batchPost.join(touched, Seq("term", "doc_id"), "left_anti")
    if (newRows.limit(1).count() > 0L)
      withBucket(newRows.withColumn("bk", lit(k))).repartition(col("tb"))
        .sortWithinPartitions(col("term"))
        .write.partitionBy("tb").mode("append").parquet(s"$dir/post")
    // per-term df before/after the batch (postings are distinct per
    // (term, doc), and preRows/batchPost are doc-disjoint by the
    // residue split, so the counts add exactly)
    val dfB = preRows.groupBy(col("term")).agg(count(lit(1)).as("df_b"))
    val dfA = batchPost.groupBy(col("term")).agg(count(lit(1)).as("df_a"))
    val cls = dfA.join(dfB, Seq("term"), "left")
      .select(col("term"),
        coalesce(col("df_b"), lit(0L)).as("before"),
        (coalesce(col("df_b"), lit(0L)) + col("df_a")).as("after"))
      .localCheckpoint()
    val entered = cls
      .filter(col("before") < dfMin && col("after").between(dfMin, dfMax))
      .select(col("term")).localCheckpoint()
    val stayed = cls
      .filter(col("before").between(dfMin, dfMax) &&
        col("after").between(dfMin, dfMax))
      .select(col("term"))
    // purgatory terms (before > dfMax) ride along in post/ but take no
    // transition; a term crossing dfMax dies (+1), one crossing
    // dfMax + slack goes deep (postings stop, counter starts at its
    // exact current df)
    val newlyDead = cls
      .filter(col("before") <= dfMax && col("after") > dfMax)
      .select(col("term"))
    val newlyDeep = cls.filter(col("after") > dfMax + slack)
      .select(col("term"), col("after")).localCheckpoint()
    // entered terms: ALL pairs among their docs (old ones included —
    // the band admission reaches back); stayed terms: only pairs that
    // involve a batch doc (old×old pairs already exist)
    val entAll = preRows.join(entered, Seq("term"))
      .unionByName(batchPost.join(entered, Seq("term")))
      .localCheckpoint()
    val stOld = preRows.join(stayed, Seq("term")).localCheckpoint()
    val stNew = batchPost.join(stayed, Seq("term")).localCheckpoint()
    pairsOf(entAll, entAll)
      .unionByName(pairsOf(stNew, stOld))
      .unionByName(pairsOf(stOld, stNew))
      .unionByName(pairsOf(stNew, stNew))
      .withColumn("bk", lit(k))
      .write.mode("append").parquet(s"$dir/pairs")
    appendDeltas(spark, dir, "dead_terms",
      newlyDead.select(col("term"), lit(k).as("k"), lit(1L).as("s")))
    // deep_df BEFORE deep_terms: a replay that finds the term already
    // deep takes the counter path, and the (term, k) anti-join sees
    // the seed row — the torn window cannot double- or mis-count
    appendDeltas(spark, dir, "deep_df",
      newlyDeep.select(col("term"), lit(k).as("k"), col("after").as("s"))
        .unionByName(deepHits))
    val freshDeep = newlyDeep.select(col("term"))
      .join(deep, Seq("term"), "left_anti").localCheckpoint()
    if (freshDeep.count() > 0L)
      freshDeep.select(col("term"), lit(k).as("bk"))
        .write.mode("append").parquet(s"$dir/deep_terms")
    // a sub term (fell below dfMin via deletes) re-entering the band:
    // the reach-back above regenerated its surviving pairs; unmark it
    appendDeltas(spark, dir, "sub_terms",
      entered.join(subNow(spark, dir), Seq("term"))
        .select(col("term"), lit(k).as("k"), lit(-1L).as("s")))
    // the commit: doc rows carry this batch's snapshot epoch — the
    // visibility point every bk-gated row of the batch resolves
    // through at as-of reads
    freshIds.select(col("doc_id"),
        lit(committedEpoch(spark, dir) + 1L).as("e"), lit(k).as("bk"))
      .write.mode("append").parquet(s"$dir/_cit_docs")
  }

  /** O(batch) shrink: tombstone `docs` (doc_id, text — the text
    * re-derives the victim postings, including deep-term hits the
    * index no longer stores). Self-healing under replay (tombs commit
    * LAST; every delta write is keyed); refuses LOUDLY if a deep
    * term would fall back to df ≤ dfMax (its postings are gone —
    * compact/rebuild with a larger slack instead). With slack ≥ the
    * cumulative tombstone count that refusal is arithmetically
    * unreachable. */
  def delete(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val (n, dfMin, dfMax, _) = readMeta(spark, dir)
    val committed = readOr(spark, s"$dir/_cit_docs", docSchema)
    val tmb = tombstones(spark, dir).localCheckpoint()
    val victims = docs
      .join(committed.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .join(tmb, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (victims.count() == 0L) return
    val victimIds = victims.select(col("doc_id")).distinct().localCheckpoint()
    val k = "d" + victimIds.agg(min(col("doc_id"))).collect()(0).getLong(0) +
      "." + idSetHash(victimIds)
    val deep = deepTerms(spark, dir).localCheckpoint()
    val vPost = Graph.allPostings(victims, n).localCheckpoint()
    // deep guard: exact current df from the counter deltas (excluding
    // this key's own rows — a torn earlier attempt must not make the
    // replay see its decrement as pre-existing state)
    val vDeepHits = vPost.join(deep, Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("hits"))
      .localCheckpoint()
    if (vDeepHits.limit(1).count() > 0L) {
      val deepCur = deltas(spark, dir, "deep_df")
        .filter(col("k") =!= k)
        .groupBy(col("term")).agg(sum(col("s")).as("df"))
      // left join + null refusal: a deep term WITHOUT a counter (a
      // legacy layout's dead term) has unknown df — any hit on it must
      // refuse, since silent skip could miss a revival
      val reviving = vDeepHits.join(deepCur, Seq("term"), "left")
        .filter(col("df").isNull || col("df") - col("hits") <= dfMax)
      val bad = reviving.limit(5).collect()
      require(bad.isEmpty,
        s"delete would revive deep term(s) ${bad.map(_.getString(0)).mkString(", ")} " +
          "whose postings were dropped past dfMax + slack — " +
          "compact/rebuild with a larger slack before this delete")
      appendDeltas(spark, dir, "deep_df",
        vDeepHits.select(col("term"), lit(k).as("k"),
          (-col("hits")).as("s")))
    }
    // below-deep touched terms: recount before/after from retained
    // postings (kept current by append, pruned to the batch buckets)
    val touchTerms = vPost.join(deep, Seq("term"), "left_anti")
      .select(col("term")).distinct().localCheckpoint()
    val buckets = withBucket(touchTerms).select(col("tb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    // committed-only: a torn append's crash-residue rows in post/
    // (written before its docs commit) must not inflate the recount —
    // the delete-side twin of append's residue split
    val curRows = currentGen(
      postRows(spark, dir)
        .filter(col("tb").isin(buckets: _*))
        .join(touchTerms, Seq("term"))
        .select(col("term"), col("doc_id"), col("rev"))
        .join(committed.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .join(tmb, Seq("doc_id"), "left_anti"),
      curRevs(spark, dir))
      .localCheckpoint()
    val afterRows = curRows.join(victimIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val dfB = curRows.groupBy(col("term")).agg(count(lit(1)).as("before"))
    val dfA = afterRows.groupBy(col("term")).agg(count(lit(1)).as("after"))
    val cls = dfB.join(dfA, Seq("term"), "left")
      .select(col("term"), col("before"),
        coalesce(col("after"), lit(0L)).as("after"))
      .localCheckpoint()
    // band → below-band: support rows persist, read filter kills them
    val fell = cls
      .filter(col("before").between(dfMin, dfMax) && col("after") < dfMin)
      .select(col("term"))
    // purgatory → band: REVIVAL — regenerate the surviving pairs from
    // the retained postings (the delete-side reach-back)
    val revived = cls
      .filter(col("before") > dfMax &&
        col("after").between(dfMin, dfMax))
      .select(col("term")).localCheckpoint()
    // purgatory → below-band in one stroke: dead mark flips off; any
    // stale band-era pairs are killed by the sub mark instead
    val revivedSub = cls
      .filter(col("before") > dfMax && col("after") < dfMin)
      .select(col("term"))
    appendDeltas(spark, dir, "dead_terms",
      revived.unionByName(revivedSub)
        .select(col("term"), lit(k).as("k"), lit(-1L).as("s")))
    // sub marks are idempotent per term: a revival INTO the band must
    // clear any standing mark (a sub term can die via append — the
    // mark rides along — and revive here), and a revival into sub must
    // not double-mark one; fell terms were in band, hence never marked
    val subN = subNow(spark, dir).localCheckpoint()
    appendDeltas(spark, dir, "sub_terms",
      fell.unionByName(revivedSub.join(subN, Seq("term"), "left_anti"))
        .select(col("term"), lit(k).as("k"), lit(1L).as("s"))
        .unionByName(revived.join(subN, Seq("term"))
          .select(col("term"), lit(k).as("k"), lit(-1L).as("s"))))
    val revRows = afterRows.join(revived, Seq("term")).localCheckpoint()
    pairsOf(revRows, revRows).withColumn("bk", lit(k))
      .write.mode("append").parquet(s"$dir/pairs")
    // the commit: tombstone rows carry this batch's snapshot epoch
    victimIds.select(col("doc_id"),
        lit(committedEpoch(spark, dir) + 1L).as("e"), lit(k).as("bk"))
      .write.mode("append").parquet(s"$dir/_cit_tombs")
  }

  /** DOCUMENT REVISION — the q156/q157 CDC verb on the citation
    * index, and the hardest of the family because a revised text
    * moves term df in BOTH directions at once: every term the old
    * generation held loses one document, every term the new
    * generation holds gains one, and each touched term must take
    * exactly the right band transition (enter, die, fall sub-band,
    * revive from purgatory, go deep) under the same algebra
    * [[append]] and [[delete]] maintain one direction at a time.
    *
    * `docs` carries (doc_id, text, prev_text): `text` is the new
    * generation, `prev_text` the CURRENT generation's text as
    * committed (the same trust contract as [[delete]]'s re-derived
    * victim postings — it is only consulted for DEEP term counters,
    * whose postings the index no longer stores; sub-deep removals
    * recount from the index's own rows). Null/absent prev_text means
    * insert (the doc has no current generation).
    *
    * Mechanics: ONE classification pass. For each touched sub-deep
    * term, `before` = live stored df, `after` = before − (target docs
    * holding it now) + (target docs holding it in the new text); the
    * eight transition branches reuse append's up-moves (entered /
    * newlyDead / newlyDeep, reach-back pair regeneration) and
    * delete's down-moves (fell / revived / revivedSub, survivor pair
    * regeneration) verbatim. New-generation postings and pairs are
    * rev-stamped; the `_cit_rev` registry row — written LAST, the
    * commit point — flips every read to the new generation, and the
    * old generation's postings and support rows die by STAMP
    * INEQUALITY (never rewritten; compaction folds them). Deep terms
    * advance by signed counter delta (new hits − old hits), with
    * delete's revival refusal when the counter would fall to
    * df ≤ dfMax. Monotone caller rev per doc; replaying any torn
    * prefix heals ((term,k) delta anti-joins, (term,doc,rev) posting
    * anti-join, registry-keyed batch freshness). Tombstoned ids stay
    * dead. q160 proves upsert ≡ rebuilt-from-revised by oracle;
    * CitationIndexSpec pins the band transitions, replay healing,
    * and compaction folding. */
  def upsert(docs: DataFrame, dir: String, rev: Long): Unit = {
    require(rev > 0L, "revision must be positive")
    val spark = docs.sparkSession
    val (n, dfMin, dfMax, slack) = readMeta(spark, dir)
    val committed = readOr(spark, s"$dir/_cit_docs", docSchema)
    val tmb = tombstones(spark, dir).localCheckpoint()
    val reg = revisions(spark, dir).localCheckpoint()
    val cr = reg.groupBy(col("doc_id")).agg(max(col("rev")).as("cur_rev"))
      .localCheckpoint()
    val withPrev =
      if (docs.columns.contains("prev_text")) docs
      else docs.withColumn("prev_text", lit(null).cast("string"))
    val targets0 = withPrev
      .select(col("doc_id"), col("text"), col("prev_text"))
      .join(tmb, Seq("doc_id"), "left_anti")
    val stale = targets0.select(col("doc_id")).distinct()
      .join(cr, Seq("doc_id")).filter(col("cur_rev") > lit(rev)).count()
    require(stale == 0L,
      s"upsert rev=$rev is older than the current revision of $stale " +
        "docs — revisions must be monotone per doc")
    // (doc, rev) already registered = fully applied (registry is the
    // LAST write) — a replay drops to the genuinely unfinished docs
    val targets = targets0
      .join(reg.filter(col("rev") === rev).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (targets.count() == 0L) return
    val targetIds = targets.select(col("doc_id")).distinct().localCheckpoint()
    val k = "u" + targetIds.agg(min(col("doc_id"))).collect()(0).getLong(0) +
      "." + idSetHash(targetIds) + "." + rev
    val deep = deepTerms(spark, dir).localCheckpoint()
    val newAll = Graph.allPostings(targets, n).localCheckpoint()
    val oldAll = Graph.allPostings(
      targets.select(col("doc_id"), col("prev_text").as("text")), n)
      .localCheckpoint()
    // deep terms advance by exact counter: +new hits − old hits, with
    // delete's revival refusal (their postings are gone — a counter
    // that would land ≤ dfMax cannot regenerate its revived edges)
    val deepDelta = newAll.join(deep, Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("h_new"))
      .join(oldAll.join(deep, Seq("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("h_old")),
        Seq("term"), "full")
      .select(col("term"),
        (coalesce(col("h_new"), lit(0L)) - coalesce(col("h_old"), lit(0L)))
          .as("d"))
      .filter(col("d") =!= 0L).localCheckpoint()
    if (deepDelta.limit(1).count() > 0L) {
      val deepCur = deltas(spark, dir, "deep_df")
        .filter(col("k") =!= k)
        .groupBy(col("term")).agg(sum(col("s")).as("df"))
      val bad = deepDelta.join(deepCur, Seq("term"), "left")
        .filter(col("df").isNull || col("df") + col("d") <= dfMax)
        .limit(5).collect()
      require(bad.isEmpty,
        s"upsert would revive deep term(s) ${bad.map(_.getString(0)).mkString(", ")} " +
          "whose postings were dropped past dfMax + slack — " +
          "compact/rebuild with a larger slack before this upsert")
    }
    // sub-deep sides: new-generation postings (rev-stamped) and the
    // touched-term universe (old ∪ new)
    val newPost = newAll.join(deep, Seq("term"), "left_anti")
      .withColumn("rev", lit(rev)).localCheckpoint()
    val touchedTerms = newPost.select(col("term"))
      .unionByName(oldAll.join(deep, Seq("term"), "left_anti")
        .select(col("term")))
      .distinct().localCheckpoint()
    val buckets = withBucket(touchedTerms).select(col("tb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    // live pre-upsert rows of the touched terms: committed, not
    // tombstoned, generation-current (the registry has no row for this
    // (doc, rev) yet, so a torn earlier attempt's rev-stamped residue
    // is NOT current and drops out here — the upsert-side residue
    // split)
    val preRows = currentGen(
      postRows(spark, dir)
        .filter(col("tb").isin(buckets: _*))
        .join(touchedTerms, Seq("term"))
        .select(col("term"), col("doc_id"), col("rev"))
        .join(committed.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .join(tmb, Seq("doc_id"), "left_anti"),
      cr).localCheckpoint()
    val tgtOldRows = preRows.join(targetIds, Seq("doc_id"), "left_semi")
    val othersRows = preRows.join(targetIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    // postings land first (the append discipline); replays anti-join
    // the already-landed (term, doc, rev) rows
    val landed = postRows(spark, dir)
      .filter(col("tb").isin(buckets: _*) && col("rev") === rev)
      .join(targetIds, Seq("doc_id"), "left_semi")
      .select(col("term"), col("doc_id"))
    val freshRows = newPost.join(landed, Seq("term", "doc_id"), "left_anti")
    if (freshRows.limit(1).count() > 0L)
      withBucket(freshRows.withColumn("bk", lit(k))).repartition(col("tb"))
        .sortWithinPartitions(col("term"))
        .write.partitionBy("tb").mode("append").parquet(s"$dir/post")
    // one classification over both directions: before = live stored
    // df, after = before − removed + added
    val cls = touchedTerms
      .join(preRows.groupBy(col("term")).agg(count(lit(1)).as("b")),
        Seq("term"), "left")
      .join(tgtOldRows.groupBy(col("term")).agg(count(lit(1)).as("r")),
        Seq("term"), "left")
      .join(newPost.groupBy(col("term")).agg(count(lit(1)).as("a")),
        Seq("term"), "left")
      .select(col("term"), coalesce(col("b"), lit(0L)).as("before"),
        (coalesce(col("b"), lit(0L)) - coalesce(col("r"), lit(0L)) +
          coalesce(col("a"), lit(0L))).as("after"))
      .localCheckpoint()
    val entered = cls
      .filter(col("before") < dfMin && col("after").between(dfMin, dfMax))
      .select(col("term")).localCheckpoint()
    val stayed = cls
      .filter(col("before").between(dfMin, dfMax) &&
        col("after").between(dfMin, dfMax))
      .select(col("term"))
    val newlyDead = cls
      .filter(col("before") <= dfMax && col("after") > dfMax)
      .select(col("term"))
    val newlyDeep = cls.filter(col("after") > dfMax + slack)
      .select(col("term"), col("after")).localCheckpoint()
    val revived = cls
      .filter(col("before") > dfMax && col("after").between(dfMin, dfMax))
      .select(col("term")).localCheckpoint()
    val revivedSub = cls
      .filter(col("before") > dfMax && col("after") < dfMin)
      .select(col("term"))
    val fell = cls
      .filter(col("before").between(dfMin, dfMax) && col("after") < dfMin)
      .select(col("term"))
    // after-state holders: unchanged docs' live rows + the targets'
    // new generation (a target that dropped the term simply has no
    // after-row; its old pairs die by stamp inequality)
    val afterRows = othersRows
      .select(col("term"), col("doc_id"), col("rev"))
      .unionByName(newPost.select(col("term"), col("doc_id"), col("rev")))
      .localCheckpoint()
    // entered/revived reach-back: ALL pairs among after-state holders
    // (entered terms had none; revived terms' duplicates are benign
    // under countDistinct and fold at compaction)
    val regenRows = afterRows
      .join(entered.unionByName(revived), Seq("term")).localCheckpoint()
    // stayed terms: only pairs involving a changed doc (old×old pairs
    // already exist and their stamps stay current)
    val stNew = newPost.join(stayed, Seq("term")).localCheckpoint()
    val stOld = othersRows.join(stayed, Seq("term")).localCheckpoint()
    pairsOf(regenRows, regenRows)
      .unionByName(pairsOf(stNew, stOld))
      .unionByName(pairsOf(stOld, stNew))
      .unionByName(pairsOf(stNew, stNew))
      .withColumn("bk", lit(k))
      .write.mode("append").parquet(s"$dir/pairs")
    appendDeltas(spark, dir, "dead_terms",
      newlyDead.select(col("term"), lit(k).as("k"), lit(1L).as("s"))
        .unionByName(revived.unionByName(revivedSub)
          .select(col("term"), lit(k).as("k"), lit(-1L).as("s"))))
    appendDeltas(spark, dir, "deep_df",
      newlyDeep.select(col("term"), lit(k).as("k"), col("after").as("s"))
        .unionByName(deepDelta
          .select(col("term"), lit(k).as("k"), col("d").as("s"))))
    val freshDeep = newlyDeep.select(col("term"))
      .join(deep, Seq("term"), "left_anti").localCheckpoint()
    if (freshDeep.count() > 0L)
      freshDeep.select(col("term"), lit(k).as("bk"))
        .write.mode("append").parquet(s"$dir/deep_terms")
    val subN = subNow(spark, dir).localCheckpoint()
    appendDeltas(spark, dir, "sub_terms",
      fell.unionByName(revivedSub.join(subN, Seq("term"), "left_anti"))
        .select(col("term"), lit(k).as("k"), lit(1L).as("s"))
        .unionByName(entered.unionByName(revived).join(subN, Seq("term"))
          .select(col("term"), lit(k).as("k"), lit(-1L).as("s"))))
    val ep = committedEpoch(spark, dir) + 1L
    val freshIds = targetIds.join(committed.select(col("doc_id")),
      Seq("doc_id"), "left_anti").localCheckpoint()
    if (freshIds.count() > 0L)
      freshIds.select(col("doc_id"), lit(ep).as("e"), lit(k).as("bk"))
        .write.mode("append").parquet(s"$dir/_cit_docs")
    // the commit point: registry rows flip every read to the new
    // generation, atomically per batch, and carry the snapshot epoch
    targetIds.select(col("doc_id"), lit(rev).as("rev"), lit(ep).as("e"),
        lit(k).as("bk"))
      .write.mode("append").parquet(s"$dir/_cit_rev")
  }

  /** The maintained WEIGHTED edge set: (src, dst, w) with w = distinct
    * supporting band terms — countDistinct, so replay-duplicated
    * support rows can never inflate a weight. Result-identical to
    * [[Graph.citationEdgesWeighted]] over committed-minus-tombstoned
    * docs (spec-pinned). Read cost: the support scan plus the
    * dead/sub delta sums (O(churned terms)) and two tombstone
    * anti-joins (O(deleted docs)). */
  def edgesWeighted(spark: SparkSession, dir: String): DataFrame = {
    val tmb = tombstones(spark, dir)
    val cr = curRevs(spark, dir)
    // endpoint-committed gate (round-15 advice item 3, current-serve
    // twin): a gone-batch tear (pairs landed, commit row never, batch
    // never replayed) must not serve support rows of docs that never
    // committed; every legitimate pair's endpoints are committed docs.
    // Size-guarded broadcast, no checkpoint (round-16 advice item 5:
    // materializing the O(corpus) id set per read was pure overhead —
    // the two left_semi joins consume the narrow frame lazily, and
    // the as-of path already takes this exact shape)
    val ids = IndexIo.maybeBroadcast(
      readOr(spark, s"$dir/_cit_docs", docSchema).select(col("doc_id")))
    // NOT key-gated: the dead/sub status sums still read all delta
    // rows. Gating them on committed keys (as the as-of reads do)
    // would also make the CURRENT serve exact under an unhealed
    // gone-batch tear, but it was measured to DOUBLE every citation
    // serving read (the committed-key construction is three extra
    // scans + a distinct per read, q140 0.39→0.89 s) for protection
    // against a state [[consistent]] already detects and whose
    // documented recovery is replay-or-rebuild. The cheap endpoint
    // gate stays; the delta gate is the as-of reads' job.
    readOr(spark, s"$dir/pairs", pairSchema)
      .join(ids.withColumnRenamed("doc_id", "src"), Seq("src"), "left_semi")
      .join(ids.withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_semi")
      // generation filter: a support row serves iff BOTH endpoint
      // stamps equal the endpoints' current generations (pre-revision
      // files read null → 0) — one size-guarded join per endpoint
      // against the O(revised docs) registry (IndexIo.maybeBroadcast)
      .withColumn("src_rev", coalesce(col("src_rev"), lit(0L)))
      .withColumn("dst_rev", coalesce(col("dst_rev"), lit(0L)))
      .join(IndexIo.maybeBroadcast(cr.select(col("doc_id").as("src"),
        col("cur_rev").as("src_cur"))), Seq("src"), "left")
      .filter(col("src_rev") === coalesce(col("src_cur"), lit(0L)))
      .join(IndexIo.maybeBroadcast(cr.select(col("doc_id").as("dst"),
        col("cur_rev").as("dst_cur"))), Seq("dst"), "left")
      .filter(col("dst_rev") === coalesce(col("dst_cur"), lit(0L)))
      .join(deadNow(spark, dir), Seq("term"), "left_anti")
      .join(subNow(spark, dir), Seq("term"), "left_anti")
      .join(tmb.withColumnRenamed("doc_id", "src"), Seq("src"), "left_anti")
      .join(tmb.withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_anti")
      .groupBy(col("src"), col("dst"))
      .agg(countDistinct(col("term")).as("w"))
  }

  /** Unweighted projection ([[Graph.citationEdges]] shape). */
  def edges(spark: SparkSession, dir: String): DataFrame =
    edgesWeighted(spark, dir).select(col("src"), col("dst"))

  // ---- SNAPSHOT (time-travel) serving — [[ClusterStore
  // .assignmentsAsOf]]'s contract on the citation index. Every
  // non-commit row carries its writing batch's key (`bk`); the three
  // commit tables carry the batch's snapshot epoch (`e`). A row
  // serves as-of epoch E iff its batch's commit row landed at
  // epoch ≤ E — so a torn batch's residue is invisible at its own
  // epoch (its commit row never landed there), and a replay that
  // commits later under an interleaved epoch number serves exactly
  // from its real commit point. Serving history costs two narrow
  // filters + one key semi-join, never a copy; [[compactTo]] trades
  // the history away (everything re-bases to epoch 0). ----

  private def docsAsOf(spark: SparkSession, dir: String, asOf: Long) =
    readOr(spark, s"$dir/_cit_docs", docSchema)
      .filter(coalesce(col("e"), lit(0L)) <= asOf)
      .select(col("doc_id"))

  private def tombsAsOf(spark: SparkSession, dir: String, asOf: Long) =
    readOr(spark, s"$dir/_cit_tombs", docSchema)
      .filter(coalesce(col("e"), lit(0L)) <= asOf)
      .select(col("doc_id"))

  private def regAsOf(spark: SparkSession, dir: String, asOf: Long) =
    readOr(spark, s"$dir/_cit_rev", revSchema)
      .filter(coalesce(col("e"), lit(0L)) <= asOf)
      .select(col("doc_id"), col("rev"))

  /** ONE collected read of the three commit tables (r21 — the BM25
    * r20 treatment on the citation index): one row per (batch key,
    * min/max commit epoch). The commit tables are O(corpus) rows, but
    * GROUPED BY batch key they are control-plane sized (one group per
    * committed verb), so the aggregate ships a verb-count-sized result
    * to the driver and the as-of probes derive the committed counter
    * AND the key gate locally instead of running three separate Spark
    * jobs per probe (committedEpoch aggregate + keys
    * distinct+localCheckpoint + docsAt checkpoint). A null-bk group
    * marks LEGACY rows (pre-round-16 verbs): their keys must be
    * constructed per-doc-id, so the key gate falls back to the
    * [[committedKeysAsOf]] DataFrame path for that index only.
    * min(e) ≤ asOf ⟺ ∃ commit row with e ≤ asOf (a batch commits all
    * its rows at one epoch), so the local filter is exact. */
  private def commitLedger(spark: SparkSession,
      dir: String): Seq[(Option[String], Long, Long)] = {
    val es = readOr(spark, s"$dir/_cit_docs", docSchema)
      .select(col("bk"), col("e"))
      .unionByName(readOr(spark, s"$dir/_cit_tombs", docSchema)
        .select(col("bk"), col("e")))
      .unionByName(readOr(spark, s"$dir/_cit_rev", revSchema)
        .select(col("bk"), col("e")))
      .select(col("bk"), coalesce(col("e"), lit(0L)).as("e"))
    es.groupBy(col("bk")).agg(min(col("e")).as("mn"), max(col("e")).as("mx"))
      .collect().toSeq
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
  }

  /** [[committedEpoch]] derived from a collected [[commitLedger]] —
    * max commit epoch over every group, −1 on a cold dir. */
  private def committedEpochOf(
      ledger: Seq[(Option[String], Long, Long)]): Long =
    if (ledger.isEmpty) -1L else ledger.map(_._3).max

  /** Batch keys committed as of `asOf`. Since round 16 the commit
    * rows STORE their batch's key (the per-batch-nonce fix from
    * round-15 advice item 3 — keys carry an id-set content hash, so a
    * key is committed iff the exact batch that wrote it committed and
    * reconstruction-collisions are unrepresentable); rows written by
    * older verbs carry a null `bk` and fall back to the CONSTRUCTED
    * legacy grammar (build/compact "b", append "a"+min doc id, delete
    * "d"+min victim id, upsert "u"+min target id+"."+rev — built from
    * ALL legacy ids, a superset whose extras match nothing among
    * legacy-keyed rows). Since r21 this DataFrame path is the LEGACY
    * fallback only — an index whose commit rows all carry stored keys
    * gates through the collected [[commitLedger]] instead. */
  private def committedKeysAsOf(spark: SparkSession, dir: String,
      asOf: Long): DataFrame = {
    import org.apache.spark.sql.types.StringType
    def at(name: String, schema: StructType) =
      readOr(spark, s"$dir/$name", schema)
        .filter(coalesce(col("e"), lit(0L)) <= asOf)
    val docs = at("_cit_docs", docSchema)
    val tombs = at("_cit_tombs", docSchema)
    val regs = at("_cit_rev", revSchema)
    val stored = Seq(docs, tombs, regs)
      .map(_.select(col("bk")).filter(col("bk").isNotNull))
      .reduce(_ unionByName _)
    IndexIo.emptyFrame(spark,
        StructType(Seq(StructField("bk", StringType))))
      .unionByName(spark.range(1).select(lit("b").as("bk")))
      .unionByName(stored)
      .unionByName(docs.filter(col("bk").isNull)
        .select(concat(lit("a"), col("doc_id").cast("string")).as("bk")))
      .unionByName(tombs.filter(col("bk").isNull)
        .select(concat(lit("d"), col("doc_id").cast("string")).as("bk")))
      .unionByName(regs.filter(col("bk").isNull)
        .select(concat(lit("u"), col("doc_id").cast("string"),
          lit("."), col("rev").cast("string")).as("bk")))
      .distinct()
  }

  /** The maintained weighted edge set exactly as it stood when epoch
    * `asOf` committed — [[edgesWeighted]]'s read plan over
    * batch-gated inputs: pairs/dead/sub/tombstone/registry rows all
    * stop at the snapshot boundary. Valid for any
    * 0 ≤ asOf ≤ [[committedEpoch]]; at the committed epoch this is
    * the current serve (spec-pinned). Consumers compose freely — a
    * warm PageRank over `edgesAsOf(E)` is "rank the citation graph
    * as of snapshot E". */
  def edgesWeightedAsOf(spark: SparkSession, dir: String,
      asOf: Long): DataFrame = {
    // ONE ledger job per probe (r21, the BM25 r20 treatment): the
    // grouped commit ledger yields the committed counter for the
    // require AND the key gate below — this path used to run a
    // committedEpoch aggregate, a keys distinct+localCheckpoint, and a
    // docsAt localCheckpoint (three sequential eager jobs) before the
    // lazy read plan even existed.
    val ledger = commitLedger(spark, dir)
    val ce = committedEpochOf(ledger)
    require(asOf >= 0L && asOf <= ce,
      s"as-of epoch $asOf outside the committed history [0, $ce]" +
        (if (ce < 0L) " — cold index, nothing committed" else ""))
    edgesWeightedAsOfImpl(spark, dir, asOf, None, Some(ledger))
  }

  /** Shared as-of read plan; `restrict` (an O(affected) (src, dst)
    * set) keeps the change feed's per-epoch derivation from paying
    * two full edge materializations; `ledger` (a collected
    * [[commitLedger]]) lets callers that already probed the commit
    * tables reuse that one read. */
  private def edgesWeightedAsOfImpl(spark: SparkSession, dir: String,
      asOf: Long, restrict: Option[DataFrame],
      ledger: Option[Seq[(Option[String], Long, Long)]] = None): DataFrame = {
    val led = ledger.getOrElse(commitLedger(spark, dir))
    // key gate: committed-as-of keys derive LOCALLY from the ledger
    // (always including build/compact's "b") and reach the pairs scan
    // and the delta sums as a size-guarded isin literal — no
    // distinct+localCheckpoint job, no per-table semi-join build. A
    // legacy index (null-bk commit rows, pre-round-16) falls back to
    // the constructed-key DataFrame path, whose keys cannot be derived
    // driver-side.
    val hasLegacy = led.exists(_._1.isEmpty)
    val legacyKeys =
      if (hasLegacy) Some(committedKeysAsOf(spark, dir, asOf).localCheckpoint())
      else None
    val okKeys: Seq[Any] =
      ("b" +: led.collect { case (Some(bk), mn, _) if mn <= asOf => bk })
        .distinct
    def gateKeys(df: DataFrame, keyCol: String): DataFrame =
      legacyKeys match {
        case Some(k) =>
          df.join(k.withColumnRenamed("bk", keyCol), Seq(keyCol), "left_semi")
        case None => IndexIo.gateMembership(df, keyCol, okKeys)
      }
    def gated(name: String) = nowSet(gateKeys(deltas(spark, dir, name), "k"))
    val tmb = tombsAsOf(spark, dir, asOf)
    val cr = regAsOf(spark, dir, asOf)
      .groupBy(col("doc_id")).agg(max(col("rev")).as("cur_rev"))
    // Endpoint-committed gate (round-15 advice item 3): the bk gate
    // alone is not airtight under torn writes — a torn append's pair
    // rows carry bk="a<m>" with m then-fresh, and if a LATER,
    // differently-grouped batch commits doc m, that key becomes
    // constructible and the residue would gate in, endpoints the torn
    // batch never committed included. Every LEGITIMATE pair's two
    // endpoints are committed docs (pairs are generated between
    // indexed documents only), so semi-joining both endpoints against
    // the as-of committed-doc set drops residue rows whose doc never
    // committed while passing every real row unchanged. LAZY +
    // size-guarded broadcast since r21 (the current-serve shape,
    // round-16 advice item 5): materializing the O(corpus) id set per
    // probe was the third eager job this path paid.
    val docsAt = IndexIo.maybeBroadcast(docsAsOf(spark, dir, asOf))
    val base = gateKeys(
      readOr(spark, s"$dir/pairs", pairSchema)
        .withColumn("bk", coalesce(col("bk"), lit("b"))), "bk")
      .join(docsAt.withColumnRenamed("doc_id", "src"), Seq("src"),
        "left_semi")
      .join(docsAt.withColumnRenamed("doc_id", "dst"), Seq("dst"),
        "left_semi")
    restrict.fold(base)(r => base.join(r, Seq("src", "dst"), "left_semi"))
      .withColumn("src_rev", coalesce(col("src_rev"), lit(0L)))
      .withColumn("dst_rev", coalesce(col("dst_rev"), lit(0L)))
      .join(IndexIo.maybeBroadcast(cr.select(col("doc_id").as("src"),
        col("cur_rev").as("src_cur"))), Seq("src"), "left")
      .filter(col("src_rev") === coalesce(col("src_cur"), lit(0L)))
      .join(IndexIo.maybeBroadcast(cr.select(col("doc_id").as("dst"),
        col("cur_rev").as("dst_cur"))), Seq("dst"), "left")
      .filter(col("dst_rev") === coalesce(col("dst_cur"), lit(0L)))
      .join(gated("dead_terms"), Seq("term"), "left_anti")
      .join(gated("sub_terms"), Seq("term"), "left_anti")
      .join(tmb.withColumnRenamed("doc_id", "src"), Seq("src"), "left_anti")
      .join(tmb.withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_anti")
      .groupBy(col("src"), col("dst"))
      .agg(countDistinct(col("term")).as("w"))
  }

  /** Unweighted as-of projection. */
  def edgesAsOf(spark: SparkSession, dir: String, asOf: Long): DataFrame =
    edgesWeightedAsOf(spark, dir, asOf).select(col("src"), col("dst"))

  private val feedSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType),
    StructField("old_w", LongType), StructField("new_w", LongType),
    StructField("change", StringType), StructField("e", LongType)))

  /** One epoch's EDGE delta at O(affected) cost — the citation twin
    * of [[ClusterStore.epochDelta]]. An edge's weight can change
    * between epochs n−1 and n only through (i) a pair row the epoch's
    * batch wrote, (ii) a term whose dead/sub status the batch
    * flipped, (iii) an endpoint the batch tombstoned, or (iv) an
    * endpoint whose generation the batch revised — so the candidate
    * set seeds from exactly the rows committed at n and expands to
    * the pair rows sharing a churned term or touched endpoint, and
    * both sides of the diff resolve RESTRICTED to those (src, dst). */
  private def epochEdgeDelta(spark: SparkSession, dir: String,
      n: Long): DataFrame = {
    require(n >= 1L, s"epoch delta needs a predecessor: n=$n")
    def commitAt(name: String, prefix: String, withRev: Boolean) = {
      val t = readOr(spark, s"$dir/$name",
        if (withRev) revSchema else docSchema)
        .filter(coalesce(col("e"), lit(0L)) === n)
      // stored batch key when present (round-16 nonce grammar);
      // legacy rows reconstruct theirs from the old grammar
      if (withRev)
        t.select(col("doc_id"),
          coalesce(col("bk"),
            concat(lit(prefix), col("doc_id").cast("string"),
              lit("."), col("rev").cast("string"))).as("bk"))
      else
        t.select(col("doc_id"),
          coalesce(col("bk"),
            concat(lit(prefix), col("doc_id").cast("string"))).as("bk"))
    }
    val commits = commitAt("_cit_docs", "a", withRev = false)
      .unionByName(commitAt("_cit_tombs", "d", withRev = false))
      .unionByName(commitAt("_cit_rev", "u", withRev = true))
      .localCheckpoint()
    val out = IndexIo.emptyFrame(spark, feedSchema).drop("e")
    if (commits.isEmpty) return out
    val keysAtN = commits.select(col("bk")).distinct()
    val touchedDocs = commits.select(col("doc_id")).distinct()
    val allPairs = readOr(spark, s"$dir/pairs", pairSchema)
      .withColumn("bk", coalesce(col("bk"), lit("b")))
    val newPairs = allPairs.join(keysAtN, Seq("bk"), "left_semi")
    val churnTerms = Seq("dead_terms", "sub_terms")
      .map(deltas(spark, dir, _)
        .join(keysAtN.withColumnRenamed("bk", "k"), Seq("k"), "left_semi")
        .select(col("term")))
      .reduce(_ unionByName _)
      .unionByName(newPairs.select(col("term")))
      .distinct()
    val affected = allPairs.join(churnTerms, Seq("term"), "left_semi")
      .select(col("src"), col("dst"))
      .unionByName(allPairs.join(
        touchedDocs.withColumnRenamed("doc_id", "src"),
        Seq("src"), "left_semi").select(col("src"), col("dst")))
      .unionByName(allPairs.join(
        touchedDocs.withColumnRenamed("doc_id", "dst"),
        Seq("dst"), "left_semi").select(col("src"), col("dst")))
      .distinct().localCheckpoint()
    if (affected.isEmpty) return out
    // one collected ledger shared by both snapshot reads (r21)
    val led = Some(commitLedger(spark, dir))
    val before = edgesWeightedAsOfImpl(spark, dir, n - 1L, Some(affected),
        led)
      .withColumnRenamed("w", "old_w")
    val after = edgesWeightedAsOfImpl(spark, dir, n, Some(affected), led)
      .withColumnRenamed("w", "new_w")
    before.join(after, Seq("src", "dst"), "full_outer")
      .withColumn("change",
        when(col("old_w").isNull, lit("added"))
          .when(col("new_w").isNull, lit("removed"))
          .when(col("old_w") === col("new_w"), lit("kept"))
          .otherwise(lit("reweighted")))
      .filter(col("change") =!= "kept")
  }

  /** CHANGE DATA FEED — [[ClusterStore.emitChangeFeed]]'s contract on
    * the citation index: persist each committed epoch's edge delta to
    * `feedDir/e=N` (src, dst, old_w, new_w,
    * change ∈ added/removed/reweighted) at O(affected) cost per
    * epoch. DERIVED, not captured: it reads the index after the fact
    * and writes exactly the epochs in (max(baseline, last complete
    * feed epoch), committedEpoch], each an idempotent per-dir
    * overwrite — a crash between an index commit and its feed write
    * leaves no hole. Baseline snapshot ([[edgesWeightedAsOf]] at
    * `baseline`) + replayed deltas ≡ the final edge set
    * (spec-pinned). Feeds for epochs folded away by [[compactTo]]
    * cannot be derived after the fold — emit before compacting. */
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
    (from to committed).foreach { n =>
      epochEdgeDelta(spark, dir, n).coalesce(1)
        .write.mode("overwrite").parquet(s"$feedDir/e=$n")
    }
  }

  /** Read the feed (all epochs; filter `e` for a window). */
  def changeFeed(spark: SparkSession, feedDir: String): DataFrame =
    IndexIo.readOr(spark, feedDir, feedSchema)

  /** Compaction-need probe ([[IndexIo.compactionStats]]): posting
    * files per term bucket (append decay) and the churn state every
    * read filters through — revision registry, tombstones, and the
    * three signed delta tables — vs the posting tree. Listing-only
    * cost; stale PAIR generations decay too but are invisible to
    * geometry (they fold at the same [[compactTo]]). */
  def compactionStats(spark: SparkSession,
      dir: String): IndexIo.CompactionStats =
    IndexIo.compactionStats(spark, s"$dir/post",
      Seq(s"$dir/_cit_rev", s"$dir/_cit_tombs", s"$dir/dead_terms",
        s"$dir/sub_terms", s"$dir/deep_df"))

  /** The decision [[compactionStats]] exists to make: time to
    * [[compactTo]]? */
  def needsCompaction(spark: SparkSession, dir: String,
      maxFilesPerBucket: Double = 8.0,
      maxCdcFraction: Double = 0.2): Boolean =
    compactionStats(spark, dir)
      .needsCompaction(maxFilesPerBucket, maxCdcFraction)

  /** Torn-write detector, three probes: (1) every doc id present in
    * post/ must be committed — append writes post first and docs
    * last, so residue ids are exactly an unfinished append; (2) every
    * tombstone must name a committed doc; (3) every delete-batch
    * delta key ("d" + min victim id) must have its id tombstoned —
    * delete writes deltas first and tombs last, so a delta key whose
    * id is not a tombstone is exactly an unfinished delete. All three
    * are narrow anti-join counts; a replay of the torn batch heals
    * each (spec-pinned per window). */
  def consistent(spark: SparkSession, dir: String): Boolean = {
    val docs = readOr(spark, s"$dir/_cit_docs", docSchema)
    val tmb = tombstones(spark, dir)
    val deleteKeys = Seq("dead_terms", "sub_terms", "deep_df")
      .map(deltas(spark, dir, _).select(col("k")))
      .reduce(_ unionByName _)
      .filter(col("k").startsWith("d")).distinct()
      // try_cast: literal-key columns ("b") constant-fold BEFORE the
      // startsWith filter prunes them; real d-keys always parse.
      // substring_index: the round-16 grammar is "d<min>.<idhash>" —
      // the min id is the first dot segment either way
      .select(expr(
        "try_cast(substring_index(substring(k, 2), '.', 1) as long)")
        .as("doc_id"))
      .filter(col("doc_id").isNotNull)
    // probes 4+5: a rev-stamped posting row or a "u<minid>.<rev>"
    // delta key whose (doc_id, rev) is unregistered is exactly an
    // unfinished upsert (the registry is upsert's LAST write)
    val reg = revisions(spark, dir)
    val upsertKeys = Seq("dead_terms", "sub_terms", "deep_df")
      .map(deltas(spark, dir, _).select(col("k")))
      .reduce(_ unionByName _)
      .filter(col("k").startsWith("u")).distinct()
      .select(
        expr("try_cast(substring_index(substring(k, 2), '.', 1) as long)")
          .as("doc_id"),
        expr("try_cast(substring_index(k, '.', -1) as long)").as("rev"))
      .filter(col("doc_id").isNotNull && col("rev").isNotNull)
    postRows(spark, dir).select(col("doc_id")).distinct()
      .join(docs, Seq("doc_id"), "left_anti")
      .count() == 0L &&
    tmb.join(docs, Seq("doc_id"), "left_anti").count() == 0L &&
    deleteKeys.join(tmb, Seq("doc_id"), "left_anti").count() == 0L &&
    postRows(spark, dir).filter(col("rev") > 0L)
      .select(col("doc_id"), col("rev")).distinct()
      .join(reg, Seq("doc_id", "rev"), "left_anti").count() == 0L &&
    upsertKeys.join(reg, Seq("doc_id", "rev"), "left_anti").count() == 0L
  }

  /** Copy-compaction into `destDir`: tombstoned docs, dead/sub terms'
    * stale pair rows, deep terms' residual postings and
    * replay-duplicated rows are physically dropped; the delta tables
    * fold to their current sums; the tombstone set empties (deleted
    * ids leave `_cit_docs`, so they become re-appendable). Crash-safe
    * by the same fresh-directory argument as [[LshIndex.compactTo]]
    * (docs land last; the source is untouched). The deep set carries
    * over as-is — a from-scratch rebuild could instead re-tier a
    * deep term whose survivor df fell within dfMax + slack back into
    * purgatory (its postings are unrecoverable here); that difference
    * is CAPACITY only (future revivals), never edges, and is the
    * documented price of dropping deep posting lists. */
  def compactTo(spark: SparkSession, dir: String, destDir: String): Unit = {
    val (n, dfMin, dfMax, slack) = readMeta(spark, dir)
    writeMeta(spark, destDir, n, dfMin, dfMax, slack)
    val tmb = tombstones(spark, dir).localCheckpoint()
    val deep = deepTerms(spark, dir).localCheckpoint()
    val deadN = deadNow(spark, dir).localCheckpoint()
    val subN = subNow(spark, dir).localCheckpoint()
    // generations FOLD here: only each doc's current-generation rows
    // survive, stamped back to 0, and the registry empties — the
    // compacted index is indistinguishable from one built over the
    // revised corpus from scratch
    val cr = curRevs(spark, dir).localCheckpoint()
    currentGen(postRows(spark, dir), cr)
      .join(deep, Seq("term"), "left_anti")
      .join(tmb, Seq("doc_id"), "left_anti")
      .select(col("term"), col("doc_id")).distinct()
      .withColumn("rev", lit(0L)).withColumn("bk", lit("b"))
      .transform(withBucket)
      .repartition(col("tb")).sortWithinPartitions(col("term"))
      .write.partitionBy("tb").mode("overwrite").parquet(s"$destDir/post")
    readOr(spark, s"$dir/pairs", pairSchema)
      .withColumn("src_rev", coalesce(col("src_rev"), lit(0L)))
      .withColumn("dst_rev", coalesce(col("dst_rev"), lit(0L)))
      .join(IndexIo.maybeBroadcast(cr.select(col("doc_id").as("src"),
        col("cur_rev").as("src_cur"))), Seq("src"), "left")
      .filter(col("src_rev") === coalesce(col("src_cur"), lit(0L)))
      .join(IndexIo.maybeBroadcast(cr.select(col("doc_id").as("dst"),
        col("cur_rev").as("dst_cur"))), Seq("dst"), "left")
      .filter(col("dst_rev") === coalesce(col("dst_cur"), lit(0L)))
      .join(deadN, Seq("term"), "left_anti")
      .join(subN, Seq("term"), "left_anti")
      .join(tmb.withColumnRenamed("doc_id", "src"), Seq("src"), "left_anti")
      .join(tmb.withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_anti")
      .select(col("src"), col("dst"), col("term")).distinct()
      .select(col("src"), col("dst"), col("term"),
        lit(0L).as("src_rev"), lit(0L).as("dst_rev"), lit("b").as("bk"))
      .write.mode("overwrite").parquet(s"$destDir/pairs")
    deadN.select(col("term"), lit("b").as("k"), lit(1L).as("s"))
      .write.mode("overwrite").parquet(s"$destDir/dead_terms")
    // the fold is the history vacuum (ClusterStore.compactTo's
    // bargain): every surviving row re-bases to epoch 0 / batch "b"
    deep.select(col("term"), lit("b").as("bk"))
      .write.mode("overwrite").parquet(s"$destDir/deep_terms")
    deltas(spark, dir, "deep_df")
      .groupBy(col("term")).agg(sum(col("s")).as("sd"))
      .select(col("term"), lit("b").as("k"), col("sd").as("s"))
      .write.mode("overwrite").parquet(s"$destDir/deep_df")
    // folded state: tombstones empty, sub marks empty (their stale
    // pairs were dropped above), revision registry empty (superseded
    // generations were dropped above) — written explicitly so a reused
    // destination dir cannot leak a previous life's state
    IndexIo.emptyFrame(spark, deltaSchema)
      .write.mode("overwrite").parquet(s"$destDir/sub_terms")
    IndexIo.emptyFrame(spark, docSchema)
      .write.mode("overwrite").parquet(s"$destDir/_cit_tombs")
    IndexIo.emptyFrame(spark, revSchema)
      .write.mode("overwrite").parquet(s"$destDir/_cit_rev")
    readOr(spark, s"$dir/_cit_docs", docSchema)
      .join(tmb, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(0L).as("e"), lit("b").as("bk"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$destDir/_cit_docs")
  }
}
