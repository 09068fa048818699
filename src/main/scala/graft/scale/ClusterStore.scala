package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Incrementally-maintained dedup-cluster assignments — the "index,
  * don't recompute" move for CONNECTED COMPONENTS. The dedup family
  * derives doc→canonical-representative maps by running
  * [[Dedup.connectedComponents]] over candidate pairs from scratch
  * (q67/q133); at 100 TB that fixed point re-reads the whole pair set
  * on every ingest, which is the recompute the LSH/BM/citation indexes
  * already refuse on their sides. This store persists a UNION-FIND
  * FOREST and grows it O(batch) per [[append]]: merges write one
  * pointer row per ABSORBED ROOT, never one per member.
  *
  * Connectivity model — chunk-share hyperedges: two documents are
  * near-dups iff they share any content chunk (the q104/q106
  * containment rule; callers feed any (doc_id, chunk_hash) relation).
  * A shared chunk is a HYPEREDGE over all docs containing it. The
  * store never materializes the quadratic pairs of a popular chunk:
  * each chunk contributes only STAR EDGES to its hub (the minimum
  * committed doc containing it). Every doc with chunk h is connected
  * to hub(h) and hubs chain downward as smaller docs arrive, so the
  * star forest spans exactly the components of the full share graph —
  * the representative labels (component minima) are IDENTICAL to a
  * from-scratch clique expansion, which is what the q149 oracle
  * proves hash-exactly.
  *
  * The forest is a persisted union-find with EPOCH-MONOTONE pointer
  * rows (src, dst) under `stars/e=N/`:
  *   - a doc with no row is its own representative (singletons are
  *     FREE — the table holds only connected docs and absorbed roots);
  *   - resolution chases, from a doc's own max-epoch row, each hop's
  *     max-epoch row with STRICTLY GREATER epoch (component history is
  *     temporal, so valid chains are epoch-increasing; a node that
  *     transitions twice implies an intervening split rewrite that
  *     re-pointed every doc which could still reach the older row);
  *   - [[append]] writes pointer rows for new connected docs, one
  *     transition row per absorbed root, and path-compression rows
  *     for the hubs it chased, so chain depth grows only across
  *     appends and resets at [[compactTo]] (flat forest).
  *
  * COMMIT PROTOCOL — epoch directories. Every mutation writes a full
  * set of per-epoch partition dirs (posts/e=E, fwd/e=E, stars/e=E,
  * tombs/e=E — empty frames where the op contributes nothing) and
  * commits by overwriting `_cs_meta` (the epoch pointer) LAST. All
  * readers filter e <= meta.epoch, so a torn write is invisible; a
  * replay recomputes the same epoch deterministically from committed
  * state only and mode("overwrite")s the same e=E dirs, so crash
  * residue is REPLACED, never reconciled — the anti-join healing the
  * row-append indexes need is structurally unnecessary here. An
  * in-place [[build]] wipes the dir roots (posts/fwd/stars/tombs/rev)
  * first so a previous life's committed epochs cannot leak.
  * Single-writer, like every graft index layout.
  *
  * [[delete]] (takedown/recrawl) is where components SPLIT: removing
  * a doc removes its chunk memberships, and a hub's star edges must
  * re-hang on the minimum survivor. The full postings (`posts/`,
  * hash-bucketed) and forward index (`fwd/`, doc-bucketed) exist
  * precisely to make that local: the delete resolves the victims'
  * roots, expands those components by reverse closure over the
  * pointer table, re-runs connected components over ONLY the
  * survivors' chunk stars, and rewrites one row per surviving member
  * of an affected component. Cost is O(affected components), plus one
  * scan of the pointer table per closure round (the table holds
  * connected docs and dead roots, not the corpus — the honest bound;
  * a dst-bucketed mirror would prune it at the price of doubling
  * every write). Victims land in `tombs/` and are anti-joined by
  * every reader; [[compactTo]] folds them out physically and
  * flattens every chain to depth 1. A tombstoned id cannot be
  * re-appended until a compaction folds it out (re-ingest after
  * takedown is compact-then-append), matching the citation index's
  * contract.
  *
  * Scale shape: append reads prune to the batch's hash buckets
  * (posts) and doc buckets (fwd); resolution frontiers prune to their
  * src buckets (stars/sb=). Shuffled rows are 16-byte (id, id) pairs
  * throughout; chunk text never enters the store. The component
  * fixed-point each epoch runs over O(batch) star edges + one row per
  * touched root — never the corpus.
  */
object ClusterStore {

  val HashBuckets = 64L
  val DocBuckets = 32L
  val SrcBuckets = 32L

  private val postSchema = StructType(Seq(
    StructField("chunk_hash", LongType), StructField("doc_id", LongType),
    StructField("e", LongType), StructField("hb", LongType)))
  private val fwdSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("chunk_hash", LongType),
    StructField("e", LongType), StructField("db", LongType)))
  private val starSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType),
    StructField("e", LongType), StructField("sb", LongType)))
  private val tombSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("e", LongType)))

  private def writeMeta(spark: SparkSession, dir: String, epoch: Long,
      nDocs: Long): Unit =
    spark.range(1)
      .select(lit(epoch).as("epoch"), lit(nDocs).as("n_docs"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_cs_meta")

  /** (-1, 0) on a cold dir: epoch -1 commits nothing, so every e>=0
    * residue dir is invisible until its writer commits. */
  private def readMeta(spark: SparkSession, dir: String): (Long, Long) =
    if (!IndexIo.exists(spark, s"$dir/_cs_meta")) (-1L, 0L)
    else {
      val r = spark.read.parquet(s"$dir/_cs_meta").head()
      (r.getAs[Long]("epoch"), r.getAs[Long]("n_docs"))
    }

  private def committed(spark: SparkSession, dir: String, sub: String,
      schema: StructType, epoch: Long): DataFrame =
    IndexIo.readOr(spark, s"$dir/$sub", schema).filter(col("e") <= epoch)

  private def postsC(spark: SparkSession, dir: String, epoch: Long) =
    committed(spark, dir, "posts", postSchema, epoch)
  private def fwdC(spark: SparkSession, dir: String, epoch: Long) =
    committed(spark, dir, "fwd", fwdSchema, epoch)
  private def starsC(spark: SparkSession, dir: String, epoch: Long) =
    committed(spark, dir, "stars", starSchema, epoch)
  private def tombsC(spark: SparkSession, dir: String, epoch: Long) =
    committed(spark, dir, "tombs", tombSchema, epoch)
      .select(col("doc_id")).distinct()

  private val revSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("e", LongType)))

  /** Membership-generation registry (`rev/e=N/`, one row per doc
    * [[upsert]] revised in that epoch): a doc's CURRENT chunk
    * memberships are its rows from its max registered epoch — its
    * ingest rows if never revised. Written with the revising epoch's
    * dirs, committed by the same meta flip. */
  private def memberEpochs(spark: SparkSession, dir: String,
      epoch: Long): DataFrame =
    committed(spark, dir, "rev", revSchema, epoch)
      .groupBy(col("doc_id")).agg(max(col("e")).as("me"))

  /** Generation filter for posts/fwd membership rows: unregistered
    * docs keep every row (they only ever wrote one epoch); revised
    * docs keep their max-registered epoch's rows only. One
    * size-guarded join against the O(revised docs) registry
    * ([[IndexIo.maybeBroadcast]]: the registry grows without bound
    * between compactions, so the hint must not be forced). */
  private def currentRows(rows: DataFrame, me: DataFrame): DataFrame =
    rows.join(IndexIo.maybeBroadcast(me), Seq("doc_id"), "left")
      .filter(col("me").isNull || col("e") === col("me"))
      .drop("me")

  /** One epoch's FIVE dirs, overwritten as a unit (replay heals by
    * replacement). Empty frames still land their e=E dir so a stale
    * same-numbered dir from a torn previous life cannot outlive this
    * commit — including `rev/e=E`: append/delete overwrite it with an
    * empty frame precisely so a torn upsert's registry residue at the
    * same epoch number cannot be committed by a different verb's meta
    * flip (which would pin the residue docs' membership generation to
    * an epoch holding no membership rows and lose them at compaction). */
  private def writeEpoch(spark: SparkSession, dir: String, e: Long,
      posts: DataFrame, fwd: DataFrame, stars: DataFrame,
      tombs: DataFrame, rev: DataFrame): Unit = {
    posts.select(col("chunk_hash"), col("doc_id"),
        pmod(col("chunk_hash"), lit(HashBuckets)).as("hb"))
      .write.partitionBy("hb").mode("overwrite").parquet(s"$dir/posts/e=$e")
    fwd.select(col("doc_id"), col("chunk_hash"),
        pmod(col("doc_id"), lit(DocBuckets)).as("db"))
      .write.partitionBy("db").mode("overwrite").parquet(s"$dir/fwd/e=$e")
    stars.select(col("src"), col("dst"),
        pmod(col("src"), lit(SrcBuckets)).as("sb"))
      .write.partitionBy("sb").mode("overwrite").parquet(s"$dir/stars/e=$e")
    tombs.select(col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/tombs/e=$e")
    rev.select(col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/rev/e=$e")
  }

  private def emptyPosts(s: SparkSession) = IndexIo.emptyFrame(s,
    StructType(postSchema.take(2)))
  private def emptyStars(s: SparkSession) = IndexIo.emptyFrame(s,
    StructType(starSchema.take(2)))
  private def emptyTombs(s: SparkSession) = IndexIo.emptyFrame(s,
    StructType(tombSchema.take(1)))
  private def emptyRev(s: SparkSession) = IndexIo.emptyFrame(s,
    StructType(revSchema.take(1)))

  /** Build from scratch at epoch 0, wiping any previous life of `dir`
    * (stale committed epochs must not leak into the new index). */
  def build(chunks: DataFrame, dir: String): Unit = {
    val spark = chunks.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    Seq("posts", "fwd", "stars", "tombs", "rev").foreach { sub =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      p.getFileSystem(conf).delete(p, true)
    }
    writeMeta(spark, dir, -1L, 0L)
    append(chunks, dir)
  }

  /** Ingest a batch of (doc_id, chunk_hash) rows: O(batch) state
    * growth, component labels stay exactly the share-graph minima.
    * Docs already committed (including tombstoned ids) are dropped,
    * so a replayed or overlapping batch is safe. */
  def append(chunks: DataFrame, dir: String): Unit = {
    val spark = chunks.sparkSession
    val (epoch, nDocs) = readMeta(spark, dir)
    val e = epoch + 1L
    val ch0 = chunks
      .select(col("doc_id").cast("long").as("doc_id"),
        col("chunk_hash").cast("long").as("chunk_hash"))
      .na.drop().distinct()
    // committed-doc anti-join, pruned to the batch's doc buckets
    val dbs = ch0.select(pmod(col("doc_id"), lit(DocBuckets)).as("db"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val already = fwdC(spark, dir, epoch)
      .filter(col("db").isin(dbs: _*))
      .select(col("doc_id")).distinct()
    val ch = ch0.join(already, Seq("doc_id"), "left_anti").localCheckpoint()
    val newDocs = ch.select(col("doc_id")).distinct()
    val nNew = newDocs.count()
    if (nNew == 0) return // fully-committed replay (or all-known batch)

    // probe: existing hub per touched hash = min live committed doc,
    // read pruned to the batch's hash buckets
    val hbs = ch.select(pmod(col("chunk_hash"), lit(HashBuckets)).as("hb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val tmb = tombsC(spark, dir, epoch)
    val oldHubs = currentRows(postsC(spark, dir, epoch)
        .filter(col("hb").isin(hbs: _*))
        .join(ch.select(col("chunk_hash")).distinct(), Seq("chunk_hash")),
        memberEpochs(spark, dir, epoch))
      .join(tmb, Seq("doc_id"), "left_anti")
      .groupBy(col("chunk_hash")).agg(min(col("doc_id")).as("old_hub"))
    val batchMin = ch.groupBy(col("chunk_hash"))
      .agg(min(col("doc_id")).as("batch_min"))
    val hubs = batchMin.join(oldHubs, Seq("chunk_hash"), "left")
      .select(col("chunk_hash"), col("old_hub"),
        least(col("batch_min"), col("old_hub")).as("hub"))
      .localCheckpoint()

    // star edges for the component fixed point: batch docs to their
    // chunks' hubs, plus old hub -> new hub where a smaller batch doc
    // took a chunk over; existing endpoints enter as their ROOTS
    val roots = resolveAt(spark, dir, epoch,
      hubs.filter(col("old_hub").isNotNull)
        .select(col("old_hub").as("id")).distinct()).localCheckpoint()
    def rooted(c: String) = coalesce(col("root"), col(c))
    val eDoc = ch.join(hubs, Seq("chunk_hash"))
      .select(col("doc_id").as("a"), col("hub").as("b"))
    val eHub = hubs.filter(col("old_hub").isNotNull &&
        col("old_hub") =!= col("hub"))
      .select(col("old_hub").as("a"), col("hub").as("b"))
    val edges = eDoc.unionByName(eHub)
      .join(roots.withColumnRenamed("id", "a"), Seq("a"), "left")
      .select(rooted("a").as("a2"), col("b"))
      .join(roots.withColumnRenamed("id", "b"), Seq("b"), "left")
      .select(col("a2").as("d1"), rooted("b").as("d2"))
      .filter(col("d1") =!= col("d2"))
    val labels =
      if (edges.isEmpty) IndexIo.emptyFrame(spark, StructType(Seq(
        StructField("doc_id", LongType), StructField("cluster", LongType))))
      else Dedup.connectedComponents(edges).localCheckpoint()

    // pointer rows: connected new docs + absorbed roots (from the
    // fixed point) + path compression for the chased hubs
    val hubFlat = hubs.filter(col("old_hub").isNotNull)
      .select(col("old_hub").as("id")).distinct()
      .join(roots, Seq("id"))
      .join(labels.withColumnRenamed("doc_id", "root"), Seq("root"), "left")
      .select(col("id").as("src"),
        coalesce(col("cluster"), col("root")).as("dst"))
    val stars = labels
      .select(col("doc_id").as("src"), col("cluster").as("dst"))
      .unionByName(hubFlat)
      .filter(col("src") =!= col("dst"))
      .distinct()

    writeEpoch(spark, dir, e, ch.select(col("chunk_hash"), col("doc_id")),
      ch.select(col("doc_id"), col("chunk_hash")), stars,
      emptyTombs(spark), emptyRev(spark))
    writeMeta(spark, dir, e, nDocs + nNew)
  }

  /** Take down documents. Components containing a victim may SPLIT;
    * every surviving member of an affected component is re-pointed at
    * its new (possibly unchanged) representative in one epoch.
    * Already-dead or unknown ids are ignored, so replays are safe. */
  def delete(victims: DataFrame, dir: String): Unit = {
    val spark = victims.sparkSession
    val (epoch, nDocs) = readMeta(spark, dir)
    val e = epoch + 1L
    val v0 = victims.select(col("doc_id").cast("long").as("doc_id"))
      .na.drop().distinct()
    val vdbs = v0.select(pmod(col("doc_id"), lit(DocBuckets)).as("db"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val tmb = tombsC(spark, dir, epoch)
    val live = fwdC(spark, dir, epoch).filter(col("db").isin(vdbs: _*))
      .select(col("doc_id")).distinct()
      .join(tmb, Seq("doc_id"), "left_anti")
    val vs = v0.join(live, Seq("doc_id"), "left_semi").localCheckpoint()
    if (vs.isEmpty) return

    // affected components: victims' roots, then every doc whose chain
    // can reach them (reverse closure over the pointer table; the
    // resolution filter below drops stale-chain overapproximation)
    val vRoots = resolveAt(spark, dir, epoch,
      vs.select(col("doc_id").as("id")))
      .select(col("root")).distinct().localCheckpoint()
    val acc = reverseClosure(spark, dir, epoch,
      vRoots.select(col("root").as("v")))
    val candDbs = acc.select(pmod(col("v"), lit(DocBuckets)).as("db"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val candLive = fwdC(spark, dir, epoch).filter(col("db").isin(candDbs: _*))
      .select(col("doc_id")).distinct()
      .join(tmb, Seq("doc_id"), "left_anti")
      .join(acc.withColumnRenamed("v", "doc_id"), Seq("doc_id"), "left_semi")
    val candRes = resolveAt(spark, dir, epoch,
      candLive.select(col("doc_id").as("id")))
    val members = candRes
      .join(vRoots, Seq("root"), "left_semi")
      .select(col("id").as("doc_id")).localCheckpoint()
    val survivors = members.join(vs, Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // recompute components over the survivors' chunk stars only; a
    // chunk shared with a doc OUTSIDE the affected components cannot
    // exist (sharing a chunk implies same component)
    val sdbs = survivors.select(pmod(col("doc_id"), lit(DocBuckets)).as("db"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val sChunks = currentRows(
        fwdC(spark, dir, epoch).filter(col("db").isin(sdbs: _*)),
        memberEpochs(spark, dir, epoch))
      .join(survivors, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("chunk_hash"))
    val hub2 = sChunks.groupBy(col("chunk_hash"))
      .agg(min(col("doc_id")).as("hub"))
    val edges2 = sChunks.join(hub2, Seq("chunk_hash"))
      .filter(col("doc_id") =!= col("hub"))
      .select(col("doc_id").as("d1"), col("hub").as("d2"))
    val labels2 =
      if (edges2.isEmpty) IndexIo.emptyFrame(spark, StructType(Seq(
        StructField("doc_id", LongType), StructField("cluster", LongType))))
      else Dedup.connectedComponents(edges2)
    // every surviving member gets a fresh row — self-rows included, to
    // sever stale chains that ran through a victim or a dead root
    val stars = survivors.join(labels2, Seq("doc_id"), "left")
      .select(col("doc_id").as("src"),
        coalesce(col("cluster"), col("doc_id")).as("dst"))

    writeEpoch(spark, dir, e, emptyPosts(spark),
      emptyPosts(spark).select(col("doc_id"), col("chunk_hash")),
      stars, vs, emptyRev(spark))
    writeMeta(spark, dir, e, nDocs - vs.count())
  }

  /** DOCUMENT REVISION — re-chunked content replaces a doc's
    * memberships in place, in ONE epoch that may both SPLIT and MERGE
    * components: the old chunks' links sever (delete's machinery —
    * affected components re-cluster over surviving memberships) and
    * the new chunks may connect the doc to ANY other component
    * (append's machinery — external hubs absorbed by root pointer
    * rows, never member rewrites). `chunks` is the target docs' NEW
    * complete (doc_id, chunk_hash) relation; unknown docs are
    * admitted as inserts, tombstoned ids stay dead.
    *
    * Mechanics: targets' affected components expand by reverse
    * closure (delete's bound — O(affected components)); the working
    * set W = members ∪ targets re-clusters over unchanged members'
    * current memberships + targets' new chunks; each new chunk also
    * probes the live corpus OUTSIDE W for its external hub (append's
    * bucket-pruned read), whose resolved ROOT joins the fixed point
    * and takes one transition row on absorption. Every W member gets
    * a fresh pointer row (self-rows sever stale chains — delete's
    * rule); the `rev/e=E` registry row flips the doc's membership
    * generation, so its old posts/fwd rows stop counting without
    * being rewritten ([[compactTo]] folds them physically). The
    * whole epoch commits at the meta flip; a torn run replays by
    * dir replacement, and a fully-committed replay (same docs, same
    * chunk sets) is detected and skipped — state-level exactly-once
    * under at-least-once delivery. */
  def upsert(chunks: DataFrame, dir: String): Unit = {
    val spark = chunks.sparkSession
    val (epoch, nDocs) = readMeta(spark, dir)
    val e = epoch + 1L
    val ch0 = chunks
      .select(col("doc_id").cast("long").as("doc_id"),
        col("chunk_hash").cast("long").as("chunk_hash"))
      .na.drop().distinct()
    val tmb = tombsC(spark, dir, epoch)
    val ch = ch0.join(tmb, Seq("doc_id"), "left_anti").localCheckpoint()
    if (ch.isEmpty) return
    val targets = ch.select(col("doc_id")).distinct().localCheckpoint()
    val me = memberEpochs(spark, dir, epoch).localCheckpoint()

    // committed-replay detection: if every target's CURRENT membership
    // set already equals the batch's rows, this revision is applied —
    // return without burning an epoch (state-level idempotence)
    val tdbs = targets.select(pmod(col("doc_id"), lit(DocBuckets)).as("db"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val curRows = currentRows(
      fwdC(spark, dir, epoch).filter(col("db").isin(tdbs: _*)), me)
      .join(targets, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("chunk_hash")).localCheckpoint()
    val inserts = targets.join(
      fwdC(spark, dir, epoch).filter(col("db").isin(tdbs: _*))
        .select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti").localCheckpoint()
    if (ch.join(curRows, Seq("doc_id", "chunk_hash"), "left_anti").isEmpty &&
        curRows.join(ch, Seq("doc_id", "chunk_hash"), "left_anti").isEmpty)
      return

    // affected components: targets' roots, then reverse closure (the
    // delete discipline — old chunks' co-holders share a component
    // with their target by definition, so the closure covers every
    // doc a sever can re-label)
    val tRoots = resolveAt(spark, dir, epoch,
      targets.select(col("doc_id").as("id")))
      .select(col("root")).distinct().localCheckpoint()
    val acc = reverseClosure(spark, dir, epoch,
      tRoots.select(col("root").as("v")))
    val candDbs = acc.select(pmod(col("v"), lit(DocBuckets)).as("db"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val candLive = fwdC(spark, dir, epoch).filter(col("db").isin(candDbs: _*))
      .select(col("doc_id")).distinct()
      .join(tmb, Seq("doc_id"), "left_anti")
      .join(acc.withColumnRenamed("v", "doc_id"), Seq("doc_id"), "left_semi")
    val members = resolveAt(spark, dir, epoch,
        candLive.select(col("doc_id").as("id")))
      .join(tRoots, Seq("root"), "left_semi")
      .select(col("id").as("doc_id")).localCheckpoint()
    // the working set: every member of an affected component plus the
    // targets themselves (inserts included)
    val w = members.unionByName(targets).distinct().localCheckpoint()

    // working memberships: unchanged members keep their current rows,
    // targets contribute their NEW chunks
    val wdbs = w.select(pmod(col("doc_id"), lit(DocBuckets)).as("db"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val wRows = currentRows(
        fwdC(spark, dir, epoch).filter(col("db").isin(wdbs: _*)), me)
      .join(w, Seq("doc_id"), "left_semi")
      .join(targets, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("chunk_hash"))
      .unionByName(ch.select(col("doc_id"), col("chunk_hash")))
      .localCheckpoint()

    // in-W star edges: doc -> min W holder per chunk
    val wHub = wRows.groupBy(col("chunk_hash"))
      .agg(min(col("doc_id")).as("whub")).localCheckpoint()
    val eIn = wRows.join(wHub, Seq("chunk_hash"))
      .filter(col("doc_id") =!= col("whub"))
      .select(col("doc_id").as("d1"), col("whub").as("d2"))
    // cross-component merges: targets' new chunks held by live docs
    // OUTSIDE W (bucket-pruned probe, the append discipline); the
    // external hub enters the fixed point as its resolved ROOT
    val hbs = ch.select(pmod(col("chunk_hash"), lit(HashBuckets)).as("hb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val extHubs = currentRows(postsC(spark, dir, epoch)
        .filter(col("hb").isin(hbs: _*))
        .join(ch.select(col("chunk_hash")).distinct(), Seq("chunk_hash")), me)
      .join(tmb, Seq("doc_id"), "left_anti")
      .join(w, Seq("doc_id"), "left_anti")
      .groupBy(col("chunk_hash")).agg(min(col("doc_id")).as("ext_hub"))
      .localCheckpoint()
    val extRoots = resolveAt(spark, dir, epoch,
      extHubs.select(col("ext_hub").as("id")).distinct()).localCheckpoint()
    val eOut = extHubs.join(wHub, Seq("chunk_hash"))
      .join(extRoots.withColumnRenamed("id", "ext_hub"), Seq("ext_hub"))
      .select(col("whub").as("d1"), col("root").as("d2"))
      .filter(col("d1") =!= col("d2"))
    val edges = eIn.unionByName(eOut)
    val labels =
      if (edges.isEmpty) IndexIo.emptyFrame(spark, StructType(Seq(
        StructField("doc_id", LongType), StructField("cluster", LongType))))
      else Dedup.connectedComponents(edges).localCheckpoint()

    // fresh pointer rows: every W member (self-rows INCLUDED — they
    // sever stale chains, delete's rule), one transition row per
    // absorbed external root (labels cover them: eOut's endpoints),
    // and path compression for the chased external hubs
    val wStars = w.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id").as("src"),
        coalesce(col("cluster"), col("doc_id")).as("dst"))
    val extRootStars = labels.join(w, Seq("doc_id"), "left_anti")
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id").as("src"), col("cluster").as("dst"))
    val extHubFlat = extHubs.select(col("ext_hub").as("id")).distinct()
      .join(extRoots, Seq("id"))
      .join(labels.withColumnRenamed("doc_id", "root"), Seq("root"), "left")
      .select(col("id").as("src"),
        coalesce(col("cluster"), col("root")).as("dst"))
      .filter(col("src") =!= col("dst"))
    val stars = wStars.unionByName(extRootStars).unionByName(extHubFlat)
      .distinct()

    writeEpoch(spark, dir, e, ch.select(col("chunk_hash"), col("doc_id")),
      ch.select(col("doc_id"), col("chunk_hash")), stars,
      emptyTombs(spark), targets.select(col("doc_id")))
    writeMeta(spark, dir, e, nDocs + inserts.count())
  }

  /** Current (doc_id, rep) for every live committed document — the
    * bulk serve/export read (one linear pass over fwd's id column +
    * the bounded pointer chase). */
  def assignments(spark: SparkSession, dir: String): DataFrame =
    assignmentsAsOf(spark, dir, readMeta(spark, dir)._1)

  /** SNAPSHOT (time-travel) serve: the assignment map exactly as it
    * stood when epoch `asOf` committed — the read a reproducible
    * training run pins its dedup state to ("train X used corpus
    * snapshot E"). Every store table is already epoch-scoped on disk
    * (rows carry their writing epoch under `e=N` partition dirs, a
    * commit flips one meta pointer), so serving history costs a
    * partition filter, not a copy: epochs later than `asOf` are never
    * listed, and the pointer chase, tombstone set, and membership
    * rows all stop at the snapshot boundary. Valid for any
    * 0 ≤ asOf ≤ [[committedEpoch]]; [[compactTo]] trades this history
    * for file geometry (the fold re-bases the survivors to epoch 0) —
    * the vacuum bargain every epoch-versioned table format strikes. */
  def assignmentsAsOf(spark: SparkSession, dir: String, asOf: Long): DataFrame = {
    val (epoch, _) = readMeta(spark, dir)
    require(asOf >= 0L && asOf <= epoch,
      s"as-of epoch $asOf outside the committed history [0, $epoch]" +
        (if (epoch < 0L) " — cold store, nothing committed" else ""))
    val docs = fwdC(spark, dir, asOf).select(col("doc_id")).distinct()
      .join(tombsC(spark, dir, asOf), Seq("doc_id"), "left_anti")
    resolveAt(spark, dir, asOf, docs.select(col("doc_id").as("id")))
      .select(col("id").as("doc_id"), col("root").as("rep"))
  }

  /** The committed epoch counter (−1 on a cold dir) — the handle a
    * caller records at ingest time to pin an [[assignmentsAsOf]]
    * snapshot later. */
  def committedEpoch(spark: SparkSession, dir: String): Long =
    readMeta(spark, dir)._1

  /** Cross-snapshot diff — the incremental-refresh read between two
    * training runs: which docs entered, left, or changed cluster
    * between snapshot `from` and snapshot `to`, so only the affected
    * slices re-export instead of the whole corpus. One full-outer
    * join of the two epoch-filtered assignment maps (both sides hash
    * on doc_id — one shuffle each, no extra pass over the store);
    * `change` ∈ inserted / deleted / relabeled / kept. */
  def diffAsOf(spark: SparkSession, dir: String, from: Long,
      to: Long): DataFrame = {
    require(from <= to, s"diff runs forward: from=$from > to=$to")
    // the two snapshot resolutions are independent pointer-jumping
    // loops, each a chain of eager rounds — overlap them
    // (IndexIo.concurrently; r20 optimization, guide §2.6). Results
    // unchanged: same two assignment maps, same full-outer fuse.
    val (a, b) = IndexIo.concurrently(
      assignmentsAsOf(spark, dir, from)
        .select(col("doc_id"), col("rep").as("old_rep")),
      assignmentsAsOf(spark, dir, to)
        .select(col("doc_id"), col("rep").as("new_rep")))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("change",
        when(col("old_rep").isNull, lit("inserted"))
          .when(col("new_rep").isNull, lit("deleted"))
          .when(col("old_rep") === col("new_rep"), lit("kept"))
          .otherwise(lit("relabeled")))
  }

  private val feedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("old_rep", LongType),
    StructField("new_rep", LongType), StructField("change", StringType),
    StructField("e", LongType)))

  /** One epoch's assignment delta at O(affected) cost — the writer-
    * side CDC primitive [[emitChangeFeed]] persists. [[diffAsOf]]
    * resolves the WHOLE live corpus on both sides (right for rare
    * snapshot-to-snapshot reads, wrong per epoch at 100 TB); this
    * derives the candidate set from what epoch `n` actually wrote:
    * a doc's rep can only change if its chain passes through a node
    * whose outgoing pointer changed (= a `stars e=n` src), or the doc
    * itself entered (`fwd e=n`) or left (`tombs e=n`). Reverse
    * closure over those seeds, resolve the candidates at n−1 and n,
    * keep the non-`kept` rows. Completeness is oracle-proven (q167):
    * the union of per-epoch deltas hash-matches the from-scratch
    * per-epoch truth diffs. */
  private def epochDelta(spark: SparkSession, dir: String,
      n: Long): DataFrame = {
    require(n >= 1L, s"epoch delta needs a predecessor: n=$n")
    val starsN = IndexIo.readOr(spark, s"$dir/stars/e=$n",
      StructType(starSchema.filterNot(_.name == "e")))
    val fwdN = IndexIo.readOr(spark, s"$dir/fwd/e=$n",
      StructType(fwdSchema.filterNot(_.name == "e")))
    val tombsN = IndexIo.readOr(spark, s"$dir/tombs/e=$n",
      StructType(tombSchema.take(1)))
    val seeds = starsN.select(col("src").as("v"))
      .unionByName(fwdN.select(col("doc_id").as("v")))
      .unionByName(tombsN.select(col("doc_id").as("v")))
      .distinct().localCheckpoint()
    val out = IndexIo.emptyFrame(spark, feedSchema).drop("e")
    if (seeds.isEmpty) return out
    val aff = reverseClosure(spark, dir, n, seeds)
    val affDbs = aff.select(pmod(col("v"), lit(DocBuckets)).as("db"))
      .distinct().collect().map(_.getLong(0)).toSeq
    def liveAt(e: Long) =
      fwdC(spark, dir, e).filter(col("db").isin(affDbs: _*))
        .select(col("doc_id")).distinct()
        .join(tombsC(spark, dir, e), Seq("doc_id"), "left_anti")
        .join(aff.withColumnRenamed("v", "doc_id"), Seq("doc_id"),
          "left_semi")
    val before = resolveAt(spark, dir, n - 1L,
        liveAt(n - 1L).select(col("doc_id").as("id")))
      .select(col("id").as("doc_id"), col("root").as("old_rep"))
    val after = resolveAt(spark, dir, n,
        liveAt(n).select(col("doc_id").as("id")))
      .select(col("id").as("doc_id"), col("root").as("new_rep"))
    before.join(after, Seq("doc_id"), "full_outer")
      .withColumn("change",
        when(col("old_rep").isNull, lit("inserted"))
          .when(col("new_rep").isNull, lit("deleted"))
          .when(col("old_rep") === col("new_rep"), lit("kept"))
          .otherwise(lit("relabeled")))
      .filter(col("change") =!= "kept")
  }

  /** CHANGE DATA FEED: persist each committed epoch's assignment
    * delta to `feedDir/e=N` (doc_id, old_rep, new_rep,
    * change ∈ inserted/deleted/relabeled), at O(affected) cost per
    * epoch — see [[epochDelta]]. Emission is DERIVED, not captured:
    * it reads the store's epoch dirs after the fact, so it heals
    * itself — call it any time and it writes exactly the epochs in
    * (max(baseline, last complete feed epoch), committedEpoch], each
    * dir an idempotent overwrite. A crash between a store commit and
    * its feed write leaves no hole: the next call re-derives the
    * missing epoch from the store. Pair the feed with
    * [[assignmentsAsOf]](baseline): baseline snapshot + replayed
    * deltas ≡ the final map (spec-pinned). Feeds for epochs folded
    * away by [[compactTo]] cannot be derived after the fold — emit
    * before compacting. */
  def emitChangeFeed(spark: SparkSession, dir: String, feedDir: String,
      baseline: Long = 0L): Unit = {
    val (committed, _) = readMeta(spark, dir)
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
      epochDelta(spark, dir, n).coalesce(1)
        .write.mode("overwrite").parquet(s"$feedDir/e=$n")
    }
  }

  /** Read the feed (all epochs; filter `e` for a window). */
  def changeFeed(spark: SparkSession, feedDir: String): DataFrame =
    IndexIo.readOr(spark, feedDir, feedSchema)

  /** Point resolution for an arbitrary doc set (pruned to the
    * frontier's src buckets each hop). Unknown/dead ids resolve to
    * themselves — pair with a liveness probe if that matters. */
  def resolve(spark: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val (epoch, _) = readMeta(spark, dir)
    resolveAt(spark, dir, epoch, docs.select(col("doc_id").cast("long").as("id")))
      .select(col("id").as("doc_id"), col("root").as("rep"))
  }

  /** The chase: from each id's own max-epoch row, follow each hop's
    * max-epoch row while epochs strictly increase; no row (or no
    * strictly newer row) means the current node is the root. Chain
    * depth is bounded by epochs-since-compaction (hub rows are
    * path-compressed at append), so the loop is short; each round's
    * pointer read prunes to the frontier's src buckets. */
  /** Every node whose pointer chain (over stars ≤ `epoch`) can reach a
    * seed: BFS over REVERSED star edges, frontier-deduped per round —
    * the shared engine behind delete's affected-component expansion,
    * upsert's working-set growth, and the change feed's candidate
    * set. Overapproximates through stale chains by design; callers
    * re-resolve the candidates and filter. Input/output column: `v`. */
  private def reverseClosure(spark: SparkSession, dir: String,
      epoch: Long, seeds: DataFrame): DataFrame = {
    val starsAll = starsC(spark, dir, epoch).localCheckpoint()
    var acc = seeds.select(col("v")).distinct().localCheckpoint()
    var frontier = acc
    var rounds = 0
    val maxRounds = roundBound(epoch)
    while (!frontier.isEmpty && rounds < maxRounds) {
      val next = starsAll.join(frontier, starsAll("dst") === frontier("v"))
        .select(col("src").as("v")).distinct()
        .join(acc, Seq("v"), "left_anti").localCheckpoint()
      acc = acc.unionByName(next).localCheckpoint()
      frontier = next
      rounds += 1
    }
    require(frontier.isEmpty,
      s"cluster-store reverse closure did not terminate in " +
        s"$maxRounds rounds at epoch $epoch — corrupt star-edge state; " +
        "rebuild the store")
    acc
  }

  private def resolveAt(spark: SparkSession, dir: String, epoch: Long,
      ids: DataFrame): DataFrame = {
    val stars = starsC(spark, dir, epoch)
    var frontier = ids.select(col("id"), col("id").as("cur"),
      lit(-1L).as("cur_e")).localCheckpoint()
    var settled: DataFrame = IndexIo.emptyFrame(spark, StructType(Seq(
      StructField("id", LongType), StructField("root", LongType))))
    var rounds = 0
    val maxRounds = roundBound(epoch)
    while (!frontier.isEmpty && rounds < maxRounds) {
      val sbs = frontier.select(pmod(col("cur"), lit(SrcBuckets)).as("sb"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val best = stars.filter(col("sb").isin(sbs: _*))
        .groupBy(col("src"))
        .agg(max(struct(col("e"), col("dst"))).as("m"))
        .select(col("src"), col("m.e").as("best_e"), col("m.dst").as("best_dst"))
      val j = frontier.join(best, frontier("cur") === best("src"), "left")
        .localCheckpoint()
      val adv = j.filter(col("best_e").isNotNull &&
          col("best_e") > col("cur_e"))
        .select(col("id"), col("best_dst").as("cur"), col("best_e").as("cur_e"))
        .localCheckpoint()
      val nextSettled = settled.unionByName(
        j.filter(col("best_e").isNull || col("best_e") <= col("cur_e"))
          .select(col("id"), col("cur").as("root"))).localCheckpoint()
      // the round's successors (adv, nextSettled) are materialized —
      // the superseded frontier/settled and the intermediate join are
      // dead; release their blocks now (r20 optimization, guide §5 —
      // the Graph.directedLoop checkpoint discipline)
      import org.apache.spark.sql.graftbridge.CheckpointBridge
      CheckpointBridge.unpinCheckpoint(frontier)
      CheckpointBridge.unpinCheckpoint(settled)
      CheckpointBridge.unpinCheckpoint(j)
      settled = nextSettled
      frontier = adv
      rounds += 1
    }
    require(frontier.isEmpty,
      s"cluster-store resolve: pointer chase did not terminate in " +
        s"$maxRounds rounds at epoch $epoch — chains legitimately grow " +
        "one hop per absorbing epoch since the last compaction, so if " +
        "this store is just long-lived, compactTo it (flattens every " +
        "chain to depth 1); a chase exceeding epoch+margin rounds on a " +
        "compacted store means corrupt epoch-monotonicity")
    settled
  }

  /** Pointer-chase / reverse-closure round bound (round-14 advice
    * item 4): chain depth legitimately grows one hop per absorbing
    * epoch since the last compaction (only chased hubs are path-
    * compressed at append), so a fixed 64 would abort VALID reads on a
    * store taken through >64 append/delete epochs without compaction.
    * Derive the bound from the committed epoch counter — build and
    * compactTo both reset it to 0 — with a floor for young stores and
    * a small margin over the theoretical depth. */
  private[scale] def roundBound(epoch: Long): Long =
    math.max(64L, epoch + 2L)

  /** Fold to a fresh epoch-0 layout at `destDir`: tombstoned postings
    * physically dropped, every chain flattened to depth 1 (a doc's
    * row, if any, points directly at its representative), tombstones
    * and transition history gone. */
  def compactTo(spark: SparkSession, dir: String, destDir: String): Unit = {
    val (epoch, _) = readMeta(spark, dir)
    val tmb = tombsC(spark, dir, epoch)
    val livePosts = currentRows(postsC(spark, dir, epoch),
        memberEpochs(spark, dir, epoch))
      .join(tmb, Seq("doc_id"), "left_anti")
      .select(col("chunk_hash"), col("doc_id")).localCheckpoint()
    val asg = assignments(spark, dir).localCheckpoint()
    val conf = spark.sessionState.newHadoopConf()
    Seq("posts", "fwd", "stars", "tombs", "rev").foreach { sub =>
      val p = new org.apache.hadoop.fs.Path(s"$destDir/$sub")
      p.getFileSystem(conf).delete(p, true)
    }
    writeEpoch(spark, destDir, 0L, livePosts,
      livePosts.select(col("doc_id"), col("chunk_hash")),
      asg.select(col("doc_id").as("src"), col("rep").as("dst"))
        .filter(col("src") =!= col("dst")),
      emptyTombs(spark), emptyRev(spark))
    writeMeta(spark, destDir, 0L, asg.count())
  }

  /** Compaction-need probe — the store's decay axes differ from the
    * bucketed layouts': the dominant cost of NOT compacting is
    * pointer-chain depth, which grows one hop per absorbing epoch
    * since the last fold (every resolve pays one frontier round per
    * hop — [[roundBound]] is the same fact as a safety margin), so
    * the first signal is simply the committed epoch count; the second
    * is tombstone + revision-registry bytes vs the three data trees
    * (read-side anti-join/generation-filter state, folded by
    * [[compactTo]]). Listing-only cost. */
  def needsCompaction(spark: SparkSession, dir: String,
      maxEpochs: Long = 32L, maxCdcFraction: Double = 0.2): Boolean = {
    val (epoch, _) = readMeta(spark, dir)
    val mainBytes = Seq("posts", "fwd", "stars")
      .map(s => IndexIo.compactionStats(spark, s"$dir/$s", Nil).mainBytes)
      .sum
    val cdcBytes = Seq("tombs", "rev")
      .map(s => IndexIo.compactionStats(spark, s"$dir/$s", Nil).mainBytes)
      .sum
    epoch + 1L > maxEpochs ||
      cdcBytes.toDouble / math.max(1L, mainBytes) > maxCdcFraction
  }

  /** Detector: torn epochs (any e=N dir beyond the meta pointer) and
    * doc-count drift both flip this false. Committed state is never
    * touched by a tear, so serving stays correct while this reports
    * the pending replay. */
  def consistent(spark: SparkSession, dir: String): Boolean = {
    val (epoch, nDocs) = readMeta(spark, dir)
    val conf = spark.sessionState.newHadoopConf()
    val maxDir = Seq("posts", "fwd", "stars", "tombs", "rev").flatMap { sub =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq
        .map(_.getPath.getName).filter(_.startsWith("e="))
        .map(_.stripPrefix("e=").toLong)
    }
    val noTorn = maxDir.forall(_ <= epoch)
    val liveCount = fwdC(spark, dir, epoch).select(col("doc_id")).distinct()
      .join(tombsC(spark, dir, epoch), Seq("doc_id"), "left_anti")
      .count()
    noTorn && liveCount == nDocs
  }
}
