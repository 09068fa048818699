package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering so that
  * a parquet table filtered on k columns prunes on all of them — the
  * standard lakehouse trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) for
  * serving reads like "this user band in this time band on this
  * shard" without maintaining k sort orders. The 2-D API is the k = 2
  * case of the k-D one ([[zValueK]]/[[zIntervalsK]]/
  * [[writeZOrderedK]]), bit-identical, so existing layouts cannot
  * drift.
  *
  * The z-value computation is pure Column bit algebra (shifts/AND/OR),
  * codegen'd per row with zero shuffle. Because interleaving is
  * `spread(x) + 2·spread(y)` with both spreads strictly increasing, an
  * axis-aligned box `[xlo,xhi]×[ylo,yhi]` maps into the single z
  * interval `[z(xlo,ylo), z(xhi,yhi)]` — a coarse but always-correct
  * prefilter (ZOrderSpec proves the bound; a production variant would
  * add BIGMIN splitting to tighten it).
  *
  * Layout = partition by the COARSE z bucket (`z div bucketWidth`,
  * a directory column Spark partition-prunes at planning time — the
  * same mechanism as IvfIndex's cluster_id dirs), sort files by the
  * FINE z (row-group min/max locality inside surviving files). A box
  * read therefore (1) lists only the bucket directories intersecting
  * the box's z interval, (2) pushes the fine z range to the parquet
  * reader, (3) re-applies the exact per-dimension predicates. At
  * 100 TB the bucket count scales with the table (target ~1 GB per
  * file) and the serving read's listing cost is O(buckets hit), never
  * O(files).
  */
object Layout {

  /** Interleave the low `bits` bits of k columns into a z-value:
    * bit i of column j lands at position i·k + j (column 0 in the
    * lowest lane — for k = 2 exactly the classic x-even/y-odd Morton
    * order, so the 2-D API below is the k = 2 case of this one and
    * on-disk z values cannot drift between the two). Pure bit
    * algebra — stays inside whole-stage codegen. k·bits must fit a
    * non-negative long. */
  def zValueK(cols: Seq[Column], bits: Int = 8): Column = {
    val k = cols.size
    require(k >= 1 && k * bits <= 62,
      s"z-order geometry out of range: $k dims x $bits bits")
    (for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_.bitwiseOR(_))
  }

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) into a z-value — [[zValueK]] at k = 2. */
  def zValue(x: Column, y: Column, bits: Int = 8): Column =
    zValueK(Seq(x, y), bits)

  /** Driver-side twin of [[zValueK]] for computing box bounds. */
  def zValueOfK(xs: Seq[Long], bits: Int = 8): Long = {
    val k = xs.size
    (for { i <- 0 until bits; (x, j) <- xs.zipWithIndex } yield
      ((x >> i) & 1L) << (i * k + j))
      .foldLeft(0L)(_ | _)
  }

  /** Driver-side twin of [[zValue]] for computing box bounds. */
  def zValueOf(x: Long, y: Long, bits: Int = 8): Long =
    zValueOfK(Seq(x, y), bits)

  /** The valid coarse z interval covering an axis-aligned box. */
  def zRange(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
      bits: Int = 8): (Long, Long) =
    (zValueOf(xlo, ylo, bits), zValueOf(xhi, yhi, bits))

  /** EXACT cover of a k-dimensional box's z-values as a short list of
    * disjoint intervals — the BIGMIN-family refinement of a single
    * coarse interval, via 2^k-tree recursion: a cell fully inside the
    * box contributes its (contiguous — aligned power-of-two Morton
    * cells are z-runs) interval, a disjoint cell nothing, a
    * straddling cell recurses into its 2^k children. Adjacent
    * intervals are merged, so the list length is O(box surface in
    * tree cells). Driver-side arithmetic only — at serving time the
    * intervals become an OR of range predicates (and a bucket id set
    * for partition pruning).
    *
    * Exactness (spec-pinned at k = 2 and k = 3): z ∈ one of the
    * intervals ⟺ the point ∈ box, for coordinates within the `bits`
    * range — so a tight box read needs NO residual per-dimension
    * predicates. */
  def zIntervalsK(lo: Seq[Long], hi: Seq[Long],
      bits: Int = 8): Seq[(Long, Long)] = {
    val k = lo.size
    require(hi.size == k && k >= 1 && k * bits <= 62,
      s"z-order geometry out of range: $k dims x $bits bits")
    val max = (1L << bits) - 1
    require((0 until k).forall(j =>
      lo(j) >= 0 && lo(j) <= hi(j) && hi(j) <= max),
      s"box out of $bits-bit range")
    def rec(corner: Seq[Long], level: Int): List[(Long, Long)] = {
      val size = 1L << level
      val upper = corner.map(_ + size - 1)
      if ((0 until k).exists(j => corner(j) > hi(j) || upper(j) < lo(j)))
        Nil
      else if ((0 until k).forall(j =>
          corner(j) >= lo(j) && upper(j) <= hi(j)))
        List((zValueOfK(corner, bits), zValueOfK(upper, bits)))
      else {
        val h = size >> 1
        (0 until (1 << k)).toList.flatMap { m =>
          rec(corner.zipWithIndex.map { case (c, j) =>
            c + (((m >> j) & 1) * h) }, level - 1)
        }
      }
    }
    rec(Seq.fill(k)(0L), bits).sortBy(_._1)
      .foldLeft(List.empty[(Long, Long)]) {
        case ((alo, ahi) :: acc, (lo2, hi2)) if lo2 <= ahi + 1 =>
          (alo, math.max(ahi, hi2)) :: acc
        case (acc, iv) => iv :: acc
      }.reverse
  }

  /** 2-D cover — [[zIntervalsK]] at k = 2 (bit-identical to the
    * pre-k-D quadtree implementation; ZOrderSpec pins exactness). */
  def zIntervals(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
      bits: Int = 8): Seq[(Long, Long)] =
    zIntervalsK(Seq(xlo, ylo), Seq(xhi, yhi), bits)

  /** Write `df` z-clustered on k key columns: coarse z bucket as a
    * partition directory (planning-time pruning), fine z sorted
    * within files (row-group pruning). One shuffle, on the bucket
    * id. */
  def writeZOrderedK(df: DataFrame, keys: Seq[Column], path: String,
      bucketWidth: Long = 4096L, bits: Int = 8): Unit = {
    df.withColumn("z", zValueK(keys, bits))
      .withColumn("z_bucket", expr(s"z div ${bucketWidth}L"))
      .repartition(col("z_bucket"))
      // (z_bucket, z), not z alone: a partitionBy write whose input is
      // NOT sorted by the partition columns inserts its own
      // partition-column sort, which is not stable and scrambles the
      // fine z runs inside each file; leading with z_bucket satisfies
      // the writer's required ordering so the z order survives to disk
      // (ZOrderSpec pins per-file sortedness)
      .sortWithinPartitions(col("z_bucket"), col("z"))
      .write.partitionBy("z_bucket").mode("overwrite").parquet(path)
    // the overwrite replaced every file a pre-existing handle listed:
    // new generation, so stale handles refuse instead of FNF-looping
    IndexIo.stampGeneration(df.sparkSession, path)
  }

  /** 2-D write — [[writeZOrderedK]] at k = 2. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String,
      bucketWidth: Long = 4096L, bits: Int = 8): Unit =
    writeZOrderedK(df, Seq(x, y), path, bucketWidth, bits)

  /** Box read over a z-ordered layout: bucket-range partition filter
    * (prunes directories at planning), fine z-interval pushdown, then
    * the exact per-dimension predicates. */
  def boxScan(zdf: DataFrame, x: Column, y: Column,
      xlo: Long, xhi: Long, ylo: Long, yhi: Long,
      bucketWidth: Long = 4096L, bits: Int = 8): DataFrame = {
    val (zlo, zhi) = zRange(xlo, xhi, ylo, yhi, bits)
    zdf.filter(col("z_bucket").between(zlo / bucketWidth, zhi / bucketWidth))
      .filter(col("z").between(zlo, zhi))
      .filter(x.between(xlo, xhi) && y.between(ylo, yhi))
  }

  /** Max bucket ids an enumerated `isin` partition filter may carry
    * before [[boxScanTight]] falls back to per-interval `between`
    * ranges: a big box at a small bucketWidth would otherwise build a
    * driver-side literal list (and an In predicate) of
    * O(z-range/bucketWidth) ids — thousands of planning-time literals
    * for a filter the merged interval ranges state in O(intervals). */
  val MaxEnumeratedBuckets = 100

  /** Tight box read: the [[zIntervals]] exact cover as an OR of z
    * ranges + a bucket partition filter (planning-time pruning either
    * way). No residual per-dimension predicates — the cover is exact,
    * and the bucket set is a subset of [[boxScan]]'s bucket range, so
    * pruning is at least as good, usually strictly better for boxes
    * whose corner z-values are far apart.
    *
    * The bucket filter's SIZE is bounded: small sets enumerate as
    * `isin`; past [[MaxEnumeratedBuckets]] ids the filter becomes an
    * OR of per-interval `between` ranges over the merged (sorted,
    * disjoint) interval list — O(intervals) predicate nodes, ≤ ~8·bits,
    * regardless of bucketWidth. Partition pruning handles range
    * predicates on directory columns exactly as it handles In
    * (ZOrderSpec pins both the bounded plan and result identity). */
  def boxScanTight(zdf: DataFrame,
      xlo: Long, xhi: Long, ylo: Long, yhi: Long,
      bucketWidth: Long = 4096L, bits: Int = 8): DataFrame =
    boxScanTightK(zdf, Seq(xlo, ylo), Seq(xhi, yhi), bucketWidth, bits)

  /** k-D tight box read — [[boxScanTight]]'s contract over a
    * [[writeZOrderedK]] layout: the [[zIntervalsK]] exact cover as an
    * OR of z ranges + the same bounded bucket partition filter. */
  def boxScanTightK(zdf: DataFrame, lo: Seq[Long], hi: Seq[Long],
      bucketWidth: Long = 4096L, bits: Int = 8): DataFrame = {
    val ivs = zIntervalsK(lo, hi, bits)
    // per-interval bucket ranges, re-merged (adjacent intervals can
    // land in adjacent-or-same buckets)
    val ranges = ivs.map { case (lo, hi) => (lo / bucketWidth, hi / bucketWidth) }
      .foldLeft(List.empty[(Long, Long)]) {
        case ((alo, ahi) :: acc, (lo, hi)) if lo <= ahi + 1 =>
          (alo, math.max(ahi, hi)) :: acc
        case (acc, iv) => iv :: acc
      }.reverse
    val enumerated = ranges.map { case (lo, hi) => hi - lo + 1 }.sum
    val bucketPred =
      if (enumerated <= MaxEnumeratedBuckets)
        col("z_bucket").isin(
          ranges.flatMap { case (lo, hi) => lo to hi }: _*)
      else
        ranges.map { case (lo, hi) => col("z_bucket").between(lo, hi) }
          .reduce(_ || _)
    // Deliberately an OR of betweens, NOT [[graft.functions
    // .InIntervals]]: here z is a STORED column, so each branch is one
    // column reference (O(intervals) generated bytes — no janino
    // hazard) and, critically, plain range predicates push down to
    // parquet min/max stats and partition pruning, which a custom
    // expression never does. InIntervals is for COMPUTED z (q99/q176's
    // inline interleave, which OR branches would re-generate per
    // branch — the round-17 64 KB fallback).
    zdf.filter(bucketPred)
      .filter(ivs.map { case (lo, hi) => col("z").between(lo, hi) }
        .reduce(_ || _))
  }

  /** Incrementally add rows to an existing z layout: same bucketing,
    * same in-file z sort, `append` mode — new files land inside the
    * existing `z_bucket=N/` directories, so every serving read
    * (coarse or tight) sees old + new through the same pruned scan.
    * O(batch) work; no rewrite of resident files. Mirrors
    * IvfIndex.append's contract: the layout parameters (bits,
    * bucketWidth, and the x/y bucketization) are frozen at build
    * time and must match. */
  def appendZOrderedK(df: DataFrame, keys: Seq[Column], path: String,
      bucketWidth: Long = 4096L, bits: Int = 8): Unit =
    df.withColumn("z", zValueK(keys, bits))
      .withColumn("z_bucket", expr(s"z div ${bucketWidth}L"))
      .repartition(col("z_bucket"))
      .sortWithinPartitions(col("z_bucket"), col("z")) // see writeZOrderedK
      .write.partitionBy("z_bucket").mode("append").parquet(path)

  /** 2-D append — [[appendZOrderedK]] at k = 2. */
  def appendZOrdered(df: DataFrame, x: Column, y: Column, path: String,
      bucketWidth: Long = 4096L, bits: Int = 8): Unit =
    appendZOrderedK(df, Seq(x, y), path, bucketWidth, bits)

  /** [[appendZOrdered]] made IDEMPOTENT under epoch replay — the
    * foreachBatch contract a streaming ingest loop needs
    * ([[graft.streaming.IncrementalZLayout]]). No side table: the
    * layout's own rows are the committed-id record, and a batch only
    * ever lands in the bucket dirs its z-values map to, so the replay
    * probe reads JUST those buckets (a partition filter — at the
    * default geometry ≤ 16 dirs exist in total, and a small batch
    * touches fewer) and anti-joins the batch's `idCol` against what
    * already landed there. Crash anywhere mid-append → the re-run
    * appends only the rows whose files didn't commit; a fully-landed
    * replay is a complete no-op. Cost: O(touched buckets) read +
    * O(batch) write, never layout-sized. */
  /** REPLAY-idempotent, NOT key-idempotent: the anti-join reads
    * existing ids only in the buckets the batch TOUCHES, which is
    * exactly right for an epoch replay (same rows land in the same
    * buckets, the probe stays partition-pruned) and exactly wrong for
    * a known id arriving with MOVED coordinates — its committed row
    * sits in a bucket this batch never touches, so a second serving
    * row lands and both generations serve (found by
    * ZOrderPropertySpec). A moved key is a ROW REVISION: route it
    * through [[upsertZOrdered]], whose registry is the key-level
    * dedup. Checking all buckets here would turn every append into a
    * full-layout scan — the O(batch) contract this method exists
    * for. */
  def appendZOrderedIdempotent(df: DataFrame, idCol: String,
      x: Column, y: Column, path: String,
      bucketWidth: Long = 4096L, bits: Int = 8): Unit =
    appendZOrderedIdempotentK(df, idCol, Seq(x, y), path, bucketWidth, bits)

  /** k-D replay-idempotent append — same contract at k dims. */
  def appendZOrderedIdempotentK(df: DataFrame, idCol: String,
      keys: Seq[Column], path: String,
      bucketWidth: Long = 4096L, bits: Int = 8): Unit = {
    val spark = df.sparkSession
    val withZ = df.withColumn("z", zValueK(keys, bits))
      .withColumn("z_bucket", expr(s"z div ${bucketWidth}L"))
      .localCheckpoint()
    // id→epoch registry FIRST, data second ([[IvfIndex.append]]'s tear
    // argument: a phantom (id, e) row gates in nothing at snapshots,
    // while data without a registry row would read as build-era epoch
    // 0); the anti-join keeps a replayed epoch from re-stamping
    // the id's home bucket rides on the registry row so the change
    // feed's insert confirmation can partition-prune to exactly the
    // epoch's own bucket dirs (round-16 verdict item 4); min() keeps
    // the join 1:1 under duplicate batch rows
    val homeBuckets = withZ.select(col(idCol), col("z_bucket"))
      .groupBy(col(idCol)).agg(min(col("z_bucket")).as("z_bucket"))
    val freshIds = withZ.select(col(idCol)).distinct()
      .join(docRegistry(spark, path, idCol).select(col(idCol)),
        Seq(idCol), "left_anti")
      .join(homeBuckets, Seq(idCol), "left")
      .localCheckpoint()
    if (freshIds.count() > 0L)
      freshIds.withColumn("e",
          lit(committedEpoch(spark, path, idCol) + 1L))
        .select(col(idCol), col("e"), col("z_bucket"))
        .write.mode("append").parquet(s"$path/_z_docs")
    val buckets = withZ.select(col("z_bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val existing = IndexIo.readOr(spark, path, withZ.schema)
      .filter(col("z_bucket").isin(buckets: _*))
      .select(col(idCol))
    val fresh = withZ.join(existing, Seq(idCol), "left_anti")
      .localCheckpoint()
    if (fresh.count() > 0L)
      fresh.repartition(col("z_bucket"))
        .sortWithinPartitions(col("z_bucket"), col("z"))
        .write.partitionBy("z_bucket").mode("append").parquet(path)
  }

  /** ROW REVISION — the upsert verb on the z layout ([[IvfIndex]]'s
    * pattern, for the same reason): a revised row's key columns move
    * it in (x, y) space, so its current generation must be free to
    * land in a DIFFERENT z-bucket directory than the stale one.
    * Revision rows live in their own bucketed subdir
    * (`_z_rev_rows/z_bucket=N/`, underscore-hidden from main-layout
    * reads), the `_z_rev` registry (idCol, rev) is the visibility
    * point, and [[readCurrent]] composes both trees — the z_bucket
    * partition filter of a box read pushes into each side of the
    * union, so serving stays bucket-pruned. Unknown ids are admitted
    * (upsert doubles as insert); monotone caller rev per id; a
    * replayed (batch, rev) is a pure heal via the (id, rev)
    * anti-joins. [[compactZOrderedTo]] with `foldRevisionsBy` folds
    * the generations away. */
  def upsertZOrdered(df: DataFrame, idCol: String, x: Column, y: Column,
      path: String, rev: Long, bucketWidth: Long = 4096L,
      bits: Int = 8): Unit =
    upsertZOrderedK(df, idCol, Seq(x, y), path, rev, bucketWidth, bits)

  /** k-D row revision — same contract at k dims. */
  def upsertZOrderedK(df: DataFrame, idCol: String, keys: Seq[Column],
      path: String, rev: Long, bucketWidth: Long = 4096L,
      bits: Int = 8): Unit = {
    require(rev > 0L, "revision must be positive")
    val spark = df.sparkSession
    val withZ = df.withColumn("z", zValueK(keys, bits))
      .withColumn("z_bucket", expr(s"z div ${bucketWidth}L"))
      .withColumn("rev", lit(rev))
      .localCheckpoint()
    if (withZ.isEmpty) return
    val reg = registry(spark, path, idCol)
    val stale = reg.groupBy(col(idCol)).agg(max(col("rev")).as("cur_rev"))
      .join(withZ.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
      .filter(col("cur_rev") > lit(rev)).count()
    require(stale == 0L,
      s"upsert rev=$rev is older than the current revision of $stale " +
        "rows — revisions must be monotone per id")
    val landed =
      if (!IndexIo.exists(spark, s"$path/_z_rev_rows"))
        spark.range(0).select(col("id").as(idCol))
      else spark.read.parquet(s"$path/_z_rev_rows")
        .filter(col("rev") === rev).select(col(idCol)).distinct()
    val fresh = withZ.join(landed, Seq(idCol), "left_anti").localCheckpoint()
    if (fresh.count() > 0L)
      fresh.repartition(col("z_bucket"))
        .sortWithinPartitions(col("z_bucket"), col("z"))
        .write.partitionBy("z_bucket").mode("append")
        .parquet(s"$path/_z_rev_rows")
    val freshReg = withZ.select(col(idCol), lit(rev).as("rev")).distinct()
      .join(reg.filter(col("rev") === rev).select(col(idCol)),
        Seq(idCol), "left_anti")
      .localCheckpoint()
    if (freshReg.count() > 0L)
      freshReg.withColumn("e",
          lit(committedEpoch(spark, path, idCol) + 1L))
        .write.mode("append").parquet(s"$path/_z_rev")
  }

  /** Surface the snapshot-epoch column on a CDC side table whose
    * files may predate it (the id column's type is caller-defined, so
    * these tables read schema-merged rather than schema-explicit —
    * they are O(revised)/O(deleted) small). */
  private def withE(df: DataFrame): DataFrame =
    if (df.columns.contains("e")) df
    else df.withColumn("e", lit(null).cast("long"))

  private def registry(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String): DataFrame =
    if (!IndexIo.exists(spark, s"$path/_z_rev"))
      spark.range(0).select(col("id").as(idCol), col("id").as("rev"),
        col("id").as("e"))
    else withE(spark.read.option("mergeSchema", "true")
      .parquet(s"$path/_z_rev"))

  private def tombstones(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String): DataFrame =
    if (!IndexIo.exists(spark, s"$path/_z_tombs"))
      spark.range(0).select(col("id").as(idCol), col("id").as("e"))
    else withE(spark.read.option("mergeSchema", "true")
      .parquet(s"$path/_z_tombs"))

  /** id→epoch commit registry (`_z_docs`) for snapshot reads: one row
    * per id APPENDED through [[appendZOrderedIdempotentK]] (written
    * FIRST, so a torn append leaves phantom rows that gate in
    * nothing); rows of the original [[writeZOrderedK]] build carry no
    * entry and read as epoch 0 through the as-of left join. */
  private def docRegistry(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String): DataFrame =
    if (!IndexIo.exists(spark, s"$path/_z_docs"))
      spark.range(0).select(col("id").as(idCol), col("id").as("e"))
    // mergeSchema: legacy rows predate the z_bucket column, and a plain
    // read would surface whichever schema it sampled (the readAt
    // discipline — callers tolerate the column's absence)
    else spark.read.option("mergeSchema", "true").parquet(s"$path/_z_docs")

  /** TAKE-DOWN — the delete verb on the z layout, completing its CDC
    * set (write/append/upsert/delete/compact): victim ids land in
    * `_z_tombs` (append-only; the anti-join makes a replayed batch a
    * no-op), [[readCurrent]] anti-joins them against BOTH trees at
    * read time — one broadcast of the O(deleted) id set — so a
    * deleted id's EVERY generation (main row, rev rows, registry
    * entries) stops serving unrewritten, and [[compactZOrderedTo]]
    * with `foldRevisionsBy` folds them physically. Family contract
    * ([[LshIndex.delete]]): a tombstoned id stays dead until a
    * compaction folds it out — re-ingest after takedown is
    * compact-then-append, never upsert-over-tombstone. */
  def deleteZOrdered(ids: DataFrame, idCol: String, path: String): Unit = {
    val spark = ids.sparkSession
    val fresh = ids.select(col(idCol)).na.drop().distinct()
      .join(tombstones(spark, path, idCol).select(col(idCol)),
        Seq(idCol), "left_anti")
      .localCheckpoint()
    if (fresh.count() > 0L)
      fresh.withColumn("e",
          lit(committedEpoch(spark, path, idCol) + 1L))
        .write.mode("append").parquet(s"$path/_z_tombs")
  }

  /** The current-generation view of a revised layout — what box reads
    * scan: a registered id's main-layout row drops, its max-rev
    * revision row (possibly in a DIFFERENT bucket) serves, and
    * tombstoned ids drop from both trees; each filter is one join
    * against an O(revised)/O(deleted) table — broadcast-hinted only
    * while the registry's size estimate stays under the session's
    * auto-broadcast threshold ([[IndexIo.maybeBroadcast]]; past it the
    * join plans as a shuffle the compaction discipline shrinks back) —
    * and a box read's z_bucket partition filter pushes into both sides
    * of the union. Never-revised, never-deleted layouts return the
    * plain read (zero overhead — the probes are file-existence
    * checks). */
  def readCurrent(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String): DataFrame =
    serveCurrent(spark, spark.read.parquet(path), path, idCol)

  private def serveCurrent(spark: org.apache.spark.sql.SparkSession,
      main: DataFrame, path: String, idCol: String): DataFrame = {
    val served =
      if (!IndexIo.exists(spark, s"$path/_z_rev")) main
      else {
        val cur = registry(spark, path, idCol)
          .groupBy(col(idCol)).agg(max(col("rev")).as("cur_rev"))
        val mainCur = main.join(
          IndexIo.maybeBroadcast(cur.select(col(idCol))),
          Seq(idCol), "left_anti")
        val revCur = spark.read.parquet(s"$path/_z_rev_rows")
          .join(IndexIo.maybeBroadcast(cur), Seq(idCol))
          .filter(col("rev") === col("cur_rev"))
          .drop("rev", "cur_rev")
        mainCur.unionByName(revCur)
      }
    if (!IndexIo.exists(spark, s"$path/_z_tombs")) served
    else served.join(
      IndexIo.maybeBroadcast(tombstones(spark, path, idCol).distinct()),
      Seq(idCol), "left_anti")
  }

  /** The committed snapshot counter ([[IvfIndex.committedEpoch]]'s
    * contract on the z layout): max epoch across the id→epoch
    * registry, the revision registry, and the tombstones. 0 right
    * after [[writeZOrderedK]] (build-era rows read as epoch 0) and on
    * any legacy layout; −1 on a cold path. Because the idempotent
    * append stamps its registry FIRST, a torn append advances the
    * counter with a phantom epoch that serves its predecessor's state
    * until the replay completes the batch. */
  def committedEpoch(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String): Long = {
    val es = docRegistry(spark, path, idCol).select(col("e"))
      .unionByName(registry(spark, path, idCol).select(col("e")))
      .unionByName(tombstones(spark, path, idCol).select(col("e")))
    val r = es.agg(max(coalesce(col("e"), lit(0L)))).collect()(0)
    if (!r.isNullAt(0)) r.getLong(0)
    else if (IndexIo.exists(spark, path)) 0L
    else -1L
  }

  /** SNAPSHOT read — [[readCurrent]] exactly as the layout stood when
    * epoch `asOf` committed: main rows gate by their id's commit
    * epoch in `_z_docs` (build-era rows with no entry are epoch 0),
    * revisions by the registry rows at ≤ asOf (later revisions serve
    * their OLD generation — possibly from a different bucket, which
    * is why both trees share a box read's z_bucket partition filter),
    * deletions by the tombstone rows at ≤ asOf. Three narrow
    * epoch-filtered joins over O(appended)/O(revised)/O(deleted)
    * tables — serving history never copies the layout. Valid for any
    * 0 ≤ asOf ≤ [[committedEpoch]]; [[compactZOrderedTo]] is the
    * history vacuum (the destination carries no epoch state — every
    * surviving row re-bases to epoch 0). */
  def readCurrentAsOf(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, asOf: Long): DataFrame =
    serveCurrentAsOf(spark, spark.read.parquet(path), path, idCol, asOf)

  private def serveCurrentAsOf(spark: org.apache.spark.sql.SparkSession,
      main: DataFrame, path: String, idCol: String,
      asOf: Long): DataFrame = {
    val ce = committedEpoch(spark, path, idCol)
    require(asOf >= 0L && asOf <= ce,
      s"as-of epoch $asOf outside the committed history [0, $ce]" +
        (if (ce < 0L) " — cold layout, nothing committed" else ""))
    // one row per id before the LEFT join (the registry is 1:1 by the
    // append anti-join; min(e) keeps the join duplicate-proof even
    // against healed-tear file duplication)
    val docsE = docRegistry(spark, path, idCol)
      .groupBy(col(idCol)).agg(min(coalesce(col("e"), lit(0L))).as("e"))
    val mainAt =
      if (!IndexIo.exists(spark, s"$path/_z_docs")) main
      else main.join(IndexIo.maybeBroadcast(docsE), Seq(idCol), "left")
        .filter(coalesce(col("e"), lit(0L)) <= asOf).drop("e")
    val served =
      if (!IndexIo.exists(spark, s"$path/_z_rev")) mainAt
      else {
        val cur = registry(spark, path, idCol)
          .filter(coalesce(col("e"), lit(0L)) <= asOf)
          .groupBy(col(idCol)).agg(max(col("rev")).as("cur_rev"))
        val mainCur = mainAt.join(
          IndexIo.maybeBroadcast(cur.select(col(idCol))),
          Seq(idCol), "left_anti")
        val revCur = spark.read.parquet(s"$path/_z_rev_rows")
          .join(IndexIo.maybeBroadcast(cur), Seq(idCol))
          .filter(col("rev") === col("cur_rev"))
          .drop("rev", "cur_rev")
        mainCur.unionByName(revCur)
      }
    if (!IndexIo.exists(spark, s"$path/_z_tombs")) served
    else served.join(
      IndexIo.maybeBroadcast(tombstones(spark, path, idCol)
        .filter(coalesce(col("e"), lit(0L)) <= asOf)
        .select(col(idCol)).distinct()),
      Seq(idCol), "left_anti")
  }

  /** CHANGE DATA FEED — [[graft.scale.ClusterStore.emitChangeFeed]]'s
    * contract on the z layout: persist each committed epoch's id-level
    * delta to `feedDir/e=N` as (id, change ∈ inserted/revised/deleted,
    * rev), at O(affected) cost per epoch — exactly the rows the
    * epoch's verb committed, derived POST-HOC from the epoch stamps
    * (inserted ids additionally confirm their data landed, so a torn
    * append's phantom epoch emits an empty delta until its replay
    * heals it — re-derive by deleting that epoch's feed dir). Each
    * dir is an idempotent overwrite; a crash between a layout commit
    * and its feed write leaves no hole (the next call re-derives).
    * Restore contract (spec-pinned): baseline membership/revision
    * state + replayed deltas ≡ the as-of state at the last emitted
    * epoch. Feeds for epochs folded away by [[compactZOrderedTo]]
    * cannot be derived after the fold — emit before compacting. */
  def emitChangeFeed(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, feedDir: String,
      baseline: Long = 0L): Unit = {
    val committed = committedEpoch(spark, path, idCol)
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
    var halted = false
    (from to committed).foreach { n =>
      // insert confirmation, partition-pruned to the epoch's own
      // bucket dirs; the window HALTS at the first unconfirmed epoch
      // instead of pinning an empty dir a later replay heal would
      // invalidate (round-16 advice item 2 — the IvfIndex contract)
      if (!halted && n > 0L &&
          unconfirmedInserts(spark, path, idCol, n)
            .limit(1).count() > 0L)
        halted = true
      if (!halted) {
        val ins = docRegistry(spark, path, idCol)
          .filter(coalesce(col("e"), lit(0L)) === n)
          .select(col(idCol), lit("inserted").as("change"),
            lit(null).cast("long").as("rev"))
        val rev = registry(spark, path, idCol)
          .filter(coalesce(col("e"), lit(0L)) === n)
          .select(col(idCol), lit("revised").as("change"), col("rev"))
        val del = tombstones(spark, path, idCol)
          .filter(coalesce(col("e"), lit(0L)) === n)
          .select(col(idCol), lit("deleted").as("change"),
            lit(null).cast("long").as("rev"))
        ins.unionByName(rev).unionByName(del).coalesce(1)
          .write.mode("overwrite").parquet(s"$feedDir/e=$n")
      }
    }
  }

  /** The epoch's insert-confirmation probe ([[IvfIndex
    * .unconfirmedInserts]]'s contract on the z layout): ids registered
    * at epoch `n` without a landed main row, scanned through the
    * registry rows' own recorded z_bucket values as a partition
    * filter; a legacy epoch whose rows predate the column falls back
    * to the layout-wide id scan for that epoch only. */
  private[scale] def unconfirmedInserts(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, n: Long): DataFrame = {
    val reg = docRegistry(spark, path, idCol)
    val hasBuckets = reg.columns.contains("z_bucket")
    val regN = (if (hasBuckets)
        reg.select(col(idCol), col("e"), col("z_bucket"))
      else reg.select(col(idCol), col("e"),
        lit(null).cast("long").as("z_bucket")))
      .filter(coalesce(col("e"), lit(0L)) === n).drop("e")
      .localCheckpoint()
    val buckets = regN.select(col("z_bucket")).distinct().collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val landed =
      if (buckets.exists(_.isEmpty))
        spark.read.parquet(path).select(col(idCol))
      else
        spark.read.parquet(path)
          .filter(col("z_bucket").isin(buckets.flatten.toIndexedSeq: _*))
          .select(col(idCol))
    regN.select(col(idCol)).join(landed, Seq(idCol), "left_anti")
  }

  /** Read the feed (all epochs; filter `e` for a window). The id
    * column's type is caller-defined, so the read is schema-merged
    * over the tiny per-epoch dirs. */
  def changeFeed(spark: org.apache.spark.sql.SparkSession,
      feedDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(feedDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"no change feed at $feedDir")
    spark.read.option("basePath", feedDir).option("mergeSchema", "true")
      .parquet(feedDir)
  }

  /** Compaction-need probe ([[IndexIo.compactionStats]]): files per
    * z_bucket dir (append decay) and rev/tombstone bytes vs the main
    * tree (CDC decay). Listing-only cost. */
  def compactionStats(spark: org.apache.spark.sql.SparkSession,
      path: String): IndexIo.CompactionStats =
    IndexIo.compactionStats(spark, path,
      Seq(s"$path/_z_rev", s"$path/_z_rev_rows", s"$path/_z_tombs",
        s"$path/_z_docs"))

  /** The decision [[compactionStats]] exists to make: time to
    * [[compactZOrderedTo]]? */
  def needsCompaction(spark: org.apache.spark.sql.SparkSession,
      path: String, maxFilesPerBucket: Double = 8.0,
      maxCdcFraction: Double = 0.2): Boolean =
    compactionStats(spark, path)
      .needsCompaction(maxFilesPerBucket, maxCdcFraction)

  /** Copy-compaction of an append-decayed z layout into `destPath`
    * (the [[LshIndex.compactTo]] crash-safety shape: the source stays
    * untouched; the caller swaps dirs): every [[appendZOrdered]] adds
    * one file per touched bucket, and each small file carries its own
    * z-sorted run — so after k appends a box read opens k files per
    * surviving bucket and the per-file min/max z stats overlap instead
    * of tiling. This rewrite folds each bucket back to ONE file with a
    * single global z sort inside it (restoring the row-group pruning
    * the first write had), identical rows. The stored z/z_bucket
    * columns are REUSED, never recomputed — compaction cannot drift
    * from the frozen (bits, bucketWidth, bucketization) parameters
    * because it never reapplies them. Cost: one layout scan + one
    * bucket shuffle — layout-sized, never source-table-sized. */
  def compactZOrderedTo(spark: org.apache.spark.sql.SparkSession,
      path: String, destPath: String,
      foldRevisionsBy: Option[String] = None): Unit = {
    // foldRevisionsBy = the layout's id column: superseded generations
    // and tombstoned ids drop, current revision rows fold into their
    // buckets, and the destination carries no registry or tombstones —
    // indistinguishable from a layout written over the revised
    // survivors. A layout carrying CDC state REQUIRES the fold: a
    // geometry-only compaction would copy main rows while dropping the
    // underscore-hidden registry/tombstones, silently resurrecting
    // superseded generations and deleted ids at the destination.
    require(foldRevisionsBy.isDefined ||
      (!IndexIo.exists(spark, s"$path/_z_rev") &&
        !IndexIo.exists(spark, s"$path/_z_tombs")),
      "layout carries revision/tombstone state — compact with " +
        "foldRevisionsBy = Some(<id column>) so the fold serves it")
    foldRevisionsBy.fold(spark.read.parquet(path))(
        idCol => readCurrent(spark, path, idCol))
      .repartition(col("z_bucket"))
      .sortWithinPartitions(col("z_bucket"), col("z")) // see writeZOrdered
      .write.partitionBy("z_bucket").mode("overwrite").parquet(destPath)
    // the fold is the history vacuum: the destination must carry NO
    // epoch/CDC state even when destPath is a recycled dir whose
    // previous life had some (the overwrite above clears the tree, but
    // make the reset explicit — the LshIndex.compactTo discipline)
    val conf = spark.sessionState.newHadoopConf()
    Seq("_z_docs", "_z_rev", "_z_rev_rows", "_z_tombs").foreach { sub =>
      val sp = new org.apache.hadoop.fs.Path(s"$destPath/$sub")
      val fs = sp.getFileSystem(conf)
      if (fs.exists(sp)) fs.delete(sp, true)
    }
    // the fold output is a NEW generation (see IndexIo.stampGeneration)
    IndexIo.stampGeneration(spark, destPath)
  }

  /** The GENERATION-CHECKED serving handle for the z layout — the
    * [[IvfIndex.Handle]] contract on the third CorpusProportional
    * family ([[LayoutContract]]'s rule: data-proportional dirs need a
    * handle at scale — this layout's z_bucket count grows with the
    * table, so a per-read `spark.read.parquet` pays a listing that
    * grows with it). Open once; serve box reads by composing
    * [[boxScanTightK]] over [[readCurrentWith]]/[[readCurrentAsOfWith]]
    * — partition pruning binds at planning time against the cached
    * listing, and the CDC side tables (flat dirs, O(1) listings) are
    * read fresh per serve. Probes refuse with
    * [[StaleHandleException]] after a [[writeZOrderedK]] overwrite or
    * a compaction fold replaced the directory; appends do NOT bump the
    * generation (the handle serves exactly its listing's rows — the
    * documented listing-snapshot semantic). The check fires at
    * serving-call time; compose the serve+action with
    * [[IndexIo.servingRead]] to convert a fold landing MID-serve into
    * the typed refusal too (see [[IndexIo.requireFresh]]). */
  final case class Handle(relation: DataFrame, path: String,
      generation: Option[String])

  def openHandle(spark: org.apache.spark.sql.SparkSession,
      path: String): Handle =
    Handle(spark.read.parquet(path), path,
      IndexIo.generation(spark, path))

  def reopen(spark: org.apache.spark.sql.SparkSession,
      handle: Handle): Handle = openHandle(spark, handle.path)

  def isStale(spark: org.apache.spark.sql.SparkSession,
      handle: Handle): Boolean =
    IndexIo.generation(spark, handle.path) != handle.generation

  /** [[readCurrent]] through the generation-checked [[Handle]]. */
  def readCurrentWith(spark: org.apache.spark.sql.SparkSession,
      handle: Handle, idCol: String): DataFrame = {
    IndexIo.requireFresh(spark, handle.path, handle.generation)
    serveCurrent(spark, handle.relation, handle.path, idCol)
  }

  /** [[readCurrentAsOf]] through the generation-checked [[Handle]]. */
  def readCurrentAsOfWith(spark: org.apache.spark.sql.SparkSession,
      handle: Handle, idCol: String, asOf: Long): DataFrame = {
    IndexIo.requireFresh(spark, handle.path, handle.generation)
    serveCurrentAsOf(spark, handle.relation, handle.path, idCol, asOf)
  }
}
