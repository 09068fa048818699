package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering so that a
  * parquet table filtered on TWO columns prunes on both — the standard
  * lakehouse trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) for serving
  * reads like "this user band in this time band" without maintaining
  * two sort orders.
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

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) into a z-value. Pure bit algebra — stays inside
    * whole-stage codegen. */
  def zValue(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Driver-side twin of [[zValue]] for computing box bounds. */
  def zValueOf(x: Long, y: Long, bits: Int = 8): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  /** The valid coarse z interval covering an axis-aligned box. */
  def zRange(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
      bits: Int = 8): (Long, Long) =
    (zValueOf(xlo, ylo, bits), zValueOf(xhi, yhi, bits))

  /** Write `df` z-clustered on (x, y): coarse z bucket as a partition
    * directory (planning-time pruning), fine z sorted within files
    * (row-group pruning). One shuffle, on the bucket id. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String,
      bucketWidth: Long = 4096L, bits: Int = 8): Unit =
    df.withColumn("z", zValue(x, y, bits))
      .withColumn("z_bucket", expr(s"z div ${bucketWidth}L"))
      .repartition(col("z_bucket"))
      .sortWithinPartitions(col("z"))
      .write.partitionBy("z_bucket").mode("overwrite").parquet(path)

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
}
