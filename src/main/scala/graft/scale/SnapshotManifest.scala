package graft.scale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The RUN-LEVEL reproducibility pin: a training run reads through
  * several serving layouts at once (dedup via LSH/clusters, retrieval
  * via BM25, ANN via IVF/IVF+PQ, slices via the z layout, graph via
  * the citation index), and "run X used ANN state E" is only half an
  * audit — the full question is "run X used THESE epochs of ALL its
  * indexes". With the as-of matrix closed at 7/7 (every layout serves
  * any committed epoch), the missing piece is one tiny durable
  * artifact naming the pinned epoch per layout. That is this manifest:
  * [[capture]] records each layout's current [[committedEpoch]] under
  * a run-chosen name, [[write]]/[[read]] persist it next to the run's
  * other config, and serving the run's view later is each family's
  * as-of read at its pinned epoch — immutable under any amount of
  * later ingest (SnapshotManifestSpec mutates every layout after the
  * capture and pins serve-equality; q189 composes a PINNED hybrid
  * retrieval across two index families against a from-scratch oracle).
  *
  * Control-plane sized by construction: one row per layout. The pins
  * survive exactly as long as the layouts' histories — each family's
  * compaction/rebuild verb is its documented history vacuum, so a
  * pinned run must either re-capture after maintenance or emit change
  * feeds before it (the feed restore contracts bridge the gap). */
object SnapshotManifest {

  final case class Pin(name: String, family: String, dir: String,
      epoch: Long)

  /** The family's committed snapshot counter — one dispatcher so a
    * manifest can pin heterogeneous layouts in one call. `idCol` is
    * only consulted by the z layout (its id column is caller-named). */
  def committedEpochOf(spark: SparkSession, family: String, dir: String,
      idCol: String = "id"): Long = family match {
    case "lsh" => LshIndex.committedEpoch(spark, dir)
    case "bm" => BmIndex.committedEpoch(spark, dir)
    case "ivf" => IvfIndex.committedEpoch(spark, dir)
    case "ivfpq" => IvfPqIndex.committedEpoch(spark, dir)
    case "zorder" => Layout.committedEpoch(spark, dir, idCol)
    case "clusters" => ClusterStore.committedEpoch(spark, dir)
    case "citation" => CitationIndex.committedEpoch(spark, dir)
    case other => throw new IllegalArgumentException(
      s"unknown layout family '$other' — one of lsh/bm/ivf/ivfpq/" +
        "zorder/clusters/citation")
  }

  /** Pin every layout's CURRENT committed epoch. `layouts` =
    * (name, family, dir); a cold layout (epoch −1) refuses loudly —
    * pinning nothing is a run-config error, not a snapshot. */
  def capture(spark: SparkSession,
      layouts: Seq[(String, String, String)],
      idCols: Map[String, String] = Map.empty): Seq[Pin] =
    layouts.map { case (name, family, dir) =>
      val e = committedEpochOf(spark, family, dir,
        idCols.getOrElse(name, "id"))
      require(e >= 0L,
        s"layout '$name' ($family at $dir) has nothing committed")
      Pin(name, family, dir, e)
    }

  /** Persist the manifest (one tiny parquet file; `overwrite` so a
    * re-capture under the same path replaces it atomically at the
    * job-commit level). */
  def write(spark: SparkSession, pins: Seq[Pin], path: String): Unit = {
    import spark.implicits._
    pins.toDF().coalesce(1).write.mode("overwrite").parquet(path)
  }

  def read(spark: SparkSession, path: String): Seq[Pin] = {
    import spark.implicits._
    spark.read.parquet(path).as[Pin].collect().toSeq
  }

  /** Driver-side lookup: the pinned epoch of one named layout. */
  def epochOf(pins: Seq[Pin], name: String): Long =
    pins.find(_.name == name).map(_.epoch).getOrElse(
      throw new IllegalArgumentException(
        s"manifest has no layout named '$name' " +
          s"(has: ${pins.map(_.name).mkString(", ")})"))
}
