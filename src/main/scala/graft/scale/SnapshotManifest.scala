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
  * feeds before it (the feed restore contracts bridge the gap). Pin
  * stability is modulo heals of PRE-capture tears: a torn verb's
  * residue that a later replay heals at its original stamp appears
  * retroactively at every asOf ≥ its stamp, so capture a consistent
  * index (each family's `consistent` probe) when bit-stability under
  * replays matters.
  *
  * [[register]] makes a pin VISIBLE to maintenance (round-16 verdict
  * item 1): a marker file under the layout's own `_pins/` dir that
  * [[Maintenance.maybeCompact]] consults before folding — a live pin
  * either blocks the fold or forces the change feed out first, so an
  * auto-compaction loop can never silently vacuum the history a
  * pinned training run still reads. [[release]] retires the markers
  * when the run no longer needs its snapshot. */
object SnapshotManifest {

  /** Minimal JSON string escaping for the marker body — pin names and
    * families are caller-chosen strings, and a raw interpolation of a
    * quote or backslash would leave malformed JSON in the marker
    * (round-17 advisor). Epoch extraction is regex-based and immune,
    * but the marker is a durable audit artifact other tools may parse. */
  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Register each pin at its layout: an atomic marker
    * `<dir>/_pins/<runName>.json` (temp+rename — the `_ivf_meta.json`
    * recipe) recording the pinned epoch. `runName` scopes the marker
    * so several runs can pin the same layout independently; a
    * re-register under the same run name replaces — by renaming OVER
    * the live marker where the FS allows it (POSIX rename(2) replaces
    * atomically; no un-pinned window), falling back to delete+rename
    * only on filesystems that refuse an existing destination.
    *
    * RACE CONTRACT: a register CAN race an in-flight fold of the same
    * layout ([[Maintenance.compactInPlace]]'s retire→publish swap) —
    * the mkdirs here may recreate the layout dir between the fold's
    * two renames, which on local FS/HDFS nests the publish rename
    * INSIDE the recreated dir. Both windows are closed mechanically on
    * the fold's side: maybeCompact re-checks `_pins/` immediately
    * before the retire rename (a pin landing during the build aborts),
    * and compactInPlace VERIFIES the publish landed at the target (its
    * `_generation` a direct child, no nested temp dir) — a mis-publish
    * unwinds to the abort shape with this register's markers preserved
    * into the restored layout (round-18 advisor). Registering
    * processes should still serialize registration with their own
    * maintenance loop (in the single-writer twins the register happens
    * between micro-batches, never inside one); the verification is the
    * backstop for pins from OTHER processes, which no in-process gate
    * can see. */
  def register(spark: SparkSession, pins: Seq[Pin],
      runName: String): Unit = {
    require(runName.nonEmpty && !runName.exists(c => c == '/' || c == '.'),
      s"run name '$runName' must be a plain token (no '/' or '.')")
    val conf = spark.sessionState.newHadoopConf()
    pins.foreach { pin =>
      val dir = new org.apache.hadoop.fs.Path(pin.dir, "_pins")
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      val tmp = new org.apache.hadoop.fs.Path(dir,
        s".$runName.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, false)
      try out.write(
        (s"""{"run":"${jsonEscape(runName)}",""" +
          s""""name":"${jsonEscape(pin.name)}",""" +
          s""""family":"${jsonEscape(pin.family)}","epoch":${pin.epoch}}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val target = new org.apache.hadoop.fs.Path(dir, s"$runName.json")
      // rename-over-existing first: on POSIX-backed local/HDFS-like
      // stores this atomically replaces and the pin is NEVER absent;
      // only if the FS refuses (rename returned false with the target
      // still present) fall back to the delete+rename window
      if (!fs.rename(tmp, target)) {
        fs.delete(target, false)
        if (!fs.rename(tmp, target)) {
          fs.delete(tmp, false)
          throw new java.io.IOException(
            s"snapshot-manifest: failed to publish pin $target")
        }
      }
    }
  }

  /** Retire a run's pin markers from every pinned layout — the fold
    * gate reopens. Unknown markers are no-ops (release is idempotent). */
  def release(spark: SparkSession, pins: Seq[Pin],
      runName: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    pins.foreach { pin =>
      val target = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(pin.dir, "_pins"), s"$runName.json")
      target.getFileSystem(conf).delete(target, false)
    }
  }

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
