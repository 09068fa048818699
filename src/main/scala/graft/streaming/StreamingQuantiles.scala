package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The streaming form of the [[graft.scale.Sketch]] rank-quantile
  * sketch — a continuously-maintained per-group length/token
  * distribution profile over an ingest stream (the monitor a pipeline
  * points at its crawl: "did today's slice shift the p95 document
  * length"), in the [[IncrementalNearDup]] foreachBatch-loop shape.
  *
  * State is the persisted KMV bottom-k sample (≤ k rows per group,
  * whatever the stream has carried), not executor memory — so the
  * horizon is unbounded and estimates are queryable at rest, between
  * runs, and from other sessions. Because the KMV union is EXACT
  * (bottomK(bottomK(A) ∪ bottomK(B)) = bottomK(A ∪ B), the
  * RankQuantileSpec pin), the streamed state after any number of
  * micro-batches is bit-identical to the batch sketch of everything
  * streamed — batch ≡ stream, spec-pinned, not approximately but as
  * frame equality.
  *
  * Delivery contract: exactly-once-EFFECTIVE under epoch replay — the
  * merge dedups on (g, id), so re-merging a replayed batch is a
  * no-op; and the state flip is crash-safe: the new sample writes to a
  * fresh epoch-stamped directory and a NEW numbered pointer file
  * (`_current-<seq>`, readers take the max) lands via temp+rename — a
  * rename to a fresh path, so nothing is ever deleted before the new
  * pointer exists and a crash anywhere leaves the previous complete
  * state current; the replay reconstructs the flip. Stale pointers and
  * superseded epoch dirs are garbage-collected only AFTER a successful
  * publish, so at most one orphan of each survives a crash.
  */
object StreamingQuantiles {

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def readPointer(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8).trim
    } finally in.close()
  }

  /** Numbered pointer files `_current-<seq>`, readers take the max seq
    * (round-14 advice item 3): the previous delete-then-rename flip of
    * a single `_current` had a crash window between the delete and the
    * rename in which NO pointer existed — the next mergeBatch would
    * read an empty state, merge only its own batch, and its vacuum
    * would then delete the orphaned previous-state dir, losing all
    * accumulated KMV state. Publishing a NEW pointer name via
    * temp+rename is atomic on any sane FS (rename to a fresh path,
    * nothing deleted first); stale lower-seq pointers are garbage-
    * collected AFTER the new one lands, and a crash between those two
    * steps just leaves two pointers of which readers pick the max. */
  private def pointerSeqs(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[(Long, Path)] =
    Option(fs.globStatus(new Path(dir, "_current-*")))
      .getOrElse(Array.empty).toSeq
      .flatMap { st =>
        st.getPath.getName.stripPrefix("_current-").toLongOption
          .map(_ -> st.getPath)
      }

  private def currentName(spark: SparkSession, dir: String): Option[String] = {
    val fs = fsOf(spark, dir)
    val numbered = pointerSeqs(fs, dir)
    if (numbered.nonEmpty)
      Some(readPointer(fs, numbered.maxBy(_._1)._2))
    else {
      // legacy single-`_current` layout (pre round-14) reads unchanged
      val p = new Path(dir, "_current")
      if (fs.exists(p)) Some(readPointer(fs, p)) else None
    }
  }

  /** The current persisted KMV state `(g, h, id, v)` — empty before
    * the first merge. */
  def sample(spark: SparkSession, dir: String): DataFrame =
    currentName(spark, dir) match {
      case Some(name) => spark.read.parquet(s"$dir/$name")
      case None =>
        spark.range(0).select(col("id").cast("string").as("g"),
          col("id").as("h"), col("id"), col("id").as("v"))
    }

  /** Quantile estimates from the current state (the
    * [[graft.scale.Sketch.rankQuantilesOf]] algebra — runs on ≤ k rows
    * per group). */
  def quantiles(spark: SparkSession, dir: String,
      pcts: Seq[Int] = Seq(25, 50, 75, 95)): DataFrame =
    graft.scale.Sketch.rankQuantilesOf(sample(spark, dir), pcts)

  /** The foreachBatch body, usable directly in batch replays/tests:
    * sketch the batch, KMV-merge with the stored state, flip the
    * pointer. Replaying an epoch is a no-op (the merge dedups on
    * (g, id)). `groupCol` must be string-typed (cast upstream) — the
    * empty pre-first-merge state is string-keyed, and unionByName
    * would reject a numeric group at merge time. */
  def mergeBatch(dir: String, groupCol: String, valCol: String,
      idCol: String, k: Int)(batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    val merged = graft.scale.Sketch.mergeRankSamples(
        sample(spark, dir),
        graft.scale.Sketch.rankSample(batch, groupCol, valCol, idCol, k),
        k)
      .localCheckpoint() // cut lineage off the dir being superseded
    val fs = fsOf(spark, dir)
    val next = s"sample-$epochId-${java.util.UUID.randomUUID().toString.take(8)}"
    merged.write.mode("overwrite").parquet(s"$dir/$next")
    // commit point: publish a NEW numbered pointer via temp + rename —
    // atomic (nothing is deleted before the rename; see pointerSeqs)
    val stale = pointerSeqs(fs, dir)
    val seq = (stale.map(_._1) :+ 0L).max + 1L
    val tmp = new Path(dir, s"._current.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try out.write(next.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val target = new Path(dir, f"_current-$seq%019d")
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"streaming-quantiles: failed to publish $target")
    }
    // garbage-collect AFTER the new pointer is live: stale numbered
    // pointers, the legacy single `_current` (if this dir predates the
    // numbered layout), then every superseded epoch dir — single-
    // operator maintenance, the IvfIndex.rebuild reader-isolation
    // contract. A crash anywhere in here leaves extra files, never a
    // missing state: readers take the max pointer.
    stale.foreach { case (_, p) => fs.delete(p, false) }
    fs.delete(new Path(dir, "_current"), false)
    Option(fs.globStatus(new Path(dir, "sample-*"))).getOrElse(Array.empty)
      .map(_.getPath).filter(_.getName != next)
      .foreach(p => fs.delete(p, true))
  }

  /** Run the profile over a streaming source. */
  def run(docs: DataFrame, dir: String, groupCol: String, valCol: String,
      idCol: String, k: Int, checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch(mergeBatch(dir, groupCol, valCol, idCol, k) _)
      .option("checkpointLocation", checkpoint)
      .start()
}
