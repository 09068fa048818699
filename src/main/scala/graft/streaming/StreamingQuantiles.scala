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
  * fresh epoch-stamped directory and a one-line `_current` pointer
  * file swaps in via temp+rename (the repo's commit-point recipe) —
  * a crash anywhere leaves the previous complete state current, and
  * the replay reconstructs the flip. Superseded epoch dirs are
  * vacuumed on the NEXT successful flip, so at most one orphan dir
  * survives a crash.
  */
object StreamingQuantiles {

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def currentName(spark: SparkSession, dir: String): Option[String] = {
    val fs = fsOf(spark, dir)
    val p = new Path(dir, "_current")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8).trim)
      } finally in.close()
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
    // commit point: one-line pointer, temp + rename
    val tmp = new Path(dir, s"._current.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try out.write(next.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val target = new Path(dir, "_current")
    fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"streaming-quantiles: failed to publish $target")
    }
    // vacuum every superseded epoch dir (all but the one just
    // published) — single-operator maintenance, the IvfIndex.rebuild
    // reader-isolation contract
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
