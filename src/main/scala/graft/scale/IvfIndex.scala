package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The materialized IVF layout: the corpus written once, bucketed by its
  * coarse-quantizer cluster, so a probe READS only its clusters.
  *
  * [[Similarity.ivfTopKWith]] prunes compute (only probed clusters are
  * scored) but still SCANS the whole corpus to assign clusters on every
  * query batch. At 100 TB the assignment must be precomputed: `build`
  * writes the corpus as parquet partitioned by `cluster_id`
  * (Hive-layout `cluster_id=N/` directories), and `topK` turns the
  * probe set into a partition filter, so the scan touches only the
  * probed buckets — partition pruning visible in the plan
  * (`PartitionFilters: [cluster_id IN (...)]`) and in the scan's
  * numFiles metric. IvfIndexSpec proves both the pruning and result
  * equality with the in-memory path.
  *
  * The probed cluster ids are collected to the driver to form the
  * filter — bounded by `queries × nProbe` and by the centroid count
  * (hundreds), control-plane-sized by construction.
  */
object IvfIndex {

  /** Assign every corpus vector to its nearest centroid and write the
    * bucketed layout. One full corpus pass; queries then never scan
    * unprobed buckets. */
  def build(corpus: DataFrame, centroids: DataFrame, path: String): Unit =
    write(corpus, centroids, path, "overwrite")

  /** Incrementally add vectors to an EXISTING index — the shape at
    * 100 TB, where corpus lands continuously and rebuilding the world
    * per batch would re-shuffle everything ever ingested: only the new
    * rows are assigned (O(batch), not O(index)) and their files land
    * inside the existing `cluster_id=N/` partition directories, so a
    * probe's partition filter spans old and new files alike with no
    * compaction step in between. MUST use the same centroids as the
    * original build — Hive-partition appends cannot re-home rows whose
    * nearest centroid changed (that is a rebuild; re-clustering is a
    * deliberate, corpus-wide event). IvfIndexSpec proves appended rows
    * are served through the same pruned scan. */
  def append(newVectors: DataFrame, centroids: DataFrame, path: String): Unit =
    write(newVectors, centroids, path, "append")

  private def write(vectors: DataFrame, centroids: DataFrame, path: String,
      mode: String): Unit =
    Similarity.assign(vectors, centroids, "vec_id")
      .withColumnRenamed("centroid_id", "cluster_id")
      .write.mode(mode).partitionBy("cluster_id").parquet(path)

  /** IVF top-k over a built index: identical results to
    * [[Similarity.ivfTopKWith]] on the same corpus/centroids/k/nProbe,
    * but the corpus scan is pruned to the probed cluster partitions. */
  def topK(spark: SparkSession, path: String, queries: DataFrame,
      centroids: DataFrame, k: Int, nProbe: Int = 3): DataFrame = {
    import spark.implicits._
    // materialize the probe assignment once: it is read twice (collected
    // for the partition filter, then joined in scoring) and is
    // control-plane-sized (queries × nProbe rows)
    val probes = Similarity.probesFor(queries, centroids, nProbe)
      .localCheckpoint()
    val probed = probes.select(col("cluster_id").cast("long"))
      .distinct().as[Long].collect().sorted
    val assigned = spark.read.parquet(path)
      .filter(col("cluster_id").isin(probed: _*))
      .withColumn("c_norm", Similarity.norm(col("embedding")))
    Similarity.scoreProbed(probes, assigned, k)
  }
}
