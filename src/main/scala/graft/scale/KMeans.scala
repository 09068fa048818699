package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Distributed Lloyd's k-means over an embeddings table — the iterative
  * driver around the single step that q76 pins against its oracle
  * (`ScaleCatalogue.q76KmeansStep`). Used to train the IVF coarse
  * quantizer (`Similarity.ivfTopK`) instead of taking centroids as
  * given.
  *
  * Scale shape per iteration (the same as Spark MLlib's k-means): the
  * k×dim centroid matrix is control-plane state — collected to the
  * driver (k·dim·4 bytes) and re-broadcast each round — while the data
  * side does one broadcast-join assignment (argmin via min-struct on
  * 16-byte rows, native codegen dist2) and one mergeable vector-sum
  * aggregation ([[graft.functions.VectorSumAgg]]: a dim+1 double
  * buffer per (task, cid), map-side combined — the shuffle carries
  * k·tasks buffers, never n·dim exploded rows). Iteration count is
  * bounded and convergence is measured by max centroid movement.
  */
object KMeans {

  final case class Result(
      assignments: DataFrame, // (vec_id, cid)
      centroids: Array[Array[Float]], // indexed by cid
      iterations: Int,
      converged: Boolean)

  /** Trained centroids in the (centroid_id, c_emb) shape
    * [[Similarity.ivfTopKWith]] consumes. */
  def centroidsDf(spark: org.apache.spark.sql.SparkSession,
      r: Result): DataFrame =
    spark.createDataFrame(
        r.centroids.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq)
      .toDF("centroid_id", "c_emb")
      .select(col("centroid_id"),
        col("c_emb").cast("array<float>").as("c_emb"))

  def fit(emb: DataFrame, k: Int, maxIter: Int = 20,
      tol: Double = 1e-4): Result = {
    require(k >= 1, "k must be positive")
    val spark = emb.sparkSession
    import spark.implicits._

    // one source scan for the whole fit: every Lloyd round reads this
    // projection twice (assignment + update), so a 20-round fit would
    // otherwise cost 40 source scans
    val data = emb.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic init: the k lowest vec_ids (callers wanting
      // k-means++ style spread should pre-shuffle ids; determinism beats
      // spread for a reproducible pipeline stage)
      var cents: Array[Array[Float]] = data.orderBy(col("vec_id")).limit(k)
        .select(col("embedding")).as[Array[Float]].collect()
      require(cents.length == k, s"need at least $k vectors, got ${cents.length}")
      val dim = cents.head.length

      def centDf(c: Array[Array[Float]]) =
        broadcast(spark.createDataFrame(
          c.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq)
          .toDF("cid", "cvec")
          .select(col("cid"), col("cvec").cast("array<float>").as("cvec")))

      def assign(src: DataFrame, c: Array[Array[Float]]): DataFrame =
        src.select(col("vec_id"), col("embedding"))
          .crossJoin(centDf(c))
          .select(col("vec_id"),
            struct(VectorOps.dist2_f(col("embedding"), col("cvec")).as("d2"),
              col("cid")).as("dc"))
          .groupBy(col("vec_id"))
          .agg(min(col("dc")).getField("cid").as("cid"))

      var iter = 0
      var converged = false
      while (iter < maxIter && !converged) {
        iter += 1
        // per-cluster vector sums via the mergeable VectorSumAgg buffer
        // (round-13 review item 5): the composable posexplode →
        // groupBy(cid, pos) form shuffled n·dim exploded rows per Lloyd
        // round; the aggregate map-side-combines one dim+1 double
        // buffer per (task, cid), so the shuffle carries k·tasks
        // buffers — a ×dim reduction at any corpus size. Still k·dim
        // cells to the driver (control-plane, same as before).
        val sums = assign(data, cents).join(data, "vec_id")
          .groupBy(col("cid"))
          .agg(graft.functions.VectorSumAgg.vector_sum(col("embedding"))
            .as("sc"))
          .as[(Int, Array[Double])].collect()
        val next = cents.map(_.clone())
        sums.foreach { case (cid, sc) =>
          val cnt = sc(dim)
          if (cnt > 0) next(cid) =
            Array.tabulate(dim)(i => (sc(i) / cnt).toFloat)
        }
        // empty clusters keep their previous centroid (no rows → no update)
        val shift = cents.zip(next).map { case (a, b) =>
          var s = 0.0; var i = 0
          while (i < dim) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
          s
        }.max
        cents = next
        // shift is the max SQUARED movement — compare against tol² so
        // `tol` means what it says (max centroid MOVEMENT), not its
        // square root (100x looser at the 1e-4 default)
        converged = shift < tol * tol
      }
      // the returned assignments plan is built on the UNCACHED source so
      // no block stays pinned after fit returns (one re-scan when the
      // caller consumes it)
      Result(assign(emb, cents), cents, iter, converged)
    } finally data.unpersist()
  }

  /** Content-hash deterministic sample: the `n` lowest
    * md5_64(vec_id)-ordered rows — uniform pseudo-random, keyed on
    * the id alone (q97's prioritySample machinery on the id instead
    * of the text), so ANY engine with md5 replays the exact member
    * set (the q192 oracle does, in DuckDB). Top-n' of a bigger top-n
    * is a prefix — a smaller training sample is always a subset of a
    * larger one, the same cut-without-recompute property q97 pins. */
  def sampleByHash(emb: DataFrame, n: Int): DataFrame =
    emb.withColumn("_h",
        graft.functions.Md5_64.md5_64(col("vec_id").cast("string")))
      .orderBy(col("_h").asc, col("vec_id").asc).limit(n).drop("_h")

  /** SAMPLED k-means — the re-cluster event BOUNDED (round-16 verdict
    * item 2): Lloyd iterations run over a content-hash deterministic
    * sample of `sampleN` rows, and the FULL corpus is assigned exactly
    * once under the trained centroids through the two-level
    * [[Similarity.assign]] (O(n·√k), broadcast √k-sized). Training
    * cost scales with the sample, not the corpus — the standard
    * coarse-quantizer training shape (FAISS trains IVF quantizers on
    * a bounded sample for the same reason); centroid QUALITY is a
    * sampling question, centroid COUNT still follows nlist ∝ corpus.
    * Deterministic end to end: hash-ordered sample, lowest-vec_id
    * init, exact argmin tie-breaks — q192 replays the whole
    * sample-train-assign pipeline in exact integer space by oracle. */
  def fitSampled(emb: DataFrame, k: Int, sampleN: Int,
      maxIter: Int = 20, tol: Double = 1e-4): Result = {
    require(sampleN >= k,
      s"sample size $sampleN must cover the centroid count $k")
    val spark = emb.sparkSession
    val sample = sampleByHash(
      emb.select(col("vec_id"), col("embedding")), sampleN)
    val trained = fit(sample, k, maxIter, tol)
    val cents = centroidsDf(spark, trained)
    val assignments = Similarity
      .assign(emb.select(col("vec_id"), col("embedding")), cents,
        "vec_id", Some(k.toLong))
      .select(col("vec_id"), col("centroid_id").cast("int").as("cid"))
    Result(assignments, trained.centroids, trained.iterations,
      trained.converged)
  }
}
