package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-level (super-cluster) coarse-quantizer assignment must be
  * BIT-IDENTICAL to the flat n×k argmin — the equivalence the 1e8-doc
  * scale design rests on (assignment O(n·√k) with a √k broadcast
  * instead of O(n·k) with a k-sized one; see Similarity.assignTwoLevel's
  * pruning proof). Pinned three ways: on the real test corpus with the
  * production stride quantizer, on an adversarial synthetic corpus built
  * entirely of DISTANCE TIES (the tie-break path), and on a geometry
  * where a vector's nearest centroid lives in a DIFFERENT super than its
  * nearest super-centroid (the case naive nearest-super-only assignment
  * gets wrong, and the triangle-inequality candidate expansion exists
  * for). q87 re-proves the corpus case cross-engine against a DuckDB
  * flat-argmin oracle every round. */
class TwoLevelAssignSpec extends AnyFunSuite {
  lazy val spark = graft.scale.SparkTestSession.spark
  import spark.implicits._

  private def collectAssign(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("vec_id").cast("long"), col("centroid_id").cast("long"))
      .as[(Long, Long)].collect().toSeq.sorted

  test("two-level == flat on the test corpus (stride quantizer)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for (stride <- Seq(23, 97)) {
      val cents = Similarity.strideCentroids(emb, stride).localCheckpoint()
      val flat = collectAssign(Similarity.assignFlat(emb, cents, "vec_id"))
      val two = collectAssign(Similarity.assignTwoLevel(emb, cents, "vec_id"))
      assert(two == flat, s"stride=$stride: two-level diverged from flat")
      assert(flat.size == emb.count(), "every vector must be assigned")
    }
  }

  test("tie-breaks match flat exactly when many centroids are equidistant") {
    // vectors at the origin; centroids on an axis-aligned cross, ALL at
    // identical distance — the argmin is decided purely by the
    // (dist2, cid) struct-min tie-break, which must survive the
    // hierarchical path's pruning (every tying centroid's super is a
    // candidate by construction of the bound)
    val dim = 4
    val centroids = (0 until 80).map { i =>
      val v = Array.fill(dim)(0f); v(i % dim) = if (i % 2 == 0) 5f else -5f
      // deliberately non-monotone id order vs geometry
      ((i * 37 % 80).toLong, v.toSeq)
    }.toDF("centroid_id", "c_emb")
      .select(col("centroid_id"), col("c_emb").cast("array<float>").as("c_emb"))
      .localCheckpoint()
    val vectors = (0L until 50L).map(i => (i, Seq.fill(dim)(0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val flat = collectAssign(Similarity.assignFlat(vectors, centroids, "vec_id"))
    val two = collectAssign(Similarity.assignTwoLevel(vectors, centroids, "vec_id"))
    assert(two == flat)
    // the tie must resolve to the LOWEST centroid id for every vector
    assert(flat.forall(_._2 == 0L))
  }

  test("winner in a non-nearest super is still found (candidate expansion)") {
    // two tight centroid groups at x≈0 and x≈10, plus one straggler
    // centroid at x=6 that geometrically joins the x=10 super (distance
    // ~4), stretching that super's radius. A vector at x=5.0 has the
    // x≈0.5 super-CENTROID nearer (4.5) than the x=10 one (5.0), but
    // its true nearest centroid is the straggler (1.0) — inside the
    // NON-nearest super. Only the triangle-inequality candidate set
    // (d_j − r_j ≤ U), not nearest-super-only assignment, finds it.
    def v(x: Float) = Seq(x, 0f)
    // 100 centroids -> ~⌈√100⌉ = 10 supers (hash-bucket min-id
    // selection; WHICH ids lead supers is irrelevant to the equality —
    // the candidate bound covers any deterministic super set)
    val cents = ((0 until 60).map(i => (i.toLong, v(i * 0.01f))) ++ // near 0
      (60 until 99).map(i => (i.toLong, v(10f + (i - 60) * 0.01f))) ++ // near 10
      Seq((99L, v(6f)))) // straggler
      .toDF("centroid_id", "c_emb")
      .select(col("centroid_id"), col("c_emb").cast("array<float>").as("c_emb"))
      .localCheckpoint()
    val vectors = Seq((0L, v(5.0f)), (1L, v(5.9f)), (2L, v(8.1f)),
      (3L, v(0.05f)), (4L, v(9.95f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val flat = collectAssign(Similarity.assignFlat(vectors, cents, "vec_id"))
    val two = collectAssign(Similarity.assignTwoLevel(vectors, cents, "vec_id"))
    assert(two == flat)
    // sanity: the straggler wins for the x=5.0 vector even though its
    // nearest SUPER is the x≈0 group — the expansion case, not trivial
    assert(flat.find(_._1 == 0L).get._2 == 99L)
    assert(flat.find(_._1 == 1L).get._2 == 99L)
  }

  test("no window (global sort) anywhere in the executed two-level plan") {
    // round-8 selected supers with a single-partition global row_number
    // — all k embedding-carrying rows through ONE task (~300 MB at
    // k=1e6). The hash-bucket min-id selection needs no sort at all, so
    // the executed plan must contain ZERO window operators.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.strideCentroids(emb, 23).localCheckpoint()
    val df = Similarity.assignTwoLevel(emb, cents, "vec_id")
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def windows(p: SparkPlan): Seq[SparkPlan] = p match {
      case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case q: QueryStageExec => windows(q.plan)
      case o => o.children.flatMap(windows)
    }
    assert(windows(df.queryExecution.executedPlan).isEmpty,
      "two-level assignment must contain no window operator")
  }

  test("large-magnitude embeddings: equality survives (magnitude-scaled slack)") {
    // the pruning slack must scale with d_j/r_j, not only with U —
    // with 1e6-magnitude components the cancellation error of d_j − r_j
    // is ~1e-10 absolute, far above a 1e-12 absolute-only slack
    // (round-8 ADVICE). Equality with flat is the whole guarantee, so
    // pin it on the same corpus geometry scaled up and scaled down.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for (scale <- Seq(1e6f, 1e-6f)) {
      val scaled = emb.select(col("vec_id"),
        transform(col("embedding"), x => x * lit(scale))
          .cast("array<float>").as("embedding"))
      val cents = Similarity.strideCentroids(scaled, 23).localCheckpoint()
      val flat = collectAssign(Similarity.assignFlat(scaled, cents, "vec_id"))
      val two = collectAssign(Similarity.assignTwoLevel(scaled, cents, "vec_id"))
      assert(two == flat, s"scale=$scale: two-level diverged from flat")
    }
  }

  test("assign dispatches: flat below TwoLevelMin, two-level at/above it") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    // k below the threshold: dispatch must still produce the flat result
    val small = Similarity.strideCentroids(emb, (n / 8).toInt.max(1))
    assert(collectAssign(Similarity.assign(emb, small, "vec_id")) ==
      collectAssign(Similarity.assignFlat(emb,
        small.select(col("centroid_id"), col("c_emb")), "vec_id")))
    // k at/above the threshold: dispatch goes two-level and must still
    // equal flat (TwoLevelMin <= 64 centroids exist only if n >= 128)
    val denseStride = (n / Similarity.TwoLevelMin).toInt.max(1)
    val dense = Similarity.strideCentroids(emb, denseStride).localCheckpoint()
    if (dense.count() >= Similarity.TwoLevelMin)
      assert(collectAssign(Similarity.assign(emb, dense, "vec_id")) ==
        collectAssign(Similarity.assignFlat(emb, dense, "vec_id")))
  }
}
