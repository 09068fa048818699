package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fitSampled: trains on the hash sample only, assigns the full corpus once") {
    // three tight blobs; the hash sample sees enough of each to place
    // the centroids, and the FULL corpus (including rows outside the
    // sample) must assign to its own blob under them
    val centers = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    val pts = (0 until 120).map { i =>
      val c = centers(i % 3)
      val jitter = 0.04f * ((i / 3) % 5 - 2)
      (i.toLong, c.map(_ + jitter).toSeq)
    }
    val emb = pts.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val r = KMeans.fitSampled(emb, k = 3, sampleN = 30, maxIter = 10,
      tol = 1e-6)
    val got = r.assignments.as[(Long, Int)].collect().toMap
    assert(got.size == 120,
      "the FULL corpus must be assigned, not just the sample")
    val byBlob = (0 until 120).groupBy(_ % 3)
      .view.mapValues(_.map(i => got(i.toLong)).toSet).toMap
    assert(byBlob.values.forall(_.size == 1) &&
      byBlob.values.flatten.toSet.size == 3,
      s"sample-trained centroids must separate the blobs: $byBlob")
    // determinism: the hash sample and the whole pipeline replay
    val r2 = KMeans.fitSampled(emb, k = 3, sampleN = 30, maxIter = 10,
      tol = 1e-6)
    assert(r2.centroids.map(_.toSeq).toSeq == r.centroids.map(_.toSeq).toSeq,
      "fitSampled must be deterministic")
    // prefix property (the q97 cut-without-recompute contract): a
    // smaller hash sample is a prefix of a bigger one
    val s20 = KMeans.sampleByHash(emb, 20).select(col("vec_id"))
      .as[Long].collect().toSet
    val s30 = KMeans.sampleByHash(emb, 30).select(col("vec_id"))
      .as[Long].collect().toSet
    assert(s20.subsetOf(s30), "hash sample must be prefix-stable")
    // contract: the sample must cover the centroid count
    intercept[IllegalArgumentException] {
      KMeans.fitSampled(emb, k = 31, sampleN = 30)
    }
  }

  test("lloyd iterations recover well-separated blobs and converge") {
    // three blobs at distance 10 in 4-d; ids interleaved (i % 3 = blob)
    // so the deterministic lowest-id init starts with one seed per blob
    val centers = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    val pts = (0 until 30).map { i =>
      val c = centers(i % 3)
      val jitter = 0.05f * ((i / 3) % 5 - 2)
      (i.toLong, c.map(_ + jitter).toSeq)
    }
    val emb = pts.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

    val r = KMeans.fit(emb, k = 3, maxIter = 10, tol = 1e-6)
    assert(r.converged, s"did not converge in ${r.iterations} iterations")
    assert(r.iterations <= 5, s"expected fast convergence, took ${r.iterations}")
    // every blob maps to exactly one cluster and vice versa
    val got = r.assignments.as[(Long, Int)].collect().toMap
    val byBlob = (0 until 30).groupBy(_ % 3)
      .view.mapValues(_.map(i => got(i.toLong)).toSet).toMap
    assert(byBlob.values.forall(_.size == 1), s"blob split across clusters: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 3, s"clusters merged: $byBlob")
    // each blob's cluster centroid lands on that blob's center (within jitter)
    for ((blob, cids) <- byBlob) {
      val c = r.centroids(cids.head)
      val target = centers(blob)
      val d2 = c.zip(target).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(d2 < 0.1, s"centroid ${c.toSeq} far from blob center ${target.toSeq}")
    }
  }

  test("trained centroids drive IVF with good recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val km = KMeans.fit(emb, k = 8, maxIter = 10)
    val cents = KMeans.centroidsDf(spark, km)
    val queries = emb.filter(col("vec_id") < 10)
    val ivf = Similarity.ivfTopKWith(queries, emb, cents, k = 5, nProbe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivf.size == 50, s"expected 10 queries x 5, got ${ivf.size}")
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall vs brute force too low: $recall")
  }

  test("empty clusters keep their centroid; k > distinct points allowed") {
    val emb = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(0f, 0f)), (2L, Seq(5f, 5f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val r = KMeans.fit(emb, k = 3, maxIter = 5, tol = 1e-9)
    assert(r.centroids.length == 3)
    // the duplicate-point cluster absorbed both copies
    val got = r.assignments.as[(Long, Int)].collect().toMap
    assert(got(0L) == got(1L))
    assert(got(0L) != got(2L))
  }

  test("vector_sum aggregate equals the exploded per-dimension form across the merge path") {
    // real corpus embeddings, grouped coarsely so every group spans
    // many partitions — partial buffers MUST merge correctly
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select((col("vec_id") % 7).as("g"), col("embedding"))
      .repartition(8)
    val got = emb.groupBy(col("g"))
      .agg(graft.functions.VectorSumAgg.vector_sum(col("embedding")).as("sc"))
      .as[(Long, Array[Double])].collect()
      .map { case (g, sc) => g -> sc.toSeq }.toMap
    val exploded = emb
      .select(col("g"), posexplode(col("embedding")).as(Seq("pos", "e")))
      .groupBy(col("g"), col("pos"))
      .agg(sum(col("e").cast("double")).as("s"), count(lit(1)).as("n"))
      .as[(Long, Int, Double, Long)].collect()
    val dims = exploded.map(_._2).max + 1
    exploded.groupBy(_._1).foreach { case (g, rows) =>
      val sc = got(g)
      assert(sc.length == dims + 1, s"group $g buffer wrong length")
      rows.foreach { case (_, pos, s, n) =>
        assert(math.abs(sc(pos) - s) < 1e-6 * math.max(1.0, math.abs(s)),
          s"group $g dim $pos: agg ${sc(pos)} != exploded $s")
        assert(sc(dims) == n.toDouble, s"group $g count mismatch")
      }
    }
    // null embeddings are skipped, not crashed on; empty group → empty buffer
    val withNull = Seq((1L, Some(Seq(1f, 2f))), (1L, None), (2L, None))
      .toDF("g", "embedding")
    val nres = withNull.groupBy(col("g"))
      .agg(graft.functions.VectorSumAgg.vector_sum(col("embedding")).as("sc"))
      .as[(Long, Array[Double])].collect().toMap
    assert(nres(1L).toSeq == Seq(1.0, 2.0, 1.0))
    assert(nres(2L).isEmpty)

    // the plan claim behind the xdim shuffle cut: the aggregation path
    // carries whole arrays into a partial (map-side) aggregate — no
    // Generate/posexplode blows rows up to n*dim before the shuffle
    val plan = emb.groupBy(col("g"))
      .agg(graft.functions.VectorSumAgg.vector_sum(col("embedding")).as("sc"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"vector_sum path must not explode rows:\n$plan")
    assert(plan.contains("partial_vector_sum") ||
      "ObjectHashAggregate|SortAggregate".r.findFirstIn(plan).isDefined,
      s"expected a partial imperative aggregate in:\n$plan")
  }
}
