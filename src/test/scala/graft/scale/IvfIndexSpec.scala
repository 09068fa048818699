package graft.scale

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed IVF layout: probed queries must (a) return exactly the
  * in-memory path's results and (b) physically SKIP unprobed cluster
  * partitions — asserted from the executed plan's partition filters and
  * file-count metrics, not from wall-clock. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = graft.scale.SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("index-backed IVF equals the in-memory path and prunes unprobed buckets") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
    val nClusters = centroids.count()
    assert(nClusters >= 6, s"need several clusters for a pruning test, got $nClusters")
    val queries = emb.filter(col("vec_id") === 1)

    val dir = Files.createTempDirectory("graft-ivf-index").toString
    IvfIndex.build(emb, centroids, dir)

    // drive THIS DataFrame's queryExecution (a derived orderBy would
    // plan a separate query and leave these metrics at zero)
    val fromIndex = IvfIndex.topK(spark, dir, queries, centroids,
      k = 5, nProbe = 3).orderBy("query_id", "rank")
    val inMemory = Similarity.ivfTopKWith(queries, emb, centroids,
      k = 5, nProbe = 3)
    // collect Rows straight off fromIndex (.as[...] would derive yet
    // another Dataset and execute that one instead)
    val a = fromIndex.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val b = inMemory.orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(a == b, "bucketed path must be result-identical to the in-memory path")
    assert(a.size == 5)

    // ---- pruning proof, from the executed plan ----
    // AQE nests executed subtrees inside QueryStageExec nodes that do
    // not expose them as children — recurse through both wrappers
    def scans(plan: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      plan match {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case p => p.children.flatMap(scans)
      }
    val indexScan = scans(fromIndex.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("graft-ivf-index")))
      .getOrElse(fail("no file scan over the index in the plan"))
    assert(indexScan.partitionFilters.exists(_.toString.contains("cluster_id")),
      s"probe filter must be a PARTITION filter, got ${indexScan.partitionFilters}")
    // the scan touched only the probed partitions' files
    val scannedFiles = indexScan.metrics("numFiles").value
    val allFiles = {
      val root = new java.io.File(dir)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).count(f => f.getName.endsWith(".parquet"))
    }
    assert(scannedFiles > 0 && scannedFiles < allFiles,
      s"expected a pruned scan: $scannedFiles of $allFiles files " +
        s"(${nClusters} clusters, 3 probed)")
  }

  test("append serves new vectors through the same pruned scan") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
    val queries = emb.filter(col("vec_id") === 1)

    // build from half the corpus, append the other half — results must
    // equal the in-memory path over the FULL corpus, proving appended
    // files participate in scoring
    val half = emb.count() / 2
    val dir = Files.createTempDirectory("graft-ivf-append").toString
    IvfIndex.build(emb.filter(col("vec_id") < half), centroids, dir)
    val filesAfterBuild = countParquet(dir)
    IvfIndex.append(emb.filter(col("vec_id") >= half), centroids, dir)
    assert(countParquet(dir) > filesAfterBuild,
      "append must add files, not rewrite the index")

    val fromIndex = IvfIndex.topK(spark, dir, queries, centroids,
      k = 5, nProbe = 3).orderBy("query_id", "rank")
    val a = fromIndex.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val b = Similarity.ivfTopKWith(queries, emb, centroids, k = 5, nProbe = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(a == b, "appended index must equal the in-memory full-corpus path")
    // the top-5 must MIX pre-build and appended ids, or the equality
    // above would not actually witness the appended files being read
    val ids = a.map(_._3)
    assert(ids.exists(_ < half) && ids.exists(_ >= half),
      s"test corpus must yield neighbors from both halves, got $ids")

    // pruning survives the append: still a partition-filtered scan over
    // a strict subset of the (now larger) file set
    def scans(plan: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      plan match {
        case s: FileSourceScanExec => Seq(s)
        case ad: AdaptiveSparkPlanExec => scans(ad.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case p => p.children.flatMap(scans)
      }
    val indexScan = scans(fromIndex.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("graft-ivf-append")))
      .getOrElse(fail("no file scan over the appended index in the plan"))
    assert(indexScan.partitionFilters.exists(_.toString.contains("cluster_id")))
    val scanned = indexScan.metrics("numFiles").value
    assert(scanned > 0 && scanned < countParquet(dir),
      s"expected pruned scan over old+new files: $scanned of ${countParquet(dir)}")
  }

  test("append emits a centroid-drift fraction: low in-distribution, high shifted") {
    // build on the real corpus; append (a) more of the SAME distribution
    // — drift ≈ the stationary ~5% beyond the build-time p95 — and
    // (b) the same vectors SHIFTED far outside every centroid's reach —
    // drift ≈ 1. The gap is the rebuild observable: a frozen quantizer
    // silently degrades as appended mass lands in its tails, and this
    // fraction is what makes "when is a rebuild due" measurable
    // (IvfIndex.RebuildDriftThreshold documents the policy).
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
    val half = emb.count() / 2
    val dir = Files.createTempDirectory("graft-ivf-drift").toString
    IvfIndex.build(emb.filter(col("vec_id") < half), centroids, dir)

    val inDist = IvfIndex.append(
      emb.filter(col("vec_id") >= half), centroids, dir)
    assert(!inDist.isNaN, "built index must carry the p95 meta")
    assert(inDist < IvfIndex.RebuildDriftThreshold,
      s"same-distribution append must stay under the rebuild threshold, got $inDist")

    val shifted = emb.filter(col("vec_id") >= half)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x + lit(100.0f))
          .cast("array<float>").as("embedding"))
    val far = IvfIndex.append(shifted, centroids, dir)
    assert(far > 0.9,
      s"a shifted distribution must land nearly all mass past the p95, got $far")
  }

  test("rebuild re-homes drifted mass, resets the drift baseline, stays result-exact") {
    // lifecycle: build → shifted appends drift ≈ 1 → rebuild with
    // centroids covering the CURRENT corpus → further appends from the
    // shifted region are back in-distribution. The drift metric says
    // WHEN; this is the HOW it calls for.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    def shifted(offset: Long) = emb
      .select((col("vec_id") + lit(offset)).as("vec_id"),
        transform(col("embedding"), x => x + lit(100.0f))
          .cast("array<float>").as("embedding"))
    val dir = Files.createTempDirectory("graft-ivf-rebuild")
      .resolve("idx").toString
    val oldCents = Similarity.strideCentroids(emb, stride = 50)
    IvfIndex.build(emb, oldCents, dir)
    val driftBefore = IvfIndex.append(shifted(1000000L), oldCents, dir)
    assert(driftBefore > IvfIndex.RebuildDriftThreshold,
      s"shifted append must trip the rebuild policy, got $driftBefore")

    // re-cluster over the index's CURRENT corpus and rebuild in place
    val newCents = Similarity.strideCentroids(
      IvfIndex.corpus(spark, dir), stride = 50).localCheckpoint()
    IvfIndex.rebuild(spark, dir, newCents)
    val driftAfter = IvfIndex.append(shifted(2000000L), newCents, dir)
    assert(driftAfter < IvfIndex.RebuildDriftThreshold,
      s"post-rebuild shifted-region appends must be in-distribution, " +
        s"got $driftAfter")
    assert(!new java.io.File(new java.io.File(dir).getParentFile.getPath)
      .listFiles().exists(_.getName.contains("__")),
      "no rebuild/retired residue may remain after a clean swap")

    // the rebuilt + appended index answers exactly like the in-memory
    // path over the same full corpus and new quantizer
    val full = emb.select(col("vec_id"), col("embedding"))
      .unionByName(shifted(1000000L)).unionByName(shifted(2000000L))
    val queries = emb.filter(col("vec_id") === 1)
    val a = IvfIndex.topK(spark, dir, queries, newCents, k = 5, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val b = Similarity.ivfTopKWith(queries, full, newCents, k = 5, nProbe = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(a == b, "rebuilt index must equal the in-memory path")
  }

  test("rebuild heals every crash window on re-run") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = Similarity.strideCentroids(emb, stride = 50).localCheckpoint()
    val root = Files.createTempDirectory("graft-ivf-heal")
    val dir = root.resolve("idx").toString
    IvfIndex.build(emb, cents, dir)
    val expected = IvfIndex.topK(spark, dir, emb.filter(col("vec_id") === 1),
        cents, k = 5, nProbe = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val target = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    val tmp = new org.apache.hadoop.fs.Path(root.toString, "idx.__rebuild")
    val retired = new org.apache.hadoop.fs.Path(root.toString, "idx.__retired")

    // window 1: died between retire and publish — complete layout at
    // __rebuild (meta present), old at __retired, nothing at the path
    assert(fs.rename(target, retired))
    IvfIndex.build(IvfIndex.corpus(spark, retired.toString), cents,
      tmp.toString)
    IvfIndex.rebuild(spark, dir, cents)
    assert(fs.exists(target) && !fs.exists(tmp) && !fs.exists(retired))

    // window 2: died during the build — meta-less __rebuild residue,
    // index still live at the path
    fs.mkdirs(tmp)
    IvfIndex.rebuild(spark, dir, cents)
    assert(fs.exists(target) && !fs.exists(tmp) && !fs.exists(retired))

    // window 3: died after publish, before the retired delete — leaked
    // __retired copy next to a live index
    fs.mkdirs(retired)
    IvfIndex.rebuild(spark, dir, cents)
    assert(fs.exists(target) && !fs.exists(tmp) && !fs.exists(retired))

    // window 4: died between retire and publish with an INCOMPLETE
    // build — no meta at __rebuild, old layout at __retired
    assert(fs.rename(target, retired))
    fs.mkdirs(tmp) // meta-less partial build
    IvfIndex.rebuild(spark, dir, cents)
    assert(fs.exists(target) && !fs.exists(tmp) && !fs.exists(retired))

    // window 5: index-sized __retired-<uuid> residue of the pre-heal
    // UUID naming scheme next to a live index — vacuumed, not leaked
    val legacy = new org.apache.hadoop.fs.Path(root.toString,
      "idx.__retired-0d9f2a7e-dead-beef-cafe-0123456789ab")
    fs.mkdirs(legacy)
    IvfIndex.rebuild(spark, dir, cents)
    assert(fs.exists(target) && !fs.exists(legacy),
      "legacy __retired-<uuid> residue must be vacuumed by rebuild")

    // after all four heals + rebuilds the index still answers exactly
    val got = IvfIndex.topK(spark, dir, emb.filter(col("vec_id") === 1),
        cents, k = 5, nProbe = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("append on a pre-metric legacy index reports NaN, not a throw") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
    val dir = Files.createTempDirectory("graft-ivf-legacy").toString
    // legacy layout: assigned parquet without dist2 and without meta
    Similarity.assign(emb.filter(col("vec_id") < 50), centroids, "vec_id")
      .withColumnRenamed("centroid_id", "cluster_id")
      .write.mode("overwrite").partitionBy("cluster_id").parquet(dir)
    val d = IvfIndex.append(emb.filter(col("vec_id") >= 50)
      .limit(20), centroids, dir)
    assert(d.isNaN)
  }

  test("delete: tombstoned vectors stop serving; rebuild folds them physically") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
    val queries = emb.filter(col("vec_id") === 1)
    val dir = Files.createTempDirectory("graft-ivf-del").toString
    IvfIndex.build(emb, centroids, dir)
    val before = IvfIndex.topK(spark, dir, queries, centroids, k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    // tombstone the current top-2 neighbors — the strongest exclusion
    // proof: the served frontier itself must change
    val dead = before.take(2).map(_._3)
    IvfIndex.delete(dead.toDF("vec_id"), dir)
    val after = IvfIndex.topK(spark, dir, queries, centroids, k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(after.forall(r => !dead.contains(r._3)),
      s"tombstoned vectors still served: $after")
    // IVF scores are per-vector: post-delete results must equal an
    // index built without the vectors
    val fresh = Files.createTempDirectory("graft-ivf-del-ref").toString
    IvfIndex.build(emb.filter(!col("vec_id").isin(dead: _*)),
      centroids, fresh)
    val want = IvfIndex.topK(spark, fresh, queries, centroids, k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(after == want,
      "post-delete serving diverged from an index built without the vectors")

    // idempotent replay + unknown-id no-op
    IvfIndex.delete(dead.toDF("vec_id"), dir)
    IvfIndex.delete(Seq(99999999L).toDF("vec_id"), dir)
    assert(spark.read.parquet(s"$dir/_ivf_tombstones")
      .groupBy(col("vec_id")).count().filter(col("count") > 1).count() == 0L)

    // rebuild folds: published layout holds survivors only and starts
    // tombstone-free; serving unchanged
    IvfIndex.rebuild(spark, dir, centroids)
    assert(!new java.io.File(s"$dir/_ivf_tombstones").exists(),
      "rebuild must publish a tombstone-free layout")
    assert(spark.read.parquet(dir)
      .filter(col("vec_id").isin(dead: _*)).count() == 0L,
      "rebuild left tombstoned rows behind")
    val folded = IvfIndex.topK(spark, dir, queries, centroids, k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(folded == want, "fold changed served results")
  }

  test("upsert: revised vectors serve from their NEW cluster like a rebuild from revised vectors") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
    val queries = emb.filter(col("vec_id") === 1)
    def top(dir: String) = IvfIndex
      .topK(spark, dir, queries, centroids, k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq

    val dir = Files.createTempDirectory("graft-ivf-upsert").toString
    IvfIndex.build(emb, centroids, dir)
    val before = top(dir)
    val revised = emb.filter(col("vec_id") % 9 === 0)
      .withColumn("embedding", reverse(col("embedding")))
    IvfIndex.upsert(revised, centroids, dir, rev = 1L)

    // cluster MIGRATION actually happened: at least one revised vector
    // sits in a different cluster dir than its stale generation
    val mainClusters = spark.read.parquet(dir)
      .filter(col("vec_id") % 9 === 0)
      .select(col("vec_id"), col("cluster_id").as("old_c"))
    val revClusters = spark.read
      .parquet(s"$dir/_ivf_rev_rows")
      .select(col("vec_id"), col("cluster_id").as("new_c"))
    val migrated = mainClusters.join(revClusters, "vec_id")
      .filter(col("old_c") =!= col("new_c")).count()
    assert(migrated > 0, "no revised vector changed cluster — weak fixture")

    // THE equivalence: serving equals an index built from revised vecs
    val refDir = Files.createTempDirectory("graft-ivf-upsert-ref").toString
    val revisedCorpus = emb.withColumn("embedding",
      when(col("vec_id") % 9 === 0, reverse(col("embedding")))
        .otherwise(col("embedding")))
    IvfIndex.build(revisedCorpus, centroids, refDir)
    val got = top(dir)
    assert(got == top(refDir),
      "upsert-then-probe diverged from a rebuild over revised vectors")
    assert(got != before, "revision changed no results — weak fixture")

    // replay heal + monotone refusal
    val rowsBefore = spark.read.parquet(s"$dir/_ivf_rev_rows").count()
    IvfIndex.upsert(revised, centroids, dir, rev = 1L)
    assert(spark.read.parquet(s"$dir/_ivf_rev_rows").count() == rowsBefore,
      "upsert replay duplicated revision rows")
    assert(top(dir) == got)
    IvfIndex.upsert(emb.filter(col("vec_id") % 9 === 0), centroids, dir,
      rev = 2L) // restore originals at rev 2
    assert(top(dir) == before,
      "rev-2 restore of original vectors must restore original serving")
    intercept[IllegalArgumentException] {
      IvfIndex.upsert(revised, centroids, dir, rev = 1L)
    }

    // rebuild folds revisions: corpus() is current-generation aware,
    // the swap drops the registry and rev rows
    IvfIndex.upsert(revised, centroids, dir, rev = 3L)
    IvfIndex.rebuild(spark, dir, centroids)
    assert(!new java.io.File(s"$dir/_ivf_rev").exists() &&
      !new java.io.File(s"$dir/_ivf_rev_rows").exists(),
      "rebuild must fold the revision state away")
    assert(top(dir) == got, "rebuild-folded serving diverged")
  }

  test("full CDC lifecycle: build + append + upsert + delete compose (q168)") {
    // every maintenance verb once, in production order, against one
    // index under frozen centroids — the compositions under test:
    // append rows a later upsert supersedes, upsert's rev tree under a
    // later delete's tombstones (a tombstoned id must vanish from BOTH
    // trees at probe time).
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
    val queries = emb.filter(col("vec_id") === 1)
    def top(dir: String) = IvfIndex
      .topK(spark, dir, queries, centroids, k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq

    val dir = Files.createTempDirectory("graft-ivf-cdc").toString
    IvfIndex.build(emb.filter(col("vec_id") % 5 =!= 4), centroids, dir)
    IvfIndex.append(emb.filter(col("vec_id") % 5 === 4), centroids, dir)
    val revised = emb.filter(col("vec_id") % 9 === 0)
      .withColumn("embedding", reverse(col("embedding")))
    IvfIndex.upsert(revised, centroids, dir, rev = 1L)
    IvfIndex.delete(
      emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), dir)
    // a %9 ∩ %7 victim existed, so the delete crossed the rev tree
    assert(emb.filter(col("vec_id") % 63 === 0).count() > 0,
      "weak fixture: no victim had a revised generation")

    val refDir = Files.createTempDirectory("graft-ivf-cdc-ref").toString
    IvfIndex.build(
      emb.withColumn("embedding",
          when(col("vec_id") % 9 === 0, reverse(col("embedding")))
            .otherwise(col("embedding")))
        .filter(col("vec_id") % 7 =!= 0),
      centroids, refDir)
    val got = top(dir)
    assert(got == top(refDir),
      "CDC lifecycle diverged from a rebuild over revised survivors")
    assert(got.nonEmpty)
    // no tombstoned id serves from either tree
    assert(!got.exists(_._3 % 7 == 0), "a deleted vector still served")
  }

  private def countParquet(dir: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
  }
}
