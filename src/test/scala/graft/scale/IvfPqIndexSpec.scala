package graft.scale

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed IVF+PQ code layout: queries must (a) return exactly the
  * in-memory ivfPqTopK results and (b) physically SKIP unprobed cluster
  * partitions AND never read an embedding column — both asserted from
  * the executed plan, not wall-clock. */
class IvfPqIndexSpec extends AnyFunSuite {
  lazy val spark = graft.scale.SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("indexed IVF+PQ equals the in-memory path and prunes to probed code buckets") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
    val nClusters = centroids.count()
    assert(nClusters >= 6, s"need several clusters to prune, got $nClusters")
    val queries = emb.filter(col("vec_id") < 3)

    val dir = Files.createTempDirectory("graft-ivfpq-index").toString
    IvfPqIndex.build(emb, centroids, dir)

    val fromIndex = IvfPqIndex.topK(spark, dir, queries, centroids,
      k = 10, nProbe = 3).orderBy("query_id", "rank")
    val inMemory = Similarity.ivfPqTopK(queries, emb, centroids,
      k = 10, nProbe = 3)
    val a = fromIndex.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val b = inMemory.orderBy("query_id", "rank")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(a == b, "bucketed code path must equal the in-memory path")
    assert(a.nonEmpty)

    // ---- pruning proof, from the executed plan ----
    def scans(plan: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      plan match {
        case s: FileSourceScanExec => Seq(s)
        case ad: AdaptiveSparkPlanExec => scans(ad.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case p => p.children.flatMap(scans)
      }
    val indexScan = scans(fromIndex.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("graft-ivfpq-index")))
      .getOrElse(fail("no file scan over the code index in the plan"))
    assert(indexScan.partitionFilters.exists(_.toString.contains("cluster_id")),
      s"probe filter must be a PARTITION filter, got ${indexScan.partitionFilters}")
    // the codes scan reads codes, never an embedding column
    assert(!indexScan.schema.fieldNames.contains("embedding"),
      s"code scan must not read embeddings: ${indexScan.schema.fieldNames.toSeq}")
    val scannedFiles = indexScan.metrics("numFiles").value
    val allFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).count(f =>
        f.getName.endsWith(".parquet") && !f.getPath.contains("_pq_codebooks"))
    }
    assert(scannedFiles > 0 && scannedFiles < allFiles,
      s"expected a pruned scan: $scannedFiles of $allFiles code files " +
        s"($nClusters clusters, 3 probed)")
  }

  test("append serves new vectors through the same pruned code scan") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
      .localCheckpoint()
    val dir = Files.createTempDirectory("graft-ivfpq-append").toString
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    IvfPqIndex.build(base, centroids, dir)
    IvfPqIndex.append(batch, centroids, dir)
    val queries = emb.filter(col("vec_id") < 3)
    val a = IvfPqIndex.topK(spark, dir, queries, centroids, k = 10, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    // the in-memory reference over the FULL corpus, with the same
    // codebooks the index froze at build time (init-only over `base`)
    val cb = Similarity.pqInitCodebooks(base)
    val b = Similarity.ivfPqTopK(queries, emb, centroids, k = 10, nProbe = 3,
        codebooks = Some(cb))
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(a == b, "appended rows must be served exactly like built rows")
    // appended vectors are actually reachable: at least one result id
    // from the appended range appears for some probing query
    assert(a.exists(_._3 >= 400L) ||
      Similarity.ivfPqTopK(queries, emb, centroids, k = 10, nProbe = 3,
        codebooks = Some(cb)).filter(col("vec_id") >= 400).isEmpty,
      "appended vectors must be candidates when their cluster is probed")
  }

  test("codebooks are part of the index: a fresh session needs only path + centroids") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
    val dir = Files.createTempDirectory("graft-ivfpq-cb").toString
    // build with TRAINED codebooks — topK must read them back from the
    // index, not re-derive init-only ones (codes are meaningless under
    // any other codebook)
    val trained = Similarity.pqTrainCodebooks(emb, rounds = 1)
    IvfPqIndex.build(emb, centroids, dir, codebooks = Some(trained))
    val queries = emb.filter(col("vec_id") < 3)
    val a = IvfPqIndex.topK(spark, dir, queries, centroids, k = 5, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val b = Similarity.ivfPqTopK(queries, emb, centroids, k = 5, nProbe = 3,
        codebooks = Some(trained))
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(a == b, "stored codebooks must drive the ADC, not re-derived ones")
  }

  test("delete: tombstoned vectors leave the served frontier; equals a survivor-only build") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
    val trained = Similarity.pqTrainCodebooks(emb, rounds = 1)
    val queries = emb.filter(col("vec_id") === 1)
    val dir = Files.createTempDirectory("graft-ivfpq-del").toString
    IvfPqIndex.build(emb, centroids, dir, codebooks = Some(trained))
    val before = IvfPqIndex.topK(spark, dir, queries, centroids, k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val dead = before.take(2).map(_._3)
    IvfPqIndex.delete(dead.toDF("vec_id"), dir)
    IvfPqIndex.delete(dead.toDF("vec_id"), dir) // idempotent replay
    val after = IvfPqIndex.topK(spark, dir, queries, centroids, k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(after.forall(r => !dead.contains(r._3)),
      s"tombstoned vectors still served: $after")
    val fresh = Files.createTempDirectory("graft-ivfpq-del-ref").toString
    IvfPqIndex.build(emb.filter(!col("vec_id").isin(dead: _*)), centroids,
      fresh, codebooks = Some(trained))
    val want = IvfPqIndex.topK(spark, fresh, queries, centroids, k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(after == want,
      "post-delete serving diverged from a survivor-only build")
    assert(spark.read.parquet(s"$dir/_pq_tombstones")
      .groupBy(col("vec_id")).count().filter(col("count") > 1).count() == 0L,
      "delete replay duplicated tombstones")
  }

  test("upsert: revised vectors serve re-encoded codes from their NEW cluster") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
    val queries = emb.filter(col("vec_id") < 10)
    def top(d: String) = IvfPqIndex
      .topK(spark, d, queries, centroids, k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq

    val dir = Files.createTempDirectory("graft-ivfpq-upsert").toString
    IvfPqIndex.build(emb, centroids, dir)
    val before = top(dir)
    val revised = emb.filter(col("vec_id") % 9 === 0)
      .withColumn("embedding", reverse(col("embedding")))
    IvfPqIndex.upsert(revised, centroids, dir, rev = 1L)

    // cluster migration actually happened across the two trees
    val migrated = spark.read.parquet(dir)
      .filter(col("vec_id") % 9 === 0)
      .select(col("vec_id"), col("cluster_id").as("old_c"))
      .join(spark.read.parquet(s"$dir/_pq_rev_rows")
        .select(col("vec_id"), col("cluster_id").as("new_c")), "vec_id")
      .filter(col("old_c") =!= col("new_c")).count()
    assert(migrated > 0, "no revised vector changed cluster — weak fixture")

    // equivalence: a build over the revised corpus under the SAME
    // frozen codebooks (upsert never retrains them)
    val cb = spark.read.parquet(s"$dir/_pq_codebooks")
    val refDir = Files.createTempDirectory("graft-ivfpq-upsert-ref").toString
    IvfPqIndex.build(
      emb.withColumn("embedding",
        when(col("vec_id") % 9 === 0, reverse(col("embedding")))
          .otherwise(col("embedding"))),
      centroids, refDir, codebooks = Some(cb))
    val got = top(dir)
    assert(got == top(refDir),
      "upsert-then-probe diverged from a rebuild over revised vectors")
    assert(got != before, "revision changed no results — weak fixture")

    // replay heal + monotone refusal + rev-2 restore
    val rowsBefore = spark.read.parquet(s"$dir/_pq_rev_rows").count()
    IvfPqIndex.upsert(revised, centroids, dir, rev = 1L)
    assert(spark.read.parquet(s"$dir/_pq_rev_rows").count() == rowsBefore,
      "upsert replay duplicated revision code rows")
    assert(top(dir) == got)
    IvfPqIndex.upsert(emb.filter(col("vec_id") % 9 === 0), centroids, dir,
      rev = 2L)
    assert(top(dir) == before,
      "rev-2 restore of original vectors must restore original serving")
    intercept[IllegalArgumentException] {
      IvfPqIndex.upsert(revised, centroids, dir, rev = 1L)
    }

    // a build-over from source resets ALL maintenance state (the root
    // overwrite clears the dir; codebooks/meta rewrite after) — stale
    // registries may not survive into a rebuilt layout
    IvfPqIndex.build(emb, centroids, dir)
    assert(!new java.io.File(s"$dir/_pq_rev").exists() &&
      !new java.io.File(s"$dir/_pq_rev_rows").exists(),
      "build-over must reset the revision state")
    assert(top(dir) == before, "rebuilt-from-source serving diverged")
  }

  test("full CDC lifecycle: build + append + upsert + delete compose (q171)") {
    // both frozen artifacts in play across all four verbs: appended
    // and revised vectors re-encode under the codebooks stored at
    // build; the tombstone must reach code rows in the main AND rev
    // trees. Codebooks pinned to the full-table derivation so the
    // rebuild twin agrees.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.strideCentroids(emb, stride = 50)
    val cb = Some(Similarity.pqInitCodebooks(emb))
    val queries = emb.filter(col("vec_id") === 1)
    def top(dir: String) = IvfPqIndex
      .topK(spark, dir, queries, centroids, k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq

    val dir = Files.createTempDirectory("graft-ivfpq-cdc").toString
    IvfPqIndex.build(emb.filter(col("vec_id") % 5 =!= 4), centroids, dir,
      codebooks = cb)
    IvfPqIndex.append(emb.filter(col("vec_id") % 5 === 4), centroids, dir)
    val revised = emb.filter(col("vec_id") % 9 === 0)
      .withColumn("embedding", reverse(col("embedding")))
    IvfPqIndex.upsert(revised, centroids, dir, rev = 1L)
    IvfPqIndex.delete(
      emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), dir)

    val refDir = Files.createTempDirectory("graft-ivfpq-cdc-ref").toString
    IvfPqIndex.build(
      emb.withColumn("embedding",
          when(col("vec_id") % 9 === 0, reverse(col("embedding")))
            .otherwise(col("embedding")))
        .filter(col("vec_id") % 7 =!= 0),
      centroids, refDir, codebooks = cb)
    val got = top(dir)
    assert(got == top(refDir),
      "CDC lifecycle diverged from a rebuild over revised survivors")
    assert(got.nonEmpty)
    assert(!got.exists(_._3 % 7 == 0), "a deleted vector still served")
  }
}
