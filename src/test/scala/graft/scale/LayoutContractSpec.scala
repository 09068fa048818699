package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Machine-check of [[LayoutContract]]'s bounded-listing rule
  * (round-17 verdict item 8): the classification table must match the
  * directories each family ACTUALLY writes — a Bounded family's
  * partition-dir count must not move when the corpus triples, and a
  * CorpusProportional family's must. Checked at two corpus sizes so
  * the statement is an observation, not a citation. */
class LayoutContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("text"))
  private def emb = spark.read.parquet(s"$d/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  test("classification table covers every manifest family") {
    val manifestFamilies = Set("lsh", "bm", "ivf", "ivfpq", "zorder",
      "clusters", "citation")
    assert(LayoutContract.classOf.keySet == manifestFamilies,
      "LayoutContract must classify exactly the SnapshotManifest " +
        "families — a new layout must pick a listing class deliberately")
  }

  test("Bounded families: partition-dir count is corpus-independent " +
      "(≤ the fixed bucket constant at 3x the corpus)") {
    val small = docs.filter(col("doc_id") < 150)
    val large = docs.filter(col("doc_id") < 450)
    // LSH — band_bucket dirs under bands/
    val l1 = tmp("graft-lc-lsh-s"); val l2 = tmp("graft-lc-lsh-l")
    LshIndex.build(small, l1); LshIndex.build(large, l2)
    val lshS = LayoutContract.partitionDirCount(spark, s"$l1/bands")
    val lshL = LayoutContract.partitionDirCount(spark, s"$l2/bands")
    assert(lshS == lshL && lshL <= LshIndex.Buckets,
      s"LSH band dirs moved with the corpus ($lshS -> $lshL) — " +
        "Bounded classification violated")
    // BM25 — term_bucket dirs under postings/
    val b1 = tmp("graft-lc-bm-s"); val b2 = tmp("graft-lc-bm-l")
    BmIndex.build(small, b1); BmIndex.build(large, b2)
    val bmS = LayoutContract.partitionDirCount(spark, s"$b1/postings")
    val bmL = LayoutContract.partitionDirCount(spark, s"$b2/postings")
    assert(bmS == bmL && bmL <= BmIndex.Buckets,
      s"BM25 term dirs moved with the corpus ($bmS -> $bmL)")
  }

  test("CorpusProportional families: IVF/IVF+PQ cluster dirs grow with " +
      "the corpus (nlist ∝ corpus — the handle exists for this)") {
    val small = emb.filter(col("vec_id") < 150)
    val large = emb.filter(col("vec_id") < 450)
    val cS = Similarity.strideCentroids(small, 50).localCheckpoint()
    val cL = Similarity.strideCentroids(large, 50).localCheckpoint()
    val i1 = tmp("graft-lc-ivf-s"); val i2 = tmp("graft-lc-ivf-l")
    IvfIndex.build(small, cS, i1); IvfIndex.build(large, cL, i2)
    val ivfS = LayoutContract.partitionDirCount(spark, i1)
    val ivfL = LayoutContract.partitionDirCount(spark, i2)
    assert(ivfL > ivfS,
      s"IVF cluster dirs did not grow with the corpus ($ivfS -> $ivfL)" +
        " — either nlist stopped tracking the corpus or the " +
        "classification is stale")
    val p1 = tmp("graft-lc-pq-s"); val p2 = tmp("graft-lc-pq-l")
    IvfPqIndex.build(small, cS, p1); IvfPqIndex.build(large, cL, p2)
    assert(LayoutContract.partitionDirCount(spark, p2) >
      LayoutContract.partitionDirCount(spark, p1),
      "IVF+PQ cluster dirs did not grow with the corpus")
  }
}
