package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized inverted-index layout for [[Bm25]] — the serving form
  * its scaladoc promises: postings bucketed by term on disk so a query
  * probe becomes a PARTITION filter (the same trick as
  * [[IvfIndex]]'s cluster_id dirs and [[Layout]]'s z buckets).
  *
  * Layout under `dir`:
  * {{{
  *   postings/term_bucket=N/…   (doc_id, term, tf, dl) rows, term-sorted
  *   _bm_stats/…                one row: (n_docs, sum_dl)
  * }}}
  *
  * Serving read: the probe terms' bucket ids are driver-computed
  * (control-plane arithmetic over the tiny query-term set — the
  * IvfIndex probe-id precedent), listed as a partition filter, and the
  * surviving postings broadcast-join the term set. Scoring reuses
  * [[Bm25.rank]] verbatim with avgdl derived from the stored stats
  * exactly as Spark's `avg` derives it (long sum / long count in
  * double space), so the indexed path is result-identical to the
  * in-memory path by construction — BmIndexSpec pins equality, the
  * pruned scan, and q102 rides q92's oracle.
  *
  * `append` grows the index O(batch): new docs' postings land inside
  * the existing bucket dirs and the one-row stats table is re-derived
  * as old + batch delta. Contract (like IvfIndex.append's frozen
  * centroids): appended doc_ids must be NEW — re-appending an existing
  * document would double its postings; dedup upstream
  * ([[Dedup.exactGroups]] / the block store's first-writer-wins) owns
  * that invariant. df/avgdl/N automatically reflect appends because df
  * comes from the postings at query time and stats are maintained.
  */
object BmIndex {

  val Buckets = 64L

  private def bucketed(docs: DataFrame): DataFrame =
    Bm25.postingsOf(docs)
      .withColumn("term_bucket",
        pmod(graft.functions.Md5_64.md5_64(col("term")), lit(Buckets)))

  private def statsDelta(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("sum_dl"))

  private def writePostings(docs: DataFrame, dir: String,
      mode: String): Unit =
    bucketed(docs)
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term"))
      .write.partitionBy("term_bucket").mode(mode)
      .parquet(s"$dir/postings")

  def build(docs: DataFrame, dir: String): Unit = {
    writePostings(docs, dir, "overwrite")
    statsDelta(docs).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/_bm_stats")
  }

  /** O(batch) growth: postings append into existing bucket dirs; the
    * one-row stats table becomes old + delta (read to the driver —
    * one row — so the overwrite never reads what it writes). */
  def append(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val old = spark.read.parquet(s"$dir/_bm_stats")
      .select(col("n_docs"), col("sum_dl")).collect()(0)
    writePostings(docs, dir, "append")
    statsDelta(docs)
      .select((col("n_docs") + lit(old.getLong(0))).as("n_docs"),
        (col("sum_dl") + lit(old.getLong(1))).as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_bm_stats")
  }

  /** BM25 top-k served from the materialized layout: probed bucket ids
    * as a partition filter, stored stats as the broadcast scalar. */
  def topK(spark: SparkSession, dir: String, queryTerms: DataFrame,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.select(col("term")).distinct()
    // control-plane: bucket ids of the (tiny) probe set, driver-side
    val buckets = terms.collect().map(r =>
      graft.functions.Md5_64.hash60(r.getString(0)) % Buckets)
      .distinct.toSeq
    val probed = spark.read.parquet(s"$dir/postings")
      .filter(col("term_bucket").isin(buckets: _*))
      .join(broadcast(terms), Seq("term"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    val stats = spark.read.parquet(s"$dir/_bm_stats")
      .select(col("n_docs").cast("double").as("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    Bm25.rank(probed, stats, k, k1, b)
  }
}
