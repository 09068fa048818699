package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 top-k document retrieval via an inverted-postings probe —
  * the lexical half of a retrieval/RAG pipeline, complementing the
  * embedding ANN family ([[Similarity]], [[graft.scale.IvfIndex]]).
  *
  * Scale shape (the part that matters at 100 TB):
  *   - The postings table (doc, term, tf, dl) is built with ONE shuffle
  *     (groupBy doc+term); document length rides the shuffle as a
  *     `min(dl)` so no second join against a doc-length table is needed.
  *   - The query-term set broadcast-joins the postings on `term` — the
  *     inverted-index probe. Only postings whose term appears in the
  *     query flow past that join, so scoring cost is O(Σ df(q_t)), not
  *     O(corpus). With postings bucketed by term on disk the probe
  *     becomes a partition filter, the same serving trick as
  *     [[IvfIndex]]'s cluster_id layout.
  *   - df(term) comes from the postings themselves (term-keyed agg of
  *     the probed postings' terms only — df of non-query terms is never
  *     computed); N and avgdl are a one-row corpus aggregate that joins
  *     as a broadcast scalar inside the plan (no driver-side count —
  *     same rule as q51's in-plan corpus size).
  *   - Per-term scores are quantized to longs BEFORE the per-doc sum, so
  *     the fold is integer and order-independent — bit-identical under
  *     any partitioning, and exactly replayable by a SQL oracle.
  *   - Top-k is `orderBy(...).limit(k)` — Spark plans a distributed
  *     TakeOrdered (per-partition heaps + driver merge of k·P rows),
  *     NOT a single-partition global window.
  *
  * BM25 per Robertson/Spärck Jones with the Lucene idf variant:
  *   idf(t)     = ln((N − df + 0.5) / (df + 0.5) + 1)
  *   score(t,d) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * Reference scope note: the reference pipeline has no retrieval
  * operator; this extends the LLM-data-pipeline surface (SURVEY §2
  * extension family) like the dedup/ANN ops do.
  */
object Bm25 {

  /** BM25 top-k over `docs` (doc_id, text) for `queryTerms` (a tiny
    * one-column `term` DataFrame; broadcast). Returns
    * (rank, doc_id, n_hit, score_q) where score_q is the per-doc sum of
    * per-term scores quantized by floor(s·1e6) — ties break to the
    * lowest doc_id. */
  def topK(docs: DataFrame, queryTerms: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // corpus stats as an in-plan broadcast scalar (no driver count)
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(split(col("text"), " ")).cast("long")).as("avgdl"))
    rank(probe(postingsOf(docs), queryTerms), stats, k, k1, b)
  }

  /** The (doc_id, term, tf, dl) postings table: ONE shuffle (groupBy
    * doc+term), document length riding it as `min(dl)`. This is also
    * what [[BmIndex.build]] materializes, bucketed by term. */
  private[scale] def postingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))

  /** Inverted-index probe: only postings on query terms survive. */
  private[scale] def probe(postings: DataFrame,
      queryTerms: DataFrame): DataFrame =
    postings.join(broadcast(queryTerms.select(col("term")).distinct()),
      Seq("term"))

  /** Score and rank probed postings. `stats` is a one-row
    * (n_docs double, avgdl double) DataFrame — in-memory aggregate or
    * the index's stored stats; both sides of the serving split share
    * THIS code, so the materialized path is result-identical by
    * construction. */
  private[scale] def rank(probed: DataFrame, stats: DataFrame, k: Int,
      k1: Double, b: Double): DataFrame = {
    // df over the PROBED terms only (term-keyed agg of a tiny slice;
    // postings are unique per (doc, term), so a plain count IS the
    // distinct doc count)
    val dfs = probed.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val perTerm = probed.join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(idf * tfNorm * lit(1e6)).cast("long").as("sc"))
    // integer per-doc fold: order-independent, oracle-replayable
    val perDoc = perTerm.groupBy(col("doc_id"))
      .agg(sum(col("sc")).as("score_q"), count(lit(1)).as("n_hit"))
    // distributed TakeOrdered, then rank over the k surviving rows
    val top = perDoc
      .orderBy(col("score_q").desc, col("doc_id").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_q").desc, col("doc_id").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("doc_id"), col("n_hit"), col("score_q"))
  }
}
