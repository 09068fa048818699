package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: Reciprocal Rank Fusion (Cormack, Clarke &
  * Buettcher, SIGIR 2009) over ranked candidate lists —
  *
  *   rrf(d) = Σ_lists 1 / (K + rank_d(list))   (absent ⇒ contributes 0)
  *
  * the standard way to combine a lexical ranking ([[Bm25]]) with a
  * vector ranking ([[Similarity]]/[[IvfIndex]]) without score
  * calibration: only RANKS cross the boundary, so BM25's unbounded
  * scores and cosine's [−1, 1] never need normalizing against each
  * other.
  *
  * Scale shape: the inputs are per-query top-k lists — k rows per
  * retriever regardless of corpus size — so fusion cost is O(k·lists)
  * per query and every join here is broadcast-trivial; all heavy
  * lifting (postings probe, ANN probe) happened upstream in the
  * retrievers. The fused sum is a FIXED-ORDER fold over the lists (list
  * 0 + list 1 + …), so the double arithmetic is reproducible and a SQL
  * oracle replays it term for term (q94).
  */
object Hybrid {

  /** Fuse ranked lists, each `(keys…, rank)`, joining FULL OUTER on
    * `keys` (default a single `id` column; pass `Seq("query_id", "id")`
    * for multi-query fusion). Returns one row per candidate:
    * `(keys…, rank_0 … rank_{n−1}, rrf)` with null rank_i where list i
    * did not surface the candidate and `rrf` the double RRF score. */
  def rrf(lists: Seq[DataFrame], kRrf: Int = 60,
      keys: Seq[String] = Seq("id")): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    val renamed = lists.zipWithIndex.map { case (df, i) =>
      df.select(keys.map(col) :+ col("rank").as(s"rank_$i"): _*)
    }
    val joined = renamed.reduce((a, b) => a.join(b, keys, "full_outer"))
    val score = renamed.indices
      .map { i => contribution(col(s"rank_$i"), kRrf) }
      .reduceLeft(_ + _) // fixed fold order: list 0 + list 1 + …
    joined.withColumn("rrf", score)
  }

  /** 1/(K + rank), 0 when the candidate is absent from the list. */
  private def contribution(rank: Column, kRrf: Int): Column =
    when(rank.isNull, lit(0.0)).otherwise(lit(1.0) / (lit(kRrf) + rank))
}
