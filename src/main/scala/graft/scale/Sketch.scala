package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size frequency sketching: Count-Min (Cormode & Muthukrishnan
  * 2005) — the mergeable heavy-hitter/frequency structure whose state
  * is d×w cells REGARDLESS of corpus size, which is the property that
  * matters at 100 TB: the shuffle after map-side partial aggregation
  * carries at most tasks·d·w cell updates, never the token stream, and
  * two corpora's sketches merge by cell-wise add (so per-shard
  * sketches roll up without touching rows again).
  *
  * Hash family: row r maps term x to bucket md5_64("r:x") mod w — the
  * portable 60-bit content hash (functions/Md5_64), so the sketch is
  * bit-reproducible in DuckDB and across engines. The classic CMS
  * guarantee holds per row (est ≥ true; err ≤ εN w.h.p.); the min
  * over d rows is the estimate.
  */
object Sketch {

  private def bucket(r: Column, term: Column, w: Int): Column =
    pmod(graft.functions.Md5_64.md5_64(concat_ws(":", r, term)), lit(w.toLong))

  /** Build the d×w Count-Min table from a `(term)` stream: one row per
    * occurrence. Returns (r, b, cnt) — at most d·w rows. */
  def countMin(terms: DataFrame, d: Int = 4, w: Int = 1024): DataFrame =
    terms
      .select(explode(sequence(lit(0L), lit(d - 1L))).as("r"), col("term"))
      .select(col("r"), bucket(col("r"), col("term"), w).as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))

  /** Point-query the sketch for each probe term: est = min over the d
    * cells the term hashes to. `cms` is [[countMin]]'s output (tiny —
    * broadcast); `probes` is a `(term)` DataFrame. */
  def estimate(cms: DataFrame, probes: DataFrame, d: Int = 4,
      w: Int = 1024): DataFrame =
    probes
      .select(explode(sequence(lit(0L), lit(d - 1L))).as("r"), col("term"))
      .select(col("term"), col("r"), bucket(col("r"), col("term"), w).as("b"))
      .join(broadcast(cms), Seq("r", "b"), "left")
      .groupBy(col("term"))
      // a missing cell means count 0 (term never hashed there)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
}
