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

  /** Heavy hitters WITHOUT a candidate list — the discovery half that
    * [[estimate]]'s point queries lack: "which terms are heavy in a
    * 100 TB stream" with no probe set, via the classic CMS+threshold
    * two-pass (est ≥ true is one-sided, so EVERY term with true count
    * ≥ N/phi survives the filter — completeness is guaranteed, false
    * positives are bounded by the εN estimate error; SketchSpec pins
    * both against exact counts).
    *
    * Scale shape: pass 1 builds the d×w sketch (fixed memory, map-side
    * combined — the only state proportional to nothing). The sketch is
    * then collected — ≤ d·w cells, the KMeans-centroid control-plane
    * precedent — and the stream total N falls out of row 0's cells, so
    * no extra counting action runs. Pass 2 re-scans the stream and
    * evaluates each occurrence's estimate INLINE against the d
    * array-literal rows (codegen'd `element_at` + `least`, zero join),
    * filtering BEFORE any shuffle: the only aggregation the cluster
    * pays for is the dedup of surviving heavy-term occurrences —
    * O(heavy terms) rows after map-side combine, never the vocabulary.
    * Deterministic end to end (md5 hashes, integer threshold), so a
    * SQL engine replays the exact candidate set.
    *
    * Returns (term, est_cnt) for every term with est ≥ N div phi.
    */
  def heavyHitters(terms: DataFrame, phi: Long = 1000L, d: Int = 4,
      w: Int = 1024): DataFrame = {
    require(phi > 0)
    val cells = countMin(terms, d, w).collect()
    val flat = Array.fill(d * w)(0L)
    cells.foreach(r =>
      flat(r.getLong(0).toInt * w + r.getLong(1).toInt) = r.getLong(2))
    // every occurrence lands in exactly one row-0 cell: N = Σ row 0
    val n = (0 until w).map(flat(_)).sum
    val threshold = n / phi
    val est = (0 until d).map { r =>
      element_at(lit(flat.slice(r * w, (r + 1) * w)),
        (bucket(lit(r.toLong), col("term"), w) + lit(1L)).cast("int"))
    }.reduce(least(_, _))
    terms.select(col("term"), est.as("est_cnt"))
      .filter(col("est_cnt") >= lit(threshold))
      .groupBy(col("term")).agg(min(col("est_cnt")).as("est_cnt"))
  }

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
