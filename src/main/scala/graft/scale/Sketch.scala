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
  /** Pass-2 evaluates against d in-plan array LITERALS of w longs each —
    * d·w cells are serialized into the plan and shipped to every task.
    * 4×1024 = 32 KiB is free; a 100 TB-sized sketch (w = 2^17+) would
    * inline megabytes into every plan and blow codegen limits, so the
    * contract is explicit: past this bound, restructure pass 2 as a
    * broadcast-map join on (r, b) instead of array literals. */
  val MaxInlineCells = 65536

  def heavyHitters(terms: DataFrame, phi: Long = 1000L, d: Int = 4,
      w: Int = 1024): DataFrame = {
    require(phi > 0)
    require(d.toLong * w <= MaxInlineCells,
      s"d*w = ${d.toLong * w} exceeds MaxInlineCells=$MaxInlineCells: the " +
        "pass-2 filter inlines the sketch as plan literals; a sketch this " +
        "large must switch to a broadcast (r,b)->cnt map join")
    val cells = countMin(terms, d, w).collect()
    val flat = Array.fill(d * w)(0L)
    cells.foreach(r =>
      flat(r.getLong(0).toInt * w + r.getLong(1).toInt) = r.getLong(2))
    // every occurrence lands in exactly one row-0 cell: N = Σ row 0
    val n = (0 until w).map(flat(_)).sum
    val threshold = n / phi
    // n < phi floors the cut to 0 — mathematically every present term
    // IS a φ-heavy hitter then, but the filter would pass the whole
    // vocabulary and the O(heavy terms) shuffle contract inverts;
    // that phi was almost certainly mis-sized for the corpus, so fail
    // loudly instead of silently degrading (the pageRankQ guard
    // discipline)
    require(threshold >= 1,
      s"phi=$phi exceeds total occurrences n=$n: the frequency cut is 0 " +
        "and every term would qualify — lower phi or count exactly at " +
        "this corpus size")
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

  /** Fixed-memory QUANTILES — the third sketch pillar next to
    * frequency (Count-Min, above) and distinct (q65's HLL++): per-group
    * equi-width histogram over a long-valued column, quantile estimate
    * = lower bound of the first bin whose cumulative count reaches the
    * target rank. Exact percentiles (q54) shuffle every (group, value)
    * pair and hold each group's values for the sort; this sketch's
    * state is ≤ `bins` cells PER GROUP at any corpus size, map-side
    * combined, and two shards' histograms merge by cell-wise add —
    * the same reason Count-Min scales.
    *
    * Two passes, both one aggregation: pass 1 derives the global
    * (lo, hi) extent as a one-row broadcast (the SQ8 train pattern);
    * pass 2 bins values — bin = (v − lo)·bins div (hi − lo + 1),
    * clamped — and counts. The per-group cumulative walk and rank
    * pick run over ≤ `bins` rows per group (a window over the
    * HISTOGRAM, never the data). Everything is integer arithmetic on
    * longs, so estimates are bit-reproducible on any partitioning and
    * any engine — the oracle replays binning, cumsum, and pick
    * exactly.
    *
    * Error contract (SketchSpec-pinned): the discrete q-quantile lies
    * in [est, est + binWidth) for binWidth = (hi − lo + 1) div bins +
    * 1 — one bin of slack, the classic equi-width histogram bound.
    * Degenerate input (empty `rows`) yields an empty result.
    *
    * Returns (g, pq, qbin, est) for each percentage in `pcts`. */
  def histQuantiles(rows: DataFrame, groupCol: String, valCol: String,
      bins: Int = 64, pcts: Seq[Int] = Seq(25, 50, 75, 95)): DataFrame = {
    require(bins >= 2)
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val ext = rows.agg(min(col(valCol)).cast("long").as("lo"),
      max(col(valCol)).cast("long").as("hi"))
    val binned = rows
      .select(col(groupCol).as("g"), col(valCol).cast("long").as("v"))
      .crossJoin(broadcast(ext))
      .select(col("g"),
        expr(s"least(((v - lo) * $bins) div (hi - lo + 1), ${bins - 1})")
          .as("bin"))
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // window over ≤ bins histogram rows per group — never the corpus
    val cum = binned.withColumn("cs", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
    val qs = rows.sparkSession.range(1)
      .select(explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pq"))
    cum.crossJoin(broadcast(qs))
      .filter(col("cs") * lit(100L) >= col("pq") * col("n"))
      .groupBy(col("g"), col("pq")).agg(min(col("bin")).as("qbin"))
      .crossJoin(broadcast(ext))
      .select(col("g"), col("pq"), col("qbin"),
        expr(s"lo + (qbin * (hi - lo + 1)) div $bins").as("est"))
  }

  // -------------------------------------------------------------------
  // Rank-error quantiles — the skew-robust successor to histQuantiles.
  // -------------------------------------------------------------------

  /** Per-group mergeable RANK-error quantile sketch: the fixed-size
    * state is the k rows with the smallest md5_64(group:id) hash (a
    * deterministic uniform row sample — bottom-k on a pseudo-random
    * permutation of row ids), and the q-quantile estimate is the
    * ⌈q·m⌉-th order statistic of that sample.
    *
    * WHY this construction and not a KLL/GK compactor: the error bound
    * [[histQuantiles]] offers is in VALUE space — one 2^40 outlier
    * stretches its global (lo, hi) extent until every real document
    * lands in bin 0 and the p50 estimate is useless precisely on the
    * heavy-tailed length/token distributions (q44/q54) the sketch
    * exists for. The fix must bound RANK error: est's true rank within
    * ε·n of the target, independent of the value distribution. KLL
    * gets there with coin-flip compaction and GK with order-dependent
    * inserts — both make a distributed result depend on partitioning
    * and scheduling, which breaks the repo's oracle discipline (every
    * estimate bit-replayable by an external SQL engine). Bottom-k on a
    * content hash is the derandomized sample: a pure FUNCTION of the
    * dataset (order- and partitioning-invariant), trivially mergeable
    * — bottomK(bottomK(A) ∪ bottomK(B)) = bottomK(A ∪ B), the KMV
    * union rule — at the classic sample-quantile bound: rank error
    * ≤ ε·n w.h.p. for k = O(1/ε²) (Θ(1/ε² · log 1/δ) vs KLL's
    * Θ(1/ε · log² log 1/δ) — the space trade bought determinism, and
    * at k=256 the state is 4 KiB/group: noise at 100 TB).
    *
    * Scale shape: the sampling `row_number ≤ k` filter is recognized
    * by Spark's WindowGroupLimit rule, which k-selects map-side BEFORE
    * the group exchange — the shuffle carries ≤ k rows per group per
    * map partition, never the corpus (RankQuantileSpec pins the
    * operator's presence in the plan). Everything downstream runs on
    * ≤ k rows per group. All comparisons are on long hashes and long
    * values, so estimates are bit-reproducible on any partitioning and
    * any engine.
    *
    * Returns the sketch state `(g, h, id, v)` — ≤ k rows per group;
    * feed to [[rankQuantilesOf]] (estimates) or union states and
    * re-apply (merge). */
  def rankSample(rows: DataFrame, groupCol: String, valCol: String,
      idCol: String, k: Int = 256): DataFrame = {
    require(k >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("h"), col("id"))
    rows
      .select(col(groupCol).as("g"), col(valCol).cast("long").as("v"),
        col(idCol).cast("long").as("id"))
      .withColumn("h", graft.functions.Md5_64.md5_64(
        concat_ws(":", col("g"), col("id"))))
      .withColumn("srn", row_number().over(w))
      .filter(col("srn") <= k)
      .select(col("g"), col("h"), col("id"), col("v"))
  }

  /** KMV union: merging two shards' sketches is re-taking the bottom-k
    * of the union — the hash ranks are global, so the merged sketch
    * EQUALS the sketch of the union of the underlying data
    * (RankQuantileSpec pins this as exact frame equality, not just
    * estimate agreement). */
  def mergeRankSamples(a: DataFrame, b: DataFrame, k: Int = 256): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("h"), col("id"))
    a.unionByName(b)
      // the same row can appear in both shards' sketches
      .dropDuplicates("g", "id")
      .withColumn("srn", row_number().over(w))
      .filter(col("srn") <= k)
      .select(col("g"), col("h"), col("id"), col("v"))
  }

  /** Estimate quantiles from a [[rankSample]] state: for percentage p
    * the estimate is the ⌈p·m/100⌉-th smallest sample value (m = the
    * group's sample size — min(k, group rows), so small groups degrade
    * to EXACT quantiles). Integer rank arithmetic; the value pick is
    * tie-safe (equal values give the same estimate under any
    * tiebreak). Runs entirely on ≤ k rows per group.
    *
    * Returns (g, pq, est). */
  def rankQuantilesOf(sample: DataFrame, pcts: Seq[Int] = Seq(25, 50, 75, 95)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val byV = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("id"))
    val m = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val qs = sample.sparkSession.range(1)
      .select(explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pq"))
    sample
      .withColumn("rnk", row_number().over(byV).cast("long"))
      .withColumn("m", count(lit(1)).over(m))
      .crossJoin(broadcast(qs))
      .filter(col("rnk") === expr("(pq * m + 99) div 100"))
      .select(col("g"), col("pq"), col("v").as("est"))
  }

  /** One-shot build + estimate — the q134 surface. */
  def rankQuantiles(rows: DataFrame, groupCol: String, valCol: String,
      idCol: String, k: Int = 256,
      pcts: Seq[Int] = Seq(25, 50, 75, 95)): DataFrame =
    rankQuantilesOf(rankSample(rows, groupCol, valCol, idCol, k), pcts)

  // -------------------------------------------------------------------
  // KMV theta sketch — distinct counts and SET OVERLAP from bottom-k
  // hash samples (Beyer et al. 2007; the Theta-sketch intersection of
  // Dasgupta et al.). The decontamination question q69 answers exactly
  // ("which eval n-grams appear in train") costs a full join of both
  // corpora; at 100 TB the pipeline first asks the ESTIMATE — "is the
  // overlap ~0 or ~10%?" — from two k-row sketches that each corpus
  // computes once and ships anywhere. Portable md5_64 hashing end to
  // end, so sketches built by different engines merge, and the whole
  // estimator replays in SQL (the q154 oracle).
  // -------------------------------------------------------------------

  /** 60-bit hash space of [[graft.functions.Md5_64]]. */
  val KmvHashSpace: Double = math.pow(2.0, 60)

  /** Bottom-k DISTINCT hash sketch of a column: the k smallest
    * md5_64 values among the column's distinct values, one narrow
    * `(h)` frame. TakeOrderedAndProject after a distinct — per
    * partition the sort keeps only k rows, the driver merges k·tasks
    * candidates: nothing corpus-sized moves. */
  def kmvDistinctSketch(rows: DataFrame, c: Column, k: Int = 1024): DataFrame =
    rows.select(graft.functions.Md5_64.md5_64(c).as("h"))
      .distinct().orderBy(col("h")).limit(k)

  /** Distinct-count estimate from a [[kmvDistinctSketch]]: if the
    * sketch is saturated (k rows), est = (k-1) · 2^60 / h_k; below
    * saturation the sketch IS the distinct set and the count is exact.
    * Returns one row (n_sample, h_k, est_distinct). */
  def kmvDistinctEstimate(sketch: DataFrame, k: Int = 1024): DataFrame =
    sketch.agg(count(lit(1)).as("n_sample"), max(col("h")).as("h_k"))
      .select(col("n_sample"), col("h_k"),
        when(col("n_sample") < k, col("n_sample"))
          .otherwise(floor((col("n_sample") - 1).cast("double") *
            lit(KmvHashSpace) / col("h_k").cast("double")).cast("long"))
          .as("est_distinct"))

  /** Theta-sketch OVERLAP estimate between two bottom-k sketches:
    * U = bottom-k of the merged hash sets, θ' = h_k(U) (the union's
    * k-th smallest hash — every hash below it was sampled from BOTH
    * sets' perspective), and the intersection estimate counts U's
    * members present in both sketches, scaled by the inverse sampling
    * fraction 2^60/θ'. Below saturation (|A ∪ B| ≤ k) everything is
    * exact. Returns one row `(n_union_sample, h_k, n_both,
    * est_union, est_common)` — integer counts plus floor-scaled
    * estimates, replayable bit-for-bit in external SQL. */
  def kmvOverlapEstimate(a: DataFrame, b: DataFrame,
      k: Int = 1024): DataFrame = {
    val u = a.select(col("h")).unionByName(b.select(col("h")))
      .distinct().orderBy(col("h")).limit(k)
    val marked = u
      .join(a.select(col("h"), lit(1).as("in_a")), Seq("h"), "left")
      .join(b.select(col("h"), lit(1).as("in_b")), Seq("h"), "left")
    marked.agg(
        count(lit(1)).as("n_union_sample"),
        max(col("h")).as("h_k"),
        sum((col("in_a").isNotNull && col("in_b").isNotNull).cast("long"))
          .as("n_both"))
      .select(col("n_union_sample"), col("h_k"), col("n_both"),
        when(col("n_union_sample") < k, col("n_union_sample"))
          .otherwise(floor((col("n_union_sample") - 1).cast("double") *
            lit(KmvHashSpace) / col("h_k").cast("double")).cast("long"))
          .as("est_union"),
        when(col("n_union_sample") < k, col("n_both"))
          .otherwise(floor(col("n_both").cast("double") *
            lit(KmvHashSpace) / col("h_k").cast("double")).cast("long"))
          .as("est_common"))
  }
}
