package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Windowed-analytics extensions. The reference needs none of these
  * (SURVEY §2.7/§2.6 marks them absent), but a query engine replacing it
  * should offer them; all are shuffle-on-key window plans with exact
  * DuckDB oracles.
  */
object WindowCatalogue {

  // ---------------------------------------------------------------------
  // q45 — sessionization (gaps-and-islands): 30-minute inactivity gap
  // ---------------------------------------------------------------------
  def q45Sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events(s, d)
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > 1800000L, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(cum))
    sess.groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("ev"),
        (max(unix_millis(col("ts"))) - min(unix_millis(col("ts")))).as("dur_ms"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("sessions"),
        sum(col("ev")).as("total_events"),
        max(col("ev")).as("max_session_events"),
        max(col("dur_ms")).as("longest_session_ms"))
      .orderBy(col("user_id"))
  }
  val q45Sql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, event_id, ts,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM marked),
      |per_sess AS (
      |  SELECT user_id, sess_id, count(*) AS ev,
      |    max(epoch_ms(ts)) - min(epoch_ms(ts)) AS dur_ms
      |  FROM sessions GROUP BY user_id, sess_id)
      |SELECT user_id, count(*) AS sessions, CAST(sum(ev) AS BIGINT) AS total_events,
      |  max(ev) AS max_session_events, max(dur_ms) AS longest_session_ms
      |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q46 — running aggregates with explicit frames
  // ---------------------------------------------------------------------
  def q46Running(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("run_cnt", count(lit(1)).over(w))
      .withColumn("run_sum_c",
        sum(floor(col("value") * 100).cast("long")).over(w))
      .filter(col("event_id") % 10 === 0)
      .select(col("event_id"), col("user_id"), col("run_cnt"), col("run_sum_c"))
      .orderBy(col("event_id"))
  }
  val q46Sql: String =
    """SELECT event_id, user_id, run_cnt, run_sum_c FROM (
      |  SELECT event_id, user_id,
      |    count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cnt,
      |    CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_sum_c
      |  FROM events) t
      |WHERE event_id % 10 = 0 ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q47 — rollup (hierarchical subtotals)
  // ---------------------------------------------------------------------
  def q47Rollup(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)
  val q47Sql: String =
    """SELECT lang, source, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents GROUP BY ROLLUP (lang, source)
      |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // q48 — lag/lead analytics: inter-event gap stats per user
  // ---------------------------------------------------------------------
  def q48EventGaps(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("gap_ms", unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w))
      .filter(col("gap_ms").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("gaps"),
        min(col("gap_ms")).as("min_gap_ms"),
        max(col("gap_ms")).as("max_gap_ms"),
        sum(col("gap_ms")).as("total_gap_ms"))
      .orderBy(col("user_id"))
  }
  val q48Sql: String =
    """SELECT user_id, count(*) AS gaps, min(gap_ms) AS min_gap_ms,
      |  max(gap_ms) AS max_gap_ms, CAST(sum(gap_ms) AS BIGINT) AS total_gap_ms
      |FROM (
      |  SELECT user_id,
      |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
      |  FROM events) t
      |WHERE gap_ms IS NOT NULL GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q60 — cube (all grouping combinations) with grouping-set markers:
  // the full cross-dimensional profile (lang × source) in one pass.
  // Spark plans cube as Expand + single-shuffle aggregate — the same
  // shape that holds at 100 TB (rows expand ×4, keys stay small).
  // ---------------------------------------------------------------------
  def q60Cube(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"),
        grouping(col("lang")).as("g_lang"), grouping(col("source")).as("g_source"))
      .orderBy(col("g_lang"), col("g_source"),
        col("lang").asc_nulls_first, col("source").asc_nulls_first)
  val q60Sql: String =
    """SELECT lang, source, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars,
      |  GROUPING(lang) AS g_lang, GROUPING(source) AS g_source
      |FROM documents GROUP BY CUBE (lang, source)
      |ORDER BY g_lang, g_source, lang NULLS FIRST, source NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // q61 — quality deciles: exact ntile semantics over a composite
  // quality score (the bucketing step before per-decile sampling
  // decisions), computed WITHOUT a global single-partition sort window.
  // Distributed exact-rank recipe: (1) approx-percentile boundaries
  // split the score into range buckets (ties share a bucket, so the
  // (score, doc_id) total order never crosses buckets); (2) per-bucket
  // row_number — the window partitions on the bucket, so every executor
  // sorts only its slice; (3) per-bucket counts prefix-summed into
  // offsets (control-plane: ≤ `buckets` longs) broadcast back; (4)
  // global rank = offset + local rank, folded through the standard
  // ntile size formula (first N%k tiles get ⌈N/k⌉ rows). Identical
  // output to `ntile(10) OVER (ORDER BY …)` — the DuckDB oracle runs
  // exactly that — with the single-partition Window replaced by a
  // hash-partitioned one (PlanShapeSpec asserts no empty partitionSpec).
  // ---------------------------------------------------------------------
  def q61QualityDeciles(s: SparkSession, d: String): DataFrame = {
    // cached for the TWO eager driver-side jobs below (approx-quantile +
    // per-bucket counts); unpersisted before returning so no block stays
    // pinned in executor memory across catalogue runs — the returned
    // plan re-scans the pruned 2-column projection once instead, which
    // is cheaper than a slow cache leak in a long-lived session
    val cached = documents(s, d).select(col("doc_id"), col("n_chars")).cache()
    val buckets = 32
    val (bounds, counts) = try {
      // interior boundaries: 31 doubles to the driver — control-plane
      val b = cached.stat.approxQuantile("n_chars",
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
        .distinct.sorted
      val boundsArr = array(b.toIndexedSeq.map(lit(_)): _*)
      // per-bucket counts → exclusive prefix offsets (≤ `buckets` rows)
      val c = cached.withColumn("bucket",
          size(filter(boundsArr, x => x < col("n_chars"))))
        .groupBy(col("bucket")).count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      (b, c)
    } finally cached.unpersist()
    val docs = documents(s, d).select(col("doc_id"), col("n_chars"))
    val boundsArr = array(bounds.toIndexedSeq.map(lit(_)): _*)
    val bucketed = docs.withColumn("bucket",
      size(filter(boundsArr, b => b < col("n_chars"))))
    val n = counts.map(_._2).sum
    val offsets = counts.scanLeft((0, 0L)) {
      case ((_, acc), (b, c)) => (b, acc + c)
    }.tail.zip(counts).map { case ((b, end), (_, c)) => (b, end - c) }
    val offsetDf = docs.sparkSession
      .createDataFrame(offsets.toSeq).toDF("bucket", "offset")
    val wLocal = Window.partitionBy(col("bucket"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val q = n / 10
    val rem = n % 10
    val ranked = bucketed
      .join(broadcast(offsetDf), "bucket")
      .withColumn("r", col("offset") + row_number().over(wLocal))
      // standard ntile sizing: first `rem` tiles take q+1 rows, rest q
      .withColumn("decile",
        when(lit(q) === 0, col("r"))
          .when(col("r") <= lit(rem * (q + 1)),
            ((col("r") - 1) / lit(q + 1)).cast("int") + 1)
          .otherwise(lit(rem) +
            ((col("r") - lit(rem * (q + 1)) - 1) / lit(q)).cast("int") + 1))
    ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("docs"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      .orderBy(col("decile"))
  }
  val q61Sql: String =
    """SELECT decile, count(*) AS docs, min(n_chars) AS min_chars,
      |  max(n_chars) AS max_chars
      |FROM (
      |  SELECT doc_id, n_chars,
      |    ntile(10) OVER (ORDER BY n_chars ASC, doc_id ASC) AS decile
      |  FROM documents) t
      |GROUP BY decile ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------------
  // q62 — as-of join (nearest earlier event): each error event picks up
  // the most recent preceding click of the same user. Spark has no
  // native ASOF JOIN; the composition is `last(..., ignoreNulls) over an
  // UNBOUNDED PRECEDING..1 PRECEDING frame` after a union-by-key — one
  // shuffle on the key, one ordered scan, no point-lookup joins. The
  // same plan drains as-of state at any scale (frame state is O(1)).
  // ---------------------------------------------------------------------
  def q62AsofJoin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .withColumn("click_ms",
        last(when(col("event_type") === "click", unix_millis(col("ts"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "error" && col("click_ms").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("err_ms"), col("click_ms"),
        (unix_millis(col("ts")) - col("click_ms")).as("asof_gap_ms"))
      .orderBy(col("event_id"))
  }
  val q62Sql: String =
    """SELECT user_id, event_id, err_ms, click_ms, err_ms - click_ms AS asof_gap_ms
      |FROM (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS err_ms,
      |    last_value(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ms
      |  FROM events) t
      |WHERE event_type = 'error' AND click_ms IS NOT NULL
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q63 — range join (pairs within a time band): same-user event pairs
  // ≤ 10 minutes apart. The naive form is a per-key theta join (the
  // DuckDB oracle); the Spark plan is the scale form: bucket time into
  // band-width bins, explode one side to its 3 candidate bins, equi-join
  // on (user, bin), then apply the exact band predicate. Candidate cost
  // is collision-proportional, never O(n²) per key.
  // ---------------------------------------------------------------------
  def q63RangeJoin(s: SparkSession, d: String): DataFrame = {
    val bandMs = 600000L
    val e = events(s, d)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
    val a = e.select(col("user_id"), col("event_id").as("id1"),
      col("ms").as("ms1"), floor(col("ms") / bandMs).cast("long").as("bin"))
    val b = e.select(col("user_id"), col("event_id").as("id2"), col("ms").as("ms2"))
      .withColumn("bin",
        explode(array(floor(col("ms2") / bandMs).cast("long") - 1,
          floor(col("ms2") / bandMs).cast("long"),
          floor(col("ms2") / bandMs).cast("long") + 1)))
    a.join(b, Seq("user_id", "bin"))
      .filter(col("id1") < col("id2") && abs(col("ms1") - col("ms2")) <= bandMs)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("pairs"),
        min(abs(col("ms1") - col("ms2"))).as("min_gap_ms"),
        max(abs(col("ms1") - col("ms2"))).as("max_gap_ms"))
      .orderBy(col("user_id"))
  }
  val q63Sql: String =
    """SELECT a.user_id, count(*) AS pairs,
      |  min(abs(epoch_ms(a.ts) - epoch_ms(b.ts))) AS min_gap_ms,
      |  max(abs(epoch_ms(a.ts) - epoch_ms(b.ts))) AS max_gap_ms
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      |  AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 600000
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q64 — set operations (INTERSECT / EXCEPT): behavioral cohorts.
  // SURVEY §2.8 marks these absent in the reference; an engine replacing
  // it needs them. Both plan as distinct-aggregates over the key only —
  // at scale the shuffle carries 8-byte user ids, never event payloads.
  // ---------------------------------------------------------------------
  def q64SetOps(s: SparkSession, d: String): DataFrame = {
    def cohort(t: String) = events(s, d)
      .filter(col("event_type") === t).select(col("user_id")).distinct()
    val both = cohort("purchase").intersect(cohort("signup"))
      .withColumn("cohort", lit("purchase_and_signup"))
    val only = cohort("purchase").except(cohort("error"))
      .withColumn("cohort", lit("purchase_no_error"))
    both.unionByName(only)
      .orderBy(col("cohort"), col("user_id"))
  }
  val q64Sql: String =
    """SELECT user_id, 'purchase_and_signup' AS cohort FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      |  INTERSECT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup') t1
      |UNION ALL
      |SELECT user_id, 'purchase_no_error' AS cohort FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      |  EXCEPT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error') t2
      |ORDER BY cohort, user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q66 — pivot (long → wide reshaping): per-user event counts by type.
  // Pivot values are given explicitly, so Spark skips the extra distinct
  // pass and plans a single conditional aggregation — one shuffle on the
  // grouping key regardless of pivot-column cardinality. The oracle uses
  // the equivalent conditional sums (engine-neutral form).
  // ---------------------------------------------------------------------
  def q66Pivot(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("user_id"))
  }
  val q66Sql: String =
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'error') AS error,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_sessionize" -> q45Sessionize _,
    "q46_running" -> q46Running _,
    "q47_rollup" -> q47Rollup _,
    "q48_event_gaps" -> q48EventGaps _,
    "q60_cube" -> q60Cube _,
    "q61_quality_deciles" -> q61QualityDeciles _,
    "q62_asof_join" -> q62AsofJoin _,
    "q63_range_join" -> q63RangeJoin _,
    "q64_set_ops" -> q64SetOps _,
    "q66_pivot" -> q66Pivot _,
  )

  val oracles: Map[String, String] = Map(
    "q45_sessionize" -> q45Sql,
    "q46_running" -> q46Sql,
    "q47_rollup" -> q47Sql,
    "q48_event_gaps" -> q48Sql,
    "q60_cube" -> q60Sql,
    "q61_quality_deciles" -> q61Sql,
    "q62_asof_join" -> q62Sql,
    "q63_range_join" -> q63Sql,
    "q64_set_ops" -> q64Sql,
    "q66_pivot" -> q66Sql,
  )
}
