package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.SparkTestSession

/** Plan-shape assertions: the 100 TB promises (“this join broadcasts”,
  * “bucketing kills the shuffle”, “this filter reaches the scan”) tested
  * against the actual physical plans, not just claimed in docs. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def executedPlanString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("bucketed co-located join runs with zero shuffle exchanges") {
    // warehouse.dir is static per-JVM; use EXTERNAL bucketed tables in a
    // temp path instead
    val wh = Files.createTempDirectory("graft-wh")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val d = "/root/testdata/sf0.001"
    graft.Tables.orders(spark, d)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", wh.resolve("b_orders").toString)
      .mode("overwrite").saveAsTable("b_orders")
    graft.Tables.lineitem(spark, d)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", wh.resolve("b_lineitem").toString)
      .mode("overwrite").saveAsTable("b_lineitem")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = executedPlanString(joined)
      // the join itself must not shuffle: both sides pre-bucketed on the key
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"lineitem side shuffled:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"orders side shuffled:\n$plan")
      assert(joined.agg(sum("n")).as[Long].collect()(0) ==
        graft.Tables.lineitem(spark, d).count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("dimension joins produce BroadcastHashJoin and pushed filters") {
    val d = "/root/testdata/sf0.001"
    val df = Catalogue.q03LookupJoin(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join:\n$plan")
    val scans = df.queryExecution.executedPlan.toString
    assert(scans.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)")
      || scans.contains("EqualTo(o_orderstatus,F)"),
      s"status filter not pushed to parquet:\n$scans")
  }

  test("partitioned layout prunes partitions at the scan") {
    val d = "/root/testdata/sf0.001"
    val part = Files.createTempDirectory("graft-part").resolve("docs").toString
    graft.Tables.documents(spark, d)
      .write.partitionBy("lang").mode("overwrite").parquet(part)
    val q = spark.read.parquet(part).filter(col("lang") === "en")
      .agg(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("isnotnull(lang") || plan.contains("lang#"),
      s"no partition filter in scan:\n$plan")
    // the scan must read ONLY the en partition
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("lang=de"), "non-en partition files in scan")
    q.collect()
  }

  test("events ts reads natively as TimestampType and ts filters push down") {
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d)
    // native TimestampType straight off the scan — no session-timezone-
    // dependent NTZ cast wrapping the column (ADVICE r10)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val f = ev.filter(col("ts") >= lit("2020-01-01 00:00:00").cast("timestamp"))
      .select("event_id", "ts")
    val leaves = f.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    // a cast-wrapped ts would leave PushedFilters empty for this predicate
    assert(leaves.contains("GreaterThanOrEqual(ts,"),
      s"ts filter did not reach the parquet scan:\n$leaves")
  }

  test("range join plans as equi-join, never a nested-loop product") {
    val d = "/root/testdata/sf0.001"
    val plan = executedPlanString(WindowCatalogue.q63RangeJoin(spark, d))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a product:\n$plan")
  }

  test("per-row text analysis prunes the scan to the referenced columns") {
    val d = "/root/testdata/sf0.001"
    val df = ScaleCatalogue.q38Tokens(spark, d)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    // only doc_id + text may be read; lang/source/n_chars must be pruned
    assert(leaves.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan not pruned to (doc_id, text):\n$leaves")
  }

  test("embedding near-dup top-k uses WindowGroupLimit pushdown") {
    val d = "/root/testdata/sf0.001"
    val plan = executedPlanString(ScaleCatalogue.q52EmbedNearDup(spark, d))
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k not pushed below the window sort:\n$plan")
  }

  test("benched q65 is sketch-only: no exact distinct in the plan") {
    val d = "/root/testdata/sf0.001"
    // the oracle-compared q65 deliberately carries the exact distinct as
    // verification apparatus; the PRODUCTION (benched) twin must never
    // pay that full-vocabulary shuffle
    // assert on what Bench actually times — the registered entry
    val plan = executedPlanString(
      graft.SparkEntry.benchQueries("q65_approx_profile")(spark, d))
    assert(!plan.toLowerCase.contains("count(distinct") &&
      !plan.contains("Expand"),
      s"production q65 must not compute an exact distinct:\n$plan")
    assert(plan.contains("approx_count_distinct"),
      s"production q65 must keep the HLL++ sketch:\n$plan")
  }

  test("portable sketch queries never plan a cartesian product") {
    val d = "/root/testdata/sf0.001"
    for (q <- Seq(ScaleCatalogue.q71MinhashPortable _,
        ScaleCatalogue.q72SimhashPortable _,
        ScaleCatalogue.q74BigramLmScore _,
        ScaleCatalogue.q75BpePairs _,
        ScaleCatalogue.q79BudgetMix _,
        ScaleCatalogue.q80DupProfile _,
        ScaleCatalogue.q81SpanExcision _)) {
      val plan = executedPlanString(q(spark, d))
      assert(!plan.contains("CartesianProduct"),
        s"candidate generation degraded to a cartesian product:\n$plan")
    }
  }

  test("PQ ANN broadcasts codebooks and LUT; corpus side never shuffles vectors") {
    val d = "/root/testdata/sf0.001"
    val df = ScaleCatalogue.q83AnnPq(spark, d)
    val plan = executedPlanString(df)
    assert(plan.contains("BroadcastExchange"), s"expected broadcasts:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected product:\n$plan")
  }

  test("q88 classifier scoring is a zero-shuffle per-row pass") {
    val d = "/root/testdata/sf0.001"
    // assert on the SHIPPED catalogue query, not a reconstruction: the
    // scoring pass must add no hash exchange — the only shuffle in the
    // whole plan is the trailing presentation orderBy's range exchange
    val df = ScaleCatalogue.q88QualityClassifier(spark, d)
    // non-empty first: an empty relation would make the shuffle
    // assertions below pass vacuously
    assert(df.collect().nonEmpty, "q88 must score a non-empty corpus")
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange hashpartitioning"),
      s"classifier scoring must not hash-shuffle:\n$plan")
    assert(plan.split("Exchange rangepartitioning").length - 1 <= 1,
      s"only the presentation sort may exchange:\n$plan")
  }

  test("q89 shard export shuffles once, on the shard id") {
    val d = "/root/testdata/sf0.001"
    // the executed-plan string prints the final AND the initial AQE
    // plan — count exchanges in the final section only
    val plan = executedPlanString(ScaleCatalogue.q89ShardExport(spark, d))
      .split("== Initial Plan ==").head
    // one hash exchange for the per-shard window, partitioned on the
    // shard id; the trailing presentation orderBy adds a range
    // exchange — nothing else
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected exactly one hash exchange:\n$plan")
    assert(plan.contains("hashpartitioning(shard"),
      s"the window shuffle must partition by the shard id:\n$plan")
  }

  test("IVF+PQ broadcasts probes and LUT; ADC never sees a cartesian product") {
    val d = "/root/testdata/sf0.001"
    val plan = executedPlanString(ScaleCatalogue.q90AnnIvfPq(spark, d))
    assert(plan.contains("BroadcastExchange"), s"expected broadcasts:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected product:\n$plan")
  }

  test("two-round k-means broadcasts centroids both rounds") {
    val d = "/root/testdata/sf0.001"
    val plan = executedPlanString(ScaleCatalogue.q82KmeansTwoRounds(spark, d))
    assert(plan.split("BroadcastExchange").length >= 3,
      s"expected one broadcast per Lloyd round:\n$plan")
  }

  test("quality deciles never plan a single-partition window") {
    val d = "/root/testdata/sf0.001"
    val df = WindowCatalogue.q61QualityDeciles(spark, d)
    val global = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty,
      s"q61 still contains a global (empty-partitionSpec) window:\n" +
        df.queryExecution.executedPlan)
  }

  test("salted join equals plain join") {
    val d = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle path
    try {
      val fact = graft.Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_linenumber"))
      val dim = graft.Tables.orders(spark, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      val salted = Skew.saltedJoin(fact, dim, "l_orderkey", saltBuckets = 4)
        .select("l_orderkey", "l_linenumber", "o_orderstatus")
        .as[(Long, Int, String)].collect().sorted.toSeq
      val plain = fact.join(dim, Seq("l_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_orderstatus")
        .as[(Long, Int, String)].collect().sorted.toSeq
      assert(salted == plain)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("packStats shuffles once: the shard window partitioning serves the bin rollup") {
    val d = "/root/testdata/sf0.001"
    val df = graft.scale.Packing.packStats(
      graft.Tables.documents(spark, d), col("doc_id") % 8, seqLen = 512L)
    df.collect()
    // AdaptiveSparkPlanExec does not expose its inner plan to collect,
    // so count exchanges in the FINAL plan's rendering (the part before
    // "== Initial Plan ==")
    val planStr = df.queryExecution.executedPlan.toString
    val finalPart = planStr.split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(finalPart).size
    // hash(shard) from the window exchange satisfies the (shard, bin)
    // aggregation's clustering requirement — a second exchange would
    // mean the co-partitioning claim in the scaladoc is wrong
    assert(shuffles == 1,
      s"expected exactly 1 shuffle, got $shuffles:\n$finalPart")
  }

  test("temperature mixing pushes the constant rank bound as WindowGroupLimit") {
    val d = "/root/testdata/sf0.001"
    val plan = executedPlanString(graft.scale.Mixture.sample(
      graft.Tables.documents(spark, d), "source", k = 100L))
    assert(plan.contains("WindowGroupLimit"),
      s"rk<=k not pushed below the window sort:\n$plan")
  }

  test("token-balanced shards never plan a single-partition window") {
    val d = "/root/testdata/sf0.001"
    val plan = executedPlanString(graft.scale.Packing
      .tokenBalancedShards(graft.Tables.documents(spark, d), nShards = 8))
    // the q61 discipline: the cumsum window must partition on the hash
    // bucket — an empty partitionSpec would funnel the corpus through
    // one task at 100 TB
    assert(!plan.contains("windowspecdefinition(h#") &&
      plan.contains("windowspecdefinition(bucket"),
      s"global-sort window found (empty partitionSpec):\n$plan")
  }

  test("salted aggregation equals plain aggregation") {
    val d = "/root/testdata/sf0.001"
    val salted = Skew.saltedCountSum(
        graft.Tables.lineitem(spark, d), col("l_orderkey"),
        floor(col("l_extendedprice") * 100).cast("long"))
      .orderBy(col("k")).as[(Long, Long, Long)].collect().toSeq
    val plain = graft.Tables.lineitem(spark, d)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)), sum(floor(col("l_extendedprice") * 100).cast("long")))
      .orderBy(col("l_orderkey")).as[(Long, Long, Long)].collect().toSeq
    assert(salted == plain)
  }
}
