package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch: the one-sided guarantee corpus-wide, cell-wise
  * mergeability (the property that lets per-shard sketches roll up
  * without re-reading rows), and an independent JVM replay of the
  * hash/bucket chain. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def toks = graft.Tables.documents(spark, d)
    .select(explode(split(col("text"), " ")).as("term"))

  test("est >= true for EVERY term in the corpus, not just heavy hitters") {
    val cms = Sketch.countMin(toks)
    val trueCnt = toks.groupBy("term").agg(count(lit(1)).as("true_cnt"))
    val joined = Sketch.estimate(cms, trueCnt.select("term"))
      .join(trueCnt, "term")
      .select(col("term"), col("true_cnt"), col("est_cnt"))
      .as[(String, Long, Long)].collect()
    assert(joined.nonEmpty)
    val under = joined.filter { case (_, t, e) => e < t }
    assert(under.isEmpty, s"CMS underestimated: ${under.take(3).toSeq}")
  }

  test("sketches merge cell-wise: sketch(A ++ B) == sketch(A) + sketch(B)") {
    val a = toks.limit(500)
    val whole = Sketch.countMin(toks)
      .as[(Long, Long, Long)].collect().toMap2
    val aS = Sketch.countMin(a).as[(Long, Long, Long)].collect().toMap2
    // B = the remainder, derived so A ++ B == toks exactly: count-based
    // split on the collected stream (order-insensitive for a sketch)
    val all = toks.as[String].collect()
    val aList = a.as[String].collect()
    val bList = {
      val take = new scala.collection.mutable.HashMap[String, Int]()
      aList.foreach(t => take(t) = take.getOrElse(t, 0) + 1)
      all.filter { t =>
        val k = take.getOrElse(t, 0)
        if (k > 0) { take(t) = k - 1; false } else true
      }
    }
    val bS = Sketch.countMin(bList.toSeq.toDF("term"))
      .as[(Long, Long, Long)].collect().toMap2
    val merged = (aS.keySet ++ bS.keySet).map { k =>
      k -> (aS.getOrElse(k, 0L) + bS.getOrElse(k, 0L))
    }.toMap
    assert(merged == whole)
  }

  test("bucket chain matches an independent JVM md5 replay") {
    val terms = Seq("alpha", "beta", "gamma", "unseen-term")
    val got = Sketch.estimate(Sketch.countMin(toks), terms.toDF("term"))
      .as[(String, Long)].collect().toMap
    // independent replay: count buckets in plain Scala
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15), 16)
    val stream = toks.as[String].collect()
    val cells = new scala.collection.mutable.HashMap[(Long, Long), Long]()
    for (t <- stream; r <- 0L until 4L) {
      val k = (r, h(s"$r:$t") % 1024L)
      cells(k) = cells.getOrElse(k, 0L) + 1L
    }
    val expect = terms.map { t =>
      t -> (0L until 4L).map(r => cells.getOrElse((r, h(s"$r:$t") % 1024L), 0L)).min
    }.toMap
    assert(got == expect)
    assert(got("unseen-term") >= 0L)
  }

  test("heavyHitters refuses a phi that floors the frequency cut to zero") {
    val tiny = Seq("a", "b", "a").toDF("term")
    val e = intercept[IllegalArgumentException] {
      Sketch.heavyHitters(tiny, phi = 1000L).collect()
    }
    assert(e.getMessage.contains("exceeds total occurrences"))
  }

  test("heavyHitters: complete (every true-heavy term present), est >= true, no probe set") {
    val phi = 1000L
    val exact = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val threshold = n / phi
    val got = Sketch.heavyHitters(toks, phi)
      .as[(String, Long)].collect().toMap
    // one-sided completeness: est >= true, so true-heavy can't be missed
    val trueHeavy = exact.filter(_._2 >= threshold).keySet
    assert(trueHeavy.nonEmpty && threshold > 0, "degenerate fixture")
    assert(trueHeavy.subsetOf(got.keySet),
      s"missed true-heavy terms: ${(trueHeavy -- got.keySet).take(3)}")
    // every emitted estimate dominates its true count and clears the bar
    got.foreach { case (t, e) =>
      assert(e >= exact.getOrElse(t, 0L), s"underestimate for $t")
      assert(e >= threshold)
    }
    // the epsilon-N error bound of the sketch caps false-positive
    // inflation: no estimate exceeds true + 2eN (e = e/w per row; the
    // min over d independent rows is far tighter w.h.p.)
    val slack = 2 * math.E * n.toDouble / 1024.0
    got.foreach { case (t, e) =>
      assert(e <= exact.getOrElse(t, 0L) + slack.toLong + 1,
        s"estimate for $t beyond the eN envelope")
    }
  }

  test("heavyHitters filters inline before the shuffle: no join, no cartesian") {
    val df = graft.operators.ScaleCatalogue.q109HeavyHitters(spark, d)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // pass 2 must not join the cell table — the estimate is an inline
    // array-literal lookup; the only join-free shuffle is the final
    // candidate dedup
    assert(!plan.contains("Join"), s"pass 2 should be join-free:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("estimate joins the cell table broadcast; no cartesian product") {
    val df = graft.operators.ScaleCatalogue.q101CountMin(spark, d)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"cell-table probe should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("streaming sketch: cells after two micro-batches equal the batch sketch") {
    // the reference's event-driven form is streaming-first — the sketch
    // must fold per micro-batch with bounded state (d·w cells), i.e. a
    // plain streaming groupBy over the cell keys in Complete mode
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = toks.as[String].collect()
    val (b1, b2) = stream.splitAt(stream.length / 2)
    val mem = MemoryStream[String]
    val cells = Sketch.countMin(mem.toDF().toDF("term"))
    val q = cells.writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .as[(Long, Long, Long)].collect().toMap2
      val batch = Sketch.countMin(toks).as[(Long, Long, Long)].collect().toMap2
      assert(streamed == batch)
    } finally q.stop()
  }

  test("histQuantiles: one-bin error bound vs exact discrete quantiles") {
    val docs = graft.Tables.documents(spark, d)
    val est = Sketch.histQuantiles(docs, "lang", "n_chars")
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, pq, _, e) => (g, pq) -> e }.toMap
    val ext = docs.agg(min(col("n_chars")), max(col("n_chars")))
      .as[(Long, Long)].collect()(0)
    val width = (ext._2 - ext._1 + 1) / 64 + 1
    // exact discrete quantiles per group, small-data ground truth
    val byLang = docs.select(col("lang"), col("n_chars"))
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    for ((g, vs) <- byLang; pq <- Seq(25L, 50L, 75L, 95L)) {
      // rank = ceil(pq*n/100), 1-based — the sketch's own rank rule
      val exact = vs(((pq * vs.length + 99) / 100).toInt - 1)
      val e = est((g, pq))
      assert(e <= exact && exact <= e + width,
        s"($g, p$pq): est $e not within one bin ($width) of exact $exact")
    }
  }

  test("histQuantiles: bit-identical across partitionings; shard histograms merge") {
    val docs = graft.Tables.documents(spark, d)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketch.histQuantiles(df, "lang", "n_chars")
        .orderBy(col("g"), col("pq"))
        .as[(String, Long, Long, Long)].collect().toSeq
    assert(run(docs.repartition(1)) == run(docs.repartition(32)),
      "estimates depend on partitioning")
    // merging two disjoint shards through the SAME global extent is
    // cell-wise count addition — the union must give the full answer
    val full = run(docs)
    val merged = run(docs.filter(col("doc_id") % 2 === 0)
      .unionByName(docs.filter(col("doc_id") % 2 === 1)))
    assert(merged == full, "shard union diverged from the full corpus")
    // empty input: empty result, never a div-by-zero null row
    assert(run(docs.filter(lit(false))).isEmpty)
  }

  test("KMV theta overlap: exact below saturation, bounded error above, merge property holds") {
    import spark.implicits._
    // SUB-SATURATION: |A ∪ B| < k — the sketch IS the set, everything exact
    val a = (1 to 60).map(i => s"tok$i").toDF("v")
    val b = (41 to 90).map(i => s"tok$i").toDF("v")
    val ska = Sketch.kmvDistinctSketch(a, col("v"), k = 256)
    val skb = Sketch.kmvDistinctSketch(b, col("v"), k = 256)
    val ex = Sketch.kmvOverlapEstimate(ska, skb, k = 256)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(ex._1 == 90L, "union sample must be the exact union size")
    assert(ex._3 == 20L && ex._5 == 20L,
      s"sub-saturation overlap must be exact: $ex")
    assert(ex._4 == 90L)
    // distinct-count estimator also exact below saturation
    val de = Sketch.kmvDistinctEstimate(ska, k = 256)
      .as[(Long, Long, Long)].head()
    assert(de._3 == 60L)

    // SATURATED, real corpus: train/eval 3-gram sets (the q154 shape)
    val tok = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
    def grams(pred: org.apache.spark.sql.Column) = tok.filter(pred)
      .select(explode(array_distinct(transform(
        sequence(lit(0), size(col("w")) - 3),
        i => concat_ws(" ", element_at(col("w"), i + 1),
          element_at(col("w"), i + 2), element_at(col("w"), i + 3)))))
        .as("sh"))
    val train = grams(col("doc_id") % 50 =!= 0)
    val eval = grams(col("doc_id") % 50 === 0)
    val k = 512
    val skt = Sketch.kmvDistinctSketch(train, col("sh"), k).localCheckpoint()
    val ske = Sketch.kmvDistinctSketch(eval, col("sh"), k).localCheckpoint()
    val est = Sketch.kmvOverlapEstimate(skt, ske, k)
      .as[(Long, Long, Long, Long, Long)].head()
    val exactUnion = train.unionByName(eval).distinct().count()
    val exactCommon = train.distinct()
      .join(eval.distinct(), Seq("sh"), "left_semi").count()
    assert(est._1 == k.toLong, "saturated union sample must hold k rows")
    // union estimate: (k-1)/h_k concentrates tightly (rel err ~ 1/sqrt(k))
    assert(math.abs(est._4 - exactUnion).toDouble / exactUnion < 0.15,
      s"union estimate ${est._4} vs exact $exactUnion drifted > 15%")
    // intersection: variance is 1/sqrt(n_both) — pin a factor-2.5 band
    // plus the must-detect property (real overlap => nonzero estimate)
    assert(exactCommon > 0 && est._3 > 0,
      "planted contamination must surface in the sample")
    assert(est._5 > exactCommon / 3 && est._5 < exactCommon * 3,
      s"overlap estimate ${est._5} vs exact $exactCommon out of band")

    // MERGE PROPERTY: the union sketch's theta never exceeds either
    // input's — the invariant that makes the membership counts exact
    // within the sample
    val thetaA = skt.agg(max(col("h"))).as[Long].head()
    val thetaB = ske.agg(max(col("h"))).as[Long].head()
    assert(est._2 <= math.min(thetaA, thetaB),
      "union theta must be <= both input thetas")
  }

  private implicit class ToMap2(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      rows.map { case (r, b, c) => (r, b) -> c }.toMap
  }
}
