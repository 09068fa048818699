package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bm25 (lexical retrieval) + Sq8 (scalar-quantized ANN) — the round-9
  * retrieval additions (q92/q93). */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ----------------------------------------------------------- BM25

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def terms(ts: String*): DataFrame = ts.toDF("term")

  test("bm25: only documents containing a query term are returned") {
    val d = docs(1L -> "apple banana", 2L -> "cherry date", 3L -> "apple fig")
    val got = Bm25.topK(d, terms("apple"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("bm25: rarer term outranks common term at equal tf and dl") {
    // "rare" df=1, "common" df=3; dl identical -> idf dominates
    val d = docs(1L -> "rare pad", 2L -> "common pad", 3L -> "common x",
      4L -> "common y")
    val got = Bm25.topK(d, terms("rare", "common"), k = 10)
      .orderBy(col("rank")).select("doc_id").as[Long].collect()
    assert(got.head == 1L, s"doc with the rare term should rank first: ${got.toSeq}")
  }

  test("bm25: higher tf wins within one term; n_hit counts matched terms") {
    val d = docs(1L -> "t t t a", 2L -> "t b c d", 3L -> "x y z w")
    val top = Bm25.topK(d, terms("t", "a"), k = 10)
      .orderBy(col("rank"))
      .select("doc_id", "n_hit").as[(Long, Long)].collect()
    assert(top.map(_._1).toSeq == Seq(1L, 2L))
    assert(top.toMap == Map(1L -> 2L, 2L -> 1L)) // doc 1 matched t AND a
  }

  test("bm25: score matches the hand-replayed Okapi formula") {
    // one term, two docs, different tf and dl -> replay the exact
    // arithmetic the operator and the q92 oracle share
    val d = docs(1L -> "t t u", 2L -> "t v w x")
    val got = Bm25.topK(d, terms("t"), k = 10)
      .select("doc_id", "score_q").as[(Long, Long)].collect().toMap
    val n = 2.0; val df = 2.0; val avgdl = (3.0 + 4.0) / 2.0
    def sc(tf: Double, dl: Double): Long = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      math.floor(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        * 1e6).toLong
    }
    assert(got == Map(1L -> sc(2.0, 3.0), 2L -> sc(1.0, 4.0)))
  }

  test("bm25 plan: distributed TakeOrdered for top-k, broadcast term probe") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = d.filter(col("doc_id") === 1)
      .select(explode(split(col("text"), " ")).as("term")).distinct()
      .orderBy(col("term")).limit(8)
    val plan = Bm25.topK(d, q, k = 15).queryExecution.executedPlan.toString
    // top-k must be per-partition heaps + driver merge, not a global sort
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    // the postings probe must broadcast the tiny query-term side
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"expected broadcast probe in:\n$plan")
  }

  // ------------------------------------------------------------ SQ8

  test("sq8: codes span [0,255], corpus min codes 0 and max codes 255") {
    val vecs = Seq(
      (1L, Array(0.0f, -5.0f)), (2L, Array(1.0f, 5.0f)),
      (3L, Array(0.5f, 0.0f))).toDF("vec_id", "embedding")
    val codes = Sq8.encode(vecs, Sq8.dimStats(vecs))
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes(1L) == Seq(0, 0))       // per-dim minima
    assert(codes(2L) == Seq(255, 255))   // per-dim maxima
    assert(codes(3L) == Seq(128, 128))   // midpoints round up
  }

  test("sq8: a degenerate (constant) dimension codes to 0 everywhere") {
    val vecs = Seq((1L, Array(7.0f, 1.0f)), (2L, Array(7.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val codes = Sq8.encode(vecs, Sq8.dimStats(vecs))
      .select("codes").as[Seq[Int]].collect()
    assert(codes.forall(_.head == 0))
  }

  test("sq8: reconstruction error is within half a quantization step") {
    // |x − decode(encode(x))| ≤ (hi−lo)/255/2 per dimension — the
    // round-to-nearest bound ADC recall rests on
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val stats = Sq8.dimStats(emb)
    val worst = Sq8.encode(emb, stats).join(emb, "vec_id")
      .crossJoin(broadcast(stats))
      .select(aggregate(
        zip_with(col("embedding"),
          Sq8.decode(col("codes"), col("los"), col("his")),
          (x, d) => abs(x.cast("double") - d)),
        lit(0.0), (acc, e) => greatest(acc, e)).as("err"),
        aggregate(zip_with(col("los"), col("his"),
          (lo, hi) => (hi - lo) / lit(255.0) / lit(2.0)),
          lit(0.0), (acc, s) => greatest(acc, s)).as("half_step"))
      .agg(max(col("err")).as("err"), max(col("half_step")).as("hs"))
      .as[(Double, Double)].head()
    assert(worst._1 <= worst._2 * (1 + 1e-9),
      s"reconstruction error ${worst._1} exceeds half-step ${worst._2}")
  }

  test("sq8: recall@5 vs float brute force is near-exact on the corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val sq = Sq8.topK(q, emb, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & sq).size.toDouble / brute.size
    // ADC keeps per-dimension resolution: unlike PQ (0.34 pinned) or
    // IVF@3 probes (0.67 pinned), 8-bit scalar codes recover nearly all
    // true neighbors. Band tolerates testdata regeneration, not a
    // shape change.
    assert(recall >= 0.90,
      s"SQ8 recall@5 $recall fell below the pinned band")
  }

  test("sq8: ADC ranking equals brute-force cosine when codes are exact") {
    // 18 distinct directions whose coords sit ON the code grid (k/255
    // with 0 and 255 both present -> lo=0, hi=1, step 1/255): decode is
    // lossless up to float32 rounding, so ADC must reproduce the float
    // ranking exactly
    val vecs = (0L to 17L).map { i =>
      val k = (i * 15).toInt // 0, 15, ..., 255 -> distinct angles
      (i, Array((k / 255.0).toFloat, ((255 - k) / 255.0).toFloat))
    }.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, k = 5)
      .orderBy(col("rank")).select("vec_id").as[Long].collect().toSeq
    val sq = Sq8.topK(vecs.filter(col("vec_id") === 0), vecs, k = 5)
      .orderBy(col("rank")).select("vec_id").as[Long].collect().toSeq
    assert(sq == brute, s"ADC $sq != brute $brute on a lossless grid")
  }

  // ------------------------------------------------------------ RRF

  test("rrf: both-list candidates sum contributions, order follows the sum") {
    val lex = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val sem = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val got = Hybrid.rrf(Seq(lex, sem))
      .select("id", "rrf").as[(Long, Double)].collect().toMap
    assert(got(10L) == 1.0 / 61)
    assert(got(20L) == 1.0 / 62 + 1.0 / 61) // fixed fold order: lex + sem
    assert(got(30L) == 1.0 / 62)
    assert(got.toSeq.sortBy(-_._2).map(_._1) == Seq(20L, 10L, 30L))
  }

  test("rrf: absent ranks are null in the output and contribute zero") {
    val a = Seq((1L, 1)).toDF("id", "rank")
    val b = Seq((2L, 1)).toDF("id", "rank")
    val rows = Hybrid.rrf(Seq(a, b))
      .select("id", "rank_0", "rank_1")
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2))).toSet
    assert(rows == Set((1L, false, true), (2L, true, false)))
  }

  test("rrf: multi-query fusion keys on (query_id, id)") {
    val lex = Seq((1L, 10L, 1), (2L, 10L, 1)).toDF("query_id", "id", "rank")
    val sem = Seq((1L, 10L, 2)).toDF("query_id", "id", "rank")
    val got = Hybrid.rrf(Seq(lex, sem), keys = Seq("query_id", "id"))
      .select("query_id", "id", "rrf").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 10L)) == 1.0 / 61 + 1.0 / 62) // fused within query 1
    assert(got((2L, 10L)) == 1.0 / 61)            // query 2 has no sem hit
  }

  test("sq8 plan: one-row stats broadcast; queries broadcast against corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Sq8.topK(emb.filter(col("vec_id") < 10), emb, k = 5)
      .queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastExchange".r.findAllIn(plan).size
    assert(nBroadcast >= 2, s"expected stats + query broadcasts in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle join should appear in the SQ8 serving plan:\n$plan")
  }

  test("cascade rerank: results contained in the recall set, semantically reordered, no shuffle join") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val lex100 = Bm25.topK(docs,
        graft.operators.ScaleCatalogue.doc1TermsFor(spark, d), k = 100)
      .select(col("doc_id")).as[Long].collect().toSet
    val rr = graft.operators.ScaleCatalogue.q155CascadeRerank(spark, d)
    val got = rr.as[(Int, Long, Int, Long)].collect()
    assert(got.length == 10)
    // containment: the expensive stage only ever sees recalled docs
    assert(got.forall(r => lex100.contains(r._2)),
      "rerank emitted a doc outside the recall set")
    // the rerank genuinely reorders: semantic top-10 is not the
    // lexical top-10 in the same order (else the stage is vacuous)
    assert(got.map(_._3).toSeq != (1 to 10).toSeq,
      "rerank order equals lexical order — vacuous fixture")
    // the costly scorer runs over the broadcast candidate set: no
    // shuffle join anywhere in the cascade plan
    val plan = rr.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"cascade must broadcast candidates, not shuffle:\n$plan")
  }
}
