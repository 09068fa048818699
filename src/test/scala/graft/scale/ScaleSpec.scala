package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("exactGroups keeps min id per text") {
    val d = docs(1L -> "a b c", 5L -> "a b c", 3L -> "x y z")
    val got = Dedup.exactGroups(d).orderBy("keep_id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (3L, 1L)))
  }

  test("exactByHash agrees with exactGroups on counts") {
    val d = docs(1L -> "a b c", 5L -> "a b c", 3L -> "x y z", 9L -> "x y z")
    val byHash = Dedup.exactByHash(d).orderBy("keep_id")
      .select("keep_id", "dup_count").as[(Long, Long)].collect().toSeq
    assert(byHash == Seq((1L, 2L), (3L, 2L)))
  }

  test("connectedComponents labels chains and separate pairs correctly") {
    // chain 1-2-3-4 (diameter 3) + isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("d1", "d2")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L)
    // both the driver union-find path (default) and the distributed one
    assert(Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap == expect)
    assert(Dedup.connectedComponents(pairs, driverMaxEdges = 0)
      .as[(Long, Long)].collect().toMap == expect)
    // int-typed pair columns normalize to long instead of crashing the
    // driver union-find path
    val intPairs = Seq((1, 2), (2, 3), (3, 4), (10, 11)).toDF("d1", "d2")
    assert(Dedup.connectedComponents(intPairs)
      .as[(Long, Long)].collect().toMap == expect)
  }

  test("connectedComponents converges on a long chain and guards maxIter") {
    // a 40-link chain needs ~6 pointer-jumping rounds, far under O(n);
    // driverMaxEdges = 0 forces the distributed path
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Dedup.connectedComponents(chain, driverMaxEdges = 0)
      .as[(Long, Long)].collect()
    assert(got.forall(_._2 == 1L) && got.length == 40)
    // starved iteration budget must throw, never return partial labels
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 1, driverMaxEdges = 0)
        .collect()
    }
  }

  test("ngramJaccardPairs finds planted near-duplicate") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 30).map(i => if (i == 15) "CHANGED" else s"w$i").mkString(" ")
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Dedup.ngramJaccardPairs(d, n = 5, threshold = 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("identical docs have identical minhash signatures and full LSH match") {
    val t = (1 to 40).map(i => s"tok$i").mkString(" ")
    val d = docs(1L -> t, 2L -> t)
    val pairs = Dedup.minhashLshPairs(d, n = 5, numHashes = 32, bands = 8,
        threshold = 0.99)
      .select("d1", "d2", "matches").as[(Long, Long, Int)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 32)))
  }

  test("minhash LSH recall vs jaccard ground truth on real corpus") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val gt = Dedup.ngramJaccardPairs(d, n = 5, threshold = 0.8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(d, n = 5, numHashes = 32, bands = 8,
        threshold = 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(gt.nonEmpty, "corpus should contain planted near-dups")
    val recall = (gt & lsh).size.toDouble / gt.size
    assert(recall >= 0.9, s"LSH recall $recall too low (found ${lsh.size})")
  }

  test("native md5_64 equals the composable conv(substring(md5)) form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = docs.select(explode(split(col("text"), " ")).as("t"))
      .union(Seq("", "é", "ünïcode ☃", "a b  c").toDF("t"))
    val diff = terms.select(
        graft.functions.Md5_64.md5_64(col("t")).as("nat"),
        conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("sql"))
      .filter(col("nat") =!= col("sql"))
    assert(diff.count() == 0)
  }

  test("native simhash_bits agg equals the exploded bit-sum form") {
    val rnd = new scala.util.Random(42)
    val rows = for (d <- 0L until 20L; _ <- 0 until 30)
      yield (d, rnd.nextLong(), 1L + rnd.nextInt(5))
    val df = rows.toDF("doc_id", "h", "cnt")
    val native = df.groupBy($"doc_id")
      .agg(graft.functions.SimHashAgg.simhash_bits($"h", $"cnt").as("fp"))
      .as[(Long, Long)].collect().toMap
    val exploded = df
      .select($"doc_id", $"h", $"cnt", explode(sequence(lit(0), lit(59))).as("i"))
      .groupBy($"doc_id", $"i")
      .agg(sum(when(expr("(h >> i) & 1") === 1L, $"cnt")
        .otherwise(-$"cnt")).as("s"))
      .groupBy($"doc_id")
      .agg(sum(when($"s" > 0, expr("CAST(1 AS BIGINT) << i")).otherwise(0L))
        .as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(native == exploded)
  }

  test("spanExcision removes shared passages from all docs, merges overlaps") {
    // docs 1 and 2 share a 10-token passage (three overlapping 8-gram
    // windows -> one merged 10-token span in each); doc 3 is untouched.
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    val d = docs(
      1L -> s"alpha beta $passage gamma delta",
      2L -> s"one two three $passage four",
      3L -> "unique text with no shared passage at all here now")
    val got = Dedup.spanExcision(d, n = 8).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got(0) == ((1L, 14L, 10L, "alpha beta gamma delta")))
    assert(got(1) == ((2L, 14L, 10L, "one two three four")))
    assert(got(2)._3 == 0L)
    assert(got(2)._4 == "unique text with no shared passage at all here now")
  }

  test("spanExcision excises a fully duplicated doc to empty text") {
    val t = (1 to 8).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> t, 2L -> t)
    val got = Dedup.spanExcision(d, n = 8).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.map(_._3) == Seq(8L, 8L))
    assert(got.map(_._4) == Seq("", ""))
  }

  test("spanExcision leaves within-doc-only repetition alone (df is cross-doc)") {
    val rep = (1 to 8).map(i => s"r$i").mkString(" ")
    val d = docs(1L -> s"$rep $rep", 2L -> "totally different words here man okay fine yes")
    val got = Dedup.spanExcision(d, n = 8).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got(0)._3 == 0L)
  }

  test("keep-first excision leaves one copy of each passage corpus-wide") {
    val passage = (1 to 8).map(i => s"p$i").mkString(" ")
    val d = docs(
      1L -> s"alpha beta $passage",
      2L -> s"one two $passage three")
    val got = Dedup.spanExcision(d, n = 8, keepFirst = true).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1 holds the first occurrence -> untouched; doc 2 loses it
    assert(got(0) == ((1L, 10L, 0L, s"alpha beta $passage")))
    assert(got(1) == ((2L, 11L, 8L, "one two three")))
  }

  test("keep-first excision also dedups within-document repeats") {
    val rep = (1 to 8).map(i => s"r$i").mkString(" ")
    val d = docs(
      1L -> s"$rep $rep",
      2L -> "totally different words here man okay fine yes")
    val got = Dedup.spanExcision(d, n = 8, keepFirst = true).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // q81's df rule leaves within-doc repeats; keep-first excises the
    // second copy (and the straddling windows it participates in)
    assert(got(0)._3 > 0L)
    assert(got(0)._4.startsWith(rep))
    assert(got(0)._4.length < s"$rep $rep".length)
  }

  test("simhash of identical docs is identical; hamming 0 pair found") {
    val t = (1 to 40).map(i => s"tok$i").mkString(" ")
    val d = docs(7L -> t, 9L -> t)
    val fps = Dedup.simhash(d).as[(Long, Long)].collect().toMap
    assert(fps(7L) == fps(9L))
    val pairs = Dedup.simhashPairs(d, maxHamming = 3)
      .select("d1", "d2", "hamming").as[(Long, Long, Int)].collect().toSeq
    assert(pairs == Seq((7L, 9L, 0)))
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine") {
    val q = vecs(0L -> Seq(1f, 0f, 0f))
    val c = vecs(
      1L -> Seq(1f, 0.01f, 0f),   // nearly parallel
      2L -> Seq(0.5f, 0.5f, 0f),  // 45 degrees
      3L -> Seq(0f, 1f, 0f))      // orthogonal
    val got = Similarity.bruteForceTopK(q, c, k = 2)
      .select("rank", "vec_id").as[(Int, Long)].collect().toSeq.sorted
    assert(got == Seq((1, 1L), (2, 2L)))
  }

  test("IVF with full probing matches brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    // probe ALL clusters -> identical to brute force
    val nCent = emb.filter(col("vec_id") % 97 === 0).count().toInt
    val ivfAll = Similarity.ivfTopK(q, emb, k = 5, stride = 97, nProbe = nCent)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(ivfAll == brute)
  }

  test("IVF recall@10 with 3 probes is pinned vs brute-force ground truth") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(q, emb, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, emb, k = 10, stride = 97, nProbe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // deterministic on this corpus: measures 0.67 at sf0.001 and 0.68
    // at sf0.01 (cross-checked against a DuckDB replay of the same IVF
    // definition, 2026-08) — the scale-vs-recall tradeoff the nProbe=3
    // default buys, documented next to the default in Similarity.ivfTopK.
    // The band below tolerates testdata regeneration, not a shape change.
    assert(recall >= 0.60 && recall <= 0.80,
      s"IVF recall@10 $recall drifted from the pinned 0.67±band")
  }

  test("PQ ADC top-k recalls exact-L2 neighbors far above chance") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val d2 = aggregate(
      zip_with(col("q.embedding"), col("c.embedding"),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d2").asc, col("vec_id").asc)
    val exact = q.as("q").crossJoin(emb.as("c"))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("vec_id"),
        d2.as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(q, emb, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    // chance overlap is 10/499 ≈ 2%; untrained init-only codebooks on
    // this corpus measure 0.31 — pin well above chance, below measured
    assert(recall >= 0.25, s"PQ recall@10 $recall unexpectedly low")
  }

  test("trained PQ codebooks keep kc size and the 1-round recall gain") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val cb = Similarity.pqTrainCodebooks(emb, rounds = 1)
    // empty-cluster retention keeps every (cid, s) cell populated
    assert(cb.count() == 16L * 8L)
    assert(cb.filter(size(col("cv")) =!= 8).count() == 0)
    val d2 = aggregate(
      zip_with(col("q.embedding"), col("c.embedding"),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d2").asc, col("vec_id").asc)
    val exact = q.as("q").crossJoin(emb.as("c"))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("vec_id"),
        d2.as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val trained = Similarity.pqTopK(q, emb, k = 10, codebooks = Some(cb))
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & trained).size.toDouble / exact.size
    // deterministic: measures 0.34 (vs 0.31 init-only); see
    // pqTrainCodebooks scaladoc for the non-monotonicity past 1 round
    assert(recall >= 0.3, s"trained PQ recall@10 $recall unexpectedly low")
  }

  test("near-dup pairs finds identical vectors") {
    val v = Seq.tabulate(64)(i => (i % 7).toFloat - 3f)
    val d = vecs(1L -> v, 2L -> v, 3L -> v.map(x => -x))
    val pairs = Similarity.cosineNearDupPairs(d, planes = 12,
        threshold = 0.99)
      .select("v1", "v2").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }
}

class IvfPqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("IVF+PQ with full probing equals the pure PQ ADC scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val cents = Similarity.strideCentroids(emb, 97)
    val nCent = cents.count().toInt
    // probing every cluster makes the candidate set the whole corpus, so
    // the composition must reproduce pqTopK exactly (same ADC, same ties)
    val full = Similarity.ivfPqTopK(q, emb, cents, k = 10, nProbe = nCent)
      .select("query_id", "rank", "vec_id", "adc_d2")
      .as[(Long, Int, Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(q, emb, k = 10)
      .select("query_id", "rank", "vec_id", "adc_d2")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(full == pq && full.nonEmpty)
  }

  test("IVF+PQ recall@10 vs exact L2 is far above chance") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val d2 = aggregate(
      zip_with(col("q.embedding"), col("c.embedding"),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d2").asc, col("vec_id").asc)
    val exact = q.as("q").crossJoin(emb.as("c"))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("vec_id"),
        d2.as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val got = Similarity.ivfPqTopK(q, emb,
        Similarity.strideCentroids(emb, 97), k = 10, nProbe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    // the two prunings compound: IVF@3 probes alone measures 0.67, PQ
    // alone 0.31 — the composition can't beat either half. Chance is
    // 10/499 ≈ 2%; pin well above chance, below the PQ ceiling.
    assert(recall >= 0.10 && recall <= 0.31,
      s"IVF+PQ recall@10 $recall outside the expected composed band")
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import Multimodal._

  private def media(): DataFrame = {
    val rows = Seq(
      (1L, "image", MediaCodec.encode("image", 640, 480, 0L, Array.fill[Byte](200)(7))),
      (2L, "video", MediaCodec.encode("video", 1920, 1080, 60000L, Array.fill[Byte](512)(9))),
      (3L, "audio", Array[Byte](1, 2, 3)),  // malformed
      (4L, "audio", null))                  // null bytes
    rows.toDF("media_id", "kind", "bytes")
  }

  test("decode extracts header meta; malformed/null rows flagged not thrown") {
    val got = Multimodal.decode(media(), batchSize = 2)
      .orderBy("media_id")
      .select("media_id", "width", "height", "format", "duration_ms", "decode_ok")
      .collect()
    assert(got(0).getInt(1) == 640 && got(0).getString(3) == "image" &&
      got(0).getBoolean(5))
    assert(got(1).getInt(2) == 1080 && got(1).getLong(4) == 60000L)
    assert(!got(2).getBoolean(5) && got(2).isNullAt(1))
    assert(!got(3).getBoolean(5))
  }

  test("sampleFrames slices payload with stride and contiguous indices") {
    val got = Multimodal.sampleFrames(media(), frameSize = 64, stride = 2)
      .filter(col("media_id") === 2L)
      .select("frame_index").as[Int].collect().toSeq.sorted
    // payload 512 bytes -> 8 frames of 64 -> stride 2 keeps 0,2,4,6
    assert(got == Seq(0, 2, 4, 6))
  }

  test("resize rewrites header dims, bounds payload, flags malformed") {
    val got = Multimodal.resize(media(), targetW = 8, targetH = 4, batchSize = 2)
      .orderBy("media_id").collect()
    // well-formed rows: header re-encoded with target dims, decodable
    for (i <- 0 to 1) {
      assert(got(i).getBoolean(5))
      assert(got(i).getInt(3) == 8 && got(i).getInt(4) == 4)
      val meta = MediaCodec.decodeMeta(got(i).getAs[Array[Byte]](2))
      assert(meta.exists { case (w, h, _, _) => w == 8 && h == 4 })
      // payload bounded by the target pixel budget
      assert(got(i).getAs[Array[Byte]](2).length - 21 <= 8 * 4)
    }
    // malformed + null bytes pass through flagged, not thrown
    assert(!got(2).getBoolean(5) && got(2).isNullAt(3))
    assert(!got(3).getBoolean(5) && got(3).isNullAt(2))
  }

  test("featureVector is deterministic and fixed-width") {
    val f1 = Multimodal.featureVector(media(), dim = 8)
      .orderBy("media_id").as[(Long, Seq[Float])].collect().toSeq
    val f2 = Multimodal.featureVector(media(), dim = 8)
      .orderBy("media_id").as[(Long, Seq[Float])].collect().toSeq
    assert(f1 == f2)
    assert(f1.forall(_._2.size == 8))
  }

  test("averageHash matches a hand replay; malformed/short media yield no row") {
    // payload: bytes 0..62 ascending → mean = 31, bits 32..62 set
    val payload = Array.tabulate[Byte](63)(_.toByte)
    val m = Seq(
      (1L, "image", MediaCodec.encode("image", 8, 8, 0L, payload)),
      (2L, "image", MediaCodec.encode("image", 8, 8, 0L, Array.fill[Byte](10)(1))), // short
      (3L, "image", Array[Byte](9, 9, 9))) // malformed
      .toDF("media_id", "kind", "bytes")
    val got = Multimodal.averageHash(m).as[(Long, Long)].collect().toMap
    val expect = (32 to 62).map(1L << _).sum
    assert(got == Map(1L -> expect))
  }

  test("phashNearDupPairs: pigeonhole recall to hamming 3, verify rejects beyond") {
    // base hash vs 2-bit-flip (found) vs 4-bit-flip (candidate via a
    // shared chunk but rejected by the verify)
    val base = 0x0123456789ABCDL
    val h2 = base ^ (1L << 5) ^ (1L << 40)
    val h4 = base ^ (1L << 1) ^ (1L << 2) ^ (1L << 3) ^ (1L << 4)
    val hashes = Seq((1L, base), (2L, h2), (3L, h4)).toDF("media_id", "ahash")
    val got = Multimodal.phashNearDupPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 2L)), s"hamming-2 pair missed: $got")
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L),
      "hamming-4 pair must fail the verify")
  }

  test("q130 corpus run: within-group pairs follow the noise model, verify bounds hamming") {
    val d = "/root/testdata/sf0.001"
    val pairs = graft.operators.ScaleCatalogue
      .q130MediaPhashDedup(spark, d)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._3 <= 3L), "verify let a hamming > 3 pair through")
    // members of one leader group share the payload exactly, so their
    // distance is the two noise bits: 0 or 2. Cross-group pairs are
    // legitimate too — the corpus plants exact-duplicate TEXTS across
    // groups (the q30 dedup fixture), which are genuine near-dup images.
    val sameGroup = pairs.filter(p => p._1 / 30 == p._2 / 30)
    assert(sameGroup.nonEmpty, "no within-group near-dup found")
    assert(sameGroup.forall(p => p._3 == 0L || p._3 == 2L),
      "within-group hamming must be exactly the noise bits")
  }

  test("real codec: PNG round-trip recovers exact pixels and the rule-predicted hash") {
    // 8×8 gray PNG: decode + pool is the identity — exact pixel recovery
    val px8 = Array.tabulate(64)(i => (i * 31 + 7) % 256)
    val png8 = Multimodal.encodePngGray(8, 8, px8)
    assert(Multimodal.decodeGray8x8(png8).get.toSeq == px8.toSeq,
      "8x8 PNG round-trip must be the identity")

    // 16×16 with constant 2×2 blocks: integer pool recovers the block
    // values exactly (the q136 fixture rule)
    def blockPx(id: Long): Array[Int] = Array.tabulate(256) { p =>
      val i = ((p / 16) / 2) * 8 + ((p % 16) / 2)
      ((id * 131L + i * 17L) % 256L).toInt
    }
    def ruleHash(id: Long): Long = {
      val px = Array.tabulate(63)(i => ((id * 131L + i * 17L) % 256L).toInt)
      val mean = px.sum / 63
      px.indices.filter(i => px(i) > mean).map(1L << _).sum
    }
    val imgs = Seq(5L, 6L, 7L)
      .map(id => (id, Multimodal.encodePngGray(16, 16, blockPx(id))))
      .toDF("media_id", "bytes")
    val got = Multimodal.imageAverageHash(imgs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> ruleHash(5L), 6L -> ruleHash(6L),
      7L -> ruleHash(7L)), "real-codec hash diverged from the rule")

    // codec-vs-synthetic-twin: the REAL path over a PNG equals the
    // synthetic path over a fake-header payload carrying the same
    // pooled pixels — the two tiers share one hash algebra
    val pooled = Multimodal.decodeGray8x8(
      Multimodal.encodePngGray(16, 16, blockPx(5L))).get
    val syn = Seq((5L, "image", Multimodal.MediaCodec.encode("image", 8, 8,
        0L, pooled.map(_.toByte))))
      .toDF("media_id", "kind", "bytes")
    assert(Multimodal.averageHash(syn).as[(Long, Long)].collect().toMap
      == Map(5L -> got(5L)), "synthetic and real tiers computed different hashes")
  }

  test("real codec: RGB PNGs take the integer luma path; garbage bytes yield no row") {
    // 8×8 RGB image, one constant color → every pooled pixel is the
    // same luma, mean == value, no bit set (strict > rule)
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x336699)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val luma = (0x33 * 299 + 0x66 * 587 + 0x99 * 114) / 1000
    assert(Multimodal.decodeGray8x8(out.toByteArray).get.toSeq ==
      Seq.fill(64)(luma), "RGB decode must follow the Rec.601 integer luma")

    val mixed = Seq(
      (1L, out.toByteArray),
      (2L, Array[Byte](1, 2, 3)),            // not an image
      (3L, null.asInstanceOf[Array[Byte]]))  // null bytes
      .toDF("media_id", "bytes")
    val got = Multimodal.imageAverageHash(mixed)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L),
      s"undecodable media must yield no row, got $got")
  }

  test("real codec: JPEG decodes through the same path, aHash within a pinned Hamming budget of the PNG truth") {
    // JPEG is the dominant crawl format and is LOSSY — it can never be
    // oracle-predicted (the q136 discipline pins the ORACLE path to
    // PNG), but the perceptual contract is exactly that lossy
    // re-encoding of the same pixels lands NEAR the truth hash. A
    // 64×64 smooth gradient pools to 8×8 with JPEG block noise
    // averaged out, so the pinned budget is tight.
    def gradientPx(w: Int, h: Int): Array[Int] =
      Array.tabulate(w * h)(p => ((p % w) * 2 + (p / w) * 2) % 256)
    val px = gradientPx(64, 64)
    val png = Multimodal.encodePngGray(64, 64, px)
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    px.indices.foreach(p => img.getRaster.setSample(p % 64, p / 64, 0, px(p)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out),
      "JDK must carry a JPEG writer")
    val jpg = out.toByteArray

    val both = Seq((1L, png), (2L, jpg)).toDF("media_id", "bytes")
    val hashes = Multimodal.imageAverageHash(both)
      .as[(Long, Long)].collect().toMap
    assert(hashes.keySet == Set(1L, 2L), "JPEG bytes failed to decode")
    val hamming = java.lang.Long.bitCount(hashes(1L) ^ hashes(2L))
    assert(hamming <= 8,
      s"JPEG aHash drifted $hamming bits from the PNG truth (budget 8)")
  }

  test("real codec: truncated/corrupted byte fuzz never throws; undecodable rows route to no-row") {
    // crawl reality: prefixes of valid files, bit flips mid-stream,
    // headers glued to garbage. Contract: the task NEVER dies — every
    // input either decodes to a 63-bit hash or yields no row.
    val px = Array.tabulate(64 * 64)(p => (p * 7) % 256)
    val png = Multimodal.encodePngGray(64, 64, px)
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    px.indices.foreach(p => img.getRaster.setSample(p % 64, p / 64, 0, px(p)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val jpg = out.toByteArray

    def corrupt(b: Array[Byte], at: Int): Array[Byte] = {
      val c = b.clone(); c(at) = (c(at) ^ 0x5A).toByte; c
    }
    val fuzz: Seq[(Long, Array[Byte])] =
      Seq(png, jpg).zipWithIndex.flatMap { case (b, k) =>
        Seq(1, b.length / 4, b.length / 2, 3 * b.length / 4)
          .map(n => b.take(n)) ++
          Seq(corrupt(b, b.length / 2), corrupt(b, 8),
            b ++ Array.fill[Byte](16)(0x7F))
      }.zipWithIndex.map { case (b, i) => (100L + i, b) }
    val rows = (Seq((1L, png), (2L, jpg)) ++ fuzz).toDF("media_id", "bytes")
    // must complete without a task failure, intact images still hash
    val got = Multimodal.imageAverageHash(rows)
      .as[(Long, Long)].collect().toMap
    assert(got.contains(1L) && got.contains(2L),
      "fuzz batch lost the intact images")
    assert(got.keySet.forall(id => id <= 2L || id >= 100L))
    // hard-garbage subset must be no-row: truncated headers cannot decode
    val headerTrunc = fuzz.filter(_._2.length <= 16).map(_._1).toSet
    assert(headerTrunc.nonEmpty && headerTrunc.forall(!got.contains(_)),
      "a <=16-byte truncated header decoded — impossible")
  }
}

class TextAnalysisOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("piiScrub redacts all three classes and counts on the original") {
    val d = Seq((1L, "mail a.b+c@ex-1.org call +1 555 010 1234 host 192.168.0.1 end"),
      (2L, "clean text no pii")).toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        TextAnalysis.piiScrub(col("text")).as("p"))
      .select(col("doc_id"), col("p.scrubbed"), col("p.n_email"),
        col("p.n_phone"), col("p.n_ipv4"))
      .as[(Long, String, Int, Int, Int)].collect()
      .map { case (k, v2, v3, v4, v5) => k -> ((v2, v3, v4, v5)) }.toMap
    assert(got(1L)._1 == "mail <EMAIL> call <PHONE> host <IP> end")
    assert(got(1L)._2 == 1 && got(1L)._3 == 1 && got(1L)._4 == 1)
    assert(got(2L) == (("clean text no pii", 0, 0, 0)))
  }

  test("approx vocab within the HLL++ error bound of exact") {
    val d = "/root/testdata/sf0.001"
    val terms = spark.read.parquet(s"$d/documents.parquet")
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
    // pin the tighter 3·rsd bound here (the q65 oracle compares 5·rsd)
    val both = terms.groupBy(col("lang"))
      .agg(approx_count_distinct(col("term"), rsd = 0.02).as("a"),
        countDistinct(col("term")).as("v"))
      .as[(String, Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (lang, a, v) =>
      assert(math.abs(a - v).toDouble / v <= 3 * 0.02,
        s"lang=$lang approx=$a exact=$v drift > 3*rsd")
    }
    // and the oracle-facing boolean must hold on every group
    val q65 = graft.operators.ScaleCatalogue.q65ApproxProfile(spark, d)
      .select("lang", "approx_ok").as[(String, Boolean)].collect()
    assert(q65.nonEmpty && q65.forall(_._2),
      s"approx_ok false for: ${q65.filterNot(_._2).map(_._1).mkString(",")}")
  }

  test("charEntropyQ edge cases: empty, uniform, single-char") {
    val d = Seq((1L, ""), (2L, "aaaa"), (3L, "ab"), (4L, "abcd"))
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        TextAnalysis.charEntropyQ(col("text")).as("e"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L)               // no characters -> zero entropy
    assert(got(2L) == 0L)               // single symbol -> zero entropy
    assert(got(3L) == 693147L)          // ln(2) = 0.693147...
    assert(got(4L) == 1386294L)         // ln(4) = 1.386294...
  }

  test("contaminationOverlap counts shared distinct n-grams only") {
    val cand = Seq((1L, "a b c d e"), (2L, "x y z w v")).toDF("doc_id", "text")
    val ev = Seq((100L, "a b c q r")).toDF("doc_id", "text")
    // candidate 1 shares 3-grams "a b c" (and only that); candidate 2 none
    val got = graft.scale.Dedup.contaminationOverlap(cand, ev, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L))
  }

  test("classifierScore replays the md5 hashing trick bit-for-bit") {
    // independent JVM-side reimplementation of feature -> bucket -> weight
    def md5_64(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    def weight(f: String): Long = {
      val b = java.lang.Math.floorMod(md5_64(f), 4096L)
      java.lang.Math.floorMod(md5_64(b.toString), 2001L) - 1000L
    }
    val text = "the quick brown fox jumps"
    val toks = text.split(" ").toSeq
    val feats = toks ++ toks.sliding(2).map(_.mkString(" "))
    val got = Seq((1L, text)).toDF("doc_id", "text")
      .select(TextAnalysis.classifierScore(split(col("text"), " ")).as("c"))
      .select(col("c.n_feat"), col("c.score")).as[(Long, Long)].head()
    assert(got == ((feats.size.toLong, feats.map(weight).sum)))
  }

  test("trained weights loaded from parquet score identically to the independent JVM model") {
    // the q88 scaladoc promise, demonstrated: an actually-TRAINED
    // integer model occupies the same slot as the frozen md5 table.
    def md5_64(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    def buckets(text: String): Seq[Long] = {
      val toks = text.split(" ").toSeq
      (toks ++ toks.sliding(2).map(_.mkString(" ")))
        .map(f => java.lang.Math.floorMod(md5_64(f), 4096L))
    }
    // labeled fixture: planted class markers + shared noise vocabulary
    val pos = Seq("stellar prose with careful argument structure",
      "careful measured writing stellar clarity throughout",
      "the argument lands with stellar measured precision",
      "careful sources cited stellar coherent prose")
    val neg = Seq("clickbait garbage scraped keyword stuffing mess",
      "keyword keyword stuffing garbage scraped filler",
      "scraped filler mess with clickbait garbage noise",
      "stuffing noise clickbait scraped keyword mess")
    val labeled = pos.map(_ -> 1) ++ neg.map(_ -> 0)
    // integer perceptron, few epochs, deterministic order
    val w = Array.fill(4096)(0L)
    for (_ <- 1 to 10; (text, y) <- labeled) {
      val s = buckets(text).map(b => w(b.toInt)).sum
      val pred = if (s > 0) 1 else 0
      if (pred != y)
        buckets(text).foreach(b => w(b.toInt) += (if (y == 1) 1L else -1L))
    }
    // model registry handoff: weights round-trip through parquet
    val dir = java.nio.file.Files.createTempDirectory("graft-clf")
      .resolve("weights").toString
    w.zipWithIndex.toSeq.map { case (wt, b) => (b.toLong, wt) }
      .toDF("bucket", "weight").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val loaded = {
      val arr = Array.fill(4096)(0L)
      spark.read.parquet(dir).as[(Long, Long)].collect()
        .foreach { case (b, wt) => arr(b.toInt) = wt }
      arr
    }
    val docs = labeled.zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "label")
    val scored = docs.select(col("doc_id"), col("label"),
        TextAnalysis.classifierScoreTrained(split(col("text"), " "), loaded)
          .as("c"))
      .select(col("doc_id"), col("label"), col("c.n_feat"), col("c.score"))
      .as[(Long, Int, Long, Long)].collect()
    // parity: the Spark column equals the JVM model on every doc
    scored.foreach { case (id, _, nFeat, score) =>
      val text = labeled(id.toInt)._1
      val want = buckets(text).map(b => w(b.toInt)).sum
      assert(score == want, s"doc $id: spark $score != jvm $want")
      assert(nFeat == buckets(text).size.toLong)
    }
    // the trained model separates the planted classes
    scored.foreach { case (id, label, _, score) =>
      assert((score > 0) == (label == 1),
        s"trained model misclassified doc $id (score $score, label $label)")
    }
  }

  test("q88/q89 catalogue shapes: keep flag consistent, shards contiguous") {
    val d = "/root/testdata/sf0.001"
    val q88 = graft.operators.ScaleCatalogue.q88QualityClassifier(spark, d)
      .select("score", "keep").as[(Long, Int)].collect()
    assert(q88.nonEmpty && q88.forall { case (s, k) => (s > 0) == (k == 1) })
    // both classes occur on the corpus, else the filter is degenerate
    assert(q88.exists(_._2 == 1) && q88.exists(_._2 == 0))
    val q89 = graft.operators.ScaleCatalogue.q89ShardExport(spark, d)
    val byShard = q89.groupBy("shard")
      .agg(count(lit(1)).as("n"), min(col("ordinal")).as("mn"),
        max(col("ordinal")).as("mx"))
      .as[(Long, Long, Int, Int)].collect()
    assert(byShard.length == 8, s"expected 8 shards, got ${byShard.length}")
    byShard.foreach { case (sh, n, mn, mx) =>
      assert(mn == 1 && mx.toLong == n, s"shard $sh ordinals not contiguous")
    }
    val total = spark.read.parquet(s"$d/documents.parquet").count()
    assert(byShard.map(_._2).sum == total)
  }

  test("repetitionFeatures flags planted repetition") {
    val d = Seq(
      (1L, "spam spam spam spam"),           // all dup words + bigrams
      (2L, "all words fully distinct here")) // no repetition
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        TextAnalysis.repetitionFeatures(split(col("text"), " ")).as("r"))
      .select(col("doc_id"), col("r.dup_word_ratio_q"), col("r.dup_bigram_ratio_q"))
      .as[(Long, Long, Long)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(got(1L) == ((750000L, 666666L))) // 3/4 words dup, 2/3 bigrams dup
    assert(got(2L) == ((0L, 0L)))
  }
}

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.functions.VectorOps

  test("native dot/dist2 bit-equal to the interpreted HOF fold") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .filter(col("ida") < 20)
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("eb"))
      .filter(col("idb") >= 20 && col("idb") < 40)
    val pairs = a.crossJoin(b)
    val diff = pairs.select(
        VectorOps.dot_f(col("ea"), col("eb")).as("nat"),
        Similarity.dotHof(col("ea"), col("eb")).as("hof"),
        VectorOps.dist2_f(col("ea"), col("eb")).as("nat2"),
        aggregate(zip_with(col("ea"), col("eb"),
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, v) => acc + v).as("hof2"))
      // bitwise compare via IEEE-754 total equality on doubles
      .filter(col("nat") =!= col("hof") || col("nat2") =!= col("hof2"))
    assert(diff.count() == 0)
  }

  test("dot/dist2 null semantics match the HOF fold on ragged/null input") {
    // HOF zip_with pads the shorter array with nulls, which poisons the
    // fold to NULL; a null element does the same. The native expressions
    // must agree, not silently fold over a prefix / read null as 0.
    val ragged = spark.range(1, 4).toDF("id")
      // id 1: length mismatch; id 2: clean; id 3: null element
      .withColumn("ea", when(col("id") === 3,
          array(lit(1.0f), lit(null).cast("float")))
        .otherwise(array(lit(1.0f), lit(2.0f))))
      .withColumn("eb", when(col("id") === 1,
          array(lit(1.0f), lit(2.0f), lit(3.0f)))
        .otherwise(array(lit(1.0f), lit(2.0f))))
    val got = ragged.select(col("id"),
        VectorOps.dot_f(col("ea"), col("eb")).as("nat"),
        Similarity.dotHof(col("ea"), col("eb")).as("hof"),
        VectorOps.dist2_f(col("ea"), col("eb")).as("nat2"))
      .orderBy("id")
      .as[(Long, Option[Double], Option[Double], Option[Double])].collect()
    assert(got.map(r => (r._1, r._2)) ===
      Array((1L, None), (2L, Some(5.0)), (3L, None)))
    assert(got.forall(r => r._2 == r._3), "native/HOF null behavior differs")
    assert(got.map(_._4) === Array(None, Some(0.0), None))
  }

  test("native hyperplane_sig bit-equal to the HOF formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 100)
    val nat = Similarity.hyperplaneSignature(emb, planes = 12)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    val hof = Similarity.hyperplaneSignatureHof(emb, planes = 12, dim = 64)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(nat == hof)
    assert(nat.values.toSet.size > 1, "signatures should spread across buckets")
  }

  test("dot_f runs inside whole-stage codegen and from pure SQL") {
    graft.GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("vo_emb")
    val df = spark.sql(
      "SELECT vec_id, dot_f(embedding, embedding) AS d2 FROM vo_emb")
    // `*(n)` operator prefix = inside WholeStageCodegen stage n
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("dot_f"),
      s"dot_f not inside a codegen stage:\n$plan")
    val got = df.filter(col("vec_id") === 0).as[(Long, Double)].collect()(0)._2
    val exp = emb.filter(col("vec_id") === 0)
      .select(Similarity.dotHof(col("embedding"), col("embedding")))
      .as[Double].collect()(0)
    assert(got == exp)
  }
}

class RollingHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.functions.RollingHash

  test("rolling_hash matches reference fold and runs in codegen") {
    val d = Seq((1L, "abc"), (2L, ""), (3L, "the quick brown fox"))
      .toDF("id", "t")
    val got = d.select(col("id"), RollingHash.rolling_hash(col("t")).as("h"))
      .as[(Long, Long)].collect().toMap
    def ref(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % 2147483647L)
    assert(got(1L) == ref("abc"))
    assert(got(2L) == 0L)
    assert(got(3L) == ref("the quick brown fox"))
  }
}
