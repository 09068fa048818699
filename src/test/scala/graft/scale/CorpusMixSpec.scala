package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 corpus operators: exact-cut sequence packing (Packing),
  * collocation lift (Colloc), and sqrt-temperature mixture (Mixture) —
  * invariants a hand replay can state exactly, plus the determinism
  * properties the catalogue oracles rely on. */
class CorpusMixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "source")

  // ----------------------------------------------------------- Packing

  test("packStats: every bin holds exactly seqLen tokens except each shard's tail") {
    val docs = (0L until 40L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" "), "s")).toDF(
      "doc_id", "text", "source")
    val stats = Packing.packStats(docs, col("doc_id") % 3, seqLen = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val byShard = stats.groupBy(_._1)
    for ((_, bins) <- byShard) {
      val maxBin = bins.map(_._2).max
      for ((_, bin, _, nTok) <- bins) {
        if (bin < maxBin) assert(nTok == 10L, s"non-tail bin $bin has $nTok")
        else assert(nTok >= 1 && nTok <= 10L)
      }
      // bins are contiguous from 0
      assert(bins.map(_._2).sorted.toSeq == (0L to maxBin).toSeq)
    }
  }

  test("packStats: token mass conserved per shard and doc spans counted once per touched bin") {
    val docs = (0L until 25L).map(i =>
      (i, Seq.fill((i % 13 + 1).toInt)("t").mkString(" "), "s")).toDF(
      "doc_id", "text", "source")
    val L = 8L
    val stats = Packing.packStats(docs, lit(0L), L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalTok = (0L until 25L).map(i => i % 13 + 1).sum
    assert(stats.map(_._3).sum == totalTok)
    // replay the layout in plain Scala
    var off = 0L
    val expect = collection.mutable.Map.empty[Long, (Long, Long)]
    for (i <- 0L until 25L) {
      val tk = i % 13 + 1
      for (b <- off / L to (off + tk - 1) / L) {
        val span = math.min((b + 1) * L, off + tk) - math.max(b * L, off)
        val (d0, t0) = expect.getOrElse(b, (0L, 0L))
        expect(b) = (d0 + 1, t0 + span)
      }
      off += tk
    }
    assert(stats.map(s => s._1 -> (s._2, s._3)).toMap == expect.toMap)
  }

  test("tokenBalancedShards equals a brute-force global-order replay; shards balance") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val nShards = 8
    val got = Packing.tokenBalancedShards(docs, nShards)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // brute-force replay of the layout on the driver
    val base = docs.select(col("doc_id"),
        graft.functions.RollingHash.rolling_hash(col("text")).as("h"),
        Packing.tokenCount(col("text")).as("tk"))
      .as[(Long, Long, Long)].collect()
      .sortBy { case (id, h, _) => (h % 32, h, id) }
    val total = base.map(_._3).sum
    val target = math.max(1L, (total + nShards - 1) / nShards)
    var off = 0L
    val expect = base.map { case (id, _, tk) =>
      val cs = off; off += tk
      id -> ((tk, cs, cs / target))
    }.toMap
    assert(got == expect, "two-level layout diverges from the global order")
    // balance: every shard's token mass is within one max-doc of target
    val maxDoc = base.map(_._3).max
    val byShard = got.values.groupBy(_._3).view.mapValues(_.map(_._1).sum)
    assert(byShard.forall { case (sh, tok) =>
      tok <= target + maxDoc && (sh == byShard.keys.max || tok >= target - maxDoc)
    }, s"unbalanced shards: ${byShard.toMap}")
  }

  // ------------------------------------------------------------ Colloc

  test("bigramLift matches the hand-computed integer lift") {
    // corpus: "a b", "a b", "a c" → N=6 tokens
    // c(a)=3 c(b)=2 c(c)=1; c12(a,b)=2, c12(a,c)=1
    val docs = docsDf(Seq((1L, "a b", "s"), (2L, "a b", "s"),
      (3L, "a c", "s")))
    val got = Colloc.bigramLift(docs, minCount = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("a", "b")) == ((2L, 3L, 2L, 2L * 6L * 1000000L / (3L * 2L))))
    assert(got(("a", "c")) == ((1L, 3L, 1L, 1L * 6L * 1000000L / (3L * 1L))))
  }

  test("bigramLift: minCount filters and rarer pairings score higher lift") {
    // "x y" always together (perfect association) vs "a" promiscuous
    val docs = docsDf(Seq((1L, "x y x y a q a r a s", "s"),
      (2L, "x y a t", "s")))
    val lift = Colloc.bigramLift(docs, minCount = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    // only pairs with c12 >= 3 survive
    assert(lift.forall { case (w1, w2, _) => (w1, w2) == ("x", "y") })
  }

  test("q133 keep-best: canonical is the longest member, not the min id") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.operators.ScaleCatalogue.q133KeepBest(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty, "no multi-member near-dup cluster in the fixture")
    val lab = Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(graft.Tables.documents(spark, d),
          n = 5, threshold = 0.8).select(col("d1"), col("d2")))
      .join(graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("n_chars")), "doc_id")
      .as[(Long, Long, Long)].collect() // (doc_id, cluster, n_chars)
    val byCluster = lab.groupBy(_._2)
    for ((cluster, n, keepId, keepChars) <- rows) {
      val members = byCluster(cluster)
      assert(members.length.toLong == n)
      // keep = argmax (n_chars, -doc_id)
      val expect = members.maxBy { case (id, _, ch) => (ch, -id) }
      assert((keepId, keepChars) == ((expect._1, expect._3)),
        s"cluster $cluster kept ($keepId, $keepChars), want $expect")
    }
    // the policy must differ from min-id somewhere, or the fixture
    // proves nothing beyond q67
    assert(rows.exists { case (cluster, _, keepId, _) => keepId != cluster },
      "keep-best never diverged from the min-id canonical")
  }

  // ----------------------------------------------------- Lang segments

  test("chunkLangProfile: per-window argmax, mixed flag, und fallback, window boundaries") {
    val en = Seq.fill(8)("the of and is a").mkString(" ")   // 40 en tokens
    val de = Seq.fill(8)("der die und ist das").mkString(" ") // 40 de tokens
    val docs = Seq(
      (1L, en),                          // monolingual en
      (2L, en + " " + de),               // code-switched: en + de windows
      (3L, "qq ww ee rr tt"),            // no markers → und
      (4L, de)).toDF("doc_id", "text")
    val got = TextAnalysis.chunkLangProfile(docs, window = 32)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    // 40 tokens → 2 chunks; 81 tokens → 3 chunks
    assert(got(1L) == ((2L, "en", 1L, false)))
    assert(got(3L) == ((1L, "und", 0L, false)))
    assert(got(4L) == ((2L, "de", 1L, false)))
    val (nCh2, major2, nl2, mixed2) = got(2L)
    assert(nCh2 == 3L && mixed2 && nl2 == 2L,
      s"code-switched doc not detected: ${got(2L)}")
    // windows 2 and 3 are de-majority (the straddling window votes de:
    // 24 de markers vs 8 en), window 1 is en → majority de
    assert(major2 == "de", "majority must follow chunk counts")
  }

  // ----------------------------------------------------------- Mixture

  test("temperatureQuotas: sqrt rebalancing boosts small groups, Σ quota ≤ k") {
    // 90/9 split: raw share 91%/9%; sqrt share 9/(9+3)=75%/25%
    val docs = (0L until 99L).map(i =>
      (i, "t", if (i < 90) "big" else "small")).toDF(
      "doc_id", "text", "source")
    val q = Mixture.temperatureQuotas(docs, "source", k = 12L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(q("big") == ((90L, 9L, 9L)))   // floor(sqrt(90))=9; 9*12/12=9
    assert(q("small") == ((9L, 3L, 3L)))  // floor(sqrt(9))=3; 3*12/12=3
    assert(q.values.map(_._3).sum <= 12L)
    // sqrt share (25%) > raw share (9%) for the small group
    assert(q("small")._3.toDouble / 12 > 9.0 / 99)
  }

  test("temperatureQuotasAlpha: dyadic chain equals BigInt rational powers; endpoints recover n and isq") {
    // w(n, num/16) = product of floor(n^(1/2^i)) over set bits of num —
    // each chain element verified against the exact BigInt 2^i-th root
    def root(n: Long, pow: Int): Long = { // floor(n^(1/2^pow)) exactly
      var lo = 0L; var hi = math.max(1L, n)
      while (lo < hi) {
        val mid = (lo + hi + 1) / 2
        if (BigInt(mid).pow(1 << pow) <= BigInt(n)) lo = mid else hi = mid - 1
      }
      lo
    }
    def wRef(n: Long, num: Int, j: Int): Long =
      (1 to j).filter(i => ((num >> (j - i)) & 1) == 1)
        .map(i => root(n, i)).product
    // chain pinned on moderate n through the public quota surface;
    // huge n (where a group-by-repetition fixture is infeasible) via
    // the IEEE-exactness identity below
    val smallNs = Seq(1L, 2L, 9L, 90L, 1000L)
    val sdocs = smallNs.zipWithIndex.flatMap { case (n, g) =>
      (0L until n).map(i => (g * 1000000L + i, "t", s"g$g"))
    }.toDF("doc_id", "text", "source")
    for ((num, den) <- Seq((5, 16), (11, 16), (3, 4), (1, 2), (16, 16))) {
      val j = 31 - Integer.numberOfLeadingZeros(den)
      val got = Mixture.temperatureQuotasAlpha(sdocs, "source", 100L, num, den)
        .select(col("source"), col("n"), col("w"))
        .as[(String, Long, Long)].collect()
      got.foreach { case (g, n, w) =>
        val want = if (num == den) n else wRef(n, num, j)
        assert(w == want, s"alpha=$num/$den n=$n: w=$w want=$want ($g)")
      }
    }
    // huge-n chain elements stay exact where IEEE sqrt is (below 2^52)
    val huge = (1L << 51) + 12345L
    assert(root(huge, 1) == math.sqrt(huge.toDouble).floor.toLong,
      "IEEE sqrt drifted from the exact integer root below 2^52")
    // α = 1/2 through the general path equals the fixed fast path's isq
    val fixed = Mixture.temperatureQuotas(sdocs, "source", 100L)
      .select(col("source"), col("isq")).as[(String, Long)].collect().toMap
    val gen = Mixture.temperatureQuotasAlpha(sdocs, "source", 100L, 1, 2)
      .select(col("source"), col("w")).as[(String, Long)].collect().toMap
    assert(gen == fixed, "alpha=1/2 diverged from the fixed sqrt path")
    // monotone: w non-decreasing in n for fixed alpha
    val w516 = Mixture.temperatureQuotasAlpha(sdocs, "source", 100L, 5, 16)
      .select(col("n"), col("w")).as[(Long, Long)].collect().sortBy(_._1)
    assert(w516.sliding(2).forall(p => p.length < 2 || p(0)._2 <= p(1)._2),
      s"weight not monotone in n: ${w516.toSeq}")
  }

  test("q129 recipe: funnel is monotone and packing arithmetic closes") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.operators.ScaleCatalogue
      .q129TrainingRecipe(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    for ((src, nRaw, nClean, nKept, quota, nSel, nBins, nTok) <- rows) {
      assert(nRaw >= nClean && nClean >= nKept && nKept >= nSel,
        s"$src: funnel not monotone")
      assert(nSel == math.min(quota, nKept),
        s"$src: selection must hit min(quota, kept)")
      // concat-then-chunk: bins = ceil(total tokens / seqLen)
      assert(nBins == (nTok + 255) / 256,
        s"$src: $nBins bins for $nTok tokens")
    }
  }

  test("Mixture.sample: per-group counts hit min(quota, n) and survive repartitioning") {
    val docs = (0L until 200L).map(i =>
      (i, s"tok$i", s"src${i % 5}")).toDF("doc_id", "text", "source")
    val quotas = Mixture.temperatureQuotas(docs, "source", 30L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val sel = Mixture.sample(docs, "source", 30L).collect()
      .map(r => (r.getString(0), r.getLong(4)))
    val perGroup = sel.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    for ((g, quota) <- quotas)
      assert(perGroup.getOrElse(g, 0L) == math.min(quota, 40L))
    val sel2 = Mixture.sample(docs.repartition(13, col("text")),
      "source", 30L).collect().map(r => (r.getString(0), r.getLong(4)))
    assert(sel.sorted.toSeq == sel2.sorted.toSeq,
      "selection not stable under repartitioning")
  }
}
