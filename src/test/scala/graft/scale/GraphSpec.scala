package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph family: integer-space PageRank pinned against an independent
  * in-test reimplementation of the recurrence, corpus invariants, and
  * the one-edge-shuffle plan property q96's scaladoc claims. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Independent pure-Scala replay of Graph.pageRankQ's recurrence —
    * same integer ops, no Spark. */
  private def prRef(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val n = deg.size
    var r: Map[Long, Long] = deg.map { case (k, _) => k -> Scale / n }
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = deg.map { case (k, _) =>
        k -> ((Scale * 15L / 100L) / n + 85L * in.getOrElse(k, 0L) / 100L)
      }
    }
    r
  }

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.toDF("src", "dst")

  test("pageRankQ matches the independent integer recurrence exactly") {
    // asymmetric bipartite graph: c1-{p10,p20}, c2-{p10} (symmetrized)
    val und = Seq(1L -> 10L, 2L -> 10L, 1L -> 20L)
    val pairs = und ++ und.map(_.swap)
    for (iters <- Seq(0, 1, 3)) {
      val got = Graph.pageRankQ(edgesDf(pairs), iters)
        .as[(Long, Long, Long)].collect()
        .map { case (node, _, pr) => node -> pr }.toMap
      assert(got == prRef(pairs, iters), s"divergence at iters=$iters")
    }
  }

  test("hub gets the highest rank; mass stays within floor losses") {
    // star: hub 1 connected to 100..104 — the hub must dominate
    val und = (100L to 104L).map(1L -> _)
    val pairs = und ++ und.map(_.swap)
    val pr = Graph.pageRankQ(edgesDf(pairs), 3)
      .as[(Long, Long, Long)].collect()
    val byNode = pr.map { case (n, _, r) => n -> r }.toMap
    assert((100L to 104L).forall(l => byNode(1L) > byNode(l)))
    // every floor drops < 1 unit; per iteration the total loses at most
    // (#edges + 2·N) units — negligible vs Scale
    val total = pr.map(_._3).sum
    assert(total > Scale * 95L / 100L && total <= Scale,
      s"mass off: $total vs $Scale")
  }

  test("corpus PageRank: every edge-endpoint ranked, parts and customers both surface") {
    val d = "/root/testdata/sf0.001"
    val top = graft.operators.ScaleCatalogue.q96PageRank(spark, d)
      .as[(Int, Long, String, Long, Long)].collect()
    assert(top.length == 100)
    assert(top.map(_._3).toSet == Set("customer", "part"))
    // ranks strictly ordered by (pr_q desc, node asc)
    val ord = top.sortBy(_._1).map(t => (-t._5, t._2)).toSeq
    assert(ord == ord.sorted, "output not ordered by (pr_q desc, node)")
  }

  /** Seeded variant of [[prRef]]: teleport only onto `seeds`. */
  private def pprRef(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val ns = seeds.size
    var r: Map[Long, Long] = deg.map { case (k, _) =>
      k -> (if (seeds(k)) Scale / ns else 0L)
    }
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = deg.map { case (k, _) =>
        k -> ((if (seeds(k)) (Scale * 15L / 100L) / ns else 0L) +
          85L * in.getOrElse(k, 0L) / 100L)
      }
    }
    r
  }

  test("personalized PR matches the seeded recurrence; unreachable stays exactly 0") {
    // two components: seeds {1} in the first; {5,30} disconnected
    val und = Seq(1L -> 10L, 2L -> 10L, 1L -> 20L, 5L -> 30L)
    val pairs = und ++ und.map(_.swap)
    val seeds = Set(1L)
    for (iters <- Seq(1, 3)) {
      val got = Graph.personalizedPageRankQ(
          edgesDf(pairs), Seq(1L).toDF("node"), iters)
        .as[(Long, Long, Long)].collect()
        .map { case (node, _, pr) => node -> pr }.toMap
      assert(got == pprRef(pairs, seeds, iters), s"divergence at iters=$iters")
      assert(got(5L) == 0L && got(30L) == 0L,
        "disconnected component must hold exactly 0")
      assert(got(1L) > 0L && got(10L) > 0L)
    }
  }

  test("randomWalks matches an independent md5 hop replay; hops follow edges") {
    val d = "/root/testdata/sf0.001"
    val got = graft.operators.ScaleCatalogue.q100RandomWalks(spark, d)
      .as[(Long, Int, Long)].collect().toSeq
    assert(got.nonEmpty)
    // independent replay: collect the edge list, walk it in plain Scala
    val e = Graph.purchaseEdges(
      graft.Tables.orders(spark, d), graft.Tables.lineitem(spark, d))
      .as[(Long, Long)].collect().toSeq
    val adj = e.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15), 16)
    val walks = adj.keys.filter(n => n < Graph.PartBase && n % 100 == 0).toSeq.sorted
      .flatMap { start =>
        var cur = start
        (0 to 3).map { t =>
          if (t > 0) cur = adj(cur).map(v => ((h(s"$t:$cur:$v"), v), v))
            .minBy(_._1)._2
          (start, t, cur)
        }
      }
    assert(got.sorted == walks.sorted)
    // every hop is a real edge
    val edgeSet = e.toSet
    got.groupBy(_._1).values.foreach { w =>
      w.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, u), (_, _, v)) => assert(edgeSet.contains((u, v)))
        case _ =>
      }
    }
  }

  test("the edge table shuffles once: iterations reuse the exchange") {
    val d = "/root/testdata/sf0.001"
    val df = graft.operators.ScaleCatalogue.q96PageRank(spark, d)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // 3 iterations + the degree table all consume the edge relation;
    // Catalyst must materialize that shuffle once and reuse it
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"edge exchange not reused across iterations:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "PageRank planned a cartesian product")
  }

  /** Directed replay of [[prRef]] with dangling-mass redistribution:
    * node set from both endpoints; dm = Σ r over outdeg-0 sinks. */
  private def prDirRef(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val outd = edges.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    var r: Map[Long, Long] = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / outd(src) }.sum
      }
      val dm = nodes.filterNot(outd.contains).map(r).sum
      r = nodes.map { v =>
        v -> ((Scale * 15L / 100L) / n +
          85L * (in.getOrElse(v, 0L) + dm / n) / 100L)
      }.toMap
    }
    r
  }

  test("directed PageRank: sinks ranked, dangling mass redistributed, exact replay") {
    // 1 → {10, 20}, 2 → 10, 3 → 1: nodes 10 and 20 are pure sinks
    val pairs = Seq(1L -> 10L, 1L -> 20L, 2L -> 10L, 3L -> 1L)
    for (iters <- Seq(0, 1, 3)) {
      val got = Graph.pageRankDirectedQ(edgesDf(pairs), iters)
        .as[(Long, Long, Long)].collect()
      val byNode = got.map { case (n, _, r) => n -> r }.toMap
      assert(byNode == prDirRef(pairs, iters), s"divergence at iters=$iters")
      // dst-only sinks are first-class rows with outdeg 0
      val od = got.map { case (n, o, _) => n -> o }.toMap
      assert(od(10L) == 0L && od(20L) == 0L && od(1L) == 2L)
    }
    // dangling mass is redistributed, not lost: total stays near Scale
    val total = Graph.pageRankDirectedQ(edgesDf(pairs), 3)
      .as[(Long, Long, Long)].collect().map(_._3).sum
    assert(total > Scale * 95L / 100L && total <= Scale,
      s"dangling mass lost: $total vs $Scale")
    // the two-in-edge sink (10) outranks the one-in-edge sink (20)
    val r3 = Graph.pageRankDirectedQ(edgesDf(pairs), 3)
      .as[(Long, Long, Long)].collect().map { case (n, _, r) => n -> r }.toMap
    assert(r3(10L) > r3(20L))
  }

  test("symmetric pageRankQ raises loudly on a directed edge table") {
    val directed = Seq(1L -> 10L, 2L -> 10L) // 10 is dst-only
    val ex = intercept[Exception] {
      Graph.pageRankQ(edgesDf(directed), 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("pageRankDirectedQ")),
      s"wrong failure: $ex")
  }

  test("degenerate inputs: empty edges yield empty (never null ranks); empty seeds raise") {
    // no edges → no nodes → zero rows; the n=0 division is never
    // evaluated because there is no row to evaluate it on
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.pageRankQ(empty, 1).collect().isEmpty)
    assert(Graph.pageRankDirectedQ(empty, 1).collect().isEmpty)
    // empty SEEDS against a real graph is the reachable null-rank
    // hazard (n_seeds=0 divides every node row) — must raise, not null
    val und = Seq(1L -> 10L, 10L -> 1L)
    intercept[Exception] {
      Graph.personalizedPageRankQ(edgesDf(und),
        Seq.empty[Long].toDF("node"), 1).collect()
    }
  }

  test("q108 corpus run: parts are sinks yet surface in the top ranks") {
    val d = "/root/testdata/sf0.001"
    val top = graft.operators.ScaleCatalogue.q108PagerankDirected(spark, d)
      .as[(Int, Long, String, Long, Long)].collect()
    assert(top.length == 100)
    // the directed graph's sinks (parts) must appear — the whole point
    // of the dangling-corrected form is that dst-only nodes get rank
    assert(top.exists(t => t._3 == "part" && t._4 == 0L))
    val ord = top.sortBy(_._1).map(t => (-t._5, t._2)).toSeq
    assert(ord == ord.sorted, "output not ordered by (pr_q desc, node)")
  }

  test("long walks: checkpoint cadence bounds plan depth, data unchanged") {
    // 8-node ring, one walker: 16 hops exercise 3 checkpoints at K=4
    val ring = (0L until 8L).flatMap(i =>
      Seq(i -> ((i + 1) % 8), ((i + 1) % 8) -> i))
    val starts = Seq((0L, 0L)).toDF("walk_id", "node")
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    val bounded = Graph.randomWalks(edgesDf(ring), starts, 16,
      materializeEvery = 4)
    val unbounded = Graph.randomWalks(edgesDf(ring), starts, 16,
      materializeEvery = 100)
    // the materialized form's FINAL plan holds only the last segment's
    // hop-joins — K(K+1)/2 = 10 at K=4 (the accumulator union repeats
    // each in-segment frontier), independent of steps; the unbounded
    // form accumulates all 16 per frontier
    assert(joins(bounded) <= 10,
      s"plan depth not bounded: ${joins(bounded)} joins")
    assert(joins(unbounded) >= 16,
      s"fixture too shallow: ${joins(unbounded)} joins")
    // identical walks either way — the cadence is pure mechanics
    val a = bounded.as[(Long, Int, Long)].collect().sorted.toSeq
    val b = unbounded.as[(Long, Int, Long)].collect().sorted.toSeq
    assert(a == b && a.length == 17)
    // independent replay of the 16-hop argmin chain
    val adj = ring.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15), 16)
    var cur = 0L
    val expect = (0L, 0, 0L) +: (1 to 16).map { t =>
      cur = adj(cur).map(v => ((h(s"$t:$cur:$v"), v), v)).minBy(_._1)._2
      (0L, t, cur)
    }
    assert(a == expect.sorted.toSeq)
  }

  test("random walks: no cartesian product; hops read the pinned edge table") {
    val d = "/root/testdata/sf0.001"
    val df = graft.operators.ScaleCatalogue.q100RandomWalks(spark, d)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "walks planned a cartesian product")
    // the edge table is eagerly checkpointed once — every hop must scan
    // the materialized blocks (ExistingRDD), never re-derive the edges
    assert(plan.contains("ExistingRDD"),
      s"edge table not pinned (no checkpointed edge scan in plan):\n$plan")
  }

  test("citationEdges: rare-shingle edges, df cap, newer-cites-older direction") {
    // "alpha beta gamma" in docs 0,1,2 (df 3 — in [2,4]);
    // "head word soup" in docs 0..4 (df 5 — over the cap, no edges);
    // doc 5 shares nothing rare — isolated, absent from the edge set
    val docs = Seq(
      (0L, "alpha beta gamma head word soup"),
      (1L, "alpha beta gamma head word soup"),
      (2L, "pad alpha beta gamma head word soup"),
      (3L, "other stuff here head word soup"),
      (4L, "more filler rows head word soup"),
      (5L, "nothing shared with anyone at all")
    ).toDF("doc_id", "text")
    val e = Graph.citationEdges(docs, n = 3, dfMin = 2, dfMax = 4)
      .as[(Long, Long)].collect().toSet
    // rare trigrams among docs 0,1,2: "alpha beta gamma" (df 3),
    // "beta gamma head" (df 3), "gamma head word" (df 3) — all yield
    // the same pair closure {1→0, 2→0, 2→1}; the df-5 suffix trigrams
    // ("head word soup" etc.) must contribute nothing
    assert(e == Set((1L, 0L), (2L, 0L), (2L, 1L)),
      s"unexpected edge set: $e")
    assert(e.forall { case (s, d2) => s > d2 }, "direction must be newer→older")
  }

  test("pageRankWeightedQ matches the independent weighted recurrence; weight skews mass") {
    // 3 cites 1 (w=5) and 2 (w=1); 1 and 2 are sinks
    val edges = Seq((3L, 1L, 5L), (3L, 2L, 1L)).toDF("src", "dst", "w")
    def ref(iters: Int): Map[Long, Long] = {
      val n = 3L
      var r = Map(1L -> Scale / n, 2L -> Scale / n, 3L -> Scale / n)
      val t = (Scale * 15L / 100L) / n
      for (_ <- 1 to iters) {
        val c1 = (r(3L) * 5L) / 6L // in-edge from 3, w=5, sw(3)=6
        val c2 = (r(3L) * 1L) / 6L
        val dmShare = (r(1L) + r(2L)) / n // sinks 1 and 2
        r = Map(
          1L -> (t + 85L * (c1 + dmShare) / 100L),
          2L -> (t + 85L * (c2 + dmShare) / 100L),
          3L -> (t + 85L * dmShare / 100L))
      }
      r
    }
    for (iters <- Seq(1, 3)) {
      val got = Graph.pageRankWeightedQ(edges, iters)
        .select(col("node"), col("pr_q"))
        .as[(Long, Long)].collect().toMap
      assert(got == ref(iters), s"iters=$iters: $got != ${ref(iters)}")
    }
    // weighted: node 1 outranks node 2 (5× the inbound weight)
    val r3 = Graph.pageRankWeightedQ(edges, 3)
      .select(col("node"), col("pr_q")).as[(Long, Long)].collect().toMap
    assert(r3(1L) > r3(2L), "weight did not skew the mass split")
    // uniform weights degrade to the unweighted directed form exactly
    val uni = edges.withColumn("w", lit(7L))
    val a = Graph.pageRankWeightedQ(uni, 3)
      .select(col("node"), col("pr_q")).as[(Long, Long)].collect().toMap
    val b = Graph.pageRankDirectedQ(edges.select(col("src"), col("dst")), 3)
      .select(col("node"), col("pr_q")).as[(Long, Long)].collect().toMap
    assert(a == b, "uniform weights must reproduce the unweighted ranks")
  }

  test("hitsQ matches the independent integer replay; roles separate on a bipartite-ish graph") {
    // hubs 3,4 cite authorities 1,2; 3 cites both, 4 cites only 1
    val edges = Seq((3L, 1L), (3L, 2L), (4L, 1L)).toDF("src", "dst")
    val S = 1000000L
    def replay(iters: Int): Map[Long, (Long, Long)] = {
      val out = Map(3L -> Seq(1L, 2L), 4L -> Seq(1L))
      val in = Map(1L -> Seq(3L, 4L), 2L -> Seq(3L))
      var a = Seq(1L, 2L, 3L, 4L).map(v => v -> S).toMap
      var h = a
      for (_ <- 1 to iters) {
        val ar = Seq(1L, 2L, 3L, 4L).map(v =>
          v -> in.getOrElse(v, Nil).map(h).sum).toMap
        val am = ar.values.max
        a = ar.map { case (v, x) => v -> (x * S) / am }
        val hr = Seq(1L, 2L, 3L, 4L).map(v =>
          v -> out.getOrElse(v, Nil).map(a).sum).toMap
        val hm = hr.values.max
        h = hr.map { case (v, x) => v -> (x * S) / hm }
      }
      Seq(1L, 2L, 3L, 4L).map(v => v -> (a(v), h(v))).toMap
    }
    for (iters <- Seq(1, 2)) {
      val got = Graph.hitsQ(edges, iters)
        .as[(Long, Long, Long)].collect()
        .map { case (n2, aa, hh) => n2 -> (aa, hh) }.toMap
      assert(got == replay(iters), s"iters=$iters: $got != ${replay(iters)}")
    }
    val r = Graph.hitsQ(edges, 2).as[(Long, Long, Long)].collect()
      .map { case (n2, aa, hh) => n2 -> (aa, hh) }.toMap
    // 1 is the top authority (cited by both hubs), 3 the top hub
    // (cites both authorities); pure hubs have authority 0 and pure
    // authorities have hub score 0 — the roles genuinely separate
    assert(r(1L)._1 == S && r(3L)._2 == S)
    assert(r(3L)._1 == 0L && r(4L)._1 == 0L, "hubs must have zero authority")
    assert(r(1L)._2 == 0L && r(2L)._2 == 0L, "authorities must have zero hub score")
    assert(r(1L)._1 > r(2L)._1, "doubly-cited authority must outrank")
  }

  test("kCoreQ: peels to the exact core; corpus run reaches fixpoint inside the round budget") {
    // triangle {1,2,3} (2-core) + pendant chain 3-4-5 peeled away
    val edges = Seq((2L, 1L), (3L, 1L), (3L, 2L), (4L, 3L), (5L, 4L))
      .toDF("src", "dst")
    val core = Graph.kCoreQ(edges, k = 2L, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"unexpected 2-core: $core")
    // k above the max degree: empty core, not an error
    assert(Graph.kCoreQ(edges, k = 10L, rounds = 3).isEmpty)

    // gate-corpus fixpoint: rounds 5 and 6 agree, so q122's 6-round
    // output is the exact 25-core, not a truncated peel
    val d = "/root/testdata/sf0.01"
    val ce = graft.scale.Graph.citationEdges(
      graft.Tables.documents(spark, d), n = 3, dfMin = 2, dfMax = 4)
      .localCheckpoint()
    val r5 = Graph.kCoreQ(ce, 25L, 5).as[(Long, Long)].collect().toSet
    val r6 = Graph.kCoreQ(ce, 25L, 6).as[(Long, Long)].collect().toSet
    assert(r5 == r6, "peeling did not converge within the round budget")
    assert(r6.nonEmpty)
  }

  test("triangleCounts: exact counts, star hubs contribute nothing") {
    // triangle {1,2,3}; square {4,5,6,7} (no diagonal => no triangle);
    // star center 10 with leaves 11..15 (wedges but no closure)
    val edges = Seq(
      (2L, 1L), (3L, 1L), (3L, 2L),                   // triangle
      (5L, 4L), (6L, 5L), (7L, 6L), (7L, 4L),         // square
      (11L, 10L), (12L, 10L), (13L, 10L), (14L, 10L), (15L, 10L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"unexpected triangle counts: $got")
    // two triangles sharing an edge: {1,2,3} + {2,3,4} via (4,2),(4,3)
    val got2 = Graph.triangleCounts(edges.limit(3)
        .unionByName(Seq((4L, 2L), (4L, 3L)).toDF("src", "dst")))
      .as[(Long, Long)].collect().toMap
    assert(got2 == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L),
      s"shared-edge triangles miscounted: $got2")
  }

  test("q112 corpus run: structural sinks exist and dangling mass keeps total rank sane") {
    val d = "/root/testdata/sf0.001"
    val out = graft.operators.ScaleCatalogue.q112CitationPagerank(spark, d)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out.size == 100)
    // doc 0 can never be a src (no lower id to cite): if ranked it is a
    // sink; more broadly the top-100 must contain sinks — the dangling
    // shape this query exists to exercise
    assert(out.exists(_._3 == 0L), "no sink in the top ranks")
    // ranks are positive and the teleport floor holds for every node
    assert(out.forall(_._4 > 0L))
  }

  /** Independent pure-Scala BFS replay. */
  private def bfsRef(edges: Seq[(Long, Long)], seeds: Set[Long],
      rounds: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (t <- 1 to rounds) {
      val next = frontier.flatMap(v => adj.getOrElse(v, Nil))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> t.toLong)
      frontier = next
    }
    dist
  }

  test("bfsDistancesQ matches the independent BFS; isolated seeds settle at 0") {
    // path 1-2-3-4-5 plus isolated seed 99
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val pairs = und ++ und.map(_.swap)
    val seeds = Set(1L, 99L)
    for (rounds <- Seq(0, 2, 4)) {
      val got = Graph.bfsDistancesQ(edgesDf(pairs),
          seeds.toSeq.toDF("node"), rounds)
        .as[(Long, Long)].collect().toMap
      assert(got == bfsRef(pairs, seeds, rounds),
        s"divergence at rounds=$rounds")
    }
    // the 4-round result includes node 5 at dist 4 and the isolated seed
    val full = Graph.bfsDistancesQ(edgesDf(pairs),
        seeds.toSeq.toDF("node"), 4)
      .as[(Long, Long)].collect().toMap
    assert(full(5L) == 4L && full(99L) == 0L)
  }

  /** Independent pure-Scala LPA replay (pinned seeds, majority vote,
    * ties → smallest label). */
  private def lpaRef(edges: Seq[(Long, Long)], seeds: Map[Long, Long],
      rounds: Int): Map[Long, Long] = {
    val adjIn = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var lab = seeds
    for (_ <- 1 to rounds) {
      val pick = adjIn.flatMap { case (v, ins) =>
        val votes = ins.flatMap(lab.get).groupBy(identity)
          .map { case (l, vs) => (l, vs.size) }
        if (votes.isEmpty) None
        else Some(v -> votes.minBy { case (l, c) => (-c, l) }._1)
      }
      lab = seeds ++ pick.filterNot { case (v, _) => seeds.contains(v) }
    }
    lab
  }

  test("labelPropagationQ matches the independent majority-vote replay; seeds stay pinned") {
    // two seed territories on a path: 1 .. 2-3-4 .. 5 (seeds 1, 5)
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val pairs = und ++ und.map(_.swap)
    val seeds = Map(1L -> 100L, 5L -> 500L)
    for (rounds <- Seq(0, 1, 3)) {
      val got = Graph.labelPropagationQ(edgesDf(pairs),
          seeds.toSeq.toDF("node", "label"), rounds)
        .as[(Long, Long)].collect().toMap
      assert(got == lpaRef(pairs, seeds, rounds),
        s"divergence at rounds=$rounds")
    }
    // ties break to the smallest label: node 3 hears 100 and 500 → 100
    val r3 = Graph.labelPropagationQ(edgesDf(pairs),
        seeds.toSeq.toDF("node", "label"), 3)
      .as[(Long, Long)].collect().toMap
    assert(r3(3L) == 100L)
    assert(r3(1L) == 100L && r3(5L) == 500L, "seed labels must not move")
  }

  test("warm-start PageRank: exact continuation, uniform entry for new nodes, convergence advantage") {
    // a small directed graph with sinks (dangling mass live)
    val eOld = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 4L, 5L -> 1L)
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("node"), col("pr_q")).as[(Long, Long)].collect().toMap

    // CONTINUATION: resume(k2) from cold(k1) == cold(k1+k2), bit-exact
    val cold3 = Graph.pageRankDirectedQ(edgesDf(eOld), 3)
    val resumed = Graph.pageRankDirectedResumeQ(edgesDf(eOld), 2,
      cold3.select(col("node"), col("pr_q")))
    val cold5 = Graph.pageRankDirectedQ(edgesDf(eOld), 5)
    assert(ranks(resumed) == ranks(cold5),
      "warm resume on an unchanged graph must equal the longer cold run")

    // NEW-NODE ENTRY: with 0 rounds, known nodes keep prior ranks and
    // appended nodes sit at exactly SCALE div N (current N)
    val eNew = eOld ++ Seq(6L -> 1L, 4L -> 6L)
    val entry = ranks(Graph.pageRankDirectedResumeQ(edgesDf(eNew), 0,
      cold3.select(col("node"), col("pr_q"))))
    val prior = ranks(cold3)
    assert(entry(6L) == Scale / 6,
      s"new node must enter at the uniform share, got ${entry(6L)}")
    assert(prior.forall { case (n, r) => entry(n) == r },
      "known nodes must keep their stored ranks at entry")

    // CONVERGENCE ADVANTAGE: when the appended delta is SMALL relative
    // to the graph (the per-ingest scenario the operator exists for —
    // one new doc citing into a 20-node ring+hub), the warm start is
    // closer (L1, integer space) to a long-run reference than a cold
    // start after the same 2 rounds. (A delta comparable to the whole
    // graph voids the advantage — stored ranks then approximate
    // nothing; that regime is cold-start territory by design.)
    val ring = (1L to 20L).map(i => i -> (i % 20 + 1))
    val hub = (2L to 6L).map(k => 1L -> k)
    val big = ring ++ hub
    val bigPrior = Graph.pageRankDirectedQ(edgesDf(big), 5)
      .select(col("node"), col("pr_q"))
    val bigNew = big ++ Seq(21L -> 1L)
    val ref = ranks(Graph.pageRankDirectedQ(edgesDf(bigNew), 20))
    def l1(m: Map[Long, Long]) =
      ref.keys.map(k => math.abs(ref(k) - m(k))).sum
    val warm2 = ranks(Graph.pageRankDirectedResumeQ(edgesDf(bigNew), 2,
      bigPrior))
    val coldOn2 = ranks(Graph.pageRankDirectedQ(edgesDf(bigNew), 2))
    assert(l1(warm2) <= l1(coldOn2),
      s"warm start lost to cold start: L1 ${l1(warm2)} vs ${l1(coldOn2)}")
  }

  /** Independent pure-Scala replay of modularityCommunitiesQ: same
    * integer gains, same monotone-descent schedule, same tiebreaks —
    * no Spark. */
  private def modRef(und: Seq[(Long, Long)], rounds: Int,
      prior: Map[Long, Long] = Map.empty): Map[Long, Long] = {
    val sym = und ++ und.map(_.swap)
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val twoM = sym.size.toLong
    var lab: Map[Long, Long] =
      deg.keys.map(n => n -> prior.getOrElse(n, n)).toMap
    for (_ <- 1 to rounds) {
      val sigma = lab.toSeq.groupBy(_._2)
        .map { case (c, ns) => c -> ns.map(x => deg(x._1)).sum }
      val next = deg.keys.map { n =>
        val kic = sym.filter(_._1 == n).groupBy(e => lab(e._2))
          .map { case (c, es) => c -> es.size.toLong }
          .filter { case (c, _) => c <= lab(n) } // monotone descent
        val cand = kic ++ (if (kic.contains(lab(n))) Map.empty
          else Map(lab(n) -> 0L))
        val best = cand.toSeq.map { case (c, k_ic) =>
          val sig = sigma(c) - (if (c == lab(n)) deg(n) else 0L)
          (twoM * k_ic - deg(n) * sig, c)
        }.minBy { case (g, c) => (-g, c) }._2
        n -> best
      }.toMap
      lab = next
    }
    lab
  }

  test("warm-start Louvain: replay-exact resume, self entry for new nodes, fewer rounds to the cold fixed point") {
    // two dense triangles joined by a bridge — the planted-block shape
    val old = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 4L -> 6L, 3L -> 4L)
    val prior = Graph.modularityCommunitiesQ(edgesDf(old), 3)
      .as[(Long, Long)].collect().toMap
    def priorDf = prior.toSeq.toDF("node", "comm")

    // REPLAY: resume == the independent replay seeded from the prior
    val resumed = Graph.modularityCommunitiesResumeQ(edgesDf(old), 2, priorDf)
      .as[(Long, Long)].collect().toMap
    assert(resumed == modRef(old, 2, prior),
      "warm resume diverged from the prior-seeded integer replay")

    // ENTRY at 0 rounds: known nodes keep stored labels, appended
    // nodes sit at self — exactly where a cold start would put them
    val app = old ++ Seq(7L -> 1L)
    val entry = Graph.modularityCommunitiesResumeQ(edgesDf(app), 0, priorDf)
      .as[(Long, Long)].collect().toMap
    assert(entry(7L) == 7L, "appended node must enter at self")
    assert(prior.forall { case (n, c) => entry(n) == c },
      "known nodes must keep their stored labels at entry")

    // CONVERGENCE ADVANTAGE on the small-delta append: the warm sweep
    // reaches the cold fixed-point PARTITION in fewer rounds. Labels
    // are trajectory-dependent (cold drags labels down through
    // neighbor chains while warm keeps the settled block labels), so
    // the fixed point is compared as a partition — the object the
    // operator exists to serve.
    def parts(m: Map[Long, Long]): Set[Set[Long]] =
      m.groupBy(_._2).values.map(_.keySet.toSet).toSet
    val fix = parts(modRef(app, 8))
    assert(parts(modRef(app, 9)) == fix, "8 rounds must be past the fixed point")
    def roundsTo(f: Int => Map[Long, Long]): Int =
      (0 to 8).find(r => parts(f(r)) == fix).getOrElse(99)
    val warmRounds = roundsTo(r => modRef(app, r, prior))
    val coldRounds = roundsTo(r => modRef(app, r))
    assert(warmRounds < 99, "warm descent never reached the cold fixed point")
    assert(warmRounds < coldRounds,
      s"warm start must beat cold on a small delta: $warmRounds vs $coldRounds")
    // and the Spark operator lands on the fixed point at that budget
    assert(parts(Graph.modularityCommunitiesResumeQ(edgesDf(app), warmRounds,
        priorDf).as[(Long, Long)].collect().toMap) == fix,
      "Spark warm sweep disagreed with the replay at the warm budget")
  }

  test("modularityCommunitiesQ matches the independent integer replay") {
    // a dense triangle, a tail, and a separate pair
    val und = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 7L -> 8L)
    for (rounds <- Seq(0, 1, 2, 4)) {
      val got = Graph.modularityCommunitiesQ(edgesDf(und), rounds)
        .as[(Long, Long)].collect().toMap
      assert(got == modRef(und, rounds), s"divergence at rounds=$rounds")
    }
  }

  test("modularity: planted dense blocks separate; the bridge does not merge them") {
    // two K4 blocks 0-3 and 10-13, one bridge edge 3-10
    def k4(base: Long) = for {
      i <- 0 until 4; j <- i + 1 until 4
    } yield (base + i) -> (base + j)
    val und = k4(0) ++ k4(10) ++ Seq(3L -> 10L)
    val got = Graph.modularityCommunitiesQ(edgesDf(und), rounds = 4)
      .as[(Long, Long)].collect().toMap
    val blockA = (0L to 3L).map(got).toSet
    val blockB = (10L to 13L).map(got).toSet
    assert(blockA.size == 1, s"block A did not contract: $got")
    assert(blockB.size == 1, s"block B did not contract: $got")
    assert(blockA != blockB,
      s"the single bridge edge merged the two dense blocks: $got")
  }

  /** Independent pure-Scala replay of the WEIGHTED multilevel loop:
    * weighted gains, self-loop-carrying coarsening, per-level monotone
    * descent, composed maps — no Spark. */
  private def modRefMulti(und: Seq[(Long, Long)], rounds: Int,
      levels: Int, priors: Seq[Map[Long, Long]] = Nil): Map[Long, Long] = {
    var sym: Map[(Long, Long), Long] =
      (und ++ und.map(_.swap)).groupBy(identity)
        .map { case (e, es) => e -> es.size.toLong }
    def localMove(w: Map[(Long, Long), Long],
        prior: Map[Long, Long]): Map[Long, Long] = {
      val deg = w.groupBy(_._1._1).map { case (n, es) => n -> es.values.sum }
      val twoM = w.values.sum
      var lab: Map[Long, Long] =
        deg.keys.map(n => n -> prior.getOrElse(n, n)).toMap
      for (_ <- 1 to rounds) {
        val sigma = lab.toSeq.groupBy(_._2)
          .map { case (c, ns) => c -> ns.map(x => deg(x._1)).sum }
        lab = deg.keys.map { n =>
          val kic = w.collect { case ((u, v), wt) if u == n && v != n =>
            lab(v) -> wt }
            .groupBy(_._1).map { case (c, es) => c -> es.map(_._2).sum }
            .filter { case (c, _) => c <= lab(n) }
          val cand = kic ++ (if (kic.contains(lab(n))) Map.empty
            else Map(lab(n) -> 0L))
          n -> cand.toSeq.map { case (c, k_ic) =>
            val sig = sigma(c) - (if (c == lab(n)) deg(n) else 0L)
            (twoM * k_ic - deg(n) * sig, c)
          }.minBy { case (g, c) => (-g, c) }._2
        }.toMap
      }
      lab
    }
    var assign: Map[Long, Long] =
      sym.keys.map(_._1).toSet.map((n: Long) => n -> n).toMap
    for (l <- 0 until levels) {
      val lab = localMove(sym,
        if (priors.isEmpty) Map.empty else priors(l))
      assign = assign.map { case (n, c) => n -> lab(c) }
      sym = sym.toSeq
        .map { case ((u, v), wt) => (lab(u), lab(v)) -> wt }
        .groupBy(_._1).map { case (e, es) => e -> es.map(_._2).sum }
    }
    assign
  }

  test("multilevel Louvain matches the weighted pure-Scala replay; levels=1 equals the single-level op") {
    // two K4 blocks + bridge, plus a pendant chain — structure at two
    // scales
    def k4(base: Long) = for {
      i <- 0 until 4; j <- i + 1 until 4
    } yield (base + i) -> (base + j)
    val und = k4(0) ++ k4(10) ++ Seq(3L -> 10L, 13L -> 20L, 20L -> 21L)
    for (levels <- Seq(1, 2, 3)) {
      val got = Graph.modularityCommunitiesMultilevelQ(edgesDf(und),
          rounds = 2, levels = levels)
        .as[(Long, Long)].collect().toMap
      assert(got == modRefMulti(und, 2, levels),
        s"divergence at levels=$levels")
    }
    // levels=1 is exactly the single-level operator (composition is the
    // identity at one level)
    val one = Graph.modularityCommunitiesMultilevelQ(edgesDf(und),
        rounds = 3, levels = 1)
      .as[(Long, Long)].collect().toMap
    val single = Graph.modularityCommunitiesQ(edgesDf(und), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(one == single, "levels=1 diverged from modularityCommunitiesQ")

    // coarsening preserves the gain algebra's invariants on the corpus
    // scale too: multilevel can only merge further (community count is
    // non-increasing in levels on the same rounds)
    def nComms(levels: Int) = Graph.modularityCommunitiesMultilevelQ(
        edgesDf(und), rounds = 2, levels = levels)
      .select(col("comm")).distinct().count()
    assert(nComms(2) <= nComms(1), "level 2 split a level-1 community")
  }

  test("warm-start MULTILEVEL Louvain: rounds=0 composes stored maps, replay-exact, fewer warm rounds") {
    // two triangles + bridge + pendant chain — structure at two scales,
    // with label chains cold descent must walk down
    val old = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 4L -> 6L, 3L -> 4L, 6L -> 20L, 20L -> 21L)
    val (assignOld, levelMaps) =
      Graph.modularityCommunitiesMultilevelLevelsQ(edgesDf(old),
        rounds = 2, levels = 2)
    val priors = levelMaps.map(_.as[(Long, Long)].collect().toMap)
    def priorDfs = priors.map(_.toSeq.toDF("node", "comm"))
    val oldAssign = assignOld.as[(Long, Long)].collect().toMap

    // rounds = 0 on the unchanged graph: the resume composes the
    // stored per-level maps verbatim — yesterday's answer, no work
    val zero = Graph.modularityCommunitiesMultilevelResumeQ(
        edgesDf(old), 0, 2, priorDfs)
      .as[(Long, Long)].collect().toMap
    assert(zero == oldAssign,
      "rounds=0 resume must reproduce the cached multilevel assignment")

    // REPLAY-exact against the prior-seeded pure model on an append
    val app = old ++ Seq(30L -> 1L)
    val warm = Graph.modularityCommunitiesMultilevelResumeQ(
        edgesDf(app), 1, 2, priorDfs)
      .as[(Long, Long)].collect().toMap
    assert(warm == modRefMulti(app, 1, 2, priors),
      "warm multilevel diverged from the prior-seeded integer replay")

    // STRICTLY FEWER warm rounds to the cold fixed-point partition on
    // the small-delta append (the q153 discipline, per level)
    def parts(m: Map[Long, Long]): Set[Set[Long]] =
      m.groupBy(_._2).values.map(_.keySet.toSet).toSet
    val fix = parts(modRefMulti(app, 6, 2))
    assert(parts(modRefMulti(app, 7, 2)) == fix,
      "6 rounds/level must be past the fixed point")
    def roundsTo(f: Int => Map[Long, Long]): Int =
      (0 to 6).find(r => parts(f(r)) == fix).getOrElse(99)
    val warmRounds = roundsTo(r => modRefMulti(app, r, 2, priors))
    val coldRounds = roundsTo(r => modRefMulti(app, r, 2))
    assert(warmRounds < 99, "warm descent never reached the cold fixed point")
    assert(warmRounds < coldRounds,
      s"warm multilevel must beat cold on a small delta: " +
        s"$warmRounds vs $coldRounds")
    // and the Spark operator lands on the fixed point at that budget
    assert(parts(Graph.modularityCommunitiesMultilevelResumeQ(
        edgesDf(app), warmRounds, 2, priorDfs)
      .as[(Long, Long)].collect().toMap) == fix,
      "Spark warm multilevel disagreed with the replay at the warm budget")
  }

  test("modularity: monotone descent reaches a fixpoint; extra rounds are no-ops") {
    // one isolated edge — unrestricted synchronous moves would swap
    // labels forever; monotone descent contracts it in one round and
    // can never oscillate
    val got = Graph.modularityCommunitiesQ(edgesDf(Seq(1L -> 2L)), rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet.size == 1,
      s"isolated edge did not contract to one community: $got")
    val more = Graph.modularityCommunitiesQ(edgesDf(Seq(1L -> 2L)), rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(more == got, s"communities oscillate: $got vs $more")
    // fixpoint stability on the denser fixture too
    val und = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 7L -> 8L)
    val a = Graph.modularityCommunitiesQ(edgesDf(und), rounds = 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.modularityCommunitiesQ(edgesDf(und), rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "extra rounds changed a converged labeling")
  }

  test("anchorTerms: citer counts per rare term, direction matches citationEdges") {
    // three docs sharing the rare trigram "x y z": 2 and 1 cite 0,
    // 2 cites 1 — doc 0 is anchored by 2 citers, doc 1 by one
    val docs = Seq(
      (0L, "x y z a b c"), (1L, "x y z d e f"), (2L, "x y z g h i"),
      (3L, "nothing shared here at all")).toDF("doc_id", "text")
    val got = Graph.anchorTerms(docs, n = 3, dfMin = 2, dfMax = 4)
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((0L, "x y z", 2L), (1L, "x y z", 1L)))
  }

  test("bfsDistancesQ: frontier shrinks to empty and extra rounds are no-ops") {
    val und = Seq(1L -> 2L, 2L -> 3L)
    val pairs = und ++ und.map(_.swap)
    val seeds = Seq(1L).toDF("node")
    val atConverged = Graph.bfsDistancesQ(edgesDf(pairs), seeds, 2)
      .as[(Long, Long)].collect().toMap
    val beyond = Graph.bfsDistancesQ(edgesDf(pairs), seeds, 6)
      .as[(Long, Long)].collect().toMap
    assert(atConverged == beyond)
    assert(atConverged == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
