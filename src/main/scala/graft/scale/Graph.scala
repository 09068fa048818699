package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over relationally-derived edge tables —
  * the link-structure family a corpus pipeline needs once documents
  * reference each other (wiki link graphs, citation graphs, co-purchase
  * graphs): degree profiling and join-iterated PageRank.
  *
  * Reference provenance: the reference's data model is a wiki whose
  * pages form exactly such a link graph (wikitext `[[...]]` links —
  * the rewrite rules at `process-mw-dump.py:198-211` manipulate them
  * without analyzing the structure); this family is part of the repo's
  * extension scope (training-data pipeline operators), computed here
  * over the deterministic TPC-H-ish corpus so a DuckDB oracle can
  * replay it.
  *
  * Scale shape:
  *  - Edges are a first-class DataFrame `(src, dst)`; every derived
  *    quantity (degrees, node count, rank state) is declared against
  *    it, so Catalyst's exchange reuse materializes the edge shuffle
  *    ONCE per action even though 3 PageRank iterations + the degree
  *    table all consume it (spec-asserted via ReusedExchange).
  *  - Per iteration, the only NEW shuffle is the 16-byte
  *    `(dst, contrib)` aggregation and the narrow rank-state join —
  *    the edge table itself is never re-shuffled, which is the
  *    property that matters when edges are the 100 TB side.
  *  - The whole recurrence runs in scaled integer space (`r` is a
  *    long, divisions are integer `div`), so per-node sums are
  *    order-independent exact long adds: bit-reproducible on any
  *    partitioning, any engine — same trick as the two-round k-means
  *    (q82). Total mass shrinks by ≤ 1 ulp·N per iteration from the
  *    floors; ranking is unaffected.
  */
object Graph {

  /** Part-node id offset: customer node = c_custkey, part node =
    * PartBase + p_partkey. Keys are < 10^7 at every test SF; at 100 TB
    * a production caller would widen the offset or tag a (kind, key)
    * struct — the algebra below is offset-agnostic. */
  val PartBase = 10000000L

  /** Bipartite co-purchase edge table: one undirected customer↔part
    * edge per DISTINCT (customer, part) purchase pair, materialized as
    * two directed rows. The distinct is a projection-then-dedup on
    * 16-byte pairs — the full lineitem row never shuffles. */
  def purchaseEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cp = lineitem.select(col("l_orderkey"), col("l_partkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_partkey") + lit(PartBase)).as("p"))
      .distinct()
    cp.select(col("c").as("src"), col("p").as("dst"))
      .unionByName(cp.select(col("p").as("src"), col("c").as("dst")))
  }

  /** Per-node degree. On a symmetric edge table out-degree equals
    * in-degree equals distinct-neighbor count (edges are deduped). */
  def degrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
      .select(col("node"), col("degree"))

  /** Fold the symmetric-input precondition into the node-count scalar:
    * a dst-only node (present as a destination, absent from the
    * src-derived degree table) proves the edge table is directed, and
    * the symmetric recurrences would silently drop it and lose its
    * mass — so the count scalar raises instead. One extra 8-byte-row
    * anti-join per action, amortized over all iterations (the scalar
    * is a broadcast one-row aggregate consumed by every round). Also
    * asserts the count is positive: an empty edge table would
    * otherwise integer-divide by zero into all-null ranks (the
    * round-11 ADVICE null-contract item, made loud instead).
    */
  private def guardedCount(edges: DataFrame, deg: DataFrame, n: DataFrame,
      cnt: String, what: String): DataFrame = {
    val orphan = edges.select(col("dst").as("node"))
      .join(deg.select(col("node")), Seq("node"), "left_anti")
      .limit(1).agg(count(lit(1)).as("n_orphan"))
    n.crossJoin(broadcast(orphan)).select(
      (col(cnt) +
        coalesce(assert_true(col("n_orphan") === 0, lit(
          "symmetric edge table required (found a dst-only node): " +
            "use pageRankDirectedQ for directed graphs")).cast("long"), lit(0L)) +
        coalesce(assert_true(col(cnt) > 0, lit(s"empty $what"))
          .cast("long"), lit(0L))).as(cnt))
  }

  /** Fixed-iteration PageRank in scaled integer space.
    *
    * Recurrence (all integer ops, SCALE = `scale`):
    * {{{
    *   r0(v)   = SCALE div N
    *   c_i(v)  = r_i(v) div outdeg(v)            // per-edge contribution
    *   r_i+1(v)= (SCALE*15 div 100) div N + (85 * Σ_in c_i) div 100
    * }}}
    * Damping 0.85 as the exact rational 85/100. `N` is an in-plan
    * broadcast scalar (one-row aggregate), never a driver-side count.
    * The node set is the edge-endpoint set: on a symmetric graph every
    * node has outdeg ≥ 1, so no dangling-mass term is needed — and the
    * precondition is ENFORCED (a dst-only node raises through
    * [[guardedCount]] instead of silently dropping); the general
    * directed form with dangling redistribution is
    * [[pageRankDirectedQ]]. Degenerate-input contract: an empty edge
    * table yields an EMPTY result (no node rows exist, so the n=0
    * division is never evaluated — no null ranks); an empty SEED set in
    * the personalized variant, where non-empty node rows WOULD divide
    * by zero, raises through the guard instead.
    *
    * Returns `(node, degree, pr_q)` — one row per node, `pr_q` the
    * scaled integer rank after `iterations` rounds.
    */
  def pageRankQ(edges: DataFrame, iterations: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0)
    // Pin the edge table behind ONE explicit src-keyed exchange: every
    // round's contribution join and the degree aggregation consume this
    // exchange, so the (expensive at 100 TB) edge derivation runs once
    // and later consumers hit ReusedExchange. Without the pin, AQE's
    // small-side broadcast conversion leaves the edges side exchange-
    // free and re-executes the derivation once per round.
    val e = edges.repartition(col("src"))
    val deg = degrees(e)
    val n = guardedCount(e, deg,
      deg.agg(count(lit(1)).as("n_nodes")), "n_nodes", "edge table")
    val teleportNum = (scale * 15L) / 100L // exact: scale is a multiple of 100
    // Lineage discipline: each round's state is consumed by EXACTLY ONE
    // consumer (the contribution join); the next state is rebuilt from
    // the STATIC deg table, never by joining the previous state. With
    // state feeding two consumers per round (contributions AND the
    // carry-forward join), lazy replay recomputes early rounds
    // 2^iterations times — measured as 26 lineitem scans in the
    // 3-round executed plan before this restructure. Static inputs
    // (edges, deg, n) recur with identical subtrees, so their
    // exchanges materialize once and later rounds hit ReusedExchange
    // (spec-asserted).
    var state = deg.crossJoin(broadcast(n))
      .select(col("node"), col("degree"),
        expr(s"${scale}L div n_nodes").as("r"))
    for (_ <- 1 to iterations) {
      val contribs = state
        .join(e, state("node") === e("src"))
        .select(col("dst"), expr("r div degree").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      state = deg.join(contribs, col("node") === col("dst"), "left")
        .crossJoin(broadcast(n))
        .select(col("node"), col("degree"),
          (expr(s"${teleportNum}L div n_nodes") +
            expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
    }
    state.select(col("node"), col("degree"), col("r").as("pr_q"))
  }

  /** PageRank over a DIRECTED edge table — the general form
    * [[pageRankQ]]'s symmetric fast path refuses: the node set is built
    * from BOTH endpoints (a dst-only node is a legitimate sink, not a
    * dropped row) and the mass that sinks would swallow is
    * redistributed uniformly each round (the standard dangling-node
    * correction). The motivating graph is exactly the directed one the
    * reference manipulates — wiki `[[...]]` links
    * (process-mw-dump.py:198-211): pages link out; many pages are only
    * linked TO.
    *
    * Recurrence (all integer ops, SCALE = `scale`; dm_i = Σ r_i over
    * outdeg-0 nodes):
    * {{{
    *   r0(v)    = SCALE div N
    *   r_i+1(v) = (SCALE*15 div 100) div N
    *              + (85 * (Σ_in r_i(u) div outdeg(u)  +  dm_i div N)) div 100
    * }}}
    *
    * Scale/lineage shape: unlike the symmetric form, each round has TWO
    * consumers of the rank state (the contribution join and the
    * dangling-mass aggregate), so the one-consumer lazy-lineage
    * discipline cannot hold — instead every round's state is EAGERLY
    * materialized (`localCheckpoint`), which keeps replay linear and
    * the plan depth constant per round at the cost of one
    * O(nodes)-row materialization per iteration (the standard
    * Pregel/GraphX checkpoint discipline; on a cluster the same call
    * lands on executor-local storage). Per round the data moved is the
    * 16-byte (dst, contrib) aggregation plus one 8-byte dangling
    * scalar; the edge exchange is pinned once as in [[pageRankQ]].
    *
    * Returns `(node, outdeg, pr_q)` — one row per node (sinks
    * included), `pr_q` the scaled integer rank after `iterations`
    * rounds. An empty edge table yields an empty result (same
    * degenerate-input contract as [[pageRankQ]]).
    */
  def pageRankDirectedQ(edges: DataFrame, iterations: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0)
    val (e, base) = directedBase(edges)
    val state0 = base
      .select(col("node"), col("outdeg"),
        expr(s"${scale}L div n_nodes").as("r"))
    directedLoop(e, base, state0, iterations, scale)
  }

  /** WARM-START directed PageRank — resume the recurrence from stored
    * ranks instead of r0, the "index, don't recompute" move the
    * LSH/BM/IVF indexes already make: every ingest that appends
    * citation edges re-runs the full fixed point today; with ranks
    * persisted beside the cached edge table, the next run continues
    * from where the last one stood and spends its fixed round budget
    * CLOSING the (small) gap the new edges opened, not re-deriving
    * what was already known.
    *
    * Semantics: nodes present in `prior` start at their stored rank;
    * nodes the graph gained since start at the uniform SCALE div N
    * share (N = the CURRENT node count); prior rows for nodes no
    * longer in the graph are dropped by the join. Two exact
    * properties, both GraphSpec-pinned:
    *  - CONTINUATION: on an unchanged graph, resuming from a k1-round
    *    result for k2 rounds is bit-identical to running k1+k2 rounds
    *    cold — the recurrence has no memory beyond the rank vector.
    *  - CONVERGENCE ADVANTAGE: the recurrence contracts toward its
    *    unique fixpoint at factor 0.85/round REGARDLESS of the start
    *    vector, so a warm start is never worse than cold in the limit
    *    and strictly closer after equal rounds when the graph delta is
    *    small (pinned as an L1 bound vs a long-run reference).
    *
    * `prior`: (node, pr_q). Returns (node, outdeg, pr_q) as
    * [[pageRankDirectedQ]]. */
  def pageRankDirectedResumeQ(edges: DataFrame, iterations: Int,
      prior: DataFrame, scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0)
    val (e, base) = directedBase(edges)
    val state0 = base
      .join(prior.select(col("node"), col("pr_q").as("r_prior")),
        Seq("node"), "left")
      .select(col("node"), col("outdeg"),
        coalesce(col("r_prior"), expr(s"${scale}L div n_nodes")).as("r"))
    directedLoop(e, base, state0, iterations, scale)
  }

  /** Shared derivation for the directed family: the eagerly-pinned
    * src-keyed edge table and the static (node, outdeg, n_nodes) side.
    * Eager pins because every round ends in a localCheckpoint ACTION
    * and each action replans from scratch — without materializing
    * here, the edge scan + shuffle and the distinct + degree
    * aggregations re-execute once per round (ReusedExchange only
    * deduplicates within one plan, never across jobs). Blocks are
    * reaped by the ContextCleaner when the result frame is dropped. */
  private def directedBase(edges: DataFrame): (DataFrame, DataFrame) = {
    val e = edges.repartition(col("src")).localCheckpoint()
    val outd = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val deg = nodes.join(outd, Seq("node"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
    val n = nodes.agg(count(lit(1)).as("n_nodes")).select(
      (col("n_nodes") + coalesce(assert_true(col("n_nodes") > 0,
        lit("empty edge table")).cast("long"), lit(0L))).as("n_nodes"))
    (e, deg.crossJoin(broadcast(n)).localCheckpoint())
  }

  /** The dangling-corrected round loop (recurrence in the
    * [[pageRankDirectedQ]] scaladoc), eager per-round materialization
    * — each round's state has TWO consumers (contribution join +
    * dangling aggregate), so the one-consumer lazy-lineage discipline
    * cannot hold (the standard Pregel/GraphX checkpoint discipline). */
  private def directedLoop(e: DataFrame, base: DataFrame,
      state0: DataFrame, iterations: Int, scale: Long): DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    val teleportNum = (scale * 15L) / 100L
    var state = state0.localCheckpoint()
    for (_ <- 1 to iterations) {
      val contribs = state
        .join(e, state("node") === e("src"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val dang = state.filter(col("outdeg") === 0)
        .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
      val next = base.join(contribs, col("node") === col("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"), col("outdeg"),
          (expr(s"${teleportNum}L div n_nodes") +
            expr("(85 * (coalesce(s, 0L) + (dm div n_nodes))) div 100"))
            .as("r"))
        .localCheckpoint()
      // the superseded round's blocks are dead the moment the next
      // state is MATERIALIZED (localCheckpoint is eager) — release
      // them now instead of leaving them for the async ContextCleaner.
      // r20 optimization (guide §5, memory hygiene): checkpoint-loop
      // entries accumulate O(rounds) superseded block sets per run,
      // and in a long-lived session (the bench suite, a serving
      // process) that residue is exactly the block-store pressure the
      // CacheHygiene rule exists to prevent for persist().
      CheckpointBridge.unpinCheckpoint(state)
      state = next
    }
    // e and base are internal pins (directedBase) consumed only by the
    // rounds above; the returned frame reads the FINAL state's blocks
    // alone, so both are releasable here
    CheckpointBridge.unpinCheckpoint(e)
    CheckpointBridge.unpinCheckpoint(base)
    state.select(col("node"), col("outdeg"), col("r").as("pr_q"))
  }

  /** Personalized PageRank: the teleport mass lands ONLY on `seeds`
    * (uniformly), so rank measures proximity to the seed set — the
    * retrieval/recommendation-expansion form of [[pageRankQ]] (same
    * integer recurrence, same lineage discipline; the static
    * node-side table additionally carries an is_seed flag and the
    * seed count replaces N in the teleport term). Nodes unreachable
    * from the seeds within `iterations` hops stay at exactly 0 —
    * integer arithmetic, no float dust. */
  def personalizedPageRankQ(edges: DataFrame, seeds: DataFrame,
      iterations: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0)
    val e = edges.repartition(col("src"))
    val deg = degrees(e)
    val sd = seeds.select(col("node")).distinct()
    val n = guardedCount(e, deg,
      sd.agg(count(lit(1)).as("n_seeds")), "n_seeds", "seed set")
    val teleportNum = (scale * 15L) / 100L
    // static per-node side: (node, degree, is_seed, n_seeds) — rebuilt
    // INTO each round exactly like pageRankQ's deg (one consumer per
    // round for the rank state; statics reuse their exchanges)
    val base = deg
      .join(sd.withColumn("is_seed", lit(1L)), Seq("node"), "left")
      .withColumn("is_seed", coalesce(col("is_seed"), lit(0L)))
      .crossJoin(broadcast(n))
    var state = base.select(col("node"), col("degree"),
      (col("is_seed") * expr(s"${scale}L div n_seeds")).as("r"))
    for (_ <- 1 to iterations) {
      val contribs = state
        .join(e, state("node") === e("src"))
        .select(col("dst"), expr("r div degree").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      state = base.join(contribs, col("node") === col("dst"), "left")
        .select(col("node"), col("degree"),
          ((col("is_seed") * expr(s"${teleportNum}L div n_seeds")) +
            expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
    }
    state.select(col("node"), col("degree"), col("r").as("pr_q"))
  }

  /** Deterministic random walks: `steps` hops from each start node,
    * choosing at hop t the neighbor v of u minimizing
    * md5_64("t:u:v") — a content-derived uniform (the q57/q97 trick
    * applied to edges), so walks are a pure function of the graph:
    * reproducible across engines, partitionings, and reruns, and
    * DuckDB can replay every hop. The node2vec-style corpus move —
    * turning a graph into training sequences — without RNG state.
    *
    * Scale shape: the frontier is one row per walk; each hop joins it
    * against the src-keyed edge exchange (materialized once, reused
    * by every hop) and picks the argmin neighbor via a min-struct
    * aggregation — map-side combinable, so a hot node's candidate
    * rows collapse before the shuffle; the shuffle carries 24-byte
    * (walk, hash, dst) rows.
    *
    * Plan-depth bound: accumulating step t's frontier by union would
    * put frontier t t-deep in the final plan — quadratic PLAN size in
    * steps, fine for sequence windows of 3-10 hops but fatal for
    * node2vec-style 40-80-hop walkers. Every `materializeEvery` hops
    * the frontier AND the accumulator are therefore eagerly
    * materialized (`localCheckpoint` — the [[pageRankDirectedQ]]
    * checkpoint discipline), so the final plan holds at most
    * K(K+1)/2 hop-joins for K = `materializeEvery` — the accumulator
    * union repeats each in-segment frontier — regardless of `steps`
    * (GraphSpec-asserted), and replay work stays linear. The edge
    * table is pinned once up front (eager localCheckpoint), so every
    * segment's hop-joins read the materialized src-keyed blocks — no
    * per-segment re-derivation or re-shuffle of the edge side.
    *
    * `starts`: (walk_id, node). Returns (walk_id, step, node) for
    * step 0..steps. Nodes must have out-edges (always true on a
    * symmetric edge table). */
  def randomWalks(edges: DataFrame, starts: DataFrame,
      steps: Int, materializeEvery: Int = 8): DataFrame = {
    require(steps >= 0)
    require(materializeEvery > 0)
    // eager edge pin — see pageRankDirectedQ: within a checkpoint
    // segment the hop-joins share one plan (exchange reused), but each
    // SEGMENT is a fresh action that would re-derive and re-shuffle the
    // edges; the pin makes the segment cost a block-store read instead
    val e = edges.repartition(col("src")).localCheckpoint()
    var cur = starts.select(col("walk_id"), col("node"))
    var acc = cur.withColumn("step", lit(0))
    // previous segment's checkpoints: dead once the NEXT segment's
    // checkpoints materialize (localCheckpoint is eager) — released
    // deterministically instead of lingering for the ContextCleaner
    // (r20 optimization, guide §5; same discipline as directedLoop).
    // The FINAL segment's checkpoints stay pinned: the returned frame
    // is lazy and reads them (and e) when the caller acts.
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    var prevCur: Option[DataFrame] = None
    var prevAcc: Option[DataFrame] = None
    for (t <- 1 to steps) {
      cur = cur.join(e, col("node") === col("src"))
        .select(col("walk_id"),
          graft.functions.Md5_64.md5_64(
            concat_ws(":", lit(t), col("node"), col("dst"))).as("h"),
          col("dst"))
        .groupBy(col("walk_id"))
        .agg(min(struct(col("h"), col("dst"))).as("m"))
        .select(col("walk_id"), col("m.dst").as("node"))
      acc = acc.unionByName(cur.withColumn("step", lit(t)))
      if (t % materializeEvery == 0 && t < steps) {
        cur = cur.localCheckpoint()
        acc = acc.localCheckpoint()
        prevCur.foreach(CheckpointBridge.unpinCheckpoint)
        prevAcc.foreach(CheckpointBridge.unpinCheckpoint)
        prevCur = Some(cur)
        prevAcc = Some(acc)
      }
    }
    acc.select(col("walk_id"), col("step"), col("node"))
  }

  /** Corpus-native DIRECTED citation graph, derived from document
    * content the way a wiki link graph is derived from `[[...]]`
    * markup (reference `process-mw-dump.py:198-211`): document A
    * "cites" document B when they share a RARE n-gram (document
    * frequency in [dfMin, dfMax]) and A has the higher id — newer
    * documents cite earlier ones, so low-id documents that never
    * reuse anyone else's rare phrasing are genuine SINKS (outdeg 0),
    * the dangling-node shape [[pageRankDirectedQ]] exists to handle.
    *
    * Scale shape — the q31 inverted-index discipline: one shuffle of
    * DISTINCT (doc, shingle) postings, a df aggregation, and a
    * postings self-join restricted to terms with df ≤ dfMax, so
    * per-term pair generation is bounded at C(dfMax, 2) — never
    * all-pairs, never head-term quadratic (the df cap IS the
    * stop-word cut). Only 16-byte (src, dst) pairs survive the join.
    *
    * Returns distinct `(src, dst)` with src > dst. */
  def citationEdges(docs: DataFrame, n: Int, dfMin: Long,
      dfMax: Long): DataFrame =
    citationEdgesWeighted(docs, n, dfMin, dfMax)
      .select(col("src"), col("dst"))

  /** The shared rare-term posting derivation behind [[citationEdges]],
    * [[citationEdgesWeighted]], and [[anchorTerms]] — ONE definition
    * (the Scala twin of the oracle side's shared `citationPostCtes`):
    * distinct (doc_id, term) postings restricted to terms with df in
    * [dfMin, dfMax]. */
  private def ratedPostings(docs: DataFrame, n: Int, dfMin: Long,
      dfMax: Long): DataFrame = {
    require(n >= 1 && dfMin >= 2 && dfMax >= dfMin)
    val post = allPostings(docs, n)
    val rare = post.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(dfMin, dfMax))
      .select(col("term"))
    post.join(rare, Seq("term"))
  }

  /** The unfiltered distinct (doc_id, term) n-gram postings the band
    * filter restricts — shared with [[CitationIndex]], whose
    * incremental maintenance needs postings BEFORE the df cut (a term
    * below dfMin today may enter the band tomorrow). One tokenization
    * definition, as with the oracle's shared CTEs. */
  private[scale] def allPostings(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(Dedup.shingles(col("w"), n)).as("term"))
      .distinct()

  /** [[citationEdges]] keeping the link MULTIPLICITY: `w` = how many
    * distinct rare n-grams the pair shares — the natural edge weight
    * (two docs sharing 12 rare phrasings are more strongly linked than
    * two sharing 1), consumed by [[pageRankWeightedQ]]. The unweighted
    * form is this projection minus `w`; deriving both from one pass
    * (and one cached table) is why the weighted form is primary. */
  def citationEdgesWeighted(docs: DataFrame, n: Int, dfMin: Long,
      dfMax: Long): DataFrame = {
    val rp = ratedPostings(docs, n, dfMin, dfMax)
    rp.as("a").join(rp.as("b"),
        col("a.term") === col("b.term") &&
          col("a.doc_id") > col("b.doc_id"))
      .groupBy(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** WEIGHTED directed PageRank — [[pageRankDirectedQ]] with each
    * source's rank split proportionally to edge weight instead of
    * uniformly: contrib(u→v) = (r(u) · w(u,v)) div sw(u) for sw =
    * Σ out-weights, the form link multiplicity calls for (a doc citing
    * another through 12 shared rare phrasings passes 12× the mass of a
    * single shared phrase). Same node-set/dangling-mass/eager-
    * checkpoint discipline as the unweighted directed form; the
    * integer recurrence floors per EDGE (the oracle replays the same
    * per-edge floor, so sums match exactly). r·w stays far inside
    * Int64 — r ≤ scale (1e12 default) and w is a shared-term count.
    *
    * `edges`: (src, dst, w) with w ≥ 1. Returns (node, sw, pr_q). */
  def pageRankWeightedQ(edges: DataFrame, iterations: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0)
    // eager edge pin — see pageRankDirectedQ
    val e = edges.repartition(col("src")).localCheckpoint()
    val outw = e.groupBy(col("src").as("node"))
      .agg(sum(col("w")).as("sw"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val deg = nodes.join(outw, Seq("node"), "left")
      .select(col("node"), coalesce(col("sw"), lit(0L)).as("sw"))
    val n = nodes.agg(count(lit(1)).as("n_nodes")).select(
      (col("n_nodes") + coalesce(assert_true(col("n_nodes") > 0,
        lit("empty edge table")).cast("long"), lit(0L))).as("n_nodes"))
    val teleportNum = (scale * 15L) / 100L
    // static node-side pin — see pageRankDirectedQ
    val base = deg.crossJoin(broadcast(n)).localCheckpoint()
    var state = base
      .select(col("node"), col("sw"),
        expr(s"${scale}L div n_nodes").as("r"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contribs = state
        .join(e, state("node") === e("src"))
        .select(col("dst"), expr("(r * w) div sw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val dang = state.filter(col("sw") === 0)
        .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
      state = base.join(contribs, col("node") === col("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"), col("sw"),
          (expr(s"${teleportNum}L div n_nodes") +
            expr("(85 * (coalesce(s, 0L) + (dm div n_nodes))) div 100"))
            .as("r"))
        .localCheckpoint()
    }
    state.select(col("node"), col("sw"), col("r").as("pr_q"))
  }

  /** HITS hubs-and-authorities over a directed edge table — the
    * complementary ranking to PageRank for citation structure: an
    * AUTHORITY is cited by good hubs, a HUB cites good authorities
    * (Kleinberg 1999). Each round: a(v) = Σ_in h(u), h(u) = Σ_out
    * a(v), each half rescaled to `scale` by its max (the standard
    * normalization, done with an in-plan broadcast max scalar — no
    * driver round-trip). All-integer: the rescale is (x·scale) div
    * max, so ranks are bit-reproducible and an external engine unrolls
    * the recurrence exactly.
    *
    * Overflow contract: x ≤ N·scale before the rescale, so N·scale²
    * must stay under 2^63 — at the default scale 10^6 that is ~9×10^6
    * nodes; a larger graph lowers `scale` (rank resolution trades off
    * against node count, stated not hidden).
    *
    * Same eager per-round materialization as [[pageRankDirectedQ]]
    * (two consumers per half-round: the propagation join and the max
    * aggregate). Returns (node, auth_q, hub_q). */
  def hitsQ(edges: DataFrame, iterations: Int,
      scale: Long = 1000000L): DataFrame = {
    require(iterations >= 0)
    // eager edge pin — see pageRankDirectedQ (here each ITERATION runs
    // two checkpoint actions, both consuming the edge table)
    val e = edges.select(col("src"), col("dst")).repartition(col("src"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var state = nodes
      .select(col("node"), lit(scale).as("a"), lit(scale).as("h"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val aRaw = state.join(e, state("node") === e("src"))
        .select(col("dst"), col("h"))
        .groupBy(col("dst")).agg(sum(col("h")).as("ar"))
      val am = aRaw.agg(max(col("ar")).as("am"))
      val aNew = state.select(col("node"), col("h"))
        .join(aRaw, col("node") === col("dst"), "left")
        .crossJoin(broadcast(am))
        .select(col("node"),
          expr(s"(coalesce(ar, 0L) * ${scale}L) div am").as("a"),
          col("h"))
        .localCheckpoint()
      val hRaw = aNew.join(e, aNew("node") === e("dst"))
        .select(col("src"), col("a"))
        .groupBy(col("src")).agg(sum(col("a")).as("hr"))
      val hm = hRaw.agg(max(col("hr")).as("hm"))
      state = aNew.select(col("node"), col("a"))
        .join(hRaw, col("node") === col("src"), "left")
        .crossJoin(broadcast(hm))
        .select(col("node"), col("a"),
          expr(s"(coalesce(hr, 0L) * ${scale}L) div hm").as("h"))
        .localCheckpoint()
    }
    state.select(col("node"), col("a").as("auth_q"), col("h").as("hub_q"))
  }

  /** k-core membership via FIXED-ROUND peeling: each round recomputes
    * degrees on the surviving subgraph and drops nodes below `k` —
    * after enough rounds the survivor set is exactly the k-core (the
    * maximal subgraph of minimum degree ≥ k), the densest-region
    * extraction run before expensive per-community work. A fixed
    * `rounds` budget (not a convergence loop) keeps the computation a
    * pure data function an external engine replays round-for-round;
    * callers check convergence by comparing rounds R-1 and R (the
    * KCore spec pins fixpoint on the gate corpus). Peeling rounds
    * needed grow with the graph's degeneracy ordering depth, not its
    * size — single digits on real link graphs at any scale.
    *
    * Scale shape: per round two semi-joins of the static edge table
    * against the shrinking alive set (node-keyed, broadcastable once
    * the core stabilizes) + one degree aggregation; the edge table
    * never re-derives ([[pageRankDirectedQ]]'s eager per-round
    * materialization bounds replay).
    *
    * `edges`: distinct (src, dst), src > dst. Returns (node, core_deg)
    * for survivors of round `rounds`, core_deg the within-subgraph
    * degree that passed the final ≥ k filter. */
  def kCoreQ(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    // eager edge pin — see pageRankDirectedQ
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .repartition(col("u"))
      .localCheckpoint()
    var alive = und.select(col("u").as("node")).distinct()
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      alive = und
        .join(alive.select(col("node").as("u")), "u")
        .join(alive.select(col("node").as("v")), "v")
        .groupBy(col("u").as("node")).agg(count(lit(1)).as("core_deg"))
        .filter(col("core_deg") >= k)
        .localCheckpoint()
    }
    alive.select(col("node"), col("core_deg"))
  }

  /** Multi-source BFS: exact hop distance from a seed set, bounded at
    * `rounds` hops — the reachability/proximity primitive the rank
    * family doesn't give (PageRank mixes distance with multiplicity;
    * BFS answers "how many hops from a trusted doc is this one", the
    * seed-proximity feature quality-propagation pipelines consume, and
    * the frontier algebra every Pregel-style traversal shares).
    *
    * Frontier discipline — the property that matters at 100 TB: each
    * round joins ONLY the newly-settled frontier (nodes first reached
    * at hop t-1) against the src-keyed edge exchange, never the full
    * settled set, so a round's work is proportional to the frontier's
    * out-edges; the settled set is touched once per round by a
    * node-keyed left-anti (16-byte rows). Frontier and settled are
    * eagerly materialized per round (`localCheckpoint` — the
    * [[pageRankDirectedQ]] checkpoint discipline: both feed two
    * consumers), keeping plan depth constant in `rounds`.
    *
    * Fixed `rounds`, not a convergence loop (the [[kCoreQ]] contract):
    * the result is a pure data function DuckDB replays as a
    * depth-bounded recursive CTE. Seeds need not be graph nodes —
    * an isolated seed settles at distance 0 and propagates nothing.
    *
    * `edges`: directed (src, dst) — pass the symmetrized table for
    * undirected distance. `seeds`: (node). Returns (node, dist) for
    * every node within `rounds` hops of a seed. */
  def bfsDistancesQ(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 0)
    // eager edge pin — see pageRankDirectedQ
    val e = edges.select(col("src"), col("dst")).repartition(col("src"))
      .localCheckpoint()
    var settled = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = settled.select(col("node"))
    for (t <- 1 to rounds) {
      val newly = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(settled.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(t.toLong))
        .localCheckpoint()
      settled = settled.unionByName(newly).localCheckpoint()
      frontier = newly.select(col("node"))
    }
    settled.select(col("node"), col("dist"))
  }

  /** Anchor-term profile: for every CITED document, which shared rare
    * terms its citers reached it through, with citer multiplicity —
    * the link-graph analog of web anchor-text aggregation ("what do
    * documents that link here say about this page"), the retrieval
    * enrichment signal built from the same derivation as
    * [[citationEdgesWeighted]] but keeping the TERM instead of
    * collapsing it into an edge weight.
    *
    * Scale shape — identical to the citation derivation (one distinct-
    * postings shuffle, df-capped self-join bounded at C(dfMax, 2) rows
    * per term); the profile aggregation groups the surviving
    * (dst, term) pairs, so its shuffle is collision-proportional too.
    *
    * Returns (dst, term, n_src) — `n_src` = citing documents sharing
    * `term` with dst. */
  def anchorTerms(docs: DataFrame, n: Int, dfMin: Long,
      dfMax: Long): DataFrame = {
    val rp = ratedPostings(docs, n, dfMin, dfMax)
    rp.as("a").join(rp.as("b"),
        col("a.term") === col("b.term") &&
          col("a.doc_id") > col("b.doc_id"))
      .groupBy(col("b.doc_id").as("dst"), col("a.term").as("term"))
      .agg(count(lit(1)).as("n_src"))
  }

  /** Seeded label propagation, fixed rounds — the community-refinement
    * step between [[bfsDistancesQ]] (pure reachability) and connected
    * components (coarsest partition): seeds carry pinned labels; each
    * round every node adjacent to a labeled node adopts the MAJORITY
    * label of its labeled neighbors (ties → smallest label), seeds
    * never change. Deterministic and all-integer, so an external
    * engine replays every round; the argmax is a min-struct over
    * (-count, label) — map-side combinable, the [[randomWalks]]
    * argmin trick with votes instead of hashes.
    *
    * Label monotonicity keeps the recurrence simple: a labeled
    * neighbor stays labeled, so every node labeled in round t-1 gets a
    * majority row in round t — the round-t label set is exactly
    * seeds ∪ (round-t majorities of non-seeds), no carry-forward join.
    *
    * Per round: one (dst, label) vote shuffle + the argmax + a
    * node-keyed anti-join against the (small, broadcastable) seed set;
    * eager per-round materialization (the [[pageRankDirectedQ]]
    * discipline — votes and the next state both consume the label
    * table).
    *
    * `edges`: symmetric (src, dst). `seeds`: (node, label). Returns
    * (node, label) for every node labeled after `rounds` rounds. */
  def labelPropagationQ(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 0)
    // eager edge pin — see pageRankDirectedQ
    val e = edges.select(col("src"), col("dst")).repartition(col("src"))
      .localCheckpoint()
    val sd = seeds.select(col("node"), col("label")).distinct()
      .localCheckpoint()
    var lab = sd
    for (_ <- 1 to rounds) {
      val pick = lab.join(e, lab("node") === e("src"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("dst").as("node"), col("m.l").as("label"))
      lab = sd.unionByName(
          pick.join(sd.select(col("node")), Seq("node"), "left_anti"))
        .localCheckpoint()
    }
    lab.select(col("node"), col("label"))
  }

  /** UNSEEDED modularity communities — fixed-round synchronous
    * Louvain-style local moves in INTEGER modularity-gain space: the
    * unsupervised complement to connected components (one blob per
    * connected region) and [[labelPropagationQ]] (needs a seed set) —
    * the "topic islands" sweep corpus curation wants with no labels at
    * hand.
    *
    * Each node starts in its own community. Per round, node i
    * considers every community c among its neighbors plus its own:
    * the classic Louvain gain comparison ΔQ(i→c) ∝ k_ic − k_i·Σ'_c/2m
    * is lifted to exact integers as
    * {{{ gain(i,c) = 2m·k_ic − k_i·Σ'_c }}}
    * where k_ic = links from i into c, Σ'_c = total degree of c's
    * members (minus k_i when c is i's current community — the standard
    * self-exclusion), 2m = symmetric edge-row count. Argmax with
    * deterministic ties (gain desc, community id asc, via the
    * min-struct trick), so an external engine replays every round.
    *
    * Synchronous moves oscillate on symmetric structures (tied gains
    * let two nodes chase each other's communities forever — the known
    * failure of parallel Louvain; a parity checkerboard still
    * oscillates when the symmetric pair shares parity). The schedule
    * here is LABEL-MONOTONE DESCENT: a node may only move to a
    * community whose label is ≤ its current one, gains deciding among
    * those. Every node's label is then non-increasing over a bounded
    * domain, so a fixpoint exists, extra rounds are no-ops at it
    * (GraphSpec-pinned), and oscillation is impossible BY CONSTRUCTION
    * — the min-label convention connected components already uses,
    * with modularity gain deciding whether a smaller-labeled merge is
    * worth taking at all (the bridge edge between two dense blocks
    * loses to staying, so blocks separate — also pinned).
    *
    * Overflow contract (the q125 integer-lift discipline): gains are
    * exact in signed 64-bit iff 2m < isqrt(2^63) ≈ 3.03e9 symmetric
    * edge rows (|gain| ≤ (2m)²); the require below makes the bound
    * loud. Beyond it, rescale degrees or lift to DecimalType — the
    * comparison algebra is unchanged.
    *
    * Scale shape: per round, one (node, community) vote shuffle
    * (k_ic), one community-degree aggregate (≤ nodes rows, shrinking
    * as communities merge), the argmax, and a node-keyed relabel —
    * all 16-byte rows; the symmetric edge table is pinned once and
    * re-read (the [[pageRankDirectedQ]] eager-checkpoint discipline,
    * because every round's action replans the chain).
    *
    * `edges`: distinct (src, dst), one row per undirected edge (the
    * [[citationEdges]] contract). Returns (node, comm). */
  def modularityCommunitiesQ(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0)
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .withColumn("wt", lit(1L))
      .repartition(col("u")).localCheckpoint()
    val lab = localMoveWeighted(und, rounds).select(col("node"), col("comm"))
    // the returned labels are materialized — the edge pin is dead
    org.apache.spark.sql.graftbridge.CheckpointBridge.unpinCheckpoint(und)
    lab
  }

  /** WARM-START modularity communities — the community-sweep twin of
    * [[pageRankDirectedResumeQ]]'s "index, don't recompute" move:
    * resume the local-move descent from STORED labels (yesterday's
    * sweep over yesterday's graph) instead of the identity labeling.
    * Known nodes re-enter the vote at the community they had settled
    * into; appended nodes enter at self (exactly where a cold start
    * would put them); degrees, community degrees, and 2m are all
    * re-derived from TODAY'S edges, so every gain is evaluated against
    * current structure — the prior only shortens the descent, it never
    * freezes stale decisions (a label that stopped paying re-loses its
    * members on the first warm round). The round budget then closes
    * the delta the new edges opened rather than re-walking the whole
    * descent from singleton communities (GraphSpec pins the
    * convergence advantage on a small-delta append; the q153 oracle
    * replays both phases verbatim).
    *
    * Caveat (same as the PageRank resume): labels must come from the
    * SAME monotone-descent family (label values ≤ node ids), which
    * every sweep in this object produces. */
  def modularityCommunitiesResumeQ(edges: DataFrame, rounds: Int,
      prior: DataFrame): DataFrame = {
    require(rounds >= 0)
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .withColumn("wt", lit(1L))
      .repartition(col("u")).localCheckpoint()
    val lab = localMoveWeighted(und, rounds, Some(prior))
      .select(col("node"), col("comm"))
    org.apache.spark.sql.graftbridge.CheckpointBridge.unpinCheckpoint(und)
    lab
  }

  /** The weighted local-move phase shared by [[modularityCommunitiesQ]]
    * (all weights 1 — identical integer values, so q135's oracle is
    * unchanged by construction) and the multilevel form (coarsened
    * supernodes carry edge weights and self-loops). `w`: symmetric
    * (u, v, wt) rows, self rows (u == v) allowed — in the symmetric
    * representation an internal edge contributes its weight in both
    * directions, so the standard doubled self-loop convention is
    * automatic after [[coarsenWeighted]]. k_i = Σ incident wt (self
    * rows once), 2m = Σ all wt; k_ic EXCLUDES self rows (links from i
    * to c\{i} — the standard Louvain self-exclusion, paired with the
    * Σ'_c − k_i adjustment). */
  private def localMoveWeighted(w: DataFrame, rounds: Int,
      prior: Option[DataFrame] = None): DataFrame = {
    val deg = w.groupBy(col("u").as("node")).agg(sum(col("wt")).as("k"))
      .localCheckpoint()
    val twoM = w.agg(sum(col("wt"))).collect()(0).getLong(0)
    require(twoM < 3037000499L,
      s"2m = $twoM total edge weight overflows the exact integer gain " +
        "(|gain| <= (2m)^2 must fit signed 64-bit): rescale weights or " +
        "lift the gain algebra to DecimalType")
    // warm start: known nodes resume at their stored community, new
    // nodes enter at self — the cold path is prior = None (identity)
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    var lab = (prior match {
      case Some(p) =>
        deg.select(col("node"))
          .join(p.select(col("node"), col("comm")), Seq("node"), "left")
          .select(col("node"), coalesce(col("comm"), col("node")).as("comm"))
      case None => deg.select(col("node"), col("node").as("comm"))
    }).localCheckpoint()
    for (_ <- 1 to rounds) {
      val sigma = lab.join(deg, "node")
        .groupBy(col("comm").as("cand")).agg(sum(col("k")).as("sigma"))
      val kic = w.filter(col("u") =!= col("v"))
        .join(lab.select(col("node").as("v"), col("comm").as("cand")), "v")
        .groupBy(col("u").as("node"), col("cand"))
        .agg(sum(col("wt")).as("kic"))
      // candidates = neighbor communities with label ≤ the node's own
      // (the monotone-descent schedule) plus the current community
      // itself (k_ic = 0 when no neighbor shares it; max() reconciles
      // the 0-row with a real count when both exist)
      val stay = lab.select(col("node"), col("comm").as("cand"),
        lit(0L).as("kic"))
      val cand = kic
        .join(lab, "node")
        .filter(col("cand") <= col("comm"))
        .select(col("node"), col("cand"), col("kic"))
        .unionByName(stay)
        .groupBy(col("node"), col("cand")).agg(max(col("kic")).as("kic"))
      val pick = cand
        .join(deg, "node")
        .join(lab, "node")
        .join(sigma, "cand")
        .withColumn("sig_adj", col("sigma") -
          when(col("cand") === col("comm"), col("k")).otherwise(lit(0L)))
        .withColumn("gain",
          lit(twoM) * col("kic") - col("k") * col("sig_adj"))
        .groupBy(col("node"))
        .agg(min(struct((-col("gain")).as("ng"), col("cand").as("c")))
          .as("m"))
        .select(col("node"), col("m.c").as("comm"))
      val next = pick.localCheckpoint()
      // superseded round's label blocks: dead once `next` materialized
      // (r20 optimization, guide §5 — the directedLoop discipline)
      CheckpointBridge.unpinCheckpoint(lab)
      lab = next
    }
    // deg is an internal pin consumed only by the rounds above; the
    // returned (checkpointed) labels read their own blocks alone
    CheckpointBridge.unpinCheckpoint(deg)
    lab
  }

  /** Louvain phase 2 — contract each community to a supernode: map
    * both endpoints through the labels and sum weights per (cu, cv)
    * pair. In the symmetric representation an internal edge's two
    * directed rows both land on (c, c), so the contracted self-loop
    * automatically carries DOUBLE the internal weight — exactly the
    * convention that preserves every node's weighted degree
    * (deg(c) = Σ member degrees) and the global 2m, which is what
    * keeps the gain algebra valid across levels. */
  private def coarsenWeighted(w: DataFrame, lab: DataFrame): DataFrame =
    w.join(lab.select(col("node").as("u"), col("comm").as("cu")), "u")
      .join(lab.select(col("node").as("v"), col("comm").as("cv")), "v")
      .groupBy(col("cu").as("u"), col("cv").as("v"))
      .agg(sum(col("wt")).as("wt"))

  /** MULTILEVEL modularity communities — the full Louvain loop:
    * local-move rounds, contract communities to supernodes
    * ([[coarsenWeighted]]), repeat on the coarsened weighted graph,
    * and compose the level maps back onto the original nodes. Level 1
    * merges nodes into small dense cores; higher levels merge CORES
    * whose inter-core weight justifies it — the "communities of
    * communities" a single local-move pass cannot reach (each level's
    * candidate set is one supernode hop, so structures wider than a
    * hop need the contraction to bring them adjacent). Same
    * determinism story as [[modularityCommunitiesQ]]: integer gains,
    * monotone-descent schedule per level (labels are supernode ids —
    * community ids from the previous level), every level
    * oracle-replayable. Scale: each level's graph is no larger than
    * the previous (Σ wt preserved, nodes strictly fewer or equal);
    * the level-1 shuffles dominate.
    *
    * Returns (node, comm) over the ORIGINAL nodes. */
  def modularityCommunitiesMultilevelQ(edges: DataFrame, rounds: Int,
      levels: Int): DataFrame = {
    val (assign, labels) =
      modularityCommunitiesMultilevelLevelsQ(edges, rounds, levels)
    // this entry point discards the per-level label maps (the Levels
    // variant exists for warm-start callers) — their blocks are dead
    // (the composed assign is materialized and self-contained)
    labels.foreach(
      org.apache.spark.sql.graftbridge.CheckpointBridge.unpinCheckpoint)
    assign
  }

  /** The multilevel sweep ALSO returning its per-level label maps —
    * what a warm-start cache stores. `levelLabels(l)` maps level-l
    * node ids (original nodes at l = 0, the previous level's
    * community ids above) to that level's communities; feeding them
    * back through [[modularityCommunitiesMultilevelResumeQ]] resumes
    * the whole descent. */
  def modularityCommunitiesMultilevelLevelsQ(edges: DataFrame, rounds: Int,
      levels: Int): (DataFrame, Seq[DataFrame]) =
    runMultilevel(edges, rounds, levels, None)

  /** WARM-START the MULTILEVEL descent (round-14 verdict item 8 —
    * q153's resume only warmed the single-level sweep; the multilevel
    * loop restarted every level from identity labels): each level's
    * local moves resume from the CACHED label map of yesterday's
    * sweep at that level. Level l's node ids are level l−1's
    * community ids — min-member labels, so an UNCHANGED community
    * keeps its id across days and its stored level-(l+1) label
    * applies verbatim, while a community whose id drifted (min member
    * left, merge, split) misses the prior left-join and enters at
    * self exactly like a cold start. Degrees, community degrees, and
    * 2m re-derive from TODAY'S (coarsened) graphs at every level, so
    * the priors only shorten each level's descent, never freeze stale
    * merges — the same contract as [[modularityCommunitiesResumeQ]],
    * applied per level. GraphSpec pins replay-exactness at rounds = 0
    * and the strictly-fewer-warm-rounds advantage on a small-delta
    * append; the q178 oracle replays both phases verbatim. */
  def modularityCommunitiesMultilevelResumeQ(edges: DataFrame, rounds: Int,
      levels: Int, priors: Seq[DataFrame]): DataFrame = {
    require(priors.length == levels,
      s"need one prior label map per level: got ${priors.length} for $levels")
    runMultilevel(edges, rounds, levels, Some(priors))._1
  }

  private def runMultilevel(edges: DataFrame, rounds: Int, levels: Int,
      priors: Option[Seq[DataFrame]]): (DataFrame, Seq[DataFrame]) = {
    require(levels >= 1)
    var w = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .withColumn("wt", lit(1L))
      .repartition(col("u")).localCheckpoint()
    // assign: original node -> current community (composed per level)
    var assign = w.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("comm")).localCheckpoint()
    val levelLabels = Seq.newBuilder[DataFrame]
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    for (l <- 0 until levels) {
      val lab = localMoveWeighted(w, rounds, priors.map(_(l)))
      levelLabels += lab
      val nextAssign = assign
        .join(lab.select(col("node").as("comm"), col("comm").as("next")),
          "comm")
        .select(col("node"), col("next").as("comm"))
        .localCheckpoint()
      val nextW = coarsenWeighted(w, lab).repartition(col("u"))
        .localCheckpoint()
      // both successors are materialized — the superseded level's
      // blocks are dead (r20 optimization, guide §5; the directedLoop
      // discipline). The per-level LABEL maps stay pinned: they are
      // returned (the warm-start cache stores them).
      CheckpointBridge.unpinCheckpoint(assign)
      CheckpointBridge.unpinCheckpoint(w)
      assign = nextAssign
      w = nextW
    }
    // the last coarsened graph is internal — only assign + labels leave
    CheckpointBridge.unpinCheckpoint(w)
    (assign.select(col("node"), col("comm")), levelLabels.result())
  }

  /** Per-node triangle counts via DEGREE-ORDERED edge orientation —
    * the clustering-structure profile (communities vs star hubs) run
    * on link graphs before sampling or pruning decisions.
    *
    * Every undirected edge is oriented from its lower-(degree, id)
    * endpoint to its higher one; each triangle then appears EXACTLY
    * once as two out-edges of its lowest-rank corner plus the oriented
    * closing edge, so counting is one self-join on the wedge corner +
    * one equi-join to close — and the classic bound applies: out-degree
    * in the oriented graph is O(√E), so wedge generation is O(E^1.5)
    * TOTAL regardless of hub skew (a star's center has huge degree but
    * rank-max, so it generates NO wedges — they distribute across its
    * low-degree leaves). Naive id-ordering would put a low-id hub's
    * whole neighborhood² through the join; degree-ordering is the
    * difference between a web-scale graph finishing or not.
    *
    * `edges`: distinct (src, dst), src > dst, one row per undirected
    * edge (the [[citationEdges]] contract). Returns (node, tri_cnt)
    * for every node in ≥1 triangle. All joins are on node ids; the
    * only state is the edge table plus its degree projection. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
    val deg = und.groupBy(col("u").as("node")).agg(count(lit(1)).as("dg"))
    // oriented edge a→b with rank(a) < rank(b), rank = (degree, id);
    // rb rides along so wedge pairs canonicalize in the SAME order the
    // orientation uses (the closing edge is then a single equi-join)
    val g = und
      .join(deg.select(col("node").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("dg").as("dv")), "v")
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u").as("a"), col("v").as("b"),
        struct(col("dv"), col("v")).as("rb"))
    val wedge = g.as("x").join(g.as("y"),
        col("x.a") === col("y.a") && col("x.rb") < col("y.rb"))
      .select(col("x.a").as("ta"), col("x.b").as("tb"), col("y.b").as("tc"))
    val tri = wedge.join(
      g.select(col("a").as("tb"), col("b").as("tc")), Seq("tb", "tc"))
    tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt"))
  }
}
