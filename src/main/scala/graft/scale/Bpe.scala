package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair encoding) merge training — the iterative
  * driver around the pair-counting step that q75 pins against its
  * oracle. Learns `numMerges` merge rules from a corpus, then tokenizes
  * text with them.
  *
  * Scale shape per round (the shape that makes BPE tractable at
  * 100 TB): the corpus is reduced ONCE to a (word, freq) vocabulary —
  * after that every round runs on the vocabulary only, orders of
  * magnitude smaller than the corpus. A round counts adjacent symbol
  * pairs weighted by word frequency (one shuffle on pair keys),
  * collects exactly one row (the argmax pair — control-plane), and
  * rewrites the vocabulary's symbol sequences with the merge applied
  * (a narrow map). The learned merge list is k rows of driver state,
  * exactly like the k-means centroid matrix.
  */
object Bpe {

  final case class Result(
      merges: Seq[(String, String)], // in application order
      vocab: DataFrame) // (word, freq, symbols after all merges)

  /** One merge pass over a symbol sequence (greedy left-to-right, the
    * standard BPE application order). */
  private[scale] def applyMerge(symbols: Seq[String], a: String,
      b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < symbols.length) {
      if (i + 1 < symbols.length && symbols(i) == a && symbols(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += symbols(i); i += 1 }
    }
    out.toSeq
  }

  def train(docs: DataFrame, numMerges: Int,
      minPairCount: Long = 2L): Result = {
    val spark = docs.sparkSession
    import spark.implicits._

    // corpus → vocabulary, once; symbols start as single characters
    var vocab = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        split(col("word"), "").as("symbols"))
      .as[(String, Long, Seq[String])]
      .cache()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var exhausted = false
    var vocabCheckpointed = false
    while (rounds < numMerges && !exhausted) {
      // count adjacent symbol pairs weighted by word frequency;
      // deterministic argmax (count desc, then pair asc)
      val top = vocab.toDF("word", "freq", "symbols")
        // single-symbol words have no pairs (and sequence(0,-1) would
        // DESCEND into negative indexes)
        .filter(size(col("symbols")) >= 2)
        .select(col("freq"),
          explode(expr(
            "transform(sequence(0, size(symbols) - 2), " +
              "i -> struct(symbols[i] AS a, symbols[i + 1] AS b))")).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case Some((a, b, cnt)) if cnt >= minPairCount =>
          merges += ((a, b))
          val mapped = vocab.map { case (w, f, syms) =>
            (w, f, applyMerge(syms, a, b))
          }
          // cache bounds RECOMPUTE but not the logical plan, which
          // would otherwise nest one map layer per round — O(R²)
          // analysis and a driver StackOverflow at production
          // numMerges. Truncate lineage periodically, releasing the
          // superseded checkpoint like the other iterative loops do.
          val checkpointRound = (rounds + 1) % 16 == 0
          val applied =
            if (checkpointRound) mapped.localCheckpoint() // eager
            else { val c = mapped.cache(); c.count(); c }
          if (vocabCheckpointed)
            org.apache.spark.sql.graftbridge.CheckpointBridge
              .unpinCheckpoint(vocab.toDF())
          else vocab.unpersist()
          vocabCheckpointed = checkpointRound
          vocab = applied
          rounds += 1
        case _ => exhausted = true
      }
    }
    Result(merges.toSeq, vocab.toDF("word", "freq", "symbols"))
  }

  /** Tokenize a text column with a learned merge list: per-row
    * character split + the merges replayed in order. Pure per-row UDF
    * (the merge list broadcasts with the closure) — no shuffle. */
  def tokenize(text: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val tokUdf = udf { (s: String) =>
      if (s == null) Seq.empty[String]
      // filter the empties java's split keeps for consecutive/leading
      // spaces — train() never saw "" (length >= 1 filter), so emitting
      // it would produce tokens outside the learned vocabulary
      else s.split(" ").toSeq.filter(_.nonEmpty).flatMap { w =>
        var syms: Seq[String] = w.split("").toSeq
        merges.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
        syms
      }
    }
    tokUdf(text)
  }
}
