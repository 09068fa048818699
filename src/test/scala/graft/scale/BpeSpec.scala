package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("learns the classic merges on a toy corpus, in frequency order") {
    // "low" x5, "lower" x2, "newest" x6, "widest" x3 — the textbook BPE
    // example: "es"/"est"/"st"-family merges dominate
    val docs = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val r = Bpe.train(df, numMerges = 3)
    assert(r.merges.length == 3)
    // first merge must be the most frequent pair: (e,s) or (s,t), both
    // with count 9; deterministic tie-break picks ("e","s")
    assert(r.merges.head == ("e", "s"))
    assert(r.merges(1) == ("es", "t"), s"got ${r.merges}")
    // the trained vocab's symbols reflect the merges
    val newest = r.vocab.filter(col("word") === "newest")
      .select("symbols").as[Seq[String]].collect().head
    assert(newest.contains("est"), s"got $newest")
  }

  test("tokenize replays merges greedily; stops when no pair repeats") {
    val docs = Seq("ab ab ab cd").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val r = Bpe.train(docs, numMerges = 10)
    // only ("a","b") repeats (freq 3 ≥ minPairCount); "cd" occurs once
    assert(r.merges == Seq(("a", "b")))
    val toks = docs.select(Bpe.tokenize(col("text"), r.merges).as("t"))
      .as[Seq[String]].collect().head
    assert(toks == Seq("ab", "ab", "ab", "c", "d"))
  }

  test("applyMerge is greedy left-to-right") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("x"), "a", "b") == Seq("x"))
    assert(Bpe.applyMerge(Nil, "a", "b") == Nil)
  }
}
