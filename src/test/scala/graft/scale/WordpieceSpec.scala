package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Greedy longest-match subword tokenization (q107): independent JVM
  * replay over the corpus plus the precedence/edge cases that define
  * greedy semantics. */
class WordpieceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val threes = Seq("the", "ing", "ion", "ent", "and", "for",
    "ter", "ate", "tio", "est")
  private val twos = Seq("th", "er", "on", "an", "re", "en", "at",
    "es", "or", "te", "in", "ed")

  /** Independent greedy replay — plain Scala, no Spark. */
  private def ref(w: String): Int = {
    val t3 = threes.toSet; val t2 = twos.toSet
    var p = 0; var n = 0
    while (p < w.length) {
      if (w.length - p >= 3 && t3(w.substring(p, p + 3))) p += 3
      else if (w.length - p >= 2 && t2(w.substring(p, p + 2))) p += 2
      else p += 1
      n += 1
    }
    n
  }

  private def count(words: Seq[String]): Seq[Int] =
    words.toDF("w")
      .select(TextAnalysis.wordpieceCount(col("w"), threes, twos).as("n"))
      .as[Int].collect().toSeq

  test("fold equals the independent greedy replay on every corpus word") {
    val words = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect().toSeq
    assert(words.nonEmpty)
    assert(count(words) == words.map(ref))
  }

  test("longest-match precedence and edge cases") {
    // 'the' is ONE token (3-char beats the 'th' 2-char prefix);
    // 'thx' falls back to 'th' + 'x'; unmatched = one per char
    assert(count(Seq("the", "thx", "xyz", "", "a", "interesting")) ==
      Seq(1, 2, 3, 0, 1, ref("interesting")))
    // greedy is NOT globally optimal — it's positional longest-match,
    // and both engines implement exactly that (q107 pins cross-engine)
    assert(count(Seq("thes")) == Seq(2)) // the + s, not th + es
  }

  private def swCount(texts: Seq[String], vocab: Seq[String]): Seq[Int] =
    texts.toDF("t")
      .select(TextAnalysis.subwordCount(col("t"), vocab).as("n"))
      .as[Int].collect().toSeq

  test("trained-vocab SubwordCount agrees with the isin-chain fold on the frozen vocab") {
    // same greedy semantics, different machinery: the hash-set
    // expression fed the q107 frozen vocab must reproduce
    // wordpieceCount word for word across the corpus
    val words = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect().toSeq
    assert(swCount(words, threes ++ twos) == count(words))
  }

  test("SubwordCount: longer-than-3 entries, truncation guard, degenerate vocabs") {
    // a 4-entry beats its own 3-prefix and 2-prefix
    assert(swCount(Seq("tion"), Seq("tion", "tio", "ti")) == Seq(1))
    // window must FIT: 'tio' at the end must not match 'tion' truncated
    assert(swCount(Seq("xtio"), Seq("tion")) == Seq(4))
    // space-containing entries span word boundaries (BPE-style)
    assert(swCount(Seq("a b"), Seq("a b")) == Seq(1))
    // empty vocab = plain char count; 1-char entries are ignored (the
    // single-char fallback is implicit)
    assert(swCount(Seq("abc"), Nil) == Seq(3))
    assert(swCount(Seq("abc"), Seq("a", "b", "c")) == Seq(3))
    assert(swCount(Seq(""), Seq("ab")) == Seq(0))
  }

  test("q111: the trained cut is >= 1000 entries and the query is shuffle-free per row") {
    val d = "/root/testdata/sf0.001"
    val df = graft.operators.ScaleCatalogue.q111SubwordTrained(spark, d)
    val rows = df.as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // subword tokens compress chars but can't beat them
    rows.foreach { case (_, nc, sw, _) => assert(sw >= 1 && sw <= nc) }
    // multi-char vocab entries actually fire: strictly fewer tokens
    // than characters on every real document
    assert(rows.forall { case (_, nc, sw, _) => sw < nc })
  }
}
