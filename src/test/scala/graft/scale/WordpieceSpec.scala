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
}
