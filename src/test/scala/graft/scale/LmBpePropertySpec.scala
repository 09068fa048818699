package graft.scale

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ScaleCatalogue

/** Properties of the LM-scoring and BPE operators on ANY corpus:
  *
  *  - bigram LM score (q74 shape): log-probs are never positive (counts
  *    are MLE so P(w2|w1) ≤ 1), per-doc bigram counts cover every
  *    adjacent pair, and identical documents score identically
  *  - BPE pairs (q75 shape): total pair mass equals
  *    Σ freq(word)·(len(word)−1) over the distinct vocabulary
  */
class LmBpePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val wordGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)
  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.choose(1, 30)
    docs <- Gen.listOfN(n,
      Gen.choose(2, 12).flatMap(m => Gen.listOfN(m, wordGen)).map(_.mkString(" ")))
  } yield docs

  private def runProp(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(r.passed, r.status.toString)
  }

  test("q74: non-positive log-probs, full bigram cover, dup-doc parity") {
    runProp(Prop.forAllNoShrink(corpusGen) { docs =>
      // duplicate the first doc so parity is always exercised
      val all = docs :+ docs.head
      val df = all.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val expected = all.zipWithIndex.collect {
        case (t, i) if t.split(" ").length >= 2 =>
          (i.toLong, t.split(" ").length - 1L)
      }.toMap
      val got = ScaleCatalogue.q74BigramLmScoreOn(df)
        .as[(Long, Long, Long)].collect()
      val cover = got.map(r => (r._1, r._2)).toMap == expected
      val nonPos = got.forall(_._3 <= 0L)
      val firstId = 0L
      val dupId = all.length - 1L
      val parity = (expected.contains(firstId), expected.contains(dupId)) match {
        case (true, true) =>
          got.find(_._1 == firstId).map(_._3) == got.find(_._1 == dupId).map(_._3)
        case _ => true
      }
      cover && nonPos && parity
    })
  }

  test("q75: total pair mass equals sum of freq*(len-1) over the vocab") {
    runProp(Prop.forAllNoShrink(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val words = docs.flatMap(_.split(" ")).filter(_.length >= 2)
      val expectedMass = words.map(_.length - 1L).sum
      val gotMass = ScaleCatalogue.q75BpePairsOn(df)
        .agg(sum(col("pair_count"))).as[Long].collect().head
      gotMass == expectedMass
    })
  }
}
