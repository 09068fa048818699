package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.scale.SparkTestSession

/** Properties of the corpus-assembly operators on ANY input:
  *
  *  - packing (q59 shape): bins per partition key are contiguous in doc
  *    order, every bin's token sum stays under budget + the size of its
  *    last document (contiguous cumulative packing bound), and every
  *    document lands in exactly one bin
  *  - content-hash split (q57 shape): buckets partition the corpus
  *    (disjoint cover) and are invariant under row order
  */
class AssemblyPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docsGen: Gen[List[(Long, Int)]] = for {
    n <- Gen.choose(1, 60)
    sizes <- Gen.listOfN(n, Gen.choose(1, 700))
  } yield sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }

  test("packing: exact cover and per-bin budget bound") {
    val budget = 512L
    val prop = Prop.forAllNoShrink(docsGen) { docs =>
      val df = docs.toDF("doc_id", "tokens")
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val binned = df
        .withColumn("cum", sum(col("tokens").cast("long")).over(w))
        .withColumn("bin", floor((col("cum") - col("tokens")) / budget).cast("long"))
        .select("doc_id", "tokens", "bin")
        .as[(Long, Int, Long)].collect().toSeq
      val cover = binned.map(_._1).sorted == docs.map(_._1).sorted
      val byBin = binned.groupBy(_._3)
      val contiguous = byBin.values.forall { rows =>
        val ids = rows.map(_._1).sorted
        ids == (ids.head to ids.last)
      }
      // a bin only opens below `budget` cumulative tokens, so its sum is
      // bounded by budget + its final (overflowing) document
      val bounded = byBin.values.forall { rows =>
        val sum = rows.map(_._2.toLong).sum
        sum <= budget + rows.maxBy(_._1)._2
      }
      cover && contiguous && bounded
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("budget mix: partition/order-invariant; kept tokens track B*w/M") {
    val textGen = Gen.choose(2, 20).flatMap(m =>
      Gen.listOfN(m, Gen.alphaLowerStr.map(s => if (s.isEmpty) "x" else s.take(5)))
        .map(_.mkString(" ")))
    val gen = for {
      n <- Gen.choose(4, 50)
      texts <- Gen.listOfN(n, textGen)
      srcs <- Gen.listOfN(n, Gen.choose(0, 5).map(i => s"src$i"))
    } yield texts.zip(srcs).zipWithIndex
      .map { case ((t, s), i) => (i.toLong, t, s) }
    val prop = Prop.forAllNoShrink(gen) { docs =>
      def mixOf(d: Seq[(Long, String, String)], parts: Int) = {
        val df = d.toDF("doc_id", "text", "source").repartition(parts)
        ScaleCatalogue.q79BudgetMixOn(df)
          .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
      }
      val a = mixOf(docs, 1)
      val b = mixOf(scala.util.Random.shuffle(docs), 7)
      a == b
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("content-hash split: disjoint cover, order-invariant") {
    val textGen = Gen.listOfN(5, Gen.alphaLowerStr.map(_.take(6))).map(_.mkString(" "))
    val gen = for {
      n <- Gen.choose(1, 40)
      texts <- Gen.listOfN(n, textGen)
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val prop = Prop.forAllNoShrink(gen) { docs =>
      def splitOf(d: Seq[(Long, String)]) = {
        val bucket = pmod(graft.functions.RollingHash.rolling_hash(col("text")), lit(100L))
        d.toDF("doc_id", "text")
          .withColumn("split",
            when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
          .select("doc_id", "split").as[(Long, String)].collect().toMap
      }
      val a = splitOf(docs)
      val b = splitOf(scala.util.Random.shuffle(docs))
      a.size == docs.size && a == b &&
        a.values.forall(Set("train", "val", "test"))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
