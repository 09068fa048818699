package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.scale.SparkTestSession

/** Property tests for the temporal joins (q62/q63): the scale-shaped
  * plans must equal their naive definitions on ANY input, not just the
  * driver corpus.
  *
  *  - banded range join (bin + neighbor-explode + exact filter) ==
  *    brute-force quadratic filter
  *  - windowed as-of (ignore-nulls last over preceding frame) ==
  *    per-row argmax of earlier matching events
  */
class TemporalJoinPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val bandMs = 1000L

  // (user, id, ms, isClick) with ms clustered so bands actually bind
  private val eventsGen: Gen[List[(Long, Long, Long, Boolean)]] = for {
    n <- Gen.choose(2, 40)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 3L)
      ms <- Gen.choose(0L, 8000L)
      click <- Gen.oneOf(true, false)
    } yield (u, ms, click))
  } yield rows.zipWithIndex.map { case ((u, ms, c), i) => (u, i.toLong, ms, c) }

  test("banded range join equals brute force for random events") {
    val prop = Prop.forAllNoShrink(eventsGen) { rows =>
      val e = rows.toDF("user_id", "id", "ms", "is_click")
      val a = e.select(col("user_id"), col("id").as("id1"), col("ms").as("ms1"),
        floor(col("ms") / bandMs).cast("long").as("bin"))
      val b = e.select(col("user_id"), col("id").as("id2"), col("ms").as("ms2"))
        .withColumn("bin", explode(array(
          floor(col("ms2") / bandMs).cast("long") - 1,
          floor(col("ms2") / bandMs).cast("long"),
          floor(col("ms2") / bandMs).cast("long") + 1)))
      val banded = a.join(b, Seq("user_id", "bin"))
        .filter(col("id1") < col("id2") && abs(col("ms1") - col("ms2")) <= bandMs)
        .select("user_id", "id1", "id2").as[(Long, Long, Long)].collect().toSet
      val brute = (for {
        (u1, i1, m1, _) <- rows
        (u2, i2, m2, _) <- rows
        if u1 == u2 && i1 < i2 && math.abs(m1 - m2) <= bandMs
      } yield (u1, i1, i2)).toSet
      banded == brute
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("windowed as-of equals per-row argmax for random events") {
    import org.apache.spark.sql.expressions.Window
    val prop = Prop.forAllNoShrink(eventsGen) { rows =>
      val e = rows.toDF("user_id", "id", "ms", "is_click")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val got = e
        .withColumn("click_ms",
          last(when(col("is_click"), col("ms")), ignoreNulls = true).over(w))
        .filter(!col("is_click") && col("click_ms").isNotNull)
        .select("user_id", "id", "click_ms")
        .as[(Long, Long, Long)].collect().toSet
      // naive: the maximum (ms, id)-earlier click ms of the same user
      val byKey = rows.groupBy(_._1)
      val expected = (for {
        (u, i, m, c) <- rows if !c
        earlier = byKey(u).filter { case (_, i2, m2, c2) =>
          c2 && (m2 < m || (m2 == m && i2 < i)) }
        if earlier.nonEmpty
      } yield {
        val best = earlier.maxBy { case (_, i2, m2, _) => (m2, i2) }
        (u, i, best._3)
      }).toSet
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
