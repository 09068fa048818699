package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property harness for the LSH index's CDC candidate generation:
  * against RANDOM append/upsert/delete histories, a fixed probe batch
  * must return exactly what an index built once over the model corpus
  * returns — stale generations must not generate or verify candidates,
  * tombstones must kill every generation, and a replay of the last
  * verb must change nothing. Corpus docs share a canonical phrase
  * block with the probe docs (one-token unique tails), so candidates
  * genuinely fire and a revision (reversal) genuinely kills them. */
class LshIndexPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-lsh-prop")
      .resolve("idx").toString

  /** Canonical 12-token phrase block per variant. */
  private def canon(p: Int): String =
    (0 until 12).map(k => s"w${p}_$k").mkString(" ")

  /** Corpus text: canonical block + unique tail; revised = reversed
    * block + tail (every shingle changes). */
  private def text(id: Long, p: Int, revised: Boolean): String = {
    val block = if (revised) canon(p).split(" ").reverse.mkString(" ")
    else canon(p)
    s"$block u$id"
  }

  private case class DocV(p: Int, revised: Boolean)

  private def docsDf(live: Map[Long, DocV]): DataFrame =
    live.toSeq.map { case (id, d) => (id, text(id, d.p, d.revised)) }
      .toDF("doc_id", "text")

  // fixed probe batch: one un-tailed canonical doc per variant —
  // near-dup of every unrevised corpus doc carrying that variant
  private val probes = (0 until 3).map(p => (100L + p, canon(p)))
    .toDF("doc_id", "text")

  private def probe(dir: String): Set[(Long, Long, Long)] =
    LshIndex.dedupBatch(spark, dir, probes, minMatches = 6)
      .as[(Long, Long, Long)].collect().toSet

  private def want(live: Map[Long, DocV]): Set[(Long, Long, Long)] = {
    val ref = tmp()
    LshIndex.build(docsDf(live), ref)
    probe(ref)
  }

  private sealed trait Op
  private case class App(rows: Map[Long, Int]) extends Op
  private case class Ups(rows: Map[Long, Int]) extends Op
  private case class Del(ids: Set[Long]) extends Op

  private val idGen = Gen.choose(1L, 8L)
  private val varGen = Gen.choose(0, 2)
  private val rowsGen: Gen[Map[Long, Int]] = for {
    n <- Gen.choose(1, 3)
    ids <- Gen.listOfN(n, idGen)
    vs <- Gen.listOfN(n, varGen)
  } yield ids.zip(vs).toMap
  private val opGen: Gen[Op] = Gen.frequency(
    3 -> rowsGen.map(App(_)),
    3 -> rowsGen.map(Ups(_)),
    2 -> Gen.nonEmptyListOf(idGen).map(ids => Del(ids.toSet)))
  private val historyGen: Gen[(Map[Long, Int], List[Op])] = for {
    base <- rowsGen.suchThat(_.nonEmpty)
    n <- Gen.choose(2, 4)
    ops <- Gen.listOfN(n, opGen)
  } yield (base, ops)

  test("random CDC histories: probes == an index built over the model corpus") {
    var sawCandidates = false
    val prop = Prop.forAllNoShrink(historyGen) { case (base, ops) =>
      val dir = tmp()
      var live: Map[Long, DocV] =
        base.map { case (id, p) => id -> DocV(p, revised = false) }
      var ever = base.keySet
      var rev = 0L
      LshIndex.build(docsDf(live), dir)
      var lastReplay: () => Unit = () => ()
      ops.foreach { op =>
        op match {
          case App(rows) =>
            val fresh = rows.filter { case (id, _) => !ever.contains(id) }
            val batch = rows.toSeq.map { case (id, p) =>
              (id, text(id, p, revised = false)) }.toDF("doc_id", "text")
            LshIndex.append(batch, dir)
            live ++= fresh.map { case (id, p) => id -> DocV(p, false) }
            ever ++= fresh.keySet
            lastReplay = () => LshIndex.append(batch, dir)
          case Ups(rows) =>
            // contract: revise committed live docs; revision REVERSES
            // the doc's block (variant may change too)
            val targets = rows.filter { case (id, _) => live.contains(id) }
            if (targets.nonEmpty) {
              rev += 1L
              val r = rev
              val batch = targets.toSeq.map { case (id, p) =>
                (id, text(id, p, revised = true)) }.toDF("doc_id", "text")
              LshIndex.upsert(batch, dir, rev = r)
              live ++= targets.map { case (id, p) => id -> DocV(p, true) }
              lastReplay = () => LshIndex.upsert(batch, dir, rev = r)
            }
          case Del(ids) =>
            val victims = ids.intersect(live.keySet)
            if (victims.nonEmpty) {
              val batch = victims.toSeq.toDF("doc_id")
              LshIndex.delete(batch, dir)
              live --= victims
              lastReplay = () => LshIndex.delete(batch, dir)
            }
        }
        val got = probe(dir)
        sawCandidates ||= got.nonEmpty
        assert(got == want(live),
          s"probe diverged from the model rebuild after $op (live=$live)")
        assert(LshIndex.consistent(spark, dir),
          s"consistent() false after $op")
      }
      val before = probe(dir)
      lastReplay()
      assert(probe(dir) == before, "replay of the last verb changed the probe")
      true
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(4), prop)
    assert(r.passed, r.status.toString)
    assert(sawCandidates,
      "weak harness: no history ever produced a candidate match")
  }
}
