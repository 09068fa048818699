package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property harness for the BM25 index's CDC stats ledger — the
  * trickiest NUMERIC surface in the family: every verb moves
  * n_docs / sum_dl / df, revisions change their own doc's length, and
  * deletes of revised docs must subtract the CURRENT dl while the
  * revision delta stays counted. Against RANDOM verb histories with
  * deliberately varying document lengths, every probed top-k must be
  * score-identical to an index built once over the model corpus. The
  * fixture specs pin designed ledgers; this pins arbitrary
  * interleavings (multiple revisions of one doc, delete-after-revise,
  * re-append attempts, zero-delta rewrites). */
class BmIndexPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-bm-prop")
      .resolve("idx").toString

  private val words = Vector("red", "green", "blue", "cyan", "teal", "jade")

  /** Variant v drives both content and LENGTH: tf and dl move with
    * every revision, so avgdl/sum_dl are load-bearing. */
  private def text(id: Long, v: Int): String = {
    val body = Seq.fill(1 + (id % 3).toInt + v)(
      words.take(2 + v).mkString(" ")).mkString(" ")
    s"$body u$id"
  }

  private def docsDf(live: Map[Long, Int]): DataFrame =
    live.toSeq.map { case (id, v) => (id, text(id, v)) }
      .toDF("doc_id", "text")

  private val qTerms = Seq("red", "green", "blue").toDF("term")

  private def top(dir: String): Seq[(Int, Long, Long, Long)] =
    BmIndex.topK(spark, dir, qTerms, k = 10)
      .as[(Int, Long, Long, Long)].collect().toSeq

  private def want(live: Map[Long, Int]): Seq[(Int, Long, Long, Long)] = {
    val ref = tmp()
    BmIndex.build(docsDf(live), ref)
    top(ref)
  }

  private sealed trait Op
  private case class App(rows: Map[Long, Int]) extends Op
  private case class Ups(rows: Map[Long, Int]) extends Op
  private case class Del(ids: Set[Long]) extends Op

  private val idGen = Gen.choose(1L, 8L)
  private val varGen = Gen.choose(0, 3)
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

  test("random CDC histories: probed scores == an index built over the model corpus") {
    val prop = Prop.forAllNoShrink(historyGen) { case (base, ops) =>
      val dir = tmp()
      var live = base
      var ever = base.keySet
      var rev = 0L
      BmIndex.build(docsDf(live), dir)
      var lastReplay: () => Unit = () => ()
      ops.foreach { op =>
        op match {
          case App(rows) =>
            val fresh = rows.filter { case (id, _) => !ever.contains(id) }
            val batch = docsDf(rows)
            BmIndex.append(batch, dir)
            live ++= fresh; ever ++= fresh.keySet
            lastReplay = () => BmIndex.append(batch, dir)
          case Ups(rows) =>
            // contract: revise committed live docs only
            val targets = rows.filter { case (id, _) => live.contains(id) }
            if (targets.nonEmpty) {
              rev += 1L
              val r = rev
              val batch = docsDf(targets)
              BmIndex.upsert(batch, dir, rev = r)
              live ++= targets
              lastReplay = () => BmIndex.upsert(batch, dir, rev = r)
            }
          case Del(ids) =>
            val victims = ids.intersect(live.keySet)
            if (victims.nonEmpty) {
              val batch = victims.toSeq.toDF("doc_id")
              BmIndex.delete(batch, dir)
              live --= victims
              lastReplay = () => BmIndex.delete(batch, dir)
            }
        }
        assert(top(dir) == want(live),
          s"probed scores diverged from the model rebuild after $op " +
            s"(live=$live)")
        assert(BmIndex.consistent(spark, dir),
          s"consistent() false after $op")
      }
      val before = top(dir)
      lastReplay()
      assert(top(dir) == before, "replay of the last verb changed scores")
      true
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(4), prop)
    assert(r.passed, r.status.toString)
  }
}
