package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property harness for the citation index's CDC algebra — the
  * subtlest maintenance surface in the family (every verb moves term
  * df and band membership through signed keyed deltas). Against a
  * RANDOM history of append / upsert / delete over a small phrase
  * vocabulary (so trigram df's genuinely wander through enter / fall /
  * die / revive transitions), the maintained index must serve EXACTLY
  * the from-scratch weighted edge derivation of the model corpus after
  * every verb, stay consistent(), and treat a replay of the last verb
  * as a pure no-op. Fixture specs (CitationUpsertSpec /
  * CitationDeleteSpec) pin designed transitions; this pins the
  * interleavings nobody designed. */
class CitationPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-cit-prop")
      .resolve("idx").toString

  private val phrases = Vector(
    "alpha beta gamma", "delta epsilon zeta",
    "eta theta iota", "kappa lambda mu")

  /** Per-doc text: one shared phrase + id-unique filler, so the phrase
    * trigram's df is exactly the count of docs carrying it and every
    * other trigram has df 1 (below dfMin). */
  private def text(id: Long, p: Int) = s"${phrases(p)} fill$id pad$id"

  private def docsDf(live: Map[Long, Int]): DataFrame =
    live.toSeq.map { case (id, p) => (id, text(id, p)) }
      .toDF("doc_id", "text")

  private def want(live: Map[Long, Int]): Set[(Long, Long, Long)] =
    if (live.isEmpty) Set.empty
    else Graph.citationEdgesWeighted(docsDf(live), n = 3, dfMin = 2,
        dfMax = 4)
      .as[(Long, Long, Long)].collect().toSet

  private def got(dir: String): Set[(Long, Long, Long)] =
    CitationIndex.edgesWeighted(spark, dir)
      .as[(Long, Long, Long)].collect().toSet

  private sealed trait Op
  private case class App(rows: Map[Long, Int]) extends Op
  private case class Ups(rows: Map[Long, Int]) extends Op
  private case class Del(ids: Set[Long]) extends Op

  private val idGen = Gen.choose(1L, 10L)
  private val phraseGen = Gen.choose(0, phrases.length - 1)
  private val rowsGen: Gen[Map[Long, Int]] = for {
    n <- Gen.choose(1, 3)
    ids <- Gen.listOfN(n, idGen)
    ps <- Gen.listOfN(n, phraseGen)
  } yield ids.zip(ps).toMap
  private val opGen: Gen[Op] = Gen.frequency(
    3 -> rowsGen.map(App(_)),
    3 -> rowsGen.map(Ups(_)),
    2 -> Gen.nonEmptyListOf(idGen).map(ids => Del(ids.toSet)))
  private val historyGen: Gen[(Map[Long, Int], List[Op])] = for {
    base <- rowsGen.suchThat(_.nonEmpty)
    n <- Gen.choose(2, 4)
    ops <- Gen.listOfN(n, opGen)
  } yield (base, ops)

  test("random CDC histories: maintained edges == from-scratch, replays are no-ops") {
    val prop = Prop.forAllNoShrink(historyGen) { case (base, ops) =>
      val dir = tmp()
      var live = base
      var ever = base.keySet
      var rev = 0L
      // slack 8: max possible df is 10 (every doc one phrase), deep
      // threshold dfMax+slack = 12 — the deep guard stays unreachable,
      // every transition runs through the banded algebra
      CitationIndex.build(docsDf(live), dir, slack = 8L)
      var lastReplay: () => Unit = () => ()
      ops.foreach { op =>
        op match {
          case App(rows) =>
            // committed ids (alive or tombstoned) cannot re-enter
            val fresh = rows.filter { case (id, _) => !ever.contains(id) }
            val batch = docsDf(rows.map { case (id, p) => id -> p })
            CitationIndex.append(batch, dir)
            live ++= fresh; ever ++= fresh.keySet
            lastReplay = () => CitationIndex.append(batch, dir)
          case Ups(rows) =>
            // the CDC contract: revise LIVE docs, prev_text = current
            val targets = rows.filter { case (id, _) => live.contains(id) }
            if (targets.nonEmpty) {
              rev += 1L
              val r = rev
              val batch = targets.toSeq.map { case (id, p) =>
                (id, text(id, p), text(id, live(id)))
              }.toDF("doc_id", "text", "prev_text")
              CitationIndex.upsert(batch, dir, rev = r)
              live ++= targets
              lastReplay = () => CitationIndex.upsert(batch, dir, rev = r)
            }
          case Del(ids) =>
            val victims = ids.intersect(live.keySet)
            if (victims.nonEmpty) {
              val batch = docsDf(live.filter(kv => victims(kv._1)))
              CitationIndex.delete(batch, dir)
              live --= victims
              lastReplay = () => CitationIndex.delete(batch, dir)
            }
        }
        assert(got(dir) == want(live),
          s"maintained edges diverged from scratch after $op " +
            s"(live=$live)")
        assert(CitationIndex.consistent(spark, dir),
          s"consistent() false after $op")
      }
      // a replay of the last applied verb is a pure no-op
      val before = got(dir)
      lastReplay()
      assert(got(dir) == before, "replay of the last verb changed edges")
      assert(CitationIndex.consistent(spark, dir))
      true
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(4), prop)
    assert(r.passed, r.status.toString)
  }
}
