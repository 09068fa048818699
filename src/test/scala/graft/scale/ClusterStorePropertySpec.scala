package graft.scale

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property harness for the cluster store's CDC algebra: against a
  * RANDOM history of maintenance verbs (append / upsert / delete over
  * a small id+chunk space, so merges, splits, takeovers, and replays
  * all actually occur), the store must
  *
  *  1. serve EXACTLY the from-scratch connected components of the
  *     model state after every single verb,
  *  2. answer [[ClusterStore.assignmentsAsOf]] for every committed
  *     epoch with that epoch's recorded truth (time travel over the
  *     whole random history), and
  *  3. emit a change feed whose per-epoch deltas equal the truth
  *     diffs AND compose — baseline snapshot + replayed deltas ≡ the
  *     final map (the CDF restore contract, on histories no fixture
  *     author thought of).
  *
  * Model semantics mirror the documented contracts: append admits only
  * unknown live ids; upsert rewrites (or inserts) chunk sets but
  * tombstoned ids stay dead and identical chunk sets are replay-skips;
  * delete kills live ids. Ops that change nothing must not advance the
  * epoch. */
class ClusterStorePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("s").toString

  // --- the model ---------------------------------------------------
  private case class Model(live: Map[Long, Set[Long]], dead: Set[Long]) {
    def append(rows: Map[Long, Set[Long]]): Model = {
      val fresh = rows.filter { case (id, ch) =>
        !live.contains(id) && !dead.contains(id) && ch.nonEmpty }
      copy(live = live ++ fresh)
    }
    def upsert(rows: Map[Long, Set[Long]]): Model = {
      val applied = rows.filter { case (id, ch) =>
        !dead.contains(id) && ch.nonEmpty && !live.get(id).contains(ch) }
      copy(live = live ++ applied)
    }
    def delete(ids: Set[Long]): Model = {
      val victims = ids.intersect(live.keySet)
      copy(live = live -- victims, dead = dead ++ victims)
    }
  }

  /** From-scratch truth: components over chunk-share star edges,
    * min-member labels (the spec-family truth() shape). */
  private def truth(m: Model): Map[Long, Long] = {
    val hub = m.live.toSeq.flatMap { case (d, ch) => ch.map(h => (h, d)) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).min }
    var rep = m.live.keys.map(d => d -> d).toMap
    def root(d: Long): Long = if (rep(d) == d) d else { val r = root(rep(d)); rep += d -> r; r }
    m.live.foreach { case (d, ch) =>
      ch.foreach { h =>
        val (a, b) = (root(d), root(hub(h)))
        if (a != b) rep += math.max(a, b) -> math.min(a, b)
      }
    }
    m.live.keys.map(d => d -> root(d)).toMap
  }

  // --- op generator -------------------------------------------------
  private sealed trait Op
  private case class App(rows: Map[Long, Set[Long]]) extends Op
  private case class Ups(rows: Map[Long, Set[Long]]) extends Op
  private case class Del(ids: Set[Long]) extends Op

  private val idGen = Gen.choose(1L, 10L)
  private val chunkGen = Gen.choose(100L, 104L)
  private val rowsGen: Gen[Map[Long, Set[Long]]] = for {
    n <- Gen.choose(1, 4)
    ids <- Gen.listOfN(n, idGen)
    sets <- Gen.listOfN(n, Gen.nonEmptyListOf(chunkGen).map(_.toSet))
  } yield ids.zip(sets).toMap
  private val opGen: Gen[Op] = Gen.frequency(
    4 -> rowsGen.map(App(_)),
    3 -> rowsGen.map(Ups(_)),
    2 -> Gen.nonEmptyListOf(idGen).map(ids => Del(ids.toSet)))
  private val historyGen: Gen[(Map[Long, Set[Long]], List[Op])] = for {
    base <- rowsGen
    n <- Gen.choose(2, 5)
    ops <- Gen.listOfN(n, opGen)
  } yield (base, ops)

  private def chunksDf(rows: Map[Long, Set[Long]]) =
    rows.toSeq.flatMap { case (d, ch) => ch.map(h => (d, h)) }
      .toDF("doc_id", "chunk_hash")

  test("random CDC histories: serve == truth, asOf == history, feed composes") {
    val prop = Prop.forAllNoShrink(historyGen) { case (base, ops) =>
      val dir = tmp("graft-cs-prop")
      var model = Model(Map.empty, Set.empty).append(base)
      ClusterStore.build(chunksDf(base), dir)
      // epoch -> truth snapshot (build lands epoch 0 when base nonempty)
      var snaps = Map(ClusterStore.committedEpoch(spark, dir) -> truth(model))
      ops.foreach { op =>
        val before = ClusterStore.committedEpoch(spark, dir)
        val next = op match {
          case App(rows) => ClusterStore.append(chunksDf(rows), dir); model.append(rows)
          case Ups(rows) => ClusterStore.upsert(chunksDf(rows), dir); model.upsert(rows)
          case Del(ids) =>
            ClusterStore.delete(ids.toSeq.toDF("doc_id"), dir); model.delete(ids)
        }
        val after = ClusterStore.committedEpoch(spark, dir)
        val changed = next.live != model.live
        model = next
        val served = ClusterStore.assignments(spark, dir)
          .as[(Long, Long)].collect().toMap
        assert(served == truth(model),
          s"serve diverged after $op: $served vs ${truth(model)}")
        if (after > before) snaps += after -> truth(model)
        else assert(!changed,
          s"state changed but epoch did not advance after $op")
      }
      val maxE = ClusterStore.committedEpoch(spark, dir)
      // time travel over the whole history
      snaps.foreach { case (e, want) =>
        val got = ClusterStore.assignmentsAsOf(spark, dir, e)
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"asOf($e) diverged: $got vs $want")
      }
      // change feed: per-epoch deltas equal truth diffs and compose
      if (maxE >= 1L) {
        val feed = tmp("graft-cs-prop-feed")
        ClusterStore.emitChangeFeed(spark, dir, feed)
        val rows = ClusterStore.changeFeed(spark, feed)
          .select(col("e"), col("doc_id"),
            coalesce(col("old_rep"), lit(-1L)),
            coalesce(col("new_rep"), lit(-1L)), col("change"))
          .as[(Long, Long, Long, Long, String)].collect()
          .groupBy(_._1)
        (1L to maxE).foreach { e =>
          val (prev, cur) = (snaps(e - 1), snaps(e))
          val want = (prev.keySet ++ cur.keySet).flatMap { d =>
            (prev.get(d), cur.get(d)) match {
              case (None, Some(n))              => Some((d, -1L, n, "inserted"))
              case (Some(o), None)              => Some((d, o, -1L, "deleted"))
              case (Some(o), Some(n)) if o != n => Some((d, o, n, "relabeled"))
              case _                            => None
            }
          }
          val got = rows.getOrElse(e, Array.empty)
            .map(r => (r._2, r._3, r._4, r._5)).toSet
          assert(got == want, s"feed epoch $e diverged: $got vs $want")
        }
        // the restore contract
        val replayed = (1L to maxE).foldLeft(snaps(0L)) { (m, e) =>
          rows.getOrElse(e, Array.empty).foldLeft(m) { (acc, r) =>
            if (r._5 == "deleted") acc - r._2 else acc + (r._2 -> r._4)
          }
        }
        assert(replayed == snaps(maxE),
          "baseline + replayed deltas failed to rebuild the final map")
      }
      true
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(r.passed, r.status.toString)
  }
}
