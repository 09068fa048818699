package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Random-interleaving property harness for the generation-checked
  * serving handle (round-18 verdict item 5 — the CDC families carry
  * random-history harnesses; the handle contract didn't). Against
  * arbitrary open / probe / append / upsert / delete / rebuild /
  * reopen interleavings on a real IVF layout, the model asserts the
  * three documented invariants:
  *
  *  1. LISTING-SNAPSHOT SERVE: a non-stale handle probe returns
  *     exactly the open-time main-tree membership under CURRENT CDC
  *     state — post-open appends are invisible (their files are not
  *     in the cached listing), post-open upserts and deletes BIND
  *     (rev/tombstone side tables are read fresh per probe);
  *     verified against an index built from scratch over the model's
  *     expected corpus.
  *  2. REFUSAL IFF REPLACED: a probe (current or as-of) throws
  *     [[StaleHandleException]] exactly when a directory-replacing
  *     verb (rebuild fold) committed since open — never for
  *     append/upsert/delete histories of any shape.
  *  3. REOPEN RECOVERS: after any history, reopening serves the
  *     current corpus ≡ the path-based probe.
  *
  * Generator restriction (documented semantics, not a dodge): upserts
  * target ids in the OPEN membership — a rev row whose base row is
  * outside the cached listing is a state the listing-snapshot
  * contract does not define (the path read always has the base row;
  * reopen is the documented way to pick up post-open appends before
  * revising them). */
class HandlePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val centroids = Similarity.strideCentroids(emb, stride = 50)
    .localCheckpoint()
  private lazy val pool: Map[Long, Array[Float]] = emb
    .filter(col("vec_id").between(1L, 12L))
    .select(col("vec_id"), col("embedding"))
    .as[(Long, Array[Float])].collect().toMap
  private lazy val queries = emb.filter(col("vec_id") < 3).localCheckpoint()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-handle-prop")
      .resolve("idx").toString

  private def corpusDf(vecs: Map[Long, Array[Float]]): DataFrame =
    vecs.toSeq.toDF("vec_id", "embedding")

  private def topPath(dir: String): Seq[(Long, Int, Long, Double)] =
    IvfIndex.topK(spark, dir, queries, centroids, k = 5, nProbe = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq

  private def topHandle(h: IvfIndex.Handle): Seq[(Long, Int, Long, Double)] =
    IvfIndex.topKWith(spark, h, queries, centroids, k = 5, nProbe = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq

  /** The oracle: an index built once over the expected corpus. */
  private def want(vecs: Map[Long, Array[Float]])
      : Seq[(Long, Int, Long, Double)] =
    if (vecs.isEmpty) Seq.empty
    else {
      val ref = tmp()
      IvfIndex.build(corpusDf(vecs), centroids, ref)
      topPath(ref)
    }

  private sealed trait Op
  private case object App extends Op
  private case class Ups(seed: Long) extends Op
  private case class Del(seed: Long) extends Op
  private case object Fold extends Op
  private case object Reopen extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.const(App),
    3 -> Gen.choose(0L, Long.MaxValue).map(Ups(_)),
    2 -> Gen.choose(0L, Long.MaxValue).map(Del(_)),
    2 -> Gen.const(Fold),
    2 -> Gen.const(Reopen))
  private val historyGen: Gen[(Int, List[Op])] = for {
    baseN <- Gen.choose(3, 6)
    n <- Gen.choose(3, 5)
    ops <- Gen.listOfN(n, opGen)
  } yield (baseN, ops)

  test("arbitrary open/probe/append/upsert/delete/rebuild/reopen " +
      "interleavings: snapshot serve, refusal iff replaced, reopen " +
      "recovers") {
    val prop = Prop.forAllNoShrink(historyGen) { case (baseN, ops) =>
      val dir = tmp()
      val allIds = pool.keys.toSeq.sorted
      var unused = allIds.drop(baseN)
      var live: Map[Long, Array[Float]] =
        allIds.take(baseN).map(id => id -> pool(id)).toMap
      IvfIndex.build(corpusDf(live), centroids, dir)
      var handle = IvfIndex.openHandle(spark, dir)
      // the model's view of the handle: expected serve corpus + staleness
      var handleView: Map[Long, Array[Float]] = live
      var stale = false
      var rev = 0L

      def checkProbes(tag: String): Unit = {
        if (stale) {
          intercept[StaleHandleException] { topHandle(handle) }
          intercept[StaleHandleException] {
            IvfIndex.topKAsOfWith(spark, handle, queries, centroids,
              k = 5, asOf = 0L, nProbe = 3).collect()
          }
          assert(IvfIndex.isStale(spark, handle),
            s"$tag: model says stale but isStale disagrees")
        } else {
          assert(!IvfIndex.isStale(spark, handle),
            s"$tag: model says fresh but isStale disagrees")
          assert(topHandle(handle) == want(handleView),
            s"$tag: handle serve diverged from the open-time snapshot " +
              s"under current CDC (view=${handleView.keySet})")
        }
        assert(topPath(dir) == want(live),
          s"$tag: path probe diverged from the model corpus")
      }

      checkProbes("after build+open")
      ops.foreach { op =>
        op match {
          case App =>
            unused match {
              case id +: rest =>
                IvfIndex.append(Seq((id, pool(id))).toDF(
                  "vec_id", "embedding"), centroids, dir)
                live += id -> pool(id)
                unused = rest
              // appended files are NOT in the handle's cached listing:
              // handleView unchanged, and the probe must not refuse
              case _ => () // pool exhausted — skip
            }
          case Ups(seed) =>
            // only open-membership ids (see the scaladoc restriction)
            val targets = handleView.keySet.intersect(live.keySet).toSeq.sorted
            if (targets.nonEmpty) {
              val id = targets((seed % targets.length).toInt)
              rev += 1L
              val v = pool(id).reverse
              IvfIndex.upsert(Seq((id, v)).toDF("vec_id", "embedding"),
                centroids, dir, rev = rev)
              live += id -> v
              // rev side tables bind fresh: the handle sees the revision
              handleView += id -> v
            }
          case Del(seed) =>
            val targets = live.keySet.toSeq.sorted
            if (targets.nonEmpty) {
              val id = targets((seed % targets.length).toInt)
              IvfIndex.delete(Seq(id).toDF("vec_id"), dir)
              live -= id
              // tombstones bind fresh: the handle stops serving it too
              handleView -= id
            }
          case Fold =>
            assert(IvfIndex.rebuild(spark, dir, centroids),
              "unpinned rebuild must publish")
            stale = true // the directory was replaced: refusal due
          case Reopen =>
            handle = IvfIndex.reopen(spark, handle)
            stale = false
            handleView = live // a fresh listing sees the current corpus
        }
        checkProbes(s"after $op")
      }
      // reopen ALWAYS recovers, whatever the history ended on
      handle = IvfIndex.reopen(spark, handle)
      assert(topHandle(handle) == want(live),
        "final reopen did not serve the current corpus")
      true
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3), prop)
    assert(r.passed, r.status.toString)
  }
}
