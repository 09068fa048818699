package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property harness for the IVF+PQ index's CDC verbs under BOTH frozen
  * artifacts (coarse centroids + stored codebooks): random
  * append/upsert/delete histories over real embedding rows must serve
  * exactly what an index built once over the model corpus serves under
  * the same centroids and codebooks — re-encoding under the stored
  * codebooks, cluster migration, and tombstones reaching both code
  * trees included — with upsert/delete replays as no-ops. */
class IvfPqIndexPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val centroids = Similarity.strideCentroids(emb, stride = 50)
  private lazy val codebooks = Similarity.pqInitCodebooks(emb)
  private lazy val pool: Map[Long, Array[Float]] = emb
    .filter(col("vec_id").between(1L, 12L))
    .select(col("vec_id"), col("embedding"))
    .as[(Long, Array[Float])].collect().toMap
  private lazy val queries = emb.filter(col("vec_id") < 3)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-ivfpq-prop")
      .resolve("idx").toString

  private def corpusDf(live: Map[Long, Boolean]): DataFrame =
    live.toSeq.map { case (id, revised) =>
      (id, if (revised) pool(id).reverse else pool(id))
    }.toDF("vec_id", "embedding")

  private def top(dir: String): Seq[(Long, Int, Long, Long)] =
    IvfPqIndex.topK(spark, dir, queries, centroids, k = 5, nProbe = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Long)].collect().toSeq

  private def want(live: Map[Long, Boolean]): Seq[(Long, Int, Long, Long)] =
    if (live.isEmpty) Seq.empty
    else {
      val ref = tmp()
      IvfPqIndex.build(corpusDf(live), centroids, ref,
        codebooks = Some(codebooks))
      top(ref)
    }

  private sealed trait Op
  private case class App(ids: Set[Long]) extends Op
  private case class Ups(ids: Set[Long]) extends Op
  private case class Del(ids: Set[Long]) extends Op

  private val idsGen = Gen.nonEmptyListOf(Gen.choose(1L, 12L)).map(_.toSet)
  private val opGen: Gen[Op] = Gen.frequency(
    3 -> idsGen.map(App(_)), 3 -> idsGen.map(Ups(_)),
    2 -> idsGen.map(Del(_)))
  private val historyGen: Gen[(Set[Long], List[Op])] = for {
    base <- idsGen
    n <- Gen.choose(2, 4)
    ops <- Gen.listOfN(n, opGen)
  } yield (base, ops)

  test("random CDC histories: probes == an index built over the model corpus") {
    val prop = Prop.forAllNoShrink(historyGen) { case (base, ops) =>
      val dir = tmp()
      var live: Map[Long, Boolean] = base.map(_ -> false).toMap
      var ever = base
      var rev = 0L
      IvfPqIndex.build(corpusDf(live), centroids, dir,
        codebooks = Some(codebooks))
      var lastReplay: () => Unit = () => ()
      ops.foreach { op =>
        op match {
          case App(ids) =>
            // append re-encodes under the STORED codebooks and, like
            // IvfIndex.append, owns no id-novelty check — feed fresh
            val fresh = ids -- ever
            if (fresh.nonEmpty) {
              val batch = fresh.toSeq.map(id => (id, pool(id)))
                .toDF("vec_id", "embedding")
              IvfPqIndex.append(batch, centroids, dir)
              live ++= fresh.map(_ -> false).toMap; ever ++= fresh
              lastReplay = () => ()
            }
          case Ups(ids) =>
            val targets = ids.intersect(live.keySet)
            if (targets.nonEmpty) {
              rev += 1L
              val r = rev
              val batch = targets.toSeq.map(id => (id, pool(id).reverse))
                .toDF("vec_id", "embedding")
              IvfPqIndex.upsert(batch, centroids, dir, rev = r)
              live ++= targets.map(_ -> true)
              lastReplay = () =>
                IvfPqIndex.upsert(batch, centroids, dir, rev = r)
            }
          case Del(ids) =>
            val victims = ids.intersect(live.keySet)
            if (victims.nonEmpty) {
              val batch = victims.toSeq.toDF("vec_id")
              IvfPqIndex.delete(batch, dir)
              live --= victims
              lastReplay = () => IvfPqIndex.delete(batch, dir)
            }
        }
        assert(top(dir) == want(live),
          s"probe diverged from the model rebuild after $op " +
            s"(live=${live.keySet})")
      }
      val before = top(dir)
      lastReplay()
      assert(top(dir) == before, "replay of the last verb changed the probe")
      true
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(4), prop)
    assert(r.passed, r.status.toString)
  }
}
