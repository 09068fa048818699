package graft.scale

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the round-12 corpus operators on ANY input (the
  * AssemblyPropertySpec discipline): exact-cut packing conserves token
  * mass and fills every non-tail bin exactly; sqrt-temperature mixing
  * respects its quota algebra and ignores input order; BFS distance
  * equals the independent reference on random graphs. */
class CorpusMixPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("packStats: mass conserved, non-tail bins exactly seqLen, bins contiguous") {
    val gen = for {
      n <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.choose(1, 50))
      shards <- Gen.listOfN(n, Gen.choose(0L, 3L))
      seqLen <- Gen.choose(4L, 64L)
    } yield (toks.zip(shards).zipWithIndex.map { case ((t, s), i) =>
      (i.toLong, Seq.fill(t)("w").mkString(" "), s)
    }, seqLen)
    val prop = Prop.forAllNoShrink(gen) { case (docs, seqLen) =>
      val stats = Packing.packStats(
          docs.toDF("doc_id", "text", "shard"), col("shard"), seqLen)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val totalByShard = docs.groupBy(_._3).view
        .mapValues(_.map(_._2.split(" ").length.toLong).sum).toMap
      val byShard = stats.groupBy(_._1)
      byShard.keySet == totalByShard.keySet &&
        byShard.forall { case (sh, bins) =>
          val maxBin = bins.map(_._2).max
          bins.map(_._4).sum == totalByShard(sh) &&
            bins.map(_._2).sorted == (0L to maxBin) &&
            bins.filter(_._2 < maxBin).forall(_._4 == seqLen)
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("Mixture: quota algebra holds and selection ignores input order") {
    val gen = for {
      n <- Gen.choose(2, 60)
      srcs <- Gen.listOfN(n, Gen.choose(0, 4).map(i => s"s$i"))
      k <- Gen.choose(1L, 40L)
    } yield (srcs.zipWithIndex.map { case (s, i) => (i.toLong, "t", s) }, k)
    val prop = Prop.forAllNoShrink(gen) { case (docs, k) =>
      def sel(d: Seq[(Long, String, String)]) =
        Mixture.sample(d.toDF("doc_id", "text", "source"), "source", k)
          .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
      val a = sel(docs)
      val b = sel(scala.util.Random.shuffle(docs))
      val counts = docs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val isq = counts.view.mapValues(n => math.sqrt(n.toDouble).toLong).toMap
      val t = isq.values.sum
      val quotas = isq.view.mapValues(q => q * k / t).toMap
      val perGroup = a.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      a == b &&
        quotas.values.sum <= k &&
        quotas.forall { case (g, q) =>
          perGroup.getOrElse(g, 0L) == math.min(q, counts(g))
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("bfsDistancesQ equals the reference BFS on random graphs") {
    val gen = for {
      nNodes <- Gen.choose(2, 15)
      nEdges <- Gen.choose(1, 30)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, nNodes - 1L)
        b <- Gen.choose(0L, nNodes - 1L)
      } yield (a, b))
      nSeeds <- Gen.choose(1, 3)
      seeds <- Gen.listOfN(nSeeds, Gen.choose(0L, nNodes - 1L))
      rounds <- Gen.choose(0, 5)
    } yield (edges.distinct, seeds.distinct, rounds)
    def ref(edges: Seq[(Long, Long)], seeds: Set[Long],
        rounds: Int): Map[Long, Long] = {
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var dist = seeds.map(_ -> 0L).toMap
      var frontier = seeds
      for (t <- 1 to rounds) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Nil))
          .filterNot(dist.contains)
        dist ++= next.map(_ -> t.toLong)
        frontier = next
      }
      dist
    }
    val prop = Prop.forAllNoShrink(gen) { case (edges, seeds, rounds) =>
      val got = Graph.bfsDistancesQ(edges.toDF("src", "dst"),
          seeds.toDF("node"), rounds)
        .as[(Long, Long)].collect().toMap
      got == ref(edges, seeds.toSet, rounds)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
