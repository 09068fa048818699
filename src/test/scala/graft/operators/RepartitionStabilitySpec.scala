package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.SparkTestSession

/** Engine-exactness seatbelt: every quantized/aggregating catalogue
  * query must return IDENTICAL rows regardless of the shuffle partition
  * count — the concrete claim behind "quantize per term BEFORE the sum,
  * so the float fold is order-free". A query that silently depended on
  * accumulation order would pass a single-config oracle run and fail
  * here. */
class RepartitionStabilitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val d = "/root/testdata/sf0.001"
  private val sensitive: Seq[String] = Seq(
    "q71_minhash_portable", "q72_simhash_portable", "q74_bigram_lm_score",
    "q76_kmeans_step", "q80_dup_profile", "q81_span_excision",
    "q82_kmeans_train", "q83_ann_pq", "q84_span_excision_keep_first",
    // round-12 family: integer-recurrence graph queries, hash-ordered
    // selection/layout, and the composed recipe — all claim
    // partitioning-invariance in their oracles
    "q123_bfs_distances", "q125_collocations", "q126_temp_mixture",
    "q128_label_prop", "q129_training_recipe", "q131_token_shards")

  private def rowsAt(name: String, partitions: Int): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try graft.SparkEntry.queries(name)(spark, d)
      .collect().map(_.toString).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  test("order-sensitive queries are bit-stable across shuffle partitionings") {
    sensitive.foreach { name =>
      val a = rowsAt(name, 3)
      val b = rowsAt(name, 7)
      assert(a == b, s"$name differs between 3 and 7 shuffle partitions")
    }
  }
}
