package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQ8 family contract (round-16 verdict item 7): codes are a
  * DERIVED artifact — rebuild-only, no history — because the
  * per-dimension (min, max) training grid is corpus-global and any
  * incremental verb would serve codes quantized under a stale grid.
  * Pins: every CDC/as-of verb refuses loudly with the rationale, and
  * the documented recovery (re-derive over the changed corpus) really
  * is equivalent to never having had the old state. */
class Sq8ContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$d/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("every CDC/as-of verb refuses with the rebuild-only rationale") {
    val ids = Seq(1L).toDF("vec_id")
    for ((name, call) <- Seq[(String, () => Any)](
      "append" -> (() => Sq8.append(emb, "/tmp/nope")),
      "upsert" -> (() => Sq8.upsert(emb, "/tmp/nope", 1L)),
      "delete" -> (() => Sq8.delete(ids, "/tmp/nope")),
      "topKAsOf" -> (() => Sq8.topKAsOf(emb, emb, 5, 0L)))) {
      val ex = intercept[UnsupportedOperationException](call())
      assert(ex.getMessage.contains("derived artifact") &&
        ex.getMessage.contains(name),
        s"$name must refuse with the contract rationale")
    }
  }

  test("the stale-grid hazard is real: a deleted extremum shifts every code") {
    // plant a vector that owns every dimension's max, then "delete" it:
    // codes for the SURVIVORS under the old grid differ from the honest
    // re-derive — exactly the silent skew an incremental delete verb
    // would serve, and why the contract refuses it
    val spike = spark.range(1).select(lit(999999L).as("vec_id"),
      array((0 until 64).map(_ => lit(10.0f)): _*)
        .cast("array<float>").as("embedding"))
    val corpus = emb.unionByName(spike)
    val honest = Sq8.encode(emb, Sq8.dimStats(emb))
      .orderBy(col("vec_id")).collect().toSeq
    val stale = Sq8.encode(emb, Sq8.dimStats(corpus))
      .orderBy(col("vec_id")).collect().toSeq
    assert(stale != honest,
      "planted extremum must shift the survivors' codes — the " +
        "rebuild-only refusal is load-bearing, not hypothetical")
    // and the honest re-derive is deterministic (replayable recovery)
    val again = Sq8.encode(emb, Sq8.dimStats(emb))
      .orderBy(col("vec_id")).collect().toSeq
    assert(again == honest, "re-derive must be deterministic")
  }
}
