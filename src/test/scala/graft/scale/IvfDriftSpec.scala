package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frozen-artifact drift metrics (round-14 verdict item 6): the
  * IVF centroids and the PQ codebooks are both frozen at build, both
  * docstrings promise "drift = a rebuild decision", and this spec pins
  * the machinery that MAKES the decision: exact integer-space
  * quantization-error ratios against the build-time baseline recorded
  * in the index meta, monotone under planted drift, ≈1 under
  * same-distribution growth, NaN-safe on unmeasurable indexes. */
class IvfDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def emb = graft.Tables.embeddings(spark, d)
    .select(col("vec_id"), col("embedding"))

  private def cents = emb.filter(col("vec_id") < 16)
    .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  /** Scale a float embedding by an exact power of two — float
    * multiplication by 2^k is exact (no rounding anywhere), so the
    * planted drift is bit-reproducible. */
  private def scaled(df: DataFrame, factor: Float, idOffset: Long): DataFrame =
    df.select((col("vec_id") + lit(idOffset)).as("vec_id"),
      transform(col("embedding"), e => (e * lit(factor)).cast("float"))
        .as("embedding"))

  test("IVF drift ratio: ~1 on same-distribution growth, monotone under planted drift") {
    val base = emb.filter(col("vec_id") < 300)
    val dir = tmp("graft-ivf-drift")
    IvfIndex.build(base, cents, dir)
    // freshly built: current corpus == build corpus, ratio exactly 1
    assert(math.abs(IvfIndex.driftRatio(spark, dir, cents) - 1.0) < 1e-12,
      "just-built index must measure ratio 1 against its own baseline")
    assert(!IvfIndex.needsRebuild(spark, dir, cents))
    // same-distribution append (held-out slice): ratio stays near 1
    IvfIndex.append(emb.filter(col("vec_id") >= 300), cents, dir)
    val rClean = IvfIndex.driftRatio(spark, dir, cents)
    assert(rClean > 0.3 && rClean < 3.0,
      s"same-distribution append measured ratio $rClean — not stationary")
    assert(!IvfIndex.needsRebuild(spark, dir, cents, threshold = 4.0))

    // planted drift: scaled-away copies land in the quantizer's tails
    val dir2 = tmp("graft-ivf-drift2")
    IvfIndex.build(base, cents, dir2)
    IvfIndex.append(scaled(base, 4.0f, 10000000L), cents, dir2)
    val r4 = IvfIndex.driftRatio(spark, dir2, cents)
    assert(r4 > 4.0, s"4x-scaled append measured ratio $r4 — drift missed")
    assert(IvfIndex.needsRebuild(spark, dir2, cents),
      "drifted index must call for a rebuild")
    // monotone: a further-out batch measures strictly more
    val dir3 = tmp("graft-ivf-drift3")
    IvfIndex.build(base, cents, dir3)
    IvfIndex.append(scaled(base, 8.0f, 10000000L), cents, dir3)
    val r8 = IvfIndex.driftRatio(spark, dir3, cents)
    assert(r8 > r4, s"ratio must grow with drift: 8x=$r8 <= 4x=$r4")
    // rebuild resets the baseline: ratio returns to 1
    IvfIndex.rebuild(spark, dir2, cents)
    assert(math.abs(IvfIndex.driftRatio(spark, dir2, cents) - 1.0) < 1e-12,
      "rebuild must reset the drift baseline")
    assert(!IvfIndex.needsRebuild(spark, dir2, cents))
  }

  test("IVF drift planted ONLY in revised rows is detected at full strength") {
    val base = emb.filter(col("vec_id") < 300)
    val dir = tmp("graft-ivf-drift-rev")
    IvfIndex.build(base, cents, dir)
    // revise ~1/7 of the corpus IN PLACE to 4x-scaled embeddings
    // (power-of-two float scaling is exact): under the old diluted
    // whole-corpus basis this measures ≈ 0.86·1 + 0.14·16 ≈ 3, but the
    // registry-known post-build basis isolates exactly the revised
    // rows and measures the full ≈16x quantization-error blowup
    val revised = base.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), e => (e * lit(4.0f)).cast("float"))
          .as("embedding"))
    IvfIndex.upsert(revised, cents, dir, rev = 1L)
    val r = IvfIndex.driftRatio(spark, dir, cents)
    assert(r > 8.0,
      s"revision-planted drift measured $r — diluted, not isolated")
    assert(IvfIndex.needsRebuild(spark, dir, cents))
    // and a same-distribution revision stays stationary
    val dir2 = tmp("graft-ivf-drift-rev2")
    IvfIndex.build(base, cents, dir2)
    IvfIndex.upsert(
      base.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id"), col("embedding")), cents, dir2, rev = 1L)
    val rSame = IvfIndex.driftRatio(spark, dir2, cents)
    assert(rSame > 0.3 && rSame < 3.0,
      s"same-content revision measured ratio $rSame — not stationary")
  }

  test("PQ codebook drift ratio: ~1 on same-distribution batches, monotone under planted drift") {
    val base = emb.filter(col("vec_id") < 300)
    val dir = tmp("graft-pq-drift")
    IvfPqIndex.build(base, cents, dir)
    // the build corpus itself measures exactly 1
    assert(math.abs(IvfPqIndex.driftRatio(spark, dir, base) - 1.0) < 1e-12)
    assert(!IvfPqIndex.needsRebuild(spark, dir, base))
    // a held-out same-distribution batch stays near 1
    val held = emb.filter(col("vec_id") >= 300)
    val rClean = IvfPqIndex.driftRatio(spark, dir, held)
    assert(rClean > 0.3 && rClean < 3.0,
      s"same-distribution batch measured ratio $rClean")
    // planted drift is monotone and trips the decision
    val r4 = IvfPqIndex.driftRatio(spark, dir, scaled(base, 4.0f, 0L))
    val r8 = IvfPqIndex.driftRatio(spark, dir, scaled(base, 8.0f, 0L))
    assert(r4 > 2.0 && r8 > r4,
      s"PQ drift not monotone: 4x=$r4, 8x=$r8")
    assert(IvfPqIndex.needsRebuild(spark, dir, scaled(base, 4.0f, 0L)))
    assert(!IvfPqIndex.needsRebuild(spark, dir,
      scaled(base, 4.0f, 0L).limit(0)),
      "an empty (unmeasurable) batch must not trigger a rebuild")
  }
}
