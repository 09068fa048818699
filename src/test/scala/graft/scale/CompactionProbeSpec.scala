package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shared compaction-need probe (round-14 verdict item 9): every
  * layout's CDC story leans on "compaction folds it" — this spec pins
  * the metric that makes the discipline operable. Fresh layouts read
  * healthy; append decay (files piling per bucket) and CDC decay
  * (rev/tombstone state growing against the main tree) each trip the
  * probe; the layout's own compaction verb resets it. */
class CompactionProbeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("idx").toString

  private def zrows(lo: Long, hi: Long): DataFrame =
    (lo until hi).map(i => (i, i % 16L, i / 16L % 16L))
      .toDF("id", "x", "y")

  test("z layout: fresh healthy, append decay trips files/bucket, fold resets") {
    val dir = tmp("graft-probe-z")
    Layout.writeZOrdered(zrows(0, 256), col("x"), col("y"), dir,
      bucketWidth = 64L, bits = 4)
    val fresh = Layout.compactionStats(spark, dir)
    assert(fresh.buckets > 0 && fresh.filesPerBucket <= 2.0,
      s"fresh layout reads decayed: $fresh")
    assert(!Layout.needsCompaction(spark, dir))
    // ten appends land ~one file per touched bucket each
    (0 until 10).foreach { i =>
      Layout.appendZOrdered(zrows(256 + i * 16, 256 + (i + 1) * 16),
        col("x"), col("y"), dir, bucketWidth = 64L, bits = 4)
    }
    val decayed = Layout.compactionStats(spark, dir)
    assert(decayed.filesPerBucket > fresh.filesPerBucket,
      s"appends did not decay geometry: $fresh -> $decayed")
    assert(Layout.needsCompaction(spark, dir,
      maxFilesPerBucket = fresh.filesPerBucket + 1.0),
      "append decay must trip the probe")
    // the fold resets the geometry
    val dest = tmp("graft-probe-z-dst")
    Layout.compactZOrderedTo(spark, dir, dest)
    val folded = Layout.compactionStats(spark, dest)
    assert(folded.filesPerBucket <= fresh.filesPerBucket + 0.01,
      s"fold did not reset geometry: $folded")
    assert(!Layout.needsCompaction(spark, dest))
  }

  test("z layout: CDC decay (revisions + tombstones) trips the fraction, fold resets") {
    val dir = tmp("graft-probe-zcdc")
    Layout.writeZOrdered(zrows(0, 64), col("x"), col("y"), dir,
      bucketWidth = 64L, bits = 4)
    assert(Layout.compactionStats(spark, dir).cdcFraction == 0.0)
    // revise half the rows and tombstone a quarter: the side state is
    // now a large fraction of the (tiny) main tree
    Layout.upsertZOrdered(zrows(0, 32).withColumn("x", col("x") + 1L),
      "id", col("x"), col("y"), dir, rev = 1L, bucketWidth = 64L, bits = 4)
    Layout.deleteZOrdered(spark.range(32, 48).select(col("id")), "id", dir)
    val decayed = Layout.compactionStats(spark, dir)
    assert(decayed.cdcFraction > 0.1,
      s"heavy rev+tombstone state must show in the fraction: $decayed")
    assert(Layout.needsCompaction(spark, dir, maxCdcFraction = 0.1))
    val dest = tmp("graft-probe-zcdc-dst")
    Layout.compactZOrderedTo(spark, dir, dest, foldRevisionsBy = Some("id"))
    val folded = Layout.compactionStats(spark, dest)
    assert(folded.cdcBytes == 0L && folded.cdcFraction == 0.0,
      s"fold must clear the CDC state: $folded")
    assert(!Layout.needsCompaction(spark, dest))
  }

  test("cluster store: epoch-depth and tombstone fraction trip; compactTo resets") {
    val dir = tmp("graft-probe-cs")
    def ch(d: Long, h: Long) = Seq((d, h)).toDF("doc_id", "chunk_hash")
    ClusterStore.build(ch(1L, 100L).unionByName(ch(2L, 100L)), dir)
    assert(!ClusterStore.needsCompaction(spark, dir, maxEpochs = 3L,
      maxCdcFraction = 10.0))
    ClusterStore.append(ch(3L, 100L), dir) // epoch 1
    ClusterStore.append(ch(4L, 200L), dir) // epoch 2
    ClusterStore.append(ch(5L, 200L), dir) // epoch 3
    assert(ClusterStore.needsCompaction(spark, dir, maxEpochs = 3L,
      maxCdcFraction = 10.0),
      "epoch depth past the bound must trip (chain depth = resolve cost)")
    // tombstone fraction trips independently of depth
    ClusterStore.delete(Seq(3L, 4L).toDF("doc_id"), dir)
    assert(ClusterStore.needsCompaction(spark, dir, maxEpochs = 100L,
      maxCdcFraction = 0.05),
      "tombstone bytes past the fraction must trip")
    val dest = tmp("graft-probe-cs-dst")
    ClusterStore.compactTo(spark, dir, dest)
    assert(!ClusterStore.needsCompaction(spark, dest, maxEpochs = 3L,
      maxCdcFraction = 0.5),
      "compacted store must read healthy (epoch 0, no tombstones)")
  }

  test("LSH index: append decay and rev/tombstone fraction are both visible") {
    val dir = tmp("graft-probe-lsh")
    def docs(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, s"alpha beta gamma delta epsilon token$i tail$i"))
      .toDF("doc_id", "text")
    LshIndex.build(docs(0, 40), dir)
    val fresh = LshIndex.compactionStats(spark, dir)
    assert(!LshIndex.needsCompaction(spark, dir))
    (0 until 6).foreach(i => LshIndex.append(docs(40 + i * 5, 45 + i * 5), dir))
    val decayed = LshIndex.compactionStats(spark, dir)
    assert(decayed.filesPerBucket > fresh.filesPerBucket,
      s"appends invisible to the probe: $fresh -> $decayed")
    LshIndex.delete(spark.range(0, 20).select(col("id").as("doc_id")), dir)
    assert(LshIndex.compactionStats(spark, dir).cdcBytes > 0L,
      "tombstones invisible to the probe")
    val dest = tmp("graft-probe-lsh-dst")
    LshIndex.compactTo(spark, dir, dest)
    val folded = LshIndex.compactionStats(spark, dest)
    // compactTo writes explicit ZERO-ROW registry/tombstone files so a
    // reused destination cannot leak a previous life — the probe sees
    // their ~700 bytes of parquet footer, so the reset assertion is on
    // the FRACTION (the decision input), not on literal zero bytes
    assert(folded.cdcFraction < 0.01 &&
      folded.filesPerBucket <= fresh.filesPerBucket + 0.01,
      s"compactTo must reset both axes: $folded")
    assert(!LshIndex.needsCompaction(spark, dest))
  }
}
