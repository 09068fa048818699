package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The run-level reproducibility pin: one manifest captures the
  * committed epoch of EVERY layout a run reads, and serving through
  * the pins is immutable under any amount of later ingest — the
  * composition of the 7/7 as-of matrix into the artifact an audit
  * actually consumes ("run X used THESE epochs of ALL its indexes"). */
class SnapshotManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("text"))
  private def emb = spark.read.parquet(s"$d/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("pinned serves are immutable under later ingest on every pinned layout") {
    val root = tmp("graft-manifest")
    val bm = s"$root/bm"
    val lsh = s"$root/lsh"
    val ivf = s"$root/ivf"
    val cents = Similarity.strideCentroids(emb, 50).localCheckpoint()
    BmIndex.build(docs.filter(col("doc_id") < 300), bm)
    LshIndex.build(docs.filter(col("doc_id") < 300), lsh)
    IvfIndex.build(emb.filter(col("vec_id") < 300), cents, ivf)

    val pins = SnapshotManifest.capture(spark, Seq(
      ("retrieval", "bm", bm), ("dedup", "lsh", lsh), ("ann", "ivf", ivf)))
    assert(pins.map(p => p.name -> p.epoch).toMap ==
      Map("retrieval" -> 0L, "dedup" -> 0L, "ann" -> 0L))
    val path = s"$root/manifest"
    SnapshotManifest.write(spark, pins, path)
    assert(SnapshotManifest.read(spark, path).toSet == pins.toSet,
      "manifest roundtrip lost pins")

    // the pinned state, recorded BEFORE the mutations below
    val qTerms = docs.filter(col("doc_id") === 1)
      .select(explode(split(col("text"), " ")).as("term"))
      .distinct().orderBy(col("term").asc).limit(8).localCheckpoint()
    val probe = docs.filter(col("doc_id") >= 400)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val queries = emb.filter(col("vec_id") === 1).localCheckpoint()
    def serveAll(ps: Seq[SnapshotManifest.Pin]) = (
      BmIndex.topKAsOf(spark, bm, qTerms, 10,
        SnapshotManifest.epochOf(ps, "retrieval"))
        .as[(Int, Long, Long, Long)].collect().toSeq,
      LshIndex.dedupBatchAsOf(spark, lsh, probe, 8,
          SnapshotManifest.epochOf(ps, "dedup"))
        .orderBy(col("new_doc"), col("corpus_doc"))
        .as[(Long, Long, Long)].collect().toSeq,
      IvfIndex.topKAsOf(spark, ivf, queries, cents, 5,
          SnapshotManifest.epochOf(ps, "ann"))
        .orderBy("query_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq)
    val before = serveAll(pins)

    // history moves on, on every layout at once
    BmIndex.append(docs.filter(col("doc_id") >= 300 &&
      col("doc_id") < 400), bm)
    BmIndex.delete(Seq(7L).toDF("doc_id"), bm)
    LshIndex.append(docs.filter(col("doc_id") >= 300 &&
      col("doc_id") < 400), lsh)
    LshIndex.delete(Seq(7L).toDF("doc_id"), lsh)
    IvfIndex.append(emb.filter(col("vec_id") >= 300), cents, ivf)
    IvfIndex.delete(Seq(8L).toDF("vec_id"), ivf)

    // the pinned view is bit-stable; a fresh capture pins the new state
    assert(serveAll(SnapshotManifest.read(spark, path)) == before,
      "pinned serves changed under later ingest")
    val now = SnapshotManifest.capture(spark, Seq(
      ("retrieval", "bm", bm), ("dedup", "lsh", lsh), ("ann", "ivf", ivf)))
    assert(now.forall(_.epoch == 2L),
      s"post-ingest capture must pin the new epochs, got $now")
    assert(serveAll(now) != before,
      "fixture mutations left no observable trace — the immutability " +
        "assertion above would be vacuous")
  }

  test("pin markers are well-formed JSON under hostile names, and " +
      "re-registration replaces without an un-pinned window " +
      "(round-17 advisor)") {
    val root = tmp("graft-manifest-escape")
    val bm = s"$root/bm"
    BmIndex.build(docs.filter(col("doc_id") < 100), bm)
    // a pin name carrying quotes, backslashes, and a control char must
    // serialize to parseable JSON (the marker is a durable audit
    // artifact other tools read back)
    val hostile = SnapshotManifest.Pin(
      "re\"trie\\val\nx", "bm", bm, 0L)
    SnapshotManifest.register(spark, Seq(hostile), "runq")
    val marker = new org.apache.hadoop.fs.Path(s"$bm/_pins/runq.json")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    val body = {
      val in = fs.open(marker)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    }
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(body) // throws if torn
    assert((j \ "name").extract[String] == "re\"trie\\val\nx",
      "escaping must round-trip the hostile name")
    assert((j \ "epoch").extract[Long] == 0L)
    assert(Maintenance.pinnedEpochs(spark, bm) == Seq(("runq", 0L)))
    // re-register under the same run name replaces the marker; at no
    // point may the pin be ABSENT (rename-over-existing, not
    // delete-then-rename) — observable here as: the marker exists
    // before, exists after, and carries the new epoch
    BmIndex.append(docs.filter(col("doc_id") >= 100 &&
      col("doc_id") < 150), bm)                          // epoch 1
    val rePin = SnapshotManifest.capture(spark, Seq(("lex", "bm", bm)))
    SnapshotManifest.register(spark, rePin, "runq")
    assert(Maintenance.pinnedEpochs(spark, bm) == Seq(("runq", 1L)),
      "re-registration must replace the marker with the new epoch")
  }

  test("refusals: cold layouts cannot be pinned, unknown names cannot be looked up") {
    val root = tmp("graft-manifest-refuse")
    intercept[IllegalArgumentException] {
      SnapshotManifest.capture(spark, Seq(("x", "bm", s"$root/nothing")))
    }
    intercept[IllegalArgumentException] {
      SnapshotManifest.capture(spark, Seq(("x", "nosuch", s"$root/n")))
    }
    intercept[IllegalArgumentException] {
      SnapshotManifest.epochOf(Seq.empty, "x")
    }
  }
}
