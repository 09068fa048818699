package graft.scale

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Object-store realism (round-18 verdict item 6): every listing and
  * swap claim in the scale layer was demonstrated on ext4 — atomic
  * directory rename, free LISTs. [[SlowFs]] injects S3-class
  * semantics over the same local bytes, and this spec pins three
  * things under them:
  *  1. serving an index through a LIST-delayed scheme is RESULT-
  *     identical to the local read (the shim changes cost, never
  *     content), and the generation handle machinery works across
  *     schemes;
  *  2. the shim's non-atomic rename really tears mid-swap, and
  *     [[Maintenance.healSwap]] REFUSES the resulting
  *     tmp ∧ target ∧ retired state loudly instead of guessing which
  *     side is complete (the silent-vacuum data loss the atomic-rename
  *     assumption was hiding);
  *  3. the torn state preserves every entry — union(src, dst) is
  *     complete — so the documented manual recovery is real.
  * The handle-vs-per-read cost gap under LIST delay is a BenchScale
  * measurement (`ivf_probe_slowlist` / `ivf_probe_handle_slowlist`),
  * not a spec assertion — timing asserts flake; artifacts measure. */
class ObjectStoreRealismSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$d/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private def docs = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("text"))

  private def enableSlowFs(listDelayMs: Long): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.slowfs.impl", "graft.scale.SlowFs")
    hc.setLong("fs.slowfs.list.delay.ms", listDelayMs)
  }

  test("an IVF index serves RESULT-identically through the LIST-delayed " +
      "scheme, and the generation handle refuses staleness across it") {
    enableSlowFs(1L)
    val cents = Similarity.strideCentroids(emb, stride = 50)
      .localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-slowfs-serve").toString + "/idx"
    IvfIndex.build(emb.filter(col("vec_id") < 300), cents, dir)
    val queries = emb.filter(col("vec_id") < 5).localCheckpoint()
    def results(path: String) =
      IvfIndex.topK(spark, path, queries, cents, k = 5)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
    val local = results(dir)
    assert(local.nonEmpty)
    assert(results(s"slowfs:$dir") == local,
      "slowfs read diverged from the local read — the shim must change " +
        "cost only, never content")
    // the handle works through the scheme, including staleness refusal
    val h = IvfIndex.openHandle(spark, s"slowfs:$dir")
    assert(h.generation.nonEmpty)
    assert(IvfIndex.topKWith(spark, h, queries, cents, k = 5, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq == local)
    IvfIndex.rebuild(spark, dir, cents)
    intercept[StaleHandleException] {
      IvfIndex.topKWith(spark, h, queries, cents, k = 5, nProbe = 3)
        .collect()
    }
    val h1 = IvfIndex.reopen(spark, h)
    assert(IvfIndex.topKWith(spark, h1, queries, cents, k = 5,
      nProbe = 3).count() > 0L)
  }

  test("a non-atomic rename tears mid-swap; healSwap REFUSES the " +
      "impossible-under-atomicity state instead of vacuuming a " +
      "possibly-only-complete copy") {
    enableSlowFs(0L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-torn").toString + "/idx"
    BmIndex.build(docs.filter(col("doc_id") < 200), dir)
    // a completed fold staged at .__compact (the state right before
    // the retire rename)
    BmIndex.compactTo(spark, dir, dir + ".__compact")
    // the retire rename, through the shim's non-atomic mode, crashing
    // after one moved entry — the S3-class torn state
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("fs.slowfs.impl", "graft.scale.SlowFs")
    conf.setBoolean("fs.slowfs.rename.nonatomic", true)
    conf.setInt("fs.slowfs.rename.failafter", 1)
    val fs = FileSystem.newInstance(
      java.net.URI.create("slowfs:///"), conf)
    try {
      val beforeEntries = fs.listStatus(new Path(s"slowfs:$dir"))
        .map(_.getPath.getName).toSet
      assert(beforeEntries.size > 1,
        "fixture needs several entries for a mid-move tear")
      val ex = intercept[java.io.IOException] {
        fs.rename(new Path(s"slowfs:$dir"),
          new Path(s"slowfs:$dir.__retired"))
      }
      assert(ex.getMessage.contains("injected crash"))
      // the torn state: entries SPLIT across the two names, both dirs
      // present — and nothing lost (union is complete)
      val atSrc = fs.listStatus(new Path(s"slowfs:$dir"))
        .map(_.getPath.getName).toSet
      val atDst = fs.listStatus(new Path(s"slowfs:$dir.__retired"))
        .map(_.getPath.getName).toSet
      assert(atSrc.nonEmpty && atDst.nonEmpty,
        "the injected crash must leave entries on BOTH sides")
      assert((atSrc ++ atDst) == beforeEntries && (atSrc & atDst).isEmpty,
        "per-entry move must preserve every entry exactly once")
      // healSwap sees tmp ∧ target ∧ retired — a state atomic renames
      // cannot produce — and must refuse, not guess
      val heal = intercept[java.io.IOException] {
        Maintenance.healSwap(spark, dir)
      }
      assert(heal.getMessage.contains("cannot produce"))
      // the widened diagnosis names BOTH producible causes (round-19
      // advisor): the non-atomic tear and the crashed mis-publish unwind
      assert(heal.getMessage.contains("non-atomic"))
      assert(heal.getMessage.contains("UNWIND"))
      // the refusal preserved all three dirs for manual recovery
      assert(fs.exists(new Path(s"slowfs:$dir")))
      assert(fs.exists(new Path(s"slowfs:$dir.__retired")))
      assert(fs.exists(new Path(s"slowfs:$dir.__compact")))
    } finally fs.close()
  }

  test("healSwap completes a crashed mis-publish unwind: target shell " +
      "without _generation is never mistaken for a clean publish, the " +
      "pre-fold layout is restored, and the racing register's pins " +
      "survive") {
    // The round-19 advisor's window: compactInPlace's publish rename
    // nested the fold into a register-recreated target, and the crash
    // hit BEFORE the unwind completed. On-disk names then read
    // tmp ABSENT ∧ target ∧ retired — the same names as a clean
    // post-publish crash — but target is a shell holding only the
    // racing register's _pins and the nested fold, no direct
    // _generation. The old heal vacuumed retired here, destroying the
    // only complete pre-fold copy at its published name.
    val base = java.nio.file.Files
      .createTempDirectory("graft-unwind").toString
    val dir = base + "/idx"
    BmIndex.build(docs.filter(col("doc_id") < 200), dir)
    val qTerms = docs.filter(col("doc_id") === 1)
      .select(explode(split(col("text"), " ")).as("term"))
      .distinct().orderBy(col("term").asc).limit(8)
    val want = BmIndex.topK(spark, dir, qTerms, k = 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(want.nonEmpty)
    // stage the window mechanically: completed fold, retire rename,
    // racing register's mkdirs + pin, publish rename nesting the fold
    val fs = new Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    BmIndex.compactTo(spark, dir, s"$dir.__compact")
    IndexIo.stampGeneration(spark, s"$dir.__compact")
    assert(fs.rename(new Path(dir), new Path(s"$dir.__retired")))
    assert(fs.mkdirs(new Path(s"$dir/_pins")))
    val pin = fs.create(new Path(s"$dir/_pins/run1.json"))
    pin.write("""{"run":"run1","epoch":0}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    pin.close()
    assert(fs.rename(new Path(s"$dir.__compact"),
      new Path(s"$dir/idx.__compact")))
    assert(!fs.exists(new Path(s"$dir.__compact")) &&
      fs.exists(new Path(dir)) && fs.exists(new Path(s"$dir.__retired")),
      "staging must produce the tmp-absent ∧ target ∧ retired shape")
    Maintenance.healSwap(spark, dir)
    // the pre-fold layout is back at its published name, the pins
    // survived into it, and no swap residue remains
    assert(BmIndex.topK(spark, dir, qTerms, k = 10)
      .as[(Int, Long, Long, Long)].collect().toSeq == want,
      "heal must restore the pre-fold layout, not the discarded fold")
    assert(Maintenance.pinnedEpochs(spark, dir) == Seq(("run1", 0L)),
      "the racing register's pin must survive the heal")
    assert(!fs.exists(new Path(s"$dir.__retired")))
    assert(!fs.exists(new Path(s"$dir.__compact")))
    assert(!fs.exists(new Path(s"$dir/idx.__compact")))
    // and a CLEAN post-publish crash still vacuums the leak: stage
    // target-with-_generation ∧ retired, heal, expect the leak gone
    // and the published layout untouched
    val dir2 = base + "/idx2"
    BmIndex.build(docs.filter(col("doc_id") < 150), dir2)
    IndexIo.stampGeneration(spark, dir2)
    assert(fs.mkdirs(new Path(s"$dir2.__retired/old")))
    val want2 = BmIndex.topK(spark, dir2, qTerms, k = 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    Maintenance.healSwap(spark, dir2)
    assert(!fs.exists(new Path(s"$dir2.__retired")))
    assert(BmIndex.topK(spark, dir2, qTerms, k = 10)
      .as[(Int, Long, Long, Long)].collect().toSeq == want2)
  }

  test("atomic-mode slowfs rename keeps the swap protocol whole: a " +
      "fold through the shim publishes and serves") {
    enableSlowFs(1L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-slowfold").toString + "/idx"
    BmIndex.build(docs.filter(col("doc_id") < 200), dir)
    BmIndex.append(docs.filter(col("doc_id") >= 200 &&
      col("doc_id") < 260), dir)
    val qTerms = docs.filter(col("doc_id") === 1)
      .select(explode(split(col("text"), " ")).as("term"))
      .distinct().orderBy(col("term").asc).limit(8)
    val want = BmIndex.topK(spark, dir, qTerms, k = 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    // the whole fold addressed through the slowfs scheme: compactTo
    // reads+writes and both swap renames run against the shim (atomic
    // mode — the default; non-atomic stores must use pointer publish,
    // the case above)
    assert(Maintenance.compactInPlace(spark, s"slowfs:$dir",
      BmIndex.compactTo(spark, _, _)))
    assert(BmIndex.committedEpoch(spark, dir) == 0L,
      "the fold through the shim must re-base history")
    assert(BmIndex.topK(spark, dir, qTerms, k = 10)
      .as[(Int, Long, Long, Long)].collect().toSeq == want,
      "post-fold serve diverged across the shim")
  }
}
