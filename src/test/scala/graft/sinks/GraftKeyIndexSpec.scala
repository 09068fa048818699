package graft.sinks

import java.io.{ByteArrayOutputStream, ObjectOutputStream}
import java.nio.file.Files
import java.util.ConcurrentModificationException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.write.LogicalWriteInfo
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

import graft.scale.SparkTestSession

/** Scale path for the block store's first-writer-wins check: sharded
  * key index + bloom probe (never the exact key set in a task closure),
  * legacy-store adoption, and the cross-driver lease. */
class GraftKeyIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(batch: String, n: Int) =
    (0 until n).map(i => (batch, i, "staging", s"Main/$batch.md",
      "text", s"$batch-$i", null: String, null: String))
      .toDF("blockBatch", "blockIndex", "bucket", "key",
        "blockType", "title", "language", "caption")

  private def freshDir(): String =
    Files.createTempDirectory("graft-keyidx").toString

  private def fsFor(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def qualified(dir: String): Path =
    fsFor(dir).makeQualified(new Path(dir))

  private def javaSize(o: AnyRef): Int = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(o); oos.close()
    bos.size()
  }

  test("writer-factory closure ships a constant-size bloom, not the key set") {
    val dir = freshDir()
    val root = qualified(dir)
    val fs = fsFor(dir)
    // fabricate a store with many committed keys straight through the
    // log (no data needed for the planning-size question)
    val manyKeys = (0 until 100000).map(i => f"batch-$i%06d-${i * 2654435761L}%x")
    GraftBlocksLog.lockFor(root.toString).synchronized {
      val v = GraftBlocksLog.appendEntry(fs, root,
        GraftLogEntry(None, Nil, manyKeys, 0L))
      GraftKeyIndex.heal(fs, root, Seq((v, GraftLogEntry(None, Nil, manyKeys, 0L))))
    }
    assert(GraftKeyIndex.exists(fs, root), "bloom must exist after heal")

    val table = new GraftBlocksTableSink(dir,
      GraftBlocksTableSink.DefaultSchema, "blockBatch")
    val info = new LogicalWriteInfo {
      override def queryId(): String = "plan-size"
      override def schema(): StructType = GraftBlocksTableSink.DefaultSchema
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
    }
    val factory = table.newWriteBuilder(info).build().toBatch
      .createBatchWriterFactory(null)
    // the factory's size is bloom + serialized Hadoop conf — constant in
    // the key count, where the exact set grows linearly
    val factoryBytes = javaSize(factory)
    val exactSetBytes = javaSize(manyKeys.toSet)
    assert(factoryBytes * 4 < exactSetBytes,
      s"factory ($factoryBytes B) must be far smaller than the exact key " +
        s"set ($exactSetBytes B)")

    // and the probe is still exact: dup keys dropped, new keys land
    rows(manyKeys.head, 2).union(rows(manyKeys.last, 1)).union(rows("new-a", 3))
      .write.format("graft-blocks").option("path", dir).mode("append").save()
    val stored = GraftBlocksStore.read(spark, dir)
    assert(stored.groupBy("blockBatch").count().as[(String, Long)]
      .collect().toMap == Map("new-a" -> 3L))
  }

  test("first-writer-wins across many committed keys via bloom + shard verify") {
    val dir = freshDir()
    rows("k1", 2).union(rows("k2", 3)).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    // index now exists; second write plans from the bloom
    assert(GraftKeyIndex.exists(fsFor(dir), qualified(dir)))
    rows("k2", 3).union(rows("k3", 1)).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    val stored = GraftBlocksStore.read(spark, dir)
    assert(stored.groupBy("blockBatch").count().as[(String, Long)]
      .collect().toMap == Map("k1" -> 2L, "k2" -> 3L, "k3" -> 1L))
    // shard files + watermark agree with the ledger
    val fs = fsFor(dir)
    val root = qualified(dir)
    assert(GraftKeyIndex.committedAmong(fs, root,
      Seq("k1", "k2", "k3", "k4")) == Set("k1", "k2", "k3"))
    assert(GraftKeyIndex.readWatermark(fs, root) >= 1L)
  }

  test("index drift (crash between publish and index) heals at next commit") {
    val dir = freshDir()
    rows("d1", 2).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    val fs = fsFor(dir)
    val root = qualified(dir)
    // simulate a crash that lost the whole index
    fs.delete(GraftKeyIndex.indexDir(root), true)
    assert(!GraftKeyIndex.exists(fs, root))
    // replaying d1 must STILL dedupe: planning falls back to the exact
    // entries-derived set while the index is gone, commit heals it
    rows("d1", 2).union(rows("d2", 5)).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    val stored = GraftBlocksStore.read(spark, dir)
    assert(stored.groupBy("blockBatch").count().as[(String, Long)]
      .collect().toMap == Map("d1" -> 2L, "d2" -> 5L))
    assert(GraftKeyIndex.exists(fs, root), "commit must rebuild the index")
    assert(GraftKeyIndex.committedAmong(fs, root, Seq("d1", "d2")) ==
      Set("d1", "d2"))
  }

  test("pre-sink parquet at the root is adopted on first sink commit") {
    val dir = freshDir()
    // the foreachBatch-era layout: bare parquet files at the root
    rows("old1", 3).union(rows("old2", 2)).coalesce(1)
      .write.mode("append").parquet(dir)
    // first sink write replays old2 and adds b1
    rows("old2", 2).union(rows("b1", 4)).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    val stored = GraftBlocksStore.read(spark, dir)
    assert(stored.groupBy("blockBatch").count().as[(String, Long)]
      .collect().toMap ==
      Map("old1" -> 3L, "old2" -> 2L, "b1" -> 4L),
      "legacy rows must stay visible and legacy keys must dedupe")
    assert(GraftBlocksStore.committedKeys(spark, dir) ==
      Set("old1", "old2", "b1"))
    // the root holds no unlogged parquet any more
    val fs = fsFor(dir)
    assert(!fs.listStatus(new Path(dir))
      .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
  }

  test("a live foreign lease refuses the commit; an expired one is stolen") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    GraftStoreLease.acquire(fs, root, ownerId = "other-driver")
    val ex = intercept[Exception] {
      rows("x1", 2).write.format("graft-blocks")
        .option("path", dir).mode("append").save()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(_.isInstanceOf[ConcurrentModificationException]),
      s"expected lease refusal, got $ex")
    assert(GraftBlocksStore.read(spark, dir).isEmpty)

    // age the foreign lease past expiry — next commit steals it. Liveness
    // is max(mtime, body timestamp), so BOTH must be aged: rewrite the
    // body with a stale heartbeat and push the mtime back too.
    val lease = GraftStoreLease.leaseFile(root)
    val stale = System.currentTimeMillis() - GraftStoreLease.DefaultExpiryMs - 60000
    val out = fs.create(lease, true)
    try out.write(s"other-driver\n$stale".getBytes("UTF-8")) finally out.close()
    fs.setTimes(lease, stale, -1)
    rows("x1", 2).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    assert(GraftBlocksStore.read(spark, dir).count() == 2)
    assert(GraftStoreLease.currentOwner(fs, root).map(_._1)
      .contains(GraftStoreLease.jvmOwnerId))

    // release is owner-guarded
    GraftStoreLease.release(fs, root, "not-the-owner")
    assert(GraftStoreLease.currentOwner(fs, root).isDefined)
    GraftStoreLease.release(fs, root)
    assert(GraftStoreLease.currentOwner(fs, root).isEmpty)
  }

  test("heartbeat rewrites the lease (no setTimes) and self-expiry refuses renewal") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    GraftStoreLease.acquire(fs, root, ownerId = "hb-owner")
    val hb1 = GraftStoreLease.currentOwner(fs, root).get._2
    Thread.sleep(5)
    // renewal must advance the BODY timestamp — the heartbeat that
    // object-store filesystems (setTimes no-op) would otherwise lose
    GraftStoreLease.acquire(fs, root, ownerId = "hb-owner")
    val hb2 = GraftStoreLease.currentOwner(fs, root).get._2
    assert(hb2 > hb1, s"renewal must advance the heartbeat ($hb1 -> $hb2)")

    // an owner whose OWN lease expired re-acquires through the steal
    // arbitration (no in-place renew, but no permanent wedge either)
    val stale = System.currentTimeMillis() - GraftStoreLease.DefaultExpiryMs - 60000
    val lease = GraftStoreLease.leaseFile(root)
    val out = fs.create(lease, true)
    try out.write(s"hb-owner\n$stale".getBytes("UTF-8")) finally out.close()
    fs.setTimes(lease, stale, -1)
    GraftStoreLease.acquire(fs, root, ownerId = "hb-owner")
    val Some((owner3, hb3)) = GraftStoreLease.currentOwner(fs, root)
    assert(owner3 == "hb-owner" &&
      System.currentTimeMillis() - hb3 < GraftStoreLease.DefaultExpiryMs,
      "expired self-lease must be re-acquired fresh, not wedged")

    // ...but a thief who got there first still refuses the old owner
    val out2 = fs.create(lease, true)
    try out2.write(s"thief\n${System.currentTimeMillis()}".getBytes("UTF-8"))
    finally out2.close()
    intercept[ConcurrentModificationException] {
      GraftStoreLease.acquire(fs, root, ownerId = "hb-owner")
    }
    GraftStoreLease.release(fs, root, "thief")
  }

  test("log checkpoints bound the replay tail; correctness spans the boundary") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    System.setProperty("graft.blocks.checkpointInterval", "3")
    try {
      // versions 0..4 — a checkpoint lands at v3
      (0 until 5).foreach { i =>
        rows(s"cp$i", 2).write.format("graft-blocks")
          .option("path", dir).mode("append").save()
      }
      val logFiles = fs.listStatus(GraftBlocksLog.logDir(root))
        .map(_.getPath.getName)
      assert(logFiles.exists(_.startsWith("_checkpoint.")),
        s"expected a checkpoint among ${logFiles.toSeq}")
      val state = GraftBlocksLog.readState(fs, root)
      assert(state.checkpointVersion == 3L)
      assert(state.version == 4L)
      assert(state.tail.map(_._1) == Seq(4L),
        "post-checkpoint tail must hold only entries past the checkpoint")
      // reads see everything, across the boundary
      assert(GraftBlocksStore.read(spark, dir).count() == 10)
      // first-writer-wins still dedupes PRE-checkpoint keys
      rows("cp0", 2).union(rows("cp9", 1)).write.format("graft-blocks")
        .option("path", dir).mode("append").save()
      val counts = GraftBlocksStore.read(spark, dir)
        .groupBy("blockBatch").count().as[(String, Long)].collect().toMap
      assert(counts("cp0") == 2L && counts("cp9") == 1L && counts.size == 6)
      // lost index + checkpointed history → full-replay heal fallback
      fs.delete(GraftKeyIndex.indexDir(root), true)
      rows("cp1", 2).union(rows("cp8", 1)).write.format("graft-blocks")
        .option("path", dir).mode("append").save()
      val counts2 = GraftBlocksStore.read(spark, dir)
        .groupBy("blockBatch").count().as[(String, Long)].collect().toMap
      assert(counts2("cp1") == 2L && counts2("cp8") == 1L && counts2.size == 7)
      assert(GraftKeyIndex.exists(fs, root))
    } finally System.clearProperty("graft.blocks.checkpointInterval")
  }

  test("streaming epoch replay is a no-op across a checkpoint boundary") {
    val dir = freshDir()
    System.setProperty("graft.blocks.checkpointInterval", "2")
    try {
      val table = new GraftBlocksTableSink(dir,
        GraftBlocksTableSink.DefaultSchema, "blockBatch")
      val info = new LogicalWriteInfo {
        override def queryId(): String = "q-cp"
        override def schema(): StructType = GraftBlocksTableSink.DefaultSchema
        override def options(): CaseInsensitiveStringMap =
          new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
      }
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(GraftBlocksTableSink.DefaultSchema)
      val ser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(enc)
        .createSerializer()
      def writeEpoch(epoch: Long, batch: String): Unit = {
        val sw = table.newWriteBuilder(info).build().toStreaming
        val w = sw.createStreamingWriterFactory(null).createWriter(0, 7L, epoch)
        (0 until 3).foreach(i => w.write(ser(org.apache.spark.sql.Row(
          s"$batch", i, "staging", s"Main/$batch.md", "text", s"$batch-$i",
          null, null)).copy()))
        sw.commit(epoch, Array(w.commit()))
      }
      (0L until 4L).foreach(e => writeEpoch(e, s"e$e")) // checkpoint at v2
      assert(GraftBlocksStore.read(spark, dir).count() == 12)
      // replay an epoch whose txn is now BEHIND the checkpoint — the
      // folded txn set must still recognize it
      writeEpoch(0L, "e0")
      assert(GraftBlocksStore.read(spark, dir).count() == 12)
    } finally System.clearProperty("graft.blocks.checkpointInterval")
  }

  test("compaction rewrites small files atomically; vacuum reclaims inputs") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    // a stream's worth of small per-epoch files
    (0 until 6).foreach { i =>
      rows(s"m$i", 3).coalesce(1).write.format("graft-blocks")
        .option("path", dir).mode("append").save()
    }
    val dataD = GraftBlocksLog.dataDir(root)
    val before = fs.listStatus(dataD).count(_.isFile)
    assert(before >= 6)
    val expect = GraftBlocksStore.read(spark, dir)
      .groupBy("blockBatch").count().as[(String, Long)].collect().toMap

    val compacted = GraftBlocksStore.compact(spark, dir)
    assert(compacted == before, "all small files should compact")
    // one visible file now; contents identical
    val state = GraftBlocksLog.readState(fs, root)
    assert(state.files.size == 1 && state.files.head.startsWith("c-"))
    assert(GraftBlocksStore.read(spark, dir)
      .groupBy("blockBatch").count().as[(String, Long)].collect().toMap == expect)
    // keys and first-writer-wins untouched by compaction
    assert(GraftBlocksStore.committedKeys(spark, dir) == expect.keySet)
    rows("m0", 3).union(rows("m9", 1)).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    val after = GraftBlocksStore.read(spark, dir)
      .groupBy("blockBatch").count().as[(String, Long)].collect().toMap
    assert(after == expect + ("m9" -> 1L))

    // inputs still on disk (reader protection) until vacuum's horizon
    assert(fs.listStatus(dataD).count(_.isFile) > state.files.size)
    assert(GraftBlocksStore.vacuum(spark, dir) == 0, "inside retention: keep")
    val reclaimed = GraftBlocksStore.vacuum(spark, dir, retentionMs = -1000)
    assert(reclaimed == before, s"expected $before reclaimed, got $reclaimed")
    assert(GraftBlocksStore.read(spark, dir)
      .groupBy("blockBatch").count().as[(String, Long)].collect().toMap == after)
    // idempotent second pass
    assert(GraftBlocksStore.compact(spark, dir,
      smallerThan = 1024) >= 0)
  }

  test("key index agrees with a naive model under randomized commit batches") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    val hconf = new graft.sources.SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val rnd = new scala.util.Random(7)
    val committed = scala.collection.mutable.Set.empty[String]
    GraftBlocksLog.lockFor(root.toString).synchronized {
      for (_ <- 0 until 20) {
        val keys = Seq.fill(rnd.nextInt(50) + 1)(s"k${rnd.nextInt(500)}")
          .distinct.filterNot(committed)
        val v = GraftBlocksLog.appendEntry(fs, root,
          GraftLogEntry(None, Nil, keys, 0L))
        GraftKeyIndex.recordCommit(fs, root, v, keys)
        committed ++= keys
      }
    }
    val universe = (0 until 600).map(i => s"k$i")
    assert(GraftKeyIndex.committedAmong(fs, root, universe) == committed.toSet)
    // the task-side probe (bloom + shard verify) gives the same answers
    val probe = GraftKeyProbe.forStore(fs, root, hconf)
    universe.foreach { k =>
      assert(probe.committed(k) == committed(k), s"probe disagrees on $k")
    }
  }

  test("bloom rebuilds at larger capacity when the key count outgrows it") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    val many = (0 until (GraftKeyIndex.InitialBloomCapacity + 10000).toInt)
      .map(i => s"big-$i")
    GraftBlocksLog.lockFor(root.toString).synchronized {
      val v = GraftBlocksLog.appendEntry(fs, root,
        GraftLogEntry(None, Nil, many, 0L))
      GraftKeyIndex.recordCommit(fs, root, v, many)
      // per-commit path leaves the bloom alone; the fold (checkpoint
      // time in production) performs the capacity-growing rebuild
      GraftKeyIndex.foldBloom(fs, root, many, v)
    }
    val Some((expected, count, _)) = GraftKeyIndex.readBloom(fs, root)
    assert(count == many.size.toLong)
    assert(expected >= many.size * 4L, s"rebuild must grow capacity, got $expected")
    // exactness survives the rebuild
    assert(GraftKeyIndex.committedAmong(fs, root,
      Seq("big-0", s"big-${many.size - 1}", "absent")) ==
      Set("big-0", s"big-${many.size - 1}"))
  }

  test("steady-state commits never rewrite the bloom; folds ride checkpoints") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    System.setProperty("graft.blocks.checkpointInterval", "3")
    try {
      rows("s0", 1).write.format("graft-blocks")
        .option("path", dir).mode("append").save()
      assert(GraftKeyIndex.exists(fs, root), "first commit bootstraps the bloom")
      val t0 = fs.getFileStatus(GraftKeyIndex.bloomFile(root)).getModificationTime
      val c0 = GraftKeyIndex.readBloomFull(fs, root).get._3
      // v1, v2: steady-state — the bloom file must not be touched
      rows("s1", 1).write.format("graft-blocks")
        .option("path", dir).mode("append").save()
      rows("s2", 1).write.format("graft-blocks")
        .option("path", dir).mode("append").save()
      assert(fs.getFileStatus(GraftKeyIndex.bloomFile(root))
        .getModificationTime == t0,
        "per-commit path must not rewrite the bloom (O(new keys) contract)")
      // ...yet planning still sees the uncovered keys via the log tail
      val hconf = new graft.sources.SerializableHadoopConf(
        spark.sessionState.newHadoopConf())
      val probe = GraftKeyProbe.forStore(fs, root, hconf)
      assert(Seq("s0", "s1", "s2").forall(probe.committed))
      assert(!probe.committed("s-absent"))
      // v3 lands on the checkpoint interval: the fold advances coverage
      rows("s3", 1).write.format("graft-blocks")
        .option("path", dir).mode("append").save()
      val c3 = GraftKeyIndex.readBloomFull(fs, root).get._3
      assert(c3 > c0, s"checkpoint fold must advance coveredVersion ($c0 -> $c3)")
    } finally System.clearProperty("graft.blocks.checkpointInterval")
  }

  test("legacy plain _meta file is honored (no silent gen-0 reset)") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    // a store re-sharded by the short-lived plain-_meta build: single
    // replaced meta file naming gen 1 / 256 shards
    val keysDir = GraftKeyIndex.indexDir(root)
    fs.mkdirs(keysDir)
    val out = fs.create(new Path(keysDir, "_meta"), true)
    try out.write("1 256".getBytes("UTF-8")) finally out.close()
    assert(GraftKeyIndex.readMeta(fs, root) ==
      GraftKeyIndex.IndexMeta(1, 256),
      "plain _meta must be read, not reset to the gen-0/64 default " +
        "(which would make committed keys invisible)")
    // writes land in the gen-1 layout and remain readable
    GraftBlocksLog.lockFor(root.toString).synchronized {
      val v = GraftBlocksLog.appendEntry(fs, root,
        GraftLogEntry(None, Nil, Seq("legacy-meta-k"), 0L))
      GraftKeyIndex.recordCommit(fs, root, v, Seq("legacy-meta-k"))
    }
    assert(GraftKeyIndex.committedAmong(fs, root, Seq("legacy-meta-k")) ==
      Set("legacy-meta-k"))
    assert(fs.exists(new Path(keysDir, "g1")),
      "segments must land in the generation the legacy meta names")
  }

  test("effective bloom falls back to full history when the tail misses the fold gap") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    GraftBlocksLog.lockFor(root.toString).synchronized {
      // v0 bootstraps the bloom (covered=0); v1/v2 index segments only —
      // simulating a crash that skipped the folds
      Seq("gap-a", "gap-b", "gap-c").zipWithIndex.foreach { case (k, i) =>
        val v = GraftBlocksLog.appendEntry(fs, root,
          GraftLogEntry(None, Nil, Seq(k), 0L))
        GraftKeyIndex.recordCommit(fs, root, v, Seq(k))
        assert(v == i.toLong)
      }
    }
    assert(GraftKeyIndex.readBloomCovered(fs, root).contains(0L))
    val bf = (tail: Seq[(Long, GraftLogEntry)]) =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(
          GraftKeyIndex.effectiveBloomBytes(fs, root, tail).get))
    // a tail that reaches back to covered+1 folds in memory
    val entries = GraftBlocksLog.readEntriesWithVersion(fs, root)
    assert(bf(entries.filter(_._1 > 0)).mightContainString("gap-b"))
    // a tail starting PAST the gap (as after a later checkpoint) must
    // take the full-history read — gap-b is v1, not in the tail
    val gappedTail = entries.filter(_._1 >= 2)
    assert(bf(gappedTail).mightContainString("gap-b"),
      "fold gap keys must come from the full-history fallback")
  }

  test("index re-shards when shards outgrow the target; reads stay exact") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    // tiny target: 64 shards * 8 keys = 512-key threshold
    System.setProperty("graft.blocks.targetKeysPerShard", "8")
    try {
      val keysByVersion = (0 until 3).map { b =>
        b -> (0 until 400).map(i => s"rs-$b-$i")
      }
      GraftBlocksLog.lockFor(root.toString).synchronized {
        keysByVersion.foreach { case (_, ks) =>
          val v = GraftBlocksLog.appendEntry(fs, root,
            GraftLogEntry(None, Nil, ks, 0L))
          GraftKeyIndex.recordCommit(fs, root, v, ks)
        }
        // fold with 1200 total keys: must re-shard 64 -> >=256
        GraftKeyIndex.foldBloom(fs, root,
          keysByVersion.flatMap(_._2), 2L)
      }
      val meta = GraftKeyIndex.readMeta(fs, root)
      assert(meta.gen >= 1 && meta.shards > GraftKeyIndex.DefaultShards,
        s"expected a re-shard, got $meta")
      assert(meta.shards % GraftKeyIndex.DefaultShards == 0,
        "shard count must refine (power-of-two multiple)")
      // exactness and version resolution survive the generation swap
      val all = keysByVersion.flatMap(_._2)
      assert(GraftKeyIndex.committedAmong(fs, root, all :+ "rs-absent") ==
        all.toSet)
      val vf = GraftKeyIndex.versionsFor(fs, root, Seq("rs-0-7", "rs-2-399"))
      assert(vf == Map("rs-0-7" -> 0L, "rs-2-399" -> 2L),
        s"versions must survive re-sharding, got $vf")
      // the probe verifies bloom hits against the NEW layout
      val hconf = new graft.sources.SerializableHadoopConf(
        spark.sessionState.newHadoopConf())
      val probe = GraftKeyProbe.forStore(fs, root, hconf)
      assert(probe.committed("rs-1-123") && !probe.committed("rs-9-9"))
      // old-generation shard dirs REMAIN after the swap: a lock-free
      // reader mid-stream on old segments must not hit
      // FileNotFoundException (reshard defers deletion to the
      // retention vacuum — the in-flight-reader contract)
      val residue = new Path(GraftKeyIndex.indexDir(root), "s00")
      assert(fs.exists(residue),
        "reshard must leave the old generation for the retention vacuum")
      fs.setTimes(residue, System.currentTimeMillis() - 1000, -1)
      assert(GraftBlocksStore.vacuum(spark, dir, retentionMs = 0) >= 1)
      assert(!fs.exists(residue), "vacuum must sweep dead-generation dirs")
      assert(GraftKeyIndex.committedAmong(fs, root, Seq("rs-1-123")) ==
        Set("rs-1-123"), "the active generation must survive the sweep")
    } finally System.clearProperty("graft.blocks.targetKeysPerShard")
  }

  test("keyed point read touches only the owning commit's files") {
    val dir = freshDir()
    (0 until 8).foreach { i =>
      rows(s"p$i", 3).coalesce(1).write.format("graft-blocks")
        .option("path", dir).mode("append").save()
    }
    assert(GraftBlocksStore.read(spark, dir).inputFiles.length == 8)
    val hit = GraftBlocksStore.readForKeys(spark, dir, Seq("p5"))
    assert(hit.inputFiles.length == 1,
      s"point read must touch one commit's files, got ${hit.inputFiles.length}")
    assert(hit.count() == 3)
    assert(hit.select("title").as[String].collect().toSet ==
      Set("p5-0", "p5-1", "p5-2"))
    // multi-key read unions the owning commits only
    val two = GraftBlocksStore.readForKeys(spark, dir, Seq("p1", "p6"))
    assert(two.inputFiles.length == 2 && two.count() == 6)
    // absent key: empty with the store schema
    val miss = GraftBlocksStore.readForKeys(spark, dir, Seq("nope"))
    assert(miss.isEmpty && miss.columns.contains("blockBatch"))
    // rows survive compaction (conservative c-* widening)
    GraftBlocksStore.compact(spark, dir)
    val after = GraftBlocksStore.readForKeys(spark, dir, Seq("p5"))
    assert(after.count() == 3)
    assert(after.select("title").as[String].collect().toSet ==
      Set("p5-0", "p5-1", "p5-2"))
  }

  test("streaming epochs get a fresh probe: re-delivered keys drop at the task") {
    val dir = freshDir()
    val table = new GraftBlocksTableSink(dir,
      GraftBlocksTableSink.DefaultSchema, "blockBatch")
    val info = new LogicalWriteInfo {
      override def queryId(): String = "q-fresh"
      override def schema(): StructType = GraftBlocksTableSink.DefaultSchema
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
    }
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(GraftBlocksTableSink.DefaultSchema)
    val ser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(enc)
      .createSerializer()
    def internalRows(batch: String) = (0 until 3).map(i =>
      ser(org.apache.spark.sql.Row(batch, i, "staging", s"Main/$batch.md",
        "text", s"$batch-$i", null, null)).copy())
    // ONE StreamingWrite spanning both epochs, as in a real query run
    val sw = table.newWriteBuilder(info).build().toStreaming
    val w0 = sw.createStreamingWriterFactory(null).createWriter(0, 1L, 0L)
    internalRows("dup").foreach(w0.write)
    sw.commit(0L, Array(w0.commit()))
    // epoch 1 re-delivers the SAME key: the per-epoch factory must carry
    // a refreshed probe, so the task writes nothing at all
    val w1 = sw.createStreamingWriterFactory(null).createWriter(0, 2L, 1L)
    internalRows("dup").foreach(w1.write)
    val msg = w1.commit().asInstanceOf[GraftCommitMessage]
    assert(msg.file.isEmpty && msg.rows == 0,
      s"re-delivered key must be dropped task-side, wrote $msg")
    sw.commit(1L, Array(msg))
    assert(GraftBlocksStore.read(spark, dir).count() == 3)
  }

  test("concurrent overlapping writes: every key lands exactly once") {
    val dir = freshDir()
    // 6 threads, each writing 4 keys with heavy overlap: key ki is
    // attempted by threads i%3, i%3+1, i%3+2 — the lock + commit
    // re-check must let exactly one attempt win per key
    val threads = (0 until 6).map { t =>
      new Thread(() => {
        val batch = (0 until 4).map(i => s"k${(t + i) % 8}").distinct
        val df = batch.map(b => rows(b, 2)).reduce(_ union _)
        df.write.format("graft-blocks").option("path", dir)
          .mode("append").save()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    val counts = GraftBlocksStore.read(spark, dir)
      .groupBy("blockBatch").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == (0 until 8).map(i => s"k$i").toSet)
    assert(counts.values.forall(_ == 2L),
      s"every key must land exactly once (2 rows each), got $counts")
    assert(GraftBlocksStore.committedKeys(spark, dir).size == 8)
  }

  test("history reports every commit with adds, removes, keys, rows") {
    val dir = freshDir()
    rows("h1", 2).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    rows("h2", 3).coalesce(1).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    GraftBlocksStore.compact(spark, dir, smallerThan = Long.MaxValue)
    val h = GraftBlocksStore.history(spark, dir)
      .orderBy("version")
      .as[(Long, Option[String], Int, Int, Int, Long)].collect()
    assert(h.length == 3)
    assert(h(0)._5 == 1 && h(0)._6 == 2L) // h1: one key, two rows
    assert(h(1)._5 == 1 && h(1)._6 == 3L)
    val compaction = h(2)
    assert(compaction._4 >= 2 && compaction._5 == 0 && compaction._6 == 0L,
      s"compaction entry must remove inputs and add no keys/rows: $compaction")
  }

  test("compact on a lagging index heals first instead of skipping entries") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    rows("lag1", 2).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    // simulate a crash between appendEntry and recordCommit: an entry
    // whose keys never reached the index, watermark left behind
    GraftBlocksLog.lockFor(root.toString).synchronized {
      GraftBlocksLog.appendEntry(fs, root,
        GraftLogEntry(None, Nil, Seq("lag2"), 0L))
    }
    assert(GraftKeyIndex.committedAmong(fs, root, Seq("lag2")).isEmpty)
    // compact appends its own entry + recordCommit — it must NOT advance
    // the watermark past the unindexed lag2 entry
    GraftBlocksStore.compact(spark, dir, smallerThan = Long.MaxValue)
    assert(GraftKeyIndex.committedAmong(fs, root, Seq("lag1", "lag2")) ==
      Set("lag1", "lag2"),
      "heal must run before compaction's watermark bump")
    // and first-writer-wins still holds for the once-lagging key
    rows("lag2", 5).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    assert(GraftBlocksStore.read(spark, dir)
      .filter($"blockBatch" === "lag2").count() == 0)
  }

  test("point read still finds keys when the index lags or is missing") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    (0 until 3).foreach { i =>
      rows(s"u$i", 2).write.format("graft-blocks")
        .option("path", dir).mode("append").save()
    }
    // lose the whole index: "not in the index" is no longer evidence of
    // absence, so the point read must widen rather than return empty
    fs.delete(GraftKeyIndex.indexDir(root), true)
    val hit = GraftBlocksStore.readForKeys(spark, dir, Seq("u1"))
    assert(hit.count() == 2, "lost index must not hide committed keys")
    assert(hit.select("title").as[String].collect().toSet ==
      Set("u1-0", "u1-1"))
  }

  test("type-conflicting schema is rejected at write build; widening is allowed") {
    val dir = freshDir()
    rows("s1", 2).write.format("graft-blocks")
      .option("path", dir).mode("append").save()
    // same column name, different type → refused before any task runs
    val bad = Seq(("s2", "not-an-int")).toDF("blockBatch", "blockIndex")
    val ex = intercept[Exception] {
      bad.write.format("graft-blocks").option("path", dir)
        .mode("append").save()
    }
    def chain(t: Throwable) =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => Option(t.getMessage).exists(_.contains("conflicts"))),
      s"expected schema-conflict refusal, got $ex")
    // a case-VARIANT of an existing column is refused even at the same
    // type: parquet merging is case-sensitive and would create both
    val caseVar = Seq(("s4", 7)).toDF("blockBatch", "BlockIndex")
    val ex2 = intercept[Exception] {
      caseVar.write.format("graft-blocks").option("path", dir)
        .mode("append").save()
    }
    assert(chain(ex2).exists(t =>
      Option(t.getMessage).exists(_.contains("case-sensitive"))), s"got $ex2")
    // widening with a NEW column is fine (readers mergeSchema)
    Seq(("s3", 0, "extra")).toDF("blockBatch", "blockIndex", "annotation")
      .write.format("graft-blocks").option("path", dir).mode("append").save()
    val stored = GraftBlocksStore.read(spark, dir)
    assert(stored.count() == 3)
    assert(GraftBlocksStore.committedKeys(spark, dir) == Set("s1", "s3"))
    // nullability differences are merge-compatible, never a conflict
    import org.apache.spark.sql.types._
    GraftBlocksTableSink.assertSchemaCompatible(
      StructType(Seq(StructField("blockBatch", StringType),
        StructField("tags", ArrayType(StringType, containsNull = false)))),
      StructType(Seq(StructField("blockBatch", StringType),
        StructField("tags", ArrayType(StringType, containsNull = true)))),
      "spec")
  }

  test("schema conflict is also refused at commit when planning saw no schema") {
    val dir = freshDir()
    val fs = fsFor(dir)
    val root = qualified(dir)
    // both writes plan against the EMPTY store (no schema yet) — the
    // planning check cannot fire for either
    import org.apache.spark.sql.types._
    val intSchema = StructType(Seq(StructField("blockBatch", StringType),
      StructField("blockIndex", IntegerType)))
    val strSchema = StructType(Seq(StructField("blockBatch", StringType),
      StructField("blockIndex", StringType)))
    // simulate the loser's commit arriving after the winner recorded the
    // store schema
    GraftBlocksLog.writeSchemaIfAbsent(fs, root, intSchema)
    val ex = intercept[IllegalArgumentException] {
      GraftCommitter.commit(dir, spark.sessionState.newHadoopConf(), None,
        strSchema, "blockBatch", "w-loser", Nil)
    }
    assert(ex.getMessage.contains("commit"),
      s"conflict must be caught under the commit lock: ${ex.getMessage}")
  }

  test("equivalent root spellings share one commit lock") {
    val dir = freshDir()
    val q1 = qualified(dir).toString
    val q2 = fsFor(dir).makeQualified(new Path(s"file:$dir")).toString
    assert(q1 == q2)
    assert(GraftBlocksLog.lockFor(q1) eq GraftBlocksLog.lockFor(q2))
  }
}
