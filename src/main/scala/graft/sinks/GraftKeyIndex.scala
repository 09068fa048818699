package graft.sinks

import java.io.{BufferedReader, ByteArrayInputStream, DataInputStream, DataOutputStream, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable
import scala.util.hashing.MurmurHash3

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.internal.Logging
import org.apache.spark.util.sketch.BloomFilter

import graft.sources.SerializableHadoopConf

/** Sharded committed-key index + maintained bloom filter for the block
  * store's first-writer-wins check (the K3 conditional insert, reference
  * store_notion_blocks.py:128-150) at the 100 TB / ~1e8-document design
  * point.
  *
  * The transaction log ([[GraftBlocksLog]]) remains the source of truth —
  * every entry still records the keys it first-committed. What this index
  * adds is *access paths that never materialize the full key set*:
  *
  * {{{
  *   _graft_log/keys/_meta.gNNNNN    generation + shard count, one file
  *                                   per generation, readers take the
  *                                   highest (absent = legacy layout:
  *                                   gen 0, 64 shards)
  *   _graft_log/keys/_bloom          (expected, count, coveredVersion)
  *                                   header + BloomFilter over all keys
  *                                   committed through coveredVersion
  *   _graft_log/keys/_watermark      highest log version the index covers
  *   _graft_log/keys/g<G>/s<NN>/<v>.keys  keys first-committed by log
  *                                   entry v whose shard is NN (gen 0
  *                                   puts s<NN> directly under keys/)
  * }}}
  *
  *  - **Write planning** reads `_bloom`, adds the keys of the few log
  *    entries newer than its `coveredVersion` (bounded by the checkpoint
  *    interval), and ships only the merged bloom bytes to tasks — never
  *    the exact set. At 1e8 keys / 1% fpp the filter is ~120 MB (≈1.2
  *    bytes/key); per-PLANNING cost, amortized over every task.
  *  - **Per-commit cost is O(new keys)**: a commit writes only its shard
  *    segments and the watermark. The bloom is folded forward at
  *    checkpoint time (and on crash-heal), so the ~count-proportional
  *    bloom rewrite happens once per checkpoint interval, not per commit.
  *  - **Task writers** treat a bloom MISS as definitely-new (write the
  *    row); a bloom HIT is verified exactly against the key's shard, so a
  *    false positive can never drop a legitimate new row. A stale bloom
  *    under-filters only — the commit re-check is authoritative.
  *  - **Commit** checks the write's candidate keys exactly against only
  *    the shards they hash into (`committedAmong`), STREAMING the
  *    segment lines against the candidate set — O(touched shards) I/O
  *    and O(candidates) memory, never a whole-shard `Set`.
  *  - **Shard count scales with the store**: when the average shard
  *    outgrows `targetKeysPerShard` (default 64k keys ≈ a few MB), the
  *    next fold re-shards into 2^k× more shards (a new `g<G>` generation,
  *    swapped in via `_meta`), so a shard stays loadable by a task
  *    verifier at any store size. Re-sharding streams one old shard at a
  *    time — the shard function refines (new count is a power-of-two
  *    multiple), so each (new shard, version) segment has exactly one
  *    old-shard source.
  *
  * Crash-safety: shard segments for log entry v are written AFTER entry v
  * is published, so any visible segment describes committed keys only
  * (task-side verification can under-filter but never over-drop; the
  * commit re-check heals under-filtering). A crash between publishing an
  * entry and indexing it leaves the index lagging the log; `heal` (run
  * under the store lock at the start of every commit) replays the missing
  * entries' keys from the log, so the index catches up before any
  * decision depends on it. A crash mid-reshard leaves `_meta` pointing at
  * the complete old generation (the swap is the atomic last step); orphan
  * new-generation dirs are overwritten by the next attempt. All file
  * writes are temp+rename.
  */
object GraftKeyIndex extends Logging {
  val DefaultShards = 64
  /** Re-shard threshold: keep the average shard under this many keys so
    * a task-side exact verify never loads more than a few MB. Tunable
    * for tests via -Dgraft.blocks.targetKeysPerShard. */
  def targetKeysPerShard: Int =
    sys.props.get("graft.blocks.targetKeysPerShard").map(_.toInt)
      .getOrElse(1 << 16)
  /** Fresh-store bloom capacity; rebuilt at 4x from the shards when the
    * committed-key count exceeds it. */
  val InitialBloomCapacity = 1L << 17
  val BloomFpp = 0.01
  private val BloomMagic = -1L // new-format sentinel (legacy first long = capacity > 0)

  /** Index layout descriptor: segment generation + shard count. */
  final case class IndexMeta(gen: Int, shards: Int)

  def indexDir(root: Path): Path = new Path(GraftBlocksLog.logDir(root), "keys")
  def bloomFile(root: Path): Path = new Path(indexDir(root), "_bloom")
  // one meta file PER generation (never replaced in place): readers pick
  // the highest generation present, so there is no delete+rename window
  // in which no meta exists — a reader racing a re-shard sees either the
  // old or the new generation, both complete at that moment
  private def metaFile(root: Path, gen: Int): Path =
    new Path(indexDir(root), f"_meta.g$gen%05d")
  private val MetaName = """^_meta\.g(\d{5})$""".r
  private def watermarkFile(root: Path): Path = new Path(indexDir(root), "_watermark")
  private def genDir(root: Path, gen: Int): Path =
    if (gen == 0) indexDir(root) else new Path(indexDir(root), s"g$gen")
  private def shardDir(root: Path, meta: IndexMeta, shard: Int): Path =
    new Path(genDir(root, meta.gen), f"s$shard%02d")
  private def segmentFile(root: Path, meta: IndexMeta, shard: Int,
      version: Long): Path =
    new Path(shardDir(root, meta, shard), f"$version%020d.keys")

  def readMeta(fs: FileSystem, root: Path): IndexMeta = {
    val dir = indexDir(root)
    if (!fs.exists(dir)) return IndexMeta(0, DefaultShards)
    def parse(p: Path): IndexMeta = {
      val in = new BufferedReader(new InputStreamReader(fs.open(p), UTF_8))
      try {
        val parts = in.readLine().trim.split("\\s+")
        IndexMeta(parts(0).toInt, parts(1).toInt)
      } finally in.close()
    }
    var attempts = 0
    while (attempts < 3) {
      attempts += 1
      val newest = fs.listStatus(dir).iterator
        .flatMap(s => MetaName.findFirstMatchIn(s.getPath.getName)
          .map(m => (m.group(1).toInt, s.getPath)))
        .foldLeft(Option.empty[(Int, Path)]) {
          case (acc, c) => if (acc.forall(_._1 < c._1)) Some(c) else acc
        }
      newest match {
        case Some((_, p)) =>
          try return parse(p)
          catch {
            // vanished between list and open (racing maintenance) —
            // re-list, bounded: a silent gen-0 fallback here would read
            // the wrong layout and break first-writer-wins
            case _: java.io.FileNotFoundException => ()
          }
        case None =>
          // one-time compat: a store written by the short-lived plain
          // `_meta` format (single replaced file)
          val legacy = new Path(dir, "_meta")
          if (fs.exists(legacy)) {
            try return parse(legacy)
            catch { case _: java.io.FileNotFoundException => () }
          } else return IndexMeta(0, DefaultShards)
      }
    }
    throw new java.io.IOException(
      s"graft-blocks: could not read key-index meta under $dir after " +
        s"$attempts attempts")
  }

  private def writeMeta(fs: FileSystem, root: Path, meta: IndexMeta): Unit =
    atomicWrite(fs, metaFile(root, meta.gen)) { out =>
      val w = new OutputStreamWriter(out, UTF_8)
      w.write(s"${meta.gen} ${meta.shards}"); w.flush()
    }

  /** Stable cross-JVM shard assignment (MurmurHash3 with the default
    * constant seed — deterministic for a given string). Shard counts are
    * powers-of-two multiples of each other, so a larger count REFINES a
    * smaller one: shardOf(k, 4n) mod n == shardOf(k, n). */
  def shardOf(key: String, numShards: Int): Int =
    ((MurmurHash3.stringHash(key) % numShards) + numShards) % numShards

  def exists(fs: FileSystem, root: Path): Boolean = fs.exists(bloomFile(root))

  // ---- watermark ----

  def readWatermark(fs: FileSystem, root: Path): Long = {
    val f = watermarkFile(root)
    if (!fs.exists(f)) return -1L
    // the writer replaces this file via delete+rename; a read landing in
    // that window sees "absent", which every caller treats as "index
    // may lag" — the safe direction
    try {
      val in = new BufferedReader(new InputStreamReader(fs.open(f), UTF_8))
      try in.readLine().trim.toLong finally in.close()
    } catch { case _: java.io.FileNotFoundException => -1L }
  }

  private def writeWatermark(fs: FileSystem, root: Path, v: Long): Unit =
    atomicWrite(fs, watermarkFile(root)) { out =>
      val w = new OutputStreamWriter(out, UTF_8); w.write(v.toString); w.flush()
    }

  // ---- shard segments ----

  /** Record entry `version`'s keys in the shard files. Idempotent: a
    * shard whose segment for this version already exists is skipped, so
    * a heal replay after a mid-index crash is safe. */
  def indexEntry(fs: FileSystem, root: Path, version: Long,
      keys: Seq[String]): Unit = {
    val meta = readMeta(fs, root)
    keys.groupBy(shardOf(_, meta.shards)).foreach { case (shard, ks) =>
      val seg = segmentFile(root, meta, shard, version)
      if (!fs.exists(seg))
        atomicWrite(fs, seg) { out =>
          val w = new OutputStreamWriter(out, UTF_8)
          ks.distinct.foreach { k => w.write(k); w.write('\n') }
          w.flush()
        }
    }
  }

  private def segmentsOf(fs: FileSystem, dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".keys"))

  /** Stream every line of one shard's segments through `f` (no
    * materialization). `f` returns false to stop early. */
  private def foreachShardLine(fs: FileSystem, root: Path, meta: IndexMeta,
      shard: Int)(f: (Long, String) => Boolean): Unit = {
    val segs = segmentsOf(fs, shardDir(root, meta, shard))
      .sortBy(_.getPath.getName)
    val it = segs.iterator
    var go = true
    while (go && it.hasNext) {
      val s = it.next()
      val v = s.getPath.getName.stripSuffix(".keys").toLong
      val in = new BufferedReader(new InputStreamReader(fs.open(s.getPath), UTF_8))
      try {
        var line = in.readLine()
        while (go && line != null) {
          if (line.nonEmpty) go = f(v, line)
          line = in.readLine()
        }
      } finally in.close()
    }
  }

  /** Every committed key in one shard (all segments) as a Set — the unit
    * a task loads to verify a bloom positive. Bounded by
    * `targetKeysPerShard` once the store has folded at least once past
    * the re-shard threshold. */
  def shardKeys(fs: FileSystem, root: Path, shard: Int): Set[String] =
    shardKeys(fs, root, readMeta(fs, root), shard)

  private[sinks] def shardKeys(fs: FileSystem, root: Path, meta: IndexMeta,
      shard: Int): Set[String] = {
    val out = Set.newBuilder[String]
    foreachShardLine(fs, root, meta, shard) { (_, k) => out += k; true }
    out.result()
  }

  /** Which of `candidates` are already committed — exact, reading only
    * the shards the candidates hash into and STREAMING their segments
    * against the candidate set (memory O(candidates), never a
    * whole-shard Set). */
  def committedAmong(fs: FileSystem, root: Path,
      candidates: Iterable[String]): Set[String] = {
    val meta = readMeta(fs, root)
    val byShard = candidates.toSeq.distinct.groupBy(shardOf(_, meta.shards))
    byShard.iterator.flatMap { case (shard, ks) =>
      val pending = mutable.Set(ks: _*)
      val found = mutable.ArrayBuffer.empty[String]
      foreachShardLine(fs, root, meta, shard) { (_, k) =>
        if (pending.remove(k)) found += k
        pending.nonEmpty
      }
      found.iterator
    }.toSet
  }

  /** The log version that first committed each of `candidates` (absent
    * keys are absent from the map) — the point-lookup resolver: a
    * segment file is named by its entry version, so finding the segment
    * holding a key names the commit whose files hold its rows. Reads
    * only the shards the candidates hash into. A concurrent re-shard
    * swaps `_meta` after the new generation is complete; a read that
    * raced the old generation's deletion re-resolves once against the
    * fresh meta. */
  def versionsFor(fs: FileSystem, root: Path,
      candidates: Iterable[String]): Map[String, Long] = {
    def resolve(meta: IndexMeta): Map[String, Long] = {
      val byShard = candidates.toSeq.distinct.groupBy(shardOf(_, meta.shards))
      byShard.iterator.flatMap { case (shard, ks) =>
        val pending = mutable.Set(ks: _*)
        val found = mutable.Map.empty[String, Long]
        foreachShardLine(fs, root, meta, shard) { (v, k) =>
          if (pending.remove(k)) found(k) = v
          pending.nonEmpty
        }
        found.iterator
      }.toMap
    }
    val meta = readMeta(fs, root)
    val first = resolve(meta)
    if (first.size == candidates.toSeq.distinct.size) first
    else {
      val fresh = readMeta(fs, root)
      if (fresh != meta) resolve(fresh) else first
    }
  }

  // ---- bloom ----

  /** (expectedCapacity, keyCount, filter). Absent (or mid-replacement —
    * the writer swaps it via delete+rename) reads as None: callers fall
    * back to the exact entries-derived set, the safe direction. */
  def readBloom(fs: FileSystem, root: Path): Option[(Long, Long, BloomFilter)] =
    readBloomFull(fs, root).map { case (e, c, _, bf) => (e, c, bf) }

  /** (expected, count, coveredVersion, filter). Legacy headers (no
    * covered-version field) read as covering the current watermark —
    * they were maintained per-commit. */
  def readBloomFull(fs: FileSystem, root: Path): Option[(Long, Long, Long, BloomFilter)] = {
    val f = bloomFile(root)
    if (!fs.exists(f)) return None
    try {
      val in = new DataInputStream(fs.open(f))
      try {
        val first = in.readLong()
        if (first == BloomMagic) {
          val expected = in.readLong()
          val count = in.readLong()
          val covered = in.readLong()
          Some((expected, count, covered, BloomFilter.readFrom(in)))
        } else {
          val count = in.readLong()
          Some((first, count, readWatermark(fs, root), BloomFilter.readFrom(in)))
        }
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Just the bloom's covered log version — reads the fixed-size header
    * only, never the filter bytes (which are count-proportional: ~120 MB
    * at the 1e8-key design point). None when no bloom exists. Legacy
    * headers read as covering the watermark, as in [[readBloomFull]]. */
  def readBloomCovered(fs: FileSystem, root: Path): Option[Long] = {
    val f = bloomFile(root)
    if (!fs.exists(f)) return None
    try {
      val in = new DataInputStream(fs.open(f))
      try {
        val first = in.readLong()
        if (first == BloomMagic) { in.readLong(); in.readLong(); Some(in.readLong()) }
        else Some(readWatermark(fs, root))
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Raw bloom bytes for shipping to tasks (header stripped), with the
    * keys of log entries NEWER than the bloom's covered version folded
    * in — `tail` is the post-checkpoint (version, entry) view the caller
    * already holds. Returns None when no bloom exists yet. */
  def effectiveBloomBytes(fs: FileSystem, root: Path,
      tail: Seq[(Long, GraftLogEntry)]): Option[Array[Byte]] =
    readBloomFull(fs, root).map { case (_, _, covered, bf) =>
      val uncovered =
        if (tail.nonEmpty && tail.map(_._1).min > covered + 1)
          // tail does not reach back to the bloom (fold missed several
          // checkpoints — crashed store): take the full-history read once
          GraftBlocksLog.readEntriesWithVersion(fs, root)
            .filter(_._1 > covered)
        else tail.filter(_._1 > covered)
      uncovered.foreach(_._2.keys.foreach(bf.putString))
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }

  private def writeBloom(fs: FileSystem, root: Path, expected: Long,
      count: Long, covered: Long, bf: BloomFilter): Unit =
    atomicWrite(fs, bloomFile(root)) { out =>
      val d = new DataOutputStream(out)
      d.writeLong(BloomMagic)
      d.writeLong(expected); d.writeLong(count); d.writeLong(covered)
      bf.writeTo(d); d.flush()
    }

  /** Fold the bloom forward to cover `entries` up to `coveredVersion`
    * (the amortized write: called at checkpoint time and from heal, NOT
    * per commit). Rebuilds at 4x capacity — streaming the shards, never
    * materializing the key set — when the count outgrows the filter;
    * re-shards first when the average shard outgrows the target. */
  def foldBloom(fs: FileSystem, root: Path, newKeys: Seq[String],
      coveredVersion: Long): Unit =
    readBloomFull(fs, root) match {
      case Some((expected, count, covered, bf)) if covered >= coveredVersion =>
        () // already folded past this point (idempotent replay)
      case Some((expected, count, covered, bf))
          if count + newKeys.size <= expected &&
            count + newKeys.size <=
              readMeta(fs, root).shards.toLong * targetKeysPerShard =>
        newKeys.foreach(bf.putString)
        writeBloom(fs, root, expected, count + newKeys.size, coveredVersion, bf)
      case _ =>
        // outgrown filter OR oversized shards: rebuild (which re-shards
        // first when the average shard is past the target)
        rebuildBloom(fs, root, coveredVersion)
    }

  /** Stream-count the shards, re-shard if oversized, then rebuild the
    * bloom shard-by-shard at 4x capacity. Never holds more than one
    * shard's keys (re-shard) or zero keys (bloom fill) in memory. */
  private def rebuildBloom(fs: FileSystem, root: Path,
      coveredVersion: Long): Unit = {
    var meta = readMeta(fs, root)
    var total = 0L
    (0 until meta.shards).foreach { s =>
      foreachShardLine(fs, root, meta, s) { (_, _) => total += 1; true }
    }
    if (total > meta.shards.toLong * targetKeysPerShard)
      meta = reshard(fs, root, meta, total)
    val expected = math.max(InitialBloomCapacity, total * 4L)
    val bf = BloomFilter.create(expected, BloomFpp)
    (0 until meta.shards).foreach { s =>
      foreachShardLine(fs, root, meta, s) { (_, k) => bf.putString(k); true }
    }
    writeBloom(fs, root, expected, total, coveredVersion, bf)
    logInfo(s"graft-blocks: rebuilt key bloom at capacity $expected " +
      s"over $total keys (gen ${meta.gen}, ${meta.shards} shards)")
  }

  /** Split every shard into 2^k new shards (a new generation) so the
    * average shard holds ≤ targetKeysPerShard keys. Streams ONE old
    * shard at a time; the refining shard function sends each old shard's
    * keys to a disjoint group of new shards, so every new segment is
    * written exactly once. The `_meta` swap is the atomic cut-over; the
    * old generation is deleted after. */
  private def reshard(fs: FileSystem, root: Path, meta: IndexMeta,
      totalKeys: Long): IndexMeta = {
    var newShards = meta.shards
    while (totalKeys > newShards.toLong * targetKeysPerShard) newShards *= 2
    val newMeta = IndexMeta(meta.gen + 1, newShards)
    // residue of a crashed earlier attempt at this generation is stale —
    // rewrite from scratch
    if (fs.exists(genDir(root, newMeta.gen)))
      fs.delete(genDir(root, newMeta.gen), true)
    (0 until meta.shards).foreach { oldShard =>
      // (new shard, version) -> keys; bounded by one old shard's volume
      val buckets = mutable.Map.empty[(Int, Long), mutable.ArrayBuffer[String]]
      foreachShardLine(fs, root, meta, oldShard) { (v, k) =>
        buckets.getOrElseUpdate((shardOf(k, newShards), v),
          mutable.ArrayBuffer.empty[String]) += k
        true
      }
      buckets.foreach { case ((ns, v), ks) =>
        atomicWrite(fs, segmentFile(root, newMeta, ns, v)) { out =>
          val w = new OutputStreamWriter(out, UTF_8)
          ks.foreach { k => w.write(k); w.write('\n') }
          w.flush()
        }
      }
    }
    writeMeta(fs, root, newMeta) // atomic cut-over
    // The OLD generation is deliberately NOT deleted here: a lock-free
    // reader (versionsFor / executor-side GraftKeyProbe) that listed
    // old-generation segments just before the meta swap may still be
    // mid-stream on those files, and foreachShardLine has no
    // FileNotFoundException recovery — deleting now would fail its
    // query. Stale generations are reclaimed by
    // [[vacuumStaleGenerations]] under the store vacuum's retention
    // horizon (the same in-flight-reader contract as the data vacuum).
    logInfo(s"graft-blocks: re-sharded key index ${meta.shards} -> " +
      s"$newShards shards (gen ${newMeta.gen}, $totalKeys keys); " +
      s"gen ${meta.gen} left for retention vacuum")
    newMeta
  }

  /** Bring the index up to date with the log (caller holds the store
    * lock). No-op when the watermark already covers the newest entry;
    * otherwise replays the lagging entries' keys from the log — this is
    * both the crash-heal path and the one-time migration for stores
    * whose log predates the index. Heal is the only per-commit path that
    * may write the bloom, and only when it actually replayed something
    * (or no bloom exists yet). */
  def heal(fs: FileSystem, root: Path,
      entries: Seq[(Long, GraftLogEntry)]): Unit = {
    if (entries.isEmpty) return
    val w = readWatermark(fs, root)
    val pending = entries.filter(_._1 > w)
    if (pending.isEmpty) {
      if (!exists(fs, root)) rebuildBloom(fs, root, w)
      return
    }
    pending.foreach { case (v, e) => indexEntry(fs, root, v, e.keys) }
    foldBloom(fs, root, pending.flatMap(_._2.keys), pending.map(_._1).max)
    writeWatermark(fs, root, pending.map(_._1).max)
  }

  /** Heal dispatch from a [[GraftStoreState]] view — THE one policy for
    * both commit and compaction: lag inside the post-checkpoint tail
    * replays just the tail; a watermark older than the checkpoint (lost
    * index) falls back to the full-history replay. Caller holds the
    * store lock. */
  def healFromState(fs: FileSystem, root: Path,
      state: GraftStoreState): Unit =
    if (readWatermark(fs, root) < state.checkpointVersion)
      heal(fs, root, GraftBlocksLog.readEntriesWithVersion(fs, root))
    else
      heal(fs, root, state.tail)

  /** Record a just-published entry (the normal per-commit path): shard
    * segments + watermark only — O(this commit's keys). The bloom is
    * deliberately NOT written here; it folds forward at checkpoint time
    * ([[foldBloom]]), keeping per-commit I/O independent of store size. */
  def recordCommit(fs: FileSystem, root: Path, version: Long,
      keys: Seq[String]): Unit = {
    indexEntry(fs, root, version, keys)
    writeWatermark(fs, root, version)
    // bootstrap only: a store with no bloom yet (first commit, or a lost
    // bloom) gets one now so planning never falls back to the exact key
    // set; on an existing bloom this is a no-op — steady-state commits
    // never rewrite it
    if (!exists(fs, root)) rebuildBloom(fs, root, version)
  }

  /** Remove shard-segment directories of generations BELOW the active
    * one — the residue of a re-shard that crashed between its `_meta`
    * swap and its old-generation cleanup. Only dirs older than
    * `horizonMs` go (same retention contract as the data vacuum; a
    * reader mid-flight on the old generation re-resolves on its retry).
    * Caller holds the store lock. Returns the number of dirs deleted. */
  private[sinks] def vacuumStaleGenerations(fs: FileSystem, root: Path,
      horizonMs: Long): Int = {
    val meta = readMeta(fs, root)
    val dir = indexDir(root)
    if (!fs.exists(dir)) return 0
    var deleted = 0
    val GenName = """^g(\d+)$""".r
    val ShardName = """^s\d+$""".r
    fs.listStatus(dir).foreach { s =>
      val name = s.getPath.getName
      val stale = name match {
        case GenName(g) => s.isDirectory && g.toInt < meta.gen
        // gen-0 legacy layout: bare shard dirs directly under keys/
        case ShardName() => s.isDirectory && meta.gen > 0
        case _ => false
      }
      if (stale && s.getModificationTime < horizonMs &&
          fs.delete(s.getPath, true)) deleted += 1
    }
    deleted
  }

  private def atomicWrite(fs: FileSystem, target: Path)(
      body: java.io.OutputStream => Unit): Unit = {
    fs.mkdirs(target.getParent)
    val tmp = new Path(target.getParent,
      s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try body(out) finally out.close()
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"graft-blocks: failed to write $target")
    }
  }
}

/** Task-side first-writer-wins membership probe. What ships in the
  * writer-factory closure is EITHER a BROADCAST handle to the bloom
  * bytes (index-backed stores — the filter is count-proportional, ~120
  * MB at 1e8 keys, so it rides Spark's torrent broadcast and lands once
  * per executor instead of once per task closure) OR, for legacy stores
  * whose log predates the key index, the exact set one last time (the
  * first commit with this code heals the index and retires the fallback).
  *
  * A bloom miss is definitely-new → write the row. A bloom hit is
  * verified exactly against the key's shard file (cached per shard per
  * task, in an LRU bounded to [[GraftKeyProbe.MaxCachedShards]] — shards
  * are re-shard-bounded to `targetKeysPerShard` keys, so the cache holds
  * at most a few hundred MB even at the 1e8-key design point and far
  * less in practice). Shard reads can lag a concurrent commit —
  * under-filtering only, healed by the commit's authoritative re-check
  * ([[GraftCommitter.commit]]).
  */
class GraftKeyProbe private (
    bloomBc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    exactFallback: Set[String], root: String, hconf: SerializableHadoopConf)
    extends Serializable {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBc.value))
  @transient private lazy val rootPath = new Path(root)
  @transient private lazy val fs = rootPath.getFileSystem(hconf.value)
  @transient private lazy val shardCache =
    new java.util.LinkedHashMap[Int, Set[String]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Int, Set[String]]): Boolean =
        size() > GraftKeyProbe.MaxCachedShards
    }
  @transient private lazy val meta = GraftKeyIndex.readMeta(fs, rootPath)

  def committed(key: String): Boolean =
    if (bloomBc == null) exactFallback.contains(key)
    else bloom.mightContainString(key) && {
      val shard = GraftKeyIndex.shardOf(key, meta.shards)
      var cached = shardCache.get(shard)
      if (cached == null) {
        // pass the probe's cached meta: the shard number above was
        // computed with it, and re-resolving meta per miss would cost an
        // extra FS round-trip on the task hot path
        cached = GraftKeyIndex.shardKeys(fs, rootPath, meta, shard)
        shardCache.put(shard, cached)
      }
      cached.contains(key)
    }

  /** Release this probe's broadcast blocks (driver-side). Called when a
    * streaming epoch's tasks finish (commit/abort) or its probe is
    * replaced, and after a batch write commits/aborts — without it, a
    * long-lived driver accumulates one count-proportional filter
    * broadcast per write until a GC-driven ContextCleaner pass.
    * Idempotent: the epoch-commit and factory-replacement paths can
    * both reach the same probe. */
  @transient private var released = false
  private[sinks] def release(): Unit =
    if (bloomBc != null && !released) { released = true; bloomBc.destroy() }
}

object GraftKeyProbe {
  /** Bound on per-task cached shard sets (LRU). */
  val MaxCachedShards = 16

  /** Planning-time snapshot: bloom-backed when the index exists (with
    * post-fold log-tail keys merged in), exact entries-derived fallback
    * otherwise (fresh stores get an empty set). */
  def forStore(fs: FileSystem, root: Path,
      hconf: SerializableHadoopConf): GraftKeyProbe = {
    val state = GraftBlocksLog.readState(fs, root)
    GraftKeyIndex.effectiveBloomBytes(fs, root, state.tail) match {
      case Some(bytes) =>
        // planning runs on the driver: ship the (count-proportional)
        // filter via torrent broadcast, once per executor — the factory
        // closure then carries only the broadcast handle
        val bc = org.apache.spark.sql.SparkSession.active
          .sparkContext.broadcast(bytes)
        new GraftKeyProbe(bc, null, root.toString, hconf)
      case None => new GraftKeyProbe(null,
        GraftBlocksLog.committedKeys(GraftBlocksLog.readEntries(fs, root)),
        root.toString, hconf)
    }
  }
}
