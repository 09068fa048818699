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
  *   _graft_log/keys/_bloom          (expected, count) header + Spark
  *                                   sketch BloomFilter over ALL keys
  *   _graft_log/keys/_watermark      highest log version the index covers
  *   _graft_log/keys/s<NN>/<v>.keys  keys first-committed by log entry v
  *                                   whose shard is NN (one per line)
  * }}}
  *
  *  - **Write planning** reads `_bloom` (a few MB at 1e8 keys, fpp 1%) and
  *    ships only its bytes to tasks — never the exact set.
  *  - **Task writers** treat a bloom MISS as definitely-new (write the
  *    row); a bloom HIT is verified exactly against the key's shard, so a
  *    false positive can never drop a legitimate new row.
  *  - **Commit** checks the write's candidate keys exactly against only
  *    the shards they hash into (`committedAmong`) — O(touched shards),
  *    not O(all keys).
  *
  * Crash-safety: shard segments for log entry v are written AFTER entry v
  * is published, so any visible segment describes committed keys only
  * (task-side verification can under-filter but never over-drop; the
  * commit re-check heals under-filtering). A crash between publishing an
  * entry and indexing it leaves the index lagging the log; `heal` (run
  * under the store lock at the start of every commit) replays the missing
  * entries' keys from the log, so the index catches up before any
  * decision depends on it. All file writes are temp+rename.
  */
object GraftKeyIndex extends Logging {
  val NumShards = 64
  /** Fresh-store bloom capacity; rebuilt at 4x from the shards when the
    * committed-key count exceeds it. */
  val InitialBloomCapacity = 1L << 17
  val BloomFpp = 0.01

  def indexDir(root: Path): Path = new Path(GraftBlocksLog.logDir(root), "keys")
  def bloomFile(root: Path): Path = new Path(indexDir(root), "_bloom")
  private def watermarkFile(root: Path): Path = new Path(indexDir(root), "_watermark")
  private def shardDir(root: Path, shard: Int): Path =
    new Path(indexDir(root), f"s$shard%02d")
  private def segmentFile(root: Path, shard: Int, version: Long): Path =
    new Path(shardDir(root, shard), f"$version%020d.keys")

  /** Stable cross-JVM shard assignment (MurmurHash3 with the default
    * constant seed — deterministic for a given string). */
  def shardOf(key: String): Int =
    ((MurmurHash3.stringHash(key) % NumShards) + NumShards) % NumShards

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
      keys: Seq[String]): Unit =
    keys.groupBy(shardOf).foreach { case (shard, ks) =>
      val seg = segmentFile(root, shard, version)
      if (!fs.exists(seg))
        atomicWrite(fs, seg) { out =>
          val w = new OutputStreamWriter(out, UTF_8)
          ks.distinct.foreach { k => w.write(k); w.write('\n') }
          w.flush()
        }
    }

  /** Every committed key in one shard (all segments). Bounded by
    * totalKeys / NumShards — the unit a task loads to verify a bloom
    * positive. */
  def shardKeys(fs: FileSystem, root: Path, shard: Int): Set[String] = {
    val dir = shardDir(root, shard)
    if (!fs.exists(dir)) return Set.empty
    val out = Set.newBuilder[String]
    fs.listStatus(dir).iterator
      .filter(s => s.isFile && s.getPath.getName.endsWith(".keys"))
      .foreach { s =>
        val in = new BufferedReader(new InputStreamReader(fs.open(s.getPath), UTF_8))
        try {
          var line = in.readLine()
          while (line != null) { if (line.nonEmpty) out += line; line = in.readLine() }
        } finally in.close()
      }
    out.result()
  }

  /** Which of `candidates` are already committed — exact, reading only
    * the shards the candidates hash into. */
  def committedAmong(fs: FileSystem, root: Path,
      candidates: Iterable[String]): Set[String] = {
    val byShard = candidates.toSeq.distinct.groupBy(shardOf)
    byShard.iterator.flatMap { case (shard, ks) =>
      val present = shardKeys(fs, root, shard)
      ks.filter(present.contains)
    }.toSet
  }

  /** The log version that first committed each of `candidates` (absent
    * keys are absent from the map) — the point-lookup resolver: a
    * segment file is named by its entry version, so finding the segment
    * holding a key names the commit whose files hold its rows. Reads
    * only the shards the candidates hash into. */
  def versionsFor(fs: FileSystem, root: Path,
      candidates: Iterable[String]): Map[String, Long] = {
    val byShard = candidates.toSeq.distinct.groupBy(shardOf)
    byShard.iterator.flatMap { case (shard, ks) =>
      val dir = shardDir(root, shard)
      if (!fs.exists(dir)) Iterator.empty
      else {
        val pending = mutable.Set(ks: _*)
        val found = mutable.Map.empty[String, Long]
        val segs = fs.listStatus(dir)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".keys"))
          .sortBy(_.getPath.getName)
        val it = segs.iterator
        while (it.hasNext && pending.nonEmpty) {
          val s = it.next()
          val v = s.getPath.getName.stripSuffix(".keys").toLong
          val in = new BufferedReader(
            new InputStreamReader(fs.open(s.getPath), UTF_8))
          try {
            var line = in.readLine()
            while (line != null && pending.nonEmpty) {
              if (pending.remove(line)) found(line) = v
              line = in.readLine()
            }
          } finally in.close()
        }
        found.iterator
      }
    }.toMap
  }

  // ---- bloom ----

  /** (expectedCapacity, keyCount, filter). Absent (or mid-replacement —
    * the writer swaps it via delete+rename) reads as None: callers fall
    * back to the exact entries-derived set, the safe direction. */
  def readBloom(fs: FileSystem, root: Path): Option[(Long, Long, BloomFilter)] = {
    val f = bloomFile(root)
    if (!fs.exists(f)) return None
    try {
      val in = new DataInputStream(fs.open(f))
      try {
        val expected = in.readLong()
        val count = in.readLong()
        Some((expected, count, BloomFilter.readFrom(in)))
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Raw bloom bytes for shipping to tasks (header stripped). */
  def readBloomBytes(fs: FileSystem, root: Path): Option[Array[Byte]] =
    readBloom(fs, root).map { case (_, _, bf) =>
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }

  private def writeBloom(fs: FileSystem, root: Path, expected: Long,
      count: Long, bf: BloomFilter): Unit =
    atomicWrite(fs, bloomFile(root)) { out =>
      val d = new DataOutputStream(out)
      d.writeLong(expected); d.writeLong(count)
      bf.writeTo(d); d.flush()
    }

  /** Add `newKeys` to the maintained bloom; rebuild at 4x capacity from
    * the shard files (which already contain `newKeys` — callers index
    * segments first) when the count outgrows it. */
  private def updateBloom(fs: FileSystem, root: Path,
      newKeys: Seq[String]): Unit =
    readBloom(fs, root) match {
      case Some((expected, count, bf)) if count + newKeys.size <= expected =>
        newKeys.foreach(bf.putString)
        writeBloom(fs, root, expected, count + newKeys.size, bf)
      case _ =>
        val all = (0 until NumShards).iterator
          .flatMap(shardKeys(fs, root, _)).toSeq
        val expected = math.max(InitialBloomCapacity, all.size * 4L)
        val bf = BloomFilter.create(expected, BloomFpp)
        all.foreach(bf.putString)
        writeBloom(fs, root, expected, all.size.toLong, bf)
        logInfo(s"graft-blocks: rebuilt key bloom at capacity $expected " +
          s"over ${all.size} keys")
    }

  /** Bring the index up to date with the log (caller holds the store
    * lock). No-op when the watermark already covers the newest entry;
    * otherwise replays the lagging entries' keys from the log — this is
    * both the crash-heal path and the one-time migration for stores
    * whose log predates the index. */
  def heal(fs: FileSystem, root: Path,
      entries: Seq[(Long, GraftLogEntry)]): Unit = {
    if (entries.isEmpty) return
    val w = readWatermark(fs, root)
    val pending = entries.filter(_._1 > w)
    if (pending.isEmpty) return
    pending.foreach { case (v, e) => indexEntry(fs, root, v, e.keys) }
    updateBloom(fs, root, pending.flatMap(_._2.keys))
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

  /** Record a just-published entry (the normal per-commit path). */
  def recordCommit(fs: FileSystem, root: Path, version: Long,
      keys: Seq[String]): Unit = {
    indexEntry(fs, root, version, keys)
    updateBloom(fs, root, keys)
    writeWatermark(fs, root, version)
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
  * writer-factory closure is EITHER the compact bloom bytes (index-backed
  * stores — constant-size regardless of key count) OR, for legacy stores
  * whose log predates the key index, the exact set one last time (the
  * first commit with this code heals the index and retires the fallback).
  *
  * A bloom miss is definitely-new → write the row. A bloom hit is
  * verified exactly against the key's shard file (cached per shard per
  * task), so false positives never drop legitimate rows. Shard reads can
  * lag a concurrent commit — under-filtering only, healed by the
  * commit's authoritative re-check ([[GraftCommitter.commit]]).
  */
class GraftKeyProbe private (bloomBytes: Array[Byte],
    exactFallback: Set[String], root: String, hconf: SerializableHadoopConf)
    extends Serializable {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))
  @transient private lazy val rootPath = new Path(root)
  @transient private lazy val fs = rootPath.getFileSystem(hconf.value)
  @transient private lazy val shardCache = mutable.Map.empty[Int, Set[String]]

  def committed(key: String): Boolean =
    if (bloomBytes == null) exactFallback.contains(key)
    else bloom.mightContainString(key) && {
      val shard = GraftKeyIndex.shardOf(key)
      shardCache.getOrElseUpdate(shard,
        GraftKeyIndex.shardKeys(fs, rootPath, shard)).contains(key)
    }
}

object GraftKeyProbe {
  /** Planning-time snapshot: bloom-backed when the index exists, exact
    * entries-derived fallback otherwise (fresh stores get an empty set). */
  def forStore(fs: FileSystem, root: Path,
      hconf: SerializableHadoopConf): GraftKeyProbe =
    GraftKeyIndex.readBloomBytes(fs, root) match {
      case Some(bytes) => new GraftKeyProbe(bytes, null, root.toString, hconf)
      case None => new GraftKeyProbe(null,
        GraftBlocksLog.committedKeys(GraftBlocksLog.readEntries(fs, root)),
        root.toString, hconf)
    }
}
