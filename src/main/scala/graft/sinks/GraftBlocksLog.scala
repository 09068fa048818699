package graft.sinks

import java.io.{InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** One committed write in the block store's transaction log.
  *
  * @param txn     replay identity — `"<queryId>#<epochId>"` for streaming
  *                epochs, null for batch writes (no replay semantics)
  * @param files   data file names (relative to `data/`) made visible
  * @param keys    blockBatch keys first written by this commit
  * @param rows    rows across `files`
  * @param removed file names this commit makes INVISIBLE (compaction
  *                rewrote their rows into `files`); physical deletion is
  *                deferred to [[GraftBlocksStore.vacuum]] so concurrent
  *                readers planned against an older state can finish
  */
case class GraftLogEntry(txn: Option[String], files: Seq[String],
    keys: Seq[String], rows: Long, removed: Seq[String] = Nil)

/** Accelerated view of a store's log: the newest checkpoint (if any)
  * folded with the entries after it. `version` is the newest committed
  * entry; `checkpointVersion` is -1 when no checkpoint exists; `tail`
  * holds only the POST-checkpoint (version, entry) pairs — per-commit
  * and per-read work is O(checkpoint + tail), not O(all history). */
case class GraftStoreState(version: Long, checkpointVersion: Long,
    files: Seq[String], txns: Set[String], tail: Seq[(Long, GraftLogEntry)])

/** Log-backed visibility for the block store (the DynamoDB-tables role,
  * reference store_notion_blocks.py:128-150 — `put_item` with
  * `ConditionExpression=Attr("BlockBatch").not_exists()`).
  *
  * Layout under a store root:
  * {{{
  *   data/part-*.parquet     committed data files
  *   _staging/<writeId>-*    task output, invisible until commit
  *   _graft_log/<v20>.json   one entry per commit, ascending version
  *   _graft_log/_schema      StructType JSON, written at first commit
  * }}}
  *
  * A data file is VISIBLE iff a log entry lists it — readers never
  * glob `data/`, so crash residue (staged or half-renamed files) can
  * never surface. Log entries are made atomic by write-to-temp +
  * rename, the same recipe as Spark's own streaming metadata logs.
  *
  * Scale note: entries record their first-committed keys (the durable
  * ledger), but neither write planning nor the task writers materialize
  * the full key set any more — [[GraftKeyIndex]] maintains a sharded
  * key index plus a compact bloom filter under `_graft_log/keys/`, so
  * planning ships bloom bytes, tasks verify bloom hits against one
  * shard, and the commit re-check reads only the shards the write's
  * candidate keys hash into. `committedKeys` (the full-set accessor)
  * remains for the legacy fallback, audits, and index rebuilds.
  */
object GraftBlocksLog extends Logging {
  val LogDirName = "_graft_log"
  val DataDirName = "data"
  val StagingDirName = "_staging"
  private val EntryName = """^(\d{20})\.json$""".r
  private val CheckpointName = """^_checkpoint\.(\d{20})\.json$""".r

  /** Checkpoint every N commits (0 disables). A `def` reading the
    * system property so tests can shrink the interval; the default 100
    * bounds a reader's tail to at most 100 entry files regardless of
    * how long the store has been written. */
  def checkpointInterval: Int =
    sys.props.get("graft.blocks.checkpointInterval").map(_.toInt).getOrElse(100)

  def logDir(root: Path): Path = new Path(root, LogDirName)
  def dataDir(root: Path): Path = new Path(root, DataDirName)
  def stagingDir(root: Path): Path = new Path(root, StagingDirName)
  def schemaFile(root: Path): Path = new Path(logDir(root), "_schema")

  /** Per-root commit lock: commits within this JVM serialize, so the
    * read-log/decide/append sequence is atomic. Callers must pass a
    * QUALIFIED path string (`fs.makeQualified(root).toString`) so
    * equivalent spellings of one physical root ('file:/x' vs '/x',
    * relative vs absolute) share a single lock. Cross-driver writers
    * are excluded by [[GraftStoreLease]]. */
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def lockFor(qualifiedRoot: String): Object =
    commitLocks.computeIfAbsent(qualifiedRoot, _ => new Object)

  /** Is this root a LOG-governed store? Requires actual log state —
    * an entry, checkpoint, or schema file — not the bare directory:
    * [[GraftStoreLease.acquire]] creates `_graft_log/` (for `_lease`)
    * BEFORE legacy-adoption validation runs, so a FAILED first write
    * on a legacy store leaves the directory behind; keying on the
    * directory alone would flip every later read onto the (empty) log
    * branch and silently hide all legacy rows. Lease/tmp files don't
    * qualify. */
  def exists(fs: FileSystem, root: Path): Boolean = {
    val dir = logDir(root)
    fs.exists(dir) && fs.listStatus(dir).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_lease") && !n.startsWith(".")
    }
  }

  /** All committed entries, ascending version order. Full-history scan
    * — audits and index rebuilds; hot paths use [[readState]]. */
  def readEntries(fs: FileSystem, root: Path): Seq[GraftLogEntry] =
    readEntriesWithVersion(fs, root).map(_._2)

  private def parseEntry(fs: FileSystem, path: Path): GraftLogEntry = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val in = fs.open(path)
    try {
      val v = org.json4s.jackson.JsonMethods.parse(
        new InputStreamReader(in, UTF_8))
      GraftLogEntry(
        (v \ "txn").extractOpt[String],
        (v \ "files").extract[Seq[String]],
        (v \ "keys").extract[Seq[String]],
        (v \ "rows").extract[Long],
        (v \ "removed").extractOpt[Seq[String]].getOrElse(Nil))
    } finally in.close()
  }

  /** All committed (version, entry) pairs, ascending version order —
    * the version is what the key index's watermark is measured against. */
  def readEntriesWithVersion(fs: FileSystem,
      root: Path): Seq[(Long, GraftLogEntry)] = {
    val dir = logDir(root)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .flatMap(s => EntryName.findFirstMatchIn(s.getPath.getName)
        .filter(_ => s.isFile).map(m => (m.group(1).toLong, s.getPath)))
      .sortBy(_._1)
      .map { case (version, path) => version -> parseEntry(fs, path) }
  }

  /** One entry read directly by version (entry files are named by their
    * version, so this is a point read — no history scan). */
  def readEntryAt(fs: FileSystem, root: Path,
      version: Long): Option[GraftLogEntry] = {
    val p = new Path(logDir(root), f"$version%020d.json")
    if (fs.exists(p)) Some(parseEntry(fs, p)) else None
  }

  /** Accelerated log view: newest checkpoint folded with the entries
    * after it. Entries are never deleted — a checkpoint only shortcuts
    * reads, so a lost/ignored checkpoint degrades to a full replay,
    * never to data loss. */
  def readState(fs: FileSystem, root: Path): GraftStoreState = {
    val dir = logDir(root)
    if (!fs.exists(dir))
      return GraftStoreState(-1L, -1L, Nil, Set.empty, Nil)
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val statuses = fs.listStatus(dir).filter(_.isFile)
    val entryPaths = statuses.toSeq
      .flatMap(s => EntryName.findFirstMatchIn(s.getPath.getName)
        .map(m => (m.group(1).toLong, s.getPath)))
      .sortBy(_._1)
    val maxEntry = entryPaths.lastOption.map(_._1).getOrElse(-1L)
    // a checkpoint newer than the newest entry would be corruption —
    // ignore it and fall back to the one before (or a full replay)
    val cp = statuses.toSeq
      .flatMap(s => CheckpointName.findFirstMatchIn(s.getPath.getName)
        .map(m => (m.group(1).toLong, s.getPath)))
      .filter(_._1 <= maxEntry)
      .sortBy(_._1).lastOption
    val (cpV, cpFiles, cpTxns) = cp match {
      case Some((v, p)) =>
        val in = fs.open(p)
        try {
          val j = org.json4s.jackson.JsonMethods.parse(
            new InputStreamReader(in, UTF_8))
          (v, (j \ "files").extract[Seq[String]],
            (j \ "txns").extract[Seq[String]].toSet)
        } finally in.close()
      case None => (-1L, Nil: Seq[String], Set.empty[String])
    }
    val tail = entryPaths.filter(_._1 > cpV)
      .map { case (v, p) => v -> parseEntry(fs, p) }
    GraftStoreState(maxEntry, cpV,
      foldFiles(cpFiles, tail.map(_._2)),
      cpTxns ++ tail.flatMap(_._2.txn),
      tail)
  }

  /** Write `_checkpoint.<v>.json` summarizing all history ≤ v (files +
    * txns; the keys live in the key index and in the entries). Keeps
    * the two newest checkpoints, prunes older ones. Caller must hold
    * `lockFor(root)`. */
  def writeCheckpoint(fs: FileSystem, root: Path, version: Long,
      files: Seq[String], txns: Set[String]): Unit = {
    val dir = logDir(root)
    val target = new Path(dir, f"_checkpoint.$version%020d.json")
    if (fs.exists(target)) return
    val tmp = new Path(dir,
      f"._checkpoint.$version%020d.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try {
      import org.json4s.JsonDSL._
      val json = ("version" -> version) ~ ("files" -> files) ~
        ("txns" -> txns.toSeq.sorted)
      val w = new OutputStreamWriter(out, UTF_8)
      w.write(org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(json)))
      w.flush()
    } finally out.close()
    if (!fs.rename(tmp, target)) { fs.delete(tmp, false); return }
    fs.listStatus(dir).toSeq
      .flatMap(s => CheckpointName.findFirstMatchIn(s.getPath.getName)
        .map(m => (m.group(1).toLong, s.getPath)))
      .sortBy(-_._1).drop(2)
      .foreach { case (_, p) => fs.delete(p, false) }
  }

  def committedKeys(entries: Seq[GraftLogEntry]): Set[String] =
    entries.iterator.flatMap(_.keys).toSet

  /** Visible files after folding adds and removes in commit order. */
  private[sinks] def foldFiles(base: Seq[String],
      entries: Seq[GraftLogEntry]): Seq[String] = {
    val files = mutable.LinkedHashSet(base: _*)
    entries.foreach { e => files ++= e.files; files --= e.removed }
    files.toSeq
  }

  private def nextVersion(fs: FileSystem, root: Path): Long = {
    val dir = logDir(root)
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).iterator
      .flatMap(s => EntryName.findFirstMatchIn(s.getPath.getName))
      .map(_.group(1).toLong)
      .foldLeft(-1L)(math.max) + 1
  }

  /** Append one entry atomically (temp + rename; retries the version on
    * a rename collision). Caller must hold `lockFor(root)`. Returns the
    * version the entry landed at (for the key index). */
  def appendEntry(fs: FileSystem, root: Path, entry: GraftLogEntry): Long = {
    val dir = logDir(root)
    fs.mkdirs(dir)
    var v = nextVersion(fs, root)
    var done = false
    var renameFailures = 0
    while (!done) {
      val tmp = new Path(dir, f".$v%020d.json.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, false)
      try {
        import org.json4s.JsonDSL._
        val json = ("txn" -> entry.txn.orNull) ~
          ("files" -> entry.files) ~ ("keys" -> entry.keys) ~
          ("rows" -> entry.rows) ~ ("removed" -> entry.removed)
        val w = new OutputStreamWriter(out, UTF_8)
        w.write(org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(json)))
        w.flush()
      } finally out.close()
      val target = new Path(dir, f"$v%020d.json")
      if (fs.exists(target) || !fs.rename(tmp, target)) {
        fs.delete(tmp, false)
        // rename returning false WITHOUT the target existing is not a
        // version collision — it's the filesystem refusing renames
        // (object-store emulation failure, permissions). Retrying
        // forever would spin under the commit lock and hang every
        // writer to this store; fail loudly like writeCheckpoint does.
        if (!fs.exists(target)) {
          renameFailures += 1
          if (renameFailures >= 5)
            throw new java.io.IOException(
              s"appendEntry: rename to $target failed $renameFailures " +
                "times with no competing version — aborting instead of " +
                "spinning under the commit lock")
        } else renameFailures = 0 // genuine collision; retry above it
        v = nextVersion(fs, root)
      } else done = true
    }
    v
  }

  /** Record the store schema once (first commit wins; later writes may
    * add columns — readers merge, mirroring the pre-sink store's
    * mergeSchema contract). */
  def writeSchemaIfAbsent(fs: FileSystem, root: Path, schema: StructType): Unit = {
    val f = schemaFile(root)
    if (fs.exists(f)) return
    val tmp = new Path(logDir(root), s"._schema.${java.util.UUID.randomUUID()}.tmp")
    fs.mkdirs(logDir(root))
    val out = fs.create(tmp, false)
    try {
      val w = new OutputStreamWriter(out, UTF_8)
      w.write(schema.json); w.flush()
    } finally out.close()
    if (!fs.rename(tmp, f)) fs.delete(tmp, false)
  }

  def readSchema(fs: FileSystem, root: Path): Option[StructType] = {
    val f = schemaFile(root)
    if (!fs.exists(f)) return None
    val in = fs.open(f)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      Some(DataType.fromJson(new String(bytes.toByteArray, UTF_8))
        .asInstanceOf[StructType])
    } finally in.close()
  }
}

/** User-facing read/inspect surface for a graft block store. */
object GraftBlocksStore {
  /** Read the store's committed contents.
    *
    * Visibility is log-driven — only files a commit published are read,
    * through Spark's native vectorized parquet scan (a hand-rolled DSv2
    * parquet reader here would only be slower; the connector's value is
    * the WRITE protocol). A directory with no `_graft_log` is a legacy
    * store written by the pre-sink `foreachBatch` path and is read as a
    * plain parquet directory. `mergeSchema` in both paths: stores
    * written across the language/caption schema upgrade mix 6- and
    * 8-column files.
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!GraftBlocksLog.exists(fs, p)) {
      // legacy fallback — but an empty or data-less root (e.g. only a
      // failed write's _graft_log/_lease residue) must read as an
      // empty typed frame, not die in parquet schema inference
      // "has data" must cover BOTH legacy layouts: flat (top-level
      // *.parquet files) and partitioned (key=…/ subdirectories, no
      // top-level files) — the latter read fine before the guard, so a
      // files-only probe would silently hide it behind the empty frame.
      // Any non-underscore, non-dot subdirectory counts: parquet
      // metadata dirs and the sink's own _graft_log/_lease residue all
      // start with '_'.
      val hasData = fs.exists(p) && fs.listStatus(p).exists { s =>
        val n = s.getPath.getName
        val visible = !n.startsWith(".") && !n.startsWith("_")
        (s.isFile && visible && n.endsWith(".parquet")) ||
          (s.isDirectory && visible)
      }
      if (!hasData)
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          GraftBlocksTableSink.DefaultSchema)
      return spark.read.option("mergeSchema", "true").parquet(root)
    }
    val files = GraftBlocksLog.readState(fs, p).files
      .map(n => new Path(GraftBlocksLog.dataDir(p), n).toString)
    if (files.isEmpty) {
      val schema = GraftBlocksLog.readSchema(fs, p)
        .getOrElse(GraftBlocksTableSink.DefaultSchema)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
    } else spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** Distinct blockBatch keys already committed (the conditional-insert
    * predicate set). */
  def committedKeys(spark: SparkSession, root: String): Set[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    GraftBlocksLog.committedKeys(GraftBlocksLog.readEntries(fs, p))
  }

  /** The store's commit history as a DataFrame — version, txn, files
    * added/removed, first-committed key count, rows. The ops surface for
    * "what happened to this store" (Delta's DESCRIBE HISTORY shape);
    * full-history scan by design. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val rootPath = fs.makeQualified(new Path(root))
    GraftBlocksLog.readEntriesWithVersion(fs, rootPath)
      .map { case (v, e) => (v, e.txn, e.files.size, e.removed.size,
        e.keys.size, e.rows) }
      .toDF("version", "txn", "files_added", "files_removed",
        "keys", "rows")
  }

  /** Keyed point read — the reference's DynamoDB `get_item` shape (S9,
    * upload_notion_blocks.py reads blocks by BlockBatch): resolve each
    * key to the log version that first committed it via the sharded key
    * index, then scan ONLY that commit's files instead of the whole
    * store. O(|keys| shard reads + first-commit files), not O(store).
    *
    * Compaction caveat: when a resolved commit's files were compacted
    * away, the rows live in compaction outputs (`c-*` files), which are
    * added conservatively — a fully-compacted store degrades toward a
    * filtered full read, which is then bounded by compaction's own
    * targetBytes file count. Legacy (log-less) stores fall back to a
    * filtered full read. */
  def readForKeys(spark: SparkSession, root: String, keys: Seq[String],
      keyColumn: String = "blockBatch"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val rootPath = fs.makeQualified(new Path(root))
    def keyFilter(df: DataFrame) = df.filter(col(keyColumn).isin(keys: _*))
    if (!GraftBlocksLog.exists(fs, rootPath))
      return keyFilter(read(spark, root))
    val state = GraftBlocksLog.readState(fs, rootPath)
    val live = state.files.toSet
    val found = GraftKeyIndex.versionsFor(fs, rootPath, keys)
    // keys the index doesn't know CAN still be committed when the index
    // lags the log (crash between publish and index, pre-index store):
    // a lagging watermark means "absent from the index" is not evidence
    // of absence, so widen to the unindexed entries' files (or, past a
    // checkpoint, to a filtered full read) rather than silently missing.
    // The watermark is only consulted when some key went unresolved —
    // the common all-found case stays at one shard read per key.
    val unindexedFiles =
      if (found.size == keys.distinct.size) Nil
      else {
        val watermark = GraftKeyIndex.readWatermark(fs, rootPath)
        if (watermark >= state.version) Nil
        else if (watermark < state.checkpointVersion)
          return keyFilter(read(spark, root))
        else state.tail.filter(_._1 > watermark).flatMap(_._2.files)
      }
    val versions = found.values.toSet
    // readState already parsed every post-checkpoint entry — serve
    // those versions from the in-memory tail and point-read only the
    // pre-checkpoint ones (each readEntryAt is an FS open+parse round
    // trip, expensive on object stores; recently-committed keys — the
    // common point-read target — all resolve to tail versions)
    val tailByVersion = state.tail.toMap
    val resolved = (versions.toSeq.sorted.flatMap(v =>
      tailByVersion.get(v).map(_.files).getOrElse(
        GraftBlocksLog.readEntryAt(fs, rootPath, v).toSeq.flatMap(_.files))) ++
      unindexedFiles)
    val (liveFiles, compactedAway) = resolved.distinct.partition(live.contains)
    val files = (liveFiles ++
      (if (compactedAway.nonEmpty) live.filter(_.startsWith("c-")) else Nil))
      .distinct
    if (files.isEmpty) {
      val schema = GraftBlocksLog.readSchema(fs, rootPath)
        .getOrElse(GraftBlocksTableSink.DefaultSchema)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    keyFilter(spark.read.option("mergeSchema", "true").parquet(
      files.map(n => new Path(GraftBlocksLog.dataDir(rootPath), n).toString): _*))
  }

  /** Rewrite small committed files into ~`targetBytes` ones — the
    * small-files answer for a store fed one file per task per epoch by
    * a long-running stream. Atomic via the log: the compacted file is
    * written to `data/` (invisible until logged), then ONE entry both
    * adds it and marks the inputs `removed`. No keys change, so the
    * key index and first-writer-wins are untouched. The inputs stay on
    * disk (readers planned against an older state may still be
    * scanning them) until [[vacuum]] reclaims them past its retention.
    *
    * Returns the number of files compacted away (0 = nothing to do). */
  def compact(spark: SparkSession, root: String,
      smallerThan: Long = 32L * 1024 * 1024,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val rootPath = fs.makeQualified(new Path(root))
    GraftBlocksLog.lockFor(rootPath.toString).synchronized {
      GraftStoreLease.acquire(fs, rootPath)
      val state = GraftBlocksLog.readState(fs, rootPath)
      // heal BEFORE recording our own entry: recordCommit below advances
      // the watermark, which would otherwise skip (and permanently
      // un-index) any entries a crash or the pre-index era left behind
      GraftKeyIndex.healFromState(fs, rootPath, state)
      val dataD = GraftBlocksLog.dataDir(rootPath)
      val smalls = state.files
        .map(n => new Path(dataD, n))
        .filter(fs.exists) // defensive: a vacuumed-early file can't be read
        .map(fs.getFileStatus)
        .filter(_.getLen < smallerThan)
      if (smalls.length < 2) return 0
      val totalBytes = smalls.map(_.getLen).sum
      val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      val tag = java.util.UUID.randomUUID().toString
      val tmpOut = new Path(GraftBlocksLog.stagingDir(rootPath), s".compact-$tag")
      spark.read.option("mergeSchema", "true")
        .parquet(smalls.map(_.getPath.toString): _*)
        .coalesce(nOut)
        .write.mode("overwrite").parquet(tmpOut.toString)
      val parts = fs.listStatus(tmpOut).map(_.getPath)
        .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      val newNames = parts.zipWithIndex.map { case (p, i) =>
        val name = s"c-$tag-$i.parquet"
        if (!fs.rename(p, new Path(dataD, name)))
          throw new java.io.IOException(s"graft-blocks: failed to publish $p")
        name
      }
      fs.delete(tmpOut, true)
      val removed = smalls.map(_.getPath.getName).toSeq
      val v = GraftBlocksLog.appendEntry(fs, rootPath, GraftLogEntry(
        None, newNames.toSeq, Nil, 0L, removed)) // rows=0: nothing new
      GraftKeyIndex.recordCommit(fs, rootPath, v, Nil) // keep watermark current
      removed.size
    }
  }

  /** Delete data files no committed state references (compacted-away
    * inputs, residue) once older than `retentionMs`, plus stale staging
    * files. The retention window protects readers that planned against
    * a pre-compaction state — size it beyond your longest query, as
    * Delta's VACUUM does. Returns the number of files deleted. */
  def vacuum(spark: SparkSession, root: String,
      retentionMs: Long = 7L * 24 * 3600 * 1000): Int = {
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val rootPath = fs.makeQualified(new Path(root))
    GraftBlocksLog.lockFor(rootPath.toString).synchronized {
      GraftStoreLease.acquire(fs, rootPath)
      val live = GraftBlocksLog.readState(fs, rootPath).files.toSet
      val horizon = System.currentTimeMillis() - retentionMs
      val dataD = GraftBlocksLog.dataDir(rootPath)
      val staging = GraftBlocksLog.stagingDir(rootPath)
      var deleted = 0
      if (fs.exists(dataD))
        fs.listStatus(dataD)
          .filter(s => s.isFile && !live.contains(s.getPath.getName) &&
            s.getModificationTime < horizon)
          .foreach { s => if (fs.delete(s.getPath, false)) deleted += 1 }
      if (fs.exists(staging))
        fs.listStatus(staging)
          .filter(_.getModificationTime < horizon)
          .foreach { s => if (fs.delete(s.getPath, s.isDirectory)) deleted += 1 }
      // key-index residue: a crash between a re-shard's _meta swap and
      // its old-generation deletion leaves complete-but-dead g<N> dirs
      // (and gen-0 s<NN> dirs) behind — sweep generations below the
      // active one, honoring the same retention horizon
      deleted += GraftKeyIndex.vacuumStaleGenerations(fs, rootPath, horizon)
      deleted
    }
  }
}
