package graft.sinks

import java.util.{Map => JMap, Set => JSet}

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.SerializableHadoopConf

/** DataSourceV2 WRITE path for the block store — the K3/K4
  * conditional-insert semantics (reference
  * store_notion_blocks.py:128-150: `put_item` with
  * `ConditionExpression=Attr("BlockBatch").not_exists()`) as a proper
  * `SupportsWrite` table:
  *
  * {{{
  *   blocks.write.format("graft-blocks").option("path", dir)
  *     .mode("append").save()                       // batch
  *   blocks.writeStream.format("graft-blocks")...   // micro-batch
  *   blocks.writeTo("graft.blocks").append()        // via GraftCatalog
  * }}}
  *
  *  - **First-writer-wins.** A row whose `blockBatch` key was committed
  *    by ANY earlier write is dropped, never overwritten — re-delivered
  *    events and manual re-runs are no-ops, while a re-uploaded
  *    document (new mtime → new batch key) lands as a new page, exactly
  *    the reference's condition-expression contract. Enforced twice:
  *    writers filter against the key snapshot taken at write planning
  *    (the cheap, distributed path), and the commit re-checks under the
  *    store lock (the authoritative path, healing writes planned
  *    against a stale snapshot).
  *  - **Exactly-once micro-batches.** A streaming epoch commits under a
  *    `queryId#epochId` transaction id; a crash between sink-commit and
  *    checkpoint-commit replays the epoch, the log already has the txn,
  *    and the replay's staged files are discarded.
  *  - **Atomic visibility.** Tasks write parquet to `_staging/` (via
  *    Spark's own `ParquetWriteSupport`, so files are byte-identical to
  *    native Spark output); commit renames them into `data/` and then
  *    publishes ONE log entry. Readers only see logged files — a crash
  *    at any point leaves invisible residue, never partial data.
  *
  * The store is append-only by design (so is the reference's — blocks
  * are immutable once stored; pages supersede via new batch ids), so
  * overwrite/truncate are deliberately unsupported.
  */
class GraftBlocksDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-blocks"
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-blocks requires a path"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val p = new Path(pathOf(options))
    val fs = p.getFileSystem(
      graft.sources.MediaWikiDumpTable.sessionHadoopConf().value)
    GraftBlocksLog.readSchema(fs, p).getOrElse(GraftBlocksTableSink.DefaultSchema)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    require(partitioning.isEmpty, "graft-blocks tables are unpartitioned")
    new GraftBlocksTableSink(
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("graft-blocks requires a path")),
      schema,
      Option(properties.get("keyColumn")).getOrElse("blockBatch"))
  }
}

object GraftBlocksTableSink {
  /** Schema-compatibility rule for appends: new columns are fine
    * (readers mergeSchema) and missing columns are fine, but (a) a
    * same-named column with a different type — nullability aside, which
    * parquet merging accepts — would poison every merged read, and (b) a
    * case-VARIANT of an existing name would merge into two half-null
    * columns that ambiguous-reference under Spark's case-insensitive
    * resolution. Both are rejected. Called at write planning (fail-fast
    * UX) AND under the commit lock (authoritative — two writes racing a
    * fresh store both plan against no schema). */
  def assertSchemaCompatible(stored: StructType, writing: StructType,
      where: String): Unit = {
    val conflicts = writing.fields.flatMap { f =>
      stored.fields.find(_.name.equalsIgnoreCase(f.name)).flatMap { s =>
        if (s.name != f.name)
          Some(s"${f.name}: store spells it ${s.name} (case-sensitive " +
            "parquet merge would create both)")
        else if (!org.apache.spark.sql.types.DataType.equalsStructurally(
            s.dataType, f.dataType, ignoreNullability = true))
          Some(s"${f.name}: writing ${f.dataType.simpleString}, " +
            s"store has ${s.dataType.simpleString}")
        else None
      }
    }
    if (conflicts.nonEmpty)
      throw new IllegalArgumentException(
        s"graft-blocks: written schema conflicts with the store schema " +
          s"at $where (${conflicts.mkString("; ")}); this would break " +
          "merged reads of existing data")
  }

  /** The blocks-store schema `Ingest.explodeBlocks` produces (reference
    * blocks table: BlockBatch, BlockIndex, S3BucketName, S3ObjectKey,
    * BlockContent — here with the pickle blob as typed columns). */
  val DefaultSchema: StructType = StructType(Seq(
    StructField("blockBatch", StringType),
    StructField("blockIndex", IntegerType),
    StructField("bucket", StringType),
    StructField("key", StringType),
    StructField("blockType", StringType),
    StructField("title", StringType),
    StructField("language", StringType),
    StructField("caption", StringType)))
}

class GraftBlocksTableSink(path: String, tableSchema: StructType,
    keyColumn: String) extends Table with SupportsWrite {
  override def name(): String = s"graft-blocks:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val schema = info.schema()
    val ord = schema.fieldNames.indexOf(keyColumn)
    if (ord < 0 || schema(ord).dataType != StringType)
      throw new IllegalArgumentException(
        s"graft-blocks: key column '$keyColumn' must exist with string " +
          s"type in the written schema (got ${schema.simpleString})")
    // fail fast at planning; the authoritative check re-runs under the
    // commit lock (see GraftCommitter.commit)
    val p = new Path(path)
    val fs = p.getFileSystem(
      graft.sources.MediaWikiDumpTable.sessionHadoopConf().value)
    GraftBlocksLog.readSchema(fs, fs.makeQualified(p)).foreach { stored =>
      GraftBlocksTableSink.assertSchemaCompatible(stored, schema,
        "write planning")
    }
    new WriteBuilder {
      override def build(): Write =
        new GraftBlocksWrite(path, schema, ord, keyColumn, info.queryId())
    }
  }
}

case class GraftCommitMessage(file: Option[String], keys: Seq[String],
    rows: Long) extends WriterCommitMessage

/** One logical write: carries the key probe (bloom bytes, not the key
  * set) and a prepared Hadoop conf (ParquetWriteSupport settings
  * mirrored from the session's SQLConf, as Spark's own parquet write
  * path does) to the tasks. */
class GraftBlocksWrite(root: String, dataSchema: StructType, keyOrd: Int,
    keyColumn: String, queryId: String)
    extends Write with BatchWrite with StreamingWrite with Logging {

  private val writeId = java.util.UUID.randomUUID().toString
  private val hconf: SerializableHadoopConf = {
    val session = SparkSession.active
    val conf = session.sessionState.newHadoopConf()
    val sql = session.sessionState.conf
    ParquetWriteSupport.setSchema(dataSchema, conf)
    // ParquetWriteSupport/SparkToParquetSchemaConverter read these keys
    // with no default — mirror them from the session's SQLConf exactly
    // as Spark's own ParquetUtils.prepareWrite does
    Seq(SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
        SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE,
        SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
        SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE,
        SQLConf.PARQUET_REBASE_MODE_IN_WRITE,
        SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE)
      .foreach(e => conf.set(e.key, sql.getConf(e).toString))
    new SerializableHadoopConf(conf)
  }
  /** First-writer-wins snapshot for the distributed filter: bloom bytes
    * (constant-size) for index-backed stores, never the exact key set —
    * see [[GraftKeyIndex]]. */
  private def freshProbe(): GraftKeyProbe = {
    val p = new Path(root)
    val fs = p.getFileSystem(hconf.value)
    GraftKeyProbe.forStore(fs, fs.makeQualified(p), hconf)
  }
  // created at batch planning (the streaming path takes a fresh probe
  // per epoch instead), released at batch commit/abort
  private var batchProbe: GraftKeyProbe = null

  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = this
  // BatchWrite and StreamingWrite both default this; disambiguate
  override def useCommitCoordinator(): Boolean = true

  // ---- batch ----
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    batchProbe = freshProbe()
    new GraftWriterFactory(root, dataSchema, keyOrd, batchProbe, writeId,
      hconf)
  }
  // tasks are done once commit/abort runs: the probe's broadcast can go
  // now (a long-lived driver doing many batch writes would otherwise
  // hold one filter-sized broadcast per write until a GC-driven pass)
  private def releaseBatchProbe(): Unit =
    if (batchProbe != null) { batchProbe.release(); batchProbe = null }
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    try GraftCommitter.commit(root, hconf.value, None, dataSchema, keyColumn,
      writeId, messages.map(_.asInstanceOf[GraftCommitMessage]).toSeq)
    finally releaseBatchProbe()
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    try GraftCommitter.abort(root, hconf.value, writeId)
    finally releaseBatchProbe()

  // ---- streaming ----
  // a StreamingWrite lives for the whole query, but Spark plans each
  // micro-batch afresh and calls this per epoch — re-reading the bloom
  // here (one small file) keeps the writer-side filter current with the
  // keys earlier epochs committed, so re-delivered batches drop at the
  // task instead of surviving to commit-side deletion
  private var lastEpochProbe: GraftKeyProbe = null
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val probe = freshProbe()
    // micro-batches are sequential: the previous epoch's tasks are done,
    // so its probe's broadcast blocks can be released now — otherwise a
    // short trigger interval accumulates one filter-sized broadcast per
    // epoch until ContextCleaner's GC-driven pass
    if (lastEpochProbe != null) lastEpochProbe.release()
    lastEpochProbe = probe
    new GraftWriterFactory(root, dataSchema, keyOrd, probe, writeId,
      hconf)
  }
  // the epoch's tasks are done by commit/abort time, so its probe's
  // broadcast is released HERE (not only on replacement at the next
  // epoch's planning) — this also covers the FINAL epoch of a query,
  // whose probe previously lived until ContextCleaner noticed
  private def releaseEpochProbe(): Unit =
    if (lastEpochProbe != null) { lastEpochProbe.release(); lastEpochProbe = null }
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    try GraftCommitter.commit(root, hconf.value, Some(s"$queryId#$epochId"),
      dataSchema, keyColumn, writeId,
      messages.map(_.asInstanceOf[GraftCommitMessage]).toSeq)
    finally releaseEpochProbe()
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    try GraftCommitter.abort(root, hconf.value, writeId)
    finally releaseEpochProbe()
}

class GraftWriterFactory(root: String, schema: StructType, keyOrd: Int,
    keyProbe: GraftKeyProbe, writeId: String,
    hconf: SerializableHadoopConf)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(root, schema, keyOrd, keyProbe,
      s"$writeId-b-$partitionId-$taskId.parquet", hconf)
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(root, schema, keyOrd, keyProbe,
      s"$writeId-e$epochId-$partitionId-$taskId.parquet", hconf)
}

/** Task-side writer: filters first-writer-wins through the planning
  * probe (bloom pre-filter + exact shard verify — see [[GraftKeyProbe]]),
  * opens the parquet file lazily (empty partitions leave no file),
  * records the distinct keys it wrote for the commit check. */
class GraftDataWriter(root: String, schema: StructType, keyOrd: Int,
    keyProbe: GraftKeyProbe, fileName: String,
    hconf: SerializableHadoopConf) extends DataWriter[InternalRow] {

  private val stagedPath =
    new Path(GraftBlocksLog.stagingDir(new Path(root)), fileName)
  private var writer: ParquetWriter[InternalRow] = _
  private val keys = mutable.LinkedHashSet.empty[String]
  private var rows = 0L

  private def open(): Unit = {
    val fs = stagedPath.getFileSystem(hconf.value)
    fs.mkdirs(stagedPath.getParent)
    writer = new GraftDataWriter.InternalRowWriterBuilder(
      HadoopOutputFile.fromPath(stagedPath, hconf.value))
      .withConf(hconf.value)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  override def write(row: InternalRow): Unit = {
    if (row.isNullAt(keyOrd))
      throw new IllegalArgumentException(
        "graft-blocks: the batch key column must be non-null (it is the " +
          "store's partition key, reference blocks table BlockBatch)")
    val key = row.getUTF8String(keyOrd).toString
    if (!keyProbe.committed(key)) {
      if (writer == null) open()
      writer.write(row)
      keys += key
      rows += 1L
    }
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    GraftCommitMessage(if (rows > 0) Some(fileName) else None,
      keys.toSeq, rows)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    stagedPath.getFileSystem(hconf.value).delete(stagedPath, false)
  }

  override def close(): Unit = ()
}

object GraftDataWriter {
  /** ParquetWriter over Spark's own InternalRow WriteSupport — staged
    * files are indistinguishable from native Spark parquet output. */
  private class InternalRowWriterBuilder(file: HadoopOutputFile)
      extends ParquetWriter.Builder[InternalRow, InternalRowWriterBuilder](file) {
    override def self(): InternalRowWriterBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport()
  }
}

/** Driver-side commit protocol. All mutations of a store root are
  * serialized by `GraftBlocksLog.lockFor` (keyed on the QUALIFIED root,
  * so path spellings collapse to one lock) within the driver, and by
  * [[GraftStoreLease]] across drivers — read-log → decide → rename →
  * append-entry → index is atomic for the owning driver. */
object GraftCommitter extends Logging {

  def commit(root: String, conf: Configuration, txn: Option[String],
      schema: StructType, keyColumn: String, writeId: String,
      messages: Seq[GraftCommitMessage]): Unit = {
    val fs = new Path(root).getFileSystem(conf)
    val rootPath = fs.makeQualified(new Path(root))
    GraftBlocksLog.lockFor(rootPath.toString).synchronized {
      // cross-driver exclusion: refuse (or steal an expired) foreign
      // lease BEFORE any store mutation; renews our heartbeat otherwise
      GraftStoreLease.acquire(fs, rootPath)
      // pre-sink stores: fold unlogged root-level parquet into the log
      // so their rows stay visible and their keys dedupe (one-time)
      adoptLegacyFiles(fs, rootPath, keyColumn)
      val staging = GraftBlocksLog.stagingDir(rootPath)
      val state = GraftBlocksLog.readState(fs, rootPath)
      // index lagging the log (crash between publish and index, or a
      // log that predates the key index): replay the missing entries
      GraftKeyIndex.healFromState(fs, rootPath, state)
      // authoritative schema check: two writes racing a fresh store both
      // plan against no stored schema, so planning alone can't catch a
      // conflict — the loser must be refused here, under the lock
      GraftBlocksLog.readSchema(fs, rootPath).foreach(stored =>
        GraftBlocksTableSink.assertSchemaCompatible(stored, schema, "commit"))

      if (txn.exists(state.txns.contains)) {
        // replayed epoch (crash between sink-commit and checkpoint
        // commit): the data is already visible — discard the replay
        logInfo(s"graft-blocks: epoch ${txn.get} already committed; " +
          "discarding replayed staged files")
        messages.flatMap(_.file)
          .foreach(f => fs.delete(new Path(staging, f), false))
        cleanupStaging(fs, staging, writeId)
        return
      }

      // authoritative first-writer-wins check: exact, but reads only
      // the shards this write's candidate keys hash into
      val committedK = GraftKeyIndex.committedAmong(fs, rootPath,
        messages.flatMap(_.keys))
      val dataD = GraftBlocksLog.dataDir(rootPath)
      fs.mkdirs(dataD)
      val visible = mutable.ArrayBuffer.empty[String]
      val newKeys = mutable.LinkedHashSet.empty[String]
      var rows = 0L

      messages.foreach { m =>
        m.file.foreach { f =>
          val staged = new Path(staging, f)
          val overlap = m.keys.filter(committedK.contains).toSet
          if (overlap.isEmpty) {
            if (!fs.rename(staged, new Path(dataD, f)))
              throw new java.io.IOException(
                s"graft-blocks: failed to publish $staged")
            visible += f
            newKeys ++= m.keys
            rows += m.rows
          } else if (m.keys.forall(committedK.contains)) {
            // every key in the file lost the race — wholly superseded
            fs.delete(staged, false)
          } else {
            // mixed file: written against a snapshot that went stale
            // under a concurrent write in this JVM — keep only the rows
            // whose keys are still first
            val (healed, healedRows) =
              heal(fs, staged, dataD, f, overlap, keyColumn)
            visible += healed
            newKeys ++= m.keys.filterNot(committedK.contains)
            rows += healedRows
          }
        }
      }

      if (visible.nonEmpty || txn.isDefined) {
        GraftBlocksLog.writeSchemaIfAbsent(fs, rootPath, schema)
        val version = GraftBlocksLog.appendEntry(fs, rootPath,
          GraftLogEntry(txn, visible.toSeq, newKeys.toSeq, rows))
        // index AFTER the entry is live (visible segments only ever
        // describe committed keys); a crash in between is healed above
        GraftKeyIndex.recordCommit(fs, rootPath, version, newKeys.toSeq)
        // periodic checkpoint so readers and future commits replay a
        // bounded tail instead of the whole history
        val interval = GraftBlocksLog.checkpointInterval
        if (interval > 0 && version > 0 && version % interval == 0) {
          GraftBlocksLog.writeCheckpoint(fs, rootPath, version,
            state.files ++ visible, state.txns ++ txn)
          // fold the bloom forward here (amortized), not per commit:
          // add the keys of every entry since the bloom's covered
          // version. Normally those all sit in the pre-commit tail +
          // this commit (folds ride every checkpoint) — but a crash
          // between a previous checkpoint and ITS fold leaves covered
          // behind the tail's reach, and folding past that gap would
          // orphan the skipped interval's keys from the bloom forever
          // (under-filtering on every rewrite of them). Detect the gap
          // and take the full-history read once, like
          // effectiveBloomBytes does. Header-only read: the covered
          // version lives in the fixed-size header, so this does not
          // deserialize the count-proportional filter bytes twice.
          val covered = GraftKeyIndex.readBloomCovered(fs, rootPath)
            .getOrElse(-1L)
          val tailMin = state.tail.map(_._1).minOption.getOrElse(version)
          val uncovered =
            if (covered >= 0 && covered + 1 < tailMin)
              // the full-history read runs AFTER appendEntry published
              // THIS commit, so exclude `version` — newKeys is appended
              // below and including it here would double-count the
              // commit's keys into the bloom's count header (tripping a
              // premature full rebuild at a later checkpoint). The
              // normal branch's state.tail was read pre-commit and
              // never contains `version`.
              GraftBlocksLog.readEntriesWithVersion(fs, rootPath)
                .filter(e => e._1 > covered && e._1 < version)
                .flatMap(_._2.keys)
            else state.tail.filter(_._1 > covered).flatMap(_._2.keys)
          GraftKeyIndex.foldBloom(fs, rootPath, uncovered ++ newKeys, version)
        }
      }
      cleanupStaging(fs, staging, writeId)
    }
  }

  def abort(root: String, conf: Configuration, writeId: String): Unit = {
    val fs = new Path(root).getFileSystem(conf)
    val rootPath = fs.makeQualified(new Path(root))
    GraftBlocksLog.lockFor(rootPath.toString).synchronized {
      cleanupStaging(fs, GraftBlocksLog.stagingDir(rootPath), writeId)
    }
  }

  /** Migration path for stores written by the pre-sink `foreachBatch`
    * era: parquet files sitting directly under the root are unlogged, so
    * the first log-driven commit would silently shadow them. Adopt them
    * instead — move into `data/`, publish one log entry carrying their
    * files and distinct key set — so existing rows stay readable and
    * first-writer-wins dedupes against them. Idempotent (adopted files
    * leave the root); fails fast when the legacy data lacks the key
    * column rather than guessing. */
  private def adoptLegacyFiles(fs: org.apache.hadoop.fs.FileSystem,
      rootPath: Path, keyColumn: String): Unit = {
    if (!fs.exists(rootPath)) return
    val legacy = fs.listStatus(rootPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    if (legacy.isEmpty) return
    val spark = SparkSession.active
    val df = spark.read.option("mergeSchema", "true")
      .parquet(legacy.map(_.toString): _*)
    if (!df.columns.contains(keyColumn))
      throw new IllegalStateException(
        s"graft-blocks: cannot adopt ${legacy.length} pre-sink parquet " +
          s"file(s) under $rootPath — they lack key column '$keyColumn'. " +
          "Migrate or remove them before writing through the sink.")
    val agg = df.agg(
      org.apache.spark.sql.functions.collect_set(col(keyColumn)),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))
    ).head()
    val keys = agg.getSeq[String](0)
    val rows = agg.getLong(1)
    val dataD = GraftBlocksLog.dataDir(rootPath)
    fs.mkdirs(dataD)
    val names = legacy.map { p =>
      if (!fs.rename(p, new Path(dataD, p.getName)))
        throw new java.io.IOException(
          s"graft-blocks: failed to adopt legacy file $p")
      p.getName
    }
    GraftBlocksLog.writeSchemaIfAbsent(fs, rootPath, df.schema)
    GraftBlocksLog.appendEntry(fs, rootPath,
      GraftLogEntry(None, names.toSeq, keys, rows))
    logInfo(s"graft-blocks: adopted ${names.length} pre-sink parquet " +
      s"file(s) (${keys.size} keys, $rows rows) under $rootPath")
  }

  /** Remove every staged file this write produced (committed ones were
    * renamed away already; what remains is task residue from failed or
    * speculative attempts). Other writes' files are untouched. */
  private def cleanupStaging(fs: org.apache.hadoop.fs.FileSystem,
      staging: Path, writeId: String): Unit =
    if (fs.exists(staging))
      fs.listStatus(staging)
        .filter(_.getPath.getName.startsWith(s"$writeId-"))
        .foreach(s => fs.delete(s.getPath, false))

  /** Rewrite a staged file dropping rows whose keys were committed
    * first elsewhere. Rare path (requires two same-JVM writes racing on
    * the same keys), so a one-file Spark job is fine. */
  private def heal(fs: org.apache.hadoop.fs.FileSystem, staged: Path,
      dataD: Path, name: String, overlap: Set[String],
      keyColumn: String): (String, Long) = {
    val spark = SparkSession.active
    val tmpOut = new Path(staged.getParent,
      s".heal-${java.util.UUID.randomUUID()}")
    val kept = spark.read.parquet(staged.toString)
      .filter(!col(keyColumn).isin(overlap.toSeq: _*))
    kept.coalesce(1).write.mode("overwrite").parquet(tmpOut.toString)
    val part = fs.listStatus(tmpOut)
      .map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(
        s"graft-blocks: heal produced no part file under $tmpOut"))
    // row count from the parquet footer — metadata only, no second scan
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(part, fs.getConf))
    val healedRows = try reader.getRecordCount finally reader.close()
    val healedName = s"h-$name"
    if (!fs.rename(part, new Path(dataD, healedName)))
      throw new java.io.IOException(s"graft-blocks: failed to publish $part")
    fs.delete(staged, false)
    fs.delete(tmpOut, true)
    (healedName, healedRows)
  }
}
