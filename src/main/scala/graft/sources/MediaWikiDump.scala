package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, IOException, InputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.{Map => JMap, Set => JSet}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 provider for MediaWiki XML dumps:
  * `spark.read.format("mediawiki").load(path)`.
  *
  * The reference consumes the dump with a SAX handler and a
  * driver-resident namespace map (process-mw-dump.py:35-89); here the
  * same shape becomes a first-class Spark table:
  *
  *  - **Streaming parse.** Each split is read with StAX — constant
  *    memory per page, never a whole-file DOM. The `<siteinfo>`
  *    namespace registry at the head of the stream is resolved INSIDE
  *    the source, so `ns_name` arrives as a column and the usual
  *    registry broadcast join disappears from user plans (key 0 is
  *    renamed "Main", process-mw-dump.py:41-43).
  *  - **Column pruning.** `SupportsPushDownRequiredColumns`: unprojected
  *    fields — most importantly the revision text, the bulk of any
  *    dump — are skipped at the tokenizer level, never materialized as
  *    strings.
  *  - **Filter pushdown.** `SupportsPushDownFilters`: `=`/`IN` on `ns`
  *    and `ns_name` apply as soon as the page's `<ns>` element is seen
  *    (it precedes `<revision>` in the dump schema), so filtered-out
  *    pages never pay for their body.
  *  - **Partitioning.** A 100 GB dump must not become one task. Three
  *    split strategies, per file:
  *      1. multistream bz2 with a companion `-index.txt[.bz2]`
  *         (`offset:pageid:title` lines): the distinct stream offsets
  *         are the split list — one `InputPartition` per stream range,
  *         coalesced up to `splitSize`; each range is independently
  *         decompressable by construction.
  *      2. plain XML larger than `splitSize` (default 128 MiB): byte
  *         ranges; each reader seeks to its range start and scans to
  *         the next `<page>` boundary, owning pages whose start tag
  *         falls inside `[start, end)` — the Hadoop text-split
  *         convention. Sound because page content is XML-escaped, so a
  *         literal `<page>` tag cannot occur inside a text node (the
  *         long-standing Mahout `XmlInputFormat` premise).
  *      3. everything else: one split per file (a bz2 dump WITHOUT an
  *         index is not seekable — it falls back to a single
  *         decompressing split, with a warning).
  *    The namespace registry for split files is parsed ONCE from the
  *    stream head on the driver and shipped inside each partition.
  *
  * **Landing contract.** Dump files must be immutable once visible:
  * land them write-then-rename (or copy under a '.'/'_' prefix, which
  * the source ignores, then rename). Planner metadata is memoized on
  * (path, length, mtime), so overwriting a file IN PLACE with same
  * length within the filesystem's mtime granularity can serve stale
  * registry/split data — in-place rewrites are unsupported.
  */
class MediaWikiDumpDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mediawiki"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MediaWikiDumpTable.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("mediawiki source requires a path"))
    new MediaWikiDumpTable(path)
  }
}

/** Java-serializable Hadoop Configuration wrapper so executors read
  * files with the SESSION's conf (spark.hadoop.* credentials,
  * fs.defaultFS, custom filesystems) instead of a blank default. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  @throws(classOf[IOException])
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  @throws(classOf[IOException])
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object MediaWikiDumpTable {
  val DefaultSplitSize: Long = 128L * 1024 * 1024
  /** The active session's Hadoop conf on the driver; a plain default
    * outside a session (tests constructing readers directly). */
  def sessionHadoopConf(): SerializableHadoopConf =
    new SerializableHadoopConf(
      SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration()))
  /** Flattened page schema (FIXTURES.md §1): upload contents stay
    * base64-encoded — decoding is a one-expression `unbase64`
    * downstream, and most reads never touch them. */
  val fullSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("ns", IntegerType),
    StructField("ns_name", StringType),
    StructField("text", StringType),
    StructField("upload_filename", StringType),
    StructField("upload_encoding", StringType),
    StructField("upload_contents", StringType)))
}

class MediaWikiDumpTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"mediawiki:$path"
  override def schema(): StructType = MediaWikiDumpTable.fullSchema
  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val splitSize =
      options.getLong("splitSize", MediaWikiDumpTable.DefaultSplitSize)
    // a non-positive split silently plans ZERO partitions for large
    // files (empty range fold) — refuse at the option boundary
    require(splitSize > 0,
      s"mediawiki: splitSize must be positive, got $splitSize")
    new MediaWikiScanBuilder(path, splitSize)
  }
}

class MediaWikiScanBuilder(path: String, splitSize: Long) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var requiredSchema: StructType = MediaWikiDumpTable.fullSchema
  private var nsFilter: Option[Set[Int]] = None
  private var nsNameFilter: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(s: StructType): Unit = requiredSchema = s

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def intersect(cur: Option[Set[Int]], add: Set[Int]) =
      Some(cur.fold(add)(_ intersect add))
    def intersectS(cur: Option[Set[String]], add: Set[String]) =
      Some(cur.fold(add)(_ intersect add))
    val (supported, rest) = filters.partition {
      case EqualTo("ns", _: Int) => true
      case In("ns", vs) => vs.forall(_.isInstanceOf[Int])
      case EqualTo("ns_name", _: String) => true
      case In("ns_name", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    supported.foreach {
      case EqualTo("ns", v: Int) => nsFilter = intersect(nsFilter, Set(v))
      case In("ns", vs) =>
        nsFilter = intersect(nsFilter, vs.map(_.asInstanceOf[Int]).toSet)
      case EqualTo("ns_name", v: String) =>
        nsNameFilter = intersectS(nsNameFilter, Set(v))
      case In("ns_name", vs) =>
        nsNameFilter = intersectS(nsNameFilter, vs.map(_.asInstanceOf[String]).toSet)
      case _ => ()
    }
    pushed = supported
    // fully applied in the source; nothing needs Spark-side re-evaluation
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new MediaWikiScan(path, requiredSchema, nsFilter, nsNameFilter, splitSize)
}

/** One whole file per task; the reader parses the registry in-stream. */
case class MediaWikiInputPartition(file: String) extends InputPartition

/** A byte range of one file. `compressed = false`: plain XML — the
  * reader seeks to `start` and owns pages whose `<page>` tag starts in
  * `[start, end)`. `compressed = true`: `[start, end)` is a run of
  * whole bz2 streams (from the multistream index) — every page that
  * decompresses out of the range is owned. The namespace registry was
  * parsed from the file head at planning time. */
case class MediaWikiRangePartition(file: String, start: Long, end: Long,
    compressed: Boolean, registry: Map[Int, String]) extends InputPartition

/** Driver-side planning: listing hygiene, split computation, and the
  * one-time head parse of the namespace registry for split files.
  *
  * The head parse (and, for multistream bz2, the full companion-index
  * read) happens on the DRIVER once per file per `planInputPartitions`
  * call — for a streaming query over a high-file-count directory that
  * would re-open every already-planned file each micro-batch. A memo
  * keyed on (path, length, modificationTime) makes the per-file work
  * once-per-lifetime: dump files are immutable once landed
  * (write-then-rename contract), so the key only changes when a file
  * is genuinely replaced. Bounded to [[MediaWikiPlanner.MemoMax]]
  * entries (a registry is a few hundred bytes; an index offset array a
  * few KB per GB of dump) with whole-cache reset on overflow — planner
  * memos are a throughput optimization, never a correctness input. */
object MediaWikiPlanner extends Logging {
  private val MemoMax = 4096
  private type MemoKey = (String, Long, Long)
  private val registryMemo =
    new java.util.concurrent.ConcurrentHashMap[MemoKey, Map[Int, String]]()
  private val indexMemo =
    new java.util.concurrent.ConcurrentHashMap[MemoKey, Array[Long]]()
  /** Cold parses performed (spec observability). */
  private[sources] val headParses = new java.util.concurrent.atomic.AtomicLong

  private def memoKey(st: FileStatus): MemoKey =
    (st.getPath.toString, st.getLen, st.getModificationTime)

  private def memoized[V](cache: java.util.concurrent.ConcurrentHashMap[MemoKey, V],
      st: FileStatus)(compute: => V): V = {
    val k = memoKey(st)
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      if (cache.size() >= MemoMax) cache.clear()
      headParses.incrementAndGet()
      val v = compute
      cache.put(k, v)
      v
    }
  }

  /** Memoized [[parseRegistryFromHead]] keyed on the dump's status. */
  def registryFor(fs: FileSystem, st: FileStatus): Map[Int, String] =
    memoized(registryMemo, st)(parseRegistryFromHead(fs, st.getPath))

  /** Memoized [[readIndexOffsets]] keyed on the index file's status. */
  def indexOffsetsFor(fs: FileSystem, idx: Path): Array[Long] =
    memoized(indexMemo, fs.getFileStatus(idx))(readIndexOffsets(fs, idx))

  /** Spark file-source convention: '.'/'_' prefixed names are metadata
    * (_SUCCESS, .crc, in-progress temp files), never data. */
  def isHiddenFile(name: String): Boolean =
    name.startsWith(".") || name.startsWith("_")
  /** Companion multistream index files are split metadata, not dumps. */
  def isIndexFile(name: String): Boolean =
    name.endsWith("-index.txt") || name.endsWith("-index.txt.bz2")

  def listDumpFiles(fs: FileSystem, p: Path): Array[FileStatus] = {
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).filter(s => s.isFile &&
          !isHiddenFile(s.getPath.getName) && !isIndexFile(s.getPath.getName))
        .sortBy(_.getPath.toString)
    else Array(st)
  }

  /** Candidate companion index paths for a `*.xml.bz2` dump
    * (`enwiki-…-multistream.xml.bz2` → `enwiki-…-multistream-index.txt[.bz2]`). */
  private def indexCandidates(dump: Path): Seq[Path] = {
    val name = dump.getName
    if (!name.endsWith(".xml.bz2")) Nil
    else {
      val base = name.dropRight(".xml.bz2".length)
      Seq(s"$base-index.txt.bz2", s"$base-index.txt")
        .map(n => new Path(dump.getParent, n))
    }
  }

  /** Distinct sorted bz2-stream start offsets from an
    * `offset:pageid:title` index file. Malformed lines (no ':', BOM,
    * partial-download fragments) are skipped with a warning — a dropped
    * offset only coalesces two streams into one split, never corrupts
    * data (ranges decompress concatenated streams regardless). */
  def readIndexOffsets(fs: FileSystem, index: Path): Array[Long] = {
    val raw: InputStream = fs.open(index)
    val in =
      try {
        if (index.getName.endsWith(".bz2"))
          new BZip2CompressorInputStream(new BufferedInputStream(raw, 64 * 1024), true)
        else raw
      } catch { case t: Throwable => raw.close(); throw t }
    try {
      var skipped = 0L
      val src = scala.io.Source.fromInputStream(in)(scala.io.Codec.UTF8)
      val offsets = src.getLines().filter(_.nonEmpty).flatMap { l =>
        val c = l.indexOf(':')
        val parsed =
          if (c <= 0) None
          else try Some(l.substring(0, c).trim.toLong)
          catch { case _: NumberFormatException => None }
        if (parsed.isEmpty) skipped += 1
        parsed
      }.toArray.distinct.sorted
      if (skipped > 0) logWarning(
        s"mediawiki: skipped $skipped malformed line(s) in index $index")
      offsets
    } finally in.close()
  }

  /** Parse the `<siteinfo>` namespace registry from the head of a dump
    * (stops at `</namespaces>` or the first `<page>`). */
  def parseRegistryFromHead(fs: FileSystem, file: Path): Map[Int, String] = {
    val raw: InputStream = fs.open(file)
    val in =
      try {
        if (file.getName.endsWith(".bz2"))
          new BZip2CompressorInputStream(new BufferedInputStream(raw, 64 * 1024), true)
        else raw
      } catch { case t: Throwable => raw.close(); throw t }
    val xml =
      try MediaWikiXml.newReader(in)
      catch { case t: Throwable => in.close(); throw t }
    try {
      val reg = mutable.Map.empty[Int, String]
      while (xml.hasNext) {
        xml.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            xml.getLocalName match {
              case "namespace" =>
                var k: String = null
                var i = 0
                while (i < xml.getAttributeCount) {
                  if (xml.getAttributeLocalName(i) == "key")
                    k = xml.getAttributeValue(i)
                  i += 1
                }
                if (k != null) {
                  val key = k.toInt
                  reg(key) = MediaWikiXml.nsLabel(key, xml.getElementText.trim)
                }
              case "page" => return reg.toMap
              case _ => ()
            }
          case XMLStreamConstants.END_ELEMENT
              if xml.getLocalName == "namespaces" => return reg.toMap
          case _ => ()
        }
      }
      reg.toMap
    } finally { xml.close(); in.close() }
  }

  /** Coalesce consecutive `[bound(i), bound(i+1))` ranges greedily up to
    * `splitSize` bytes per partition. */
  def coalesceRanges(bounds: Seq[Long], splitSize: Long): Seq[(Long, Long)] = {
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    var s = bounds.head
    var i = 1
    while (i < bounds.length) {
      val e = bounds(i)
      if (e - s >= splitSize || i == bounds.length - 1) {
        if (e > s) out += ((s, e))
        s = e
      }
      i += 1
    }
    out.toSeq
  }

  def partitionsForFile(fs: FileSystem, st: FileStatus,
      splitSize: Long): Seq[InputPartition] = {
    val file = st.getPath
    val len = st.getLen
    // only plain XML and multistream .bz2 are supported — fail with the
    // real problem instead of a StAX "Content is not allowed in prolog"
    // when someone points the source at a .gz stub dump
    val lower = file.getName.toLowerCase(java.util.Locale.ROOT)
    if (Seq(".gz", ".zst", ".xz", ".7z", ".zip", ".lz4").exists(lower.endsWith))
      throw new IllegalArgumentException(
        s"mediawiki: unsupported compression for $file — only plain XML " +
          "and multistream .bz2 (with optional -index.txt[.bz2]) are " +
          "readable; decompress or re-land as multistream bz2")
    if (file.getName.endsWith(".bz2")) {
      indexCandidates(file).find(fs.exists) match {
        case Some(idx) =>
          val offsets = indexOffsetsFor(fs, idx)
          val registry = registryFor(fs, st)
          val bounds = ((0L +: offsets.toSeq).distinct.sorted :+ len).distinct
          coalesceRanges(bounds, splitSize).map { case (s, e) =>
            MediaWikiRangePartition(file.toString, s, e, compressed = true,
              registry)
          }
        case None =>
          if (len > splitSize) logWarning(
            s"mediawiki: $file is ${len} bytes of bz2 with no multistream " +
              "index — reading as a single split; provide the companion " +
              "-index.txt[.bz2] to parallelize")
          Seq(MediaWikiInputPartition(file.toString))
      }
    } else if (len > splitSize) {
      val registry = registryFor(fs, st)
      // equal byte ranges computed directly — never materializes a
      // bounds list longer than the partition count
      val n = ((len + splitSize - 1) / splitSize).toInt
      (0 until n).map { i =>
        MediaWikiRangePartition(file.toString, i * splitSize,
          math.min((i + 1) * splitSize, len), compressed = false, registry)
      }
    } else Seq(MediaWikiInputPartition(file.toString))
  }
}

class MediaWikiScan(path: String, requiredSchema: StructType,
    nsFilter: Option[Set[Int]], nsNameFilter: Option[Set[String]],
    splitSize: Long)
    extends Scan with Batch {
  private val hconf = MediaWikiDumpTable.sessionHadoopConf()
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"MediaWikiDumpScan columns=[${requiredSchema.fieldNames.mkString(",")}]" +
      nsFilter.fold("")(s => s" ns=[${s.toSeq.sorted.mkString(",")}]") +
      nsNameFilter.fold("")(s => s" ns_name=[${s.toSeq.sorted.mkString(",")}]")

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hconf.value)
    MediaWikiPlanner.listDumpFiles(fs, p)
      .flatMap(MediaWikiPlanner.partitionsForFile(fs, _, splitSize))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MediaWikiReaderFactory(requiredSchema, nsFilter, nsNameFilter, hconf)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MediaWikiMicroBatchStream(path, requiredSchema, nsFilter, nsNameFilter,
      splitSize, hconf)
}

/** Offset = the NAME of the last consumed file plus the count of
  * consumed files. Recording the name (not just a count of the sorted
  * listing) makes contract violations detectable: if a consumed file is
  * deleted the prefix count no longer matches and the stream fails
  * loudly instead of silently re-reading or skipping shifted indices;
  * a late file sorting below the consumed prefix is skipped with a
  * warning rather than silently remapping every offset. */
case class MediaWikiOffset(last: Option[String], count: Int) extends Offset {
  override def json(): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods
      .render(("last" -> last.orNull) ~ ("count" -> count)))
  }
}

/** Micro-batch streaming over a dump DIRECTORY: each new file becomes
  * (part of) the next micro-batch, read by the same StAX partition
  * reader — pruning, ns pushdown, and intra-file splitting included —
  * so `spark.readStream.format("mediawiki").load(dir)` incrementally
  * processes dumps as they land.
  *
  * Contract (documented, not inferred): files are consumed in
  * lexicographic path order and must arrive with monotonically
  * increasing names (dump exports are date-stamped — e.g.
  * `enwiki-20260801-...`, `enwiki-20260901-...`). A late file sorting
  * below the consumed prefix is ignored; a file must be fully written
  * before it becomes visible (write-then-rename, the standard file
  * source convention).
  */
class MediaWikiMicroBatchStream(path: String, requiredSchema: StructType,
    nsFilter: Option[Set[Int]], nsNameFilter: Option[Set[String]],
    splitSize: Long, hconf: SerializableHadoopConf)
    extends MicroBatchStream with Logging {

  private def fs(): FileSystem = new Path(path).getFileSystem(hconf.value)

  private def listing(): Array[FileStatus] = {
    val p = new Path(path)
    val f = fs()
    if (!f.exists(p)) Array.empty
    else MediaWikiPlanner.listDumpFiles(f, p)
  }

  override def initialOffset(): Offset = MediaWikiOffset(None, 0)
  override def latestOffset(): Offset = {
    val files = listing()
    MediaWikiOffset(files.lastOption.map(_.getPath.toString), files.length)
  }
  override def deserializeOffset(json: String): Offset = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val v = org.json4s.jackson.JsonMethods.parse(json)
    (v \ "files") match {
      // legacy count-only offsets: reconstruct the name from the current
      // listing prefix (the pre-name-offset behavior, restart-time only)
      case org.json4s.JInt(n) =>
        val files = listing()
        MediaWikiOffset(files.take(n.toInt).lastOption.map(_.getPath.toString),
          n.toInt)
      case _ =>
        MediaWikiOffset((v \ "last").extractOpt[String],
          (v \ "count").extract[Int])
    }
  }

  /** Files whose path sorts at or below the offset's last consumed name;
    * mismatch against the recorded count is a contract violation. */
  private def checkPrefix(files: Array[FileStatus], off: MediaWikiOffset): Unit =
    off.last.foreach { l =>
      val prefix = files.count(_.getPath.toString <= l)
      if (prefix < off.count) throw new IllegalStateException(
        s"mediawiki stream over $path: ${off.count - prefix} consumed " +
          s"file(s) up to '$l' no longer exist — the source directory is " +
          "append-only by contract; restore the files or reset the checkpoint")
      if (prefix > off.count) logWarning(
        s"mediawiki stream over $path: ${prefix - off.count} late file(s) " +
          s"sort below the consumed offset '$l' and will be SKIPPED — dump " +
          "files must arrive in lexicographically increasing order")
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MediaWikiOffset]
    val e = end.asInstanceOf[MediaWikiOffset]
    val files = listing()
    checkPrefix(files, s)
    checkPrefix(files, e)
    val f = fs()
    files.filter { st =>
      val name = st.getPath.toString
      s.last.forall(name > _) && e.last.forall(name <= _)
    }.flatMap(MediaWikiPlanner.partitionsForFile(f, _, splitSize))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MediaWikiReaderFactory(requiredSchema, nsFilter, nsNameFilter, hconf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class MediaWikiReaderFactory(requiredSchema: StructType,
    nsFilter: Option[Set[Int]], nsNameFilter: Option[Set[String]],
    hconf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case MediaWikiInputPartition(file) =>
        new MediaWikiPartitionReader(file, requiredSchema, nsFilter,
          nsNameFilter, hconf)
      case r: MediaWikiRangePartition =>
        new MediaWikiRangeReader(r, requiredSchema, nsFilter, nsNameFilter,
          hconf)
      case other =>
        throw new IllegalArgumentException(s"unknown partition: $other")
    }
}

/** Shared StAX configuration and row assembly for the two readers. */
private[sources] object MediaWikiXml {
  /** A configured factory for exclusive single-threaded use. The range
    * reader creates one per PARTITION and calls it once per page chunk
    * — a global synchronized factory there would serialize every task
    * thread in the JVM on one monitor in the hot path. */
  def newFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities",
      java.lang.Boolean.FALSE)
    f
  }
  private val factory: XMLInputFactory = newFactory()
  // XMLInputFactory is not thread-safe to configure but is safe to use
  // once configured per the StAX spec; reader creation on the SHARED
  // factory is synchronized for the once-per-file paths (whole-file
  // reader, head parses) where a monitor is noise.
  def newReader(in: InputStream): XMLStreamReader =
    factory.synchronized(factory.createXMLStreamReader(in))

  /** Consume the reader's current element entirely (no text built). */
  def skipElement(xml: XMLStreamReader): Unit = {
    var depth = 1
    while (depth > 0 && xml.hasNext) {
      xml.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ => ()
      }
    }
  }

  /** Value of the current element's attribute `local`, or null. */
  def attr(xml: XMLStreamReader, local: String): String = {
    var i = 0
    while (i < xml.getAttributeCount) {
      if (xml.getAttributeLocalName(i) == local) return xml.getAttributeValue(i)
      i += 1
    }
    null
  }

  /** THE namespace-label rule (reference process-mw-dump.py:41-43):
    * key 0's empty label renders as "Main". One definition shared by
    * the head parser and the whole-file reader. */
  def nsLabel(key: Int, label: String): String =
    if (key == 0) "Main" else label

  def buildRow(requiredSchema: StructType, nsName: Int => Option[String],
      title: String, ns: Integer, text: String,
      upFile: String, upEnc: String, upContents: String): InternalRow = {
    val row = new GenericInternalRow(requiredSchema.length)
    var i = 0
    requiredSchema.fieldNames.foreach { f =>
      val v: Any = f match {
        case "title" => if (title == null) null else UTF8String.fromString(title)
        case "ns" => ns
        case "ns_name" =>
          if (ns == null) null
          else nsName(ns.intValue()).map(UTF8String.fromString).orNull
        case "text" => if (text == null) null else UTF8String.fromString(text)
        case "upload_filename" =>
          if (upFile == null) null else UTF8String.fromString(upFile)
        case "upload_encoding" =>
          if (upEnc == null) null else UTF8String.fromString(upEnc)
        case "upload_contents" =>
          if (upContents == null) null else UTF8String.fromString(upContents)
        case other =>
          throw new IllegalArgumentException(s"unknown column: $other")
      }
      row.update(i, v)
      i += 1
    }
    row
  }
}

/** StAX page reader for one WHOLE file (optionally bz2-compressed). The
  * namespace registry is parsed from the stream head before any page is
  * emitted; page bodies are skipped (not materialized) when the pushed
  * ns filters reject the page or the projection doesn't need them. */
class MediaWikiPartitionReader(file: String, requiredSchema: StructType,
    nsFilter: Option[Set[Int]], nsNameFilter: Option[Set[String]],
    hconf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val needText = requiredSchema.fieldNames.contains("text")
  private val needUpload = requiredSchema.fieldNames
    .exists(_.startsWith("upload_"))

  private val input: InputStream = {
    val p = new Path(file)
    val raw = p.getFileSystem(hconf.value).open(p)
    // Spark never calls close() on a reader whose constructor threw —
    // a corrupt bz2 header must not leak the open file handle
    try {
      if (file.endsWith(".bz2"))
        new BZip2CompressorInputStream(new BufferedInputStream(raw, 64 * 1024), true)
      else raw
    } catch { case t: Throwable => raw.close(); throw t }
  }
  private val xml: XMLStreamReader =
    try MediaWikiXml.newReader(input)
    catch { case t: Throwable => input.close(); throw t }

  private val registry = mutable.Map.empty[Int, String]
  private var registryDone = false
  private var current: InternalRow = _

  // per-page accumulator
  private var title: String = _
  private var ns: Integer = _
  private var text: String = _
  private var upFile: String = _
  private var upEnc: String = _
  private var upContents: String = _

  private def attr(local: String): String = MediaWikiXml.attr(xml, local)
  private def skipElement(): Unit = MediaWikiXml.skipElement(xml)

  private def nsAccepted: Boolean =
    ns != null && nsFilter.forall(_.contains(ns.intValue())) &&
      nsNameFilter.forall(_.contains(registry.get(ns.intValue()).orNull))

  override def next(): Boolean = {
    var inPage = false
    var inRevision = false
    var inUpload = false
    var pageRejected = false
    while (xml.hasNext) {
      xml.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          xml.getLocalName match {
            case "namespace" if !registryDone =>
              val k = attr("key")
              if (k != null) {
                val key = k.toInt
                registry(key) = MediaWikiXml.nsLabel(key, xml.getElementText.trim)
              }
            case "page" =>
              inPage = true; pageRejected = false
              title = null; ns = null; text = null
              upFile = null; upEnc = null; upContents = null
            case "title" if inPage && !pageRejected =>
              title = xml.getElementText
            case "ns" if inPage && !pageRejected =>
              ns = Integer.valueOf(xml.getElementText.trim.toInt)
              // <ns> precedes <revision>/<upload>: rejecting here skips
              // the page body entirely
              if (!nsAccepted) pageRejected = true
            case "revision" if inPage =>
              if (pageRejected) skipElement() else inRevision = true
            case "text" if inRevision =>
              if (needText) text = xml.getElementText else skipElement()
            case "upload" if inPage =>
              if (pageRejected || !needUpload) skipElement() else inUpload = true
            case "filename" if inUpload =>
              upFile = xml.getElementText
            case "contents" if inUpload =>
              upEnc = attr("encoding")
              upContents = xml.getElementText
            case "siteinfo" => () // registry lives here; fall through
            case _ => ()
          }
        case XMLStreamConstants.END_ELEMENT =>
          xml.getLocalName match {
            case "namespaces" => registryDone = true
            case "revision" => inRevision = false
            case "upload" => inUpload = false
            case "page" =>
              inPage = false
              // a page with NO <ns> element never evaluated the pushed
              // filters — re-check here so it can't leak past a filter
              // the source claimed to apply (null fails =/IN, matching
              // Spark's own semantics)
              val passes = pageRejected == false &&
                ((nsFilter.isEmpty && nsNameFilter.isEmpty) || nsAccepted)
              if (passes) {
                current = MediaWikiXml.buildRow(requiredSchema, registry.get,
                  title, ns, text, upFile, upEnc, upContents)
                return true
              }
            case _ => ()
          }
        case _ => ()
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = { xml.close(); input.close() }
}

/** Byte stream that exposes at most `limit` bytes of `in` (for bounding
  * a bz2 stream-range read without closing the underlying file early). */
private[sources] final class LimitedInputStream(in: InputStream, limit: Long)
    extends InputStream {
  private var remaining = limit
  override def read(): Int =
    if (remaining <= 0) -1
    else { val b = in.read(); if (b >= 0) remaining -= 1; b }
  override def read(b: Array[Byte], off: Int, len: Int): Int =
    if (remaining <= 0) -1
    else {
      val n = in.read(b, off, math.min(len.toLong, remaining).toInt)
      if (n > 0) remaining -= n
      n
    }
  override def close(): Unit = in.close()
}

/** Incremental scanner yielding `<page>…</page>` byte chunks and the
  * absolute offset of each chunk's start tag. Sound because MediaWiki
  * dump text content is XML-escaped — a literal `<page>`/`</page>`
  * cannot occur inside a text node (the Mahout XmlInputFormat premise;
  * dumps contain no CDATA or comments). */
private[sources] final class PageChunkScanner(in: InputStream, basePos: Long) {
  private val Start = "<page>".getBytes(UTF_8)
  private val End = "</page>".getBytes(UTF_8)
  private var pos = basePos
  // block-buffered scanning: the match state machine runs over a local
  // byte array, not per-byte InputStream.read() virtual calls (every
  // BufferedInputStream method is synchronized — at ~10^8 bytes per
  // split that monitor dominates the scan this splitter exists to speed
  // up). The match state (m) carries across block boundaries.
  private val buf = new Array[Byte](64 * 1024)
  private var bufLen = 0
  private var bufOff = 0

  /** Refill the window; false at EOF. */
  private def fill(): Boolean = {
    if (bufOff < bufLen) return true
    var n = in.read(buf)
    while (n == 0) n = in.read(buf)
    bufOff = 0
    bufLen = math.max(n, 0)
    n > 0
  }

  /** Offset of the next `<page>` start tag, or -1 at EOF. On return the
    * start tag bytes have been consumed. ('<' occurs only at index 0 of
    * the pattern, so the restart-on-mismatch rule below is exact.) */
  private def findStart(): Long = {
    var m = 0
    while (fill()) {
      var i = bufOff
      while (i < bufLen) {
        val b = buf(i)
        i += 1
        pos += 1
        if (b == Start(m)) {
          m += 1
          if (m == Start.length) { bufOff = i; return pos - Start.length }
        } else m = if (b == '<') 1 else 0
      }
      bufOff = i
    }
    -1L
  }

  /** Read the rest of the current page through `</page>` (inclusive). */
  private def readChunk(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8 * 1024)
    out.write(Start, 0, Start.length)
    var m = 0
    while (fill()) {
      val segStart = bufOff
      var i = bufOff
      while (i < bufLen) {
        val b = buf(i)
        i += 1
        pos += 1
        if (b == End(m)) {
          m += 1
          if (m == End.length) {
            out.write(buf, segStart, i - segStart)
            bufOff = i
            return out.toByteArray
          }
        } else m = if (b == '<') 1 else 0
      }
      out.write(buf, segStart, bufLen - segStart)
      bufOff = i
    }
    throw new EOFException(
      s"unterminated <page> element at offset ${pos} — truncated dump or a " +
        "page straddling a bz2 stream boundary (pages must be wholly " +
        "contained in their stream, as multistream dumps guarantee)")
  }

  /** Next page chunk whose start tag offset is `< maxStart`, else None. */
  def next(maxStart: Long): Option[Array[Byte]] = {
    val off = findStart()
    if (off < 0 || off >= maxStart) None else Some(readChunk())
  }
}

/** Reader for one byte-range split. Plain XML: seek to `start`, scan to
  * the next `<page>` boundary, own pages whose start tag is in
  * `[start, end)`. Compressed: decompress exactly the bz2 streams in
  * `[start, end)` and own every page inside. Each chunk is parsed as a
  * standalone StAX document with the same pruning/pushdown semantics as
  * the whole-file reader. */
class MediaWikiRangeReader(part: MediaWikiRangePartition,
    requiredSchema: StructType, nsFilter: Option[Set[Int]],
    nsNameFilter: Option[Set[String]], hconf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val needText = requiredSchema.fieldNames.contains("text")
  private val needUpload = requiredSchema.fieldNames
    .exists(_.startsWith("upload_"))

  private val raw = {
    val p = new Path(part.file)
    val in = p.getFileSystem(hconf.value).open(p)
    if (part.start > 0) in.seek(part.start)
    in
  }
  // the scanner block-buffers internally, so no BufferedInputStream
  // wrapper on top; the bz2 DECODER still wants a buffered source under
  // it. A corrupt bz2 header throwing here must not leak the handle —
  // Spark never closes a reader whose constructor threw.
  private val (scanner, maxStart) =
    try {
      if (part.compressed) {
        val bounded = new LimitedInputStream(raw, part.end - part.start)
        val bz = new BZip2CompressorInputStream(
          new BufferedInputStream(bounded, 64 * 1024), true)
        (new PageChunkScanner(bz, 0L), Long.MaxValue)
      } else
        (new PageChunkScanner(raw, part.start), part.end)
    } catch { case t: Throwable => raw.close(); throw t }

  // one factory per partition: parseChunk creates a reader per PAGE,
  // and the global factory's monitor would serialize all task threads
  private val xmlFactory = MediaWikiXml.newFactory()

  private var current: InternalRow = _

  private def nsAccepted(ns: Integer): Boolean =
    ns != null && nsFilter.forall(_.contains(ns.intValue())) &&
      nsNameFilter.forall(_.contains(part.registry.get(ns.intValue()).orNull))

  /** Parse one page chunk; null if the pushed filters reject it (the
    * parse stops at `<ns>` for rejected pages — the body, the bulk of
    * the chunk, is never tokenized). */
  private def parseChunk(chunk: Array[Byte]): InternalRow = {
    var title: String = null
    var ns: Integer = null
    var text: String = null
    var upFile: String = null
    var upEnc: String = null
    var upContents: String = null
    val xml = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(chunk))
    try {
      var inRevision = false
      var inUpload = false
      def skipElement(): Unit = MediaWikiXml.skipElement(xml)
      def attr(local: String): String = MediaWikiXml.attr(xml, local)
      while (xml.hasNext) {
        xml.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            xml.getLocalName match {
              case "title" => title = xml.getElementText
              case "ns" =>
                ns = Integer.valueOf(xml.getElementText.trim.toInt)
                if (!nsAccepted(ns) &&
                    (nsFilter.nonEmpty || nsNameFilter.nonEmpty)) return null
              case "revision" => inRevision = true
              case "text" if inRevision =>
                if (needText) text = xml.getElementText else skipElement()
              case "upload" =>
                if (needUpload) inUpload = true else skipElement()
              case "filename" if inUpload => upFile = xml.getElementText
              case "contents" if inUpload =>
                upEnc = attr("encoding")
                upContents = xml.getElementText
              case _ => ()
            }
          case XMLStreamConstants.END_ELEMENT =>
            xml.getLocalName match {
              case "revision" => inRevision = false
              case "upload" => inUpload = false
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally xml.close()
    // a page with NO <ns> element: null fails =/IN, matching Spark
    if ((nsFilter.nonEmpty || nsNameFilter.nonEmpty) && !nsAccepted(ns)) null
    else MediaWikiXml.buildRow(requiredSchema, part.registry.get,
      title, ns, text, upFile, upEnc, upContents)
  }

  override def next(): Boolean = {
    var chunk = scanner.next(maxStart)
    while (chunk.isDefined) {
      val row = parseChunk(chunk.get)
      if (row != null) { current = row; return true }
      chunk = scanner.next(maxStart)
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = raw.close()
}
