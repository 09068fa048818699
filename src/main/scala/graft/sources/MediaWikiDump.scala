package graft.sources

import java.util.{Map => JMap, Set => JSet}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
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
  *  - **Streaming parse.** Each file is read with StAX — constant
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
  *  - **Partitioning.** One input split per file. Production dumps ship
  *    as multistream bz2 with a stream index; at 100 TB the index file
  *    becomes the split list (one `InputPartition` per bz2 stream) and
  *    this reader's per-partition logic is unchanged. Single-file
  *    plain-XML reads are inherently one split — the same limit the
  *    built-in `xml` reader has without a splittable codec.
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
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MediaWikiScanBuilder(path)
}

class MediaWikiScanBuilder(path: String) extends ScanBuilder
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
    new MediaWikiScan(path, requiredSchema, nsFilter, nsNameFilter)
}

case class MediaWikiInputPartition(file: String) extends InputPartition

class MediaWikiScan(path: String, requiredSchema: StructType,
    nsFilter: Option[Set[Int]], nsNameFilter: Option[Set[String]])
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
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.toString).sorted
      else Array(path)
    files.map(MediaWikiInputPartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MediaWikiReaderFactory(requiredSchema, nsFilter, nsNameFilter, hconf)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MediaWikiMicroBatchStream(path, requiredSchema, nsFilter, nsNameFilter,
      hconf)
}

/** Offset = how many files of the lexicographically-sorted directory
  * listing have been consumed. */
case class MediaWikiOffset(n: Int) extends Offset {
  override def json(): String = s"""{"files":$n}"""
}

/** Micro-batch streaming over a dump DIRECTORY: each new file becomes
  * (part of) the next micro-batch, read by the same StAX partition
  * reader — pruning and ns pushdown included — so
  * `spark.readStream.format("mediawiki").load(dir)` incrementally
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
    hconf: SerializableHadoopConf)
    extends MicroBatchStream {

  private def listing(): Array[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hconf.value)
    if (!fs.exists(p)) Array.empty
    else if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(_.isFile).map(_.getPath.toString).sorted
    else Array(path)
  }

  override def initialOffset(): Offset = MediaWikiOffset(0)
  override def latestOffset(): Offset = MediaWikiOffset(listing().length)
  override def deserializeOffset(json: String): Offset =
    MediaWikiOffset("""\d+""".r.findFirstIn(json).map(_.toInt).getOrElse(0))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MediaWikiOffset].n
    val e = end.asInstanceOf[MediaWikiOffset].n
    listing().slice(s, e).map(MediaWikiInputPartition(_): InputPartition)
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
    new MediaWikiPartitionReader(
      partition.asInstanceOf[MediaWikiInputPartition].file,
      requiredSchema, nsFilter, nsNameFilter, hconf)
}

/** StAX page reader for one file. The namespace registry is parsed from
  * the stream head before any page is emitted; page bodies are skipped
  * (not materialized) when the pushed ns filters reject the page or the
  * projection doesn't need them. */
class MediaWikiPartitionReader(file: String, requiredSchema: StructType,
    nsFilter: Option[Set[Int]], nsNameFilter: Option[Set[String]],
    hconf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val needText = requiredSchema.fieldNames.contains("text")
  private val needUpload = requiredSchema.fieldNames
    .exists(_.startsWith("upload_"))

  private val input = {
    val p = new Path(file)
    p.getFileSystem(hconf.value).open(p)
  }
  private val xml: XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities",
      java.lang.Boolean.FALSE)
    f.createXMLStreamReader(input)
  }

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

  private def attr(local: String): String = {
    var i = 0
    while (i < xml.getAttributeCount) {
      if (xml.getAttributeLocalName(i) == local) return xml.getAttributeValue(i)
      i += 1
    }
    null
  }

  /** Consume the current element entirely without building its text. */
  private def skipElement(): Unit = {
    var depth = 1
    while (depth > 0 && xml.hasNext) {
      xml.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ => ()
      }
    }
  }

  private def nsAccepted: Boolean =
    ns != null && nsFilter.forall(_.contains(ns.intValue())) &&
      nsNameFilter.forall(_.contains(nsName(ns.intValue()).orNull))

  private def nsName(k: Int): Option[String] = registry.get(k)

  private def emit(): InternalRow = {
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
                val label = xml.getElementText.trim
                registry(key) =
                  if (key == 0) "Main" else label
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
              if (passes) { current = emit(); return true }
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
