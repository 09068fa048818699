package graft

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream

/** Deterministic synthetic MediaWiki dumps at bench scale, so the DSv2
  * source's intra-file splitting is MEASURED, not inferred (round-4
  * verdict item 2). Two artifacts, cached on disk across runs:
  *
  *  - `plain-<mb>.xml` — one large plain-XML dump; exercises the
  *    byte-range + next-`<page>`-boundary split path.
  *  - `multi-<mb>.xml.bz2` + `multi-<mb>-index.txt` — a multistream
  *    bz2 dump (one bz2 stream per page group) with the standard
  *    `offset:pageid:title` companion index; exercises the
  *    index-driven stream-range split path.
  *
  * Content is deterministic in the page id (an LCG scrambles word
  * picks), so re-generation is bit-identical and timings comparable
  * across rounds. Bodies are ~2 KiB of mixed prose + markup — bulky
  * enough that scan cost is text tokenization, like a real dump.
  */
object BenchDump {

  private val words = Array("data", "engine", "spark", "query", "page",
    "wiki", "column", "shuffle", "partition", "broadcast", "stream",
    "vector", "token", "batch", "scan", "plan", "join", "filter",
    "aggregate", "window", "namespace", "category", "template", "article")

  private def body(id: Long): String = {
    val sb = new StringBuilder(2300)
    var x = id * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < 280) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(words(((x >>> 33) % words.length).toInt))
      sb.append(if (i % 13 == 12) ".\n" else " ")
      i += 1
    }
    // a little markup so the XML escaper has work to do, as real
    // wikitext does
    sb.append(s"\n== Section $id ==\n* item one\n* item two\n")
    sb.append(s"[[Category:Bench]] {{cite|id=$id}} a &lt;tag&gt; end.\n")
    sb.toString
  }

  private def pageXml(id: Long): String = {
    val ns = if (id % 10 == 0) 14 else 0
    s"""  <page>
       |    <title>Bench Page $id</title>
       |    <ns>$ns</ns>
       |    <revision><text>${body(id)}</text></revision>
       |  </page>
       |""".stripMargin
  }

  private val head =
    """<mediawiki>
      |  <siteinfo><namespaces>
      |    <namespace key="0"/>
      |    <namespace key="14">Category</namespace>
      |  </namespaces></siteinfo>
      |""".stripMargin

  /** Generate (once) a plain-XML dump of ~`mb` MiB; returns its path. */
  def plainXml(dir: Path, mb: Int): Path = {
    val out = dir.resolve(s"plain-$mb.xml")
    if (Files.exists(out)) return out
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".plain-$mb.xml.tmp")
    val target = mb.toLong * 1024 * 1024
    val w = new OutputStreamWriter(new BufferedOutputStream(
      new FileOutputStream(tmp.toFile), 1 << 20), UTF_8)
    try {
      w.write(head)
      var written = head.length.toLong
      var id = 0L
      while (written < target) {
        val p = pageXml(id)
        w.write(p)
        written += p.length
        id += 1
      }
      w.write("</mediawiki>\n")
    } finally w.close()
    Files.move(tmp, out, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    out
  }

  /** Generate (once) a multistream bz2 dump from ~`mb` MiB of XML plus
    * its `offset:pageid:title` index; returns (dump, index). Streams
    * hold `pagesPerStream` pages each — every stream is independently
    * decompressable, exactly the Wikimedia multistream layout. */
  def multistreamBz2(dir: Path, mb: Int, pagesPerStream: Int = 64): (Path, Path) = {
    val dump = dir.resolve(s"multi-$mb.xml.bz2")
    val index = dir.resolve(s"multi-$mb-index.txt")
    if (Files.exists(dump) && Files.exists(index) &&
      Files.exists(logicalSizeFile(dir, mb))) return (dump, index)
    Files.createDirectories(dir)
    val tmpD = dir.resolve(s".multi-$mb.xml.bz2.tmp")
    val tmpI = dir.resolve(s".multi-$mb-index.txt.tmp")
    val target = mb.toLong * 1024 * 1024
    val raw = new java.io.FileOutputStream(tmpD.toFile)
    val counted = new java.io.BufferedOutputStream(raw, 1 << 20)
    val idx = new OutputStreamWriter(new BufferedOutputStream(
      new FileOutputStream(tmpI.toFile), 1 << 20), UTF_8)
    var offset = 0L // bytes of completed bz2 streams
    def stream(write: BZip2CompressorOutputStream => Long): Unit = {
      val bz = new BZip2CompressorOutputStream(
        new java.io.FilterOutputStream(counted) {
          override def write(b: Int): Unit = { offset += 1; counted.write(b) }
          override def write(b: Array[Byte], off: Int, len: Int): Unit = {
            offset += len; counted.write(b, off, len)
          }
          override def close(): Unit = () // keep the shared stream open
        }, 1)
      write(bz)
      bz.close() // finishes the stream; the shared sink stays open
    }
    try {
      stream { bz => bz.write(head.getBytes(UTF_8)); 0L }
      var id = 0L
      var uncompressed = head.length.toLong
      while (uncompressed < target) {
        val startOffset = offset
        val sb = new StringBuilder(pagesPerStream * 2500)
        val firstId = id
        var i = 0
        while (i < pagesPerStream && uncompressed < target) {
          val p = pageXml(id)
          sb.append(p)
          uncompressed += p.length
          id += 1; i += 1
        }
        stream { bz => bz.write(sb.toString.getBytes(UTF_8)); 0L }
        var j = firstId
        while (j < id) {
          idx.write(s"$startOffset:${j + 1}:Bench Page $j\n")
          j += 1
        }
      }
      stream { bz => bz.write("</mediawiki>\n".getBytes(UTF_8)); 0L }
      uncompressed += "</mediawiki>\n".length
      Files.write(dir.resolve(s".multi-$mb-logical.tmp"),
        uncompressed.toString.getBytes(UTF_8))
    } finally { counted.close(); idx.close() }
    // REPLACE_EXISTING: a cache left by an older code version may hold
    // the dump+index without the logical-size sidecar — the incomplete
    // trio regenerates, and the move must overwrite the stale halves.
    // The sidecar moves LAST: its presence is what marks the trio
    // complete, so a crash mid-sequence always re-triggers regeneration
    Files.move(tmpD, dump, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmpI, index, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.move(dir.resolve(s".multi-$mb-logical.tmp"), logicalSizeFile(dir, mb),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    (dump, index)
  }

  private def logicalSizeFile(dir: Path, mb: Int): Path =
    dir.resolve(s"multi-$mb-logical.txt")

  /** Uncompressed XML bytes inside `multi-<mb>.xml.bz2` — the honest
    * denominator for a compressed container's scan throughput. */
  def multistreamLogicalBytes(dir: Path, mb: Int): Long =
    new String(Files.readAllBytes(logicalSizeFile(dir, mb)), UTF_8).trim.toLong
}
