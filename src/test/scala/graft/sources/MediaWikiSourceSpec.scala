package graft.sources

import java.nio.file.Files
import java.util.Base64

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaWikiSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.scale.SparkTestSession.spark
  import spark.implicits._

  private val pngBytes = Array[Byte](0x50, 0x4E, 0x47, 0x21, 0x00, 0x7F)
  private val b64 = Base64.getEncoder.encodeToString(pngBytes)

  private val fixtureXml =
    s"""<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
       |  <siteinfo>
       |    <namespaces>
       |      <namespace key="0"/>
       |      <namespace key="6">File</namespace>
       |      <namespace key="14">Category</namespace>
       |      <namespace key="2">User</namespace>
       |    </namespaces>
       |  </siteinfo>
       |  <page>
       |    <title>Main Page</title>
       |    <ns>0</ns>
       |    <revision><text>== Heading ==
       |some wikitext body</text></revision>
       |  </page>
       |  <page>
       |    <title>Category:Networking</title>
       |    <ns>14</ns>
       |    <revision><text>category page</text></revision>
       |  </page>
       |  <page>
       |    <title>User:Someone</title>
       |    <ns>2</ns>
       |    <revision><text>user stuff</text></revision>
       |  </page>
       |  <page>
       |    <title>File:diagram.png</title>
       |    <ns>6</ns>
       |    <revision><text>a diagram</text></revision>
       |    <upload>
       |      <filename>diagram.png</filename>
       |      <contents encoding="base64">$b64</contents>
       |    </upload>
       |  </page>
       |</mediawiki>""".stripMargin

  private lazy val dumpPath: String = {
    val tmp = Files.createTempDirectory("graft-dsv2")
    val xml = tmp.resolve("dump.xml")
    Files.writeString(xml, fixtureXml)
    xml.toString
  }

  test("reads all pages with registry-resolved ns_name (key 0 -> Main)") {
    val df = spark.read.format("mediawiki").load(dumpPath)
    val got = df.select("title", "ns", "ns_name").orderBy("ns")
      .as[(String, Int, String)].collect().toSeq
    assert(got == Seq(
      ("Main Page", 0, "Main"),
      ("User:Someone", 2, "User"),
      ("File:diagram.png", 6, "File"),
      ("Category:Networking", 14, "Category")))
  }

  test("upload contents round-trip through unbase64 byte-exact") {
    val df = spark.read.format("mediawiki").load(dumpPath)
      .filter(col("upload_filename").isNotNull)
      .select(col("upload_filename"), col("upload_encoding"),
        unbase64(col("upload_contents")).as("bytes"))
    val (fn, enc, bytes) = df.as[(String, String, Array[Byte])].head()
    assert(fn == "diagram.png" && enc == "base64")
    assert(bytes.toSeq == pngBytes.toSeq)
  }

  test("ns equality and IN filters push into the scan") {
    val df = spark.read.format("mediawiki").load(dumpPath)
      .filter(col("ns") === 0)
    assert(df.select("title").as[String].collect().toSeq == Seq("Main Page"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ns=[0]"), s"pushed ns filter missing from:\n$plan")

    val in = spark.read.format("mediawiki").load(dumpPath)
      .filter(col("ns_name").isin("Main", "Category"))
    assert(in.select("title").as[String].collect().toSet ==
      Set("Main Page", "Category:Networking"))
    assert(in.queryExecution.executedPlan.toString
      .contains("ns_name=[Category,Main]"))
  }

  test("column pruning reaches the scan (text never materialized)") {
    val df = spark.read.format("mediawiki").load(dumpPath).select("title")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("columns=[title]"), s"pruning missing from:\n$plan")
    assert(df.as[String].collect().length == 4)
  }

  test("directory path reads every file, one partition per file") {
    val dir = Files.createTempDirectory("graft-dsv2-dir")
    Files.writeString(dir.resolve("a.xml"), fixtureXml)
    Files.writeString(dir.resolve("b.xml"), fixtureXml)
    val df = spark.read.format("mediawiki").load(dir.toString)
    assert(df.count() == 8)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("pages with missing fields survive as nulls, not exceptions") {
    val xml =
      """<mediawiki>
        |  <siteinfo><namespaces>
        |    <namespace key="0"/>
        |  </namespaces></siteinfo>
        |  <page>
        |    <title>No Revision</title>
        |    <ns>0</ns>
        |  </page>
        |  <page>
        |    <title>Unknown Namespace</title>
        |    <ns>99</ns>
        |    <revision><text>body</text></revision>
        |  </page>
        |</mediawiki>""".stripMargin
    val tmp = Files.createTempDirectory("graft-dsv2-edge")
    val p = tmp.resolve("edge.xml")
    Files.writeString(p, xml)
    val rows = spark.read.format("mediawiki").load(p.toString)
      .select("title", "ns", "ns_name", "text")
      .orderBy("title")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "No Revision" && rows(0).isNullAt(3))
    // ns 99 has no registry entry -> ns_name null, text still parsed
    assert(rows(1).isNullAt(2) && rows(1).getString(3) == "body")
  }

  test("a page missing <ns> cannot leak past a pushed ns filter") {
    val xml =
      """<mediawiki>
        |  <siteinfo><namespaces><namespace key="0"/></namespaces></siteinfo>
        |  <page><title>Has Ns</title><ns>0</ns>
        |    <revision><text>x</text></revision></page>
        |  <page><title>No Ns</title>
        |    <revision><text>y</text></revision></page>
        |</mediawiki>""".stripMargin
    val tmp = Files.createTempDirectory("graft-dsv2-nons")
    val p = tmp.resolve("nons.xml")
    Files.writeString(p, xml)
    // null ns fails = / IN exactly as Spark's own filter would decide
    val got = spark.read.format("mediawiki").load(p.toString)
      .filter(col("ns") === 0).select("title").as[String].collect().toSeq
    assert(got == Seq("Has Ns"))
    // without a filter the page still comes through (ns null)
    assert(spark.read.format("mediawiki").load(p.toString).count() == 2)
  }

  test("streams new dump files as micro-batches with pushdown intact") {
    val dir = Files.createTempDirectory("graft-dsv2-stream")
    Files.writeString(dir.resolve("dump-001.xml"), fixtureXml)
    val q = spark.readStream.format("mediawiki").load(dir.toString)
      .filter(col("ns_name").isin("Main", "Category"))
      .select("title", "ns_name")
      .writeStream.format("memory").queryName("mw_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dsv2-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("mw_stream").count() == 2) // Main + Category pages
      Files.writeString(dir.resolve("dump-002.xml"), fixtureXml)
      q.processAllAvailable()
      assert(spark.table("mw_stream").count() == 4)
      assert(spark.table("mw_stream").select("ns_name").distinct()
        .as[String].collect().toSet == Set("Main", "Category"))
    } finally q.stop()
  }

  test("deleting a consumed file fails the stream loudly, not silently") {
    val dir = Files.createTempDirectory("graft-dsv2-del")
    val f1 = dir.resolve("dump-001.xml")
    Files.writeString(f1, fixtureXml)
    val q = spark.readStream.format("mediawiki").load(dir.toString)
      .writeStream.format("memory").queryName("mw_del")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dsv2-del-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("mw_del").count() == 4)
      // violate the append-only contract: remove a consumed file
      Files.delete(f1)
      Files.writeString(dir.resolve("dump-002.xml"), fixtureXml)
      val ex = intercept[Exception] { q.processAllAvailable() }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(_.getMessage != null) &&
        causes(ex).exists(c => c.getMessage != null &&
          c.getMessage.contains("no longer exist")),
        s"expected loud deletion error, got: $ex")
    } finally q.stop()
  }

  test("a late file sorting below the consumed offset is skipped, stream lives") {
    val dir = Files.createTempDirectory("graft-dsv2-late")
    Files.writeString(dir.resolve("dump-002.xml"), fixtureXml)
    val q = spark.readStream.format("mediawiki").load(dir.toString)
      .writeStream.format("memory").queryName("mw_late")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dsv2-late-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("mw_late").count() == 4)
      // dump-001 arrives AFTER dump-002 was consumed: contract violation,
      // warned and skipped (not silently remapped into other offsets)
      Files.writeString(dir.resolve("dump-001.xml"), fixtureXml)
      Files.writeString(dir.resolve("dump-003.xml"), fixtureXml)
      q.processAllAvailable()
      assert(spark.table("mw_late").count() == 8)
      assert(q.exception.isEmpty)
    } finally q.stop()
  }

  // ---- intra-file splitting ------------------------------------------

  private def manyPagesXml(n: Int): String = {
    val pages = (1 to n).map { i =>
      s"""  <page>
         |    <title>Page $i</title>
         |    <ns>${if (i % 2 == 0) 0 else 14}</ns>
         |    <revision><text>body of page $i with enough padding text that
         |byte ranges cut through page bodies, not just between tags</text></revision>
         |  </page>""".stripMargin
    }.mkString("\n")
    s"""<mediawiki>
       |  <siteinfo><namespaces>
       |    <namespace key="0"/>
       |    <namespace key="14">Category</namespace>
       |  </namespaces></siteinfo>
       |$pages
       |</mediawiki>""".stripMargin
  }

  test("large plain-XML file splits into byte ranges with identical rows") {
    val tmp = Files.createTempDirectory("graft-dsv2-split")
    val p = tmp.resolve("big.xml")
    Files.writeString(p, manyPagesXml(40))
    val whole = spark.read.format("mediawiki").load(p.toString)
    assert(whole.rdd.getNumPartitions == 1)
    val split = spark.read.format("mediawiki")
      .option("splitSize", "512").load(p.toString)
    assert(split.rdd.getNumPartitions > 4,
      s"expected many byte-range splits, got ${split.rdd.getNumPartitions}")
    val a = whole.select("title", "ns", "ns_name", "text")
      .as[(String, Int, String, String)].collect().sortBy(_._1)
    val b = split.select("title", "ns", "ns_name", "text")
      .as[(String, Int, String, String)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(b.count(_._3 == "Main") == 20)
    // pushdown semantics survive splitting (ns precedes the body)
    assert(split.filter(col("ns") === 14).count() == 20)
    assert(split.filter(col("ns_name") === "Main").count() == 20)
  }

  private def bz2Bytes(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val bz = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(bos)
    bz.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    bz.close()
    bos.toByteArray
  }

  /** header + two page streams + footer, one bz2 stream each, plus the
    * companion offset:pageid:title index. */
  private def writeMultistream(dir: java.nio.file.Path, withIndex: Boolean,
      compressIndex: Boolean = false): (String, Int) = {
    def page(i: Int) =
      s"  <page>\n    <title>Page $i</title>\n    <ns>${if (i % 2 == 0) 0 else 14}</ns>\n" +
        s"    <revision><text>multistream body $i</text></revision>\n  </page>\n"
    val header = bz2Bytes(
      "<mediawiki>\n  <siteinfo><namespaces>\n    <namespace key=\"0\"/>\n" +
        "    <namespace key=\"14\">Category</namespace>\n  </namespaces></siteinfo>\n")
    val s1 = bz2Bytes((1 to 3).map(page).mkString)
    val s2 = bz2Bytes((4 to 6).map(page).mkString)
    val footer = bz2Bytes("</mediawiki>\n")
    val dump = dir.resolve("wiki-multistream.xml.bz2")
    Files.write(dump, header ++ s1 ++ s2 ++ footer)
    if (withIndex) {
      val off1 = header.length.toLong
      val off2 = off1 + s1.length
      val lines = ((1 to 3).map(i => s"$off1:$i:Page $i") ++
        (4 to 6).map(i => s"$off2:$i:Page $i")).mkString("\n") + "\n"
      if (compressIndex)
        Files.write(dir.resolve("wiki-multistream-index.txt.bz2"),
          bz2Bytes(lines))
      else
        Files.writeString(dir.resolve("wiki-multistream-index.txt"), lines)
    }
    (dump.toString, 6)
  }

  test("multistream bz2 + index: one partition per stream range, rows intact") {
    val dir = Files.createTempDirectory("graft-dsv2-ms")
    val (dump, n) = writeMultistream(dir, withIndex = true,
      compressIndex = true)
    val df = spark.read.format("mediawiki").option("splitSize", "1").load(dump)
    // ranges: [0, s1), [s1, s2), [s2, eof) — header range holds no pages
    assert(df.rdd.getNumPartitions == 3)
    val rows = df.select("title", "ns", "ns_name")
      .as[(String, Int, String)].collect().sortBy(_._1)
    assert(rows.length == n)
    assert(rows.map(_._1).toSeq == (1 to 6).map(i => s"Page $i"))
    assert(rows.forall(r => r._3 == (if (r._2 == 0) "Main" else "Category")))
    // pushdown still applies inside stream ranges
    assert(df.filter(col("ns") === 0).count() == 3)
  }

  test("multistream bz2 without index falls back to one decompressing split") {
    val dir = Files.createTempDirectory("graft-dsv2-ms-noidx")
    val (dump, n) = writeMultistream(dir, withIndex = false)
    val df = spark.read.format("mediawiki").load(dump)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == n)
    assert(df.filter(col("ns_name") === "Main").count() == 3)
  }

  test("directory listing skips hidden, _metadata, and index files") {
    val dir = Files.createTempDirectory("graft-dsv2-hygiene")
    Files.writeString(dir.resolve("a.xml"), fixtureXml)
    Files.writeString(dir.resolve("_SUCCESS"), "")
    Files.writeString(dir.resolve(".a.xml.crc"), "not xml at all")
    writeMultistream(dir, withIndex = true)
    val df = spark.read.format("mediawiki").load(dir.toString)
    // 4 pages from a.xml + 6 from the multistream dump; the index and
    // metadata files are never opened as dumps
    assert(df.count() == 10)
  }

  test("planner memoizes registry head-parses and index reads per file") {
    val dir = Files.createTempDirectory("graft-dsv2-memo")
    val big = dir.resolve("big.xml")
    Files.writeString(big, manyPagesXml(40))
    writeMultistream(dir, withIndex = true)
    def plan(): Unit =
      assert(spark.read.format("mediawiki").option("splitSize", "512")
        .load(dir.toString).count() == 46)
    plan() // cold: one head parse per split file + one index read
    val afterCold = MediaWikiPlanner.headParses.get()
    plan(); plan() // warm: planning must not re-open any file head
    assert(MediaWikiPlanner.headParses.get() == afterCold,
      "replanning an unchanged directory re-parsed file heads")
    // a genuinely replaced file (new length) is re-parsed
    Files.writeString(big, manyPagesXml(41))
    assert(spark.read.format("mediawiki").option("splitSize", "512")
      .load(dir.toString).count() == 47)
    assert(MediaWikiPlanner.headParses.get() > afterCold)
  }

  test("checkpoint restart resumes the stream exactly-once by file name") {
    val dir = Files.createTempDirectory("graft-dsv2-restart")
    val ckpt = Files.createTempDirectory("graft-dsv2-restart-ckpt").toString
    val out = Files.createTempDirectory("graft-dsv2-restart-out").toString
    Files.writeString(dir.resolve("dump-001.xml"), fixtureXml)
    // parquet file sink: recoverable, and appends duplicates verbatim —
    // so any replayed page would be VISIBLE as an extra row
    def start() = spark.readStream.format("mediawiki")
      .load(dir.toString)
      .select("title", "ns")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 4)
    } finally q1.stop()
    // file lands while the query is DOWN; restart from the checkpoint
    Files.writeString(dir.resolve("dump-002.xml"), fixtureXml)
    val q2 = start()
    try {
      q2.processAllAvailable()
      // exactly 8: dump-001 was not re-read (its rows would duplicate),
      // dump-002 was not skipped
      assert(spark.read.parquet(out).count() == 8)
      Files.writeString(dir.resolve("dump-003.xml"), fixtureXml)
      q2.processAllAvailable()
      assert(spark.read.parquet(out).count() == 12)
    } finally q2.stop()
  }

  test("legacy count-only offsets upgrade to name-based on deserialize") {
    val dir = Files.createTempDirectory("graft-dsv2-legacy")
    Files.writeString(dir.resolve("dump-001.xml"), fixtureXml)
    Files.writeString(dir.resolve("dump-002.xml"), fixtureXml)
    val stream = new MediaWikiMicroBatchStream(dir.toString,
      MediaWikiDumpTable.fullSchema, None, None,
      MediaWikiDumpTable.DefaultSplitSize,
      MediaWikiDumpTable.sessionHadoopConf())
    // pre-name checkpoints recorded {"files": N}: the upgrade pins the
    // Nth file's NAME from the current listing so later contract checks
    // (deletion, late files) have a name to verify against
    val up = stream.deserializeOffset("""{"files": 1}""")
      .asInstanceOf[MediaWikiOffset]
    assert(up.count == 1 && up.last.exists(_.endsWith("dump-001.xml")))
    val full = stream.deserializeOffset("""{"files": 2}""")
      .asInstanceOf[MediaWikiOffset]
    assert(full.count == 2 && full.last.exists(_.endsWith("dump-002.xml")))
    // planning from the upgraded offset reads only the unconsumed suffix
    val parts = stream.planInputPartitions(up, stream.latestOffset())
    assert(parts.length == 1)
    assert(parts.head.asInstanceOf[MediaWikiInputPartition]
      .file.endsWith("dump-002.xml"))
  }

  test("non-positive splitSize and unsupported compression fail loudly") {
    val tmp = Files.createTempDirectory("graft-dsv2-guard")
    val p = tmp.resolve("small.xml")
    Files.writeString(p, manyPagesXml(2))
    def chain(t: Throwable) =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    // splitSize=-5 previously planned ZERO partitions silently
    val ex = intercept[Exception] {
      spark.read.format("mediawiki").option("splitSize", "-5")
        .load(p.toString).count()
    }
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.contains("positive"))), s"got $ex")
    // a .gz dump names the real problem instead of a StAX prolog error
    val gz = tmp.resolve("dump.xml.gz")
    Files.write(gz, Array[Byte](0x1f, 0x8b.toByte, 8, 0))
    val ex2 = intercept[Exception] {
      spark.read.format("mediawiki").load(gz.toString).count()
    }
    assert(chain(ex2).exists(t =>
      Option(t.getMessage).exists(_.contains("unsupported compression"))),
      s"got $ex2")
  }

  test("malformed index lines are skipped, not fatal; splits still planned") {
    val tmp = Files.createTempDirectory("graft-dsv2-idx")
    val fs = new org.apache.hadoop.fs.Path(tmp.toString)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val idx = tmp.resolve("x-index.txt")
    Files.writeString(idx,
      "﻿0:1:First\n\n:::\ngarbage line\n100:2:Second\nnotanum:3:T\n")
    val offsets = MediaWikiPlanner.readIndexOffsets(fs,
      new org.apache.hadoop.fs.Path(idx.toString))
    assert(offsets.toSeq == Seq(100L),
      s"only the well-formed offset should survive, got ${offsets.toSeq}")
  }

  test("matches the built-in xml reader + broadcast registry join") {
    val viaDsv2 = spark.read.format("mediawiki").load(dumpPath)
      .select("title", "ns", "ns_name", "text")
    val pages = graft.pipeline.Phase1.readPages(spark, dumpPath)
    val nsReg = graft.pipeline.Phase1.readNamespaces(spark, dumpPath)
    val viaBuiltin = pages.join(broadcast(nsReg),
        pages("ns") === nsReg("nsKey"))
      .select(col("title"), col("ns"), col("nsName").as("ns_name"),
        col("revision.text").as("text"))
    assert(viaDsv2.exceptAll(viaBuiltin).isEmpty &&
      viaBuiltin.exceptAll(viaDsv2).isEmpty)
  }
}
