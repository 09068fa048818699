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
