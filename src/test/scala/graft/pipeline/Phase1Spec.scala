package graft.pipeline

import java.nio.file.Files
import java.util.Base64
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.SparkTestSession

class Phase1Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val pngBytes = Array[Byte](0x50, 0x4E, 0x47, 1, 2, 3)
  private def fixtureXml: String = {
    val b64 = Base64.getEncoder.encodeToString(pngBytes)
    s"""<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
       |  <siteinfo><namespaces>
       |    <namespace key="0"/>
       |    <namespace key="6">File</namespace>
       |    <namespace key="14">Category</namespace>
       |    <namespace key="2">User</namespace>
       |  </namespaces></siteinfo>
       |  <page>
       |    <title>OpenBSD Upgrade Procedure</title>
       |    <ns>0</ns>
       |    <revision><text>== Steps ==
       |{{Attention}}read first [[Category:OS]]
       |  sysupgrade -n
       |done</text></revision>
       |  </page>
       |  <page>
       |    <title>Category:Networking</title>
       |    <ns>14</ns>
       |    <revision><text>Pages about networks.</text></revision>
       |  </page>
       |  <page>
       |    <title>Old Page</title>
       |    <ns>0</ns>
       |    <revision><text>#REDIRECT [[New Page]]</text></revision>
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
  }

  test("end-to-end: XML dump -> markdown tree + binaries + warnings") {
    val tmp = Files.createTempDirectory("graft-phase1")
    val xml = tmp.resolve("dump.xml")
    Files.writeString(xml, fixtureXml)
    val out = tmp.resolve("out").toString

    val (nPages, nFiles, nWarnings) = Phase1.run(spark, xml.toString, out)
    // Main page + Category page written; redirect skipped; File page is
    // the binary flow; User page warned
    assert(nPages == 2)
    assert(nFiles == 1)
    assert(nWarnings == 1)

    val mainMd = Files.readString(
      java.nio.file.Paths.get(out, "Main", "OpenBSD Upgrade Procedure.md"))
    assert(mainMd.contains("## Steps"))
    assert(mainMd.contains("💡 read first"))   // T9 template
    assert(!mainMd.contains("[[Category"))     // T1
    assert(mainMd.contains("```\n  sysupgrade -n\n```")) // T5 + fenced code

    // F2: Category: prefix stripped from the filename
    assert(Files.exists(java.nio.file.Paths.get(out, "Category", "Networking.md")))

    // K2: binary decoded byte-exact
    val bin = Files.readAllBytes(
      java.nio.file.Paths.get(out, "File", "diagram.png"))
    assert(bin.toSeq == pngBytes.toSeq)

    // redirect page not written anywhere
    assert(!Files.exists(java.nio.file.Paths.get(out, "Main", "Old Page.md")))
  }

  test("namespace registry renames key 0 to Main") {
    val tmp = Files.createTempDirectory("graft-ns")
    val xml = tmp.resolve("dump.xml")
    Files.writeString(xml, fixtureXml)
    val ns = Phase1.readNamespaces(spark, xml.toString)
      .as[(Int, String)].collect().toMap
    assert(ns(0) == "Main" && ns(6) == "File" && ns(14) == "Category" &&
      ns(2) == "User")
  }
}
