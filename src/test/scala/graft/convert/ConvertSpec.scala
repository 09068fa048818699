package graft.convert

import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermissions
import org.scalatest.funsuite.AnyFunSuite

class PandocConvertSpec extends AnyFunSuite {
  lazy val spark = graft.scale.SparkTestSession.spark

  /** A stand-in pandoc: answers --version, otherwise upper-cases stdin.
    * Exercises the REAL process plumbing (spawn, threaded stdin feed,
    * stdout/stderr drain, exit handling) without the binary the
    * container lacks. */
  private def fakePandoc(body: String): String = {
    val f = Files.createTempFile("fake-pandoc", ".sh")
    Files.writeString(f,
      s"""#!/bin/sh
         |if [ "$$1" = "--version" ]; then echo fake 1.0; exit 0; fi
         |$body
         |""".stripMargin)
    Files.setPosixFilePermissions(f,
      PosixFilePermissions.fromString("rwxr-xr-x"))
    f.toString
  }

  test("process path pipes each doc through the binary") {
    val bin = fakePandoc("tr '[:lower:]' '[:upper:]'")
    assert(PandocConvert.binaryAvailable(bin))
    assert(PandocConvert.convertDoc("hello '''world'''", bin) ==
      Right("HELLO '''WORLD'''"))
    // large doc: stdin feeding must not deadlock on the pipe buffer
    val big = "x" * (1 << 20)
    assert(PandocConvert.convertDoc(big, bin) == Right(big.toUpperCase))
  }

  test("null input surfaces a stdin-write warning, not a bogus timeout") {
    val bin = fakePandoc("cat")
    val t0 = System.nanoTime()
    val r = PandocConvert.convertDoc(null, bin)
    val tookMs = (System.nanoTime() - t0) / 1000000
    assert(r.isLeft && r.swap.toOption.get.startsWith("pandoc stdin write failed"),
      s"got $r")
    assert(tookMs < 5000, s"write failure burned ${tookMs}ms (timeout path?)")
  }

  test("process failure routes to warning + native fallback") {
    val bad = fakePandoc("echo 'mediawiki parse error' >&2; exit 64")
    val (md, warn) = PandocConvert.convertWithFallback(
      "== T ==", bad, processAvailable = true)
    assert(md == "## T") // native conversion still produced
    assert(warn.startsWith("native: pandoc exit 64"))
    assert(warn.contains("mediawiki parse error"))
  }

  test("absent binary falls back hermetically") {
    val (md, warn) = PandocConvert.convertWithFallback(
      "== T ==", "definitely-not-a-binary", processAvailable = false)
    assert(md == "## T")
    assert(warn == "native: binary unavailable")
  }

  test("DataFrame operator yields (doc_id, markdown, warning) rows") {
    import spark.implicits._
    val bin = fakePandoc("tr '[:lower:]' '[:upper:]'")
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val got = PandocConvert.convert(docs, bin)
      .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "ALPHA", ""), (2L, "BETA", "")))
    // missing binary on the executor: every row converts natively
    val fb = PandocConvert.convert(docs, "definitely-not-a-binary")
      .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
    assert(fb.map(_._2) == Seq("alpha", "beta"))
    assert(fb.forall(_._3 == "native: binary unavailable"))
  }

  test("real pandoc conversion when the binary exists") {
    assume(PandocConvert.available, "pandoc not installed — skipping")
    val Right(md) = PandocConvert.convertDoc("== Title ==\n'''bold'''")
    assert(md.contains("## Title") && md.contains("**bold**"))
  }
}

class WikiToMarkdownSpec extends AnyFunSuite {
  test("headings") {
    assert(WikiToMarkdown.convert("== Title ==") == "## Title")
    assert(WikiToMarkdown.convert("=== Sub ===") == "### Sub")
  }
  test("inline markup") {
    assert(WikiToMarkdown.convert("'''bold''' and ''it''") == "**bold** and *it*")
    assert(WikiToMarkdown.convert("[[Page]]") == "[Page](Page)")
    assert(WikiToMarkdown.convert("[[Page|label]]") == "[label](Page)")
    assert(WikiToMarkdown.convert("[https://x.test doc]") == "[doc](https://x.test)")
    assert(WikiToMarkdown.convert("[https://x.test]") == "<https://x.test>")
    assert(WikiToMarkdown.convert("[[File:img.png]]") == "![img.png](img.png)")
  }
  test("lists incl. nesting and numbering") {
    assert(WikiToMarkdown.convert("* a\n* b\n** c\n# one") ==
      "- a\n- b\n    - c\n1. one")
  }
  test("pre blocks become fenced code") {
    assert(WikiToMarkdown.convert("x\n<pre>\ncode '''kept'''\n</pre>\ny") ==
      "x\n```\ncode '''kept'''\n```\ny")
  }
  test("unterminated pre force-closed; never throws on junk") {
    assert(WikiToMarkdown.convert("<pre>\ncode") == "```\ncode\n```")
    // glued close tag, as the T5 scanner emits after rstrip
    assert(WikiToMarkdown.convert("<pre>\n  code</pre>\nafter") ==
      "```\n  code\n```\nafter")
    assert(WikiToMarkdown.convert("[[unclosed {{junk|") == "[[unclosed {{junk|")
    assert(WikiToMarkdown.convert(null) == null)
  }
  test("full prepared page") {
    val prepared = graft.text.Wikitext.prepare(
      "== Notes ==\n{{Attention}}see [[Other Page]]\n  code line\n\ndone\n",
      "T", "Main")
    val md = WikiToMarkdown.convert(prepared)
    assert(md.contains("## Notes"))
    assert(md.contains("💡 see [Other Page](Other Page)"))
    assert(md.contains("```\n  code line\n```"))
  }
}

class MarkdownBlocksSpec extends AnyFunSuite {
  test("document explodes to ordered typed blocks") {
    val md = "# Title\n\npara one\nstill para one\n\n- item a\n- item b\n\n" +
      "```\ncode 1\ncode 2\n```\n\n![alt](img.png)\n\n1. first\n"
    val blocks = MarkdownBlocks.parse(md)
    assert(blocks == Seq(
      ("heading_1", "Title"),
      ("text", "para one still para one"),
      ("bulleted_list_item", "item a"),
      ("bulleted_list_item", "item b"),
      ("code", "code 1\ncode 2"),
      ("image", "img.png"),
      ("numbered_list_item", "first")))
  }
  test("empty and null") {
    assert(MarkdownBlocks.parse("").isEmpty)
    assert(MarkdownBlocks.parse(null).isEmpty)
  }
  test("F8 artifact predicate") {
    assert(MarkdownBlocks.isPandocCommentArtifact("text", "<!-- -->"))
    assert(!MarkdownBlocks.isPandocCommentArtifact("code", "<!-- -->"))
  }
  test("unterminated code block captured") {
    assert(MarkdownBlocks.parse("```\nabc") == Seq(("code", "abc")))
  }
}

class ExplodeBlocksGeneratorSpec extends AnyFunSuite {
  lazy val spark = graft.scale.SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val md = "# Title\n\npara one\nstill one\n\n- item\n\n```\nc1\n```\n"

  test("generator rows equal MarkdownBlocks.parse with ordinals") {
    val got = Seq((1L, md)).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.ExplodeBlocks.explode_blocks(col("text")))
      .select("doc_id", "pos", "block_type", "title")
      .as[(Long, Int, String, String)].collect().toSeq
    val expected = MarkdownBlocks.parse(md).zipWithIndex.map {
      case ((t, title), i) => (1L, i, t, title)
    }
    assert(got == expected)
    // null markdown yields no rows, not a null row
    val empty = Seq((2L, null: String)).toDF("doc_id", "text")
      .select(graft.functions.ExplodeBlocks.explode_blocks(col("text")))
    assert(empty.count() == 0)
  }

  test("callable from SQL via LATERAL VIEW") {
    graft.GraftFunctions.register(spark)
    Seq((1L, md)).toDF("doc_id", "text").createOrReplaceTempView("eb_docs")
    val got = spark.sql(
      """SELECT doc_id, b.pos, b.block_type, b.title
        |FROM eb_docs LATERAL VIEW explode_blocks(text) b""".stripMargin)
      .as[(Long, Int, String, String)].collect().toSeq
    assert(got.map(r => (r._3, r._4)) == MarkdownBlocks.parse(md))
    assert(got.map(_._2) == got.indices)
  }
}
