package graft.convert

import org.scalatest.funsuite.AnyFunSuite

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
