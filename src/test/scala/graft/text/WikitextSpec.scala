package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class WikitextSpec extends AnyFunSuite {

  // T1 — category tags deleted (greedy within a line)
  test("T1 deletes [[Category:X]] tags") {
    assert(Wikitext.categoryRule("a [[Category:Networking]] b") == "a  b")
    // greedy: spans to the LAST ]] on the line, like Python re.sub
    assert(Wikitext.categoryRule("[[Category:A]] x [[Category:B]]") == "")
    // does not span newlines
    assert(Wikitext.categoryRule("[[Category:A]]\nkeep") == "\nkeep")
  }

  test("T2 strips nowiki tags") {
    assert(Wikitext.nowikiRule("a <nowiki>b</nowiki> c") == "a b c")
  }

  test("T3 deletes TOC marker with optional header") {
    assert(Wikitext.tocRule(Wikitext.tocHeaderRule(
      "== Table of Contents ==\n__TOC__\nrest")) == "\nrest")
    assert(Wikitext.tocRule("x\n__TOC__\ny") == "x\n\ny")
  }

  test("T4 strips File tag options") {
    assert(Wikitext.fileOptionsRule("[[File:a.png|thumb|300px]]") == "[[File:a.png]]")
    assert(Wikitext.fileOptionsRule("[[File:a.png]]") == "[[File:a.png]]")
  }

  test("T6 removes transclusions") {
    assert(Wikitext.transclusionRule("x {{:Other Page}} y") == "x  y")
    assert(Wikitext.transclusionRule("x {{NotATransclusion}} y") ==
      "x {{NotATransclusion}} y")
  }

  // T5 — stateful fence scanner
  test("T5 wraps indented code in pre fences") {
    val in = "para\n  code line\n  more code\nafter\n"
    val out = Wikitext.fenceCodeBlocks(in)
    assert(out == "para\n<pre>\n  code line\n  more code</pre>\n\nafter\n")
  }

  test("T5 force-closes unterminated block at EOF") {
    val in = "para\n  code at end\n"
    assert(Wikitext.fenceCodeBlocks(in) == "para\n<pre>\n  code at end\n</pre>")
  }

  test("T5 rewrites bold/italic inside code") {
    val in = "p\n  x '''bold''' y\nq\n"
    assert(Wikitext.fenceCodeBlocks(in) ==
      "p\n<pre>\n  x `**bold**` y</pre>\n\nq\n")
    val it = "p\n  x ''it'' y\nq\n"
    assert(Wikitext.fenceCodeBlocks(it) ==
      "p\n<pre>\n  x `*it*` y</pre>\n\nq\n")
  }

  test("T5 blank lines stay inside an open block") {
    val in = "p\n  code\n\n  code2\nend\n"
    assert(Wikitext.fenceCodeBlocks(in) ==
      "p\n<pre>\n  code\n\n  code2</pre>\n\nend\n")
  }

  test("T5 bold/italic outside code untouched") {
    val in = "'''bold''' outside\n"
    assert(Wikitext.fenceCodeBlocks(in) == in)
  }

  // T9 — template pack
  test("T9 attention/needswork/needsclarification are case-insensitive") {
    def cp(t: String) = Wikitext.defaultCustomPrepare(t, "T", "Main").get
    assert(cp("{{attention}}x") == "💡 x")
    assert(cp("{{Needswork}}x") == "🚧 x")
    assert(cp("{{needsclarification}}x") == "⚠️  x")
  }

  test("T9 book and source templates") {
    def cp(t: String) = Wikitext.defaultCustomPrepare(t, "T", "Main").get
    assert(cp("{{Book|TCP Illustrated|0201633469}}") ==
      "(source: TCP Illustrated/ISBN 0201633469)")
    assert(cp("{{source|my notes}}") == "(source: my notes)")
  }

  test("T9 RFC with and without title") {
    def cp(t: String) = Wikitext.defaultCustomPrepare(t, "T", "Main").get
    assert(cp("{{RFC|2328|OSPF v2}}") ==
      "[https://tools.ietf.org/html/2328 RFC 2328 OSPF v2]")
    // optional group unmatched → empty substitution (trailing space kept)
    assert(cp("{{RFC|2328}}") == "[https://tools.ietf.org/html/2328 RFC 2328 ]")
  }

  test("T9 sourcelink order sensitivity") {
    def cp(t: String) = Wikitext.defaultCustomPrepare(t, "T", "Main").get
    // well-formed two-field form handled by the first pattern
    assert(cp("{{sourcelink|http://x|label}}") == "(source: [http://x label])")
    // malformed space-separated form caught by the second
    assert(cp("{{sourcelink|http://x lbl|junk}}") == "(source: [http://x lbl])")
  }

  test("T9 href/juniper/mskb/msgid/vmware/cisco links") {
    def cp(t: String) = Wikitext.defaultCustomPrepare(t, "T", "Main").get
    assert(cp("{{href|http://a b c|note}}") == "[http://a b c] (note)")
    assert(cp("{{JuniperKB|123|kb title}}") ==
      "[http://kb.juniper.net/index?page=content&id=KB123 kb title]")
    assert(cp("{{MSKB|555|ms title}}") ==
      "[http://support.microsoft.com/kb/555 ms title]")
    assert(cp("{{Msgid|abc@def|subject}}") == "[http://marc.info/?i=abc@def subject]")
    assert(cp("{{VMwareKB|42}}") == "[http://kb.vmware.com/kb/42 ]")
    assert(cp("{{Ciscobug|CSCxy12345}}") ==
      "[https://bst.cloudapps.cisco.com/bugsearch/bug/CSCxy12345]")
    assert(cp("{{CiscoTACCC|abc123}}") ==
      "[http://www.ciscotaccc.com/lanswitching/showcase?case=abc123]")
  }

  test("T9 only applies to Main namespace") {
    assert(Wikitext.defaultCustomPrepare("{{Attention}}", "T", "Category").isEmpty)
  }

  // T7/T8 — full pipeline + probe
  test("prepare runs ordered chain and keeps unhandled templates") {
    val in = "[[Category:N]]\n== Table of Contents ==\n__TOC__\n" +
      "{{Attention}}note\n  code '''b'''\n\ntext {{Mystery|x}} <nowiki>raw</nowiki>\n"
    val out = Wikitext.prepare(in, "Title", "Main")
    assert(!out.contains("Category"))
    assert(!out.contains("__TOC__"))
    assert(out.contains("💡 note"))
    assert(out.contains("<pre>"))
    assert(out.contains("`**b**`"))
    assert(!out.contains("nowiki"))
    assert(Wikitext.unhandledTemplate(out).contains("{{Mystery|x}}"))
  }

  test("prepare passes empty/null text through") {
    assert(Wikitext.prepare("", "T", "Main") == "")
    assert(Wikitext.prepare(null, "T", "Main") == null)
  }

  // F2/F3/F5 helpers
  test("F2 de-prefixes at the FIRST colon only when ns > 0") {
    assert(Wikitext.deprefixTitle("File:a:b.png", 6) == "a:b.png")
    assert(Wikitext.deprefixTitle("Main page", 0) == "Main page")
    assert(Wikitext.deprefixTitle("NoColon", 6) == "NoColon")
  }

  test("F3 sanitizes filenames like Python isalnum filter") {
    assert(Wikitext.sanitizeFilename("a/b") == "a-b")
    assert(Wikitext.sanitizeFilename("OpenBSD: How? (v2) ") == "OpenBSD How v2")
    assert(Wikitext.sanitizeFilename("héllo wörld.md") == "héllo wörld.md")
    assert(Wikitext.sanitizeFilename("tab\there ") == "tabhere")
  }

  test("F5 redirect predicate") {
    assert(Wikitext.isRedirect("#REDIRECT [[Other]]"))
    assert(!Wikitext.isRedirect(" #REDIRECT"))
  }
}

class WikitextProps extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val plain: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.const('\n')))
      .map(_.mkString)

  test("delete rules are idempotent") {
    check(Prop.forAll(plain) { s =>
      val t1 = Wikitext.categoryRule(s)
      val t2 = Wikitext.transclusionRule(s)
      val t3 = Wikitext.nowikiRule(s)
      Wikitext.categoryRule(t1) == t1 &&
      Wikitext.transclusionRule(t2) == t2 &&
      Wikitext.nowikiRule(t3) == t3
    })
  }

  test("sanitizeFilename output alphabet is closed and idempotent") {
    check(Prop.forAll { (s: String) =>
      val out = Wikitext.sanitizeFilename(s)
      out.forall(c =>
        Character.isLetterOrDigit(c) ||
        Character.getType(c) == Character.LETTER_NUMBER ||
        Character.getType(c) == Character.OTHER_NUMBER ||
        c == ' ' || c == '.' || c == '_' || c == '-') &&
      (out.isEmpty || !out.last.isWhitespace) &&
      Wikitext.sanitizeFilename(out) == out
    })
  }

  test("fenceCodeBlocks preserves non-code lines verbatim") {
    val noIndent: Gen[String] = Gen.listOf(
      Gen.oneOf("plain text\n", "word\n", "'''bold''' here\n")).map(_.mkString)
    check(Prop.forAll(noIndent) { s =>
      Wikitext.fenceCodeBlocks(s) == s
    })
  }

  test("fence open/close tags balance") {
    check(Prop.forAll(plain) { s =>
      val out = Wikitext.fenceCodeBlocks(s)
      "<pre>".r.findAllIn(out).size == "</pre>".r.findAllIn(out).size
    })
  }
}
