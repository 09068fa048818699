package graft.text

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Pure-Scala wikitext preparation engine.
  *
  * Re-implements the reference's ordered rewrite pipeline
  * (`WikitextParser.prepare`, /root/reference/process-mw-dump.py:193-254)
  * and its default template pack (`custom_prepare`,
  * process-mw-dump.py:295-386) as pure `String => String` functions so
  * they are unit-testable and usable both from `Dataset.map` and from a
  * registered UDF. Simple single-regex rules also have Column-level
  * twins in [[graft.text.WikitextColumns]] that stay inside whole-stage
  * codegen.
  *
  * Fidelity notes (vs CPython `re`):
  *  - Patterns avoid `\w`/`\s` Unicode drift by compiling with
  *    UNICODE_CHARACTER_CLASS where the reference relies on Python's
  *    Unicode-default classes; the fence scanner keeps ASCII classes to
  *    match its explicit `re.ASCII` (process-mw-dump.py:216-217).
  *  - Unmatched optional groups substitute "" in both engines.
  */
object Wikitext {

  /** One rewrite rule: compiled pattern + replacement, applied globally. */
  final case class Rule(name: String, pattern: Pattern, replacement: String) {
    def apply(text: String): String = pattern.matcher(text).replaceAll(replacement)
  }

  private def rule(name: String, regex: String, repl: String, flags: Int = 0) =
    Rule(name, Pattern.compile(regex, flags), repl)

  private val CI = Pattern.CASE_INSENSITIVE
  private val U = Pattern.UNICODE_CHARACTER_CLASS

  // T1 delete [[Category:FOO]] tags (process-mw-dump.py:198-199)
  val categoryRule: Rule = rule("category", """\[\[Category:.+\]\]""", "")
  // T2 delete <nowiki> tags (:201-202)
  val nowikiRule: Rule = rule("nowiki", """</?nowiki>""", "")
  // T3 delete __TOC__ marker, optionally header-prefixed (:204-207)
  val tocHeaderRule: Rule = rule("tocHeader", "=+ Table of Contents =+\n__TOC__", "")
  val tocRule: Rule = rule("toc", "__TOC__", "")
  // T4 strip [[File:x|opts]] options (:209-211)
  val fileOptionsRule: Rule =
    rule("fileOptions", """\[\[File:([^\|]+)\|.+\]\]""", "[[File:$1]]")
  // T6 remove transclusions (:243-244)
  val transclusionRule: Rule = rule("transclusion", """\{\{:.+\}\}""", "")

  // T8 unhandled-template probe (:251-254)
  private val templateProbe = Pattern.compile("""\{\{.+?\}\}""")

  /** First remaining `{{...}}` template, if any (drives the warning side
    * output; process-mw-dump.py:251-254). */
  def unhandledTemplate(text: String): Option[String] = {
    val m = templateProbe.matcher(text)
    if (m.find()) Some(m.group()) else None
  }

  // -- T5: stateful code-fence scanner (process-mw-dump.py:213-241) -------

  private val codeOpen = Pattern.compile("""^\s+\S+""")  // re.ASCII ≙ Java default
  private val codeEnd = Pattern.compile("""^\S""")
  private val boldInCode = Pattern.compile("""'''(.+)'''""")
  private val italicInCode = Pattern.compile("""''(.+)''""")

  /** Split preserving line endings, like Python `splitlines(keepends=True)`
    * for the endings that occur in practice (\n, \r\n, \r). */
  private[text] def splitLinesKeepEnds(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\n') { out += text.substring(start, i + 1); start = i + 1; i += 1 }
      else if (c == '\r') {
        val end = if (i + 1 < n && text.charAt(i + 1) == '\n') i + 2 else i + 1
        out += text.substring(start, end); start = end; i = end
      } else i += 1
    }
    if (start < n) out += text.substring(start)
    out.result()
  }

  /** Wrap indentation-style code blocks in &lt;pre&gt; fences, rewriting
    * bold/italic wiki markup inside the block to backticked Markdown.
    * A line of `^\s+\S+` opens a block; the next `^\S` line closes it
    * (with the preceding line right-trimmed and a blank line inserted);
    * an unterminated block is force-closed at EOF. */
  def fenceCodeBlocks(text: String): String = {
    val out = ArrayBuffer.empty[String]
    var inCode = false
    splitLinesKeepEnds(text).foreach { line0 =>
      var line = line0
      if (codeOpen.matcher(line).lookingAt() && !inCode) {
        out += "<pre>\n"
        inCode = true
      } else if (codeEnd.matcher(line).lookingAt() && inCode) {
        if (out.nonEmpty)
          out(out.length - 1) = out.last.reverse.dropWhile(_.isWhitespace).reverse
        out += "</pre>\n\n"
        inCode = false
      }
      if (inCode) {
        line = boldInCode.matcher(line).replaceAll("`**$1**`")
        line = italicInCode.matcher(line).replaceAll("`*$1*`")
      }
      out += line
    }
    if (inCode) out += "</pre>"
    out.mkString
  }

  // -- T9: default template pack (process-mw-dump.py:295-386) -------------

  /** Ordered, order-sensitive rules of the reference's `custom_prepare`.
    * Driven from a table so users can extend/replace the pack (§2.10). */
  val templatePack: Seq[Rule] = Seq(
    rule("anchor", """\{\{anchor\|.+\}\}""", ""),
    rule("attention", """\{\{Attention\}\}""", "💡 ", CI),
    rule("book", """\{\{Book\|(.+)\|(\d+)\}\}""", "(source: $1/ISBN $2)", CI | U),
    rule("ciscobug", """\{\{Ciscobug\|(.+)\}\}""",
      "[https://bst.cloudapps.cisco.com/bugsearch/bug/$1]"),
    rule("ciscocase", """\{\{CiscoCase\|(\d+)\}\}""",
      "[http://tools.cisco.com/ServiceRequestTool/query/QueryCaseSearchAction.do" +
        "?method=doQueryByCase&caseType=ciscoServiceRequest&SRNumber=$1 $1]", U),
    rule("ciscotaccc", """\{\{CiscoTACCC\|(\w+)\}\}""",
      "[http://www.ciscotaccc.com/lanswitching/showcase?case=$1]", U),
    rule("href", """\{\{href\|(\S+)\s+([^\|]+)\|(.+)\}\}""", "[$1 $2] ($3)", U),
    rule("juniperkb", """\{\{JuniperKB\|(\d+)\|(.+)\}\}""",
      "[http://kb.juniper.net/index?page=content&id=KB$1 $2]", U),
    rule("leftoffat", """\{\{leftoffat\|(.+)\}\}""",
      "<aside>💡 You left off at: $1</aside>"),
    rule("msgid", """\{\{Msgid\|(\S+)\|(.+)\}\}""",
      "[http://marc.info/?i=$1 $2]", CI | U),
    rule("mskb", """\{\{MSKB\|(\d+)\|(.+)\}\}""",
      "[http://support.microsoft.com/kb/$1 $2]", U),
    rule("needsclarification", """\{\{Needsclarification\}\}""", "⚠️  ", CI),
    rule("needswork", """\{\{Needswork\}\}""", "🚧 ", CI),
    rule("rfc", """\{\{RFC\|([-\w\d]+)(?:\|(.+))?\}\}""",
      "[https://tools.ietf.org/html/$1 RFC $1 $2]", U),
    rule("source", """\{\{source\|(.+?)\}\}""", "(source: $1)", CI),
    // Order-sensitive pair (process-mw-dump.py:373-379): the strict
    // two-field form must run before the malformed three-field form.
    rule("sourcelink1", """\{\{sourcelink\|(\S+)\|(.+?)\}\}""", "(source: [$1 $2])", U),
    rule("sourcelink2", """\{\{sourcelink\|(\S+)\s(.+?)\|.+?\}\}""",
      "(source: [$1 $2])", U),
    rule("vmwarekb", """\{\{VMwareKB\|(\d+)(?:\|(.+))?\}\}""",
      "[http://kb.vmware.com/kb/$1 $2]", U),
  )

  /** The reference's default `custom_prepare` hook: template pack applied
    * to Main-namespace pages only, other namespaces untouched
    * (process-mw-dump.py:295-297). Returning None keeps the input. */
  def defaultCustomPrepare(text: String, title: String, nsName: String): Option[String] =
    if (nsName != "Main") None
    else Some(templatePack.foldLeft(text)((t, r) => r(t)))

  /** Full ordered prepare pipeline (process-mw-dump.py:193-254): T1-T6
    * rewrites, the T5 fence scanner, transclusion removal, then the T7
    * custom-prepare hook. Empty text passes through untouched. */
  def prepare(
      text: String,
      title: String,
      nsName: String,
      customPrepare: Option[(String, String, String) => Option[String]] =
        Some(defaultCustomPrepare)): String = {
    if (text == null || text.isEmpty) return text
    var t = categoryRule(text)
    t = nowikiRule(t)
    t = tocHeaderRule(t)
    t = tocRule(t)
    t = fileOptionsRule(t)
    t = fenceCodeBlocks(t)
    t = transclusionRule(t)
    customPrepare.flatMap(f => Option(f(t, title, nsName)).flatten).getOrElse(t)
  }

  // -- F2/F3/F5 helpers ---------------------------------------------------

  /** F2: strip the `Namespace:` prefix at the FIRST colon when ns > 0
    * (process-mw-dump.py:114-115). No colon → title unchanged. */
  def deprefixTitle(title: String, nsId: Int): String =
    if (nsId > 0) {
      val i = title.indexOf(':')
      if (i >= 0) title.substring(i + 1) else title
    } else title

  /** F3: filename sanitization (process-mw-dump.py:123-128): path
    * separator → '-', keep alphanumerics (Unicode, like Python
    * `str.isalnum`) plus space/dot/underscore/dash, right-trim. */
  def sanitizeFilename(title: String): String = {
    val dashed = title.replace('/', '-')
    val kept = dashed.filter { c =>
      Character.isLetterOrDigit(c) ||
      Character.getType(c) == Character.LETTER_NUMBER ||
      Character.getType(c) == Character.OTHER_NUMBER ||
      c == ' ' || c == '.' || c == '_' || c == '-'
    }
    kept.reverse.dropWhile(_.isWhitespace).reverse
  }

  /** F5: redirect pages are dropped (process-mw-dump.py:261-263). */
  def isRedirect(text: String): Boolean =
    text != null && text.startsWith("#REDIRECT")
}
