package graft.convert

import java.util.regex.Pattern

/** Wikitext → GitHub-flavored-Markdown converter for the wikitext subset
  * the prepared pages contain (the reference shells out to pandoc for
  * this step — process-mw-dump.py:276-292 with `--wrap=none`; a JVM
  * implementation of the subset is both faster and hermetic; SURVEY §7.3
  * flags pandoc fidelity as scope-limited to the fixture corpus).
  *
  * Supported: `== headings ==`, `'''bold'''`/`''italic''`, wiki links
  * `[[Target]]`/`[[Target|label]]`, external links `[url label]`,
  * `[[File:x]]` images, `*`/`#` (nested) lists, `<pre>` blocks (emitted
  * as fenced code), paragraphs. Unknown markup passes through verbatim —
  * conversion must never throw (errors route to the warnings side
  * output, like the reference's ERROR-and-skip at :277-284).
  */
object WikiToMarkdown {

  private val heading = Pattern.compile("^(=+) *(.*?) *=+\\s*$")
  private val bold = Pattern.compile("'''(.+?)'''")
  private val italic = Pattern.compile("''(.+?)''")
  private val fileLink = Pattern.compile("\\[\\[File:([^\\]|]+)\\]\\]")
  private val wikiLinkLabeled = Pattern.compile("\\[\\[([^\\]|]+)\\|([^\\]]+)\\]\\]")
  private val wikiLink = Pattern.compile("\\[\\[([^\\]|]+)\\]\\]")
  private val extLinkLabeled = Pattern.compile("\\[(\\S+://\\S+) ([^\\]]+)\\]")
  private val extLink = Pattern.compile("\\[(\\S+://\\S+)\\]")
  private val listItem = Pattern.compile("^([*#]+) *(.*)$")

  /** Inline markup within one line. */
  private[convert] def inline(s: String): String = {
    var t = s
    t = bold.matcher(t).replaceAll("**$1**")
    t = italic.matcher(t).replaceAll("*$1*")
    t = fileLink.matcher(t).replaceAll("![$1]($1)")
    t = wikiLinkLabeled.matcher(t).replaceAll("[$2]($1)")
    t = wikiLink.matcher(t).replaceAll("[$1]($1)")
    t = extLinkLabeled.matcher(t).replaceAll("[$2]($1)")
    t = extLink.matcher(t).replaceAll("<$1>")
    t
  }

  /** Full document conversion. Pure and total: never throws. */
  def convert(wikitext: String): String = {
    if (wikitext == null) return null
    val out = new StringBuilder
    var inPre = false
    wikitext.split("\n", -1).foreach { line =>
      if (inPre) {
        // T5 right-trims the last code line before appending "</pre>", so
        // the close tag is usually GLUED to the final code line — handle
        // both the standalone and the glued form.
        val idx = line.indexOf("</pre>")
        if (idx >= 0) {
          val content = line.substring(0, idx)
          if (content.nonEmpty) out.append(content).append('\n')
          out.append("```\n")
          inPre = false
        } else out.append(line).append('\n')
      } else if (line.trim == "<pre>") {
        out.append("```\n"); inPre = true
      } else {
        val hm = heading.matcher(line)
        val lm = listItem.matcher(line)
        if (hm.matches()) {
          val level = math.min(hm.group(1).length, 6)
          out.append("#" * level).append(' ').append(inline(hm.group(2))).append('\n')
        } else if (lm.matches()) {
          val marks = lm.group(1)
          val indent = "    " * (marks.length - 1)
          val bullet = if (marks.last == '#') "1." else "-"
          out.append(indent).append(bullet).append(' ')
            .append(inline(lm.group(2))).append('\n')
        } else {
          out.append(inline(line)).append('\n')
        }
      }
    }
    if (inPre) out.append("```\n") // unterminated pre: close, like T5's EOF rule
    val r = out.toString
    if (r.endsWith("\n") && !wikitext.endsWith("\n")) r.dropRight(1) else r
  }
}
