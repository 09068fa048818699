package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Differential golden corpus: `prepare_corpus.json` holds
  * (input → expected) pairs produced by EXECUTING the reference's own
  * `WikitextParser.prepare` + `custom_prepare`
  * (/root/reference/process-mw-dump.py) over an adversarial corpus —
  * every rule, case-insensitivity, glued close tags, CRLF, tabs,
  * unicode, unterminated blocks. The Scala engine must match
  * byte-for-byte. */
class GoldenCorpusSpec extends AnyFunSuite {

  private lazy val cases: Map[String, (String, String)] = {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/prepare_corpus.json"), "UTF-8")
      .mkString
    // minimal JSON parse (flat {name: {input, expected}} with string values)
    val objPattern = """"([^"]+)":\s*\{\s*"input":\s*"((?:[^"\\]|\\.)*)",\s*"expected":\s*"((?:[^"\\]|\\.)*)"\s*\}""".r
    objPattern.findAllMatchIn(raw).map { m =>
      m.group(1) -> ((unescape(m.group(2)), unescape(m.group(3))))
    }.toMap
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  test("golden corpus loads") {
    assert(cases.size == 13, s"expected 13 cases, parsed ${cases.keys.toSeq.sorted}")
  }

  test("Scala prepare matches the reference byte-for-byte on every case") {
    val diffs = cases.toSeq.sortBy(_._1).flatMap { case (name, (input, expected)) =>
      val got = Wikitext.prepare(input, "T", "Main")
      if (got != expected)
        Some(s"$name:\n  expected ${render(expected)}\n  got      ${render(got)}")
      else None
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  private def render(s: String): String =
    s.replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
}
