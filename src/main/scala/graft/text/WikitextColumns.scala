package graft.text

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level forms of the wikitext rules.
  *
  * The stateless single-regex rules (T1-T4, T6 — SURVEY §2.4) compile to
  * `regexp_replace` chains that stay inside whole-stage codegen; only the
  * per-document stateful fence scanner (T5) and the full prepare pipeline
  * cross into a Scala UDF — state is per-row, so the UDF is still
  * embarrassingly parallel and shuffle-free at any scale.
  */
object WikitextColumns {

  def deleteCategories(c: Column): Column =
    regexp_replace(c, """\[\[Category:.+\]\]""", "")

  def stripNowiki(c: Column): Column =
    regexp_replace(c, "</?nowiki>", "")

  def deleteToc(c: Column): Column =
    regexp_replace(regexp_replace(c, "=+ Table of Contents =+\n__TOC__", ""),
      "__TOC__", "")

  def stripFileOptions(c: Column): Column =
    regexp_replace(c, """\[\[File:([^\|]+)\|.+\]\]""", "[[File:$1]]")

  def removeTransclusions(c: Column): Column =
    regexp_replace(c, """\{\{:.+\}\}""", "")

  /** F2 as a Column: de-prefix at the first colon when ns > 0. */
  def deprefixTitle(title: Column, nsId: Column): Column =
    when(nsId > 0 && instr(title, ":") > 0,
      title.substr(instr(title, ":") + 1, length(title)))
      .otherwise(title)

  /** F5 redirect predicate. */
  def isRedirect(c: Column): Column = c.startsWith("#REDIRECT")

  /** F4 empty-page predicate (process-mw-dump.py:194-195,257-259). */
  def isEmptyPage(c: Column): Column = c.isNull || c === ""

  private val prepareFn =
    (text: String, title: String, ns: String) =>
      Wikitext.prepare(text, title, ns)

  private val fenceFn = (text: String) =>
    if (text == null) null else Wikitext.fenceCodeBlocks(text)

  private val sanitizeFn = (title: String) =>
    if (title == null) null else Wikitext.sanitizeFilename(title)

  val prepareUdf = udf(prepareFn)
  val fenceUdf = udf(fenceFn)
  val sanitizeUdf = udf(sanitizeFn)

  /** Register SQL-callable forms. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("wikitext_prepare", prepareUdf)
    spark.udf.register("wikitext_fence", fenceUdf)
    spark.udf.register("sanitize_filename", sanitizeUdf)
  }
}
