package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.text.{Wikitext, WikitextColumns}
import graft.convert.WikiToMarkdown

/** Phase-1 batch pipeline: MediaWiki XML dump → per-namespace Markdown
  * tree + extracted binaries (process-mw-dump.py end-to-end, SURVEY §3.1).
  *
  * Spark-first shape: two declarative scans of the dump (pages and the
  * namespace registry) with explicit schemas (no inference — §1.3), a
  * broadcast dimension join for namespace names, Column-level filters
  * (pushdown-friendly), the per-document prepare/convert UDF, and
  * foreachPartition file sinks that preserve the reference's
  * `<outdir>/<nsName>/<sanitized title>.md` layout. The accepted/warned
  * split is one cached scan with two filters (F1's side output).
  */
object Phase1 {

  /** Explicit page schema (FIXTURES.md §1). */
  val pageSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("ns", IntegerType),
    StructField("revision", StructType(Seq(
      StructField("text", StringType)))),
    StructField("upload", StructType(Seq(
      StructField("filename", StringType),
      StructField("contents", StructType(Seq(
        StructField("_VALUE", StringType),
        StructField("_encoding", StringType)))))))))

  /** S1/S3/S4: page scan with explicit schema. */
  def readPages(spark: SparkSession, xmlPath: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "page")
      .schema(pageSchema)
      .load(xmlPath)

  /** S2: namespace registry scan; key "0" renamed "Main"
    * (process-mw-dump.py:40-45). */
  def readNamespaces(spark: SparkSession, xmlPath: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "namespace")
      .schema(StructType(Seq(
        StructField("_key", IntegerType),
        StructField("_VALUE", StringType))))
      .load(xmlPath)
      .select(col("_key").as("nsKey"),
        when(col("_key") === 0, "Main").otherwise(col("_VALUE")).as("nsName"))

  /** Allowed namespaces (F1, process-mw-dump.py:46-79). */
  val allowedNamespaces: Seq[String] = Seq("Main", "File", "Category")

  /** Pages resolved against the registry (J3) and split into accepted /
    * warned flows (F1's warning side output). Returns (accepted, warned).
    */
  def splitByNamespace(pages: DataFrame, namespaces: DataFrame)
      : (DataFrame, DataFrame) = {
    val joined = pages.join(broadcast(namespaces),
      pages("ns") === namespaces("nsKey"), "inner")
    val accepted = joined.filter(col("nsName").isin(allowedNamespaces: _*))
    val warned = joined.filter(!col("nsName").isin(allowedNamespaces: _*))
      .select(col("nsName"), col("title"),
        lit("namespace implicitly ignored").as("warning"))
    (accepted, warned)
  }

  /** The prepared wikitext pages flow: F2 de-prefix, T1-T9 prepare,
    * F4 empty / F5 redirect filters, T10 markdown conversion, F3
    * filename. Output: (nsName, filename, markdown).
    *
    * `usePandoc = true` routes conversion through the external pandoc
    * process (the reference's converter, with hermetic native fallback
    * and per-doc warnings swallowed here — use
    * [[graft.convert.PandocConvert.convert]] directly to keep them).
    * Default false so golden tests pin the native converter on every
    * machine, with or without the binary installed. */
  def markdownPages(accepted: DataFrame,
      usePandoc: Boolean = false): DataFrame = {
    val convertUdf = udf { (text: String, title: String, ns: String) =>
      val prepared = Wikitext.prepare(text, title, ns)
      if (usePandoc)
        graft.convert.PandocConvert.convertWithFallback(prepared)._1
      else WikiToMarkdown.convert(prepared)
    }
    val sanitizeUdf = WikitextColumns.sanitizeUdf
    accepted
      .filter(col("nsName") =!= "File")
      .select(col("nsName"),
        WikitextColumns.deprefixTitle(col("title"), col("ns")).as("title"),
        col("revision.text").as("text"))
      .filter(!WikitextColumns.isEmptyPage(col("text")))
      .filter(!WikitextColumns.isRedirect(col("text")))
      .withColumn("markdown", convertUdf(col("text"), col("title"), col("nsName")))
      .withColumn("filename", concat(sanitizeUdf(col("title")), lit(".md")))
      .select(col("nsName"), col("filename"), col("markdown"))
  }

  /** The embedded-files flow (S4/T15): (nsName, filename, bytes). Rejects
    * non-base64 encodings like FileParser.save (process-mw-dump.py:160-163)
    * — but as a filterable flag, not an exception. */
  def embeddedFiles(accepted: DataFrame): DataFrame =
    accepted
      .filter(col("nsName") === "File" && col("upload").isNotNull)
      .select(col("nsName"),
        col("upload.filename").as("filename"),
        col("upload.contents._encoding").as("encoding"),
        unbase64(col("upload.contents._VALUE")).as("bytes"))
      .withColumn("encodingOk", coalesce(col("encoding") === "base64", lit(false)))

  /** K1/K2: file-tree sink preserving `<outdir>/<nsName>/<filename>`.
    * foreachPartition writers — each partition writes its own files, no
    * driver collect; at scale this is object-store puts per partition. */
  def writeTree(df: DataFrame, outDir: String): Unit = {
    val rows = df.select(col("nsName"), col("filename"),
      coalesce(col("markdown").cast("binary"), col("bytes")).as("payload"))
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      it.foreach { r =>
        val dir = Paths.get(outDir, r.getString(0))
        Files.createDirectories(dir)
        Files.write(dir.resolve(r.getString(1)), r.getAs[Array[Byte]]("payload"))
      }
    }
  }

  /** Full phase-1 run. Returns (pagesWritten, filesWritten, warnings). */
  def run(spark: SparkSession, xmlPath: String, outDir: String,
      usePandoc: Boolean = false): (Long, Long, Long) = {
    val namespaces = readNamespaces(spark, xmlPath)
    val pages = readPages(spark, xmlPath)
    val (accepted, warned) = splitByNamespace(pages, namespaces)
    val md = markdownPages(accepted, usePandoc).cache()
    val files = embeddedFiles(accepted).filter(col("encodingOk"))
      .withColumn("markdown", lit(null).cast("string")).cache()
    writeTree(md.withColumn("bytes", lit(null).cast("binary")), outDir)
    writeTree(files, outDir)
    val res = (md.count(), files.count(), warned.count())
    md.unpersist(); files.unpersist()
    res
  }
}
