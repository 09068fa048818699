package graft.convert

import java.io.{ByteArrayOutputStream, File}
import java.nio.charset.StandardCharsets
import java.util.concurrent.TimeUnit
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** External-process wikitext→Markdown conversion — the reference's
  * actual converter (process-mw-dump.py:276-292 shells out to
  * `pandoc --from mediawiki --to gfm --wrap=none` per page, routing
  * conversion errors to an ERROR log and skipping the page).
  *
  * Spark shape: `mapPartitions` over (id, wikitext) rows; each document
  * is piped through one pandoc process (pandoc reads stdin to EOF, so a
  * process cannot be reused across documents — the partition amortizes
  * everything else). stdin is fed from a separate thread so a large
  * document cannot deadlock the pipe. A failed or absent binary routes
  * the document through [[WikiToMarkdown]] (the native subset converter)
  * and records a warning — the pipeline stays total, matching the
  * reference's error-and-continue behavior while never losing a page.
  *
  * Scale: conversion is embarrassingly parallel (one process per row,
  * no shuffle); at 100 TB the cost is per-executor process spawn rate —
  * amortized by documents being ~KBs and pandoc ~10ms; partitions of
  * thousands of documents keep spawn overhead <10% of conversion time.
  */
object PandocConvert {

  /** Checked on the JVM that runs the partition (executor-side). */
  lazy val available: Boolean = binaryAvailable("pandoc")

  def binaryAvailable(binary: String): Boolean =
    try {
      val p = new ProcessBuilder(binary, "--version")
        .redirectErrorStream(true).start()
      p.getOutputStream.close()
      val done = p.waitFor(10, TimeUnit.SECONDS)
      if (!done) { p.destroyForcibly(); false } else p.exitValue() == 0
    } catch { case _: Exception => false }

  /** One document through one pandoc process. Right(markdown) on
    * success; Left(warning) on non-zero exit, timeout, or spawn
    * failure. */
  def convertDoc(wikitext: String, binary: String = "pandoc",
      timeoutMs: Long = 30000L): Either[String, String] =
    try {
      val pb = new ProcessBuilder(binary,
        "--from", "mediawiki", "--to", "gfm", "--wrap", "none")
      val proc = pb.start()
      // writer thread: a doc larger than the pipe buffer would deadlock
      // a single-threaded write-then-read. stdin MUST close even when the
      // write throws — otherwise pandoc reads stdin forever and the real
      // error surfaces as a bogus 30 s timeout
      val writeError = new java.util.concurrent.atomic.AtomicReference[String]()
      val writer = new Thread(() => {
        try proc.getOutputStream.write(wikitext.getBytes(StandardCharsets.UTF_8))
        catch { case e: Exception => writeError.set(String.valueOf(e)) }
        finally {
          try proc.getOutputStream.close()
          catch { case _: Exception => () }
        }
      })
      writer.setDaemon(true)
      writer.start()
      val out = new ByteArrayOutputStream()
      val err = new ByteArrayOutputStream()
      val outT = new Thread(() => proc.getInputStream.transferTo(out))
      val errT = new Thread(() => proc.getErrorStream.transferTo(err))
      outT.setDaemon(true); errT.setDaemon(true)
      outT.start(); errT.start()
      val finished = proc.waitFor(timeoutMs, TimeUnit.MILLISECONDS)
      if (!finished) {
        proc.destroyForcibly()
        Left(s"pandoc timeout after ${timeoutMs}ms")
      } else {
        outT.join(1000); errT.join(1000)
        if (writeError.get != null)
          Left(s"pandoc stdin write failed: ${writeError.get}")
        else if (proc.exitValue() == 0)
          Right(out.toString(StandardCharsets.UTF_8))
        else
          Left(s"pandoc exit ${proc.exitValue()}: " +
            err.toString(StandardCharsets.UTF_8).linesIterator
              .take(3).mkString(" | "))
      }
    } catch {
      case e: Exception => Left(s"pandoc spawn failed: ${e.getMessage}")
    }

  /** (markdown, warning): pandoc result when the process path works,
    * otherwise the native subset conversion plus the warning that
    * explains why (empty warning = clean pandoc conversion; warning
    * "native: binary unavailable" = hermetic fallback). */
  def convertWithFallback(wikitext: String, binary: String = "pandoc",
      processAvailable: Boolean = available): (String, String) =
    if (!processAvailable)
      (WikiToMarkdown.convert(wikitext), "native: binary unavailable")
    else convertDoc(wikitext, binary) match {
      case Right(md) => (md, "")
      case Left(w) => (WikiToMarkdown.convert(wikitext), s"native: $w")
    }

  /** DataFrame operator: (doc_id, text) → (doc_id, markdown, warning).
    * T10's full-fidelity path; `binary` is injectable for tests. */
  def convert(docs: DataFrame, binary: String = "pandoc"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // probed once per partition, on the executor that runs it
        val avail = binaryAvailable(binary)
        it.map { case (id, txt) =>
          val (md, warn) = convertWithFallback(txt, binary, avail)
          (id, md, warn)
        }
      }
      .toDF("doc_id", "markdown", "warning")
  }
}
