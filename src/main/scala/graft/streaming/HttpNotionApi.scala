package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.model.NotionBlock

/** Concrete HTTP [[NotionApi]] over `java.net.http` — the real-client
  * half the drain stack's trait boundary promised (the reference's
  * NotionClient + urllib3 Retry adapter,
  * upload_notion_blocks.py:157-181, exercised by
  * upload_notion_blocks.py:84-154's get-or-make-page flow).
  *
  * Transport-level status retry mirrors the reference's adapter
  * verbatim: up to `statusRetries` retries on HTTP 429/502/503/504
  * ([[NotionApiError.retryableStatuses]]), sleeping
  * `backoffFactorMs * 2^(attempt-1)` between attempts (urllib3's
  * `backoff_factor=0.2` rule at the reference's defaults), honoring a
  * numeric `Retry-After` response header when the server sends one
  * (urllib3 `respect_retry_after_header` default), and raising after
  * exhaustion (`raise_on_status=True`) as a typed [[NotionApiError]] —
  * which the [[NotionForeachWriter]] ST8 loop and [[Drain]]'s failure
  * routing already understand, so the mock and this client are
  * interchangeable behind the factory with zero sink changes.
  * Non-retryable error statuses throw immediately.
  *
  * Wire protocol (the reference talks to notion.so's private API via
  * the `notion` package; this client speaks the equivalent minimal
  * JSON REST surface, so any conforming server — including the
  * in-process test stub — can serve it):
  * {{{
  *   GET  /v1/pages/{blockBatch}           -> 200 {"url": …} | 404
  *   POST /v1/pages {block_batch,title,parent_url} -> 200/201 {"url": …}
  *   POST /v1/blocks {page_url,block_batch,block_index,bucket,key,
  *                    block_type,title,language,caption} -> 2xx
  * }}}
  * `getOrCreatePage` is the reference's get-or-make-page: probe by
  * batch id, create under the parent only on 404 — calling it twice
  * with the same batch returns the same URL (the server owns the
  * registry the reference keeps in its NotionPages table).
  *
  * Serialization: the class ships to executors inside the
  * `apiFactory` closure; the `HttpClient` is `@transient lazy`, built
  * on first use on whatever JVM runs the partition (the reference's
  * warm-container client cache, upload_notion_blocks.py:51,157-160).
  */
class HttpNotionApi(
    baseUrl: String,
    token: String = "",
    statusRetries: Int = 5,
    backoffFactorMs: Long = 200L,
    requestTimeoutMs: Long = 30000L)
  extends NotionApi {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(requestTimeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def field(json: String, name: String): Option[String] = {
    // single-purpose extractor for the flat one-level responses above —
    // string values only, quoted per jsonStr's escaping
    val m = ("\"" + java.util.regex.Pattern.quote(name) +
      "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    m.findFirstMatchIn(json).map { g =>
      val sb = new StringBuilder
      val s = g.group(1)
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'u' if i + 6 <= s.length &&
                s.substring(i + 2, i + 6).forall(c =>
                  Character.digit(c, 16) >= 0) =>
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case 'u' =>
              // truncated (\u12 at end-of-value) or non-hex escape from
              // a malformed server: degrade to the raw chars instead of
              // crashing the sink mid-drain with a StringIndexOOB /
              // NumberFormatException (round-14 advice)
              sb += 'u'; i += 2
            case c => sb += c; i += 2
          }
        } else { sb += s.charAt(i); i += 1 }
      }
      sb.toString
    }
  }

  /** One HTTP exchange with the reference's status-retry schedule.
    * Returns the terminal response; statuses in `okStatuses` pass
    * through to the caller (404 for the get-or-create probe), every
    * other non-2xx throws [[NotionApiError]] — immediately when
    * non-retryable, after `statusRetries` exhausted retries when
    * retryable. */
  private def exchange(method: String, path: String, body: Option[String],
      okStatuses: Set[Int] = Set.empty): HttpResponse[String] = {
    val b = HttpRequest.newBuilder()
      .uri(URI.create(baseUrl + path))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
    if (token.nonEmpty) b.header("Authorization", s"Bearer $token")
    val req = (body match {
      case Some(s) => b.method(method, HttpRequest.BodyPublishers.ofString(s))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }).build()
    var attempt = 0
    while (true) {
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      val st = resp.statusCode()
      if (st / 100 == 2 || okStatuses(st)) return resp
      val retryable = NotionApiError.retryableStatuses(st)
      if (!retryable || attempt >= statusRetries)
        throw NotionApiError(st,
          s"$method $path failed after ${attempt} retries: ${resp.body()}")
      // urllib3 backoff_factor rule, Retry-After override when present
      val retryAfter = {
        val h = resp.headers().firstValue("Retry-After")
        if (h.isPresent) h.get().toLongOption.map(_ * 1000L) else None
      }
      Thread.sleep(retryAfter.getOrElse(backoffFactorMs * (1L << attempt)))
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  override def getOrCreatePage(blockBatch: String, key: String,
      parentUrl: String): String = {
    val enc = java.net.URLEncoder.encode(blockBatch, "UTF-8")
    val probe = exchange("GET", s"/v1/pages/$enc", None, okStatuses = Set(404))
    val page =
      if (probe.statusCode() == 404)
        exchange("POST", "/v1/pages", Some(
          s"""{"block_batch":${jsonStr(blockBatch)},""" +
            s""""title":${jsonStr(key)},""" +
            s""""parent_url":${jsonStr(parentUrl)}}"""))
      else probe
    field(page.body(), "url").getOrElse(
      throw NotionApiError(page.statusCode(),
        s"page response carried no url: ${page.body()}"))
  }

  override def uploadBlock(pageUrl: String, block: NotionBlock): Unit = {
    exchange("POST", "/v1/blocks", Some(
      s"""{"page_url":${jsonStr(pageUrl)},""" +
        s""""block_batch":${jsonStr(block.blockBatch)},""" +
        s""""block_index":${block.blockIndex},""" +
        s""""bucket":${jsonStr(block.bucket)},""" +
        s""""key":${jsonStr(block.key)},""" +
        s""""block_type":${jsonStr(block.blockType)},""" +
        s""""title":${jsonStr(block.title)},""" +
        s""""language":${jsonStr(block.language)},""" +
        s""""caption":${jsonStr(block.caption)}}"""))
    ()
  }
}
