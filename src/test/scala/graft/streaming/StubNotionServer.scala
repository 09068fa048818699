package graft.streaming

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal conforming localhost server for [[HttpNotionApi]]'s wire
  * protocol — shared by the unit spec (HttpNotionApiSpec) and the
  * composed end-to-end run (EndToEndSpec), so the real-client path is
  * exercised over a real wire in BOTH. Pages registry + upload log +
  * a scriptable failure queue: each enqueued (status,
  * retryAfterSeconds) is served to one /v1/blocks call before the
  * real handler runs. */
class StubNotionServer {
  val pages = new java.util.concurrent.ConcurrentHashMap[String, String]()
  val uploads = new ConcurrentLinkedQueue[String]()
  val blockCalls = new AtomicInteger(0)
  val failScript = new ConcurrentLinkedQueue[(Int, Option[Long])]()
  val sleepTimes = new ConcurrentLinkedQueue[Long]()

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  private def bodyOf(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), "UTF-8")

  private def field(json: String, name: String): String = {
    val m = ("\"" + name + "\"\\s*:\\s*\"([^\"]*)\"").r
    m.findFirstMatchIn(json).map(_.group(1)).getOrElse("")
  }

  val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
  server.createContext("/v1/pages", (ex: HttpExchange) => {
    if (ex.getRequestMethod == "GET") {
      val batch = java.net.URLDecoder.decode(
        ex.getRequestURI.getPath.stripPrefix("/v1/pages/"), "UTF-8")
      Option(pages.get(batch)) match {
        case Some(url) => respond(ex, 200, s"""{"url":"$url"}""")
        case None => respond(ex, 404, """{"error":"not found"}""")
      }
    } else {
      val body = bodyOf(ex)
      val batch = field(body, "block_batch")
      val url = pages.computeIfAbsent(batch,
        b => s"${field(body, "parent_url")}/$b")
      respond(ex, 201, s"""{"url":"$url"}""")
    }
  })
  server.createContext("/v1/blocks", (ex: HttpExchange) => {
    blockCalls.incrementAndGet()
    sleepTimes.add(System.nanoTime())
    Option(failScript.poll()) match {
      case Some((status, retryAfter)) =>
        retryAfter.foreach(s =>
          ex.getResponseHeaders.add("Retry-After", s.toString))
        respond(ex, status, s"""{"error":"injected $status"}""")
      case None =>
        val body = bodyOf(ex)
        uploads.add(field(body, "block_batch") + ":" +
          "\"block_index\"\\s*:\\s*(\\d+)".r
            .findFirstMatchIn(body).map(_.group(1)).getOrElse("?"))
        respond(ex, 200, """{"ok":true}""")
    }
  })
  server.setExecutor(null)
  server.start()
  def base: String = s"http://localhost:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)
}
