package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap
import graft.model.NotionBlock

/** External API boundary (the Notion client role,
  * upload_notion_blocks.py:157-252). Pluggable so the sink logic is
  * testable against [[MockNotionApi]] and swappable for a real HTTP
  * client with zero changes to the drain operator. */
trait NotionApi extends Serializable {
  /** J1 get-or-create: returns the page URL for a batch, creating the
    * page under `parentUrl` if it does not exist yet
    * (upload_notion_blocks.py:84-154). */
  def getOrCreatePage(blockBatch: String, key: String, parentUrl: String): String

  /** K5: upload one block. Throws [[NotionApiError]] on failure. */
  def uploadBlock(pageUrl: String, block: NotionBlock): Unit
}

/** HTTP-style failure; statuses 429/502/503/504 are retryable
  * (upload_notion_blocks.py:164-181). */
case class NotionApiError(status: Int, msg: String)
  extends RuntimeException(s"$status: $msg")

object NotionApiError {
  val retryableStatuses: Set[Int] = Set(429, 502, 503, 504)
}

/** In-memory mock with observable behavior: records upload order and
  * call timestamps (for W4 order and K5 rate assertions), and injects
  * failures via a configurable predicate (for ST6/ST8/K8 paths).
  *
  * Registry-keyed by name so executor-side closures (same JVM in
  * local mode) and the test observe the same instance.
  */
class MockNotionApi(name: String) extends NotionApi {
  import MockNotionApi._
  def getOrCreatePage(blockBatch: String, key: String, parentUrl: String): String = {
    state(name).pages.getOrElseUpdate(blockBatch, s"$parentUrl/$key#$blockBatch")
  }
  def uploadBlock(pageUrl: String, block: NotionBlock): Unit = {
    val st = state(name)
    st.calls.incrementAndGet()
    st.callTimes.add(System.nanoTime())
    val fail = st.failWhen.get()
    if (fail != null && fail(block)) {
      st.failures.incrementAndGet()
      throw NotionApiError(st.failStatus.get(), s"injected failure for ${block.key}:${block.blockIndex}")
    }
    st.uploads.add((pageUrl, block))
  }
}

object MockNotionApi {
  final class State {
    val pages = new TrieMap[String, String]()
    val uploads = new java.util.concurrent.ConcurrentLinkedQueue[(String, NotionBlock)]()
    val callTimes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val calls = new AtomicLong(0)
    val failures = new AtomicLong(0)
    val failWhen = new java.util.concurrent.atomic.AtomicReference[NotionBlock => Boolean](null)
    val failStatus = new java.util.concurrent.atomic.AtomicInteger(503)
  }
  private val registry = new ConcurrentHashMap[String, State]()
  def state(name: String): State =
    registry.computeIfAbsent(name, _ => new State)
  def reset(name: String): State = {
    registry.remove(name)
    state(name)
  }
  def uploadsOf(name: String): Seq[(String, NotionBlock)] = {
    import scala.jdk.CollectionConverters._
    state(name).uploads.asScala.toSeq
  }
}
