package graft.streaming

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** ST5: orphan cleanup on abnormal termination.
  *
  * The reference wires an EventBridge rule on ABORTED|FAILED|TIMED_OUT
  * state-machine ends to a cleanup machine that releases the stuck
  * semaphore (mw_to_notion_stack.py:667-688). Here ST4's serialization is
  * structural (one sink partition), so the only orphaned state is
  * user-registered per-query cleanup — released via
  * `StreamingQueryListener.onQueryTerminated`, with the exception routed
  * to the handler so ABORTED-vs-graceful is distinguishable.
  */
object Cleanup {

  /** (queryName -> handler(exceptionMessageOpt)). */
  private val handlers = TrieMap.empty[String, Option[String] => Unit]
  private val installed = TrieMap.empty[SparkSession, Boolean]

  private val runNames = TrieMap.empty[java.util.UUID, String]

  /** Register `handler` for every termination of a query named
    * `queryName` — PERSISTENT, not one-shot: a supervisor restarting a
    * crashed query under the same name gets cleanup on the restart's
    * termination too (the one-shot form silently left the second
    * crash's orphans in place). Handlers must therefore be idempotent
    * (orphan cleanup naturally is); re-registering the same name
    * replaces the handler. */
  def onTerminated(spark: SparkSession, queryName: String)(
      handler: Option[String] => Unit): Unit = {
    handlers.put(queryName, handler)
    // the query may already be running (its StartedEvent predates us) —
    // resolve its id now
    spark.streams.active.filter(q => q.name == queryName)
      .foreach(q => runNames.put(q.id, queryName))
    installed.getOrElseUpdate(spark, {
      spark.streams.addListener(new StreamingQueryListener {
        override def onQueryStarted(event: QueryStartedEvent): Unit =
          Option(event.name).foreach(n => runNames.put(event.id, n))
        override def onQueryProgress(event: QueryProgressEvent): Unit = ()
        override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
          // QueryTerminatedEvent carries no name — resolve via the id
          // recorded at start. The handler stays registered (see
          // onTerminated: restarts under the same name must clean up
          // too); only the per-run id mapping is dropped.
          runNames.remove(event.id).flatMap(handlers.get)
            .foreach(h => h(event.exception))
        }
      })
      true
    })
  }
}
