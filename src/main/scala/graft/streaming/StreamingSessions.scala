package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the Structured Streaming twin of the
  * batch gaps-and-islands query (WindowCatalogue q45): per-user
  * activity sessions that close after `gap` of inactivity, computed
  * with `session_window` (Spark's native merging-window state), not a
  * custom mapGroupsWithState.
  *
  * Scale: state is one open window per active user, keyed by user —
  * bounded by the watermark horizon, merged incrementally; a closed
  * session is emitted exactly once in Append mode when the watermark
  * passes its end. No global state, no driver involvement.
  */
object StreamingSessions {

  /** events(ts timestamp, user_id) → closed sessions
    * (user_id, session_start, session_end, events). */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("events"))
}
