package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Event sessionization: gap-based sessions (a session ends after
 * `gap` of inactivity per user).
 *
 *  - [[batch]]: classic gaps-and-islands with window functions — one
 *    shuffle on user_id; the running sum is computed within the sorted
 *    partition, no further movement. Deterministic, oracle-friendly SQL.
 *  - [[streaming]]: Structured Streaming with
 *    `flatMapGroupsWithState` + event-time timeout — emits a session row
 *    when the watermark passes its end. The state per user is O(1)
 *    (current session bounds), so state store size is #active users,
 *    not #events.
 */
object Sessionize {

  /**
   * Batch sessionization. Output: one row per (user_id, session) with
   * session_start, session_end, n_events, sum_value.
   */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapSec = gapMinutes * 60L
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("__prev")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), sum("value").as("sum_value"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long,
                              sum_value: Double)

  /**
   * Streaming sessionization over a watermarked event stream.
   * Usage:
   * {{{
   *   val sessions = Sessionize.streaming(
   *     stream.withWatermark("ts", "1 hour").as[Event], gapMinutes = 30)
   *   sessions.writeStream.outputMode("append")...
   * }}}
   */
  def streaming(events: Dataset[Event], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def fn(user: Long, rows: Iterator[Event],
           state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(user, new Timestamp(s.start), new Timestamp(s.end),
          s.n, s.sum))
      } else {
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t >= s.start - gapMs && t <= s.end + gapMs =>
              // within gap of the session interval on either side —
              // out-of-order (non-late) events extend it backward too
              cur = Some(SessionState(math.min(s.start, t),
                math.max(s.end, t), s.n + 1, s.sum + e.value))
            case Some(s) if t > s.end + gapMs =>
              closed ::= SessionOut(user, new Timestamp(s.start),
                new Timestamp(s.end), s.n, s.sum)
              cur = Some(SessionState(t, t, 1, e.value))
            case Some(_) =>
              // earlier than the current session by more than the gap:
              // an isolated earlier session — emit it immediately (the
              // single-session state keeps tracking the later one)
              closed ::= SessionOut(user, new Timestamp(t), new Timestamp(t),
                1, e.value)
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // close the session `gap` past its end, measured in event time
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.reverseIterator
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /**
   * Batch tumbling-window aggregation over the events table (the batch
   * twin of a streaming windowed count): events per (hour, event_type)
   * with value stats.
   */
  def hourlyRollup(events: DataFrame): DataFrame =
    events.groupBy(
        date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum("value").as("sum_value"))

  /**
   * Streaming twin of [[hourlyRollup]]: tumbling event-time windows with
   * a watermark; in append mode a window emits once the watermark passes
   * its end, so state size is bounded by (#types × #open windows).
   * Feed it `spark.readStream...` and run with
   * `writeStream.outputMode("append")`.
   */
  def streamingHourlyRollup(events: DataFrame,
                            watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))
}
