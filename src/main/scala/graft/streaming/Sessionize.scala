package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via KeyValueGroupedDataset.flatMapGroupsWithState:
  * per-user session tracking with a 30-minute inactivity gap — the custom-
  * state streaming operator family (SURVEY.md §2.9's extension point).
  *
  * State per key is O(1) (one open session struct), evicted by processing-
  * time timeout — bounded regardless of stream length, the property that
  * matters at 100 TB/day event volumes.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  val GapMicros: Long = 30L * 60 * 1000000

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def ts(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  /** Emit closed sessions; keep at most one open session per user in
    * state. Events inside a batch arrive unordered → sort within group
    * (bounded by batch size per key, not stream length).
    *
    * `withTimeout=false` skips the processing-time timeout registration:
    * required for batch-finite runs (Trigger.AvailableNow), where a
    * pending 35-minute timeout would keep the query alive long after the
    * data is exhausted. */
  def trackSessions(withTimeout: Boolean)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(s =>
        SessionOut(userId, ts(s.start), ts(s.last), s.n)).iterator
      state.remove()
      return out
    }
    val sorted = events.map(e => micros(e.ts)).toArray.sorted
    var closed = List.empty[SessionOut]
    var cur = state.getOption
    sorted.foreach { t =>
      cur match {
        case Some(s) if t < s.start - GapMicros =>
          // a late event MORE than a gap before the open session belongs
          // to a distinct earlier session that may already have been
          // emitted — it cannot be merged (that would bridge a >gap
          // hole) or re-opened; emit it as its own single-event session
          // (best effort under out-of-order cross-batch delivery; the
          // ordered-source contract makes this branch unreachable)
          closed ::= SessionOut(userId, ts(t), ts(t), 1)
        case Some(s) if t - s.last <= GapMicros =>
          // start = min handles a late WITHIN-GAP event (earlier than
          // the open session's start but within a gap of it): the
          // session extends backwards instead of keeping a too-late
          // start
          cur = Some(s.copy(start = math.min(s.start, t),
            last = math.max(s.last, t), n = s.n + 1))
        case Some(s) =>
          closed ::= SessionOut(userId, ts(s.start), ts(s.last), s.n)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      if (withTimeout) state.setTimeoutDuration("35 minutes")
    }
    closed.reverseIterator
  }

  /** Wire the tracker over a streaming (or batch) events DataFrame. */
  def sessions(events: DataFrame, withTimeout: Boolean = true): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.select(col("user_id"), col("ts"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), timeoutConf)(trackSessions(withTimeout))
  }
}
