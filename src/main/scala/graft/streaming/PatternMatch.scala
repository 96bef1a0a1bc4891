package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CEP pattern matcher via flatMapGroupsWithState: detect the
  * ordered funnel pattern view → click → purchase per user, greedy and
  * non-overlapping (after a complete match the automaton restarts), with
  * O(1) state per user — the complex-event-processing operator the
  * stream family was missing next to sessionization.
  *
  * Determinism: events are processed in (event-time, event_id) order
  * (ties broken by id), and the automaton is a 3-state DFA, so the match
  * set is a pure function of the event sequence. The batch-SQL oracle
  * replays it through the COMPLETE-TRIPLE CHAIN equivalence: for a view
  * v let c(v) be the first click after v and p(v) the first purchase
  * after c(v); the automaton's matches are exactly the chain v₁ = first
  * view, vₖ₊₁ = first view after p(vₖ) — because if the first view
  * after a cursor has an incomplete triple, NO later view can complete
  * one (its first-following click/purchase windows are subsets), so
  * both formulations stop together.
  *
  * Scale: state per key is one small struct (stage + two event keys);
  * in-batch sort is bounded by the per-user batch slice, not stream
  * length — the same contract as [[Sessionize]].
  */
object PatternMatch {

  final case class PEvent(
      user_id: Long, ts: java.sql.Timestamp, event_id: Long, event_type: String)
  /** stage 0 = awaiting view, 1 = have view, 2 = have view+click. */
  final case class FunnelState(
      stage: Int, vUs: Long, vId: Long, cUs: Long, cId: Long)
  final case class MatchOut(
      user_id: Long, view_event_id: Long,
      t_view: java.sql.Timestamp, t_click: java.sql.Timestamp,
      t_purchase: java.sql.Timestamp, latency_sec: Long)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def ts(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  /** The per-group automaton step: fold this batch's (sorted) events
    * into the carried state, emitting every completed match.
    *
    * PRECONDITION (in-order arrival across batches): events are sorted
    * by event time only WITHIN each micro-batch; the DFA assumes
    * micro-batches themselves arrive in event-time order (as
    * q_stream_sessions also requires of its source). A late event whose
    * event time precedes an already-processed batch is folded at its
    * ARRIVAL position, which can produce a different match set than the
    * batch oracle — there is no watermark to drop or reorder it. At
    * scale, front the stream with a watermark + event-time sort per
    * key (or widen FunnelState to buffer a reorder window) before
    * relying on cross-batch ordering. */
  def matchFunnel(
      userId: Long,
      events: Iterator[PEvent],
      state: GroupState[FunnelState]): Iterator[MatchOut] = {
    val sorted = events.map(e => (micros(e.ts), e.event_id, e.event_type))
      .toArray.sortBy(e => (e._1, e._2))
    var st = state.getOption.getOrElse(FunnelState(0, 0L, 0L, 0L, 0L))
    var out = List.empty[MatchOut]
    sorted.foreach { case (us, id, et) =>
      st.stage match {
        case 0 if et == "view" =>
          st = FunnelState(1, us, id, 0L, 0L)
        case 1 if et == "click" =>
          st = FunnelState(2, st.vUs, st.vId, us, id)
        case 2 if et == "purchase" =>
          out ::= MatchOut(userId, st.vId, ts(st.vUs), ts(st.cUs), ts(us),
            (us - st.vUs) / 1000000L)
          st = FunnelState(0, 0L, 0L, 0L, 0L)
        case _ => () // non-advancing event: ignored by the DFA
      }
    }
    state.update(st)
    out.reverseIterator
  }

  /** Wire the automaton over a (streaming or batch) events frame. */
  def matches(events: DataFrame): Dataset[MatchOut] = {
    val s = events.sparkSession
    import s.implicits._
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[PEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        matchFunnel)
  }
}
