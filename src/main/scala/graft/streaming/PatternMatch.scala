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
  /** stage 0 = awaiting view, 1 = have view, 2 = have view+click.
    * maxUs = highest event time already folded into the DFA — the
    * in-order guard: a later batch delivering an earlier event is a
    * precondition violation, detected loudly (see [[matchFunnel]]). */
  final case class FunnelState(
      stage: Int, vUs: Long, vId: Long, cUs: Long, cId: Long, maxUs: Long)
  /** An event parked in the reorder buffer until the watermark passes it. */
  final case class Pending(us: Long, id: Long, typ: String)
  /** [[matchFunnelReordered]] state: the DFA plus the reorder buffer. */
  final case class ReorderState(dfa: FunnelState, pending: Array[Pending])
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

  /** The DFA step shared by both entry points: fold one event-time-
    * sorted slice into the carried automaton, appending completed
    * matches to `out`. Returns the advanced state (maxUs updated). */
  private def fold(
      userId: Long,
      sorted: Array[(Long, Long, String)],
      st0: FunnelState,
      out: scala.collection.mutable.ListBuffer[MatchOut]): FunnelState = {
    var st = st0
    sorted.foreach { case (us, id, et) =>
      st.stage match {
        case 0 if et == "view" =>
          st = FunnelState(1, us, id, 0L, 0L, st.maxUs)
        case 1 if et == "click" =>
          st = FunnelState(2, st.vUs, st.vId, us, id, st.maxUs)
        case 2 if et == "purchase" =>
          out += MatchOut(userId, st.vId, ts(st.vUs), ts(st.cUs), ts(us),
            (us - st.vUs) / 1000000L)
          st = FunnelState(0, 0L, 0L, 0L, 0L, st.maxUs)
        case _ => () // non-advancing event: ignored by the DFA
      }
    }
    if (sorted.nonEmpty && sorted.last._1 > st.maxUs)
      st = st.copy(maxUs = sorted.last._1)
    st
  }

  /** The per-group automaton step: fold this batch's (sorted) events
    * into the carried state, emitting every completed match.
    *
    * PRECONDITION (in-order arrival across batches, ENFORCED): events
    * are sorted by event time only WITHIN each micro-batch; the DFA
    * requires micro-batches themselves to arrive in event-time order
    * (as q_stream_sessions also requires of its source). The state
    * carries the highest folded event time (maxUs); a batch delivering
    * an event BELOW it would be folded at the wrong position and
    * silently diverge from the batch oracle, so it now throws
    * IllegalStateException naming the key and both times — fail loud,
    * never drift. For sources that genuinely reorder across batches,
    * use [[matchesReordered]] (watermark + reorder buffer) instead. */
  def matchFunnel(
      userId: Long,
      events: Iterator[PEvent],
      state: GroupState[FunnelState]): Iterator[MatchOut] = {
    val sorted = events.map(e => (micros(e.ts), e.event_id, e.event_type))
      .toArray.sortBy(e => (e._1, e._2))
    val st0 = state.getOption.getOrElse(FunnelState(0, 0L, 0L, 0L, 0L, Long.MinValue))
    if (sorted.nonEmpty && sorted.head._1 < st0.maxUs)
      throw new IllegalStateException(
        s"PatternMatch in-order precondition violated for user $userId: " +
        s"event ${sorted.head._2} at t=${ts(sorted.head._1)} arrived after " +
        s"the DFA already folded t=${ts(st0.maxUs)}; use matchesReordered " +
        "(watermark + reorder buffer) for out-of-order sources")
    val out = scala.collection.mutable.ListBuffer.empty[MatchOut]
    state.update(fold(userId, sorted, st0, out))
    out.iterator
  }

  /** Reorder-buffer variant: events are parked per key until the
    * event-time watermark passes them, then folded in exact
    * (event-time, event_id) order — so the match set equals the batch
    * oracle for ANY cross-batch arrival order, as long as disorder is
    * bounded by the watermark delay (the standard watermark contract;
    * an event arriving with time below the already-folded horizon is
    * beyond-delay-late and is dropped, exactly as a windowed
    * aggregation would drop it).
    *
    * Flushing uses EventTimeTimeout: buffered events for a key that
    * receives no further data still emit once the watermark passes
    * them — the timeout re-invokes the function with an empty iterator.
    *
    * Scale: state per key is the DFA struct + a buffer bounded by
    * (watermark delay × per-key event rate), the same bound every
    * watermarked stateful op carries; no global sort, no shuffle beyond
    * the groupByKey exchange. */
  def matchFunnelReordered(
      userId: Long,
      events: Iterator[PEvent],
      state: GroupState[ReorderState]): Iterator[MatchOut] = {
    // In a batch query the watermark never advances (and may be absent):
    // everything is "ripe" — one fold in full event-time order, which is
    // exactly the oracle semantics.
    val wmUs =
      try {
        val wm = state.getCurrentWatermarkMs()
        if (wm <= 0L) { if (state.hasTimedOut) Long.MaxValue else Long.MinValue }
        else wm * 1000L
      } catch { case _: UnsupportedOperationException => Long.MaxValue }
    val st0 = state.getOption.getOrElse(
      ReorderState(FunnelState(0, 0L, 0L, 0L, 0L, Long.MinValue), Array.empty))
    val incoming = events.map(e => Pending(micros(e.ts), e.event_id, e.event_type))
    // beyond-delay-late events (at or below the folded horizon) are
    // dropped — the watermark contract. The bound is STRICT: an event at
    // exactly the folded horizon would otherwise fold AFTER same-timestamp
    // events already in the DFA, violating the (ts, event_id) tie order
    // the batch oracle folds in, so equal-timestamp late arrivals count
    // as beyond-delay-late too.
    val merged = (st0.pending.iterator ++ incoming)
      .filter(_.us > st0.dfa.maxUs).toArray
    val (ripe, hold) = merged.partition(_.us <= wmUs)
    val out = scala.collection.mutable.ListBuffer.empty[MatchOut]
    val dfa = fold(userId,
      ripe.map(p => (p.us, p.id, p.typ)).sortBy(p => (p._1, p._2)), st0.dfa, out)
    state.update(ReorderState(dfa, hold))
    if (hold.nonEmpty && wmUs != Long.MaxValue) {
      // wake this key when the watermark reaches the oldest held event
      // (ceil to ms; must exceed the current watermark, which it does by
      // construction: hold.us > wmUs)
      state.setTimeoutTimestamp(hold.iterator.map(_.us).min / 1000L + 1L)
    }
    out.iterator
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

  /** Wire the reorder-buffer automaton: applies the watermark itself
    * (streaming only — batch has no watermark and folds everything in
    * one pass). `delay` must bound the cross-batch disorder. */
  def matchesReordered(events: DataFrame, delay: String): Dataset[MatchOut] = {
    val s = events.sparkSession
    import s.implicits._
    val src = events.select(
      col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val wm = if (src.isStreaming) src.withWatermark("ts", delay) else src
    wm.as[PEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        matchFunnelReordered)
  }
}
