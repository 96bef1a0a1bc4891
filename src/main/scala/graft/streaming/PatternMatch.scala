package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CEP pattern matcher via flatMapGroupsWithState: detect an
  * ORDERED EVENT-TYPE SEQUENCE (any length-k pattern, e.g. the classic
  * view → click → purchase funnel, or signup → view → click → purchase)
  * per user, greedy and non-overlapping (after a complete match the
  * automaton restarts), with O(k) state per user — the
  * complex-event-processing operator the stream family was missing next
  * to sessionization. The pattern is a PARAMETER ([[matchesK]] /
  * [[matchesReorderedK]]); the 3-step funnel entry points
  * ([[matches]] / [[matchesReordered]]) are the k = 3 instance kept for
  * their flat (t_view, t_click, t_purchase) schema.
  *
  * Determinism: events are processed in (event-time, event_id) order
  * (ties broken by id), and the automaton is a (k+1)-state DFA, so the
  * match set is a pure function of the event sequence. The batch-SQL
  * oracle replays it through the COMPLETE-CHAIN equivalence: for a
  * step-0 event e₀ let e₁ be the first pattern(1) event after e₀, e₂
  * the first pattern(2) event after e₁, …; the automaton's matches are
  * exactly the chain s₁ = first step-0 event, sₙ₊₁ = first step-0 event
  * after chain(sₙ)'s end — because if the first step-0 event after a
  * cursor has an incomplete chain, NO later step-0 event can complete
  * one (its first-following windows are subsets, step by step by
  * induction), so both formulations stop together. This argument is
  * k-free, which is what lets one recursive-CTE generator
  * ([[graft.analytics.ExtendedQueries.chainOracleSql]]) serve every
  * pattern.
  *
  * Scale: state per key is one small struct (stage + k matched event
  * keys); in-batch sort is bounded by the per-user batch slice, not
  * stream length — the same contract as [[Sessionize]].
  */
object PatternMatch {

  final case class PEvent(
      user_id: Long, ts: java.sql.Timestamp, event_id: Long, event_type: String)
  /** Generalized DFA state: `stage` pattern steps are matched so far and
    * their (event-time, event-id) prefixes ride in `us`/`ids` (length =
    * stage). maxUs = highest event time already folded into the DFA —
    * the in-order guard: a later batch delivering an earlier event is a
    * precondition violation, detected loudly (see [[matchK]]). */
  final case class KState(
      stage: Int, us: Array[Long], ids: Array[Long], maxUs: Long)
  /** An event parked in the reorder buffer until the watermark passes it. */
  final case class Pending(us: Long, id: Long, typ: String)
  /** [[matchKReordered]] state: the DFA plus the reorder buffer. */
  final case class KReorderState(dfa: KState, pending: Array[Pending])
  /** A completed k-step match: per-step event ids and micros, in pattern
    * order. Queries project these to flat per-step columns. */
  final case class KMatchOut(
      user_id: Long, start_event_id: Long,
      step_ids: Seq[Long], step_us: Seq[Long])
  /** The k = 3 funnel projection kept for the original flat schema. */
  final case class MatchOut(
      user_id: Long, view_event_id: Long,
      t_view: java.sql.Timestamp, t_click: java.sql.Timestamp,
      t_purchase: java.sql.Timestamp, latency_sec: Long)

  /** The classic funnel, as the k = 3 instance of the general matcher. */
  val FunnelPattern: Seq[String] = Seq("view", "click", "purchase")

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def ts(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  private def emptyK: KState = KState(0, Array.empty, Array.empty, Long.MinValue)

  /** The DFA step shared by both entry points: fold one event-time-
    * sorted slice into the carried automaton, appending completed
    * matches to `out`. An event advances the DFA iff its type equals
    * the AWAITED pattern step; every other event (including a repeat of
    * an already-matched step type) is ignored — greedy keep-first, the
    * semantics the chain oracle replays. Returns the advanced state
    * (maxUs updated). */
  private def foldK(
      pattern: IndexedSeq[String],
      userId: Long,
      sorted: Array[(Long, Long, String)],
      st0: KState,
      out: scala.collection.mutable.ListBuffer[KMatchOut]): KState = {
    var st = st0
    sorted.foreach { case (us, id, et) =>
      if (et == pattern(st.stage)) {
        val nus = st.us :+ us
        val nids = st.ids :+ id
        if (st.stage == pattern.length - 1) {
          out += KMatchOut(userId, nids(0),
            nids.toIndexedSeq, nus.toIndexedSeq)
          st = KState(0, Array.empty, Array.empty, st.maxUs)
        } else st = KState(st.stage + 1, nus, nids, st.maxUs)
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
    * silently diverge from the batch oracle, so it throws
    * IllegalStateException naming the key and both times — fail loud,
    * never drift. For sources that genuinely reorder across batches,
    * use [[matchesReorderedK]] (watermark + reorder buffer) instead. */
  def matchK(pattern: IndexedSeq[String])(
      userId: Long,
      events: Iterator[PEvent],
      state: GroupState[KState]): Iterator[KMatchOut] = {
    val sorted = events.map(e => (micros(e.ts), e.event_id, e.event_type))
      .toArray.sortBy(e => (e._1, e._2))
    val st0 = state.getOption.getOrElse(emptyK)
    if (sorted.nonEmpty && sorted.head._1 < st0.maxUs)
      throw new IllegalStateException(
        s"PatternMatch in-order precondition violated for user $userId: " +
        s"event ${sorted.head._2} at t=${ts(sorted.head._1)} arrived after " +
        s"the DFA already folded t=${ts(st0.maxUs)}; use matchesReordered " +
        "(watermark + reorder buffer) for out-of-order sources")
    val out = scala.collection.mutable.ListBuffer.empty[KMatchOut]
    state.update(foldK(pattern, userId, sorted, st0, out))
    out.iterator
  }

  /** Reorder-buffer variant: events are parked per key until the
    * event-time watermark passes them, then folded in exact
    * (event-time, event_id) order — so the match set equals the batch
    * oracle for ANY cross-batch arrival order, as long as disorder is
    * bounded by the watermark delay (the standard watermark contract;
    * an event arriving with time at or below the already-folded horizon
    * is beyond-delay-late and is dropped, exactly as a windowed
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
  def matchKReordered(pattern: IndexedSeq[String])(
      userId: Long,
      events: Iterator[PEvent],
      state: GroupState[KReorderState]): Iterator[KMatchOut] = {
    // In a batch query the watermark never advances (and may be absent):
    // everything is "ripe" — one fold in full event-time order, which is
    // exactly the oracle semantics.
    val wmUs =
      try {
        val wm = state.getCurrentWatermarkMs()
        if (wm <= 0L) { if (state.hasTimedOut) Long.MaxValue else Long.MinValue }
        else wm * 1000L
      } catch { case _: UnsupportedOperationException => Long.MaxValue }
    val st0 = state.getOption.getOrElse(KReorderState(emptyK, Array.empty))
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
    val out = scala.collection.mutable.ListBuffer.empty[KMatchOut]
    val dfa = foldK(pattern, userId,
      ripe.map(p => (p.us, p.id, p.typ)).sortBy(p => (p._1, p._2)), st0.dfa, out)
    state.update(KReorderState(dfa, hold))
    if (hold.nonEmpty && wmUs != Long.MaxValue) {
      // wake this key when the watermark reaches the oldest held event
      // (ceil to ms; must exceed the current watermark, which it does by
      // construction: hold.us > wmUs)
      state.setTimeoutTimestamp(hold.iterator.map(_.us).min / 1000L + 1L)
    }
    out.iterator
  }

  /** Wire the automaton for an arbitrary ordered pattern over a
    * (streaming or batch) events frame. */
  def matchesK(events: DataFrame, pattern: Seq[String]): Dataset[KMatchOut] = {
    require(pattern.nonEmpty, "pattern must have at least one step")
    val s = events.sparkSession
    import s.implicits._
    val pat = pattern.toIndexedSeq
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[PEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        matchK(pat))
  }

  /** Wire the reorder-buffer automaton for an arbitrary ordered pattern:
    * applies the watermark itself (streaming only — batch has no
    * watermark and folds everything in one pass). `delay` must bound
    * the cross-batch disorder. */
  def matchesReorderedK(
      events: DataFrame, pattern: Seq[String], delay: String): Dataset[KMatchOut] = {
    require(pattern.nonEmpty, "pattern must have at least one step")
    val s = events.sparkSession
    import s.implicits._
    val pat = pattern.toIndexedSeq
    val src = events.select(
      col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val wm = if (src.isStreaming) src.withWatermark("ts", delay) else src
    wm.as[PEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        matchKReordered(pat))
  }

  private def toFunnelOut(k: KMatchOut): MatchOut =
    MatchOut(k.user_id, k.step_ids(0),
      ts(k.step_us(0)), ts(k.step_us(1)), ts(k.step_us(2)),
      (k.step_us(2) - k.step_us(0)) / 1000000L)

  /** The classic 3-step funnel over a (streaming or batch) events frame
    * — [[matchesK]] with [[FunnelPattern]], projected to the flat
    * (t_view, t_click, t_purchase, latency_sec) schema. */
  def matches(events: DataFrame): Dataset[MatchOut] = {
    val s = events.sparkSession
    import s.implicits._
    matchesK(events, FunnelPattern).map(toFunnelOut)
  }

  /** The classic 3-step funnel through the reorder buffer — see
    * [[matchesReorderedK]]. */
  def matchesReordered(events: DataFrame, delay: String): Dataset[MatchOut] = {
    val s = events.sparkSession
    import s.implicits._
    matchesReorderedK(events, FunnelPattern, delay).map(toFunnelOut)
  }
}
