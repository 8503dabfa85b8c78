package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Event-time TIMER sessionization via `transformWithState` — the shape
  * `session_window` cannot express: a session is emitted exactly once, as a
  * single closed record, when the watermark proves no more events can join
  * it (vs session_window's per-trigger re-aggregation, or
  * flatMapGroupsWithState's hand-rolled timeout bookkeeping).
  *
  * Per key the processor keeps one open session (ValueState) and one
  * registered event-time timer at `last_event + gap`. Each new event
  * extends the session and REPLACES the timer (delete + re-register);
  * when the watermark passes the timer, `handleExpiredTimer` fires once,
  * emits the closed session, and clears all state. State per user is O(1)
  * and self-evicting — the 100 TB/day shape.
  */
object TimerSessions {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp)
  final case class Closed(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)
  /** Open-session state (public: the state encoder's generated code
    * instantiates it from outside this object). */
  final case class Open(start: Long, last: Long, n: Long)

  class Proc(gapMs: Long) extends StatefulProcessor[Long, Ev, Closed] {
    @transient private var open: ValueState[Open] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[Open]("open", Encoders.product[Open], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], tv: TimerValues): Iterator[Closed] = {
      val times = rows.map(_.ts.getTime).toArray.sorted
      val prev = if (open.exists()) Some(open.get()) else None
      val (st, closedSpans) = foldTimes(prev, times, gapMs)
      // One live timer per key: replace the old deadline with the new one.
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(st.last + gapMs)
      open.update(st)
      closedSpans.map(p => Closed(key, p.start, p.last, p.n)).iterator
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues, info: ExpiredTimerInfo): Iterator[Closed] = {
      val result =
        if (open.exists()) {
          val st = open.get()
          // A newer event may have re-registered a later timer; only close
          // if this expiry still matches the session's deadline.
          if (st.last + gapMs <= info.getExpiryTimeInMs) {
            open.clear()
            Iterator.single(Closed(key, st.start, st.last, st.n))
          } else Iterator.empty
        } else Iterator.empty
      result
    }
  }

  /** One trigger's fold, pure (property-tested in `TimerFoldSpec`): merge a
    * sorted batch of event times into the (optional) open session; return
    * the new open session plus the sessions closed INSIDE the trigger.
    *
    * Semantics: events straddling a gap within one trigger close
    * internally. A late-but-within-watermark event (t ≤ open.last from a
    * LATER trigger) extends the open session monotonically — never lowers
    * `last` (that would shrink the timer deadline and close the session
    * early, possibly with end < start). A late event a FULL gap before the
    * open session's start can never belong to it: it accretes into a
    * separate pre-session (merged across consecutive such events within
    * the trigger, and merged INTO the open session if an absorbed event
    * bridges them), closed at trigger end — its gap to the open session
    * has already elapsed in event time. Under in-order-across-triggers
    * delivery this fold reproduces batch gap-sessionization exactly; the
    * pre-session path is the best O(1)-state approximation for
    * cross-trigger disorder (exact merging would require buffering every
    * event until the watermark). */
  private[streaming] def foldTimes(
      prev: Option[Open], times: Array[Long], gapMs: Long): (Open, Seq[Open]) = {
    require(times.nonEmpty || prev.nonEmpty,
      "foldTimes needs at least one event or an existing open session")
    var st = prev.getOrElse(Open(times.head, times.head, 0L))
    val out = Seq.newBuilder[Open]
    var pre: Option[Open] = None
    // Fold `pre` into `s` if an absorbed event bridged the gap between
    // them; otherwise `s` stands alone. Applied both when the open session
    // closes mid-trigger and at the trigger-end flush (same rule, so a
    // mid-trigger close can't emit a session its pre-session belongs to).
    def mergedWithPre(s: Open): Open = pre match {
      case Some(p) if s.start - p.last < gapMs =>
        pre = None
        Open(math.min(p.start, s.start), s.last, s.n + p.n)
      case _ => s
    }
    times.foreach { t =>
      if (st.n == 0L) {
        st = Open(t, t, 1L)
      } else if (st.start - t >= gapMs) {
        pre = pre match {
          case Some(p) if t - p.last >= gapMs =>
            out += p
            Some(Open(t, t, 1L))
          case Some(p) =>
            Some(Open(p.start, math.max(p.last, t), p.n + 1L))
          case None => Some(Open(t, t, 1L))
        }
      } else if (t - st.last >= gapMs) {
        out += mergedWithPre(st)
        st = Open(t, t, 1L)
      } else {
        st = Open(math.min(st.start, t), math.max(st.last, t), st.n + 1L)
      }
    }
    st = if (st.n > 0L) mergedWithPre(st) else st
    pre.foreach(out += _)
    (st, out.result())
  }

  /** Closed sessions (30-min default gap) as an append stream. `ev` must
    * carry a watermark on `ts` — event-time timers fire off it. */
  def closedSessions(ev: Dataset[Ev], gapMinutes: Long = 30): Dataset[Closed] = {
    implicit val enc: Encoder[Closed] = Encoders.product[Closed]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Proc(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
