package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming Markov transitions (q155's streaming twin): the per-user
  * (previous event → this event) edge feed, maintained incrementally with
  * `transformWithState`. The ONLY state is each user's last event — a
  * single tiny row per key, sharded by the groupByKey shuffle and
  * checkpointed incrementally — which is exactly what makes this run
  * forever at 100 TB/day where the batch lag-window would re-sort the full
  * history every run. Transitions emit in the trigger that completes them;
  * the session-entry rule ('<start>' when the gap ≥ 30 min) matches the
  * batch kernel at MICROSECOND precision — comparing floor-seconds would
  * misclassify gaps in [1800 s, 1801 s).
  *
  * Contract: per-user event-time order ACROSS triggers (time-split
  * batches — the q114 staging); within a trigger rows arrive unordered and
  * are sorted by (micros, event_id), the batch kernel's exact tie order.
  */
object TransitionStream {

  final case class Ev(user_id: Long, micros: Long, event_id: Long, event_type: String)
  final case class Trans(user_id: Long, from_type: String, to_type: String)
  // PUBLIC: private state case classes fail Janino codegen (NOTES.md gotcha).
  final case class LastEv(micros: Long, event_id: Long, typ: String)

  private val GapMicros = 30L * 60 * 1000000

  class Proc extends StatefulProcessor[Long, Ev, Trans] {
    @transient private var last: ValueState[LastEv] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // TTL NONE for the bounded gates; production passes e.g. 30 days so
      // dormant users' last-event state self-evicts in the store.
      last = getHandle.getValueState[LastEv]("last", Encoders.product[LastEv],
        TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], tv: TimerValues): Iterator[Trans] = {
      val sorted = rows.toArray.sortBy(e => (e.micros, e.event_id))
      var prev: LastEv = if (last.exists()) last.get() else null
      val out = Seq.newBuilder[Trans]
      sorted.foreach { e =>
        val from =
          if (prev == null || e.micros >= prev.micros + GapMicros) "<start>"
          else prev.typ
        out += Trans(key, from, e.event_type)
        prev = LastEv(e.micros, e.event_id, e.event_type)
      }
      if (prev != null) last.update(prev)
      out.result().iterator
    }
  }

  /** The transition edge stream; one output row per input event. */
  def transitions(ev: Dataset[Ev]): Dataset[Trans] = {
    implicit val enc: Encoder[Trans] = Encoders.product[Trans]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Append())
  }
}
