package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Last-N event buffer via ListState — the fourth and final state shape
  * (ValueState, MapState, timers, ListState): each user's most recent 5
  * event ids, maintained as an appendable list the store trims on write.
  * The production use is the "recent activity" panel / fraud-velocity
  * feature vector: state is O(N) per user regardless of history length,
  * and ListState appends avoid rewriting the whole buffer when a trigger
  * only adds a few events.
  *
  * Contract: per-user (ts, event_id) order across triggers (time-split
  * staging); within a trigger rows sort before appending. Emission per
  * touched user per trigger: (user, running count, csv of the last ≤5
  * ids) — monotone in the count, so read-back keeps the max-count row. */
object RecentBuffer {

  final case class Ev(user_id: Long, micros: Long, event_id: Long)
  final case class Recent(user_id: Long, n_seen: Long, last5: String)
  final case class Slot(micros: Long, event_id: Long)

  private val N = 5

  class Proc extends StatefulProcessor[Long, Ev, Recent] {
    @transient private var buf: ListState[Slot] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[Slot]("buf", Encoders.product[Slot],
        TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], tv: TimerValues): Iterator[Recent] = {
      val incoming = rows.toArray.sortBy(e => (e.micros, e.event_id))
      val merged = (buf.get().toArray ++
        incoming.map(e => Slot(e.micros, e.event_id)))
        .takeRight(N)
      buf.clear()
      merged.foreach(buf.appendValue)
      val n = (if (seen.exists()) seen.get() else 0L) + incoming.length
      seen.update(n)
      Iterator.single(Recent(key, n, merged.map(_.event_id).mkString(",")))
    }
  }

  def recent(ev: Dataset[Ev]): Dataset[Recent] = {
    implicit val enc: Encoder[Recent] = Encoders.product[Recent]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Append())
  }
}
