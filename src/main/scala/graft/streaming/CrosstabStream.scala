package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming contingency table via MapState — per-user running counts BY
  * EVENT TYPE, the third state-shape of the transformWithState trio
  * (ValueState: RunningStats/TransitionStream; timers: TimerSessions;
  * MapState: here). The map key is the event type, so a user's state
  * grows with their distinct types (≤ the type vocabulary), not their
  * event count — and the store updates only the types a trigger touched,
  * which is the reason to prefer MapState over a ValueState holding a
  * whole Map (that would rewrite every key on every update).
  *
  * Emission: one (user, type, runningCount) row per TOUCHED type per
  * trigger — monotone, so the latest value per key is max(n), the same
  * read-back contract as RunningStats. */
object CrosstabStream {

  final case class Ev(user_id: Long, event_type: String)
  final case class Cell(user_id: Long, event_type: String, n: Long)

  class Proc extends StatefulProcessor[Long, Ev, Cell] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], tv: TimerValues): Iterator[Cell] = {
      val touched = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach { e =>
        val cur = touched.getOrElse(e.event_type,
          if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L)
        touched.update(e.event_type, cur + 1L)
      }
      touched.foreach { case (t, n) => counts.updateValue(t, n) }
      touched.iterator.map { case (t, n) => Cell(key, t, n) }
    }
  }

  def crosstab(ev: Dataset[Ev]): Dataset[Cell] = {
    implicit val enc: Encoder[Cell] = Encoders.product[Cell]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Append())
  }
}
