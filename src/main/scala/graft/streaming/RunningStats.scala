package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** `transformWithState` (Spark 4's arbitrary-state operator v2, SPARK-46815)
  * — the modern replacement for `mapGroupsWithState`: typed per-key state
  * handles (value/list/map), optional per-state TTL, and timers, backed by
  * the RocksDB state store. Used here for per-user RUNNING event stats — the
  * streaming counterpart of a grouped aggregate whose full history can never
  * be replayed at 100 TB/day: state is one tiny row per user, sharded by the
  * groupByKey shuffle across the cluster, checkpointed incrementally
  * (RocksDB changelog), and emitted as an UPDATE row per key per trigger.
  *
  * `StatefulSessionSpec`'s sibling (`RunningStatsSpec`) asserts parity with
  * the batch groupBy aggregate over the same fixture.
  */
object RunningStats {

  final case class Ev(user_id: Long, event_type: String, value: Double)
  final case class Stat(user_id: Long, n_events: Long, n_purchases: Long, total_value: Double)
  // PUBLIC on purpose: a private case class used in a state encoder fails
  // Janino codegen ("Private member cannot be accessed") and silently runs
  // on the interpreted-encoder fallback — 12 logged codegen failures per
  // suite run and slower state serialization (see NOTES.md gotcha).
  final case class St(n: Long, np: Long, total: Double)

  /** ValueState processor: fold the trigger's rows for a key into the
    * persisted running stat, emit the updated row. TTL is NONE here; a
    * production pipeline would pass e.g. 30 days so dormant users' state
    * self-evicts (the TTL is enforced by the state store, not user code). */
  class Proc extends StatefulProcessor[Long, Ev, Stat] {
    @transient private var st: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[St]("stats", Encoders.product[St], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], tv: TimerValues): Iterator[Stat] = {
      val prev = if (st.exists()) st.get() else St(0L, 0L, 0.0)
      val next = rows.foldLeft(prev) { (s, e) =>
        St(s.n + 1L, s.np + (if (e.event_type == "purchase") 1L else 0L),
          s.total + e.value)
      }
      st.update(next)
      Iterator.single(Stat(key, next.n, next.np, next.total))
    }
  }

  /** Per-user running stats: one emitted row per touched key per trigger
    * (the key's NEW running total). Declared Append so it composes with
    * every recoverable sink (files, Kafka); the emission behavior is the
    * processor's — downstream takes max(n) per key for "latest". Works
    * identically over a streaming or batch `Dataset[Ev]` (batch = single
    * trigger, empty initial state). */
  def perUserStats(ev: Dataset[Ev]): Dataset[Stat] = {
    implicit val statEnc: Encoder[Stat] = Encoders.product[Stat]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Append())
  }
}
