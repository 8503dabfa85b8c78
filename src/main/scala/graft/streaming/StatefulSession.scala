package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state fallback SURVEY §2.8 reserves for when `session_window`
  * can't express the semantics (e.g. per-session derived metrics, session
  * caps, custom emission). Works on batch Datasets (state starts empty, one
  * invocation per key) and under Structured Streaming (state persists across
  * triggers; ProcessingTimeTimeout would evict idle users).
  *
  * The oracle-gated `ops.Events.q22Sessionize` (session_window) is the
  * reference semantics; `StatefulSessionSpec` asserts this implementation
  * agrees with it.
  */
object StatefulSession {

  final case class Ev(user_id: Long, ts_us: Long)
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)
  final case class SessState(lastTs: Long, start: Long, n: Long, done: List[Session])

  /** Gap-based sessions per user. Events need not arrive sorted — each
    * (batch-)group is sorted once; in streaming, out-of-order data within
    * the watermark is handled by the engine's group buffering per trigger. */
  def sessionize(ev: Dataset[Ev], gapMinutes: Long): Dataset[Session] = {
    val spark = ev.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user: Long, events: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = events.map(_.ts_us).toArray.sorted
          val init = state.getOption.getOrElse(SessState(Long.MinValue, Long.MinValue, 0L, Nil))
          val fin = sorted.foldLeft(init) { (st, ts) =>
            if (st.n == 0L) SessState(ts, ts, 1L, st.done)
            else if (ts - st.lastTs >= gapUs)
              SessState(ts, ts, 1L,
                Session(user, st.start, st.lastTs, st.n) :: st.done)
            else SessState(ts, st.start, st.n + 1L, st.done)
          }
          // batch mode: no further triggers — flush the open session too
          val all =
            if (fin.n > 0L) Session(user, fin.start, fin.lastTs, fin.n) :: fin.done
            else fin.done
          state.update(fin.copy(done = Nil))
          all.reverse.iterator
      }
  }
}
