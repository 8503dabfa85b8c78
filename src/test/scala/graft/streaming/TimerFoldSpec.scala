package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Property test for the per-trigger session fold: under in-order-across-
  * triggers delivery (any split of the sorted event sequence into trigger
  * batches, any disorder WITHIN a batch), folding trigger by trigger and
  * closing the final open session reproduces batch gap-sessionization
  * exactly — for every split. This is the exact-parity guarantee the
  * Scaladoc states; the cross-trigger-disorder approximation (pre-
  * sessions) is covered by the adversarial cases in TimerSessionsSpec. */
class TimerFoldSpec extends AnyFunSuite {

  private val Gap = 30L * 60000

  private def batchSessions(times: Seq[Long]): Seq[(Long, Long, Long)] =
    times.sorted.foldLeft(Vector.empty[(Long, Long, Long)]) { (acc, t) =>
      acc.lastOption match {
        case Some((s, l, n)) if t - l < Gap => acc.init :+ ((s, t, n + 1))
        case _ => acc :+ ((t, t, 1L))
      }
    }

  private def streamSessions(chunks: Seq[Seq[Long]]): Seq[(Long, Long, Long)] = {
    var open: Option[TimerSessions.Open] = None
    val closed = Seq.newBuilder[TimerSessions.Open]
    chunks.filter(_.nonEmpty).foreach { chunk =>
      val (st, cs) = TimerSessions.foldTimes(open, chunk.toArray.sorted, Gap)
      closed ++= cs
      open = Some(st)
    }
    (closed.result() ++ open.filter(_.n > 0)).map(o => (o.start, o.last, o.n))
  }

  test("any trigger split of an in-order event sequence matches batch sessionization") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 200) {
      // A random event-time sequence: bursts separated by random gaps,
      // deliberately straddling the 30-min boundary in both directions.
      var t = 0L
      val times = Seq.fill(1 + rnd.nextInt(40)) {
        t += (if (rnd.nextBoolean()) rnd.nextInt(10 * 60000).toLong
              else (20 + rnd.nextInt(30)).toLong * 60000)
        t
      }
      val sorted = times.sorted
      // Random split into 1..6 trigger batches, order preserved across
      // batches, shuffled within each batch (the fold sorts per trigger).
      val nCuts = rnd.nextInt(5)
      val cuts = Seq.fill(nCuts)(rnd.nextInt(sorted.size + 1)).sorted
      val bounds = (0 +: cuts :+ sorted.size).distinct
      val chunks = bounds.zip(bounds.tail).map { case (a, b) =>
        rnd.shuffle(sorted.slice(a, b))
      }
      val want = batchSessions(times).sortBy(_._1)
      val got = streamSessions(chunks).sortBy(_._1)
      assert(got === want,
        s"trial $trial diverged for chunks=${chunks.map(_.size)}")
    }
  }

  test("mid-trigger close merges a bridged pre-session before emitting") {
    // Open session (100,110); one trigger delivers [65, 90, 200] (minutes).
    // 65 forms a pre-session, 90 is absorbed and lowers the open start to
    // 90 — which bridges the pre-session (90-65 < 30) — then 200 gap-closes
    // the open session. Batch sessionization gives (65,110,4); the close
    // must not emit (90,110,3) and strand (65,65,1).
    def m(x: Long) = x * 60000
    val (st, closed) = TimerSessions.foldTimes(
      Some(TimerSessions.Open(m(100), m(110), 2L)),
      Array(m(65), m(90), m(200)), Gap)
    assert(closed === Seq(TimerSessions.Open(m(65), m(110), 4L)))
    assert(st === TimerSessions.Open(m(200), m(200), 1L))
  }

  test("empty batch with no prior state is rejected, with prior state is a no-op") {
    assertThrows[IllegalArgumentException] {
      TimerSessions.foldTimes(None, Array.empty[Long], Gap)
    }
    val open = TimerSessions.Open(1000L, 2000L, 3L)
    assert(TimerSessions.foldTimes(Some(open), Array.empty[Long], Gap) ===
      ((open, Seq.empty)))
  }

  test("duplicate timestamps and single-event sessions fold correctly") {
    val base = 1000L * 60000
    val times = Seq(base, base, base + Gap, base + Gap, base + 3 * Gap)
    val want = batchSessions(times).sortBy(_._1)
    for (split <- 0 to times.size) {
      val chunks = Seq(times.take(split), times.drop(split))
      assert(streamSessions(chunks).sortBy(_._1) === want, s"split=$split")
    }
  }
}
