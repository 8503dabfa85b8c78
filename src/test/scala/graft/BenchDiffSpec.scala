package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate (Bench.regressions / Bench.readPrior): a
  * query is flagged iff it is BOTH above the absolute noise floor and
  * above the ratio vs its prior best — AFTER the cross-round calibration
  * normalization (now × prior_cal/this_cal) divides out machine speed —
  * so sub-second jitter, brand-new queries, and a uniformly slow VM never
  * flag, while a real plan regression on a standing query cannot hide
  * inside a round-over-round total (or behind a fast VM). */
class BenchDiffSpec extends AnyFunSuite {

  test("flags only above-floor, above-ratio queries") {
    val prior = Map("a" -> 1.0, "b" -> 0.1, "c" -> 2.0, "d" -> 5.0)
    val now = Map(
      "a" -> 3.5,  // 3.5x prior, above floor -> flag
      "b" -> 0.4,  // 4x prior but under the 0.5s floor -> no flag
      "c" -> 5.9,  // 2.95x prior -> no flag (under ratio)
      "d" -> 4.0,  // faster -> no flag
      "e" -> 9.0)  // new query, no prior -> no flag
    val r = Bench.regressions(prior, now)
    assert(r.keySet === Set("a"))
    assert(r("a") === ((1.0, 3.5, 3.5)))
  }

  test("boundary: exactly ratio x prior or exactly the floor does not flag") {
    val prior = Map("a" -> 1.0, "b" -> 0.05)
    // a: exactly 3.0x -> strict > required; b: 10x prior but == floor.
    val r = Bench.regressions(prior, Map("a" -> 3.0, "b" -> 0.5))
    assert(r.isEmpty)
  }

  test("empty prior flags nothing") {
    assert(Bench.regressions(Map.empty, Map("a" -> 100.0)).isEmpty)
  }

  test("calibration normalization: a slow VM cannot manufacture a fake " +
    "regression, a fast VM cannot mask a real one") {
    val prior = Map("a" -> 1.0, "b" -> 1.0)
    // VM is 2x slower (calRatio = prior_cal/this_cal = 0.5): a ran 4x
    // raw — only 2x normalized, machine noise, no flag.
    assert(Bench.regressions(prior, Map("a" -> 4.0), calRatio = 0.5).isEmpty)
    // VM is 2x faster (calRatio = 2.0): b ran 2x raw — but 4x
    // normalized: a real regression the fast machine was hiding.
    val r = Bench.regressions(prior, Map("b" -> 2.0), calRatio = 2.0)
    assert(r.keySet === Set("b"))
    assert(r("b") === ((1.0, 2.0, 4.0)))
    // The floor applies to the NORMALIZED time too: 0.3s raw on a 2x
    // fast VM is 0.6s normalized -> above floor, flags at 3x+.
    val r2 = Bench.regressions(Map("c" -> 0.1), Map("c" -> 0.3), calRatio = 2.0)
    assert(r2.keySet === Set("c"))
  }

  test("readPrior round-trips the artifact format and rejects garbage") {
    val dir = java.nio.file.Files.createTempDirectory("benchdiff")
    val p = dir.resolve("bench_full.json")
    java.nio.file.Files.writeString(p,
      """{"sf":"/root/testdata/sf0.1","cpus":"32","reps":2,"total_best":1.5,""" +
        """"pass_totals":[1.5],"pass_reruns":[2],"errors":[],""" +
        """"queries":{"q1":0.5,"q2":1.0}}""")
    val Some((sf, qs, cal)) = Bench.readPrior(p)
    assert(sf === "/root/testdata/sf0.1")
    assert(qs === Map("q1" -> 0.5, "q2" -> 1.0))
    // Pre-calibration record: no block -> None (gate falls back to raw).
    assert(cal.isEmpty)
    // A record WITH a calibration block surfaces its total.
    java.nio.file.Files.writeString(p,
      """{"sf":"sf","queries":{"q1":1.0},""" +
        """"calibration":{"queries":{"q1":1.0},"total":13.25}}""")
    assert(Bench.readPrior(p).flatMap(_._3) === Some(13.25))
    // A NULL calibration (errored run, the ADVICE guard) -> None.
    java.nio.file.Files.writeString(p,
      """{"sf":"sf","queries":{"q1":1.0},""" +
        """"calibration":{"total":null,"reason":"errored: q1"}}""")
    assert(Bench.readPrior(p).flatMap(_._3).isEmpty)
    // Absent and corrupt files degrade to None, never throw.
    assert(Bench.readPrior(dir.resolve("nope.json")).isEmpty)
    java.nio.file.Files.writeString(p, "{not json")
    assert(Bench.readPrior(p).isEmpty)
  }

  test("calibration set: every pinned query exists in the registry " +
    "(a rename must re-pin the set, not silently shrink its total)") {
    val missing = Bench.CalibrationSet.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"re-pin Bench.CalibrationSet: $missing")
  }
}
