package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate (Bench.regressions / Bench.readPrior): a
  * query is flagged iff it is BOTH above the absolute noise floor and
  * above the ratio vs its prior best — so sub-second jitter and brand-new
  * queries never flag, while a real plan regression on a standing query
  * cannot hide inside a round-over-round total. */
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
    assert(r("a") === ((1.0, 3.5)))
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

  test("readPrior round-trips the artifact format and rejects garbage") {
    val dir = java.nio.file.Files.createTempDirectory("benchdiff")
    val p = dir.resolve("bench_full.json")
    java.nio.file.Files.writeString(p,
      """{"sf":"/root/testdata/sf0.1","cpus":"32","reps":2,"total_best":1.5,""" +
        """"pass_totals":[1.5],"pass_reruns":[2],"errors":[],""" +
        """"queries":{"q1":0.5,"q2":1.0}}""")
    val Some((sf, qs)) = Bench.readPrior(p)
    assert(sf === "/root/testdata/sf0.1")
    assert(qs === Map("q1" -> 0.5, "q2" -> 1.0))
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
