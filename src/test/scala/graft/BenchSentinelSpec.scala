package graft

import org.scalatest.funsuite.AnyFunSuite

/** The noise-floor sentinel's pure window mapping (r16 verdict item 1):
  * each measured query gets the worst sentinel/floor ratio of the two
  * sentinel readings bracketing it, so compare_baseline.py can tell a
  * contended window from a real regression.
  */
class BenchSentinelSpec extends AnyFunSuite {

  test("quiet run: every ratio is ~1") {
    // sentinels before queries 0, 2, 4 and trailing at 6; flat series
    val r = Bench.noiseRatios(6, Seq(0, 2, 4, 6), Seq(0.1, 0.1, 0.1, 0.1))
    assert(r.length == 6)
    assert(r.forall(_ == 1.0))
  }

  test("one loaded window flags exactly the queries it brackets") {
    // sentinel readings: quiet, quiet, LOADED (before query 4), quiet.
    // Queries 2-3 sit between readings 1 and 2 → their 'after' bracket is
    // loaded; queries 4-5 sit between readings 2 and 3 → their 'before'
    // bracket is loaded. Queries 0-1 are bracketed by quiet readings only.
    val r = Bench.noiseRatios(6, Seq(0, 2, 4, 6), Seq(0.1, 0.1, 0.5, 0.1))
    assert(r(0) == 1.0 && r(1) == 1.0)
    assert(r(2) == 5.0 && r(3) == 5.0)
    assert(r(4) == 5.0 && r(5) == 5.0)
  }

  test("floor is the run's own minimum, not the first reading") {
    // first reading is itself inflated; the floor must come from the
    // quietest reading anywhere in the run
    val r = Bench.noiseRatios(4, Seq(0, 2, 4), Seq(0.4, 0.2, 0.2))
    assert(r(0) == 2.0 && r(1) == 2.0) // bracketed by 0.4 and 0.2
    assert(r(2) == 1.0 && r(3) == 1.0)
  }

  test("empty series or zero queries degrade to neutral ratios") {
    assert(Bench.noiseRatios(3, Seq.empty, Seq.empty) == Seq(1.0, 1.0, 1.0))
    assert(Bench.noiseRatios(0, Seq(0), Seq(0.1)) == Seq.empty)
  }

  test("ratios are rounded to 2 decimals") {
    val r = Bench.noiseRatios(1, Seq(0, 1), Seq(0.3, 0.1))
    assert(r == Seq(3.0))
    val r2 = Bench.noiseRatios(1, Seq(0, 1), Seq(0.123456, 0.1))
    assert(r2 == Seq(1.23))
  }
}
