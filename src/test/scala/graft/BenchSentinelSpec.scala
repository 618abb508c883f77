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

  test("windowMaxes returns raw bracket seconds, 0.0 when unbracketed") {
    // the healing pass decides re-queues from these raw windows against
    // the ABSOLUTE anchor, so they must be seconds, not ratios
    val w = Bench.windowMaxes(4, Seq(2, 4), Seq(0.5, 0.1))
    assert(w == Seq(0.5, 0.5, 0.5, 0.5)) // 0-1: right bracket only; 2-3: both
    // a one-sided bracket still reads: query 1 carries its left reading
    val w2 = Bench.windowMaxes(2, Seq(0), Seq(0.2))
    assert(w2 == Seq(0.2, 0.2))
    // truly unbracketed (no readings at all) degrades to 0.0
    assert(Bench.windowMaxes(2, Seq.empty, Seq.empty) == Seq(0.0, 0.0))
  }

  test("windowMins needs BOTH brackets hot before a window reads hot") {
    // r19 calibration: the window re-queue trigger reads the BEST of the
    // two bracketing readings, so one GC-spiked sentinel (0.5) cannot
    // flag the ten queries in its two adjacent windows — only a burst
    // inflating both brackets does
    val m = Bench.windowMins(4, Seq(2, 4), Seq(0.5, 0.1))
    assert(m == Seq(0.5, 0.5, 0.1, 0.1)) // 0-1 one-sided; 2-3 min(0.5,0.1)
    val hot = Bench.windowMins(2, Seq(0, 2), Seq(0.4, 0.5))
    assert(hot == Seq(0.4, 0.4)) // sustained: both brackets hot → reads hot
    assert(Bench.windowMins(2, Seq.empty, Seq.empty) == Seq(0.0, 0.0))
  }

  test("standing rows parse per query, last occurrence wins") {
    val md = """
      || q1_agg | 1.00 | sec | 0.1 |
      || dedup_exact | 0.50 | sec | 0.1 |
      || q1_agg | 0.80 | sec | 0.1 |
      || not_sf01 | 3.00 | sec | 0.01 |
      |""".stripMargin
    val rows = Bench.parseStanding(md)
    assert(rows == Map("q1_agg" -> 0.80, "dedup_exact" -> 0.50))
  }

  test("anchor parses the LAST sentinel_floor row in a baseline table") {
    val md = """
      |# BASELINE
      || q1 | 1.00 | sec | 0.1 |
      || sentinel_floor | 0.046 | sec | 0.1 |
      |some text
      || sentinel_floor | 0.052 | sec | 0.1 |
      |""".stripMargin
    assert(Bench.parseAnchor(md).contains(0.052)) // later re-base wins
    assert(Bench.parseAnchor("# no table here").isEmpty)
  }
}
