package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps

class EventOpsSpec extends AnyFunSuite {

  test("top-percent keeps exactly ceil(n*pct/100) per type, ties by id") {
    val s = Spec.spark
    import s.implicits._
    // 10 "a" events (K = ceil(10/100) = 1) and 250 "b" (K = 3); two "a"
    // rows tie at the max value — the smaller event_id must win
    val ev = ((1L to 10L).map(i =>
        (i, "a", if (i <= 2) 9.9 else i.toDouble / 10)) ++
      (11L to 260L).map(i => (i, "b", i.toDouble)))
      .toDF("event_id", "event_type", "value")
    val got = graft.operators.EventOps.topPercentByValue(ev, pct = 1)
      .select("event_type", "event_id").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("b", 260L), ("b", 259L), ("b", 258L)))
  }
  test("anomaly MAD matches an in-memory median/MAD model, odd and even n") {
    val s = Spec.spark
    import s.implicits._
    // type "a": 9 values (odd n) with one wild outlier; type "b": 10
    // values (even n — median interpolates the middle two) all calm
    val aVals = Seq(1.0, 1.1, 0.9, 1.2, 1.0, 1.05, 0.95, 1.1, 100.0)
    val bVals = (1 to 10).map(i => 5.0 + i * 0.01)
    val ev = (aVals.zipWithIndex.map { case (v, i) => (i.toLong, "a", v) } ++
      bVals.zipWithIndex.map { case (v, i) => (100L + i, "b", v) })
      .toDF("event_id", "event_type", "value")
    def model(vs: Seq[Double]): (Double, Double, Int) = {
      def med(xs: Seq[Double]): Double = {
        val s0 = xs.sorted; val n = s0.length
        (s0((n - 1) / 2) + s0(n / 2)) / 2
      }
      val m = med(vs); val devs = vs.map(v => math.abs(v - m))
      val d = med(devs)
      val flagged = devs.count(dev =>
        math.floor(dev * 1e6 + 0.5).toLong > 3 * math.floor(d * 1e6 + 0.5).toLong)
      (m, d, flagged)
    }
    val got = EventOps.anomalyMad(ev, kSigma = 3)
      .select("event_type", "n_events", "med_fp", "mad_fp", "n_anomalies")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    for ((t, vs) <- Seq("a" -> aVals, "b" -> bVals)) {
      val (m, d, flagged) = model(vs)
      val (_, n, medFp, madFp, nAnom) = got(t)
      assert(n == vs.length)
      assert(medFp == math.floor(m * 1e6 + 0.5).toLong)
      assert(madFp == math.floor(d * 1e6 + 0.5).toLong)
      assert(nAnom == flagged.toLong, s"type $t")
    }
    // the planted outlier is the only flag in "a"; "b" is all calm
    assert(got("a")._5 == 1L && got("b")._5 == 0L)
  }

  test("anomaly MAD hist matches a bucket model and brackets the exact stats") {
    val s = Spec.spark
    import s.implicits._
    // values spread over several unit buckets with one far outlier; 101
    // rows so the lower median is the exact middle rank
    val vals = (1 to 100).map(i => 10.0 + (i % 7) + i * 0.001) :+ 500.0
    val ev = vals.zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
      .toDF("event_id", "event_type", "value")
    def lowerMedian(xs: Seq[Long]): Long = {
      val s0 = xs.sorted; s0(((s0.length + 1) / 2) - 1)
    }
    val buckets = vals.map(v => math.floor(v).toLong)
    val medB = lowerMedian(buckets)
    val devs = buckets.map(b => math.abs(b - medB))
    val madB = lowerMedian(devs)
    val expAnom = devs.count(_ > 3 * madB)
    val got = EventOps.anomalyMadHist(ev, kSigma = 3)
      .select("n_events", "med_bucket", "mad_bucket", "n_anomalies")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((vals.length.toLong, medB, madB, expAnom.toLong)))
    // the sketch agrees with the exact operator at bucket resolution
    val exact = EventOps.anomalyMad(ev, kSigma = 3)
      .select("med_fp").as[Long].head()
    assert(math.abs(medB - math.floor(exact / 1e6)) <= 1.0)
  }

  test("histogram top-percent: cutoff bucket covers k, never undershoots") {
    val s = Spec.spark
    import s.implicits._
    // type "a": 100 events, values 0.5 (97×), 7.3, 7.9, 9.1 → k = 1,
    // cutoff = bucket 9, n_kept = 1 (exactly k)
    // type "b": 200 events all in bucket 3 → k = 2 but the single bucket
    // holds all 200: n_kept overshoots to 200, cutoff = 3
    val ev = ((1L to 97L).map(i => (i, "a", 0.5)) ++
      Seq((98L, "a", 7.3), (99L, "a", 7.9), (100L, "a", 9.1)) ++
      (101L to 300L).map(i => (i, "b", 3.25)))
      .toDF("event_id", "event_type", "value")
    val got = EventOps.topPercentHist(ev, pct = 1)
      .select("event_type", "n_events", "k", "cutoff_bucket", "n_kept")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") == ((100L, 1L, 9L, 1L)))
    assert(got("b") == ((200L, 2L, 3L, 200L)))
    // the contract: n_kept >= k for every type
    assert(got.values.forall { case (_, k, _, kept) => kept >= k })
  }

  lazy val spark: SparkSession = Spec.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, """{"k": 3}"""),
    (2L, ts("2024-01-01 10:10:00"), 7L, "view",  2.0, """{"k": 5}"""),
    (3L, ts("2024-01-01 11:30:00"), 7L, "click", 3.0, """{"k": 2}"""), // gap 80min → new session
    (4L, ts("2024-01-01 10:05:00"), 8L, "click", 4.0, """{"k": 9}""")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("sessionize splits on gap and counts per user") {
    val stats = EventOps.sessionStats(events, 30)
      .select("user_id", "n_sessions", "n_events")
      .as[(Long, Long, Long)].collect()
      .map { case (u, s, e) => u -> ((s, e)) }.toMap
    assert(stats(7L) == (2L, 3L))
    assert(stats(8L) == (1L, 1L))
  }

  test("tumbling window groups by aligned hour") {
    val r = EventOps.tumblingCounts(events, "1 hour")
      .select("window_start", "n").as[(Timestamp, Long)].collect()
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(r(ts("2024-01-01 10:00:00")) == 3L)
    assert(r(ts("2024-01-01 11:00:00")) == 1L)
  }

  test("asof join picks latest right row at or before left ts") {
    val purchases = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), 10.0),
      (2L, 7L, ts("2024-01-01 12:00:00"), 20.0),
      (3L, 8L, ts("2024-01-01 09:00:00"), 30.0)  // user 8: no prior view
    ).toDF("event_id", "user_id", "ts", "value")
    val views = Seq(
      (7L, ts("2024-01-01 09:30:00"), 1.0),
      (7L, ts("2024-01-01 10:00:00"), 2.0),  // equal ts → visible (<=)
      (7L, ts("2024-01-01 11:00:00"), 3.0),
      (8L, ts("2024-01-01 09:30:00"), 4.0)   // after user 8's purchase
    ).toDF("user_id", "ts", "view_value")
    val r = EventOps.asofJoin(purchases, views, "user_id", "ts",
                              "view_value", "last_view")
      .select("event_id", "last_view")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(r(1L) == Some(2.0))   // equal-ts view wins over 09:30
    assert(r(2L) == Some(3.0))   // latest before 12:00
    assert(r(3L) == None)        // nothing at or before
  }

  test("json props extraction sums the k property") {
    val r = EventOps.jsonPropsAgg(events)
      .select("event_type", "sum_k").as[(String, Long)].collect().toMap
    assert(r("click") == 14L && r("view") == 5L)
  }

  test("retention counts distinct users per cohort week offset") {
    def ts(s: String) = Timestamp.valueOf(s)
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, ts("2025-01-01 09:00:00")), // cohort day 1
      (1L, ts("2025-01-09 09:00:00")), // week 1
      (2L, ts("2025-01-01 10:00:00")), // cohort day 1, never returns
      (3L, ts("2025-01-02 10:00:00")), // cohort day 2
      (3L, ts("2025-01-20 10:00:00"))) // week 2
      .toDF("user_id", "ts")
    val days = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohort = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    val got = days.join(cohort, Seq("user_id"))
      .withColumn("week_offset",
        expr("datediff(day, cohort_day) div 7").cast("long"))
      .groupBy("cohort_day", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => (r._1.toString, r._2) -> r._3).toMap
    assert(got == Map(("2025-01-01", 0L) -> 2L, ("2025-01-01", 1L) -> 1L,
                      ("2025-01-02", 0L) -> 1L, ("2025-01-02", 2L) -> 1L))
  }

  test("funnel orders first occurrences and drops users missing a step") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: view < click < purchase → completed
      (1L, "view", ts("2025-01-01 09:00:00")),
      (1L, "click", ts("2025-01-01 09:05:00")),
      (1L, "purchase", ts("2025-01-01 09:10:00")),
      // user 2: purchase BEFORE first click → reached all, not completed
      (2L, "view", ts("2025-01-01 09:00:00")),
      (2L, "purchase", ts("2025-01-01 09:01:00")),
      (2L, "click", ts("2025-01-01 09:02:00")),
      // user 3: never purchases → excluded
      (3L, "view", ts("2025-01-01 09:00:00")),
      (3L, "click", ts("2025-01-01 09:01:00")))
      .toDF("user_id", "event_type", "ts")
    val r = EventOps.funnel(ev, Seq("view", "click", "purchase"))
      .select("user_id", "completed").as[(Long, Boolean)].collect().toMap
    assert(r == Map(1L -> true, 2L -> false))
  }

  test("windowed dedup keeps first per (user, type) per tumbling bucket") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1 "click": two in the same 5-min bucket + one in the next
      (1L, 1L, "click", ts("2025-01-01 09:00:10")),
      (2L, 1L, "click", ts("2025-01-01 09:03:00")),  // dup (same bucket)
      (3L, 1L, "click", ts("2025-01-01 09:06:00")),  // next bucket → kept
      // same bucket, different user → kept
      (4L, 2L, "click", ts("2025-01-01 09:01:00")),
      // same user+bucket, different type → kept
      (5L, 1L, "view", ts("2025-01-01 09:00:30")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = EventOps.dedupWindow(ev, windowMinutes = 5).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map("click" -> ((4L, 3L, 1L)), "view" -> ((1L, 1L, 0L))))
  }

  test("range join counts neighbors across bucket boundaries, keeps zeros") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // incident at 09:59:30; window ±10 min spans buckets 5 and 6
      (1L, 1L, "error", ts("2025-01-01 09:59:30")),
      (2L, 1L, "view",  ts("2025-01-01 10:05:00")),  // next bucket, +5:30 → in
      (3L, 1L, "view",  ts("2025-01-01 09:50:00")),  // same bucket, −9:30 → in
      (4L, 1L, "view",  ts("2025-01-01 10:15:00")),  // +15:30 → out of range
      (5L, 2L, "view",  ts("2025-01-01 10:00:00")),  // other user → out
      // incident with no neighbors at all must still report 0
      (6L, 3L, "error", ts("2025-01-01 12:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = EventOps.nearbyEventCounts(ev, windowMinutes = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 6L -> 0L))
  }

  test("gap histogram buckets consecutive per-user gaps by digit count") {
    val ev = Seq(
      (1L, 1L, Timestamp.valueOf("2025-01-01 09:00:00")),
      (2L, 1L, Timestamp.valueOf("2025-01-01 09:00:01")),  // 1s = 1e6 µs → 7 digits
      (3L, 1L, Timestamp.valueOf("2025-01-01 09:16:41")),  // 1000s = 1e9 µs → 10 digits
      (4L, 2L, Timestamp.valueOf("2025-01-01 09:00:00")),
      (5L, 2L, Timestamp.valueOf("2025-01-01 09:00:01")))  // 7 digits
      .toDF("event_id", "user_id", "ts")
    val got = EventOps.gapHistogram(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((7L, 2L, 666666L), (10L, 1L, 333333L)))
  }

  test("session length histogram counts sessions by event count") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, t("2025-01-01 09:00:00")),  // session A (2 events)
      (2L, 1L, t("2025-01-01 09:10:00")),
      (3L, 1L, t("2025-01-01 11:00:00")),  // session B (1 event, >30min gap)
      (4L, 2L, t("2025-01-01 09:00:00")),  // session C (3 events)
      (5L, 2L, t("2025-01-01 09:05:00")),
      (6L, 2L, t("2025-01-01 09:10:00")))
      .toDF("event_id", "user_id", "ts")
    val got = EventOps.sessionLengthHistogram(ev, gapMinutes = 30).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("key skew report ranks hottest keys with exact ppm shares") {
    def ts(i: Int) = Timestamp.valueOf(f"2025-01-01 09:00:${i}%02d")
    val ev = ((1 to 6).map(i => (i.toLong, 10L, "e", ts(i))) ++
              (7 to 9).map(i => (i.toLong, 20L, "e", ts(i))) ++
              Seq((10L, 30L, "e", ts(10))))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = EventOps.keySkewReport(ev, "user_id", topK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((10L, 6L, 600000L), (20L, 3L, 300000L)))
  }
}
