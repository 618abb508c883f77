package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps

class EventOpsSpec extends AnyFunSuite {
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

  test("json props extraction sums the k property") {
    val r = EventOps.jsonPropsAgg(events)
      .select("event_type", "sum_k").as[(String, Long)].collect().toMap
    assert(r("click") == 14L && r("view") == 5L)
  }
}
