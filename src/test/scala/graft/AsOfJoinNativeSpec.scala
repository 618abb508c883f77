package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.sources.Tables

/** The native custom-operator as-of join must agree with the composed
  * union+window implementation on hand-built cases and real event data.
  */
class AsOfJoinNativeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("native asof join: basic semantics incl. equal-ts and no-match") {
    val purchases = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), 10.0),
      (2L, 7L, ts("2024-01-01 12:00:00"), 20.0),
      (3L, 8L, ts("2024-01-01 09:00:00"), 30.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val views = Seq(
      (7L, ts("2024-01-01 09:30:00"), 1.0),
      (7L, ts("2024-01-01 10:00:00"), 2.0),
      (7L, ts("2024-01-01 11:00:00"), 3.0),
      (8L, ts("2024-01-01 09:30:00"), 4.0)
    ).toDF("user_id", "ts", "view_value")
    val r = EventOps.asofJoinNative(purchases, views, "user_id", "ts",
                                    "view_value", "last_view")
      .select("event_id", "last_view")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(r(1L) == Some(2.0) && r(2L) == Some(3.0) && r(3L) == None)
  }

  test("native asof join equals composed implementation on events data") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter($"event_type" === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val views = ev.filter($"event_type" === "view")
      .groupBy("user_id", "ts").agg(max($"value").as("view_value"))
    val native = EventOps.asofJoinNative(purchases, views, "user_id", "ts",
                                         "view_value", "lv")
      .select("event_id", "lv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    val composed = EventOps.asofJoin(purchases, views, "user_id", "ts",
                                     "view_value", "lv")
      .select("event_id", "lv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(native == composed && native.nonEmpty)
  }
}
