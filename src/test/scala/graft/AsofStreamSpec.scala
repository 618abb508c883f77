package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.sources.Tables
import graft.streaming.StreamingOps

/** The streaming as-of join: equal to the batch operator over the full
  * table, correct under late cross-trigger arrivals (a late view re-matches
  * and re-emits the purchases it affects), and bounded under watermark
  * eviction (below-wm purchases finalize, the view buffer compacts to a
  * watermark floor).
  */
class AsofStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark

  private val dir = "/root/testdata/sf0.001"

  test("streaming asof join equals the batch asof join") {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max(col("value")).as("view_value"))
    val batch = EventOps.asofJoin(purchases, views, "user_id", "ts",
        "view_value", "last_view_value")
      .select("event_id", "user_id", "value", "last_view_value")
      .collect().map(_.toSeq).toSet
    val streamed = StreamingOps.asofJoinStream(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("late views re-match pending purchases; latest emission wins") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Double, Boolean)]
    val ev = mem.toDF()
      .toDF("event_id", "user_id", "ts_us", "value", "is_purchase")
      .as[StreamingOps.AsofEv]
    val out = StreamingOps.asofJoinUpdates(spark, ev)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("asof_late").start()
    try {
      // purchase first: no view yet → emits an unmatched row
      mem.addData((10L, 1L, 100L, 5.0, true)); q.processAllAvailable()
      // late view BEFORE the purchase → re-emits with 2.0
      mem.addData((20L, 1L, 50L, 2.0, false)); q.processAllAvailable()
      // later view, smaller value → later ts wins: re-emits with 1.0
      mem.addData((21L, 1L, 80L, 1.0, false)); q.processAllAvailable()
      // same-ts view, bigger value → max at the matched ts: 7.0
      mem.addData((22L, 1L, 80L, 7.0, false)); q.processAllAvailable()
      val rows = spark.table("asof_late").collect()
        .map(r => (r.getLong(0), Option(r.get(3)).map(_.toString.toDouble),
                   r.getLong(4)))
      // four emissions for purchase 10, one per answer change
      assert(rows.map(_._2).toSeq.sortBy(_.getOrElse(-1.0)) ==
        Seq(None, Some(1.0), Some(2.0), Some(7.0)))
      assert(rows.maxBy(_._3)._2 == Some(7.0))
    } finally { q.stop(); spark.catalog.dropTempView("asof_late") }
  }

  test("watermark eviction finalizes purchases and compacts the view buffer") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = 60L * 1000000L
    val mem = MemoryStream[(Long, Long, Long, Double, Boolean)]
    val ev = mem.toDF()
      .toDF("event_id", "user_id", "ts_us", "value", "is_purchase")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "0 seconds")
      .as[StreamingOps.AsofEv]
    val out = StreamingOps.asofJoinUpdates(spark, ev,
      watermarkEviction = true)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("asof_evict").start()
    try {
      // batch 1: view at 0 (1.0), purchase 10 at 30 s, and a far-future
      // view at 100 m that drives the watermark past both
      mem.addData((1L, 1L, 0L, 1.0, false),
                  (10L, 1L, 30 * 1000000L, 5.0, true),
                  (2L, 1L, 100 * m, 3.0, false))
      q.processAllAvailable()
      // batch 2 (wm = 100 m; purchase 10 finalized, views < 100 m
      // compacted to the floor): a LATE view at 50 m (99.0) is dropped by
      // the watermark filter — it must NOT re-match purchase 10 — and a
      // new purchase at 100 m + 30 s matches the floor-surviving 100 m
      // view
      mem.addData((3L, 1L, 50 * m, 99.0, false),
                  (11L, 1L, 100 * m + 30 * 1000000L, 6.0, true))
      q.processAllAvailable()
      val latest = spark.table("asof_evict").collect()
        .map(r => (r.getLong(0),
                   Option(r.get(3)).map(_.toString.toDouble), r.getLong(4)))
        .groupBy(_._1).map { case (id, rs) => id -> rs.maxBy(_._3)._2 }
      assert(latest == Map(10L -> Some(1.0), 11L -> Some(3.0)))
    } finally { q.stop(); spark.catalog.dropTempView("asof_evict") }
  }
}
