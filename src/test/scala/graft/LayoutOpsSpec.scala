package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LayoutOps

class LayoutOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def events = graft.sources.Tables.events(spark, dir)

  // the ONE in-spec Morton model both tests assert against (a at odd
  // bits, b at even) — a convention change must update exactly one place
  private def morton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, k) =>
      acc | (((a >> k) & 1L) << (2 * k + 1)) | (((b >> k) & 1L) << (2 * k))
    }

  test("z expression equals the bit-interleave model on both dialects' math") {
    // the Spark dialect's div is the only operator difference; evaluate
    // the generated expression and compare against the Scala Morton
    // model for exhaustive small values
    val pairs = for (a <- 0L to 15L; b <- 0L to 15L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .withColumn("z", expr(LayoutOps.zExprSql("a", "b", 4, "div")))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == morton(a, b, 4), s"z($a,$b)")
    }
    // adjacent-in-both-dims points stay close on the curve: z of (a,b)
    // and (a, b+1) differ only below bit 2*bits for the shared prefix
    assert(morton(3, 3, 4) == 15L) // 0b1111: full low-bits locality
  }

  test("z expression property: seeded random values across bit widths") {
    val rng = new scala.util.Random(42) // fixed seed — deterministic spec
    for (bits <- Seq(1, 8, 16, 31)) {
      val bound = 1L << bits
      val cases = Seq.fill(50)(
        (math.abs(rng.nextLong()) % bound, math.abs(rng.nextLong()) % bound)) ++
        Seq((0L, 0L), (bound - 1, bound - 1), (bound - 1, 0L), (0L, bound - 1))
      val got = cases.toDF("a", "b")
        .withColumn("z", expr(LayoutOps.zExprSql("a", "b", bits, "div")))
        .as[(Long, Long, Long)].collect()
      got.foreach { case (a, b, z) =>
        assert(z == morton(a, b, bits), s"bits=$bits z($a,$b)")
        assert(z >= 0, s"bits=$bits produced a negative z") // 2·31 ≤ 62
      }
    }
  }

  test("zorder buckets shrink user spans that a time layout cannot") {
    val rep = LayoutOps.zorderSkippingReport(events)
      .select("layout", "bucket", "n_events", "min_user", "max_user")
      .as[(String, Long, Long, Long, Long)].collect()
    val byLayout = rep.groupBy(_._1)
    val total = events.count()
    // both layouts partition the corpus exactly
    byLayout.values.foreach(rows => assert(rows.map(_._3).sum == total))
    def avgUserSpan(l: String): Double = {
      val rows = byLayout(l)
      rows.map(r => (r._5 - r._4).toDouble).sum / rows.length
    }
    val (zSpan, tSpan) = (avgUserSpan("zorder"), avgUserSpan("time"))
    // the time layout's files each span ~the full user range; the z-order
    // layout's files constrain the user dimension too — that shrink IS
    // the second-predicate pruning. 2x is a loose floor (the 16-bucket
    // split gives each z file a quarter of the user bins).
    assert(zSpan * 2 < tSpan, s"zorder avg user span $zSpan vs time $tSpan")
  }

  test("offset id domains keep their user dimension (min-based binning)") {
    // the regression guard for the symmetric min subtraction: shift every
    // user_id into a high offset range. The raw [0, max] binning formula
    // maps all of them into the top bins (constant interleaved user bits
    // → the layout silently collapses to a time sort and spans stay
    // full); the [min, max] form must keep the same span shrink the
    // unshifted corpus shows. NOTE the rehearsal CANNOT catch this — its
    // replica 0 stays un-offset so the combined min is 0 and both
    // formulas agree bitwise there; only this shifted-domain assertion
    // discriminates.
    val shifted = events.withColumn("user_id",
      col("user_id") + lit(1000000000L))
    val rep = LayoutOps.zorderSkippingReport(shifted)
      .select("layout", "min_user", "max_user")
      .as[(String, Long, Long)].collect()
    def avgSpan(l: String): Double = {
      val rows = rep.filter(_._1 == l)
      rows.map(r => (r._3 - r._2).toDouble).sum / rows.length
    }
    val (z, t) = (avgSpan("zorder"), avgSpan("time"))
    assert(z * 2 < t,
      s"offset domain must keep user-span shrink: zorder $z vs time $t")
  }

  test("zorderWrite delivers the report's prediction in real file footers") {
    val out = java.nio.file.Files.createTempDirectory("graft-zorder-")
      .resolve("events").toString
    LayoutOps.zorderWrite(events, out, files = 8)
    // per-FILE spans, read back from the actual written layout
    val perFile = spark.read.parquet(out)
      .withColumn("file", expr("input_file_name()"))
      .groupBy("file")
      .agg((max(col("user_id")) - min(col("user_id"))).as("uspan"),
           count(lit(1)).as("n"))
    val nFiles = perFile.count()
    assert(nFiles >= 6, s"range partitioner should spread files, got $nFiles")
    val avgSpan = perFile.agg(avg(col("uspan"))).head().getDouble(0)
    val full = events.agg((max(col("user_id")) - min(col("user_id")))
      .cast("double")).head().getDouble(0)
    // time-sorted files would each span ~the full user range; the written
    // z layout must constrain it (matching the report's bucket table)
    assert(avgSpan < full * 0.6,
      s"written files' avg user span $avgSpan vs full range $full")
    // rows survive the layout unchanged
    assert(spark.read.parquet(out).count() == events.count())
  }

  test("binning is load-bearing: raw-width interleave degenerates to a time sort") {
    // interleave RAW user_id (8 significant bits) with raw seconds (31
    // bits) and bucket by the top z bits: every varying high bit comes
    // from the time dimension, so the layout collapses to time buckets
    // and the user span stays unconstrained — the degeneration the
    // equal-width binning step exists to prevent
    val raw = events
      .withColumn("t_s", expr("unix_micros(ts) div 1000000 % 2147483648"))
      .withColumn("z", expr(LayoutOps.zExprSql("user_id", "t_s", 31, "div")))
    val top = raw.select(max(col("z")).as("mz")).head().getLong(0)
    val width = math.max(1L, top / 16)
    val spans = raw.withColumn("bucket", expr(s"z div ${width}L"))
      .groupBy("bucket")
      .agg((max(col("user_id")) - min(col("user_id"))).as("uspan"),
           count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(avg(col("uspan"))).head().getDouble(0)
    val full = events.select(
      (max(col("user_id")) - min(col("user_id"))).cast("double")).head().getDouble(0)
    assert(spans > full * 0.5,
      s"raw interleave should NOT constrain users (avg span $spans of $full)")
  }

  test("rank binning clusters tighter than equal-width under value skew") {
    // skewed id domain: 95% of rows live in [0, 100) while a few outliers
    // stretch the observed range to 1e9 — equal-width collapses the dense
    // region into bin 0 (the user dimension falls out of the curve), rank
    // bins keep spreading it
    val rng = new scala.util.Random(7)
    val rows = (0 until 2000).map { i =>
      val uid = if (i % 20 == 0) 1000000000L - rng.nextInt(1000)
                else rng.nextInt(100).toLong
      (uid, new java.sql.Timestamp(1700000000000L + i * 60000L))
    }
    val skewed = rows.toDF("user_id", "ts")
    def denseSpans(df: org.apache.spark.sql.DataFrame, layout: String) =
      df.filter(col("layout") === layout && col("max_user") < 1000000L)
        .select(avg(col("max_user") - col("min_user"))).head().getDouble(0)
    val eq = LayoutOps.zorderSkippingReport(skewed, bits = 8, buckets = 16)
    val rk = LayoutOps.zorderRankSkippingReport(skewed, bits = 8, buckets = 16)
    // buckets untouched by outliers: rank bins must constrain the dense
    // region's user span far below equal-width's (which saw one giant bin)
    val eqSpan = denseSpans(eq, "zorder")
    val rkSpan = denseSpans(rk, "zorder_rank")
    assert(rkSpan < eqSpan / 2,
      s"rank span $rkSpan should be well under equal-width span $eqSpan")
    // same rows, both curves: bucket row counts sum to n
    assert(rk.agg(sum("n_events")).head().getLong(0) == 2000L)
  }

  test("zorderRankWrite: real file footers constrain the dense region under skew") {
    // the write-path twin of the report comparison above: under the same
    // skewed fixture, the files the RANK write produces must carry
    // physically narrower user spans (their parquet footer min/max) in
    // the dense region than the equal-width write's files — the span a
    // reader's predicate pushdown actually prunes on
    val rng = new scala.util.Random(7)
    val rows = (0 until 2000).map { i =>
      val uid = if (i % 20 == 0) 1000000000L - rng.nextInt(1000)
                else rng.nextInt(100).toLong
      (uid, new java.sql.Timestamp(1700000000000L + i * 60000L))
    }
    val skewed = rows.toDF("user_id", "ts")
    val base = java.nio.file.Files.createTempDirectory("graft-zrank-")
    val outEq = base.resolve("eq").toString
    val outRk = base.resolve("rk").toString
    LayoutOps.zorderWrite(skewed, outEq, bits = 8, files = 8)
    LayoutOps.zorderRankWrite(skewed, outRk, bits = 8, files = 8)
    def denseFileSpan(path: String): Double =
      spark.read.parquet(path)
        .withColumn("file", expr("input_file_name()"))
        .groupBy("file")
        .agg(min(col("user_id")).as("lo"), max(col("user_id")).as("hi"))
        .filter(col("hi") < 1000000L) // files untouched by outliers
        .select(avg(col("hi") - col("lo"))).head().getDouble(0)
    val eqSpan = denseFileSpan(outEq)
    val rkSpan = denseFileSpan(outRk)
    assert(rkSpan < eqSpan / 2,
      s"rank-written dense files span $rkSpan; equal-width $eqSpan")
    // the layout is layout only: every row survives, no helper columns
    val back = spark.read.parquet(outRk)
    assert(back.columns.toSet == Set("user_id", "ts"))
    assert(back.count() == 2000L)
    assert(back.select("user_id", "ts").collect().map(_.toSeq).toSet ==
      skewed.collect().map(_.toSeq).toSet)
  }

  test("snowflake-scale id spans fail loudly instead of wrapping to negative bins") {
    // span > 2^63/2^8: (id - min) * 256 would overflow Long and interleave
    // garbage; the guard must throw, not produce a silent corrupt layout
    val wide = Seq((0L, "2024-01-01 00:00:00"),
                   (Long.MaxValue / 128, "2024-01-01 01:00:00"))
      .toDF("user_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val e = intercept[Exception] {
      LayoutOps.zorderSkippingReport(wide, bits = 8, buckets = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("span")), msgs(e).mkString(" | "))

    // a full-range domain also wraps the max-min span arithmetic itself;
    // the decimal-space check still catches it
    val full = Seq((Long.MinValue + 1, "2024-01-01 00:00:00"),
                   (Long.MaxValue, "2024-01-01 01:00:00"))
      .toDF("user_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val e2 = intercept[Exception] {
      LayoutOps.zorderSkippingReport(full, bits = 8, buckets = 2).collect()
    }
    assert(msgs(e2).exists(_.contains("span")), msgs(e2).mkString(" | "))
  }
}
