package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Noise-floor sentinel (r16 verdict item 1): a FIXED tiny CPU-bound
    * job, independent of sfDir, interleaved between measured queries.
    * Three rounds running, the driver's single bench invocation
    * manufactured phantom >2× rows in contiguous run-order blocks
    * (r14 mix_report, r15 q20 4.30×, r16 thirteen rows) because machine
    * contention inflates whatever happens to be running — and the
    * artifact carried no way to tell a contended window from a real
    * regression. The sentinel's wall time measures the MACHINE, not the
    * engine: when its reading in a query's window exceeds the run's own
    * floor, the window was contended and compare_baseline.py annotates
    * (not excuses) the rows measured inside it.
    *
    * Work sizing: 16 partitions × 250k xxhash64 + one-row agg ≈ 0.05–0.1 s
    * quiet at local[32] — cheap enough to run every few queries, parallel
    * enough that external CPU load visibly stretches it.
    */
  private def sentinelOnce(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.{xxhash64, sum, pmod, lit, col}
    val t0 = System.nanoTime()
    // pmod bounds the addends so ANSI sum can't overflow long
    spark.range(0L, 4000000L, 1L, 16)
      .select(pmod(xxhash64(col("id")), lit(1000000L)).as("h"))
      .agg(sum("h"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** One sentinel READING = min of two back-to-back runs: a single run
    * carries one-off scheduling blips (a stray GC, a cold core) that
    * false-flag a quiet window, while sustained external load inflates
    * both shots — min keeps the signal, drops the blip. */
  private def sentinelReading(spark: SparkSession): Double =
    math.min(sentinelOnce(spark), sentinelOnce(spark))

  /** Map each measured query to its window's worst sentinel/floor ratio.
    *
    * `sentinelAt(k)` is the query index BEFORE which sentinel reading
    * `series(k)` was taken; the final entry is `nQueries` (the trailing
    * sentinel after the last query). A query's window is bracketed by
    * the nearest sentinel at-or-before it and the nearest one after it;
    * its noise ratio is max(bracket) / floor where floor = min(series) —
    * the run's own best-case quiet reading. Pure, for the spec.
    */
  private[graft] def noiseRatios(nQueries: Int, sentinelAt: Seq[Int],
                                 series: Seq[Double]): Seq[Double] = {
    require(sentinelAt.length == series.length)
    if (series.isEmpty || nQueries == 0) return Seq.fill(nQueries)(1.0)
    val floor = series.min
    (0 until nQueries).map { i =>
      val beforeIdx = sentinelAt.lastIndexWhere(_ <= i)
      val afterIdx = sentinelAt.indexWhere(_ > i)
      val before = if (beforeIdx >= 0) series(beforeIdx) else Double.NaN
      val after = if (afterIdx >= 0) series(afterIdx) else Double.NaN
      val w = math.max(if (before.isNaN) 0.0 else before,
                       if (after.isNaN) 0.0 else after)
      if (w == 0.0 || floor <= 0.0) 1.0
      else math.rint(w / floor * 100) / 100
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // drift sentinel: Barriers' unpersist-WARN filter is fail-open; count
    // any such line that still reaches the log and report it at the end
    graft.operators.Barriers.armUnpersistNoiseSentinel()
    // optional warmup pass (SPARK_GRAFT_WARMUP=1): separates steady-state
    // per-query cost from session/codegen warmup; default off (driver runs cold)
    if (sys.env.get("SPARK_GRAFT_WARMUP").contains("1"))
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
      }
    // median-of-3 per query: single-shot timings at sf0.1 swing ±2-4× with
    // machine contention (r2's phantom 6× regressions) — the median is
    // robust to one contended run while still reporting cold-ish cost
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // SPARK_GRAFT_ONLY=a,b,c restricts the run to named queries — for
    // adjudicating individual regressions without paying the full surface.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_PURGE=0 disables the between-query cache purge, to A/B
    // whether purge teardown (localCheckpoint block eviction) is what a
    // suspect query is actually paying for.
    val purge = !sys.env.get("SPARK_GRAFT_PURGE").contains("0")
    // The measured pass does NOT swallow errors: a broken query must bench
    // as an error, not as a fast "success" (a prior round timed an instant
    // AnalysisException as a 0.2s win). Each query reports either its
    // median-of-reps seconds or an "err:" string.
    // noise-floor sentinel: one reading before every Nth measured query
    // plus a trailing one (SPARK_GRAFT_SENTINEL_EVERY, default 5, 0 =
    // off). Warmed ADAPTIVELY first — fixed two-shot warmup left the
    // first measured reading 2.2× the floor on a quiet machine (C2 JIT
    // of scheduler paths keeps improving for many iterations, not
    // contention), which would false-flag the first window. The first
    // stop rule ("within 1.3× of the running min once") parked on C2's
    // intermediate PLATEAUS: r17's restricted quiet re-times read
    // floors of 0.09–0.2 where the same session's full runs reached
    // 0.035–0.05 deep in their series, biasing the anchored
    // RUN-CONTENDED check pessimistic on exactly the short runs that
    // exist to adjudicate. Now the spin stops only when three
    // CONSECUTIVE readings fail to improve the running minimum by >10%
    // (a plateau the length of the flag horizon, not one lucky shot),
    // cap 24 — worst case ~6 s of warmup against a multi-minute run.
    val sentinelEvery =
      sys.env.getOrElse("SPARK_GRAFT_SENTINEL_EVERY", "5").toInt
    val sentinelAt = scala.collection.mutable.ArrayBuffer.empty[Int]
    val sentinelSeries = scala.collection.mutable.ArrayBuffer.empty[Double]
    if (sentinelEvery > 0) {
      var runMin = sentinelOnce(spark)
      var w = 1
      var flat = 0
      while (w < 24 && flat < 3) {
        val cur = sentinelOnce(spark)
        if (cur < runMin * 0.9) { runMin = cur; flat = 0 }
        else flat += 1
        runMin = math.min(runMin, cur)
        w += 1
      }
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.zipWithIndex.map { case ((name, fn), qi) =>
      // no reading before query 0: even after adaptive warmup the very
      // first reading ran ~2.2× the eventual floor (C2 keeps compiling),
      // false-flagging the first window on a quiet machine. The first
      // queries are covered by their RIGHT bracket (reading at `every`),
      // which sits past the warmup knee; only a contention burst that
      // dies within the first window is missed, and the phantom pattern
      // this guards against is multi-window blocks.
      if (sentinelEvery > 0 && qi % sentinelEvery == 0 && qi > 0) {
        sentinelAt += qi
        sentinelSeries += sentinelReading(spark)
      }
      var err = Option.empty[String]
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var r = 0
      // stop at the first failing rep — re-running a broken (possibly
      // slow-to-fail) query for the remaining reps buys nothing
      while (r < reps && err.isEmpty) {
        val t0 = System.nanoTime()
        // noop sink forces full computation of every column (count() would
        // let Catalyst prune projections and undercount the real work)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case t: Throwable =>
          err = Some(s"${t.getClass.getSimpleName}: " +
            Option(t.getMessage).getOrElse("").take(120)) }
        times += (System.nanoTime() - t0) / 1e9
        r += 1
      }
      // cache hygiene between queries: several operators materialize
      // intermediate frames (Barriers.materialize → localCheckpoint) whose
      // blocks outlive the query's action — nobody can release them earlier
      // because the returned plan still reads them. Left in place, ~432
      // query executions pin block-manager memory for the JVM's lifetime
      // and late-alphabet queries (dedup_savings, r8: 16.3 s vs 2.7 s in a
      // fresh JVM) bench the accumulated pressure, not their plan. Safe
      // here: queries run sequentially and nothing memoizes frames across
      // queries (the cross-query caches are all file-staged).
      if (purge) {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(graft.operators.Barriers.quietUnpersist)
        spark.sharedState.cacheManager.clearCache()
      }
      err match {
        case Some(e) => name -> Left(e)
        case None =>
          val sorted = times.sorted
          name -> Right(sorted(sorted.length / 2))
      }
    }
    // trailing sentinel so the last window is bracketed on both sides
    if (sentinelEvery > 0 && selected.nonEmpty) {
      sentinelAt += selected.length
      sentinelSeries += sentinelReading(spark)
    }
    // quotes/backslashes AND all control/non-ASCII bytes must go, or an
    // exception message breaks the one-line JSON contract
    def jstr(s: String) =
      "\"" + s.replaceAll("[\"\\\\]|[^\\x20-\\x7e]", " ") + "\""
    val qs = results.map {
      case (k, Right(v)) => jstr(k) + ":" + v
      case (k, Left(e))  => jstr(k) + ":" + jstr("err: " + e)
    }.mkString("{", ",", "}")
    val ok = results.collect { case (_, Right(v)) => v }
    val nErr = results.count(_._2.isLeft)
    val total = ok.sum
    // "only":true marks a subset run so downstream consumers can't mistake
    // it for the full surface (its "total" covers only the named queries)
    val onlyMarker = if (only.isDefined) """"only":true,""" else ""
    // protocol stamp: a single-invocation run overwriting bench_out.json
    // must be self-describing (it has clobbered the committed median-of-3
    // artifact twice) — consumers read reps/protocol instead of guessing
    val protocol = if (reps >= 2) s"median-of-$reps" else "single"
    val protoMarker = s""""reps":$reps,"protocol":"$protocol","""
    // sentinel fields: the full series + per-query window ratios go into
    // the file artifact (compare_baseline.py reads "noise" to annotate
    // rows measured in a contended window); the truncated stdout line
    // carries only the floor/max summary so even the driver's captured
    // tail self-identifies a contended invocation.
    def j3(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", java.lang.Double.valueOf(d))
    val (sentinelMarker, noiseMarker, sentinelSummary) =
      if (sentinelSeries.nonEmpty) {
        val floor = sentinelSeries.min
        val smax = sentinelSeries.max
        val ratios = noiseRatios(selected.length, sentinelAt.toSeq,
          sentinelSeries.toSeq)
        val noisy = ratios.count(_ >= 2.5)
        val sm = s""""sentinel":{"every":$sentinelEvery,"floor":${j3(floor)},""" +
          s""""max":${j3(smax)},"noisy_windows":$noisy,""" +
          s""""at":${sentinelAt.mkString("[", ",", "]")},""" +
          s""""series":${sentinelSeries.map(j3).mkString("[", ",", "]")}},"""
        val nm = s""""noise":${results.zip(ratios).map { case ((k, _), r) =>
          jstr(k) + ":" + r }.mkString("{", ",", "}")},"""
        val summary = s""""sentinel":{"floor":${j3(floor)},"max":${j3(smax)},""" +
          s""""noisy_windows":$noisy},"""
        (sm, nm, summary)
      } else ("", "", "")
    val line = s"""{"metric":"total","value":$total,"unit":"sec",$onlyMarker$protoMarker$sentinelMarker$noiseMarker"queries":$qs,"errors":$nErr,"sf":"$sfDir"}"""
    // The full per-query map (112 entries at double precision, ~3.5 KB) no
    // longer fits the driver's 2000-char captured tail, so a full-map
    // stdout line is UNPARSEABLE driver-side (BENCH_r06/r07 both recorded
    // parsed=null). Write the complete line to a file
    // (SPARK_GRAFT_BENCH_OUT, default bench_out.json) and print a line
    // that FITS: headline = every error (never elided) plus the most
    // expensive queries, value still the total over ALL queries.
    // An ONLY-restricted run must not clobber the full-surface artifact
    // with a subset map (it happened once; bench_out.json had to be
    // restored from git) — default it to a side path instead. An explicit
    // SPARK_GRAFT_BENCH_OUT always wins.
    val defaultOut =
      if (only.isDefined) "bench_out.partial.json" else "bench_out.json"
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    if (outPath.nonEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes("UTF-8"))
      catch { case t: Throwable =>
        System.err.println(s"[bench] could not write $outPath: ${t.getMessage}") }
    val stdoutLine = if (line.length <= 1800) line else {
      // errors first and UNCONDITIONALLY (hard-truncated so a storm of long
      // messages can't eat the whole line); the "never elided" guarantee
      // must hold even when errors alone exceed the timing budget
      val errEntries = results.collect { case (k, Left(e)) =>
        jstr(k) + ":" + jstr("err: " + e.take(60)) }
      val timeEntries = results
        .collect { case (k, Right(v)) => (k, v) }
        .sortBy { case (_, v) => -v }
        .map { case (k, v) => jstr(k) + ":" + (math.rint(v * 1000) / 1000) }
      val budget = 1500
      val kept = scala.collection.mutable.ArrayBuffer.empty[String]
      var used = 0
      errEntries.foreach { e => kept += e; used += e.length + 1 }
      timeEntries.foreach { e =>
        if (used + e.length + 1 <= budget) { kept += e; used += e.length + 1 }
      }
      s"""{"metric":"total","value":$total,"unit":"sec",$protoMarker$sentinelSummary"queries":${
        kept.mkString("{", ",", "}")
      },"queries_elided":${results.length - kept.length},"full":"$outPath","errors":$nErr,"sf":"$sfDir"}"""
    }
    println(stdoutLine)
    val leaks = graft.operators.Barriers.unpersistNoiseLeaks()
    if (leaks > 0)
      System.err.println(s"[bench] NOISE-DRIFT: $leaks unpersist WARN " +
        "line(s) reached the log despite Barriers' message filter — " +
        "Spark's warning text has drifted; re-pin the regex in " +
        "Barriers.muteUnpersistWarn")
    spark.stop()
    if (nErr > 0) sys.exit(2)
  }
}
