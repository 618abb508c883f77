package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table ([EXT] SURVEY.md §2.9
  * `events_sessionize`) — the batch shapes that also run under Structured
  * Streaming (graft.streaming): tumbling windows, JSON property extraction,
  * gaps-and-islands sessionization.
  */
object EventOps {

  /** Exact decimal sum of a double expression returned as double
    * (accumulation-order independent — oracle-parity safe).
    */
  private def dsum(c: Column): Column = sum(c.cast("decimal(25,4)")).cast("double")

  /** Tumbling-window aggregation. Uses the `window()` operator (the same
    * plan shape Structured Streaming uses); epoch-aligned windows so
    * `window.start == date_trunc` for whole-unit durations.
    */
  def tumblingCounts(events: DataFrame, duration: String): DataFrame =
    events
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Sliding-window aggregation: each event contributes to
    * duration/slide overlapping windows (here 2 for 1h/30m). Same
    * epoch-aligned `window()` operator as tumbling.
    */
  def slidingCounts(events: DataFrame, duration: String,
                    slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), duration, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** JSON property extraction + rollup (events.props is a JSON string).
    * One `from_json(schema)` parse per row instead of per-path
    * `get_json_object` extraction — the schema-known fast path (JacksonParser
    * once, not a tree walk per property); adding a property reads another
    * struct field, not another parse.
    */
  def jsonPropsAgg(events: DataFrame): DataFrame = {
    val propsSchema = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField(
        "k", org.apache.spark.sql.types.LongType)))
    events
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           max(col("k")).as("max_k"))
  }

  /** Gaps-and-islands sessionization: a session breaks after `gapMinutes`
    * of inactivity per user. One shuffle on user_id; both windows reuse the
    * same (user_id, ts) sort — Catalyst plans a single exchange+sort.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapMicros = gapMinutes * 60L * 1000000L
    val withSession = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withSession
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  /** Inter-event gap histogram in decimal-digit buckets of µs — the
    * data-driven justification for the sessionization gap: the bucket
    * counts expose the bimodal split (within-session vs between-session
    * gaps), and the valley between the modes is where `gapMinutes`
    * belongs. Digit buckets (1 digit = <10 µs … 10 digits = ~2.8 h) are
    * integer-exact on both engines — no log(), no float binning.
    *
    * Scale shape: one per-user lag window + a fully partial-agg'd
    * histogram over ≤19 buckets; the single-row total broadcasts. The
    * consecutive-difference MULTISET is invariant to how equal-ts ties
    * order, so no global coordination is needed beyond the per-user sort.
    */
  def gapHistogram(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .filter(col("prev_us").isNotNull)
      .select((unix_micros(col("ts")) - col("prev_us")).as("gap_us"))
    val hist = gaps
      .select(length(col("gap_us").cast("string")).cast("long")
        .as("gap_digits"))
      .groupBy("gap_digits").agg(count(lit(1)).as("n_gaps"))
    val tot = hist.agg(sum(col("n_gaps")).as("t"))
    hist.crossJoin(broadcast(tot))
      .withColumn("ppm", expr("n_gaps * 1000000 div t"))
      .select("gap_digits", "n_gaps", "ppm")
  }

  /** Session-length histogram: how many sessions have 1, 2, 3… events —
    * the engagement-distribution view over [[sessionize]]'s output (one
    * extra partial-agg'd groupBy over |sessions| rows).
    */
  def sessionLengthHistogram(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("n_events").agg(count(lit(1)).as("n_sessions"))

  /** As-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` per key — an operator Spark lacks natively.
    *
    * Composed Spark-first (SURVEY §7.5 preference (a)): tag and union both
    * sides, then carry the right value forward with `last(ignoreNulls)`
    * over one (key, ts) sort. ONE shuffle + ONE sort over |L|+|R| rows —
    * versus a naive range join's |L|·|R| explosion; this is the
    * formulation that survives 100 TB event tables. Right rows sort
    * before left rows on ts ties, so an equal-timestamp right row is
    * visible (ASOF `<=` semantics, matching DuckDB's ASOF JOIN).
    *
    * The right side must be unique per (key, ts); pre-aggregate it
    * (e.g. max value) to keep ties deterministic.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               tsCol: String, valueCol: String,
               outCol: String): DataFrame = {
    val lCols = left.columns
    val tagged = left
      .withColumn("_is_left", lit(1))
      .withColumn("_rv", lit(null).cast(right.schema(valueCol).dataType))
      .unionByName(
        right.select(
          col(key), col(tsCol),
          lit(0).as("_is_left"), col(valueCol).as("_rv")),
        allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col(tsCol), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn(outCol, last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .select(lCols.toIndexedSeq.map(col) :+ col(outCol): _*)
  }

  /** Native as-of join via the custom operator stack
    * (graft.plans.AsOfJoinNode/Strategy/Exec): one co-partitioned
    * sort-merge pass, no union, no window buffer. Same semantics and
    * right-side-uniqueness requirement as [[asofJoin]].
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
                     tsCol: String, valueCol: String,
                     outCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val lp = ColumnBridge.analyzed(left)
    // re-alias the right side so its attributes get fresh expr ids — when
    // both inputs derive from the same source, duplicate ids would make
    // the analyzer's DeduplicateRelations rewrite the child underneath
    // this (unknown-to-it) node without remapping our captured attributes
    val rp = ColumnBridge.analyzed(
      right.select(
        col(key).as("__asof_key"), col(tsCol).as("__asof_ts"),
        col(valueCol).as("__asof_val")))
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val rv = attr(rp, "__asof_val")
    val node = graft.plans.AsOfJoinNode(lp, rp,
      attr(lp, key), attr(lp, tsCol),
      attr(rp, "__asof_key"), attr(rp, "__asof_ts"), rv,
      AttributeReference(outCol, rv.dataType, nullable = true)())
    ColumnBridge.dataFrame(spark, node)
  }

  /** Per-user session stats (the aggregate consumers actually read). */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))

  /** Ordered funnel over `steps`: users whose FIRST occurrence of each
    * step strictly precedes the next step's first occurrence. One groupBy
    * computing conditional mins (map-side partial) and a projection — no
    * self-joins, no window, no per-step passes; adding a step adds a
    * column, not a shuffle.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2,
      s"funnel needs at least 2 ordered steps, got $steps")
    val mins = steps.map(s =>
      min(when(col("event_type") === s, col("ts"))).as(s"t_$s"))
    val staged = events.groupBy("user_id").agg(mins.head, mins.tail: _*)
    val reached = steps.map(s => col(s"t_$s").isNotNull).reduce(_ && _)
    val ordered = steps.sliding(2).map { pair =>
      col(s"t_${pair.head}") < col(s"t_${pair.last}")
    }.reduce(_ && _)
    staged.filter(reached).withColumn("completed", ordered)
  }

  /** Top `pct`% of events per type by value — outlier extraction with NO
    * floating-point threshold: the cutoff is the exact integer rank
    * K = ⌈n·pct/100⌉ (a `round(percentile, 6) > value` filter would sit on
    * the cross-engine HALF_UP rounding trap; rank arithmetic cannot).
    * Values are compared, never computed on, so raw parquet doubles stay
    * bit-identical across engines; `event_id` breaks ties.
    *
    * Scale shape: one partial-agg'd count per type (broadcast back — a few
    * rows) + one window partitioned by type, so parallelism = type count;
    * for few huge types, pre-filter with an approximate per-partition
    * top-K before the exact window.
    */
  def topPercentByValue(events: DataFrame, pct: Int): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1,100], got $pct")
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id"))
    val counts = events.groupBy("event_type").agg(count(lit(1)).as("n"))
      .withColumn("k", expr(s"(n * $pct + 99) div 100"))
    events
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(counts), Seq("event_type"))
      .filter(col("rk") <= col("k"))
      .select(col("event_type"), col("event_id"), col("value"), col("rk"))
  }

  /** Bounded-state top-percent: the live-safe restatement of
    * [[topPercentByValue]]'s cutoff. The exact global-rank cutoff needs
    * every (type, value) ever seen — unbounded live — so this variant
    * folds values into UNIT-WIDTH INTEGER buckets (`floor(value)`) and
    * reads the cutoff off the per-type histogram: the highest bucket at
    * which the cumulative count from the top reaches K = ⌈n·pct/100⌉.
    * Deterministic sketch, not a randomized one (no KLL/t-digest seed):
    * integer floor is engine-exact, so the DuckDB oracle restates it
    * bit-for-bit and the streaming twin shares the hash gate. Resolution
    * contract: `n_kept ≥ k` always, overshooting by at most one bucket's
    * population — the value-domain resolution a deployment tunes by
    * scaling before flooring.
    *
    * Scale shape: one partial-agg'd groupBy(type, bucket) over the events
    * (the only pass over data), then windows over the HISTOGRAM — ≤
    * |domain| rows per type, bounded regardless of event count.
    */
  def topPercentHist(events: DataFrame, pct: Int): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1,100], got $pct")
    histCutoff(
      events.groupBy(col("event_type"),
          floor(col("value")).cast("long").as("bucket"))
        .agg(count(lit(1)).as("c")),
      pct)
  }

  /** Cutoff selection over a (event_type, bucket, c) histogram — shared
    * verbatim by the batch operator and the streaming drain so both sides
    * stay one implementation. Windows run over histogram rows only.
    */
  def histCutoff(hist: DataFrame, pct: Int): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val wDesc = byType.orderBy(col("bucket").desc)
    // buckets are unique per type post-aggregation and every count ≥ 1, so
    // `cum` strictly increases downward: the max-bucket qualifying row and
    // the min-cum qualifying row are the SAME row
    hist
      .withColumn("cum", sum(col("c")).over(wDesc))
      .withColumn("n_events", sum(col("c")).over(byType))
      .withColumn("k", expr(s"(n_events * $pct + 99) div 100"))
      .filter(col("cum") >= col("k"))
      .groupBy("event_type")
      .agg(max(col("n_events")).as("n_events"), max(col("k")).as("k"),
           max(col("bucket")).as("cutoff_bucket"),
           min(col("cum")).as("n_kept"))
  }

  /** Windowed event dedup: within each `windowMinutes` tumbling window, a
    * (user, event_type) keeps only its FIRST event (by ts, event_id) — the
    * at-least-once-ingest repair that collapses client retries and
    * double-fires before analytics. Returns the per-type audit (events
    * seen / kept / dropped); the kept set is the `rk = 1` frame upstream.
    *
    * The window bucket is integer floor-division of epoch-µs — engine-
    * exact, no timestamp truncation functions (whose week/DST rules
    * differ). One window shuffle keyed (user, type, bucket) — high
    * cardinality, so it parallelizes and cannot skew onto one key — then a
    * partial-agg'd groupBy(type). The streaming twin is
    * dropDuplicatesWithinWatermark keyed by the same triple.
    */
  def dedupWindow(events: DataFrame, windowMinutes: Int): DataFrame = {
    val bucketUs = windowMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id", "event_type", "bucket")
      .orderBy(col("ts"), col("event_id"))
    events
      // sign-safe FLOOR division (subtract the pmod first): Spark `div`
      // truncates toward zero while the oracle's `//` floors, so a bare
      // `div` would misalign windows for pre-epoch timestamps — the exact
      // ns-to-µs trap Tables.events' normalization comments on
      .withColumn("bucket", expr(
        s"(unix_micros(ts) - pmod(unix_micros(ts), ${bucketUs}L)) " +
          s"div ${bucketUs}L"))
      .withColumn("rk", row_number().over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"))
      .withColumn("n_dropped", col("n_events") - col("n_kept"))
  }

  /** Range join done scalably: for every "error" event (an incident),
    * count the same user's OTHER events within ±`windowMinutes` — the
    * blast-radius query behind incident triage. A naive `ON abs(ta - tb)
    * <= w` predicate gives Spark no equi-key and degenerates to a
    * broadcast-nested-loop join; instead each incident explodes to the
    * 2-3 fixed-width time buckets its window overlaps (bucket width =
    * window length bounds the fan-out) and events join on
    * (user_id, bucket) — a plain hash join — with the exact |Δt| <= w
    * range as a RESIDUAL filter in the join condition. Left join keeps
    * zero-neighbor incidents (n_nearby = 0): every incident gets an
    * audit row.
    *
    * Scale shape: fan-out is bounded (≤3 buckets per incident, each event
    * in exactly 1), the join is keyed by (user, bucket) — high
    * cardinality, shuffles cleanly — and the count partial-aggregates.
    * The same shape handles any interval join whose window is bounded;
    * unbounded intervals bucket by `ceil(len/width)` pieces instead.
    */
  def nearbyEventCounts(events: DataFrame, windowMinutes: Int): DataFrame = {
    val wUs = windowMinutes * 60L * 1000000L
    val inc = events.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"),
              col("user_id").as("inc_user"),
              unix_micros(col("ts")).as("inc_us"))
      .withColumn("bucket", explode(sequence(
        expr(s"(inc_us - ${wUs}L) div ${wUs}L"),
        expr(s"(inc_us + ${wUs}L) div ${wUs}L"))))
    // fully distinct names on the probe side: both frames derive from the
    // same `events`, and df("col") disambiguation is unreliable across a
    // self-join lineage
    val ev = events.select(col("user_id").as("ev_user"),
        col("event_id").as("ev_id"), unix_micros(col("ts")).as("ev_us"))
      .withColumn("ev_bucket", expr(s"ev_us div ${wUs}L"))
    inc.join(ev,
        col("inc_user") === col("ev_user") &&
          col("bucket") === col("ev_bucket") &&
          abs(col("ev_us") - col("inc_us")) <= wUs &&
          col("ev_id") =!= col("incident_id"),
        "left")
      .groupBy("incident_id")
      .agg(count(col("ev_id")).as("n_nearby"))
  }

  /** Join-key skew report: the `topK` hottest keys of `keyCol` with exact
    * counts and integer-ppm share of all events — the diagnostic run
    * BEFORE a big join to decide whether it needs salting or AQE skew
    * handling (the events_skew_join operator is the cure; this is the
    * X-ray). One partial-agg'd groupBy (state = one long per distinct key
    * per partition) and a driver-side top-K of the aggregated table —
    * |keys| rows, not |events|.
    */
  def keySkewReport(events: DataFrame, keyCol: String,
                    topK: Int): DataFrame = {
    val counts = events.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_events"))
    val tot = counts.agg(sum(col("n_events")).as("t"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("n_events * 1000000 div t"))
      .orderBy(col("n_events").desc, col("key"))
      .limit(topK)
      .select("key", "n_events", "share_ppm")
  }

  /** The bounded-state sketch twin of [[anomalyMad]]: median and MAD read
    * off the per-type UNIT-WIDTH INTEGER histogram (`floor(value)` — the
    * same deterministic bucketing as [[topPercentHist]], no randomized
    * quantile sketch), flag = bucket deviation > kSigma·MAD-bucket. Both
    * statistics are LOWER medians at bucket resolution (rank ⌈n/2⌉ on the
    * cumulative histogram — integer arithmetic end to end), so parity is
    * exact and the streaming twin can share this oracle; the exact
    * [[anomalyMad]] stays the audit gate, the same pairing discipline as
    * topPercentByValue/topPercentHist.
    *
    * Scale shape: ONE partial-agg'd groupBy over events (the only pass);
    * every window/join below it runs over histogram rows (≤ |value
    * domain| per type), bounded regardless of event count.
    */
  def anomalyMadHist(events: DataFrame, kSigma: Int = 3): DataFrame =
    madFromHist(
      events.groupBy(col("event_type"),
          floor(col("value")).cast("long").as("bucket"))
        .agg(count(lit(1)).as("c")),
      kSigma)

  /** Median/MAD/flag sweep over a (event_type, bucket, c) histogram —
    * shared verbatim by the batch operator and the streaming drain.
    */
  def madFromHist(hist: DataFrame, kSigma: Int): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val cum = hist
      .withColumn("cum", sum(col("c")).over(byType.orderBy(col("bucket"))))
      .withColumn("n", sum(col("c")).over(byType))
    val medB = cum.filter(expr("cum >= (n + 1) div 2"))
      .groupBy("event_type")
      .agg(min(col("bucket")).as("med_bucket"), max(col("n")).as("n_events"))
    val dev = hist.join(broadcast(medB), Seq("event_type"))
      .groupBy(col("event_type"), col("med_bucket"), col("n_events"),
               abs(col("bucket") - col("med_bucket")).as("dev"))
      .agg(sum(col("c")).as("c"))
    val cum2 = dev
      .withColumn("cum", sum(col("c")).over(byType.orderBy(col("dev"))))
    val madB = cum2.filter(expr("cum >= (n_events + 1) div 2"))
      .groupBy("event_type").agg(min(col("dev")).as("mad_bucket"))
    dev.join(broadcast(madB), Seq("event_type"))
      .groupBy("event_type")
      .agg(max(col("n_events")).as("n_events"),
           max(col("med_bucket")).as("med_bucket"),
           max(col("mad_bucket")).as("mad_bucket"),
           sum(when(col("dev") > lit(kSigma.toLong) * col("mad_bucket"),
             col("c")).otherwise(lit(0L))).as("n_anomalies"))
      .withColumn("anomaly_ppm", expr("n_anomalies * 1000000 div n_events"))
  }

  /** Engine-exact per-type median of `valueCol`, spelled out as windows
    * (row_number + count, middle-one-or-two average) instead of a
    * `percentile` call so the DuckDB oracle restates the identical
    * arithmetic — the average of at most two doubles is commutative, so
    * there is no accumulation-order trap. Tie-break on event_id makes the
    * middle rows unique even under duplicate values.
    */
  private def exactMedian(df: DataFrame, valueCol: String,
                          as: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col(valueCol), col("event_id"))
    df.withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(expr("rk = (n + 1) div 2 or rk = (n + 2) div 2"))
      .groupBy("event_type")
      .agg((sum(col(valueCol)) / count(lit(1))).as(as))
  }

  /** Robust per-type outlier report: median and MAD (median absolute
    * deviation) of `value`, and the count of events whose deviation
    * exceeds `kSigma`·MAD — the data-quality tripwire a training-data
    * ingest runs per source/feed (robust to the very outliers it hunts,
    * unlike mean/stddev z-scores). The flag comparison runs on
    * fixed-point longs (floor(dev·1e6+0.5) > k·floor(MAD·1e6+0.5)) so
    * boundary events verdict identically on both engines.
    *
    * Scale shape: exact medians need a per-type sort (two windowed passes
    * over events). At 100 TB the drop-in sketch path is the same
    * histogram-cutoff machinery as [[topPercentHist]] (bucket `value`,
    * read the 50% cutoff off the cumulative histogram) — this operator is
    * the exact gate the sketch is audited against, the same
    * exact/approximate pairing as topPercentByValue/topPercentHist.
    */
  def anomalyMad(events: DataFrame, kSigma: Int = 3): DataFrame = {
    val med = exactMedian(events, "value", "med")
    val dev = events.select("event_type", "event_id", "value")
      .join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = exactMedian(dev, "dev", "mad")
    dev.join(broadcast(mad), Seq("event_type"))
      .withColumn("is_anom",
        expr(s"cast(floor(dev * 1e6 + 0.5) as bigint) > " +
             s"$kSigma * cast(floor(mad * 1e6 + 0.5) as bigint)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           expr("cast(floor(max(med) * 1e6 + 0.5) as bigint)").as("med_fp"),
           expr("cast(floor(max(mad) * 1e6 + 0.5) as bigint)").as("mad_fp"),
           sum(when(col("is_anom"), 1L).otherwise(0L)).as("n_anomalies"))
      .withColumn("anomaly_ppm", expr("n_anomalies * 1000000 div n_events"))
  }
}
