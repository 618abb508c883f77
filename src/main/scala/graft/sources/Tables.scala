package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All engine operators take DataFrames as input; these helpers are the only
  * place that knows the on-disk layout. Filters/projections applied by
  * callers are pushed into the parquet scan by Catalyst (verify with
  * `.explain("formatted")` → `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Normalize an `events`-shaped frame so `ts` is always TimestampType.
    *
    * The driver has regenerated the testdata with a different `ts` encoding
    * more than once (long nanos under the legacy parquet flag, then
    * `timestamp[us] isAdjustedToUTC=false` which Spark reads as
    * TIMESTAMP_NTZ), so the reader is defensive across all three shapes.
    * Shared by the batch reader below and the streaming reader
    * (StreamingOps) so both stay in lockstep; SmokeGateSpec asserts the
    * post-normalization type.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.schema("ts").dataType.typeName match {
      case "long" => // read as raw nanos (legacy nanosAsLong); convert.
        // MUST be integer FLOOR division: `/` promotes to double (rounds
        // the low µs digit at 1.7e18), and bare `div` truncates toward
        // zero, which disagrees with DuckDB's ns→µs floor for pre-epoch
        // values (verified: -1.5µs casts to -2µs there). The mod-adjust
        // makes div floor for any sign.
        df.withColumn("ts", timestamp_micros(
          expr("(ts - (((ts % 1000) + 1000) % 1000)) div 1000")))
      case "timestamp_ntz" =>
        // The NTZ→LTZ cast relabels the same micros value ONLY under a UTC
        // session TZ (any other zone shifts every event time). Every entry
        // point pins spark.sql.session.timeZone=UTC; assert it here so a
        // future entry point without the pin fails loudly instead of
        // silently skewing the whole events table.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"normalizeEventTs: TIMESTAMP_NTZ events require session " +
            s"timeZone=UTC (exact relabel); got '$tz'")
        df.withColumn("ts", col("ts").cast("timestamp"))
      case "timestamp" => df
      case other => sys.error(
        s"events.ts arrived as unsupported type '$other'; extend Tables.normalizeEventTs")
    }
  }

  /** `events.ts` normalized to TimestampType regardless of on-disk encoding. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(table(spark, dir, "events"))
}
