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

  /** `events.ts` is nanosecond-precision parquet; Spark's TimestampType is
    * microseconds. Read it defensively and normalize `ts` to TimestampType
    * so downstream window/sessionize operators are precision-stable.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = table(spark, dir, "events")
    df.schema("ts").dataType.typeName match {
      case "long" => // read as raw nanos (legacy nanosAsLong); convert.
        // MUST be integer FLOOR division: `/` promotes to double (rounds
        // the low µs digit at 1.7e18), and bare `div` truncates toward
        // zero, which disagrees with DuckDB's ns→µs floor for pre-epoch
        // values (verified: -1.5µs casts to -2µs there). The mod-adjust
        // makes div floor for any sign.
        df.withColumn("ts", timestamp_micros(
          expr("(ts - (((ts % 1000) + 1000) % 1000)) div 1000")))
      case _ => df
    }
  }
}
