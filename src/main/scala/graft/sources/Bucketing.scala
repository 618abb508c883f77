package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle big join inputs ONCE at write time
  * so every subsequent equi-join on the bucket key runs exchange-free —
  * the 100 TB answer to "this join shuffles the fact table every run".
  *
  * `spark.read.parquet` cannot carry bucket metadata; bucketed data must
  * live as a table in the session catalog (`saveAsTable`), which is how a
  * production deployment stores the ledger and fact tables anyway.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (overwriting). Drops
    * any stale table AND its location first — an orphaned warehouse dir
    * from a previous session otherwise fails LOCATION_ALREADY_EXISTS.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key. With matching bucket
    * counts Spark plans a SortMergeJoin with NO ShuffleExchange on either
    * side (verify via `.explain`; asserted in BucketingSpec).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** True if the executed physical plan contains a shuffle exchange — the
    * thing bucketing exists to eliminate. Executes the frame first: under
    * AQE the final plan (and its exchanges) only materializes on run.
    */
  def hasShuffle(df: DataFrame): Boolean = {
    df.write.format("noop").mode(SaveMode.Overwrite).save()
    df.queryExecution.executedPlan.toString.contains("ShuffleExchange") ||
      df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
  }
}
