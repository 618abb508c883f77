package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) which splits oversized shuffle partitions at runtime.
  * Salting is for the cases AQE can't fix: a broadcast-ineligible join
  * where one key dominates (a hot mapping_id, a celebrity user_id) — the
  * classic manual remedy AQE still needs sorted-shuffle room for.
  */
object SkewOps {

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, buckets); the small side is exploded ×buckets so every salted key
    * finds its match. One shuffle on (key, salt) with `buckets`× better
    * balance; cost = duplicating the small side `buckets` times.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    val salted = large.withColumn("_salt",
      (rand(seed = 42) * buckets).cast("int"))
    val expanded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(expanded, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Top-N heavy-hitter keys with frequencies — the diagnostic that decides
    * between broadcast, salting, or AQE-only. One pass, partial aggregation.
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)

  /** Fraction of rows held by the single hottest key — quick skew metric. */
  def skewFactor(df: DataFrame, key: String): Double = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("total"))
      .head()
    val mx = counts.getLong(0); val total = counts.getLong(1)
    if (total == 0) 0.0 else mx.toDouble / total
  }
}
