package graft.tools

import org.apache.spark.sql.SparkSession

/** Steady-state timing of one named query: runs it N times in one JVM so
  * codegen/JIT warmup separates from per-run cost.
  * Usage: runMain graft.tools.Time <sfDir> <queryName> [reps]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val reps = if (args.length > 2) args(2).toInt else 3
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
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[time] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      // same per-rep cache hygiene as Bench, so warm reps measure the plan,
      // not accumulated pinned blocks
      spark.sparkContext.getPersistentRDDs.values
        .foreach(graft.operators.Barriers.quietUnpersist)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
