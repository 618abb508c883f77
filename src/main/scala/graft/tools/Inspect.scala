package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic entry point: prints schemas and physical plans for ad-hoc
  * inspection while tuning (`.explain("formatted")` feedback loop).
  *
  * Usage: runMain graft.tools.Inspect <sfDir> [queryName]
  */
object Inspect {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.length > 1) {
      val q = graft.SparkEntry.queries(args(1))(spark, sfDir)
      q.explain("formatted")
      q.show(5, truncate = false)
    } else {
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      ev.printSchema()
      ev.show(3, truncate = false)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      docs.printSchema()
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      emb.printSchema()
    }
    spark.stop()
  }
}
