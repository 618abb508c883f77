package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Ad-hoc stage profiling for the text pipeline hotspots. */
object ProfileText {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def t(name: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[prof] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
      }
    }

    t("read_only")(docs.count())
    t("tokens")(docs.select(explode(TextOps.tokens(col("text")))).count())
    t("shingles")(docs.select(
      explode(TextOps.shingles(TextOps.tokens(col("text")), 3))).count())
    t("shingles+md5")(docs.select(
      md5(explode(TextOps.shingles(TextOps.tokens(col("text")), 3)))).count())
    t("shingles+md5+groupByMin")(docs.select(
      col("doc_id"),
      explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sh"))
      .groupBy("doc_id").agg(min(md5(col("sh")))).count())
    spark.stop()
  }
}
