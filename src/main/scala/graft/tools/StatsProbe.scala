package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the iterative-loop stats-compounding problem (r11).
  *
  * Spark ≥3.4 `localCheckpoint` copies the PRODUCING plan's size
  * estimate into the checkpointed `LogicalRDD` (`originStats`), and
  * Catalyst's size-only join estimate is the PRODUCT of child sizes — so
  * in an iterative loop each round's estimate multiplies the previous
  * round's, the BigInt's digit count grows geometrically, and after
  * enough rounds the driver spends minutes inside
  * `BigInteger.multiplyToomCook3` just PLANNING a round.
  *
  * This probe runs min-label propagation rounds on a path graph and
  * prints the digit count of `optimizedPlan.stats.sizeInBytes` per
  * round, for (a) neighbor-only propagation and (b) neighbor+jump —
  * measuring the actual growth law so the fix targets the real
  * mechanism. Usage: runMain graft.tools.StatsProbe [nNodes] [rounds]
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 40
    val rounds = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def run(jump: Boolean): Unit = {
      val nodes = (1L to n.toLong).toDF("doc_id")
      val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong))
        .toDF("doc_a", "doc_b")
      val sym = edges
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionAll(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .localCheckpoint(true)
      var labels = nodes
        .select(col("doc_id"), col("doc_id").as("cluster_id"))
        .localCheckpoint(true)
      for (r <- 1 to rounds) {
        val nbrMin = sym
          .join(labels.select(col("doc_id").as("dst"),
                              col("cluster_id").as("dst_lab")), Seq("dst"))
          .groupBy(col("src").as("doc_id"))
          .agg(min(col("dst_lab")).as("nbr_min"))
        var next = labels
          .join(nbrMin, Seq("doc_id"), "left_outer")
        if (jump) {
          val j = labels
            .join(labels.select(col("doc_id").as("cluster_id"),
                                col("cluster_id").as("jump_lab")),
                  Seq("cluster_id"))
            .select(col("doc_id"), col("jump_lab"))
          next = next.join(j, Seq("doc_id"))
        }
        val out = (if (jump)
          next.select(col("doc_id"),
            least(col("cluster_id"),
                  coalesce(col("nbr_min"), col("cluster_id")),
                  col("jump_lab")).as("cluster_id"))
        else
          next.select(col("doc_id"),
            least(col("cluster_id"),
                  coalesce(col("nbr_min"), col("cluster_id")))
              .as("cluster_id")))
          .localCheckpoint(true)
        val t0 = System.nanoTime()
        val digits = out.queryExecution.optimizedPlan.stats
          .sizeInBytes.toString.length
        val dt = (System.nanoTime() - t0) / 1e6
        println(f"[probe] jump=$jump round=$r digits=$digits statsMs=$dt%.1f")
        labels = out
      }
    }
    run(jump = false)
    run(jump = true)
    spark.stop()
  }
}
