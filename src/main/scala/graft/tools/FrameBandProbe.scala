package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the frame-banding CANDIDATE VOLUME — Σ over bands of
  * C(members, 2), the exact pair count the band machine emits — across
  * corpus scales and band parameterizations, quantifying SCALE.md's
  * r12 lever claim: 16-bit bands over correlated 8-dim byte features
  * lose collision control as the corpus grows; wider band keys restore
  * it at a priced recall cost (collision ∝ p^bits per band).
  *
  * Pure batch aggregation (explode band keys → groupBy count → Σ m(m-1)/2),
  * so the probe prices the volume without paying the stream drain that
  * OOM'd the uncapped ×4 rehearsal.
  *
  * Usage: runMain graft.tools.FrameBandProbe <sfDir>[,<sfDir>...]
  */
object FrameBandProbe {

  def candidateVolume(spark: SparkSession, dir: String,
                      bands: Int, rowsPerBand: Int): (Long, Long) = {
    import graft.operators.{Multimodal, VectorOps}
    val feats = Multimodal.frameFeatures(
      Multimodal.frameSample(
        Multimodal.mediaFromDocuments(
          graft.sources.Tables.documents(spark, dir)), 64, 2), dim = 8)
    val perBand = feats
      .select(col("vec_id"),
        explode(array(VectorOps.bandKeyCols(col("embedding"), 8,
          bands, rowsPerBand): _*)).as("band"))
      .groupBy("band").agg(count(lit(1)).as("m"))
    // coalesce: zero band rows (empty / all-malformed corpus) aggregate
    // to NULL, and the probe should report 0 pairs, not NPE mid-sweep
    val row = perBand.agg(
      coalesce(sum(expr("m * (m - 1) div 2")), lit(0L)).as("pairs"),
      coalesce(max(col("m")), lit(0L)).as("densest")).head()
    (row.getLong(0), row.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("| corpus | bands×bits | candidate pairs | densest band |")
    println("|---|---|---|---|")
    for (d <- dirs; (b, r) <- Seq((4, 16), (2, 32))) {
      val (pairs, densest) = candidateVolume(spark, d, b, r)
      println(s"| $d | ${b}×$r | $pairs | $densest |")
    }
    // the recall side of the dial: VERIFIED (sim ≥ 0.99) pair yield per
    // parameterization — what the wider bands actually lose
    import graft.operators.{Multimodal, VectorOps}
    println()
    println("| corpus | bands×bits | verified pairs (sim ≥ 0.99) |")
    println("|---|---|---|")
    for (d <- dirs; (b, r) <- Seq((4, 16), (2, 32))) {
      val feats = Multimodal.frameFeatures(
        Multimodal.frameSample(
          Multimodal.mediaFromDocuments(
            graft.sources.Tables.documents(spark, d)), 64, 2), dim = 8)
      val n = VectorOps.nearDupCosine(feats, 0.99, dim = 8,
        bands = b, rowsPerBand = r).count()
      println(s"| $d | ${b}×$r | $n |")
    }
    spark.stop()
  }
}
