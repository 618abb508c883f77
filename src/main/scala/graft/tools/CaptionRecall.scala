package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Measured recall of `multimodal_caption_match`'s banded FOREIGN screen
  * against the exact cross screen — the accuracy contract the ANN family
  * already carries (tools.Recall), extended to the cross-modal operator.
  * The OWN half (matched / n_own_hits) is an exact media-keyed equi-join
  * since r16 and carries NO recall caveat, so only the foreign
  * (mislabeled-pair review queue) side is measured:
  *
  *  - foreign PAIR recall: of all cross-media (caption, frame) pairs
  *    with exact cosine ≥ τ, the share the banded+capped candidates
  *    surface;
  *  - review-queue MEDIA recall: of all media with ≥1 exact foreign hit,
  *    the share the declared operator reports with n_foreign_hits > 0.
  *
  * Ground truth is the O(|captions|·|frames|) cross join — TOOL-side
  * only, never in a declared query.
  * Usage: runMain graft.tools.CaptionRecall <sfDir>[,<sfDir>...] [tau]
  */
object CaptionRecall {
  def main(args: Array[String]): Unit = {
    val sfDirs = args(0).split(',').toSeq
    val tau = if (args.length > 1) args(1).toDouble else 0.9
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.ArrayMath.{dot_product, l2_norm}

    println(s"caption-match FOREIGN-screen recall vs exact cross, tau=$tau")
    println("| sfDir | foreign pair recall | review-queue media recall | exact foreign pairs |")
    println("|---|---|---|---|")
    sfDirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val caps = Multimodal.captionVectors(docs)
        .withColumn("nc", l2_norm(col("cv")))
      val feats = Multimodal.frameFeatures(
          Multimodal.frameSample(Multimodal.mediaFromDocuments(docs), 64, 2))
        .withColumn("nf", l2_norm(col("embedding")))
      val exact = caps.crossJoin(feats)
        .filter(expr(s"vec_id div ${Multimodal.FrameIdShift}L")
          =!= col("media_id"))
        .withColumn("sim", round(
          dot_product(col("cv"), col("embedding")) /
            (col("nc") * col("nf")), 6))
        .filter(col("sim") >= tau)
        .select("media_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = Multimodal.captionFrameHits(docs, tau)
        .filter(!col("own"))
        .select("media_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def ratio(hit: Int, tot: Int) =
        if (tot == 0) Double.NaN else hit.toDouble / tot
      val pr = ratio((approx & exact).size, exact.size)
      val exactMedia = exact.map(_._1)
      val approxMedia = approx.map(_._1)
      val mr = ratio((approxMedia & exactMedia).size, exactMedia.size)
      println(f"| $dir | $pr%.3f | $mr%.3f | ${exact.size} |")
    }
    spark.stop()
  }
}
