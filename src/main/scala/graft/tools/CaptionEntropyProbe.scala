package graft.tools

import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, VectorOps}

/** Falsification rehearsal for the caption-match foreign screen's r16
  * superlinearity claim (VERDICT r16 watch item): the ×1→×10 curve of
  * `multimodal_caption_match` (2.6 → 55.9 s) was ATTRIBUTED to the 8-dim
  * low-entropy STUB byte-features saturating the 2^16-bucket band space —
  * occupancy, not candidate rate, grows with n, so hot buckets pair
  * quadratically until the `maxBucket` cap binds. The claim predicts that
  * HIGH-ENTROPY features (real CLIP towers: ≥64-dim, near-random signs)
  * spread collisions to ≈ bands·n·m/2^16 expected candidates with bounded
  * bucket occupancy — the regime where the screen's cost is the scan, not
  * the bucket fan-out.
  *
  * This probe drives the EXACT declared foreign-screen plan
  * (Multimodal.captionFrameHitsFrom — the code path of
  * Multimodal.captionFrameHits, split vector-parametric so no
  * re-implementation drifts) across ×1/×2/×4/×10 in two regimes:
  *
  *  - `hientropy`: synthetic 64-dim random-sign caption/frame vectors
  *    (deterministic, id-seeded — the CLIP-shaped regime), sized to the
  *    sf0.1 stub corpus at ×1 (5k captions, ~16 frames/media);
  *  - `stub`: the actual 8-dim byte-statistics features over
  *    ScaleRehearsal.scaledDocuments — the declared query's regime, with
  *    the shipped maxBucket=1024 cap (BINDING at ×10: the probe reports
  *    how many hub buckets the cap drops and the uncapped max occupancy).
  *
  * Per row it emits wall seconds, the PRE-verify candidate volume
  * (Σ_band over capped buckets of caption-occupancy × frame-occupancy —
  * the join's true fan-out), max/dropped bucket occupancy, and the
  * predicted random-spread candidate count bands·n·m/2^16 for comparison.
  *
  * Usage: runMain graft.tools.CaptionEntropyProbe [out.jsonl]
  *   SPARK_GRAFT_SRC    (default /root/testdata/sf0.1; stub regime input)
  *   SPARK_GRAFT_SCALES (default "1,2,4,10")
  */
object CaptionEntropyProbe {

  /** Deterministic random-sign vector: SplitMix64 over (seed, component)
    * — id-seeded so re-runs and partitionings agree, high-entropy by
    * construction (each component an independent coin).
    */
  def signVec(seed: Long, dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    var i = 0
    var x = seed
    while (i < dim) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      out(i) = if ((z & 1L) == 0L) 1.0 else -1.0
      i += 1
    }
    out
  }

  /** Synthetic high-entropy sides at scale s: s·5000 captions, 16 frames
    * per media — the sf0.1 stub corpus's shape with CLIP-shaped vectors.
    */
  def hiEntropySides(spark: SparkSession, s: Int,
                     dim: Int = 64): (DataFrame, DataFrame) = {
    import spark.implicits._
    val nCaps = 5000L * s
    val framesPer = 16
    val sh = Multimodal.FrameIdShift
    val caps = spark.range(0L, nCaps, 1L, 32)
      .as[Long].map(i => (i, signVec(i, dim)))
      .toDF("media_id", "cv")
    val feats = spark.range(0L, nCaps, 1L, 32)
      .as[Long].flatMap { m =>
        (0 until framesPer).map { j =>
          (m * sh + j, signVec(m * 1000003L + j + 7L, dim))
        }
      }
      .toDF("vec_id", "embedding")
    (caps, feats)
  }

  /** The stub regime's sides over the scaled documents corpus. */
  def stubSides(spark: SparkSession, srcDir: String,
                s: Int): (DataFrame, DataFrame) = {
    val docs = ScaleRehearsal.scaledDocuments(
      spark.read.parquet(s"$srcDir/documents.parquet"), s)
    (Multimodal.captionVectors(docs),
     Multimodal.frameFeatures(
       Multimodal.frameSample(Multimodal.mediaFromDocuments(docs), 64, 2)))
  }

  case class Occ(nCaps: Long, nFrames: Long, candVolume: Long,
                 maxBucket: Long, droppedBuckets: Long)

  /** Band-occupancy accounting for the screen's candidate join: exact
    * per-bucket caption×frame products under the cap (the join's true
    * fan-out), the uncapped max frame-bucket occupancy, and how many hub
    * buckets the cap drops.
    */
  def occupancy(caps: DataFrame, feats: DataFrame, dim: Int, bands: Int,
                rowsPerBand: Int, cap: Int): Occ = {
    val fOcc = feats.select(explode(array(VectorOps.bandKeyCols(
        col("embedding"), dim, bands, rowsPerBand): _*)).as("band"))
      .groupBy("band").agg(count(lit(1)).as("fm"))
    val cOcc = caps.select(explode(array(VectorOps.bandKeyCols(
        col("cv"), dim, bands, rowsPerBand): _*)).as("band"))
      .groupBy("band").agg(count(lit(1)).as("cm"))
    val j = fOcc.join(cOcc, Seq("band"))
    val row = j.agg(
      coalesce(sum(when(col("fm") <= cap, col("fm") * col("cm"))
        .otherwise(0L)), lit(0L)).as("vol"),
      coalesce(max(col("fm")), lit(0L)).as("mx"),
      coalesce(sum(when(col("fm") > cap, 1L).otherwise(0L)), lit(0L))
        .as("dropped")).head()
    Occ(caps.count(), feats.count(), row.getLong(0), row.getLong(1),
        row.getLong(2))
  }

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("rehearsal_r17_entropy.jsonl")
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SRC", "/root/testdata/sf0.1")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,2,4,10")
      .split(',').map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = new java.io.PrintWriter(new java.io.FileWriter(outPath, true))
    val tau = 0.9
    val cap = 1024
    println("| regime | scale | caps | frames | screen wall s | cand volume | bands·n·m/2^16 | max fbucket | buckets dropped |")
    println("|---|---|---|---|---|---|---|---|---|")
    try {
      for (regime <- Seq("hientropy", "stub"); s <- scales) {
        val dim = if (regime == "hientropy") 64 else 8
        val (caps, feats) = if (regime == "hientropy")
          hiEntropySides(spark, s, dim) else stubSides(spark, srcDir, s)
        // cache the sides: the probe times the SCREEN, not vector synth
        val c = caps.cache(); val f = feats.cache()
        val occ = occupancy(c, f, dim, bands = 4, rowsPerBand = 16, cap)
        val t0 = System.nanoTime()
        val hits = Multimodal.captionFrameHitsFrom(c, f, tau, dim,
          bands = 4, rowsPerBand = 16, maxBucket = cap)
          .filter(!col("own")).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val predicted = 4L * occ.nCaps * occ.nFrames / 65536L
        val line = String.format(Locale.ROOT,
          """{"probe":"caption_entropy","regime":"%s","scale":%d,"n_caps":%d,"n_frames":%d,"screen_wall_s":%.3f,"cand_volume":%d,"predicted_random":%d,"max_fbucket":%d,"buckets_dropped":%d,"foreign_hits":%d}""",
          regime, Int.box(s), Long.box(occ.nCaps), Long.box(occ.nFrames),
          Double.box(wall), Long.box(occ.candVolume), Long.box(predicted),
          Long.box(occ.maxBucket), Long.box(occ.droppedBuckets),
          Long.box(hits))
        out.println(line); out.flush()
        println(String.format(Locale.ROOT,
          "| %s | x%d | %d | %d | %.2f | %d | %d | %d | %d |",
          regime, Int.box(s), Long.box(occ.nCaps), Long.box(occ.nFrames),
          Double.box(wall), Long.box(occ.candVolume), Long.box(predicted),
          Long.box(occ.maxBucket), Long.box(occ.droppedBuckets)))
        c.unpersist(); f.unpersist()
      }
    } finally {
      out.close()
      spark.stop()
    }
  }
}
