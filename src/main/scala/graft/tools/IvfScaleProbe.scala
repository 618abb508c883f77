package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures whether `centroidEvery` is a growth lever for IVF — it is
  * NOT, and this probe is the evidence (r11).
  *
  * `topkCosineIvfAuto` probes a constant FRACTION f of the centroid
  * lists, so each query touches Θ(f·n) corpus rows no matter how the
  * lists are cut: centroid granularity trades centroid-scoring cost
  * against list length but cannot shrink the probed fraction. Measured
  * at n=20k (the ×10 rehearsal corpus): fixed `centroidEvery=50` vs
  * `√n=141` land within 4% of each other, falsifying the pre-r11
  * SCALE.md advice to scale `centroidEvery` with √n. The quadratic tail
  * of the all-vectors-as-queries rehearsal shape is definitional
  * (n queries × f·n candidates); the real levers are probeFraction,
  * fixed nProbe (recall decays), or a query set ≪ corpus.
  *
  * Usage: runMain graft.tools.IvfScaleProbe [dir] [reps]
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-scale/x10"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val n = emb.count()
    val sqrtEvery = math.max(50, math.round(math.sqrt(n.toDouble)).toInt)
    for ((label, every) <- Seq("fixed50" -> 50, s"sqrtN=$sqrtEvery" -> sqrtEvery)) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.VectorOps
          .topkCosineIvfAuto(emb, k = 5, centroidEvery = every)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ivfprobe] n=$n centroidEvery=$label%-12s " +
        s"runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
