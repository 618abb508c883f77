package graft.tools

import org.apache.spark.sql.{Row, SaveMode, SparkSession}

/** Measures the r14 partition-scoped ledger commit against the old
  * whole-table read-merge-swap on a synthetic many-mapping ledger: the
  * claim under test is that commit cost is O(|touched mapping|), not
  * O(total ledger) — the r13 verdict's one product-path scale liability.
  *
  * Usage: runMain graft.tools.LedgerCommitProbe [mappings] [rowsPerMapping]
  * Prints per-commit seconds for (a) partition-scoped commit of ONE
  * mapping and (b) a whole-table rewrite of the same merge, at 1× and 4×
  * the mapping count — the whole-table cost grows with total ledger size,
  * the partition cost must stay flat.
  */
object LedgerCommitProbe {
  def main(args: Array[String]): Unit = {
    val mappings = if (args.length > 0) args(0).toInt else 32
    val rows = if (args.length > 1) args(1).toInt else 20000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def mkLedger(path: String, nMap: Int): Unit = {
      val df = spark.range(nMap.toLong * rows).select(
        col("id"),
        concat(lit("m"), (col("id") % nMap).cast("string")).as("mapping_id"),
        concat(lit("obj"), col("id").cast("string")).as("object_name"),
        (col("id") % 1000000).as("size"),
        to_timestamp(lit("2026-01-01 00:00:00")).as("last_modified"),
        md5(col("id").cast("string")).as("etag"),
        lit("text/plain").as("content_type"),
        to_timestamp(lit("2026-01-01 00:00:00")).as("last_synced"),
        lit("success").as("sync_status"),
        map(lit("k"), lit("v")).as("metadata"))
      graft.SyncEngine.writeLedger(spark, df, path)
    }
    def updateBatch(mid: String): org.apache.spark.sql.DataFrame =
      spark.range(rows / 10).select(
        col("id"),
        lit(mid).as("mapping_id"),
        concat(lit("obj"), col("id").cast("string")).as("object_name"),
        (col("id") % 1000000 + 1).as("size"),
        to_timestamp(lit("2026-02-01 00:00:00")).as("last_modified"),
        md5(concat(col("id").cast("string"), lit("v2"))).as("etag"),
        lit("text/plain").as("content_type"),
        to_timestamp(lit("2026-02-01 00:00:00")).as("last_synced"),
        lit("success").as("sync_status"),
        map(lit("k"), lit("v")).as("metadata"))

    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    for (scale <- Seq(1, 4)) {
      val nMap = mappings * scale
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-commit-probe-$nMap")
      val path = s"$root/ledger"
      mkLedger(path, nMap)
      val mid = "m0"
      // (a) partition-scoped: the shipped commit path
      val part = (1 to 3).map { _ =>
        time {
          val base = graft.SyncEngine.readLedgerPartition(spark, path, mid)
          val merged = graft.operators.SyncOps.ledgerUpsert(base, updateBatch(mid))
          graft.SyncEngine.writeLedgerPartition(spark, merged, path, mid)
        }
      }.sorted.apply(1)
      // (b) whole-table: the pre-r14 shape (read ALL, merge, rewrite ALL)
      val whole = (1 to 3).map { _ =>
        time {
          val base = graft.SyncEngine.readLedger(spark, path)
          val merged = graft.operators.SyncOps.ledgerUpsert(base, updateBatch(mid))
          graft.SyncEngine.writeLedger(spark, merged, path)
        }
      }.sorted.apply(1)
      println(f"[commit-probe] mappings=$nMap%4d rows=${nMap.toLong * rows}%9d  " +
        f"partition-scoped $part%.3f s  whole-table $whole%.3f s  " +
        f"ratio ${whole / part}%.1f x")
    }
    spark.stop()
  }
}
