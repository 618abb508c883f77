package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config.{MappingConf, SyncConfig}
import graft.operators.{CopyExecutor, SyncOps}
import graft.sources.ObjectStoreCatalog

/** The library facade (reference `README.md:51-82` embedding sequence:
  * LoadConfig → NewDB → NewFactory → NewSynchronizer → SyncAll), re-expressed
  * as one logical plan per mapping (SURVEY.md §3.1):
  *
  *   scan(src) ⟕ ledger → filter(needs_sync) → copy(foreachPartition)
  *   → receipts → ledger latest-wins merge;
  *   scan(tgt) ▷ scan(src) → delete → ledger delete
  *
  * The SQLite ledger becomes a parquet state table partitioned by
  * mapping_id (partition pruning replaces the composite index,
  * database.go:156-157), rewritten atomically via temp-dir swap.
  */
class SyncEngine(spark: SparkSession, config: SyncConfig) {
  import SyncEngine._

  case class MappingReport(mappingId: String, synced: Long, skipped: Long,
                           failed: Long, orphansRemoved: Long)

  /** SyncAll (sync.go:32-53): per-mapping isolation — one failed mapping
    * logs and continues. One exception: a thread INTERRUPT is not a mapping
    * failure but the stop/SIGTERM path cancelling the in-flight cycle
    * (ContinuousSync.stop ≙ main.go:108-113) — it is logged as expected,
    * the interrupt flag is restored so the streaming engine's own
    * shutdown check sees it, and the remaining mappings are skipped
    * (running them against a stopping session would just fail one by one).
    */
  def syncAll(): Seq[MappingReport] = {
    val out = Seq.newBuilder[MappingReport]
    val it = config.mappings.iterator
    var interrupted = false
    while (!interrupted && it.hasNext) {
      val m = it.next()
      try out += syncMapping(m)
      catch {
        case e: Exception if isInterruption(e) =>
          System.err.println(s"[sync] mapping ${m.mappingId} cycle " +
            "interrupted (stop in progress) - expected; interrupted objects " +
            "re-sync next run via their ledger status")
          Thread.currentThread().interrupt()
          interrupted = true
        case e: Exception =>
          // log class + full stack, not just getMessage: an NPE's message is
          // null and a bare "failed: null" line is undiagnosable (the
          // reference logs the full error too, sync.go:43-47)
          System.err.println(
            s"[sync] mapping ${m.mappingId} failed: ${e.getClass.getName}: " +
              s"${e.getMessage}")
          e.printStackTrace()
      }
    }
    out.result()
  }

  /** True when the exception is (or wraps) a thread interrupt / job
    * cancellation — Spark surfaces a stop() interrupt variously as a raw
    * InterruptedException (AQE's result queue, DAGScheduler awaits) or a
    * SparkException whose message or cause chain records the cancellation.
    */
  private def isInterruption(e: Throwable): Boolean = {
    var t = e
    var depth = 0
    while (t != null && depth < 10) {
      t match {
        case _: InterruptedException => return true
        case s: org.apache.spark.SparkException
          if s.getMessage != null &&
            (s.getMessage.contains("CANCELLED") ||
             s.getMessage.contains("cancelled")) => return true
        case _ =>
      }
      t = t.getCause
      depth += 1
    }
    false
  }

  /** SyncBuckets (sync.go:56-176) as a relational plan + two executors. */
  def syncMapping(m: MappingConf): MappingReport = {
    val srcUri = config.sourceUri(m)
    val dstUri = config.targetUri(m)
    val mid = m.mappingId

    // 1-4: scans + DDL (bucket_exists_guard gives empty catalog, not error)
    val srcCatalog = ObjectStoreCatalog.scanCatalog(spark, srcUri).cache()
    val tgtCatalog = ObjectStoreCatalog.scanCatalog(spark, dstUri)
    ObjectStoreCatalog.ensureBucket(spark, dstUri)

    // 5-6b: diff join + predicate (replaces the reference's N+1 loop)
    val ledger = readLedger(spark, config.ledgerPath)
    val decided = SyncOps.catalogLedgerDiff(srcCatalog, ledger, mid).cache()
    val toCopy = SyncOps.needsSync(decided)

    // 6c-6d: distributed stream copy. Receipts MUST be materialized before
    // reuse: the executor is side-effecting, and a lazy plan would re-run
    // the copies once per downstream action.
    val receipts = materialize(spark,
      CopyExecutor.copyObjects(spark, toCopy, srcUri, dstUri).toDF(),
      config.ledgerPath + ".scratch/copy_receipts")

    // 6e: ledger upsert from receipts (sync.go:179-196) — receipt status
    // joined back to source metadata, then latest-wins merge
    val updates = toCopy.alias("t")
      .join(receipts.alias("r"), col("t.name") === col("r.object_name"))
      .select(
        lit(0L).as("id"),
        lit(mid).as("mapping_id"),
        col("t.name").as("object_name"),
        col("t.size"),
        col("t.last_modified"),
        col("t.etag"),
        col("t.content_type"),
        current_timestamp().as("last_synced"),
        col("r.sync_status"),
        col("t.metadata"))
    // driver-side collect is BOUNDED: syncOutcomeCounts groups by
    // sync_status, so this frame is ≤ |distinct statuses| rows (3) per
    // mapping regardless of catalog size
    val counts = SyncOps.syncOutcomeCounts(decided, mid)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val failed = updates.filter(col("sync_status") =!= "success").count()

    // 8: orphans — delete from target, then from ledger (sync.go:199-234);
    // failed deletes keep their ledger rows (sync.go:217-221)
    val orphans = SyncOps.orphanAntiJoin(tgtCatalog, srcCatalog)
    val deleteReceipts = materialize(spark,
      CopyExecutor.deleteObjects(spark, orphans, dstUri).toDF(),
      config.ledgerPath + ".scratch/delete_receipts")
    val removedNames = deleteReceipts.filter(col("removed"))
      .select(col("object_name").as("name"))
    val removed = removedNames.count()

    // reference ON-CONFLICT upsert semantics: the batch's rows win
    // unconditionally — anti-join+union, no window sort over the ledger
    val merged = SyncOps.ledgerUpsert(ledger, updates)
    // keyed delete: only this mapping's rows for successfully-removed names
    val doomed = removedNames.select(lit(mid).as("mapping_id"),
                                     col("name").as("object_name"))
    val afterDelete = merged.join(doomed, Seq("mapping_id", "object_name"),
                                  "left_anti")
    writeLedger(spark, afterDelete, config.ledgerPath)

    MappingReport(mid,
      synced = counts.getOrElse("sync_new", 0L) +
               counts.getOrElse("sync_changed", 0L) +
               counts.getOrElse("sync_retry", 0L) - failed,
      skipped = counts.getOrElse("skip", 0L),
      failed = failed,
      orphansRemoved = removed)
  }

  /** Continuous mode (main.go:87-106): initial sync, then fixed-interval
    * re-execution — each cycle stateless except the ledger, exactly the
    * reference's ticker semantics.
    */
  def runContinuously(intervalMs: Long, cycles: Int = Int.MaxValue): Unit = {
    var i = 0
    while (i < cycles) {
      syncAll()
      i += 1
      if (i < cycles) Thread.sleep(intervalMs)
    }
  }
}

object SyncEngine {

  /** Execute-once barrier for side-effecting executor outputs: dump to a
    * scratch parquet and read back, so downstream actions replay the file,
    * not the side effects.
    */
  def materialize(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).parquet(path)
    spark.read.parquet(path)
  }

  /** v3 adds `metadata`: the reference DROPS user metadata at the ledger
    * and lists full propagation as future work (`README.md:373-375`); here
    * the catalog's MAP<STRING,STRING> survives the merge. Excluded from
    * oracle parity projections (map columns can't be sorted/hashed by the
    * DuckDB compare, SURVEY §7.4) and from the upsert tie-break (maps are
    * unorderable — see SyncOps.ledgerUpsert).
    */
  val LedgerSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("mapping_id", StringType),
    StructField("object_name", StringType), StructField("size", LongType),
    StructField("last_modified", TimestampType), StructField("etag", StringType),
    StructField("content_type", StringType),
    StructField("last_synced", TimestampType),
    StructField("sync_status", StringType),
    StructField("metadata", MapType(StringType, StringType), nullable = true)))

  def readLedger(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty) {
      // read with the stored schema first: a pre-mapping (v1) ledger must
      // be migrated, not silently null-filled by a forced schema
      val stored = spark.read.parquet(path)
      val (migrated, _) = LedgerMigrations.migrate(stored)
      migrated.select(LedgerSchema.fieldNames.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
    } else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                            LedgerSchema)
  }

  /** Atomic-enough rewrite: write to `<path>.tmp`, then swap. (Delta MERGE
    * would be the managed idiom; not in the offline jar set — SURVEY §7.4.)
    * Partitioned by mapping_id so per-mapping reads prune.
    */
  def writeLedger(spark: SparkSession, ledger: DataFrame, path: String): Unit = {
    val tmp = path + ".tmp"
    ledger.write.mode(SaveMode.Overwrite).partitionBy("mapping_id").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(dst)) fs.rename(dst, old)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    if (fs.exists(old)) fs.delete(old, true)
  }
}
