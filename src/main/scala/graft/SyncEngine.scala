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

  /** Concurrent mapping sync — implements the reference's own roadmap
    * item (`README.md:345-347` lists concurrent mapping sync as future
    * work; the shipped loop is sequential, `sync.go:33-50`).
    *
    * Mappings run in a bounded driver-side pool, so Spark schedules all
    * mappings' jobs together and one mapping's small/skewed plan no
    * longer leaves executors idle. Isolation analysis: ledger rows are
    * keyed (mapping_id, object_name) and every mapping reads/writes ONLY
    * its own mapping_id, so the single shared resource is the ledger
    * TABLE REWRITE (read-merge-swap) — serialized under [[SyncEngine
    * .ledgerLock]], while the heavy phases (catalog scans, diff join,
    * distributed copy, orphan delete) overlap freely. Each mapping diffs
    * against an eagerly-pinned ledger SNAPSHOT (localCheckpoint) so a
    * concurrent commit's directory swap cannot invalidate in-flight
    * reads, and commits re-read the CURRENT ledger under the lock so no
    * update is lost (per-mapping rows are disjoint, so last-committer
    * cannot clobber). Per-mapping failure isolation matches
    * [[syncAll()]]: a failed mapping logs and the rest complete; an
    * interrupt (stop in progress) aborts mappings not yet started.
    *
    * Caveat, documented not hidden: mappings whose TARGET prefixes
    * overlap should stay sequential — one mapping's orphan deletion can
    * race another's copies, the same hazard the reference's future-work
    * item would face. Disjoint targets (the normal shape) are safe.
    */
  def syncAll(concurrency: Int): Seq[MappingReport] = {
    require(concurrency >= 1, s"concurrency must be >= 1, got $concurrency")
    if (concurrency == 1 || config.mappings.size <= 1) return syncAll()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(concurrency, config.mappings.size))
    val aborted = new java.util.concurrent.atomic.AtomicBoolean(false)
    try {
      val tasks = config.mappings.map { m =>
        pool.submit(new java.util.concurrent.Callable[Option[MappingReport]] {
          def call(): Option[MappingReport] =
            if (aborted.get()) None
            else try Some(syncMapping(m, concurrent = true))
            catch {
              case e: Exception if isInterruption(e) =>
                System.err.println(s"[sync] mapping ${m.mappingId} cycle " +
                  "interrupted (stop in progress) - expected; interrupted " +
                  "objects re-sync next run via their ledger status")
                aborted.set(true)
                None
              case e: Exception =>
                System.err.println(
                  s"[sync] mapping ${m.mappingId} failed: " +
                    s"${e.getClass.getName}: ${e.getMessage}")
                e.printStackTrace()
                None
            }
        })
      }
      tasks.flatMap(t => t.get())
    } finally pool.shutdown()
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
  def syncMapping(m: MappingConf): MappingReport =
    syncMapping(m, concurrent = false)

  private def syncMapping(m: MappingConf, concurrent: Boolean): MappingReport = {
    val srcUri = config.sourceUri(m)
    val dstUri = config.targetUri(m)
    val mid = m.mappingId
    // scratch dirs are per-mapping so concurrent mappings cannot clobber
    // each other's receipts; sanitized because mapping ids carry ':'/'>'
    // which Hadoop Path parsing would misread as a scheme separator
    val scratch = config.ledgerPath + ".scratch/" +
      mid.replaceAll("[^A-Za-z0-9._-]", "_")

    // 1-4: scans + DDL (bucket_exists_guard gives empty catalog, not error)
    val srcCatalog = ObjectStoreCatalog.scanCatalog(spark, srcUri).cache()
    val tgtCatalog = ObjectStoreCatalog.scanCatalog(spark, dstUri)
    ObjectStoreCatalog.ensureBucket(spark, dstUri)

    // 5-6b: diff join + predicate (replaces the reference's N+1 loop).
    // Concurrent mode pins the ledger snapshot eagerly: another mapping's
    // commit swaps the ledger DIRECTORY, and a lazy read (or a cache
    // eviction's recompute) over the old directory would hit deleted
    // files mid-cycle. The snapshot is also the correct semantics — a
    // cycle diffs against the ledger as of its start, and other mappings'
    // commits never touch this mapping's rows.
    val ledgerRead = readLedger(spark, config.ledgerPath)
    val ledger = if (concurrent) ledgerRead.localCheckpoint(true) else ledgerRead
    val decided = SyncOps.catalogLedgerDiff(srcCatalog, ledger, mid).cache()
    val toCopy = SyncOps.needsSync(decided)

    // 6c-6d: distributed stream copy. Receipts MUST be materialized before
    // reuse: the executor is side-effecting, and a lazy plan would re-run
    // the copies once per downstream action.
    val receipts = materialize(spark,
      CopyExecutor.copyObjects(spark, toCopy, srcUri, dstUri).toDF(),
      scratch + "/copy_receipts")

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
      scratch + "/delete_receipts")
    val removedNames = deleteReceipts.filter(col("removed"))
      .select(col("object_name").as("name"))
    val removed = removedNames.count()

    // ledger COMMIT: reference ON-CONFLICT upsert semantics — the batch's
    // rows win unconditionally (anti-join+union, no window sort over the
    // ledger) — then the keyed delete of successfully-removed orphans.
    // Under concurrency this read-merge-swap is the one shared critical
    // section: it re-reads the CURRENT ledger (not this cycle's snapshot)
    // under the global lock, so commits serialize and no mapping's rows
    // are lost — updates/doomed reference only materialized receipts and
    // the pinned snapshot, so the in-lock work is the cheap merge, never
    // the copies.
    val doomed = removedNames.select(lit(mid).as("mapping_id"),
                                     col("name").as("object_name"))
    def commitLedger(): Unit = {
      // re-read the CURRENT ledger inside the critical section (never the
      // cycle snapshot): commits from other mappings in this JVM — or from
      // other DRIVER PROCESSES, which the file lock serializes — must not
      // be clobbered by a merge against stale state
      val base = readLedger(spark, config.ledgerPath)
      val merged = SyncOps.ledgerUpsert(base, updates)
      val afterDelete = merged.join(doomed, Seq("mapping_id", "object_name"),
                                    "left_anti")
      writeLedger(spark, afterDelete, config.ledgerPath)
    }
    // two locks, two scopes: the JVM lock serializes this driver's threads
    // (cheap, no FS round-trips while waiting); the lock FILE serializes
    // across driver processes sharing the ledger path — the cross-process
    // safety the reference inherited from SQLite's own file locking
    // (internal/database/database.go:29-43)
    SyncEngine.ledgerLock.synchronized {
      SyncEngine.withLedgerFileLock(spark, config.ledgerPath)(commitLedger())
    }

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

  /** Serializes ledger read-merge-swap commits across every concurrent
    * mapping (and every engine instance) in this driver JVM — the ledger
    * is one table rewritten whole, so the commit is the single shared
    * resource concurrent sync must serialize (SCALE.md mapping-level
    * parallelism note). Cross-PROCESS commits (two drivers, one ledger
    * path) are serialized by [[withLedgerFileLock]] underneath; the JVM
    * lock stays as the cheap first gate so waiting threads don't spin on
    * filesystem round-trips.
    */
  private[graft] val ledgerLock = new Object

  /** Cross-PROCESS ledger commit lock. [[ledgerLock]] serializes commits
    * inside one driver JVM; two drivers sharing a ledger path raced the
    * read-merge-swap silently — the reference got cross-process safety for
    * free from SQLite's file locking (internal/database/database.go:29-43).
    * This restores it with an atomic create-if-absent lock FILE at
    * `<ledger>.lock`:
    *
    *  - acquire = ATOMIC create-no-overwrite. On a local filesystem that
    *    is `File.createNewFile` (O_CREAT|O_EXCL — a kernel primitive); on
    *    HDFS-like stores it is `fs.create(lock, overwrite = false)`,
    *    atomic at the NameNode. NOT Hadoop rename: RawLocalFileSystem's
    *    rename is check-then-rename, and on POSIX a rename onto an
    *    existing file REPLACES it — two concurrent acquirers could both
    *    "win" (caught by the racing spec as a concurrent writeLedger
    *    `_temporary` clobber; r12).
    *  - the owner token is written right after creation; creation itself
    *    is the lock, so a reader that races the token write sees an
    *    empty/foreign token and treats the lock as not-ours — always the
    *    safe direction.
    *  - stale break: a lock older than `staleTtlMs` is a crashed owner's;
    *    it is deleted and acquisition retried (two breakers race the
    *    recreate — the atomic create picks one). TTL must exceed the
    *    longest honest commit (the in-lock work is the cheap merge —
    *    copies and scans happen OUTSIDE, so minutes of TTL is generous).
    *  - release deletes the lock only if it still carries OUR token (a
    *    stale-break may have legitimately stolen it mid-body).
    *
    * Store caveat, documented not hidden: S3-style object stores have no
    * atomic create-no-overwrite either — there, point the ledger at a
    * real filesystem (HDFS/NFS) or front commits with an external lock
    * service; a timeout here throws loudly rather than proceeding
    * unlocked.
    */
  private[graft] def withLedgerFileLock[A](
      spark: SparkSession, ledgerPath: String,
      // timeout deliberately EXCEEDS the stale TTL: a crashed owner's
      // abandoned lock then resolves by waiting out the TTL and breaking
      // (one slow commit) instead of failing every cycle for TTL minutes
      // — for a sync engine, eventual progress beats fast failure. An
      // honest contending hold is seconds (the in-lock work is the cheap
      // merge), so the long timeout is only ever reached past a crash.
      timeoutMs: Long = 660000, staleTtlMs: Long = 600000)(body: => A): A = {
    val lock = new org.apache.hadoop.fs.Path(ledgerPath + ".lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val token = java.util.UUID.randomUUID().toString
    // local filesystems get the kernel's O_EXCL create; qualify through
    // the FS so relative ledger paths resolve the same way Hadoop does
    val localLock: Option[java.io.File] = {
      val qualified = fs.makeQualified(lock).toUri
      if (qualified.getScheme == "file")
        Some(new java.io.File(qualified.getPath))
      else None
    }
    def tryAcquire(): Boolean = localLock match {
      case Some(f) =>
        val created = try f.createNewFile()
                      catch { case _: java.io.IOException => false }
        if (created)
          java.nio.file.Files.write(f.toPath, token.getBytes("UTF-8"))
        created
      case None =>
        try {
          val out = fs.create(lock, false) // atomic create-no-overwrite
          try out.write(token.getBytes("UTF-8")) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
    }
    def readToken(): Option[String] =
      try {
        val in = fs.open(lock)
        try {
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          if (n > 0) Some(new String(buf, 0, n, "UTF-8")) else None
        } finally in.close()
      } catch { case _: java.io.IOException => None }
    val deadline = System.currentTimeMillis() + timeoutMs
    var acquired = false
    try {
      while (!acquired) {
        acquired = tryAcquire()
        if (!acquired) {
          val held =
            try Some(fs.getFileStatus(lock))
            catch { case _: java.io.FileNotFoundException => None }
          held.foreach { s =>
            if (System.currentTimeMillis() - s.getModificationTime > staleTtlMs)
              fs.delete(lock, false) // crashed owner; next create wins
          }
          if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"ledger commit lock timeout after $timeoutMs ms: $lock is " +
                "held by another driver (or stale below the TTL) — " +
                "processes sharing a ledger path serialize commits here")
          Thread.sleep(50)
        }
      }
      body
    } finally {
      if (acquired) {
        // release only OUR lock: if a stale-break stole it, leave theirs
        if (readToken().contains(token)) fs.delete(lock, false)
      }
    }
  }

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
