package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TaskConf

import java.net.URI

/** Side-effecting executors: distributed object copy and delete over any
  * Hadoop FileSystem. Replaces the reference's sequential per-object loop
  * (`internal/sync/sync.go:101-164` — explicitly single-threaded, with
  * parallelism listed as future work README.md:345-347) with Spark tasks:
  * the decided copy-set is a Dataset, each partition streams its objects.
  *
  * Semantics preserved from the reference:
  *  - streaming copy, never whole-object buffering (fixes the reference's
  *    own AWS/Azure buffering asymmetry, aws/client.go:176 azure/client.go:137)
  *  - per-object error isolation: a failed copy yields a 'failed_*' receipt
  *    and the run continues (sync.go:136-140,153-158)
  *  - at-least-once + idempotent target keys; run with
  *    spark.speculation=false (SURVEY.md §7.4)
  */
object CopyExecutor {

  case class CopyTask(name: String, size: Long, content_type: String)
  case class Receipt(object_name: String, bucket: String, size: Long,
                     content_type: String, sync_status: String,
                     error: String)

  /** Copy `tasks` (name/size/content_type rows, e.g. SyncOps.needsSync
    * output) from srcBucket to dstBucket. Returns one receipt per object —
    * the UploadInfo analog (provider.go:19-24) plus status for the ledger.
    */
  def copyObjects(spark: SparkSession, tasks: DataFrame,
                  srcBucket: String, dstBucket: String,
                  partitions: Int = 0): Dataset[Receipt] = {
    import spark.implicits._
    val ts = tasks.select(col("name"), col("size"), col("content_type")).as[CopyTask]
    val repartitioned =
      if (partitions > 0) ts.repartition(partitions) else ts
    // Session conf rides the closure so task-side FileSystems see the
    // ProviderFactory endpoints/credentials (not just core-site defaults).
    val taskConf = TaskConf(spark)
    repartitioned.mapPartitions { it =>
      val conf = taskConf.value
      val srcFs = FileSystem.get(URI.create(srcBucket), conf)
      val dstFs = FileSystem.get(URI.create(dstBucket), conf)
      val buf = new Array[Byte](1 << 20)
      it.map { t =>
        val src = new Path(srcBucket + "/" + t.name)
        val dst = new Path(dstBucket + "/" + t.name)
        try {
          val in = srcFs.open(src)
          try {
            dstFs.mkdirs(dst.getParent)
            val out = dstFs.create(dst, true)
            try {
              var n = in.read(buf)
              var total = 0L
              while (n >= 0) {
                if (n > 0) { out.write(buf, 0, n); total += n }
                n = in.read(buf)
              }
              Receipt(t.name, dstBucket, total, t.content_type, "success", "")
            } finally out.close()
          } finally in.close()  // close per object — not the reference's
                                // leaked defer-in-loop (sync.go:141-142)
        } catch {
          case e: java.io.FileNotFoundException =>
            Receipt(t.name, dstBucket, 0L, t.content_type, "failed_get",
                    String.valueOf(e.getMessage))
          case e: Exception =>
            Receipt(t.name, dstBucket, 0L, t.content_type, "failed_upload",
                    String.valueOf(e.getMessage))
        }
      }
    }
  }

  case class CompactionBin(target_name: String, members: Seq[String])
  case class CompactReceipt(object_name: String, n_objects: Long, size: Long,
                            sync_status: String, error: String)

  /** Execute a compaction plan: stream-concatenate each bin's member
    * objects (in `members` order — [[graft.operators.SyncOps.compactionBins]]
    * emits them name-sorted) into ONE target object, the maintenance
    * rewrite a 100-TB catalog full of small sync outputs needs weekly.
    *
    * Each bin is one task row; bytes stream through the same 1 MiB buffer
    * as [[copyObjects]], never buffering an object — so a bin costs
    * O(targetBytes) transfer and O(1) memory regardless of member count.
    * Per-bin error isolation: a failed member read yields a
    * `failed_compact` receipt (the partially-written target is
    * overwritten by the retry — target keys are deterministic and
    * `create(overwrite=true)` keeps the rewrite idempotent) and the run
    * continues. Callers upsert receipts into the ledger and only delete
    * member objects whose bin succeeded.
    */
  def compactObjects(spark: SparkSession, bins: DataFrame,
                     srcBucket: String, dstBucket: String): Dataset[CompactReceipt] = {
    import spark.implicits._
    val taskConf = TaskConf(spark)
    bins.select(col("target_name"), col("members")).as[CompactionBin]
      .mapPartitions { it =>
        val conf = taskConf.value
        val srcFs = FileSystem.get(URI.create(srcBucket), conf)
        val dstFs = FileSystem.get(URI.create(dstBucket), conf)
        val buf = new Array[Byte](1 << 20)
        it.map { bin =>
          val dst = new Path(dstBucket + "/" + bin.target_name)
          try {
            dstFs.mkdirs(dst.getParent)
            val out = dstFs.create(dst, true)
            var total = 0L
            try {
              bin.members.foreach { m =>
                val in = srcFs.open(new Path(srcBucket + "/" + m))
                try {
                  var n = in.read(buf)
                  while (n >= 0) {
                    if (n > 0) { out.write(buf, 0, n); total += n }
                    n = in.read(buf)
                  }
                } finally in.close()
              }
            } finally out.close()
            CompactReceipt(bin.target_name, bin.members.length.toLong, total,
                           "success", "")
          } catch {
            case e: Exception =>
              CompactReceipt(bin.target_name, bin.members.length.toLong, 0L,
                             "failed_compact", String.valueOf(e.getMessage))
          }
        }
      }
  }

  case class DeleteTask(name: String)
  case class DeleteReceipt(object_name: String, removed: Boolean, error: String)

  /** Delete the orphan set from the target bucket (sync.go:199-234).
    * A failed delete is reported, not thrown — the caller keeps the ledger
    * row, mirroring sync.go:217-221. Deleting an already-missing object is
    * success (tolerate-404), matching azure/client.go:168-170: the goal
    * state ("object absent") holds, so the ledger row must clear rather
    * than stick around until the object reappears.
    */
  def deleteObjects(spark: SparkSession, orphans: DataFrame,
                    dstBucket: String): Dataset[DeleteReceipt] = {
    import spark.implicits._
    val taskConf = TaskConf(spark)
    orphans.select(col("name")).as[DeleteTask].mapPartitions { it =>
      val fs = FileSystem.get(URI.create(dstBucket), taskConf.value)
      it.map { t =>
        val path = new Path(dstBucket + "/" + t.name)
        try {
          val removed = fs.delete(path, false) || !fs.exists(path)
          DeleteReceipt(t.name, removed, "")
        } catch {
          case e: Exception =>
            DeleteReceipt(t.name, removed = false, String.valueOf(e.getMessage))
        }
      }
    }
  }
}
