package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Serializable snapshot of the driver's Hadoop configuration for
  * task-side `FileSystem` access.
  *
  * Why this exists: [[ProviderFactory]] writes connector settings
  * (s3a/gcs/abfs endpoints, path-style access, requester-pays, credential
  * providers) onto `sparkContext.hadoopConfiguration` — the reference's
  * per-provider client credentials/endpoints
  * (`internal/providers/minio/client.go:30-45`, `gcp/client.go:33-41`)
  * collapse to these keys. A bare `new Configuration()` inside a Spark
  * task loads only core-default/core-site and sees NONE of them; at
  * local[32] the single-JVM FileSystem cache masks the bug (the driver's
  * configured instance is returned), but on a real cluster every copy /
  * delete / distributed-listing task against MinIO/GCS/abfs would fail or
  * hit the wrong endpoint. `Configuration` itself is Writable, not
  * Serializable, and Spark's `SerializableConfiguration` wrapper is
  * `private[spark]` — so we snapshot the full entry set into a plain
  * `Array[(String, String)]` (a few thousand entries, ~100 KB — captured
  * once per job in the task closure) and rebuild in-task.
  */
final class TaskConf(private val entries: Array[(String, String)])
    extends Serializable {

  /** Rebuild the driver conf in a task. `loadDefaults = false`: every key
    * the driver saw (including defaults it resolved) is in `entries`, so
    * skipping the executor-side XML parse both avoids divergence and is
    * cheaper. Call once per partition, not per row.
    */
  def value: Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

object TaskConf {
  /** Snapshot the session's Hadoop conf (the one ProviderFactory mutates). */
  def apply(spark: SparkSession): TaskConf =
    apply(spark.sparkContext.hadoopConfiguration)

  def apply(conf: Configuration): TaskConf =
    new TaskConf(conf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray)
}
