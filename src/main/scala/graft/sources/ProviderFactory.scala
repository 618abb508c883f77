package graft.sources

import org.apache.spark.sql.SparkSession

import graft.config.ProviderConf

/** Provider registry (reference `internal/storage/factory.go:24-77`):
  * maps each configured provider type to its Hadoop FileSystem scheme and
  * the connector configuration Spark needs. Unknown types error exactly
  * like the reference's factory (`factory.go:64-66`,
  * `factory_test.go:40-66`). Connectors are configuration, not code
  * (SURVEY §7.1) — this registry is where that configuration lives.
  */
object ProviderFactory {

  /** Hadoop settings per provider type. Values mirror the reference's
    * per-provider client options: MinIO's custom endpoint + path-style
    * access (`minio/client.go:30-45`, mirrored by the reference's AWS
    * custom-endpoint path `aws/client.go:41-45`), anonymous-vs-keyed auth
    * left to the cluster's core-site.xml.
    */
  def hadoopConf(p: ProviderConf): Map[String, String] = p.providerType match {
    case "file"  => Map.empty
    case "gcs"   =>
      // requester-pays parity with gcp/client.go:33-41 (option.WithQuotaProject):
      // the GCS connector bills the configured project on every request
      val requesterPays =
        if (p.userProject.nonEmpty)
          Map("fs.gs.requester.pays.mode" -> "AUTO",
              "fs.gs.requester.pays.project.id" -> p.userProject)
        else Map.empty[String, String]
      Map(
        "fs.gs.impl" -> "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"
      ) ++ requesterPays
    case "s3" | "aws" => Map(
      "fs.s3a.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem")
    case "azure" => Map(
      "fs.abfs.impl" -> "org.apache.hadoop.fs.azurebfs.AzureBlobFileSystem")
    case "minio" => Map(
      "fs.s3a.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem",
      "fs.s3a.endpoint" -> p.uri,
      "fs.s3a.path.style.access" -> "true")
    case other =>
      throw new IllegalArgumentException(
        s"unsupported provider type: $other (id=${p.id})")
  }

  /** Scheme each provider type serves objects under. */
  def scheme(providerType: String): String = providerType match {
    case "file"         => "file"
    case "gcs"          => "gs"
    case "s3" | "aws"   => "s3a"
    case "minio"        => "s3a"
    case "azure"        => "abfs"
    case other =>
      throw new IllegalArgumentException(s"unsupported provider type: $other")
  }

  /** Apply every provider's connector settings to the session — the
    * engine-side analog of `storage.NewFactory` building all clients
    * upfront and failing fast on a bad config.
    */
  def configure(spark: SparkSession, providers: Seq[ProviderConf]): Unit =
    providers.foreach { p =>
      hadoopConf(p).foreach { case (k, v) =>
        spark.sparkContext.hadoopConfiguration.set(k, v)
      }
    }
}
