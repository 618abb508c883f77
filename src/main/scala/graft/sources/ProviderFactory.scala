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
    *
    * The Hadoop configuration is ONE global map, so two providers that
    * emit the same key with different values (two GCS providers with
    * different requester-pays billing projects, two MinIO endpoints)
    * would silently last-writer-win — the later provider's billing
    * project or endpoint would serve BOTH. Fail fast instead: the
    * conflict is a config error this deployment cannot express, not a
    * preference.
    *
    * The same bleed hides in key SETS, not just values: a plain GCS
    * provider next to a requester-pays one emits no `fs.gs.requester.*`
    * keys at all, so the old same-key check never fired and the RP
    * billing project silently applied to the plain provider's buckets
    * too (ditto a MinIO endpoint leaking onto a plain `s3` provider —
    * both serve `s3a`). Providers sharing a scheme must therefore emit
    * IDENTICAL key sets; anything else needs per-bucket connector conf
    * the providers don't model, so it fails fast as well.
    */
  def configure(spark: SparkSession, providers: Seq[ProviderConf]): Unit = {
    val merged = scala.collection.mutable.Map.empty[String, (String, String)]
    providers.foreach { p =>
      hadoopConf(p).foreach { case (k, v) =>
        merged.get(k) match {
          case Some((otherId, otherV)) if otherV != v =>
            throw new IllegalArgumentException(
              s"conflicting Hadoop conf '$k': provider '${p.id}' wants " +
              s"'$v' but provider '$otherId' already set '$otherV' — one " +
              "session-wide value serves all providers of a scheme")
          case _ => merged(k) = (p.id, v)
        }
      }
    }
    providers.groupBy(p => scheme(p.providerType)).foreach {
      case (sch, ps) if ps.size > 1 =>
        val keySets = ps.map(p => p -> hadoopConf(p).keySet)
        val (_, refKeys) = keySets.head
        keySets.find(_._2 != refKeys).foreach { case (p, keys) =>
          val drift = (refKeys union keys) diff (refKeys intersect keys)
          throw new IllegalArgumentException(
            s"providers '${keySets.head._1.id}' and '${p.id}' both serve " +
            s"scheme '$sch' but set different Hadoop conf keys " +
            s"(${drift.toSeq.sorted.mkString(", ")}) — the session-wide " +
            "value would silently apply to the provider that did not set it")
        }
      case _ => ()
    }
    merged.foreach { case (k, (_, v)) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
  }
}
