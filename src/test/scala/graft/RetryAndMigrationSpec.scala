package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ProviderConf, SyncConfig}
import graft.operators.{CopyExecutor, SyncOps}
import graft.sources.{IoFixtures, ProviderFactory}

/** Covers the reference's own admitted test gaps (README.md:353-355):
  * error paths through the copy executor and the retry-on-next-cycle
  * semantics, plus the factory registry and ledger migrations.
  */
class RetryAndMigrationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark
  import spark.implicits._

  private val M = "gcs:a->s3:b"
  private val t1 = Timestamp.valueOf("2025-01-01 00:00:00")

  test("failed copy records status and next cycle retries it") {
    val src = IoFixtures.freshDir("retry/src")
    val dst = IoFixtures.freshDir("retry/dst")
    IoFixtures.write(src, "ok.txt", "fine")

    // cycle 1: catalog claims a ghost object (simulates races/permission
    // failures between listing and copy — sync.go:136-140)
    val catalog = Seq(
      ("ok.txt", "a", 4L, "text/plain", t1, "e1"),
      ("ghost.txt", "a", 9L, "text/plain", t1, "e2")
    ).toDF("name", "bucket", "size", "content_type", "last_modified", "etag")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      SyncEngine.LedgerSchema)
    val decided = SyncOps.catalogLedgerDiff(catalog, empty, M)
    val receipts = CopyExecutor.copyObjects(
      spark, SyncOps.needsSync(decided),
      IoFixtures.uri(src), IoFixtures.uri(dst)).toDF.localCheckpoint(true)
    val status = receipts.select("object_name", "sync_status")
      .as[(String, String)].collect().toMap
    assert(status("ok.txt") == "success" && status("ghost.txt") == "failed_get")

    // ledger after cycle 1 carries the failure
    val updates = SyncOps.needsSync(decided).alias("t")
      .join(receipts.alias("r"), col("t.name") === col("r.object_name"))
      .select(lit(0L).as("id"), lit(M).as("mapping_id"),
        col("t.name").as("object_name"), col("t.size"),
        col("t.last_modified"), col("t.etag"), col("t.content_type"),
        lit(t1).as("last_synced"), col("r.sync_status"),
        lit(null).cast("map<string,string>").as("metadata"))
    val ledger1 = SyncOps.ledgerLatestWins(empty, updates)

    // cycle 2 diff: ok.txt skips, ghost.txt retries (sync.go:121-124)
    val decided2 = SyncOps.catalogLedgerDiff(catalog, ledger1, M)
      .select("name", "action").as[(String, String)].collect().toMap
    assert(decided2("ok.txt") == "skip")
    assert(decided2("ghost.txt") == "sync_retry")
  }

  test("provider factory maps types to connector config, rejects unknown") {
    assert(ProviderFactory.scheme("gcs") == "gs")
    assert(ProviderFactory.scheme("minio") == "s3a")
    val minio = ProviderFactory.hadoopConf(
      ProviderConf("m", "minio", "http://localhost:9000"))
    assert(minio("fs.s3a.endpoint") == "http://localhost:9000")
    assert(minio("fs.s3a.path.style.access") == "true")
    intercept[IllegalArgumentException] {
      ProviderFactory.scheme("ftp")   // factory.go:64-66 unknown-type error
    }
  }

  test("gcs requester-pays maps userProject onto the connector config") {
    val plain = ProviderFactory.hadoopConf(ProviderConf("g", "gcs", "gs://x"))
    assert(!plain.contains("fs.gs.requester.pays.mode"))
    // gcp/client.go:33-41 UserProject parity
    val rp = ProviderFactory.hadoopConf(
      ProviderConf("g", "gcs", "gs://x", userProject = "bill-me"))
    assert(rp("fs.gs.requester.pays.mode") == "AUTO")
    assert(rp("fs.gs.requester.pays.project.id") == "bill-me")
    // round-trips through the JSON config
    val cfg = SyncConfig.parse(
      """{"providers":[{"id":"g","type":"gcs","uri":"gs://x",
         "userProject":"bill-me"}],
         "mappings":[{"sourceProviderId":"g","sourceBucket":"s",
                      "targetProviderId":"g","targetBucket":"t"}]}""")
    assert(cfg.providers.head.userProject == "bill-me")
  }

  test("configure rejects providers whose connector settings conflict") {
    // one global Hadoop conf: two GCS billing projects (or two MinIO
    // endpoints) cannot coexist — silent last-writer-wins would misbill
    val a = ProviderConf("gA", "gcs", "gs://a", userProject = "proj-a")
    val b = ProviderConf("gB", "gcs", "gs://b", userProject = "proj-b")
    val e = intercept[IllegalArgumentException] {
      ProviderFactory.configure(spark, Seq(a, b))
    }
    assert(e.getMessage.contains("conflicting"))
    // identical settings are not a conflict
    ProviderFactory.configure(spark, Seq(a, a.copy(id = "gA2")))
  }

  test("configure rejects same-scheme providers with differing key sets") {
    // requester-pays keys are session-wide: a plain GCS provider next to an
    // RP one emits NO fs.gs.requester.* keys, so the value-conflict check
    // never fires and the billing project would silently apply to the
    // plain provider's buckets too
    val plain = ProviderConf("gP", "gcs", "gs://p")
    val rp = ProviderConf("gR", "gcs", "gs://r", userProject = "bill-me")
    val e = intercept[IllegalArgumentException] {
      ProviderFactory.configure(spark, Seq(plain, rp))
    }
    assert(e.getMessage.contains("requester"))
    // same bleed across types sharing a scheme: a MinIO endpoint would
    // capture a plain s3 provider's traffic
    val s3 = ProviderConf("s", "s3", "s3a://x")
    val minio = ProviderConf("m", "minio", "http://localhost:9000")
    val e2 = intercept[IllegalArgumentException] {
      ProviderFactory.configure(spark, Seq(s3, minio))
    }
    assert(e2.getMessage.contains("s3a"))
  }

  test("ledger v1->v3 migration chain derives mapping_id, adds metadata, idempotent") {
    val legacy = Seq((1L, "bkt", "o.txt", 4L, t1, "e", "text/plain", t1, "success"))
      .toDF("id", "bucket_name", "object_name", "size", "last_modified",
            "etag", "content_type", "last_synced", "sync_status")
    assert(LedgerMigrations.versionOf(legacy) == 1)
    val (migrated, n) = LedgerMigrations.migrate(legacy)
    // the chain applies BOTH pending migrations in one call
    assert(n == 2)
    assert(migrated.select("mapping_id").as[String].head()
      == "default:bkt->default:bkt")
    assert(!migrated.columns.contains("bucket_name"))
    // v3: typed null metadata map, backfilled by each object's next sync
    assert(migrated.schema("metadata").dataType ==
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))
    assert(migrated.select("metadata").head().isNullAt(0))
    val (again, n2) = LedgerMigrations.migrate(migrated)
    assert(n2 == 0 &&
      LedgerMigrations.versionOf(again) == LedgerMigrations.CurrentVersion)
    // a v2 ledger (mapping_id, no metadata) applies exactly one migration
    val (fromV2, n3) = LedgerMigrations.migrate(migrated.drop("metadata"))
    assert(n3 == 1 && fromV2.columns.contains("metadata"))
  }
}
