package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned ledger-schema migrations (reference
  * `internal/database/database.go:45-115`): detect the stored version,
  * apply pending migrations in order, record the new version. The
  * reference's v2 migration derives `mapping_id` for pre-mapping rows
  * (`database.go:242-250, 283-291`); here the ledger is parquet, so a
  * migration is a full rewrite through the temp-swap writer.
  */
object LedgerMigrations {

  val CurrentVersion = 3

  /** Version of an existing ledger frame, inferred from its schema —
    * the parquet analog of `SELECT MAX(version) FROM schema_migrations`.
    */
  def versionOf(ledger: DataFrame): Int =
    if (!ledger.columns.contains("mapping_id")) 1
    else if (!ledger.columns.contains("metadata")) 2
    else 3

  /** v1 → v2: derive `mapping_id` as `'default:'||bucket||'->default:'||bucket`
    * exactly like the reference backfill, then drop the legacy column.
    */
  def migrateV1toV2(legacy: DataFrame): DataFrame =
    legacy
      .withColumn("mapping_id",
        concat(lit("default:"), col("bucket_name"),
               lit("->default:"), col("bucket_name")))
      .drop("bucket_name")

  /** v2 → v3: add the user-metadata map (null for pre-v3 rows — the
    * reference never persisted it, README.md:373-375; the next sync of
    * each object backfills it from the catalog).
    */
  def migrateV2toV3(ledger: DataFrame): DataFrame =
    ledger.withColumn("metadata",
      lit(null).cast("map<string,string>"))

  /** Run all pending migrations; returns the up-to-date frame and the
    * number applied. Idempotent — an already-current ledger passes
    * through untouched (mirrors the version guard `database.go:77-80`).
    */
  def migrate(ledger: DataFrame): (DataFrame, Int) =
    versionOf(ledger) match {
      case 1 =>
        val (v3, n) = migrate(migrateV1toV2(ledger))
        (v3, n + 1)
      case 2 => (migrateV2toV3(ledger), 1)
      case _ => (ledger, 0)
    }
}
