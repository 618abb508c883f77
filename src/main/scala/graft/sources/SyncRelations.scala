package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sync-domain relations derived from the `orders` testdata
  * table, modeling the reference engine's data model (SURVEY.md §1.3):
  *
  *  - CATALOG  — one row per object per listing (reference `ObjectInfo`,
  *    `internal/interfaces/provider.go:9-17`)
  *  - LEDGER   — sync-metadata state (reference `file_metadata` SQLite table,
  *    `internal/database/database.go:144-157`)
  *
  * The derivations use only integer arithmetic, string concat and md5 so the
  * DuckDB oracle (graft.Oracle) can reproduce them bit-for-bit. Modulus
  * constants carve the key space into the reference's decision classes
  * (`internal/sync/sync.go:111-128`):
  *
  *   k % 4 == 0  → object absent from ledger            (miss ⇒ sync_new)
  *   k % 5 == 0  → ledger last_modified is stale (+1h)  (⇒ sync_changed)
  *   k % 11 == 0 → ledger etag differs                  (⇒ sync_changed)
  *   k % 7 == 0  → last sync failed                     (⇒ sync_retry)
  *   otherwise   → metadata equal + success             (⇒ skip)
  *
  * Target-catalog carving (orphan semantics, `sync.go:199-234`):
  *   k % 3 == 1  → object missing from target (will be copied)
  *   k % 13 == 0 → extra `orphan_<k>` object only in target (will be deleted)
  */
object SyncRelations {
  val MappingId    = "gcs:src-bucket->s3:dst-bucket"
  val SrcBucket    = "src-bucket"
  val DstBucket    = "dst-bucket"
  /** Fixed logical "now" for deterministic last_synced in ledger updates. */
  val SyncedAtLit  = "2026-01-01 00:00:00"

  private def objName(k: String): org.apache.spark.sql.Column =
    concat(lit("obj_"), col(k).cast("string"))

  private def objSize(k: String): org.apache.spark.sql.Column =
    (col(k) % 1000000 + 1024).cast("long")

  private def objContentType(k: String): org.apache.spark.sql.Column =
    when(col(k) % 3 === 0, "text/plain").otherwise("application/octet-stream")

  /** Custom object metadata (reference `ObjectInfo.Metadata`,
    * provider.go:16) — deterministic map, excluded from oracle parity
    * projections per SURVEY §7.4.
    */
  private def objMetadata(k: String): org.apache.spark.sql.Column =
    map(lit("orderkey"), col(k).cast("string"))

  /** Source-bucket object catalog (reference `ListObjects` result). */
  def sourceCatalog(orders: DataFrame): DataFrame =
    orders.select(
      objName("o_orderkey").as("name"),
      lit(SrcBucket).as("bucket"),
      objSize("o_orderkey").as("size"),
      objContentType("o_orderkey").as("content_type"),
      col("o_orderdate").as("last_modified"),
      md5(objName("o_orderkey")).as("etag"),
      objMetadata("o_orderkey").as("metadata"))

  /** Target-bucket object catalog: most source objects plus orphans. */
  def targetCatalog(orders: DataFrame): DataFrame = {
    val present = orders
      .filter(col("o_orderkey") % 3 =!= 1)
      .select(
        objName("o_orderkey").as("name"),
        lit(DstBucket).as("bucket"),
        objSize("o_orderkey").as("size"),
        objContentType("o_orderkey").as("content_type"),
        col("o_orderdate").as("last_modified"),
        md5(objName("o_orderkey")).as("etag"),
        objMetadata("o_orderkey").as("metadata"))
    val orphans = orders
      .filter(col("o_orderkey") % 13 === 0)
      .select(
        concat(lit("orphan_"), col("o_orderkey").cast("string")).as("name"),
        lit(DstBucket).as("bucket"),
        objSize("o_orderkey").as("size"),
        lit("application/octet-stream").as("content_type"),
        col("o_orderdate").as("last_modified"),
        md5(concat(lit("orphan_"), col("o_orderkey").cast("string"))).as("etag"),
        objMetadata("o_orderkey").as("metadata"))
    present.unionAll(orphans)
  }

  /** Pre-sync ledger state (reference `file_metadata`,
    * `database.go:144-157`). Deliberately has NO `metadata` map column: the
    * reference never persists object metadata to the ledger
    * (`sync.go:180-189`, SURVEY §1.2) — it lives in the CATALOG relations
    * only, and is excluded from oracle parity projections (SURVEY §7.4).
    */
  def ledger(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderkey") % 4 =!= 0)
      .select(
        col("o_orderkey").as("id"),
        lit(MappingId).as("mapping_id"),
        objName("o_orderkey").as("object_name"),
        objSize("o_orderkey").as("size"),
        when(col("o_orderkey") % 5 === 0,
             col("o_orderdate") + expr("INTERVAL '1' HOUR"))
          .otherwise(col("o_orderdate")).as("last_modified"),
        when(col("o_orderkey") % 11 === 0, lit("stale-etag"))
          .otherwise(md5(objName("o_orderkey"))).as("etag"),
        objContentType("o_orderkey").as("content_type"),
        col("o_orderdate").as("last_synced"),
        when(col("o_orderkey") % 7 === 0, lit("failed_upload"))
          .otherwise(lit("success")).as("sync_status"))

  /** Second mapping's source catalog (azure backup-bucket → minio
    * archive-bucket): disjoint `bak_` name space and no ledger rows, so a
    * multi-mapping diff sees a full sync_new mapping next to the mixed one.
    */
  val MappingId2 = "azure:backup-bucket->minio:archive-bucket"
  def backupCatalog(orders: DataFrame): DataFrame = {
    val bakName = concat(lit("bak_"), col("o_orderkey").cast("string"))
    orders.filter(col("o_orderkey") % 2 === 0).select(
      bakName.as("name"),
      lit("backup-bucket").as("bucket"),
      objSize("o_orderkey").as("size"),
      objContentType("o_orderkey").as("content_type"),
      col("o_orderdate").as("last_modified"),
      md5(bakName).as("etag"))
  }

  /** The mappings relation (reference `BucketMapping`, config.go:69-74).
    * Literal rows — the reference's config file is data, not a table.
    */
  def mappings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("gcs", SrcBucket, "s3", DstBucket),
      ("azure", "backup-bucket", "minio", "archive-bucket")
    ).toDF("source_provider_id", "source_bucket",
           "target_provider_id", "target_bucket")
  }

  /** Providers relation (reference `ProviderConfig`, config.go:28-36),
    * including a duplicated id so `config_validation` has something to find.
    */
  def providers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("gcs", "gcs"), ("s3", "aws"), ("azure", "azure"),
      ("minio", "minio"), ("s3", "aws")
    ).toDF("id", "provider_type")
  }

  /** schema_migrations relation (database.go:45-115). */
  def schemaMigrations(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1, "initial"), (2, "mapping_id"), (3, "index")).toDF("version", "name")
  }
}
