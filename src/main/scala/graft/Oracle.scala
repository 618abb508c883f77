package graft

/** DuckDB-dialect SQL for the driver's correctness oracle (Verify.scala
  * contract). These are independent re-statements of each operator's
  * semantics — NOT generated from the Spark plans — so a hash match is a
  * genuine two-implementation agreement.
  *
  * Determinism rules (SURVEY.md §7.4): integer/string/md5 derivations only,
  * DECIMAL-cast sums for float aggregates (cast back to DOUBLE at the end),
  * UTC timestamps, stable ORDER BY with unique key suffix.
  */
object Oracle {
  val MappingId = "gcs:src-bucket->s3:dst-bucket"

  /** Shared CTE prelude deriving the sync-domain relations from `orders`
    * — must stay in lock-step with graft.sources.SyncRelations.
    */
  val SyncCtes: String = s"""
    source_catalog AS (
      SELECT concat('obj_', o_orderkey) AS name,
             'src-bucket' AS bucket,
             o_orderkey % 1000000 + 1024 AS size,
             CASE WHEN o_orderkey % 3 = 0 THEN 'text/plain'
                  ELSE 'application/octet-stream' END AS content_type,
             o_orderdate AS last_modified,
             md5(concat('obj_', o_orderkey)) AS etag
      FROM orders),
    target_catalog AS (
      SELECT concat('obj_', o_orderkey) AS name,
             'dst-bucket' AS bucket,
             o_orderkey % 1000000 + 1024 AS size,
             CASE WHEN o_orderkey % 3 = 0 THEN 'text/plain'
                  ELSE 'application/octet-stream' END AS content_type,
             o_orderdate AS last_modified,
             md5(concat('obj_', o_orderkey)) AS etag
      FROM orders WHERE o_orderkey % 3 <> 1
      UNION ALL
      SELECT concat('orphan_', o_orderkey),
             'dst-bucket',
             o_orderkey % 1000000 + 1024,
             'application/octet-stream',
             o_orderdate,
             md5(concat('orphan_', o_orderkey))
      FROM orders WHERE o_orderkey % 13 = 0),
    ledger AS (
      SELECT o_orderkey AS id,
             '$MappingId' AS mapping_id,
             concat('obj_', o_orderkey) AS object_name,
             o_orderkey % 1000000 + 1024 AS size,
             CASE WHEN o_orderkey % 5 = 0 THEN o_orderdate + INTERVAL 1 HOUR
                  ELSE o_orderdate END AS last_modified,
             CASE WHEN o_orderkey % 11 = 0 THEN 'stale-etag'
                  ELSE md5(concat('obj_', o_orderkey)) END AS etag,
             CASE WHEN o_orderkey % 3 = 0 THEN 'text/plain'
                  ELSE 'application/octet-stream' END AS content_type,
             o_orderdate AS last_synced,
             CASE WHEN o_orderkey % 7 = 0 THEN 'failed_upload'
                  ELSE 'success' END AS sync_status
      FROM orders WHERE o_orderkey % 4 <> 0),
    diff AS (
      SELECT s.name, s.bucket, s.size, s.content_type, s.last_modified, s.etag,
             l.object_name AS led_object_name,
             l.last_modified AS led_last_modified,
             l.etag AS led_etag,
             l.sync_status AS led_sync_status,
             CASE WHEN l.object_name IS NULL THEN 'sync_new'
                  WHEN l.last_modified <> s.last_modified
                       OR l.etag <> s.etag THEN 'sync_changed'
                  WHEN l.sync_status <> 'success' THEN 'sync_retry'
                  ELSE 'skip' END AS action
      FROM source_catalog s
      LEFT JOIN ledger l
        ON l.mapping_id = '$MappingId' AND l.object_name = s.name),
    updates AS (
      SELECT CAST(0 AS BIGINT) AS id,
             '$MappingId' AS mapping_id,
             name AS object_name, size, last_modified, etag, content_type,
             TIMESTAMP '2026-01-01 00:00:00' AS last_synced,
             'success' AS sync_status
      FROM diff WHERE action <> 'skip'),
    merged AS (
      SELECT id, mapping_id, object_name, size, last_modified, etag,
             content_type, last_synced, sync_status
      FROM (
        SELECT u.*, ROW_NUMBER() OVER (
                 PARTITION BY mapping_id, object_name
                 ORDER BY last_synced DESC, is_update DESC) AS rn
        FROM (SELECT l.*, 0 AS is_update FROM ledger l
              UNION ALL
              SELECT u.*, 1 AS is_update FROM updates u) u)
      WHERE rn = 1),
    orphans AS (
      SELECT t.* FROM target_catalog t
      WHERE NOT EXISTS (SELECT 1 FROM source_catalog s WHERE s.name = t.name))
  """.stripMargin
}
