package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SyncOps

/** Canonical needs-sync / orphan / merge cases from FIXTURES.md §A1-A2,
  * mirroring the reference truth table (`internal/sync/sync.go:111-128`,
  * `sync.go:212-231`) and the SQLite upsert (`database.go:346-364`).
  */
class SyncOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark
  import spark.implicits._

  test("compaction plan partitions every byte into contiguous bins") {
    val cat = (1 to 40)
      .map(i => (f"p${i % 2}%s_obj$i%03d", 600L + i)) // two prefixes
      .toDF("name", "size")
    val plan = SyncOps.compactionPlan(cat, targetBytes = 2000, prefixLen = 3)
      .collect()
    // every object and every byte lands in exactly one bin
    assert(plan.map(_.getAs[Long]("n_objects")).sum == 40)
    assert(plan.map(_.getAs[Long]("total_bytes")).sum ==
      cat.agg(org.apache.spark.sql.functions.sum("size")).head().getLong(0))
    // bins within a prefix are contiguous in name order: ranges don't
    // overlap and bin ids rise with the first name
    plan.groupBy(_.getAs[String]("prefix")).values.foreach { bins =>
      val sorted = bins.sortBy(_.getAs[Long]("bin_id"))
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(0).getAs[String]("last_name") <
               pair(1).getAs[String]("first_name"))
      }
      // a full bin holds at least targetBytes minus one object's slack
      sorted.dropRight(1).foreach { b =>
        assert(b.getAs[Long]("total_bytes") >= 2000 - 640)
      }
    }
  }

  private val M = "gcs:a->s3:b"
  private def ts(s: String) = Timestamp.valueOf(s)
  private val t1 = ts("2025-01-01 00:00:00")
  private val t2 = ts("2025-06-01 00:00:00")

  // (name, bucket, size, content_type, last_modified, etag)
  private def catalog = Seq(
    ("new.txt",     "a", 4L, "text/plain", t1, "e1"), // not in ledger → sync_new
    ("same.txt",    "a", 4L, "text/plain", t1, "e2"), // equal + success → skip
    ("mtime.txt",   "a", 4L, "text/plain", t2, "e3"), // mtime differs → sync_changed
    ("etag.txt",    "a", 4L, "text/plain", t1, "e4b"),// etag differs → sync_changed
    ("failed.txt",  "a", 4L, "text/plain", t1, "e5")  // prior failure → sync_retry
  ).toDF("name", "bucket", "size", "content_type", "last_modified", "etag")

  private def ledger = Seq(
    (1L, M, "same.txt",   4L, t1, "e2",  "text/plain", t1, "success"),
    (2L, M, "mtime.txt",  4L, t1, "e3",  "text/plain", t1, "success"),
    (3L, M, "etag.txt",   4L, t1, "e4a", "text/plain", t1, "success"),
    (4L, M, "failed.txt", 4L, t1, "e5",  "text/plain", t1, "failed_upload"),
    (5L, M, "gone.txt",   4L, t1, "e6",  "text/plain", t1, "success")
  ).toDF("id", "mapping_id", "object_name", "size", "last_modified",
         "etag", "content_type", "last_synced", "sync_status")

  test("needs_sync truth table matches the reference") {
    val decided = SyncOps.catalogLedgerDiff(catalog, ledger, M)
      .select("name", "action").as[(String, String)].collect().toMap
    assert(decided == Map(
      "new.txt" -> "sync_new", "same.txt" -> "skip",
      "mtime.txt" -> "sync_changed", "etag.txt" -> "sync_changed",
      "failed.txt" -> "sync_retry"))
  }

  test("other mappings' ledger rows do not mask a miss") {
    val otherMapping = ledger.withColumn("mapping_id", lit("other:x->other:y"))
    val decided = SyncOps.catalogLedgerDiff(catalog, otherMapping, M)
      .select("name", "action").as[(String, String)].collect()
    assert(decided.forall(_._2 == "sync_new"))
  }

  test("orphan anti-join finds target-only objects") {
    val target = Seq(
      ("same.txt", "b", 4L, "text/plain", t1, "e2"),
      ("orphan.txt", "b", 9L, "text/plain", t1, "e9")
    ).toDF("name", "bucket", "size", "content_type", "last_modified", "etag")
    val got = SyncOps.orphanAntiJoin(target, catalog)
      .select("name").as[String].collect()
    assert(got.toSeq == Seq("orphan.txt"))
  }

  test("latest-wins merge upserts and preserves untouched rows") {
    val decided = SyncOps.catalogLedgerDiff(catalog, ledger, M)
    val updates = SyncOps.ledgerUpdatesFromDecisions(
      SyncOps.needsSync(decided), M, lit("2026-01-01 00:00:00").cast("timestamp"))
    val merged = SyncOps.ledgerLatestWins(ledger, updates)
    val byName = merged.select("object_name", "etag", "sync_status", "last_synced")
      .as[(String, String, String, Timestamp)].collect()
      .map(r => r._1 -> r).toMap

    assert(byName.size == 6) // 5 ledger rows + new.txt
    assert(byName("new.txt")._2 == "e1")
    assert(byName("etag.txt")._2 == "e4b")            // updated to source etag
    assert(byName("failed.txt")._3 == "success")      // retry succeeded
    assert(byName("same.txt")._4 == t1)               // untouched
    assert(byName("gone.txt")._2 == "e6")             // not in source, kept
  }

  test("latest-wins tie-break prefers the update on equal last_synced") {
    val upd = ledger.filter($"object_name" === "same.txt")
      .withColumn("etag", lit("e2-new"))
    val merged = SyncOps.ledgerLatestWins(ledger, upd)
    val etag = merged.filter($"object_name" === "same.txt")
      .select("etag").as[String].head()
    assert(etag == "e2-new")
  }

  test("upsert (anti-join form) equals latest-wins merge on a sync batch") {
    val decided = SyncOps.catalogLedgerDiff(catalog, ledger, M)
    val updates = SyncOps.ledgerUpdatesFromDecisions(
      SyncOps.needsSync(decided), M, lit("2026-01-01 00:00:00").cast("timestamp"))
    val a = SyncOps.ledgerUpsert(ledger, updates)
    val b = SyncOps.ledgerLatestWins(ledger, updates)
    assert(a.columns.toSeq == b.columns.toSeq)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("upsert collapses duplicate keys WITHIN the update batch (last wins)") {
    val dup = Seq(
      (0L, M, "same.txt", 4L, t1, "older", "text/plain", t1, "success"),
      (0L, M, "same.txt", 4L, t2, "newer", "text/plain", t2, "success"))
      .toDF("id", "mapping_id", "object_name", "size", "last_modified",
            "etag", "content_type", "last_synced", "sync_status")
    val merged = SyncOps.ledgerUpsert(ledger, dup)
      .filter($"object_name" === "same.txt")
      .select("etag", "last_synced").as[(String, Timestamp)].collect()
    assert(merged.toSeq == Seq(("newer", t2)))
  }

  test("upsert plan has no window sort and broadcasts the update side") {
    val decided = SyncOps.catalogLedgerDiff(catalog, ledger, M)
    val updates = SyncOps.ledgerUpdatesFromDecisions(
      SyncOps.needsSync(decided), M, lit("2026-01-01 00:00:00").cast("timestamp"))
    val plan = SyncOps.ledgerUpsert(ledger, updates)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in upsert plan:\n$plan")
  }

  test("scd2 history chains validity intervals with an open current row") {
    val decided = SyncOps.catalogLedgerDiff(catalog, ledger, M)
    val updates = SyncOps.ledgerUpdatesFromDecisions(
      SyncOps.needsSync(decided), M, lit("2026-01-01 00:00:00").cast("timestamp"))
    val hist = SyncOps.ledgerHistoryScd2(ledger, updates)
      .select("object_name", "valid_from", "valid_to")
      .as[(String, Timestamp, Option[Timestamp])].collect()
    val mtime = hist.filter(_._1 == "mtime.txt").sortBy(_._2.getTime)
    // re-synced object: old version closed at the new version's start
    assert(mtime.length == 2)
    assert(mtime(0)._3.contains(mtime(1)._2) && mtime(1)._3.isEmpty)
    // untouched object: exactly one open version
    val same = hist.filter(_._1 == "same.txt")
    assert(same.length == 1 && same.head._3.isEmpty)
  }

  test("ledger delete removes exactly the doomed keys") {
    val doomed = Seq("gone.txt").toDF("name")
    val left = SyncOps.ledgerDelete(ledger, doomed)
      .select("object_name").as[String].collect().toSet
    assert(!left.contains("gone.txt") && left.size == 4)
  }

  test("config validation finds duplicates and dangling FKs") {
    val providers = Seq(("a", "gcs"), ("b", "s3"), ("a", "azure"))
      .toDF("id", "provider_type")
    val dups = SyncOps.duplicateProviderIds(providers)
      .select("id").as[String].collect()
    assert(dups.toSeq == Seq("a"))

    val mappings = Seq(("a", "x", "nope", "y"))
      .toDF("source_provider_id", "source_bucket",
            "target_provider_id", "target_bucket")
    val dangling = SyncOps.danglingMappings(mappings, providers)
    assert(dangling.count() == 1)
  }

  test("multi-mapping diff equals per-mapping diff plus all-new mapping") {
    val m2 = "other:x->other:y"
    val cat2 = Seq(("extra.txt", "x", 4L, "text/plain", t1, "e9"))
      .toDF("name", "bucket", "size", "content_type", "last_modified", "etag")
    val tagged = catalog.withColumn("mapping_id", lit(M))
      .unionByName(cat2.withColumn("mapping_id", lit(m2)))
    val all = SyncOps.syncOutcomeCountsAll(
        SyncOps.catalogLedgerDiffAll(tagged, ledger))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val single = SyncOps.syncOutcomeCounts(
        SyncOps.catalogLedgerDiff(catalog, ledger, M), M)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(all.filter(_._1._1 == M) == single)
    assert(all((m2, "sync_new")) == 1L)
  }

  test("snapshot diff classifies added/removed/modified/unchanged") {
    val before = Seq(("a", "e1"), ("b", "e2"), ("c", "e3"))
      .toDF("name", "etag")
    val after = Seq(("b", "e2"), ("c", "e3x"), ("d", "e4"))
      .toDF("name", "etag")
    val got = SyncOps.catalogSnapshotDiff(before, after)
      .select("name", "change").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "removed", "b" -> "unchanged",
                      "c" -> "modified", "d" -> "added"))
  }

  test("incremental catalog scan pushes the watermark into the parquet scan") {
    val plan = SparkEntry.queries("catalog_scan_incremental")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"),
      s"watermark not pushed to scan:\n$plan")
  }

  test("mapping_id format matches the reference") {
    val got = SyncOps.withMappingId(
      Seq(("gcs", "src", "s3", "dst"))
        .toDF("source_provider_id", "source_bucket",
              "target_provider_id", "target_bucket"))
      .select("mapping_id").as[String].head()
    assert(got == "gcs:src->s3:dst")
  }
}
