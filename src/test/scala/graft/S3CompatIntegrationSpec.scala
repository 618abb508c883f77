package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CopyExecutor
import graft.sources.ObjectStoreCatalog

/** S3-compatible (MinIO-style) integration smoke: one REAL `s3a://` round
  * trip of put / list / head-enrichment / delete, so the "connectors are
  * config" parity claim (ObjectStoreCatalog's Hadoop-FS-URI design vs the
  * reference's provider SDK clients, internal/providers/minio/client.go:
  * 59-147) has a tested path on a networked CI.
  *
  * Gated by environment — in this sandbox (zero egress) every test here
  * CANCELS, visibly, rather than passing vacuously:
  *
  *   GRAFT_S3_TEST_BUCKET=s3a://bucket/graft-it    (enables the suite)
  *   GRAFT_S3_ENDPOINT=http://localhost:9000       (MinIO-style endpoint;
  *                                                  optional for real S3)
  *   AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY     (or any hadoop-aws
  *                                                  credential provider)
  *
  * Classpath note: `hadoop-aws` + the AWS SDK bundle must be on the Spark
  * classpath (they ship in most distros' jars dir; this offline sandbox's
  * does not include them — another reason the gate cancels here).
  */
class S3CompatIntegrationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark

  private val bucket = sys.env.get("GRAFT_S3_TEST_BUCKET")

  private def withS3(testBody: String => Unit): Unit = {
    assume(bucket.isDefined,
      "GRAFT_S3_TEST_BUCKET not set — S3-compatible integration smoke " +
        "skipped (no egress in this environment)")
    val conf = spark.sparkContext.hadoopConfiguration
    sys.env.get("GRAFT_S3_ENDPOINT").foreach { ep =>
      conf.set("fs.s3a.endpoint", ep)
      conf.set("fs.s3a.path.style.access", "true") // MinIO default
      conf.set("fs.s3a.connection.ssl.enabled",
        ep.startsWith("https").toString)
    }
    testBody(bucket.get.stripSuffix("/"))
  }

  test("s3a round trip: put, list, head-enrich, delete") {
    withS3 { base =>
      import spark.implicits._
      val runId = java.util.UUID.randomUUID().toString.take(8)
      val src = graft.sources.IoFixtures.freshDir(s"s3it-$runId")
      graft.sources.IoFixtures.write(src, "a.txt", "alpha")
      graft.sources.IoFixtures.write(src, "p/b.json", "{}")
      val dst = s"$base/run-$runId"
      ObjectStoreCatalog.ensureBucket(spark, dst)

      // put: the distributed copy executor against the s3a target
      val tasks = Seq(("a.txt", 5L, "text/plain"),
                      ("p/b.json", 2L, "application/json"))
        .toDF("name", "size", "content_type")
      val receipts = CopyExecutor
        .copyObjects(spark, tasks, graft.sources.IoFixtures.uri(src), dst)
        .toDF().localCheckpoint(true)
      assert(receipts.filter($"sync_status" === "success").count() == 2)

      // list: the catalog scan sees exactly what was put
      val listed = ObjectStoreCatalog.scanCatalog(spark, dst)
      val names = listed.select("name").as[String].collect().toSet
      assert(names == Set("a.txt", "p/b.json"))

      // head enrichment: content types derived per key, non-null sizes
      val head = listed.select("name", "size", "content_type").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(head("a.txt") == (5L, "text/plain"))
      assert(head("p/b.json") == (2L, "application/json"))

      // delete: orphan executor removes both; the listing drains to empty
      val orphans = Seq("a.txt", "p/b.json").toDF("name")
      val removed = CopyExecutor.deleteObjects(spark, orphans, dst)
        .toDF().localCheckpoint(true)
      assert(removed.filter($"removed").count() == 2)
      assert(ObjectStoreCatalog.scanCatalog(spark, dst).count() == 0)
    }
  }

  test("s3a distributed listing and compaction against the bucket") {
    withS3 { base =>
      import spark.implicits._
      val runId = java.util.UUID.randomUUID().toString.take(8)
      val src = graft.sources.IoFixtures.freshDir(s"s3it-dist-$runId")
      for (d <- 1 to 3; f <- 1 to 4)
        graft.sources.IoFixtures.write(src, s"p$d/f$f.txt", s"$d-$f")
      val dst = s"$base/dist-$runId"
      ObjectStoreCatalog.ensureBucket(spark, dst)
      val tasks = (for (d <- 1 to 3; f <- 1 to 4)
        yield (s"p$d/f$f.txt", 3L, "text/plain")).toDF("name", "size", "content_type")
      assert(CopyExecutor
        .copyObjects(spark, tasks, graft.sources.IoFixtures.uri(src), dst)
        .filter(_.sync_status == "success").count() == 12)

      // distributed listing: executor tasks must see the session's s3a
      // endpoint/credentials (the TaskConf path — a bare Configuration
      // would fail here on a real cluster and, pre-r13, silently did)
      val dist = ObjectStoreCatalog
        .scanCatalogDistributed(spark, dst, splitThreshold = 2)
      assert(dist.select("name").as[String].collect().toSet ==
        (for (d <- 1 to 3; f <- 1 to 4) yield s"p$d/f$f.txt").toSet)

      // compaction: stream-concatenate p1's members into one object
      val bins = Seq(("compact/p1.bin",
        (1 to 4).map(f => s"p1/f$f.txt"))).toDF("target_name", "members")
      val cr = CopyExecutor.compactObjects(spark, bins, dst, dst).collect()
      assert(cr.length == 1 && cr.head.sync_status == "success" &&
        cr.head.size == 12L)
    }
  }

  test("s3a sync engine end-to-end against the bucket") {
    withS3 { base =>
      val runId = java.util.UUID.randomUUID().toString.take(8)
      val src = graft.sources.IoFixtures.freshDir(s"s3it-sync-$runId")
      graft.sources.IoFixtures.write(src, "f1.txt", "one")
      graft.sources.IoFixtures.write(src, "f2.txt", "two")
      val cfg = graft.config.SyncConfig(
        providers = Seq(
          graft.config.ProviderConf("local", "file",
            graft.sources.IoFixtures.uri(src.getParent)),
          graft.config.ProviderConf("s3", "s3", base)),
        mappings = Seq(graft.config.MappingConf(
          "local", src.getFileName.toString, "s3", s"sync-$runId")),
        ledgerPath = src.resolveSibling(s"ledger-$runId").toString)
      val report = new SyncEngine(spark, cfg).syncAll()
      assert(report.head.synced == 2 && report.head.failed == 0)
      // second cycle: needs-sync predicate skips everything
      val again = new SyncEngine(spark, cfg).syncAll()
      assert(again.head.skipped == 2 && again.head.synced == 0)
    }
  }

  test("s3a post-copy tagger: executor-driven foreachPartition tag pass " +
       "round-trips the receipts through the real store") {
    withS3 { base =>
      val runId = java.util.UUID.randomUUID().toString.take(8)
      val src = graft.sources.IoFixtures.freshDir(s"s3it-tag-$runId")
      graft.sources.IoFixtures.write(src, "x.txt", "xx")
      graft.sources.IoFixtures.write(src, "p/y.json", """{"y":1}""")
      val tgt = s"$base/tag-$runId"
      val cfg = graft.config.SyncConfig(
        providers = Seq(
          graft.config.ProviderConf("local", "file",
            graft.sources.IoFixtures.uri(src.getParent)),
          graft.config.ProviderConf("s3", "s3", base)),
        mappings = Seq(graft.config.MappingConf(
          "local", src.getFileName.toString, "s3", s"tag-$runId")),
        ledgerPath = src.resolveSibling(s"ledger-$runId").toString)

      // a provider-SDK stand-in driven EXACTLY per the scale contract:
      // foreachPartition, task-side FileSystem from TaskConf (never a
      // collect) — it "re-applies" each success receipt's header by
      // writing a `tags/<name>.tag` witness object whose body is the
      // content_type, so the store itself proves what reached the tagger
      val taskConf = graft.sources.TaskConf(spark)
      val witnessTagger = new graft.sources.PostCopyTagger {
        override def tag(mappingId: String, targetUri: String,
                         tagged: org.apache.spark.sql.DataFrame): Unit =
          tagged.select("object_name", "content_type").foreachPartition {
            (it: Iterator[org.apache.spark.sql.Row]) =>
              val conf = taskConf.value
              it.foreach { r =>
                val p = new org.apache.hadoop.fs.Path(
                  s"$targetUri/tags/${r.getString(0)}.tag")
                val fs = p.getFileSystem(conf)
                val out = fs.create(p, true)
                try out.write(r.getString(1).getBytes("UTF-8"))
                finally out.close()
              }
          }
      }
      val report = new SyncEngine(spark, cfg, witnessTagger).syncAll()
      assert(report.head.synced == 2 && report.head.tagFailed == 0)

      import spark.implicits._
      val listed = ObjectStoreCatalog.scanCatalog(spark, tgt)
        .select("name").as[String].collect().toSet
      assert(listed.contains("tags/x.txt.tag") &&
             listed.contains("tags/p/y.json.tag"),
        s"tag witnesses missing from the store: $listed")
      // witness bodies carry the receipts' header values through the store
      val fs = new org.apache.hadoop.fs.Path(tgt)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def body(n: String): String = {
        val in = fs.open(new org.apache.hadoop.fs.Path(s"$tgt/tags/$n.tag"))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      assert(body("x.txt") == "text/plain")
      assert(body("p/y.json") == "application/json")
    }
  }

  test("s3a copy/delete/ledger-commit round-trip: receipts, orphans, partitions") {
    withS3 { base =>
      import spark.implicits._
      val runId = java.util.UUID.randomUUID().toString.take(8)
      val src = graft.sources.IoFixtures.freshDir(s"s3it-ledger-$runId")
      graft.sources.IoFixtures.write(src, "keep.txt", "keep")
      graft.sources.IoFixtures.write(src, "gone.txt", "gone")
      val tgt = s"$base/rt-$runId"
      val ledgerPath = src.resolveSibling(s"ledger-$runId").toString
      val cfg = graft.config.SyncConfig(
        providers = Seq(
          graft.config.ProviderConf("local", "file",
            graft.sources.IoFixtures.uri(src.getParent)),
          graft.config.ProviderConf("s3", "s3", base)),
        mappings = Seq(graft.config.MappingConf(
          "local", src.getFileName.toString, "s3", s"rt-$runId")),
        ledgerPath = ledgerPath)
      val mid = cfg.mappings.head.mappingId

      // stage a pre-existing orphan in the s3a target: the first cycle's
      // object_delete path must remove it via executor-side credentials
      // (TaskConf propagation exercised end-to-end on delete, not just put)
      val tmp = graft.sources.IoFixtures.freshDir(s"s3it-orph-$runId")
      graft.sources.IoFixtures.write(tmp, "orphan.txt", "stale")
      assert(CopyExecutor.copyObjects(spark,
          Seq(("orphan.txt", 5L, "text/plain"))
            .toDF("name", "size", "content_type"),
          graft.sources.IoFixtures.uri(tmp), tgt)
        .filter(_.sync_status == "success").count() == 1)

      // cycle 1: object_put receipts land in the ledger, orphan deleted
      val r1 = new SyncEngine(spark, cfg).syncAll()
      assert(r1.head.synced == 2 && r1.head.failed == 0)
      assert(r1.head.orphansRemoved == 1)
      val led1 = SyncEngine.readLedger(spark, ledgerPath).collect()
      assert(led1.length == 2)
      assert(led1.forall(_.getAs[String]("mapping_id") == mid))
      assert(led1.forall(_.getAs[String]("sync_status") == "success"))
      // the committed rows carry the s3a catalog's head-enrichment fields
      assert(led1.forall(r => r.getAs[Long]("size") > 0L &&
        r.getAs[String]("etag") != null &&
        r.getAs[String]("content_type") == "text/plain"))
      // and the commit wrote the partition-scoped layout
      val fs = new org.apache.hadoop.fs.Path(ledgerPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(SyncEngine.partitionedLayout(fs,
        new org.apache.hadoop.fs.Path(ledgerPath)))

      // drop a source object: cycle 2's orphan path deletes it from the
      // s3a target AND from the ledger (keyed delete inside the commit)
      java.nio.file.Files.delete(src.resolve("gone.txt"))
      val r2 = new SyncEngine(spark, cfg).syncAll()
      assert(r2.head.orphansRemoved == 1)
      val led2 = SyncEngine.readLedger(spark, ledgerPath)
        .select("object_name").as[String].collect().toSet
      assert(led2 == Set("keep.txt"))
      val left = ObjectStoreCatalog.scanCatalog(spark, tgt)
        .select("name").as[String].collect().toSet
      assert(left == Set("keep.txt"))
    }
  }
}
