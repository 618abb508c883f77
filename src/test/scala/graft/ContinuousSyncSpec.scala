package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{MappingConf, ProviderConf, SyncConfig}

class ContinuousSyncSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark

  private def write(p: Path, s: String): Unit = {
    Files.createDirectories(p.getParent)
    Files.write(p, s.getBytes("UTF-8"))
  }

  test("streaming ticker runs sync cycles until stopped") {
    Spec.sweepCaches()  // deadline-sensitive: measure cycles, not leftovers
    val root = Files.createTempDirectory("graft-stream")
    write(root.resolve("src/a.txt"), "alpha")
    val cfg = SyncConfig(
      providers = Seq(ProviderConf("local", "file", s"file://$root")),
      mappings = Seq(MappingConf("local", "src", "local", "dst")),
      ledgerPath = s"$root/ledger")

    val q = graft.streaming.ContinuousSync.start(spark, cfg, intervalMs = 500)
    try {
      // wait for at least one cycle to land the copy — poll for CONTENT,
      // not existence: the copy executor's create() makes the file visible
      // before the bytes are written/closed, so an exists-then-read poll
      // can catch a 0-byte window under machine load (r11 flake)
      def contentIs(rel: String, want: String): Boolean =
        Files.exists(root.resolve(rel)) &&
          new String(Files.readAllBytes(root.resolve(rel))) == want
      val deadline = System.currentTimeMillis() + 30000
      while (!contentIs("dst/a.txt", "alpha") &&
             System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(contentIs("dst/a.txt", "alpha"))

      // a file added mid-stream is picked up by a later cycle
      write(root.resolve("src/b.txt"), "beta")
      val deadline2 = System.currentTimeMillis() + 30000
      while (!contentIs("dst/b.txt", "beta") &&
             System.currentTimeMillis() < deadline2) Thread.sleep(200)
      assert(contentIs("dst/b.txt", "beta"))
    } finally graft.streaming.ContinuousSync.stop(q)  // ≙ SIGTERM, main.go:108-113
  }

  test("stop hook mirrors SIGTERM: graceful stop, re-sync next run via ledger") {
    Spec.sweepCaches()  // deadline-sensitive: measure cycles, not leftovers
    val root = Files.createTempDirectory("graft-sigterm")
    write(root.resolve("src/a.txt"), "alpha")
    val cfg = SyncConfig(
      providers = Seq(ProviderConf("local", "file", s"file://$root")),
      mappings = Seq(MappingConf("local", "src", "local", "dst")),
      ledgerPath = s"$root/ledger")

    val q = graft.streaming.ContinuousSync.start(spark, cfg, intervalMs = 300)
    val hook = graft.streaming.ContinuousSync.installStopHook(q)
    try {
      // wait for the first cycle, land a new object, then fire the "signal"
      // while cycles are ticking — hook.run() IS the code path a TERM runs
      val deadline = System.currentTimeMillis() + 30000
      while (!Files.exists(root.resolve("dst/a.txt")) &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(Files.exists(root.resolve("dst/a.txt")))
      write(root.resolve("src/b.txt"), "beta")
      hook.run()
      assert(!q.isActive)            // graceful cancel-cycle stop landed
      assert(q.exception.isEmpty)    // ...and surfaced no error (clean exit)

      // b.txt may or may not have made the interrupted cycle; the NEXT run
      // decides from the ledger (sync_new / sync_retry) and converges —
      // the reference's restart-after-SIGTERM contract
      val reports = new SyncEngine(spark, cfg).syncAll()
      assert(reports.nonEmpty && reports.forall(_.failed == 0))
      assert(new String(Files.readAllBytes(root.resolve("dst/b.txt"))) == "beta")
      val statuses = SyncEngine.readLedger(spark, cfg.ledgerPath)
        .select("object_name", "sync_status")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(statuses("a.txt") == "success" && statuses("b.txt") == "success")
    } finally {
      graft.streaming.ContinuousSync.removeStopHook(hook)
      graft.streaming.ContinuousSync.stop(q)
    }
  }
}
