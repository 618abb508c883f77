package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The CLI surface (reference `cmd/cloud-data-sync/main.go`): config
  * auto-creation, validation failure exit, and a full once-mode sync over
  * local-FS buckets.
  */
class MainSpec extends AnyFunSuite {
  lazy val spark = Spec.spark

  private def write(p: Path, s: String): Unit = {
    Files.createDirectories(p.getParent)
    Files.write(p, s.getBytes("UTF-8"))
  }

  test("once mode syncs and exits 0; unknown flag exits 1") {
    val root = Files.createTempDirectory("graft-cli")
    write(root.resolve("src/a.txt"), "hello")
    val cfgPath = root.resolve("config.json")
    write(cfgPath,
      s"""{"providers": [{"id": "local", "type": "file", "uri": "file://$root"}],
          "mappings": [{"sourceProviderId": "local", "sourceBucket": "src",
                        "targetProviderId": "local", "targetBucket": "dst"}],
          "ledgerPath": "$root/ledger"}""")
    assert(Main.run(spark, Array("--config", cfgPath.toString)) == 0)
    assert(new String(Files.readAllBytes(root.resolve("dst/a.txt"))) == "hello")
    assert(Main.run(spark, Array("--bogus")) == 1)
    assert(Main.run(spark, Array("--interval", "abc", "--continuous")) == 1)
    assert(Main.run(spark, Array("--interval", "-5", "--continuous")) == 1)
  }

  test("missing config is created with defaults; invalid config exits 1") {
    val root = Files.createTempDirectory("graft-cli2")
    val fresh = root.resolve("new-config.json")
    // bootstrap only (no sync — the default config points at shared paths):
    // the file must be created and validate cleanly
    val created = Main.loadOrCreate(fresh.toString)
    assert(Files.exists(fresh) && created.isRight)
    assert(graft.config.SyncConfig.load(fresh.toString).validate().isEmpty)

    val bad = root.resolve("bad.json")
    write(bad,
      """{"providers": [], "mappings": [], "ledgerPath": "x"}""")
    // validation fails before any sync runs, so nothing is written
    assert(Main.run(spark, Array("--config", bad.toString)) == 1)
  }

  test("--generate-config writes defaults and exits without syncing") {
    val root = Files.createTempDirectory("graft-cli3")
    val cfg = root.resolve("gen.json")
    assert(Main.run(spark, Array("--generate-config", "--config", cfg.toString)) == 0)
    assert(Files.exists(cfg))
    assert(graft.config.SyncConfig.load(cfg.toString).validate().isEmpty)
    // generate-and-exit OVERWRITES (SaveDefaultConfig semantics): clobber a
    // stale file and confirm the content is the pristine default again
    write(cfg, """{"providers": []}""")
    assert(Main.run(spark, Array("--generate-config", "--config", cfg.toString)) == 0)
    assert(graft.config.SyncConfig.load(cfg.toString).providers.nonEmpty)
  }

  test("--once wins over --continuous and runs a single cycle") {
    val root = Files.createTempDirectory("graft-cli4")
    write(root.resolve("src/b.txt"), "world")
    val cfgPath = root.resolve("config.json")
    write(cfgPath,
      s"""{"providers": [{"id": "local", "type": "file", "uri": "file://$root"}],
          "mappings": [{"sourceProviderId": "local", "sourceBucket": "src",
                        "targetProviderId": "local", "targetBucket": "dst"}],
          "ledgerPath": "$root/ledger"}""")
    // --once + --continuous must return (continuous mode would block on
    // awaitTermination), proving --once forced the single cycle
    assert(Main.run(spark, Array("--config", cfgPath.toString,
                                 "--once", "--continuous")) == 0)
    assert(new String(Files.readAllBytes(root.resolve("dst/b.txt"))) == "world")
  }
}
