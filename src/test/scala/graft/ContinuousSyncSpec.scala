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
    val root = Files.createTempDirectory("graft-stream")
    write(root.resolve("src/a.txt"), "alpha")
    val cfg = SyncConfig(
      providers = Seq(ProviderConf("local", "file", s"file://$root")),
      mappings = Seq(MappingConf("local", "src", "local", "dst")),
      ledgerPath = s"$root/ledger")

    val q = graft.streaming.ContinuousSync.start(spark, cfg, intervalMs = 500)
    try {
      // wait for at least one cycle to land the copy
      val deadline = System.currentTimeMillis() + 30000
      while (!Files.exists(root.resolve("dst/a.txt")) &&
             System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(Files.exists(root.resolve("dst/a.txt")))
      assert(new String(Files.readAllBytes(root.resolve("dst/a.txt"))) == "alpha")

      // a file added mid-stream is picked up by a later cycle
      write(root.resolve("src/b.txt"), "beta")
      val deadline2 = System.currentTimeMillis() + 30000
      while (!Files.exists(root.resolve("dst/b.txt")) &&
             System.currentTimeMillis() < deadline2) Thread.sleep(200)
      assert(Files.exists(root.resolve("dst/b.txt")))
    } finally graft.streaming.ContinuousSync.stop(q)  // ≙ SIGTERM, main.go:108-113
  }
}
