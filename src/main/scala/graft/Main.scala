package graft

import org.apache.spark.sql.SparkSession

import graft.config.SyncConfig
import graft.streaming.ContinuousSync

/** CLI entry point mirroring the reference binary
  * (`cmd/cloud-data-sync/main.go`):
  *
  *   --config <path>      JSON config; created with defaults when absent
  *                        (main.go:26-35)
  *   --generate-config    write the default config to --config and exit 0
  *                        (main.go:21,31-39)
  *   --continuous         sync every --interval seconds until interrupted
  *                        (main.go:87-106)
  *   --once               explicit single-cycle mode (main.go:22). NOTE the
  *                        polarity inversion vs the reference: the reference
  *                        defaults to continuous and `--once` opts OUT;
  *                        this binary defaults to once and `--continuous`
  *                        opts IN (documented in README). `--once` is
  *                        accepted for reference-parity muscle memory and
  *                        wins over `--continuous` when both are given.
  *   --interval <sec>     cycle period, default 300 (main.go:23)
  *
  * Exit code 0 when every mapping synced, 1 on config errors or any
  * failed mapping — the reference's log.Fatalf surface.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-sync")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    // sys.exit never returns, so stop() must run before it, not in finally
    val code = try run(spark, args) finally spark.stop()
    sys.exit(code)
  }

  /** Load the config, creating the default file when absent (main.go:26-35).
    * Left = exit code on validation failure.
    */
  def loadOrCreate(configPath: String): Either[Int, SyncConfig] = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(configPath))) {
      System.err.println(s"[sync] creating default config at $configPath")
      SyncConfig.saveDefault(configPath)
    }
    val cfg = SyncConfig.load(configPath)
    val problems = cfg.validate()
    if (problems.nonEmpty) {
      problems.foreach(p => System.err.println(s"[sync] invalid config: $p"))
      Left(1)
    } else Right(cfg)
  }

  /** Testable core: parse flags, load-or-create config, validate, run. */
  def run(spark: SparkSession, args: Array[String]): Int = {
    var configPath = "config.json"
    var continuous = false
    var once = false
    var generateOnly = false
    var intervalSec = 300L
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--config" if i + 1 < args.length =>
          configPath = args(i + 1); i += 2
        case "--interval" if i + 1 < args.length =>
          args(i + 1).toLongOption.filter(_ > 0) match {
            case Some(sec) => intervalSec = sec; i += 2
            case None =>
              System.err.println(
                s"[sync] --interval needs a positive integer, got: ${args(i + 1)}")
              return 1
          }
        case "--continuous" => continuous = true; i += 1
        case "--once" => once = true; i += 1
        case "--generate-config" => generateOnly = true; i += 1
        case other =>
          System.err.println(s"[sync] unknown argument: $other"); return 1
      }
    }
    if (once) continuous = false // explicit --once beats --continuous

    if (generateOnly) {
      // generate-and-exit, never syncs (main.go:31-39); unlike loadOrCreate
      // this OVERWRITES an existing file, matching SaveDefaultConfig
      return try {
        SyncConfig.saveDefault(configPath)
        System.err.println(s"[sync] generated default config at $configPath")
        0
      } catch {
        case e: Exception =>
          System.err.println(s"[sync] error generating config: ${e.getMessage}")
          1
      }
    }

    val cfg = loadOrCreate(configPath) match {
      case Left(code) => return code
      case Right(c) => c
    }

    if (continuous) {
      val q = ContinuousSync.start(spark, cfg, intervalSec * 1000L)
      // SIGTERM/SIGINT → graceful cancel-cycle stop (main.go:71-72,108-113):
      // the hook stops the ticker, awaitTermination returns, and the
      // interrupted objects re-sync next run via their ledger status
      val hook = ContinuousSync.installStopHook(q)
      try { q.awaitTermination(); 0 }
      finally ContinuousSync.removeStopHook(hook)
    } else {
      val engine = new SyncEngine(spark, cfg)
      val reports = engine.syncAll()
      reports.foreach { r =>
        println(s"[sync] ${r.mappingId}: synced=${r.synced} " +
          s"skipped=${r.skipped} failed=${r.failed} " +
          s"orphans_removed=${r.orphansRemoved}")
      }
      val mappingsFailed = cfg.mappings.size - reports.size
      if (mappingsFailed > 0 || reports.exists(_.failed > 0)) 1 else 0
    }
  }
}
