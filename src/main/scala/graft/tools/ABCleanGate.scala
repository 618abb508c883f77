package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of the corpus-cleaning gate's two forms (r13 verdict item 6):
  *
  *   A. native single-pass [[graft.functions.CleanGate]] (CodegenFallback,
  *      one tokenization per row in a JVM loop)
  *   B. the declarative chain `predictedLangExpr === "en" &&
  *      qualityScoreExpr >= q` — SEVEN marker_count subtrees, which since
  *      r13's MarkerCount `doGenCode` stay INSIDE whole-stage codegen,
  *      where subexpression elimination can share the tokens(text) child.
  *
  * CleanGate was built when MarkerCount was CodegenFallback and the
  * declarative filter re-tokenized ~6× per row; this measures whether the
  * codegen'd MarkerCount closed that gap (if so, CleanGate is dead weight).
  * Usage: runMain graft.tools.ABCleanGate <sfDir> [reps]
  */
object ABCleanGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val gate = graft.operators.TextOps.cleanGate(0.5)
    val declarative = graft.operators.TextOps.predictedLangExpr === "en" &&
      graft.operators.TextOps.qualityScoreExpr >= 0.5

    def time(label: String, c: org.apache.spark.sql.Column): Double = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        docs.filter(c).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = runs(runs.length / 2)
      println(f"[ab] $label%-12s median $med%.3f s  runs ${runs.map(r => f"$r%.3f").mkString(" ")}")
      med
    }
    // parity first: the A/B is meaningless if the row sets diverge
    val nA = docs.filter(gate).count()
    val nB = docs.filter(declarative).count()
    require(nA == nB, s"forms diverge: gate=$nA declarative=$nB")
    println(s"[ab] both forms keep $nA rows")
    // SYMMETRIC warm-up (r14 advisory): each form pays its whole-stage
    // codegen compile/JIT cold run before ITS measured reps — a one-sided
    // warmup would bias the A/B toward the warmed form, the exact
    // decision this tool exists to make. (The parity counts above also
    // ran each form once; these keep the discipline explicit and local
    // to the timed section.)
    time("warmup_a", gate)
    val a = time("clean_gate", gate)
    time("warmup_b", declarative)
    val b = time("declarative", declarative)
    println(f"""{"clean_gate_s":$a%.3f,"declarative_s":$b%.3f,"ratio":${b / a}%.3f}""")
    spark.stop()
  }
}
