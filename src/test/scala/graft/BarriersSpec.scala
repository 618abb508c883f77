package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Barriers

/** The pluggable materialization barrier: every strategy yields the same
  * frame; the unknown strategy fails fast (a typo must not silently fall
  * back to executor-local blocks on a cluster that needed durability).
  */
class BarriersSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark

  test("persist and localCheckpoint strategies return identical frames") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    val viaDefault = Barriers.materialize(df).collect().map(_.getInt(0)).sorted
    spark.conf.set(Barriers.StrategyKey, "persist")
    try {
      val viaPersist =
        Barriers.materialize(df, eager = true).collect().map(_.getInt(0)).sorted
      assert(viaDefault.sameElements(Array(1, 2, 3)))
      assert(viaPersist.sameElements(Array(1, 2, 3)))
    } finally spark.conf.unset(Barriers.StrategyKey)
  }

  test("unknown strategy fails fast") {
    import spark.implicits._
    spark.conf.set(Barriers.StrategyKey, "nope")
    try intercept[IllegalArgumentException] {
      Barriers.materialize(Seq(1).toDF("x"))
    } finally spark.conf.unset(Barriers.StrategyKey)
  }
}
