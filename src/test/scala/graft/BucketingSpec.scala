package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark

  private val dir = "/root/testdata/sf0.001"

  test("bucketed join runs without a shuffle exchange") {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    Bucketing.writeBucketed(li.select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 8)
    Bucketing.writeBucketed(o.select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 8)

    // force SMJ (broadcast would hide the bucketing effect at this size)
    withAutoBroadcastOff {
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "k")
      assert(!Bucketing.hasShuffle(joined),
        "bucketed join must not shuffle:\n" +
          joined.queryExecution.executedPlan.toString)

      // same join over plain parquet DOES shuffle — the baseline bucketing removes
      val plain = li.withColumnRenamed("l_orderkey", "k").select("k", "l_quantity")
        .join(o.withColumnRenamed("o_orderkey", "k").select("k", "o_totalprice"),
              Seq("k"))
      assert(Bucketing.hasShuffle(plain))

      // and results agree
      assert(joined.count() == plain.count())
    }
  }

  test("bucketed catalog-ledger diff join runs shuffle-free") {
    // the product's hot path (SyncOps.catalogLedgerDiff) on pre-bucketed
    // tables: at 100 TB the ledger and catalog are written bucketed by
    // object name, so the per-cycle diff join never re-shuffles either side
    val orders = Tables.orders(spark, dir)
    Bucketing.writeBucketed(
      graft.sources.SyncRelations.sourceCatalog(orders)
        .drop("metadata").withColumnRenamed("name", "object_name"),
      "b_catalog", "object_name", 8)
    Bucketing.writeBucketed(
      graft.sources.SyncRelations.ledger(orders)
        .select("object_name", "last_modified", "etag", "sync_status"),
      "b_ledger", "object_name", 8)
    withAutoBroadcastOff {
      val diff = spark.table("b_catalog")
        .join(spark.table("b_ledger"), Seq("object_name"), "left_outer")
      assert(!Bucketing.hasShuffle(diff),
        "bucketed diff join must not shuffle:\n" +
          diff.queryExecution.executedPlan.toString)
      assert(diff.count() == spark.table("b_catalog").count())
    }
  }

  test("mapping_id-partitioned ledger reads are partition-pruned") {
    // backs the SCALE.md claim: per-mapping ledger reads touch only that
    // mapping's partition directory (the SQLite composite index's job,
    // done by layout)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ledger-prune")
    val spark2 = spark
    import spark2.implicits._
    Seq(("m1", "a", "e1"), ("m1", "b", "e2"), ("m2", "c", "e3"))
      .toDF("mapping_id", "object_name", "etag")
      .write.mode("overwrite").partitionBy("mapping_id")
      .parquet(dir2.toString)
    val one = spark.read.parquet(dir2.toString)
      .filter(col("mapping_id") === "m1")
    val formatted = one.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // mapping_id must appear INSIDE the PartitionFilters list — the bare
    // substrings both occur even when pruning fails (empty filter list +
    // the column in scan output)
    val pruned = """PartitionFilters: \[[^\]]*mapping_id""".r
      .findFirstIn(formatted).isDefined
    assert(pruned,
      s"mapping filter not applied as partition filter:\n$formatted")
    assert(one.count() == 2)
  }

  private def withAutoBroadcastOff[T](f: => T): T = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
