package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.sources.Tables
import graft.streaming.StreamingOps

/** Streaming results must equal the batch operators row-for-row — that is
  * the contract the shared DuckDB oracles rely on.
  */
class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark

  private val dir = "/root/testdata/sf0.001"

  test("streaming window counts equal batch tumbling counts") {
    val streamed = StreamingOps.windowCounts(spark, dir, "1 hour")
      .collect().map(_.toSeq).toSet
    val batch = EventOps.tumblingCounts(Tables.events(spark, dir), "1 hour")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming exact dedup equals batch dedup") {
    val streamed = StreamingOps.dedupExactStream(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.TextOps.dedupExact(Tables.documents(spark, dir))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming dedup under the RocksDB state store matches batch") {
    // The scale-path state backend (StreamingOps scale note): HDFS-backed
    // in-memory state OOMs once distinct-key state outgrows executor heap;
    // RocksDB spills to local disk. Same query, same oracle-checked result.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = StreamingOps.dedupExactStream(spark, dir)
        .collect().map(_.toSeq).toSet
      val batch = graft.operators.TextOps.dedupExact(Tables.documents(spark, dir))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("watermark-bounded streaming dedup equals batch distinct") {
    import spark.implicits._
    val streamed = StreamingOps.dedupWithinWatermarkStream(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.md5($"text").as("content_hash"),
              org.apache.spark.sql.functions.length($"text").cast("long"))
      .distinct().collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming near-dup candidates equal the batch banded-minhash set") {
    val streamed = StreamingOps.minhashCandidatesStream(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.TextOps
      .minhashCandidates(Tables.documents(spark, dir))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming decontamination equals the cap-free batch operator") {
    val streamed = StreamingOps.contaminationStream(spark, dir, minShared = 3)
      .collect().map(_.toSeq).toSet
    val docs = Tables.documents(spark, dir)
    import org.apache.spark.sql.functions.col
    val batch = graft.operators.TextOps.contamination(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        minShared = 3, maxDf = Int.MaxValue) // cap-free, like the stream
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("bench-side df cap yields a subset of the uncapped contamination") {
    val uncapped = StreamingOps.contaminationStream(spark, dir, minShared = 3)
      .collect().map(_.toSeq).toSet
    val capped = StreamingOps
      .contaminationStream(spark, dir, minShared = 3, benchMaxDf = 1)
      .collect().map(_.toSeq).toSet
    // dropping benchmark-boilerplate shingles can only remove or shrink
    // pairs (n_shared may drop below threshold), never invent them
    val uncappedKeys = uncapped.map(r => (r(0), r(1)))
    assert(capped.forall(r => uncappedKeys.contains((r(0), r(1)))))
  }

  test("capped band state yields a subset of the batch candidate pairs") {
    // maxPerBand bounds hot-band state; dropped pairs are only within
    // oversized groups, so the result must stay a subset — never invent
    val batch = graft.operators.TextOps
      .minhashCandidates(Tables.documents(spark, dir))
      .collect().map(_.toSeq).toSet
    val capped = StreamingOps
      .minhashCandidatesStream(spark, dir, maxPerBand = 1)
      .collect().map(_.toSeq).toSet
    assert(capped.subsetOf(batch) && capped.nonEmpty)
  }

  test("stateful streaming sessionize equals batch sessionize") {
    val streamed = StreamingOps.sessionizeStateful(spark, dir, 30)
      .collect().map(_.toSeq).toSet
    val batch = EventOps.sessionStats(Tables.events(spark, dir), 30)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }
}
