package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("media synthesis produces binary payloads with typed metadata") {
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decode stub is deterministic and preserves row count") {
    val media = Multimodal.mediaFromDocuments(docs)
    val d1 = Multimodal.decodeAll(spark, media).collect().map(_.toSeq).toSet
    val d2 = Multimodal.decodeAll(spark, media).collect().map(_.toSeq).toSet
    assert(d1 == d2 && d1.size == docs.count())
  }

  test("decoded features have fixed dim and byte_len matches payload") {
    val media = Multimodal.mediaFromDocuments(docs.limit(10))
    val rows = Multimodal.decodeAll(spark, media)
      .select("byte_len", "features").collect()
    assert(rows.forall(_.getSeq[Float](1).length == 8))
    assert(rows.forall(_.getLong(0) > 0))
  }

  test("frame sampling yields ceil(frames/stride) chunks") {
    val media = Seq((1L, "video", "video/mp4", Array.fill[Byte](1000)(7)))
      .toDF("media_id", "kind", "content_type", "payload")
    val frames = Multimodal.frameSample(media, frameBytes = 100, stride = 2)
    // 10 full frames, stride 2 → 5 sampled
    assert(frames.count() == 5)
    assert(frames.select("frame_len").as[Int].collect().forall(_ == 100))
  }
}
