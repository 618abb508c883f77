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

  test("frame dedup collapses identical frames across media") {
    import org.apache.spark.sql.functions.{col, count, lit, md5, min}
    // constant payload → every sampled frame identical across both media
    val media = Seq(
      (1L, "video", "video/mp4", Array.fill[Byte](400)(7)),
      (2L, "video", "video/mp4", Array.fill[Byte](400)(7)),
      (3L, "video", "video/mp4", Array.fill[Byte](400)(9))) // different content
      .toDF("media_id", "kind", "content_type", "payload")
    val got = Multimodal.frameSample(media, frameBytes = 100, stride = 2)
      .select(col("media_id"), md5(col("frame")).as("frame_hash"))
      .groupBy("frame_hash")
      .agg(min(col("media_id")).as("keeper"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 2 sampled frames per media; media 1+2 share both hashes (keeper 1,
    // n=4 total per hash... frames within one media are also identical →
    // ONE hash with n=4 from media 1+2, ONE with n=2 from media 3
    assert(got.toSet.map((t: (String, Long, Long)) => (t._2, t._3)) ==
      Set((1L, 4L), (3L, 2L)))
  }

  test("frame features: exact integer byte-position sums, mean-centered") {
    // payload bytes 0,1,2,...,15 in one 16-byte frame: position-class j
    // holds bytes {j, j+8}, so sum_j = 2j+8; centered: 8*(2j+8) - 120
    val media = Seq((1L, "video", "video/mp4",
        Array.tabulate[Byte](16)(_.toByte)))
      .toDF("media_id", "kind", "content_type", "payload")
    val frames = Multimodal.frameSample(media, frameBytes = 16, stride = 1)
    val got = Multimodal.frameFeatures(frames).collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L * Multimodal.FrameIdShift)
    val v = got(0).getSeq[Double](1)
    assert(v == (0 until 8).map(j => (8.0 * (2 * j + 8)) - 120.0))
  }

  test("frame features drop zero-norm (constant-byte) frames") {
    // constant bytes → all position sums equal → centered vector is all
    // zeros → cosine would be 0/0 (NaN orders differently across engines)
    val media = Seq(
      (1L, "video", "video/mp4", Array.fill[Byte](64)(7)),
      (2L, "video", "video/mp4", Array.tabulate[Byte](64)(_.toByte)))
      .toDF("media_id", "kind", "content_type", "payload")
    val frames = Multimodal.frameSample(media, frameBytes = 64, stride = 1)
    val ids = Multimodal.frameFeatures(frames)
      .select("vec_id").as[Long].collect()
    assert(ids.toSeq == Seq(2L * Multimodal.FrameIdShift))
  }

  test("frame near-dedup: few-byte edits stay candidates, distinct content does not") {
    import org.apache.spark.sql.functions.col
    // base: a varied 64-byte frame; near: same with ONE byte changed;
    // far: reversed ordering (same byte multiset, different positions)
    val base = Array.tabulate[Byte](64)(i => ((i * 37 + 11) % 97).toByte)
    val near = base.clone(); near(5) = (near(5) + 1).toByte
    val far = base.reverse
    val media = Seq(
      (1L, "image", "image/png", base),
      (2L, "image", "image/png", near),
      (3L, "image", "image/png", far))
      .toDF("media_id", "kind", "content_type", "payload")
    val frames = Multimodal.frameSample(media, frameBytes = 64, stride = 1)
    val pairs = graft.operators.VectorOps.nearDupCosine(
        Multimodal.frameFeatures(frames), 0.99, dim = 8,
        bands = 4, rowsPerBand = 16)
      .select(col("vec_a"), col("vec_b")).as[(Long, Long)].collect().toSet
    val sh = Multimodal.FrameIdShift
    assert(pairs.contains((1L * sh, 2L * sh)))   // one-byte edit: near-dup
    assert(!pairs.exists { case (a, b) =>        // reversal: not near
      (a == 3L * sh) != (b == 3L * sh) && (a == 1L * sh || b == 1L * sh) })
  }

  test("caption match: the own-frame verdict is EXACT (periodic payload " +
       "scores 1.0, ordinary text is judged too), zero-norm captions " +
       "drop, and a binding hub cap touches only the foreign columns") {
    // doc 1: period-8 byte pattern -> every 64-byte frame's byte-position
    // sums are EXACTLY proportional to the whole payload's -> own cosine
    // 1.0 (and the own half is an exact equi-join, so no banding luck).
    // doc 2: constant bytes -> mean-centered caption vector is zero-norm
    // -> dropped on the caption side (no row at all).
    // doc 3: ordinary text -> a row regardless of verdict (the own half
    // judges every media with a caption vector and >= 1 frame vector).
    val fixture = Seq(
      (1L, "abcdefgh" * 64),
      (2L, "aaaaaaaa" * 64),
      (3L, "the quick brown fox jumps over the lazy dog " * 8))
      .map { case (i, t) => (i, "en", "s", t.length.toLong, t) }
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val got = Multimodal.captionFrameMatch(fixture, threshold = 0.9)
      .select("media_id", "n_own_hits", "own_best_sim", "matched",
              "n_foreign_hits")
      .as[(Long, Long, Double, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 3L),
      s"one exact verdict row per valid media expected: ${got.keySet}")
    val (_, own1, best1, matched1, _) = got(1L)
    assert(matched1 && own1 >= 1L && best1 == 1.0,
      s"periodic payload must match its own frames exactly: ${got(1L)}")
    assert(!got.contains(2L), "zero-norm caption must emit no verdict row")
    got.values.foreach { case (id, own, _, matched, foreignN) =>
      assert(matched == (own > 0), s"verdict disagrees with counts for $id")
      assert(foreignN >= 0L, s"negative foreign count for $id")
    }

    // a BINDING hub-bucket cap (maxDf discipline in band space) affects
    // only the banded FOREIGN columns — the exact own verdict (media set,
    // n_own_hits, matched) is identical, and foreign hits only shrink
    val capped = Multimodal
      .captionFrameMatch(fixture, threshold = 0.9, maxBucket = 1)
      .select("media_id", "n_own_hits", "own_best_sim", "matched",
              "n_foreign_hits")
      .as[(Long, Long, Double, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(capped.keySet == got.keySet)
    got.keySet.foreach { id =>
      assert(capped(id)._2 == got(id)._2 && capped(id)._4 == got(id)._4,
        s"cap leaked into the exact own verdict for $id")
      assert(capped(id)._5 <= got(id)._5,
        s"binding cap grew foreign hits for $id")
    }
  }
}
