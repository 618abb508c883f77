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

  test("caption drop list: keep/review/drop partitions EVERY media (media " +
       "absent from the match report fall to drop), dropped = NOT matched") {
    // the caption-match fixture: doc 1 matches its own frames exactly,
    // doc 2 has a zero-norm caption (no match row at all), doc 3 is
    // judged but (at tau=0.9) unmatched
    val fixture = Seq(
      (1L, "abcdefgh" * 64),
      (2L, "aaaaaaaa" * 64),
      (3L, "the quick brown fox jumps over the lazy dog " * 8))
      .map { case (i, t) => (i, "en", "s", t.length.toLong, t) }
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val rep = Multimodal.captionFrameMatch(fixture, threshold = 0.9)
      .select("media_id", "matched", "n_foreign_hits")
      .as[(Long, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    val dl = Multimodal.captionDropList(fixture, threshold = 0.9)
      .select("media_id", "kind", "matched", "n_foreign_hits", "action",
              "dropped")
      .as[(Long, String, Boolean, Long, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(dl.keySet == Set(1L, 2L, 3L), s"gate must verdict every media")
    dl.values.foreach { case (id, kind, matched, nf, action, dropped) =>
      assert(dropped == !matched, s"dropped != !matched for $id")
      val want =
        if (matched) "keep" else if (nf > 0) "review" else "drop"
      assert(action == want, s"action rule drift for $id: $action")
      val wantKind = Seq("image", "audio", "video")((id % 3).toInt)
      assert(kind == wantKind, s"kind rule drift for $id")
      // verdict columns agree with the match report; absent media
      // (zero-norm caption) fill as unmatched/no-signal
      rep.get(id) match {
        case Some((_, m, f)) => assert(matched == m && nf == f, s"$id")
        case None => assert(!matched && nf == 0L && action == "drop", s"$id")
      }
    }
    assert(dl(1L)._5 == "keep" && dl(2L)._5 == "drop")
  }

  test("caption savings: the shared report shape over the drop-list " +
       "verdict, grouped by kind, exact integer arithmetic") {
    val fixture = Seq(
      (1L, "abcdefgh" * 64),
      (2L, "aaaaaaaa" * 64),
      (3L, "the quick brown fox jumps over the lazy dog " * 8),
      (4L, "abcdefgh" * 64))
      .map { case (i, t) => (i, "en", "s", t.length.toLong, t) }
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val verdict = Multimodal.captionDropList(fixture, threshold = 0.9)
      .select("media_id", "kind", "dropped")
      .as[(Long, String, Boolean)].collect()
    def nToks(t: String) = t.split("\\s+").count(_.nonEmpty).toLong
    val toks = Map(1L -> nToks("abcdefgh" * 64),
      2L -> nToks("aaaaaaaa" * 64),
      3L -> nToks("the quick brown fox jumps over the lazy dog " * 8),
      4L -> nToks("abcdefgh" * 64))
    val got = Multimodal.captionSavings(fixture, threshold = 0.9)
      .select("kind", "n_docs", "n_dropped", "tokens_total",
              "tokens_dropped", "savings_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    verdict.groupBy(_._2).foreach { case (kind, rows) =>
      val dropped = rows.filter(_._3)
      val tTot = rows.map(r => toks(r._1)).sum
      val tDrop = dropped.map(r => toks(r._1)).sum
      val want = (kind, rows.length.toLong, dropped.length.toLong,
        tTot, tDrop, tDrop * 1000000L / tTot)
      assert(got(kind) == want, s"savings drift for $kind: ${got(kind)}")
    }
    assert(got.keySet == verdict.map(_._2).toSet)
  }

  test("caption review queue: membership is the drop list's review set " +
       "verbatim, best_sim is the match report's best_foreign_sim, and " +
       "the foreign frame is never the media's own") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = Multimodal.captionReviewQueue(docs, threshold = 0.9)
      .select("media_id", "foreign_media", "best_sim")
      .as[(Long, Long, Double)].collect()
    val review = Multimodal.captionDropList(docs, threshold = 0.9)
      .filter($"action" === "review").select("media_id")
      .as[Long].collect().toSet
    assert(q.map(_._1).toSet == review && q.nonEmpty,
      s"queue membership drift: ${q.length} vs ${review.size}")
    assert(q.forall(r => r._2 != r._1), "own frame leaked into the queue")
    val rep = Multimodal.captionFrameMatch(docs, threshold = 0.9)
      .select("media_id", "best_foreign_sim")
      .as[(Long, Option[Double])].collect().toMap
    q.foreach { case (m, _, s) =>
      assert(rep(m).contains(s), s"best_sim drift for media $m")
    }
  }

  test("cross-modal top-k: exhaustive-probe IVF equals the brute-force " +
       "cross scan; default params keep ranks dense and sims ordered") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, round, row_number}
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = 3
    // exhaustive probes + stride-1 centroids = every list searched: the
    // approximate rung must then equal the exact cross scan
    val got = Multimodal.crossModalTopk(docs, k = k,
        nProbe = Int.MaxValue, centroidEvery = 1, maxQueries = 5,
        maxLists = Int.MaxValue)
      .select("caption_id", "media_id", "frame_idx", "sim", "rank")
      .collect().map(_.toSeq).toSet
    val frames = Multimodal.frameFeatures(
      Multimodal.frameSample(Multimodal.mediaFromDocuments(docs), 64, 2))
    val caps = Multimodal.captionVectors(docs)
      .select(col("media_id").as("vec_id"), col("cv").as("embedding"))
    val qs = graft.operators.VectorOps.md5SampleQueries(caps, 5)
      .select(col("vec_id").as("caption_id"), col("embedding").as("qv"))
    val w = Window.partitionBy("caption_id")
      .orderBy(col("sim").desc, col("vec_id"))
    val sh = Multimodal.FrameIdShift
    val brute = qs.crossJoin(
        frames.select(col("vec_id"), col("embedding").as("fv")))
      .withColumn("sim", round(
        dot_product(col("qv"), col("fv")) /
          (l2_norm(col("qv")) * l2_norm(col("fv"))), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("caption_id"),
        org.apache.spark.sql.functions.expr(s"vec_id div ${sh}L")
          .as("media_id"),
        org.apache.spark.sql.functions.pmod(col("vec_id"),
          org.apache.spark.sql.functions.lit(sh)).as("frame_idx"),
        col("sim"), col("rank"))
      .collect().map(_.toSeq).toSet
    assert(got == brute && got.nonEmpty,
      s"exhaustive IVF drifted from brute force (${got.size} vs ${brute.size})")

    // default (approximate) params: dense ranks 1..n per caption, sims
    // non-increasing in rank, never more than k rows per caption
    val dflt = Multimodal.crossModalTopk(docs, k = 5, maxQueries = 10)
      .select("caption_id", "sim", "rank")
      .as[(Long, Double, Long)].collect()
      .groupBy(_._1)
    assert(dflt.nonEmpty)
    dflt.foreach { case (cid, rows) =>
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1L to rows.length).toSeq,
        s"ranks not dense for caption $cid")
      assert(rows.length <= 5, s"k bound broken for caption $cid")
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._2 >= b._2
        case _ => true
      }, s"sims not ordered for caption $cid")
    }
  }
}
