package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, TextOps, VectorOps}

/** The synthetic testdata has no nulls, so the oracle gate never exercises
  * them — but a library user's corpus will. Pin the contract: null/empty
  * text and null embeddings flow through every operator without throwing,
  * and rows with nothing to judge drop out instead of poisoning results.
  * (The native expressions are nullSafeEval/nullSafeCodeGen; these tests
  * assert that the OPERATORS composed on top inherit that behavior.)
  */
class NullSafetySpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, null.asInstanceOf[String], "en", "s", 0L),
    (2L, "", "en", "s", 0L),
    (3L, "a b c d e f g h", "en", "s", 15L),
    (4L, "a b c d e f g h", "en", "s", 15L) // dup of 3
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("text analysis tolerates null and empty text") {
    // per-doc projections must not throw; null text yields null stats
    val q = TextOps.qualityScore(docs).collect()
    assert(q.length == 4)
    val rep = TextOps.repetitionSignals(docs).collect()
    // only docs with >= one 2-gram are judged
    assert(rep.map(_.getLong(0)).toSet == Set(3L, 4L))
    val lid = TextOps.langId(docs).collect()
    assert(lid.length == 4)
  }

  test("dedup operators tolerate null and empty text") {
    val exact = TextOps.dedupExact(docs).collect()
    // md5(null) is null: the null-text doc forms its own (null-key) group,
    // it is never merged into a real content group
    assert(exact.length == 3)
    val pairs = TextOps.minhashCandidates(docs)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 4L))) // null/empty docs have no signature
    val scored = TextOps.minhashScoredPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(scored == pairs)
    val clusters = CorpusOps.dedupClusters(docs).collect()
    assert(clusters.length == 4) // every doc labeled, singletons included
  }

  test("contamination tolerates null and empty text on both sides") {
    val bench = Seq((100L, "a b c d e f g h"),
                    (101L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val hits = TextOps.contamination(docs, bench, minShared = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(3L, 4L))
    val frac = TextOps.contaminationFraction(docs, bench).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(frac.keySet == Set(3L, 4L) && frac(3L) == 1000000L)
  }

  test("vector operators tolerate null embeddings") {
    val base = (0L until 6L).map { i =>
      (i, s"l$i", Array.fill(8)(((i * 13 + 7) % 11).toFloat / 11f + 0.1f))
    }.toDF("vec_id", "label", "embedding")
    val withNull = base.unionByName(
      Seq((99L, "ln", null.asInstanceOf[Array[Float]]))
        .toDF("vec_id", "label", "embedding"))
    // null embedding: null bands never equi-join, null sims filter out
    val pairs = VectorOps.nearDupCosine(withNull, 0.99, dim = 8).collect()
    assert(pairs.forall(r => r.getLong(0) != 99L && r.getLong(1) != 99L))
    val topk = VectorOps.topkCosine(
        withNull.filter($"vec_id" < 2), withNull, 3)
      .collect()
    assert(topk.nonEmpty &&
      topk.forall(r => !r.isNullAt(2))) // no null sim survives ranking
  }

  test("r15 operators tolerate null/empty/short inputs and empty slices") {
    // DSIR: null/empty text drops out (no grams); an EMPTY target slice
    // still yields a well-defined model (every bucket's p̂ is the same
    // smoothed 1/(0+B), so weights reduce to -Σ log q̂ terms — finite,
    // no throw, no null)
    val w = CorpusOps.dsirWeights(docs,
      docs.filter($"doc_id" < 0), buckets = 8).collect()
    assert(w.length == 2 && w.forall(r => !r.isNullAt(2)))
    val wNull = CorpusOps.dsirWeights(docs,
      docs.filter($"doc_id" === 3), buckets = 8).collect()
    assert(wNull.length == 2) // null/empty text rows never score

    // semantic banded screen: null embeddings band to null (never join),
    // empty bench side yields an empty (not failing) result
    val emb = Seq(
      (1L, "a", Array.fill(8)(0.5f)),
      (2L, "b", Array.fill(8)(0.5f)),
      (3L, "n", null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "label", "embedding")
    val banded = VectorOps.decontaminateSemanticBanded(
      emb.filter($"vec_id" === 1L || $"vec_id" === 3L),
      emb.filter($"vec_id" === 2L), threshold = 0.4, dim = 8).collect()
    assert(banded.map(_.getLong(0)).toSet == Set(1L)) // null never pairs
    assert(VectorOps.decontaminateSemanticBanded(
      emb, emb.filter($"vec_id" < 0), 0.4, dim = 8).isEmpty)

    // winnowing: docs shorter than w+k-1 tokens have no full window →
    // no fingerprints, no pairs, no throw (docs 1/2 are null/empty)
    val shortDocs = docs.withColumn("text",
      when($"doc_id" === 3L, lit("a b c d")).otherwise($"text"))
    assert(TextOps.winnowedPairs(shortDocs, minShared = 1).isEmpty)
  }

  test("r16 operators tolerate null/empty/short inputs") {
    // winnowed drop list: null/empty docs pair with nobody (own-keeper
    // singletons), while the identical docs 3/4 pair and 4 drops — the
    // verdict still covers all 4 rows, nulls never poison the clustering
    val dl = CorpusOps.winnowedDropList(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(dl.keySet == Set(1L, 2L, 3L, 4L))
    assert(dl(1L) == ((1L, false)) && dl(2L) == ((2L, false)))
    assert(dl(3L) == ((3L, false)) && dl(4L) == ((3L, true)))

    // native fingerprint expression on null text: nullSafeEval → null
    // array, never a throw; explode drops it
    val fps = docs.select($"doc_id",
        TextOps.winnowedFingerprintSet($"text").as("fps"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(fps(1L) && !fps(3L))

    // DSIR selection: null/empty docs never score (no grams), the
    // remaining docs still carry a complete exact prefix verdict
    val sel = CorpusOps.dsirSelect(docs, docs.filter($"doc_id" === 3L),
        budgetTokens = 8L, buckets = 8).collect()
    assert(sel.length == 2 && sel.forall(r => !r.isNullAt(4)))

    // caption match: null text → null payload bytes → no caption vector
    // AND no frames; the all-null corpus yields empty, not a throw
    val nullDocs = docs.withColumn("text",
      when($"doc_id" >= 3L, lit(null.asInstanceOf[String]))
        .otherwise($"text"))
    assert(graft.operators.Multimodal
      .captionFrameMatch(nullDocs, threshold = 0.9).isEmpty)
  }

  test("r17 operators tolerate null/empty/short inputs") {
    import graft.operators.Multimodal
    // caption DROP LIST covers every media even when the match report is
    // empty (all-null corpus): the left join fills — all drop, all dropped
    val nullDocs = docs.withColumn("text", lit(null.asInstanceOf[String]))
    val dl = Multimodal.captionDropList(nullDocs, threshold = 0.9)
      .select("media_id", "action", "dropped")
      .as[(Long, String, Boolean)].collect()
    assert(dl.length == 4 && dl.forall(r => r._2 == "drop" && r._3))

    // savings over the all-null corpus: null text tokenizes to null →
    // the one shared savings aggregation still emits per-kind rows with
    // zero token mass, never a throw or a divide-by-zero poison
    val sv = Multimodal.captionSavings(nullDocs, threshold = 0.9).collect()
    assert(sv.nonEmpty)

    // cross-modal retrieval on a corpus with no valid vectors: empty,
    // not a throw (no caption vector survives the zero-norm filter)
    assert(Multimodal.crossModalTopk(nullDocs, k = 3).isEmpty)

    // split quarantine: null/empty docs carry no shingles → never leak,
    // never move; the audit still covers all 4 docs
    val q = CorpusOps.splitQuarantine(docs).collect()
    assert(q.map(_.getLong(2)).sum == 4L &&
      q.forall(_.getLong(4) >= 0L))
  }

  test("r18: null text contributes 0 tokens to every token sum") {
    // size(null) is -1 under Spark's legacy sizeOfNull default while the
    // DuckDB oracles' sum(len(toks)) skips NULLs — tokenCount clamps at 0
    // so null/empty text contributes 0 on both engines (r17 ADVICE).
    val tc = docs.select(TextOps.tokenCount(col("text"))).as[Long]
      .collect().sorted.toSeq
    assert(tc == Seq(0L, 0L, 8L, 8L))
    // the quarantine audit's token mass: two real 8-token docs, nulls 0
    val q = CorpusOps.splitQuarantine(docs).collect()
    assert(q.map(_.getLong(3)).sum == 16L)
  }
}
