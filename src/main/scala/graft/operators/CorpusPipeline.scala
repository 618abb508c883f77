package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data cleaning pipeline — the composed shape a
  * 100 TB corpus actually runs ([EXT]): language filter → quality filter →
  * exact dedup → near-dup (MinHash) removal → per-source stats.
  *
  * Every stage is one of the already-verified operators; the pipeline is a
  * single lazy plan, so Catalyst pushes the language/quality filters below
  * the dedup shuffles and prunes text columns where only ids flow.
  */
object CorpusPipeline {

  /** Documents that survive cleaning: predicted-English, quality above
    * threshold, exact-duplicate collapsed (min doc_id wins), near-dup
    * candidate pairs resolved by dropping the larger doc_id.
    */
  def cleanCorpus(docs: DataFrame, minQuality: Double): DataFrame = {
    // Language and quality are pure per-row predicates — filter INLINE
    // rather than joining langId / qualityScore projections back on doc_id
    // (each such join is a full corpus self-shuffle at 100×; r12 verdict
    // item 3). One scan of `docs` feeds the dedup window directly, and the
    // predicate is the native single-pass CleanGate (one tokenization per
    // row; the equivalent declarative chain re-tokenizes per marker set —
    // see CleanGate's scaladoc; TextOpsSpec pins gate ≡ declarative).
    val candidates = docs.filter(TextOps.cleanGate(minQuality))

    // exact dedup: keep the lowest doc_id per content hash
    val keepers = candidates
      .withColumn("content_hash", md5(col("text")))
      .withColumn("keeper", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("content_hash")))
      .filter(col("doc_id") === col("keeper"))
      .drop("content_hash", "keeper")

    // near-dup removal among survivors: drop doc_b of every candidate pair
    val nearDups = TextOps.minhashCandidates(keepers)
      .select(col("doc_b").as("doc_id")).distinct()
    keepers.join(nearDups, Seq("doc_id"), "left_anti")
  }

  /** Per-source outcome of the cleaning run — the report a pipeline job
    * emits (kept counts, kept volume, token totals).
    */
  def cleanCorpusStats(docs: DataFrame, minQuality: Double): DataFrame =
    perSourceStats(cleanCorpus(docs, minQuality))

  /** [[cleanCorpus]] plus a SemDeDup stage: the shingle-clean survivors'
    * EMBEDDINGS cluster under banded cosine, and each cluster keeps its
    * quality keeper (longest doc, ties lowest id) — the paraphrase layer
    * shingle dedup can't see, run LAST so the expensive embedding pass
    * touches only what survived the cheap filters (the stage ordering a
    * 100 TB pipeline wants). Docs without an embedding row pass through:
    * no semantic evidence, no drop.
    */
  def cleanCorpusSemantic(docs: DataFrame, embeddings: DataFrame,
                          minQuality: Double,
                          threshold: Double = 0.4): DataFrame = {
    // the cleaning chain feeds three consumers (embedding restriction,
    // keeper sizes, final anti-join) — barrier it so the lang/quality/
    // dedup stages run once, not three times
    val kept = Barriers.materialize(cleanCorpus(docs, minQuality))
    val keptEmb = embeddings
      .join(kept.select(col("doc_id").as("vec_id")), Seq("vec_id"))
    val pairs = VectorOps
      .nearDupCosine(keptEmb, threshold, dim = VectorOps.dimOf(embeddings))
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val assign = CorpusOps.connectedComponents(
      keptEmb.select(col("vec_id").as("doc_id")), pairs)
    val droppedIds = CorpusOps.keepBestPerCluster(assign, kept)
      .filter(col("dropped")).select("doc_id")
    kept.join(droppedIds, Seq("doc_id"), "left_anti")
  }

  /** Per-source report of the semantic-stage pipeline. */
  def cleanCorpusSemanticStats(docs: DataFrame, embeddings: DataFrame,
                               minQuality: Double,
                               threshold: Double = 0.4): DataFrame =
    perSourceStats(cleanCorpusSemantic(docs, embeddings, minQuality,
      threshold))

  private def perSourceStats(kept: DataFrame): DataFrame =
    kept
      .withColumn("token_cnt", size(TextOps.tokens(col("text"))).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("kept_chars"),
        sum(col("token_cnt")).as("kept_tokens"))
}
