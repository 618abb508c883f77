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

  /** Stage 1 — language + quality gate. A pure per-row predicate: filter
    * INLINE rather than joining langId / qualityScore projections back on
    * doc_id (each such join is a full corpus self-shuffle at 100×; r12
    * verdict item 3). One scan of `docs` feeds the dedup window directly,
    * and the predicate is the native single-pass CleanGate (one
    * tokenization per row; the equivalent declarative chain re-tokenizes
    * per marker set — see CleanGate's scaladoc; TextOpsSpec pins gate ≡
    * declarative).
    */
  private[operators] def gateStage(docs: DataFrame,
                                   minQuality: Double): DataFrame =
    docs.filter(TextOps.cleanGate(minQuality))

  /** Stage 2 — exact dedup: keep the lowest doc_id per content hash. */
  private[operators] def exactStage(candidates: DataFrame): DataFrame =
    candidates
      .withColumn("content_hash", md5(col("text")))
      .withColumn("keeper", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("content_hash")))
      .filter(col("doc_id") === col("keeper"))
      .drop("content_hash", "keeper")

  /** Stage 3 — near-dup removal among survivors: drop doc_b of every
    * banded-minhash candidate pair.
    */
  private[operators] def minhashStage(keepers: DataFrame): DataFrame = {
    val nearDups = TextOps.minhashCandidates(keepers)
      .select(col("doc_b").as("doc_id")).distinct()
    keepers.join(nearDups, Seq("doc_id"), "left_anti")
  }

  /** Documents that survive cleaning: predicted-English, quality above
    * threshold, exact-duplicate collapsed (min doc_id wins), near-dup
    * candidate pairs resolved by dropping the larger doc_id. Composed
    * from the named stage functions so the per-stage attrition report
    * ([[releaseReport]]) counts EXACTLY the frames this pipeline runs —
    * one definition per stage, two consumers.
    */
  def cleanCorpus(docs: DataFrame, minQuality: Double): DataFrame =
    minhashStage(exactStage(gateStage(docs, minQuality)))

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
    kept.join(semanticDropIds(kept, embeddings, threshold),
      Seq("doc_id"), "left_anti")
  }

  /** The SemDeDup verdict's dropped ids over an already-cleaned survivor
    * set — banded-cosine clusters restricted to `kept`, keeper = longest
    * doc (ties lowest id). One definition shared by
    * [[cleanCorpusSemantic]] and [[prepareRelease]] so the semantic stage
    * cannot drift between the two pipelines.
    */
  private def semanticDropIds(kept: DataFrame, embeddings: DataFrame,
                              threshold: Double): DataFrame = {
    val keptEmb = embeddings
      .join(kept.select(col("doc_id").as("vec_id")), Seq("vec_id"))
    val pairs = VectorOps
      .nearDupCosine(keptEmb, threshold, dim = VectorOps.dimOf(embeddings))
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val assign = CorpusOps.connectedComponents(
      keptEmb.select(col("vec_id").as("doc_id")), pairs)
    CorpusOps.keepBestPerCluster(assign, kept)
      .filter(col("dropped")).select("doc_id")
  }

  /** Per-source report of the semantic-stage pipeline. */
  def cleanCorpusSemanticStats(docs: DataFrame, embeddings: DataFrame,
                               minQuality: Double,
                               threshold: Double = 0.4): DataFrame =
    perSourceStats(cleanCorpusSemantic(docs, embeddings, minQuality,
      threshold))

  /** The release capstone — the full training-data release pipeline as
    * ONE lazy composed plan, the artifact the whole [EXT] surface exists
    * for: language/quality gate → exact dedup → MinHash drop list →
    * winnowed (MOSS) drop list → SemDeDup semantic drop list →
    * exact 13-token benchmark decontamination → train/valid/test split +
    * leakage quarantine → deterministic shard assignment → the release
    * MANIFEST (per (split, shard): docs, tokens, corpus share in exact
    * integer ppm) — what a data lead signs off before tarballs ship.
    *
    * Every stage IS the already-verified standalone operator (cleanCorpus,
    * [[CorpusOps.winnowedDropList]], [[semanticDropIds]],
    * [[graft.operators.TextOps.exactSubstringContamination]],
    * [[CorpusOps.quarantinedSplit]], the shardAssign hash) — the pipeline
    * declares their composition and shares their code, so it cannot
    * disagree with the audits a pipeline runs alongside it.
    *
    * Stage ordering is the 100 TB cost argument: text-only stages run
    * cheapest-first, and the EMBEDDING pass (the expensive stage) touches
    * only what survived every text filter — visible in the physical plan
    * as the embeddings scan joining the filtered survivor set
    * (EXPLAINS.md). Survivor sets are barriered between stages because
    * each feeds 2+ consumers (the verdict join and the next stage's
    * anti-join); everything else is one lazy plan. The final manifest is
    * |splits|×|shards| rows — the share window runs over ~24 rows, never
    * the corpus.
    */
  def prepareRelease(docs: DataFrame, embeddings: DataFrame,
                     benchmark: DataFrame, minQuality: Double,
                     semThreshold: Double = 0.4,
                     nShards: Int = 8): DataFrame = {
    // Token counts ride the chain (r20, guide §1.2 "don't compute
    // twice"): the manifest needs per-doc token counts at the END of the
    // chain; computing them here means ONE tokenization pass (folded
    // into the gate materialization) instead of re-tokenizing the
    // surviving corpus at the manifest — each stage barrier carries one
    // extra long per row. Values are identical by determinism of
    // tokenCount over the same text.
    val docsT = docs.withColumn("__n_toks", TextOps.tokenCount(col("text")))
    // text stages, cheap → expensive: gate + exact + MinHash (cleanCorpus),
    // then the MOSS verdict over those survivors only
    val kept1 = Barriers.materialize(cleanCorpus(docsT, minQuality))
    val wdrop = CorpusOps.winnowedDropList(kept1)
      .filter(col("dropped")).select("doc_id")
    val kept2 = Barriers.materialize(kept1.join(wdrop, Seq("doc_id"), "left_anti"))
    // the embedding pass — only over docs that survived every text stage
    val kept3 = Barriers.materialize(
      kept2.join(semanticDropIds(kept2, embeddings, semThreshold),
        Seq("doc_id"), "left_anti"))
    // verbatim 13-token benchmark screen: any match disqualifies the doc
    val dirty = TextOps
      .exactSubstringContamination(kept3, benchmark).select("doc_id")
    val kept4 = Barriers.materialize(kept3.join(dirty, Seq("doc_id"), "left_anti"))
    // split + quarantine (doc-level), shard, manifest
    CorpusOps.quarantinedSplit(kept4)
      .withColumn("shard",
        CorpusOps.hashUniform("shard", col("doc_id")) % nShards)
      .withColumn("n_toks", col("__n_toks"))
      .groupBy(col("final_split").as("split"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("share_ppm",
        expr("case when sum(n_tokens) over () = 0 then cast(0 as bigint) " +
             "else n_tokens * 1000000 div sum(n_tokens) over () end"))
  }

  /** Per-stage attrition manifest for the release capstone — the sign-off
    * a data lead actually reads (r18 verdict item 4): documents and
    * tokens SURVIVING after each stage of [[prepareRelease]]'s chain
    * (gate → exact → MinHash → winnowed → SemDeDup → decontaminate →
    * quarantine), as integer ppm of the INPUT corpus. Every stage frame
    * is the capstone's own stage function (gateStage / exactStage /
    * minhashStage / winnowedDropList / semanticDropIds /
    * exactSubstringContamination / quarantinedSplit), so the report and
    * the shipped release cannot disagree on what any stage kept.
    *
    * The `quarantine` row counts docs whose hash split assignment
    * SURVIVED the leakage audit unmoved — its delta against the
    * `decontaminate` row is exactly the quarantined (split-reassigned)
    * docs. Nothing is deleted at that stage; the moved docs ship in
    * their heldout split, and the per-(split, shard) manifest is
    * [[prepareRelease]]'s own output.
    *
    * Scale shape: each stage is barriered because it feeds two consumers
    * (its count row and the next stage) — without the barriers the gate
    * regexps would re-run once per downstream stage. Each count row is
    * one partial-agg'd single-row aggregate over a materialized frame;
    * the ppm window runs over 8 rows.
    */
  def releaseReport(docs: DataFrame, embeddings: DataFrame,
                    benchmark: DataFrame, minQuality: Double,
                    semThreshold: Double = 0.4): DataFrame = {
    // One tokenization pass for all seven surviving-stage count rows
    // (r20, guide §1.2): each stage's (n_docs, n_tokens) row used to
    // re-run tokenCount over its materialized frame — seven extra
    // full-text passes per report. The count now rides the chain as a
    // column computed once at the gate materialization; only the
    // stage-0 row (the raw input, which never enters the chain) still
    // tokenizes itself.
    val docsT = docs.withColumn("__n_toks", TextOps.tokenCount(col("text")))
    val gate = Barriers.materialize(gateStage(docsT, minQuality))
    val exact = Barriers.materialize(exactStage(gate))
    val kept1 = Barriers.materialize(minhashStage(exact))
    val wdrop = CorpusOps.winnowedDropList(kept1)
      .filter(col("dropped")).select("doc_id")
    val kept2 = Barriers.materialize(
      kept1.join(wdrop, Seq("doc_id"), "left_anti"))
    val kept3 = Barriers.materialize(
      kept2.join(semanticDropIds(kept2, embeddings, semThreshold),
        Seq("doc_id"), "left_anti"))
    val dirty = TextOps
      .exactSubstringContamination(kept3, benchmark).select("doc_id")
    val kept4 = Barriers.materialize(
      kept3.join(dirty, Seq("doc_id"), "left_anti"))
    val unmoved = CorpusOps.quarantinedSplit(kept4).filter(!col("moved"))
    val stages: Seq[(Int, String, DataFrame)] = Seq(
      (0, "input", docs), (1, "gate", gate), (2, "exact", exact),
      (3, "minhash", kept1), (4, "winnowed", kept2), (5, "semdedup", kept3),
      (6, "decontaminate", kept4), (7, "quarantine", unmoved))
    stages.map { case (i, nm, df) =>
      val toks =
        if (df.columns.contains("__n_toks")) col("__n_toks")
        else TextOps.tokenCount(col("text"))
      df.agg(count(lit(1)).as("n_docs"),
             // null-sum (empty stage) clamps to 0 — same rule as tokenCount
             coalesce(sum(toks), lit(0L)).as("n_tokens"))
        .select(lit(i.toLong).as("stage_idx"), lit(nm).as("stage"),
                col("n_docs"), col("n_tokens"))
    }.reduce(_.union(_))
      // partition by pmod(stage_idx, 1) = one constant key (the
      // zipfFitFromVocab idiom): the frame is 8 rows, the non-foldable
      // constant only silences WindowExec's no-partition WARN, which
      // would otherwise read as a false scale signal in every bench log
      .withColumn("in_docs",
        expr("max(case when stage_idx = 0 then n_docs end) " +
             "over (partition by pmod(stage_idx, 1))"))
      .withColumn("in_tokens",
        expr("max(case when stage_idx = 0 then n_tokens end) " +
             "over (partition by pmod(stage_idx, 1))"))
      .withColumn("docs_ppm",
        expr("case when in_docs = 0 then cast(0 as bigint) " +
             "else n_docs * 1000000 div in_docs end"))
      .withColumn("tokens_ppm",
        expr("case when in_tokens = 0 then cast(0 as bigint) " +
             "else n_tokens * 1000000 div in_tokens end"))
      .drop("in_docs", "in_tokens")
  }

  private def perSourceStats(kept: DataFrame): DataFrame =
    kept
      .withColumn("token_cnt", TextOps.tokenCount(col("text")))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("kept_chars"),
        sum(col("token_cnt")).as("kept_tokens"))
}
