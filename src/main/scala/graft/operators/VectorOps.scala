package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an `ARRAY<FLOAT>` embedding column ([EXT],
  * SURVEY.md §2.9): brute-force cosine top-k as the correctness baseline,
  * and a random-hyperplane LSH bucketed variant as the 100 TB scale path.
  *
  * All arithmetic is done in DOUBLE with left-to-right accumulation via the
  * `aggregate` higher-order function — codegen-friendly, UDF-free, and
  * reproducible by the DuckDB oracle.
  */
object VectorOps {

  /** Elementwise dot product of two double arrays (higher-order form —
    * interpreted eval; prefer [[dotStatic]] in hot paths when the
    * dimensionality is known).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Statically-unrolled dot product: a `dim`-term expression of
    * `element_at` products that stays inside whole-stage codegen — ~10×
    * the throughput of the interpreted higher-order fold, with identical
    * left-to-right double accumulation (adding the 0.0 seed is exact, so
    * results are bitwise equal).
    */
  def dotStatic(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i) * element_at(b, i)).reduce(_ + _)

  def l2normStatic(a: Column, dim: Int): Column = sqrt(dotStatic(a, a, dim))

  def cosineStatic(a: Column, b: Column, dim: Int): Column =
    dotStatic(a, b, dim) / (l2normStatic(a, dim) * l2normStatic(b, dim))

  /** Embedding dimensionality probe (one-row scan). */
  def dimOf(df: DataFrame): Int =
    df.select(size(col("embedding"))).head().getInt(0)

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Brute-force cosine top-k: every query vector against the full corpus.
    *
    * Scale shape: `queries` is small (broadcast); the corpus side streams —
    * one pass, no shuffle of the corpus, top-k via per-query window. At
    * 1000 executors this is a map-side broadcast-nested-loop + partial
    * top-k; the LSH variant below removes the O(|q|·n) factor entirely.
    */
  def topkCosine(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    // norms precomputed per side: O(n·dim) once instead of per pair
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("qn", l2_norm(col("qv")))
    val c = corpus.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .withColumn("cn", l2_norm(col("cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(
        dot_product(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Embedding-space near-duplicate pairs: candidate pairs come from a
    * banded random-hyperplane LSH (OR over `bands` bands of `rowsPerBand`
    * sign bits each — the cosine analog of MinHash banding), then the exact
    * cosine is computed only within candidates and thresholded.
    *
    * Scale shape: the corpus is NEVER self-cross-joined. Band keys explode
    * to `bands` short rows per vector (ids only, vectors stay put); the
    * candidate join is an equi-join on the band key; the surviving distinct
    * pairs join the embeddings back by id. Every shuffle is keyed — at
    * 10 B vectors the candidate volume is governed by band-collision
    * probability, not n².
    *
    * Approximate by construction — recall rises with similarity. With the
    * default 4 bands × 4 sign bits, a pair at sim s survives with
    * `1-(1-p^4)^4` where `p = 1-arccos(s)/π`: ~87% at s=0.8 but only ~50%
    * right at the 0.4 threshold boundary (p≈0.63). Raising `bands` (or
    * lowering `rowsPerBand`) buys recall at the cost of candidate volume —
    * with random sign bits a band of r bits collides on ~2^-r of unrelated
    * pairs, so shorter bands inflate the candidate join super-linearly.
    * The DuckDB oracle reproduces the same planes/buckets bit-for-bit from
    * the shared [[planeComponent]] constants, so the green hash-match
    * verifies implementation parity (same candidates, same sims), NOT
    * exact-pair recall against an all-pairs ground truth.
    */
  def nearDupCosine(corpus: DataFrame, threshold: Double, dim: Int,
                    bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    val banded = corpus.select(
      col("vec_id"),
      explode(array(bandKeyCols(col("embedding"), dim,
                                bands, rowsPerBand): _*)).as("band"))
      // both join sides read this — keep the plane projections single-pass
      .transform(Barriers.materialize(_))
    val cand = banded.select(col("band"), col("vec_id").as("vec_a"))
      .join(banded.select(col("band"), col("vec_id").as("vec_b")), Seq("band"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .distinct()
    val va = corpus.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
      .withColumn("na", l2_norm(col("va")))
    val vb = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
      .withColumn("nb", l2_norm(col("vb")))
    cand.join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
      .withColumn("sim", round(
        dot_product(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b", "sim")
  }

  /** Semantic decontamination — the embedding-space twin of the shingle
    * decontamination family (TextOps.contamination): screen every TRAINING
    * vector against a held-out BENCHMARK set by exact cosine and report,
    * per training vector, its best benchmark similarity, the number of
    * benchmark vectors at/above `threshold`, and the drop verdict. This is
    * the eval-leakage check paraphrase-level rewrites slip past shingle
    * overlap (the same blind spot SemDeDup exploits for dedup).
    *
    * Scale shape: a benchmark set is BOUNDED (eval suites are thousands of
    * rows, not corpus-scale), so the right 100 TB form is EXACT — broadcast
    * the bench side and stream the corpus once (Θ(n·|bench|) map-side work,
    * zero corpus shuffle, no recall caveat). The groupBy keys on vec_id,
    * which the broadcast join preserves, so the aggregation is partial
    * (map-side combine collapses each vector's |bench| rows before any
    * exchange). A corpus-scale "benchmark" is a different problem — that
    * escalation is declared as [[decontaminateSemanticBanded]] below
    * (banded-LSH candidates, exact re-verify — nearDupCosine's machinery
    * pointed across the train/bench boundary).
    */
  def decontaminateSemantic(train: DataFrame, bench: DataFrame,
                            threshold: Double): DataFrame = {
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    val t = train.select(col("vec_id"), col("embedding"))
      .withColumn("nt", l2_norm(col("embedding")))
    val b = bench.select(col("vec_id").as("bench_id"),
                         col("embedding").as("bv"))
      .withColumn("nb", l2_norm(col("bv")))
    t.crossJoin(broadcast(b))
      // round(…, 6) BEFORE max/compare: both engines then aggregate the
      // same exact doubles, so the max and the threshold verdict cannot
      // drift on accumulation order (the nearDupCosine parity discipline)
      .withColumn("sim", round(
        dot_product(col("embedding"), col("bv")) / (col("nt") * col("nb")), 6))
      .groupBy("vec_id")
      .agg(max(col("sim")).as("max_bench_sim"),
           sum(when(col("sim") >= threshold, 1L).otherwise(0L))
             .as("n_bench_hits"))
      .withColumn("contaminated", col("n_bench_hits") > 0)
  }

  /** Corpus-scale escalation of [[decontaminateSemantic]]: when the
    * "benchmark" side is itself corpus-sized (screening one training
    * corpus against another, a crawl against a licensed set), the bench
    * no longer broadcasts and the exact Θ(n·|bench|) pass stops being a
    * plan — the same escalation `decontaminate` makes to
    * `decontaminate_bloom`. Both sides band under the shared
    * random-hyperplane layout ([[bandKeyCols]]); candidates are the
    * band-key EQUI-join across the train/bench boundary (never a cross
    * join — at 10 B × 10 B vectors the candidate volume is governed by
    * band-collision probability, not n·m); exact cosine re-verifies only
    * the candidates. Output mirrors the streaming twin's contaminated-only
    * shape: one row per training vector with ≥1 candidate at/above
    * `threshold`.
    *
    * Approximate by construction, exactly like [[nearDupCosine]]: a pair
    * at sim s survives banding with `1-(1-p^r)^b`, `p = 1-arccos(s)/π`,
    * so recall rises with similarity and with `bands`. The default
    * 8 bands × 4 sign bits reads ~75% at the τ=0.4 boundary and ~98% at
    * s=0.8 — verbatim and close-paraphrase leaks (the ones that matter)
    * are caught; the DuckDB oracle reproduces the same planes/buckets
    * bit-for-bit, so the green hash verifies implementation parity, not
    * recall against the exact screen.
    */
  def decontaminateSemanticBanded(train: DataFrame, bench: DataFrame,
                                  threshold: Double, dim: Int,
                                  bands: Int = 8,
                                  rowsPerBand: Int = 4): DataFrame = {
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    val tb = train.select(
      col("vec_id"),
      explode(array(bandKeyCols(col("embedding"), dim,
                                bands, rowsPerBand): _*)).as("band"))
    val bb = bench.select(
      col("vec_id").as("bench_id"),
      explode(array(bandKeyCols(col("embedding"), dim,
                                bands, rowsPerBand): _*)).as("band"))
    val cand = tb.join(bb, Seq("band"))
      .select("vec_id", "bench_id")
      .distinct()
    val t = train.select(col("vec_id"), col("embedding").as("tv"))
      .withColumn("nt", l2_norm(col("tv")))
    val b = bench.select(col("vec_id").as("bench_id"),
                         col("embedding").as("bv"))
      .withColumn("nb", l2_norm(col("bv")))
    cand.join(t, Seq("vec_id")).join(b, Seq("bench_id"))
      // round(…, 6) before max/compare — the decontaminateSemantic parity
      // discipline: both engines aggregate identical doubles
      .withColumn("sim", round(
        dot_product(col("tv"), col("bv")) / (col("nt") * col("nb")), 6))
      // threshold BEFORE the groupBy: state/aggregate volume is one row
      // per LEAKED vector; for any emitted row max-over-hits equals
      // max-over-candidates (any candidate sim above a hit is itself ≥ τ)
      .filter(col("sim") >= threshold)
      .groupBy("vec_id")
      .agg(max(col("sim")).as("max_bench_sim"),
           count(lit(1)).as("n_bench_hits"))
  }

  /** Band key j = `"<j>:<sign-bit bucket over planes [j·r, (j+1)·r)>"` —
    * THE parity-critical band layout, shared by [[nearDupCosine]],
    * [[topkCosineLshBanded]], [[decontaminateSemanticBanded]] and
    * restated SQL-side by the DuckDB oracle
    * generators (OracleExt.bandExprsSql): change it in one place or parity
    * breaks.
    */
  private[graft] def bandKeyCols(vec: Column, dim: Int,
                                 bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map { j =>
      val bucket = bucketFromPlanes(
        vec, dim, (0 until rowsPerBand).map(_ + j * rowsPerBand))
      concat(lit(s"$j:"), bucket.cast("string"))
    }

  /** Deterministic pseudo-random hyperplane component for (plane, dim
    * index): md5-derived value in [-1, 1). Computed on the driver once —
    * the planes become literal coefficients in a codegen'd projection, so
    * executors never rehash per row.
    */
  private[graft] def planeComponent(plane: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane$plane:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(6), 16).toDouble / 8388608.0 - 1.0
  }

  /** Sign-bit bucket id from an explicit plane index set: bit i of the
    * bucket is the sign of the projection onto plane `planes(i)`. The plane
    * coefficients fold to literals, so the projection is one codegen'd
    * [[graft.functions.DotProduct]] per plane.
    */
  private[graft] def bucketFromPlanes(
      vec: Column, dim: Int, planes: Seq[Int]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array((0 until dim).map(d => lit(planeComponent(p, d))): _*)
      val proj = graft.functions.ArrayMath.dot_product(vec, plane)
      when(proj > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Sign-bit LSH bucket id from `nPlanes` random hyperplanes. Vectors in
    * the same bucket are ANN candidates; cosine-close vectors collide with
    * high probability.
    */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column =
    bucketFromPlanes(vec, dim, 0 until nPlanes)

  /** ANN top-k via LSH buckets: candidates share a bucket, exact cosine
    * re-rank within. Trades recall for a shuffle-on-bucket equi-join —
    * the formulation that survives a corpus that no longer fits a
    * broadcast.
    */
  def topkCosineLsh(corpus: DataFrame, dim: Int, k: Int,
                    nPlanes: Int = 8): DataFrame = {
    import graft.functions.ArrayMath.dot_product
    val withBucket = corpus.select(
      col("vec_id"), col("embedding").as("v"),
      lshBucket(col("embedding"), dim, nPlanes).as("bucket"))
      // both join sides read this — keep the plane projections single-pass
      .transform(Barriers.materialize(_))
    val a = withBucket.select(col("bucket"), col("vec_id").as("query_id"),
                              col("v").as("qv"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("neighbor_id"),
                              col("v").as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(
        dot_product(col("qv"), col("cv")) /
          (sqrt(dot_product(col("qv"), col("qv"))) *
           sqrt(dot_product(col("cv"), col("cv")))), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** ANN top-k via OR-banded LSH: `bands` independent bucket tables of
    * `rowsPerBand` sign bits each — the multi-table construction the
    * measured recall table (SCALE.md) prescribes when single-bucket
    * recall is not enough. A candidate pair only needs to collide in ONE
    * band, so each band adds its p^r recall mass:
    * recall ≈ 1-(1-p^r)^b vs p^(r·b) for one (r·b)-bit table — ~0.50 vs
    * ~0.02 at the synthetic corpus's neighbor sims (measured in
    * `graft.tools.Recall`), for bands× the candidate volume.
    *
    * Scale shape: same as [[topkCosineLsh]] — band keys explode to
    * `bands` short rows per vector (ids only), candidates are a band
    * equi-join deduped on (query, neighbor) BEFORE the exact-cosine
    * re-rank joins the vectors back by id; never n².
    */
  def topkCosineLshBanded(corpus: DataFrame, dim: Int, k: Int,
                          bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    val banded = corpus.select(
      col("vec_id"),
      explode(array(bandKeyCols(col("embedding"), dim,
                                bands, rowsPerBand): _*)).as("band"))
      // both join sides read this — keep the plane projections single-pass
      .transform(Barriers.materialize(_))
    val cand = banded.select(col("band"), col("vec_id").as("query_id"))
      .join(banded.select(col("band"), col("vec_id").as("neighbor_id")),
            Seq("band"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    // norms once per vector, not once per candidate pair (same doubles:
    // l2_norm = sqrt(self-dot), so the rounded sim is bit-identical)
    val q = corpus.select(col("vec_id").as("query_id"),
                          col("embedding").as("qv"))
      .withColumn("qn", l2_norm(col("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
                          col("embedding").as("cv"))
      .withColumn("cn", l2_norm(col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.join(q, Seq("query_id")).join(c, Seq("neighbor_id"))
      .withColumn("sim", round(
        dot_product(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Brute-force top-k via the bounded [[graft.functions.TopKAgg]]
    * aggregator instead of a window: map-side partial top-k means each
    * task ships at most k rows per query to the shuffle — the window
    * variant ships (and sorts) every candidate. Results are identical
    * (same sim/tie ordering); shares the window variant's oracle.
    */
  def topkCosineAgg(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    import graft.functions.TopKAgg
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("qn", l2_norm(col("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .withColumn("cn", l2_norm(col("cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"),
        col("neighbor_id").as("id"),
        round(dot_product(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("sim"))
    val spark = scored.sparkSession
    import spark.implicits._
    scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(TopKAgg.topK(k).toColumn.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), explode(col("topk")).as("r"))
      .select(col("query_id"), col("r.id").as("neighbor_id"),
              col("r.sim").as("sim"), col("r.rank").as("rank"))
  }

  /** IVF (inverted-file) ANN: deterministic centroid subset, one
    * broadcast-assignment pass, then search only the `nProbe` closest
    * centroid lists per query.
    *
    * Scale shape: centroids are tiny (≈√n) and broadcast; assignment is a
    * single map-side pass over the corpus (no shuffle of the vectors
    * beyond the final centroid-keyed join). Versus LSH, IVF trades a
    * second tiny pass (query→centroid) for much better list balance on
    * clustered data.
    */
  /** The deterministic centroid subset — ONE definition shared by
    * [[topkCosineIvf]] and [[topkCosineIvfAuto]]'s list count, so the
    * probed lists and the count that sizes nProbe can never drift apart.
    */
  private def ivfCentroids(corpus: DataFrame, centroidEvery: Int): DataFrame =
    corpus.filter(col("vec_id") % centroidEvery === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centv"))

  /** Seed stride for a seed set CAPPED at ~`maxSeeds`: E = max(
    * centroidEvery, ⌈n/maxSeeds⌉), so the every-E-th seed rule stops
    * growing the seed count with the corpus — the trained-fixed-size
    * analog (production IVF/k-means pick nlist/k as deployment constants,
    * not corpus fractions; the raw rule made every seed-assignment pass
    * Θ(n²/centroidEvery)). Below the cap E = centroidEvery — bit-identical
    * to the raw rule at every declared scale factor. One ids-only driver
    * count; the oracles restate the same E as a scalar subquery.
    */
  private[graft] def cappedSeedStride(corpus: DataFrame, centroidEvery: Int,
                                      maxSeeds: Int): Int = {
    require(maxSeeds >= 1, s"maxSeeds must be >= 1, got $maxSeeds")
    val n = corpus.count()
    math.max(centroidEvery.toLong,
      math.ceil(n.toDouble / maxSeeds).toLong).toInt
  }

  /** `maxLists` (default uncapped for the primitive — [[topkCosineIvfAuto]]
    * derives its own stride and must not double-count): the declared fixed
    * variant passes 128 so its assignment pass stays linear too.
    */
  def topkCosineIvf(corpus: DataFrame, k: Int, nProbe: Int = 4,
                    centroidEvery: Int = 50,
                    queries: Option[DataFrame] = None,
                    maxLists: Int = Int.MaxValue,
                    excludeSelf: Boolean = true): DataFrame = {
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    val stride =
      if (maxLists == Int.MaxValue) centroidEvery
      else cappedSeedStride(corpus, centroidEvery, maxLists)
    val cent = ivfCentroids(corpus, stride)
      .withColumn("centn", l2_norm(col("centv")))

    def assign(df: DataFrame, idCol: String, vCol: String, keep: Int) = {
      val w = Window.partitionBy(idCol)
        .orderBy(col("csim").desc, col("centroid_id"))
      df.crossJoin(broadcast(cent))
        .withColumn("csim",
          dot_product(col(vCol), col("centv")) /
            (l2_norm(col(vCol)) * col("centn")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("centv", "centn", "csim", "crank")
    }

    val corpusAssigned = assign(
      corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
      "neighbor_id", "cv", keep = 1)
    val queryAssigned = assign(
      queries.getOrElse(corpus)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      "query_id", "qv", keep = nProbe)

    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    val scored = queryAssigned.join(corpusAssigned, Seq("centroid_id"))
    // excludeSelf is an IDENTITY rule for same-space search; cross-modal
    // callers (caption queries vs composite frame ids — disjoint id
    // spaces) pass false so a numeric collision can't drop a real result
    (if (excludeSelf) scored.filter(col("query_id") =!= col("neighbor_id"))
     else scored)
      .withColumn("sim", round(
        dot_product(col("qv"), col("cv")) /
          (sqrt(dot_product(col("qv"), col("qv"))) *
           sqrt(dot_product(col("cv"), col("cv")))), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** IVF with recall held constant under growth: probes a fixed FRACTION
    * of the centroid lists instead of a fixed count. [[topkCosineIvf]]
    * with fixed nProbe loses recall as n grows (centroids ≈ n/centroidEvery
    * rise, 4 probes cover an ever-smaller share — measured 0.61 → 0.32
    * across 4× n in `graft.tools.Recall`); probing a constant share keeps
    * the searched-data fraction, and so the recall, scale-stable. Cost
    * scales with probeFraction·centroids per query — the explicit
    * recall-vs-work dial.
    *
    * One extra driver action (a count of the centroid subset) picks
    * nProbe; the plan is otherwise identical to the fixed variant.
    *
    * `maxQueries` bounds the QUERY side: the all-vectors-as-queries form is
    * Θ(probeFraction·n²) — linear per query is the contract, so the declared
    * query must not grow the query set with the corpus (the r11 sf1
    * rehearsal measured the quadratic cliff: 5.2 s → 25.3 s at ×10). The
    * bound is a deterministic md5 sample: rank vec_ids by md5(vec_id) and
    * keep the first `maxQueries` — corpus-uniform (content-independent),
    * reproducible on any engine (the oracle restates the same predicate),
    * and collected via one ids-only TakeOrdered (top-`maxQueries` of n id
    * rows — no full sort, no driver blow-up). The probe-fraction recall
    * rule is unchanged; cost becomes Θ(probeFraction·n·maxQueries) — linear
    * in the corpus.
    *
    * `maxLists` bounds the CODEBOOK: with the raw every-`centroidEvery`-th
    * seed rule the list count grows with n, making the corpus→centroid
    * ASSIGNMENT pass Θ(n²/centroidEvery) on its own — the r12 rehearsal
    * measured exactly that residual after the query bound (×10 point still
    * super-linear). Production IVF trains a FIXED-size codebook (nlist is
    * a deployment constant, not a corpus fraction); here the seed stride
    * widens once n exceeds centroidEvery·maxLists — E = max(centroidEvery,
    * ⌈n/maxLists⌉) — so lists cap at ~maxLists and assignment is Θ(n·nlist),
    * linear in the corpus. Below the cap (every declared scale factor)
    * E = centroidEvery and results are bit-identical to the uncapped form;
    * recall is governed by the probe FRACTION (a constant share of the
    * corpus is searched at any list granularity — the IvfScaleProbe
    * falsification), so the cap trades nothing measurable. The oracle
    * derives the same E and nProbe with scalar subqueries.
    */
  def topkCosineIvfAuto(corpus: DataFrame, k: Int,
                        probeFraction: Double = 0.4,
                        centroidEvery: Int = 50,
                        maxQueries: Int = 100,
                        maxLists: Int = 128): DataFrame = {
    require(probeFraction > 0 && probeFraction <= 1,
      s"probeFraction must be in (0,1], got $probeFraction")
    require(maxQueries >= 1, s"maxQueries must be >= 1, got $maxQueries")
    val stride = cappedSeedStride(corpus, centroidEvery, maxLists)
    val nCent = ivfCentroids(corpus, stride).count()
    val nProbe = math.max(1, math.ceil(probeFraction * nCent).toInt)
    // Int.MaxValue = the explicit every-vector-queries form (tool-side
    // recall sweeps); skip the sample entirely rather than globally
    // sorting the corpus under a no-op limit
    val qs = if (maxQueries == Int.MaxValue) None
             else Some(md5SampleQueries(corpus, maxQueries))
    topkCosineIvf(corpus, k, nProbe, stride, queries = qs)
  }

  /** Deterministic bounded query sample: the `maxQueries` vec_ids ranked
    * first by md5(vec_id) (ties: vec_id — md5 collisions don't exist at
    * these sizes but determinism must not rest on that). Content-independent
    * and uniform over ids, so the sampled recall estimates the full-query
    * recall; identical predicate on the DuckDB side keeps the row hash-gated.
    */
  private[graft] def md5SampleQueries(corpus: DataFrame,
                                      maxQueries: Int): DataFrame = {
    // ids-only TakeOrdered (the documented shape): rank a vec_id-only
    // projection so the top-k heap carries 8-byte ids, not 64-float
    // vectors, then broadcast the tiny winner set back onto the corpus —
    // the embedding column rides only the maxQueries survivors.
    val ids = corpus.select(col("vec_id"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(maxQueries)
    corpus.join(broadcast(ids), Seq("vec_id"))
  }

  /** Deterministic k-means over the embedding corpus (Lloyd, `maxIter`
    * refine passes with assignment-fixpoint early exit): seeds = the
    * every-`centroidEvery`-th subset (the IVF seed rule), cosine
    * assignment, centroid recompute, reassignment, and per-cluster
    * stats — the topic-bucketing / curriculum-grouping step of a
    * training-data pipeline, and the natural k-means upgrade of the
    * IVF index's seed lists.
    *
    * Convergence: a pass whose assignment equals the previous pass's is a
    * TRUE fixpoint — identical assignment ⇒ identical exact-integer sums
    * ⇒ identical centroids ⇒ every later pass identical — so early exit
    * returns exactly what `maxIter` unrolled passes would (which is what
    * the unrolled SQL oracle computes). The changed-assignment count is
    * one scalar agg per round (the connectedComponents termination
    * pattern), skipped on the last pass where no further work could be
    * saved; prior rounds' barrier blocks are released as in
    * [[graft.operators.CorpusOps.connectedComponents]].
    *
    * Cross-engine determinism is designed in, not hoped for, and the
    * design avoids ENGINE-SPECIFIC ROUNDING anywhere: `round(x)` lands
    * on decimal halves, where Spark (BigDecimal HALF_UP on the shortest
    * string) and DuckDB (std::round on the binary double) can disagree —
    * for quotients AND for raw products. Instead every quantization is
    * `floor(x·10⁶ + 0.5)`: floor of the identical IEEE double is the
    * same everywhere, so parity holds by construction, not empirically.
    *  - the refined centroid is the FIXED-POINT SUM vector
    *    `sum(floor(v_i·10⁶ + 0.5) :: long)` — exact integers, independent
    *    of partial-agg accumulation order, and never divided by n at all:
    *    cosine is scale-invariant, so the sum direction IS the mean
    *    direction (quantization at 10⁻⁶ per component is documented
    *    behavior, far below embedding noise);
    *  - `avg_sim` floors the integer-micro quotient the same way.
    * Assignment ties break by centroid id.
    *
    * Scale shape: two broadcast-assignment passes (k ≤ `maxClusters` —
    * the seed stride widens once n exceeds centroidEvery·maxClusters, so
    * k is a deployment constant, not a corpus fraction, and each Lloyd
    * pass is Θ(n·k), linear; r12 — the raw every-50th rule made the pass
    * Θ(n²/50)) whose arg-max is a map-side partial `max(struct)` — the
    * n×k scored rows never reach an exchange — plus one dim×k fixed-point
    * stats groupBy. The oracles derive the same stride via a scalar
    * subquery; below the cap results equal the raw rule bit-for-bit.
    */
  def kmeansClusterStats(corpus: DataFrame, dim: Int,
                         centroidEvery: Int = 50, maxIter: Int = 1,
                         maxClusters: Int = 128): DataFrame =
    kmeansAssign(corpus, dim, centroidEvery, maxIter, maxClusters)._1
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
           (floor(sum(floor(col("csim") * 1e6 + 0.5).cast("long")).cast("double")
             / count(lit(1))) / 1e6).as("avg_sim"))
      .select(col("cluster_id"), col("n_members"), col("avg_sim"))

  /** The Lloyd loop behind [[kmeansClusterStats]]: returns the final
    * (vec_id, v, cluster_id, csim) assignment plus the number of refine
    * passes actually run (< maxIter means the assignment hit its fixpoint
    * early — exposed so tests can assert convergence, not just output).
    */
  private[graft] def kmeansAssign(
      corpus: DataFrame, dim: Int,
      centroidEvery: Int, maxIter: Int,
      maxClusters: Int = 128): (DataFrame, Int) = {
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val v = corpus.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // the IVF seed rule via the one shared definition — with the seed
    // count CAPPED (k = n/50 clusters at corpus scale is not k-means,
    // it's a quadratic assignment pass; production picks k as a
    // deployment constant). Below the cap the stride equals
    // centroidEvery, bit-identical to the raw rule.
    val stride = cappedSeedStride(corpus, centroidEvery, maxClusters)
    val cent0 = ivfCentroids(corpus, stride)
      .select(col("centroid_id").as("cluster_id"),
              asDouble(col("centv")).as("cv"))

    // arg-max centroid per vector WITHOUT a window: max over
    // struct(csim, -cluster_id, …) partial-aggregates map-side, so the
    // n×k crossJoin rows never shuffle (ties: highest csim, then lowest
    // cluster_id — the same order the oracle's ROW_NUMBER uses)
    def assign(cent: DataFrame): DataFrame =
      v.crossJoin(broadcast(cent))
        .withColumn("csim",
          dot_product(col("v"), col("cv")) /
            (l2_norm(col("v")) * l2_norm(col("cv"))))
        .groupBy("vec_id")
        .agg(max(struct(col("csim"), (-col("cluster_id")).as("negc"),
                        col("cluster_id"), col("v"))).as("m"))
        .select(col("vec_id"), col("m.v").as("v"),
                col("m.cluster_id").as("cluster_id"), col("m.csim").as("csim"))

    def refine(assigned: DataFrame): DataFrame = {
      val sums = assigned.groupBy("cluster_id").agg(
        count(lit(1)).as("n"),
        (0 until dim).map(i =>
          sum(floor(col("v")(i) * 1e6 + 0.5).cast("long")).as(s"s$i")): _*)
      // sum direction = mean direction for cosine; integer-valued doubles,
      // exact and engine-identical
      val cent = sums.select(col("cluster_id"),
        array((0 until dim).map(i => col(s"s$i").cast("double")): _*).as("cv"))
      assign(cent)
    }

    // barrier per round: the loop would otherwise grow one crossJoin+agg
    // of plan per pass AND recompute every prior pass each action
    var assigned = LoopProbe.timed("kmeans", 0, "assign0") {
      Barriers.materialize(assign(cent0), eager = true) }
    var itersRun = 0
    var converged = false
    while (itersRun < maxIter && !converged) {
      val next = LoopProbe.timed("kmeans", itersRun + 1, "refine") {
        Barriers.materialize(refine(assigned), eager = true) }
      // fixpoint test only when another pass could be skipped; one n-row
      // equi-join + count between two materialized frames
      if (itersRun + 1 < maxIter) {
        val changed = LoopProbe.timed("kmeans", itersRun + 1, "converge") {
          next.select(col("vec_id"), col("cluster_id").as("c2"))
            .join(assigned.select(col("vec_id"), col("cluster_id").as("c1")),
                  Seq("vec_id"))
            .filter(col("c1") =!= col("c2"))
            .count() }
        if (changed == 0) converged = true
      }
      Barriers.release(assigned)
      assigned = next
      itersRun += 1
    }
    (assigned, itersRun)
  }

  /** Embedding-space outlier extraction: the `pct`% of each k-means
    * cluster FURTHEST from its centroid (lowest cosine) — the vectors that
    * fit no topic bucket: noise, encoder failures, or genuinely novel
    * content, either way the review queue of an embedding-space quality
    * gate. Shares [[kmeansAssign]]'s Lloyd loop, then applies the same
    * exact-integer-rank cutoff as EventOps.topPercentByValue: K =
    * ⌈n·pct/100⌉ per cluster, ranked on the FIXED-POINT similarity (ties:
    * vec_id), so no raw-double ordering crosses the engine boundary.
    *
    * Scale shape: the Lloyd loop's broadcast assignment (n×k rows never
    * shuffle) + one partial-agg'd count per cluster (broadcast back) + one
    * window partitioned by cluster — parallelism = cluster count, and k
    * grows with corpus size under the √n centroid rule.
    */
  def kmeansOutliers(corpus: DataFrame, dim: Int, centroidEvery: Int,
                     maxIter: Int, pct: Int,
                     maxClusters: Int = 128): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1,100], got $pct")
    val sim = kmeansAssign(corpus, dim, centroidEvery, maxIter, maxClusters)._1
      .select(col("vec_id"), col("cluster_id"),
        floor(col("csim") * 1e6 + 0.5).cast("long").as("sim_fp"))
    val counts = sim.groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .withColumn("k", expr(s"(n * $pct + 99) div 100"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("sim_fp"), col("vec_id"))
    sim
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(counts.select("cluster_id", "k")), Seq("cluster_id"))
      .filter(col("rk") <= col("k"))
      .select("cluster_id", "vec_id", "sim_fp", "rk")
  }

  /** Symmetric int8 scalar quantization of an embedding column: per-vector
    * max-abs scale, values mapped to [-127, 127] — the storage/bandwidth
    * reduction step of a large ANN index. Returns ids, the scale and the
    * quantized vector plus a reconstruction-error metric.
    */
  def quantizeInt8(corpus: DataFrame): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    val scale = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    corpus
      .withColumn("scale", scale)
      .withColumn("qvec", transform(v,
        x => round(x / greatest(col("scale"), lit(1e-30)) * 127.0, 0)
          .cast("int")))
      .withColumn("max_abs_err", round(
        aggregate(
          zip_with(v, col("qvec"),
            (x, q) => abs(x - q.cast("double") *
              greatest(col("scale"), lit(1e-30)) / 127.0)),
          lit(0.0), (acc, e) => greatest(acc, e)), 6))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
              col("max_abs_err"))
  }

  /** L2 normalization to the unit sphere — the preprocessing step that
    * turns dot product into cosine for every downstream ANN op. Per-row
    * projection, no shuffle; the witness columns (norm before, norm after)
    * keep the output small and hashable rather than shipping the vectors.
    */
  /** Per-DIMENSION corpus statistics (count, mean, std, min, max in
    * fixed-point micro-units) — the input to whitening / mean-centering
    * and the embedding-drift check between corpus snapshots (a dimension
    * whose mean or spread moves between crawls flags an encoder or
    * pipeline change). Components are fixed-pointed per value
    * (floor(x·1e6 + 0.5) longs), so every aggregate is an exact integer
    * in any accumulation order; mean is integer division, variance is one
    * closing double expression from exact integers (no float-sum trap
    * anywhere). The SQUARED sum accumulates in DECIMAL(38,0), not long:
    * with |x|≈1 each x_fp² is ~10¹², so a long sum wraps silently at only
    * ~9.2 M values per dimension — far below corpus scale — while the
    * 38-digit decimal holds exact to ~10²⁶ values (the DuckDB oracle's
    * HUGEINT plays the same role there). One posexplode + one partial-agg'd
    * groupBy(dim) — a single corpus pass, 64 output rows regardless of n.
    */
  /** THE per-component fixed point (µunits) — one definition shared by
    * dimStats, dimDrift, and the gram fold's Scala twin; a precision
    * change here is the only place to make it.
    */
  private[graft] def fpMicro(x: Column): Column =
    floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long")

  /** Closing std-from-exact-sums SQL (variance in (µunit)², std back in
    * µunits) over the named n/sum/sumsq columns — shared by dimStats and
    * dimDrift so the drift spec's "equals dimStats per half" invariant
    * cannot drift apart.
    */
  private def stdClosingSql(n: String, sum: String, sumsq: String): String =
    s"""cast(floor(sqrt(greatest(
          cast($sumsq as double) / $n
          - (cast($sum as double) / $n) * (cast($sum as double) / $n),
          0.0)) + 0.5) as bigint)"""

  def dimStats(corpus: DataFrame): DataFrame = {
    corpus
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), fpMicro(col("x")).as("x_fp"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
           sum(col("x_fp")).as("sum_fp"),
           // promote BEFORE squaring (decimal·long, not long·long): a
           // component beyond |x| ≈ 3034 would wrap x_fp² in Long silently
           // while the oracle's HUGEINT stays exact — same discipline as
           // the oracle's CAST(x_fp AS HUGEINT) * x_fp
           sum(col("x_fp").cast("decimal(38,0)") * col("x_fp"))
             .as("sumsq_fp2"),
           min(col("x_fp")).as("min_fp"),
           max(col("x_fp")).as("max_fp"))
      .select(col("dim"), col("n"),
        expr("sum_fp div n").as("mean_fp"),
        expr(stdClosingSql("n", "sum_fp", "sumsq_fp2")).as("std_fp"),
        col("min_fp"), col("max_fp"))
  }

  /** Upper-triangle Gram (second-moment) matrix of the embedding corpus —
    * the input a PCA / whitening step factorizes (the [[dimStats]]
    * scaladoc's "whitening input", completed: dimStats gives the diagonal
    * moments, this gives the cross terms). Components use the SAME
    * per-value fixed point as dimStats (floor(x·10⁶ + 0.5) longs), so
    * every cell is an exact integer in any accumulation order.
    *
    * Scale shape — the one operator where `mapPartitions` genuinely beats
    * every declarative form: each partition folds its rows into a
    * CONSTANT-SIZE dim·(dim+1)/2 accumulator (the classic treeAggregate
    * Gram pattern), so the shuffle carries only `partitions × 2080`
    * partial rows regardless of n. The SQL alternatives either self-join
    * the exploded corpus (2080·n join rows through an exchange) or
    * posexplode twice (4096·n) — both shuffle the corpus, this shuffles
    * the SUMMARY. Overflow is engineered, not hoped: per-row products are
    * ≤ 10¹², the Long accumulator flushes into BigInt every 2²⁰ rows
    * (≤ 10¹⁸ per flush, 9× under 2⁶³), and partials cross the wire as
    * DECIMAL(38,0) — same accumulator discipline as dimStats, mirrored by
    * the oracle's HUGEINT.
    */
  /** |x_fp| bound that keeps a full 2²⁰-row flush window under 2⁶³:
    * (2.9·10⁶)² · 2²⁰ ≈ 8.8·10¹⁸ < 9.2·10¹⁸. Components beyond |x| = 2.9
    * throw loudly instead of wrapping silently (see the in-loop check).
    */
  private[graft] val MaxGramComponentFp: Long = 2900000L

  def gramUpperTriangle(corpus: DataFrame, dim: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    require(dim >= 1 && dim <= 256, s"dim must be in [1,256], got $dim")
    val spark = corpus.sparkSession
    val cells = dim * (dim + 1) / 2
    val flushEvery = 1 << 20
    // malformed rows (null / shorter-than-dim vectors) are EXCLUDED, and
    // the filter runs in the declarative layer so both engines apply the
    // identical predicate (the oracle restates `len(v) >= dim`) — without
    // it Spark would throw where DuckDB's out-of-range list index
    // silently NULLs, a cross-engine divergence on dirty input
    val clean = corpus
      .filter(col("embedding").isNotNull && size(col("embedding")) >= dim &&
        !exists(col("embedding"), _.isNull))
      .select(col("embedding"))
    // toRdd = the UNBOXED read path: InternalRow.getArray.toFloatArray
    // copies the unsafe buffer straight into a primitive array — the
    // per-row fold is the 100 TB hot loop, and Row.getSeq would box every
    // component of every vector on the way in
    val partials = clean.queryExecution.toRdd.mapPartitions { it =>
      val acc = Array.fill(cells)(BigInt(0))
      val cur = new Array[Long](cells)
      val fp = new Array[Long](dim)
      var rows = 0
      def flush(): Unit = {
        var t = 0
        while (t < cells) { acc(t) += cur(t); cur(t) = 0L; t += 1 }
        rows = 0
      }
      var any = false
      while (it.hasNext) {
        val e = it.next().getArray(0).toFloatArray()
        var i = 0
        while (i < dim) {
          // non-finite first: floor(NaN·1e6).toLong is silently 0 and ±Inf
          // SATURATES to Long.Min/MaxValue (where math.abs(MinValue) is
          // still negative and would slip an abs-based bound) — both must
          // fail loudly, since the DuckDB oracle's CAST errors where Spark
          // would silently diverge
          if (!java.lang.Float.isFinite(e(i)))
            throw new IllegalArgumentException(
              s"gramUpperTriangle: non-finite component ${e(i)} at dim $i")
          fp(i) = math.floor(e(i).toDouble * 1e6 + 0.5).toLong
          // the flush-window bound is ENGINEERED for |x| ≲ 2.9 (2²⁰ rows ×
          // (2.9e6)² < 2⁶³); a component beyond it must fail LOUDLY here —
          // silent Long wrap would diverge from the oracle's HUGEINT with
          // no error anywhere (embeddings are unit-norm-ish in practice;
          // hitting this means the corpus wasn't normalized). Two-sided
          // compare, NOT math.abs: abs(Long.MinValue) is negative
          if (fp(i) > MaxGramComponentFp || fp(i) < -MaxGramComponentFp)
            throw new IllegalArgumentException(
              s"gramUpperTriangle: |component| ${e(i)} exceeds the " +
                s"fixed-point accumulator bound (|x| <= ${MaxGramComponentFp / 1e6}); " +
                "normalize the embedding corpus first")
          i += 1
        }
        var t = 0; i = 0
        while (i < dim) {
          var j = i
          while (j < dim) { cur(t) += fp(i) * fp(j); j += 1; t += 1 }
          i += 1
        }
        any = true; rows += 1
        if (rows == flushEvery) flush()
      }
      flush()
      if (!any) Iterator.empty
      else {
        var t = -1
        (for (i <- 0 until dim; j <- i until dim) yield {
          t += 1
          Row(i.toLong, j.toLong, new java.math.BigDecimal(acc(t).bigInteger))
        }).iterator
      }
    }
    val schema = StructType(Seq(
      StructField("dim_i", LongType, nullable = false),
      StructField("dim_j", LongType, nullable = false),
      StructField("part", DecimalType(38, 0), nullable = false)))
    spark.createDataFrame(partials, schema)
      .groupBy("dim_i", "dim_j")
      .agg(sum(col("part")).as("sum_fp2"))
  }

  /** Snapshot drift monitor — the check [[dimStats]] feeds: per-dimension
    * mean/std compared across two corpus halves (vec_id parity is the
    * deterministic stand-in for "previous vs current snapshot"; a real
    * deployment passes a snapshot-id predicate instead). A dimension
    * whose mean shifts or variance collapses between snapshots flags an
    * upstream embedding-model or preprocessing change before it poisons
    * a training run. Shares dimStats' exactness machinery ([[fpMicro]],
    * the closing-std SQL) so the per-half numbers can never drift from
    * what dimStats itself would report — and ONE corpus pass: both
    * halves aggregate in the same groupBy via conditional sums, not two
    * filtered scans. Malformed rows (null / short / null-component
    * vectors) are excluded whole by the same declarative predicate the
    * gram operator uses, restated identically in the oracle.
    */
  def dimDrift(corpus: DataFrame, dim: Int = 64): DataFrame = {
    val comp = corpus
      .filter(col("embedding").isNotNull && size(col("embedding")) >= dim &&
        !exists(col("embedding"), _.isNull))
      .select((col("vec_id") % 2 === 0).as("in_a"),
              posexplode(col("embedding")).as(Seq("dim", "x")))
      .filter(col("dim") < dim)
      .select(col("in_a"), col("dim").cast("long").as("dim"),
              fpMicro(col("x")).as("x_fp"))
    def side(cond: Column, tag: String) = Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(cond, col("x_fp")).otherwise(0L)).as(s"sum_$tag"),
      // promote BEFORE squaring — see dimStats' sumsq_fp2 note
      sum(when(cond, col("x_fp").cast("decimal(38,0)") * col("x_fp"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as(s"sumsq_$tag"))
    val aggs = side(col("in_a"), "a") ++ side(!col("in_a"), "b")
    def meanStd(tag: String) = Seq(
      expr(s"case when n_$tag = 0 then cast(null as bigint) " +
           s"else sum_$tag div n_$tag end").as(s"mean_${tag}_fp"),
      expr(s"case when n_$tag = 0 then cast(null as bigint) else " +
           stdClosingSql(s"n_$tag", s"sum_$tag", s"sumsq_$tag") + " end")
        .as(s"std_${tag}_fp"))
    comp.groupBy("dim")
      .agg(aggs.head, aggs.tail: _*)
      .select(Seq(col("dim"), col("n_a"), col("n_b")) ++
        meanStd("a") ++ meanStd("b"): _*)
      .withColumn("mean_delta_fp", col("mean_a_fp") - col("mean_b_fp"))
  }

  def normalizeL2(corpus: DataFrame): DataFrame = {
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    val norm = l2_norm(col("embedding"))
    corpus
      .withColumn("norm_before", round(norm, 6))
      .withColumn("unit", transform(col("embedding"),
        x => x.cast("double") / greatest(norm, lit(1e-30))))
      // same index-order dot product on both engines (proven parity path)
      .withColumn("norm_after", round(
        sqrt(dot_product(col("unit"), col("unit"))), 6))
      .select("vec_id", "norm_before", "norm_after")
  }

  /** Multimodal projection: text metadata ⋈ embedding vectors in one frame
    * (documents ⋈ embeddings on doc_id = vec_id), with derived vector stats.
    */
  def multimodalSelect(docs: DataFrame, embeddings: DataFrame): DataFrame =
    docs.join(embeddings, docs("doc_id") === embeddings("vec_id"))
      .select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("label"),
        size(col("embedding")).cast("long").as("dim"),
        round(graft.functions.ArrayMath.l2_norm(col("embedding")), 6)
          .as("l2_norm"))

  /** SQ8 top-k cosine: the search runs over the int8 codes produced by
    * [[quantizeInt8]]'s per-vector max-abs scaling — the 4× memory /
    * scan-bandwidth reduction a 100 TB ANN index actually ships, where the
    * fp32 vectors stay in cold storage and only the byte codes are
    * resident. The quantized score is `qdot / (‖qa‖·‖qb‖)` with every
    * dot/norm an EXACT 64-bit integer sum (127·127·dim ≪ 2⁶³), so engine
    * parity is structural, not a float-rounding accident; the single
    * double division + sqrt at the end is the same IEEE expression on both
    * engines. Survivors carry an exact-fp32 `sim_exact` witness — the
    * re-rank step of a production two-stage (quantized scan → exact
    * re-score) retrieval ladder.
    *
    * Scale shape: identical to [[topkCosine]] (tiny broadcast query side,
    * corpus streamed once, per-query partial top-k) but each corpus row
    * moves `dim` bytes instead of `4·dim`, and the inner loop is integer
    * multiply-add. Max-abs (symmetric) quantization keeps zero exactly
    * representable and needs no zero-point, so the integer dot needs no
    * cross terms.
    */
  def topkCosineInt8(corpus: DataFrame, k: Int, queryMax: Int = 5): DataFrame = {
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    val v = transform(col("embedding"), x => x.cast("double"))
    val scale = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    val coded = corpus
      .withColumn("scale", scale)
      .withColumn("qvec", transform(v,
        x => round(x / greatest(col("scale"), lit(1e-30)) * 127.0, 0)
          .cast("int")))
      .withColumn("qq", aggregate(col("qvec"), lit(0L),
        (acc, x) => acc + (x * x).cast("long")))
    val qside = coded.filter(col("vec_id") < queryMax).select(
      col("vec_id").as("query_id"), col("qvec").as("qa"),
      col("qq").as("qqa"), col("embedding").as("va"))
    val cside = coded.select(
      col("vec_id").as("neighbor_id"), col("qvec").as("qb"),
      col("qq").as("qqb"), col("embedding").as("vb"))
    val qdot = aggregate(
      zip_with(col("qa"), col("qb"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x.cast("long"))
    val scored = cside.crossJoin(broadcast(qside))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_q", round(
        qdot.cast("double") /
          greatest(sqrt(col("qqa").cast("double")) *
                   sqrt(col("qqb").cast("double")), lit(1e-30)), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim_q").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("sim_exact", round(
        dot_product(col("va"), col("vb")) /
          (l2_norm(col("va")) * l2_norm(col("vb"))), 6))
      .select("query_id", "neighbor_id", "sim_q", "sim_exact", "rank")
  }

  /** Product-quantized (PQ) top-k cosine — the compression rung of the
    * IVF-PQ architecture every billion-vector ANN deployment ships: each
    * vector is encoded as `m` sub-space codeword ids (here 8 codes for a
    * 64-dim vector — 8 bytes resident instead of 256), and query scoring
    * is Asymmetric Distance Computation: per-query dot-product TABLES
    * against the tiny codebook, then a code-indexed table-lookup sum per
    * corpus vector — the corpus's floats are never touched at query time.
    *
    * Deterministic by construction, in the repo's kmeans discipline:
    *  - codebook = sub-vectors of the every-`centroidEvery`-th seed rows
    *    (the shared IVF seed rule — no randomized training);
    *  - encoding arg-max runs on fixed-point `floor(sim·1e6+0.5)` longs
    *    (ties → lowest code id), a map-side max-struct partial aggregate,
    *    so assignment order can't differ across engines or partitionings;
    *  - ADC sums are sums of per-(sub-space) fixed-point longs — exact in
    *    any accumulation order; the reconstructed norm comes from the
    *    codeword norm table the same way. One closing double division.
    *
    * The PQ score approximates cosine(query, RECONSTRUCTED corpus vector)
    * — recall vs the exact top-k is the priced tradeoff (spec measures
    * it); survivors carry the exact-fp `sim_exact` witness, the re-rank
    * rung shared with [[topkCosineInt8]].
    *
    * Scale shape: codebook and per-query tables are tiny FIXED-size
    * broadcasts (m·maxCodes and |q|·m·maxCodes rows — the codebook is
    * capped, see the build-site comment); the corpus appears only as its
    * code rows (n·m ids) — one equi-join on (sub-space, code), one
    * partial-agg'd groupBy. Nothing n×n, nothing n×dim at query time.
    */
  def topkCosinePq(corpus: DataFrame, k: Int, m: Int = 8,
                   centroidEvery: Int = 50, queryMax: Int = 5,
                   refine: Int = 4, maxCodes: Int = 256): DataFrame =
    pqSearch(corpus, k, m, centroidEvery, queryMax, refine, maxCodes,
      nProbe = None)

  /** The full IVF-PQ read path: [[topkCosineIvf]]'s list probing composed
    * with [[topkCosinePq]]'s ADC scoring — the architecture a
    * billion-vector deployment actually runs. Queries probe their nProbe
    * nearest centroid lists; ONLY corpus vectors in a probed list are
    * ADC-scored (codes alone), and only the refine·k shortlist touches
    * floats for the exact re-rank. Candidate volume per query ≈
    * nProbe·centroidEvery code rows instead of n — the IVF half bounds
    * WHO is scored, the PQ half bounds WHAT scoring reads.
    */
  def topkCosineIvfPq(corpus: DataFrame, k: Int, m: Int = 8,
                      centroidEvery: Int = 50, queryMax: Int = 5,
                      refine: Int = 4, maxCodes: Int = 256,
                      nProbe: Int = 4): DataFrame =
    pqSearch(corpus, k, m, centroidEvery, queryMax, refine, maxCodes,
      nProbe = Some(nProbe))

  /** The ANN ladder's last rung: [[topkCosineIvfPq]]'s compressed read
    * path under [[topkCosineIvfAuto]]'s recall-stable probe policy —
    * nProbe is a fixed FRACTION of the (capped) centroid lists, not a
    * fixed count, so the searched corpus share (and so the ADC shortlist's
    * recall) holds as n grows while every scored byte is still a PQ code.
    * This is the configuration a billion-vector deployment actually runs:
    * fixed-size codebooks (both the IVF list set and the PQ codewords are
    * capped — assignment and encode stay Θ(n)), probe work Θ(probeFraction
    * ·nlist) per query, floats touched only for the refine·k re-rank.
    *
    * One extra ids-only driver count sizes nProbe (the [[topkCosineIvfAuto]]
    * discipline — the same `ivfListStride`/[[cappedSeedStride]] the PQ
    * search's IVF half probes, so the count and the probed lists cannot
    * drift); the oracle derives the same stride and nProbe with scalar
    * subqueries.
    */
  def topkCosineIvfPqAuto(corpus: DataFrame, k: Int, m: Int = 8,
                          centroidEvery: Int = 50, queryMax: Int = 5,
                          refine: Int = 4, maxCodes: Int = 256,
                          probeFraction: Double = 0.4): DataFrame = {
    require(probeFraction > 0 && probeFraction <= 1,
      s"probeFraction must be in (0,1], got $probeFraction")
    val stride = cappedSeedStride(corpus, centroidEvery, IvfPqMaxLists)
    val nCent = ivfCentroids(corpus, stride).count()
    val nProbe = math.max(1, math.ceil(probeFraction * nCent).toInt)
    pqSearch(corpus, k, m, centroidEvery, queryMax, refine, maxCodes,
      nProbe = Some(nProbe))
  }

  /** IVF list cap of the PQ read path — ONE constant shared by
    * [[pqSearch]]'s probe restriction and [[topkCosineIvfPqAuto]]'s list
    * count so the probed lists and the count that sizes nProbe cannot
    * drift (the [[ivfCentroids]] discipline).
    */
  private[graft] val IvfPqMaxLists: Int = 128

  private def pqSearch(corpus: DataFrame, k: Int, m: Int,
                       centroidEvery: Int, queryMax: Int,
                       refine: Int, maxCodes: Int,
                       nProbe: Option[Int]): DataFrame = {
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    val dim = dimOf(corpus)
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val sub = dim / m

    // every vector exploded into its m sub-vectors (shared by corpus
    // encode, codebook build, and query tables)
    val subs = corpus
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("m"), col("embedding"))
      .select(col("vec_id"), col("m"),
        slice(col("embedding"), col("m") * lit(sub) + lit(1), lit(sub))
          .as("sv"))
    def fp(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("long")
    // FIXED-size codebook (unlike IVF's n/centroidEvery lists): the first
    // maxCodes seed rows under the shared seed rule. Production PQ trains
    // k=256 codewords per sub-space regardless of n — a codebook growing
    // with the corpus would make encoding O(n²/centroidEvery); capping it
    // keeps encode O(n·m·maxCodes), linear in the corpus.
    val codebook = subs
      .filter(col("vec_id") % centroidEvery === 0 &&
              col("vec_id") < lit(centroidEvery.toLong * maxCodes))
      .select(col("vec_id").as("code_id"), col("m"), col("sv").as("cw"))
      .withColumn("cwn2_fp", fp(dot_product(col("cw"), col("cw"))))

    // encode: per (vector, sub-space) the nearest codeword by sub-space
    // cosine, arg-max on fixed-point longs via map-side max-struct
    val codes = subs.join(broadcast(codebook), Seq("m"))
      .withColumn("sim_fp", fp(
        dot_product(col("sv"), col("cw")) /
          greatest(sqrt(dot_product(col("sv"), col("sv"))) *
                   sqrt(dot_product(col("cw"), col("cw"))), lit(1e-30))))
      .groupBy("vec_id", "m")
      .agg(max(struct(col("sim_fp"), (-col("code_id")).as("neg"),
        col("code_id"))).as("s"))
      .select(col("vec_id").as("neighbor_id"), col("m"),
              col("s.code_id").as("code_id"))

    // per-query ADC tables: dot of each query sub-vector against each
    // codeword, fixed-pointed per entry
    val qtab = subs.filter(col("vec_id") < queryMax)
      .select(col("vec_id").as("query_id"), col("m"), col("sv"))
      .join(broadcast(codebook), Seq("m"))
      .withColumn("pdot_fp", fp(dot_product(col("sv"), col("cw"))))
      .select("query_id", "m", "code_id", "pdot_fp", "cwn2_fp")
    val qn = corpus.filter(col("vec_id") < queryMax)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
              l2_norm(col("embedding")).as("qn"))

    // IVF restriction (when probing): corpus assigned to its nearest
    // centroid list, queries to their nProbe nearest — the same raw-double
    // assignment discipline as topkCosineIvf, so both halves stay one
    // convention. Only (query, neighbor) pairs sharing a probed list are
    // ADC-scored.
    val adcInput = nProbe match {
      case None => codes.join(broadcast(qtab), Seq("m", "code_id"))
      case Some(np) =>
        // same capped-seed rule as topkCosineIvf's declared form: the
        // IVF half's centroid count must not grow with the corpus or its
        // corpus-assignment pass is the quadratic the PQ half's capped
        // codebook already avoids
        val listStride = cappedSeedStride(corpus, centroidEvery,
          IvfPqMaxLists)
        val cent = corpus.filter(col("vec_id") % listStride === 0)
          .select(col("vec_id").as("centroid_id"),
                  col("embedding").as("centv"))
          .withColumn("centn", l2_norm(col("centv")))
        def assignIvf(df: DataFrame, idAs: String, keep: Int): DataFrame = {
          val w = Window.partitionBy(idAs)
            .orderBy(col("csim").desc, col("centroid_id"))
          df.crossJoin(broadcast(cent))
            .withColumn("csim", dot_product(col("v0"), col("centv")) /
              (l2_norm(col("v0")) * col("centn")))
            .withColumn("crank", row_number().over(w))
            .filter(col("crank") <= keep)
            .select(col(idAs), col("centroid_id"))
        }
        val ca = assignIvf(corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("v0")), "neighbor_id", 1)
        val qa = assignIvf(corpus.filter(col("vec_id") < queryMax)
          .select(col("vec_id").as("query_id"), col("embedding").as("v0")),
          "query_id", np)
        val cand = qa.join(ca, Seq("centroid_id"))
          .select("query_id", "neighbor_id")
        codes.join(cand, Seq("neighbor_id"))
          .join(broadcast(qtab), Seq("query_id", "m", "code_id"))
    }
    val adc = adcInput
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("pdot_fp")).as("adc_fp"), sum(col("cwn2_fp")).as("rn2_fp"))
    val scored = adc
      .join(broadcast(qn.select("query_id", "qn")), Seq("query_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_pq_fp", fp(
        (col("adc_fp").cast("double") / lit(1e6)) /
          greatest(col("qn") *
            sqrt(col("rn2_fp").cast("double") / lit(1e6)), lit(1e-30))))
    // two-stage retrieval (the production IVF-PQ read path): the ADC
    // shortlist over-fetches refine·k candidates on codes alone, then the
    // exact re-rank touches floats for ONLY those candidates — recall is
    // bought with a wider shortlist, never with corpus-wide float reads
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("sim_pq_fp").desc, col("neighbor_id"))
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("sim_exact").desc, col("neighbor_id"))
    scored
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= refine * k)
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv")), Seq("neighbor_id"))
      .join(broadcast(qn.select("query_id", "qv")), Seq("query_id"))
      .withColumn("sim_exact", round(
        dot_product(col("qv"), col("nv")) /
          (l2_norm(col("qv")) * l2_norm(col("nv"))), 6))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim_pq_fp", "sim_exact", "rank")
  }

}
