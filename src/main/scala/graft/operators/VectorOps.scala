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

  /** Elementwise dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

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
    val q = queries.select(
      col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv"))
    val c = corpus.select(
      col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** All pairs with cosine ≥ threshold (embedding-space near-duplicate
    * detection). Brute force over buckets would be the scale path; here the
    * corpus self-join is blocked by LSH signature first.
    */
  def nearDupCosine(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("vec_a"), asDouble(col("embedding")).as("va"))
    val b = corpus.select(col("vec_id").as("vec_b"), asDouble(col("embedding")).as("vb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b", "sim")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * md5-derived value in [-1, 1). Portable to any SQL engine — no RNG
    * state, no driver-side materialization of the planes.
    */
  private def planeComponent(plane: Int, dim: Column): Column = {
    val h = md5(concat(lit(s"plane$plane:"), dim.cast("string")))
    // first 6 hex chars → [0, 16^6) → scale to [-1, 1)
    (conv(substring(h, 1, 6), 16, 10).cast("double") / lit(8388608.0)) - 1.0
  }

  /** Sign-bit LSH bucket id from `nPlanes` random hyperplanes. Vectors in
    * the same bucket are ANN candidates; cosine-close vectors collide with
    * high probability.
    */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** ANN top-k via LSH buckets: candidates share a bucket, exact cosine
    * re-rank within. Trades recall for a shuffle-on-bucket equi-join —
    * the formulation that survives a corpus that no longer fits a
    * broadcast.
    */
  def topkCosineLsh(corpus: DataFrame, dim: Int, k: Int,
                    nPlanes: Int = 8): DataFrame = {
    val withBucket = corpus.select(
      col("vec_id"), asDouble(col("embedding")).as("v"),
      lshBucket(asDouble(col("embedding")), dim, nPlanes).as("bucket"))
    val a = withBucket.select(col("bucket"), col("vec_id").as("query_id"),
                              col("v").as("qv"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("neighbor_id"),
                              col("v").as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
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
        round(l2norm(asDouble(col("embedding"))), 6).as("l2_norm"))
}
