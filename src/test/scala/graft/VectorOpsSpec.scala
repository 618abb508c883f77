package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("brute-force topk: self excluded, k rows per query, sims sorted") {
    val r = VectorOps.topkCosine(emb.filter($"vec_id" < 3), emb, 5)
      .select("query_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Long)].collect()
    assert(r.length == 15)
    assert(r.forall { case (q, n, _, _) => q != n })
    r.groupBy(_._1).values.foreach { rows =>
      val sims = rows.sortBy(_._4).map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("dim stats equal an in-memory fixed-point model") {
    val rows = emb.select("embedding").as[Seq[Float]].collect()
    val got = VectorOps.dimStats(emb)
      .select("dim", "n", "mean_fp", "std_fp", "min_fp", "max_fp")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 64)
    for (d <- Seq(0, 17, 63)) {
      val xs = rows.map(v => math.floor(v(d).toDouble * 1e6 + 0.5).toLong)
      val n = xs.length.toLong
      val (s1, s2) = (xs.sum, xs.map(x => x * x).sum)
      val variance = s2.toDouble / n - (s1.toDouble / n) * (s1.toDouble / n)
      val want = (d.toLong, n, s1 / n,
        math.floor(math.sqrt(math.max(variance, 0.0)) + 0.5).toLong,
        xs.min, xs.max)
      assert(got(d.toLong) == want, s"dim $d")
    }
  }

  test("dim drift equals dimStats run separately on each parity half") {
    val drift = VectorOps.dimDrift(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    def half(parity: Int) = VectorOps.dimStats(
        emb.filter($"vec_id" % 2 === parity))
      .select("dim", "n", "mean_fp", "std_fp")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val (a, b) = (half(0), half(1))
    assert(drift.size == 64)
    for (d <- Seq(0L, 17L, 63L)) {
      val r = drift(d)
      assert((r.getLong(1), r.getLong(3), r.getLong(4)) ==
        ((a(d)._2, a(d)._3, a(d)._4)), s"half A dim $d")
      assert((r.getLong(2), r.getLong(5), r.getLong(6)) ==
        ((b(d)._2, b(d)._3, b(d)._4)), s"half B dim $d")
      assert(r.getLong(7) == a(d)._3 - b(d)._3, s"delta dim $d")
    }
  }

  test("dim drift excludes malformed vectors whole, like gram") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val good = emb.limit(8)
    val badSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding",
        ArrayType(FloatType, containsNull = true)),
      StructField("label", IntegerType)))
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(900001L, null, 0),
        Row(900002L, Seq(1.0f, 2.0f), 0),
        Row(900004L, (0 until 64).map(i =>
          if (i == 3) null else java.lang.Float.valueOf(0.25f)), 0))),
      badSchema)
    val mixed = good.select("vec_id", "embedding", "label").unionByName(bad)
    val fromMixed = VectorOps.dimDrift(mixed).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    val fromGood = VectorOps.dimDrift(good).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(fromMixed == fromGood)
  }

  test("gram upper triangle equals an in-memory exact recount") {
    val rows = emb.select("embedding").as[Seq[Float]].collect()
      .map(_.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray)
    val got = VectorOps.gramUpperTriangle(emb, dim = 64)
      .select(col("dim_i"), col("dim_j"),
        col("sum_fp2").cast("string"))
      .as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> BigInt(r._3)).toMap
    assert(got.size == 64 * 65 / 2)
    for ((i, j) <- Seq((0, 0), (0, 63), (17, 17), (5, 41), (63, 63))) {
      val want = rows.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      assert(got((i.toLong, j.toLong)) == want, s"cell ($i,$j)")
    }
  }

  test("gram excludes malformed vectors whole, same predicate as the oracle") {
    val good = emb.limit(10)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val badSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding",
        ArrayType(FloatType, containsNull = true)),
      StructField("label", IntegerType)))
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(900001L, null, 0),
        Row(900002L, Seq(1.0f, 2.0f), 0), // shorter than dim
        Row(900003L, (0 until 64).map(i =>
          if (i == 7) null else java.lang.Float.valueOf(0.5f)), 0))),
      badSchema)
    val mixed = good.select("vec_id", "embedding", "label")
      .unionByName(bad)
    val fromMixed = VectorOps.gramUpperTriangle(mixed, dim = 64)
      .select(col("dim_i"), col("dim_j"), col("sum_fp2").cast("string"))
      .as[(Long, Long, String)].collect().toSet
    val fromGood = VectorOps.gramUpperTriangle(good, dim = 64)
      .select(col("dim_i"), col("dim_j"), col("sum_fp2").cast("string"))
      .as[(Long, Long, String)].collect().toSet
    assert(fromMixed == fromGood)
  }

  test("gram partial flush keeps partition accumulators exact across flushes") {
    // tiny corpus, flush boundary forced by many partitions (each with few
    // rows) — result must equal the single-partition run bit-for-bit
    val one = VectorOps.gramUpperTriangle(emb.coalesce(1), dim = 64)
      .select(col("dim_i"), col("dim_j"), col("sum_fp2").cast("string"))
      .as[(Long, Long, String)].collect().toSet
    val many = VectorOps.gramUpperTriangle(emb.repartition(13), dim = 64)
      .select(col("dim_i"), col("dim_j"), col("sum_fp2").cast("string"))
      .as[(Long, Long, String)].collect().toSet
    assert(one == many)
  }

  test("int8 topk: quantized sims track exact sims and ranks are dense") {
    val r = VectorOps.topkCosineInt8(emb, k = 5)
      .select("query_id", "neighbor_id", "sim_q", "sim_exact", "rank")
      .as[(Long, Long, Double, Double, Long)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (q, n, _, _, _) => q != n })
    r.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._5).sorted.sameElements(1L to rows.length))
    }
    // max-abs SQ8 on a 64-dim vector perturbs each normalized component by
    // at most 0.5/127 of its scale; the cosine error bound is loose but a
    // gross quantizer bug (wrong scale, sign clip) blows far past 0.05
    assert(r.forall { case (_, _, sq, se, _) => math.abs(sq - se) < 0.05 })
  }

  test("int8 topk top-1 agrees with brute force on a strong planted match") {
    // plant an exact duplicate of vec 7: quantized search must still rank
    // it first for query 7 with sim_q == 1 (codes are identical)
    val dup = emb.unionByName(
      emb.filter($"vec_id" === 7).withColumn("vec_id", lit(100007L)))
    val top = VectorOps.topkCosineInt8(dup, k = 1, queryMax = 8)
      .filter($"query_id" === 7)
      .select("neighbor_id", "sim_q").as[(Long, Double)].head()
    assert(top._1 == 100007L && math.abs(top._2 - 1.0) < 1e-9)
  }

  test("pq topk: dense ranks, planted seed-duplicate reconstructs exactly") {
    val r = VectorOps.topkCosinePq(emb, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect()
    assert(r.nonEmpty && r.forall { case (q, n, _) => q != n })
    r.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
    // vec 0 is a codebook seed (0 % 50 == 0): an exact duplicate encodes
    // to vec 0's own codewords, so its PQ reconstruction is exact and the
    // ADC score for (query 0, dup) is cosine(v0, v0) = 1
    val dup = emb.unionByName(
      emb.filter($"vec_id" === 0).withColumn("vec_id", lit(99999L)))
    // sim_pq_fp lands within the per-subspace fixed-point quantization
    // wiggle of exactly 1 (each of the m table entries carries ≤0.5 µunit)
    val top = VectorOps.topkCosinePq(dup, k = 1)
      .filter($"query_id" === 0)
      .select("neighbor_id", "sim_pq_fp").as[(Long, Long)].head()
    assert(top._1 == 99999L && math.abs(top._2 - 1000000L) <= 8)
  }

  test("ivf-pq composes probing and ADC without collapsing recall") {
    val r = VectorOps.topkCosineIvfPq(emb, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect()
    assert(r.forall { case (q, n, _) => q != n })
    r.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
    val brute = VectorOps.topkCosine(emb.filter($"vec_id" < 5), emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = r.map(t => (t._1, t._2)).toSet
    val recall = (got & brute).size.toDouble / brute.size
    // measured 0.36 at both sf0.001 and sf0.01 — equal to unrestricted PQ
    // at the same refine: the probed lists don't lose what PQ kept
    assert(recall >= 0.2, s"ivf-pq recall collapsed: $recall")
  }

  test("pq refine dial buys recall monotonically against brute force") {
    val brute = VectorOps.topkCosine(emb.filter($"vec_id" < 5), emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(refine: Int): Double = {
      val pq = VectorOps.topkCosinePq(emb, k = 5, refine = refine)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (pq & brute).size.toDouble / brute.size
    }
    val (r2, r8) = (recall(2), recall(8))
    // measured on this corpus: 0.2 @ refine=2, 0.56+ @ refine=8 — the
    // shortlist width is the explicit recall-vs-work dial
    assert(r8 >= r2, s"refine dial regressed: r2=$r2 r8=$r8")
    assert(r8 >= 0.4, s"refine=8 recall collapsed: $r8")
  }

  test("semantic decontamination flags planted benchmark leaks, exactly") {
    // plant: train vec 9001 IS bench vec 0's embedding (a verbatim eval
    // leak); everything else keeps its natural sims. The screen must flag
    // 9001 with max_bench_sim 1.0, and its verdicts must equal a
    // driver-side exact recount at the same threshold.
    val bench = emb.filter($"vec_id" % 23 === 0)
    val leak = bench.orderBy("vec_id").limit(1)
      .select(lit(9001L).as("vec_id"), col("embedding"), col("label"))
    val train = emb.filter($"vec_id" % 23 =!= 0).unionByName(leak)
    val got = VectorOps.decontaminateSemantic(train, bench, threshold = 0.4)
      .select("vec_id", "max_bench_sim", "n_bench_hits", "contaminated")
      .as[(Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == train.count())
    val planted = got(9001L)
    assert(planted._2 == 1.0 && planted._4,
      s"planted leak must score max sim 1.0, got $planted")
    // exact recount in memory
    val bvecs = bench.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val tvecs = train.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    tvecs.foreach { case (id, v) =>
      val sims = bvecs.map { case (_, b) => cos(v, b) }
      val hits = sims.count(_ >= 0.4).toLong
      assert(math.abs(got(id)._2 - sims.max) < 1e-9,
        s"max sim mismatch for $id")
      assert(got(id)._3 == hits && got(id)._4 == (hits > 0),
        s"verdict mismatch for $id")
    }
  }

  test("banded semantic decontamination: subset of exact screen, verbatim " +
       "leak always caught (identical vectors share every band)") {
    val bench = emb.filter($"vec_id" % 23 === 0)
    val leak = bench.orderBy("vec_id").limit(1)
      .select(lit(9001L).as("vec_id"), col("embedding"), col("label"))
    val train = emb.filter($"vec_id" % 23 =!= 0).unionByName(leak)
    val exact = VectorOps.decontaminateSemantic(train, bench, 0.4)
      .filter($"contaminated")
      .select("vec_id", "max_bench_sim", "n_bench_hits")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    val banded = VectorOps
      .decontaminateSemanticBanded(train, bench, 0.4, dim = 64)
      .select("vec_id", "max_bench_sim", "n_bench_hits")
      .as[(Long, Double, Long)].collect()
    // the verbatim leak projects identically onto every plane → all 8
    // bands collide → it can never be missed, and scores exactly 1.0
    val planted = banded.find(_._1 == 9001L)
      .getOrElse(fail("banded screen missed the planted verbatim leak"))
    assert(planted._2 == 1.0)
    banded.foreach { case (id, sim, hits) =>
      val e = exact.getOrElse(id,
        fail(s"banded emitted $id, absent from the exact screen"))
      // max over banded candidates = exact max whenever the argmax pair
      // survives banding; it can only be ≤, and hits can only be ≤
      assert(sim <= e._2 + 1e-9 && hits <= e._3,
        s"banded exceeded exact for $id: ($sim,$hits) vs $e")
    }
    // recall sanity at this corpus: the screen is approximate but must
    // not collapse (8 bands × 4 bits ≈ 75% at the τ boundary)
    assert(banded.length.toDouble / exact.size >= 0.4,
      s"banded recall collapsed: ${banded.length}/${exact.size}")
  }

  test("cosine of a vector with itself is 1 (identical vecs share all bands)") {
    val one = emb.filter($"vec_id" === 0)
    val r = VectorOps.nearDupCosine(
      one.unionByName(one.withColumn("vec_id", lit(999L))), 0.99, dim = 64)
      .select("sim").as[Double].head()
    assert(math.abs(r - 1.0) < 1e-9)
  }

  test("nearDupCosine never cross-joins and recalls high-sim pairs") {
    val plan = VectorOps.nearDupCosine(emb, 0.4, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // exact duplicates (the strongest near-dups) always survive banding
    val dup = emb.unionByName(
      emb.filter($"vec_id" < 3).withColumn("vec_id", $"vec_id" + 100000L))
    val pairs = VectorOps.nearDupCosine(dup, 0.99, dim = 64)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert((0 until 3).forall(i => pairs.contains((i.toLong, i + 100000L))))
  }

  test("cosine clusters group planted duplicates under one canonical id") {
    // semantic-dedup composition: cosine pairs → min-label propagation;
    // two exact copies of vec 0 must land in vec 0's cluster
    val dup = emb.unionByName(
      emb.filter($"vec_id" === 0)
        .withColumn("vec_id", lit(100000L))
        .unionByName(emb.filter($"vec_id" === 0)
          .withColumn("vec_id", lit(100001L))))
    val pairs = VectorOps.nearDupCosine(dup, 0.99, dim = 64)
      .select($"vec_a".as("doc_a"), $"vec_b".as("doc_b"))
    val clusters = graft.operators.CorpusOps
      .connectedComponents(dup.select($"vec_id".as("doc_id")), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(100000L) == 0L && clusters(100001L) == 0L)
    assert(clusters(0L) == 0L)
    assert(clusters.size == dup.count())
  }

  test("LSH topk achieves reasonable recall vs brute force") {
    val exact = VectorOps.topkCosine(emb, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = VectorOps.topkCosineLsh(emb, dim = 64, k = 5, nPlanes = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random vectors are a worst case for LSH; just assert it finds a
    // meaningful fraction and never fabricates non-bucket pairs
    assert(recall > 0.05, s"recall $recall")
    assert(approx.forall { case (q, n) => q != n })
  }

  test("banded LSH topk strictly beats the single-bucket table on recall") {
    val exact = VectorOps.topkCosine(emb, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame) = {
      val approx = df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      (exact & approx).size.toDouble / exact.size
    }
    val single = recallOf(VectorOps.topkCosineLsh(emb, dim = 64, k = 5))
    val banded = recallOf(VectorOps.topkCosineLshBanded(emb, dim = 64, k = 5))
    // 4 OR-bands of 4 bits each: recall ~1-(1-p^4)^4 vs p^8 for the single
    // 8-bit bucket — the whole point of the banded construction
    assert(banded > single, s"banded $banded <= single $single")
    assert(banded > 0.25, s"banded recall $banded")
  }

  test("aggregator topk equals window topk exactly") {
    val w = VectorOps.topkCosine(emb.filter($"vec_id" < 10), emb, 5)
      .select("query_id", "neighbor_id", "sim", "rank")
      .collect().map(_.toSeq).toSet
    val a = VectorOps.topkCosineAgg(emb.filter($"vec_id" < 10), emb, 5)
      .select("query_id", "neighbor_id", "sim", "rank")
      .collect().map(_.toSeq).toSet
    assert(a == w && w.size == 50)
  }

  test("auto-probe IVF resolves nProbe from the centroid count") {
    // n=500 at centroidEvery=50 -> 10 centroids; f=0.4 -> nProbe=4, so the
    // all-queries auto form must equal the fixed-nProbe=4 result exactly
    val auto = VectorOps
      .topkCosineIvfAuto(emb, k = 5, probeFraction = 0.4,
        maxQueries = Int.MaxValue)
      .collect().map(_.toSeq).toSet
    val fixed = VectorOps.topkCosineIvf(emb, k = 5, nProbe = 4)
      .collect().map(_.toSeq).toSet
    assert(auto == fixed && auto.nonEmpty)
    intercept[IllegalArgumentException] {
      VectorOps.topkCosineIvfAuto(emb, k = 5, probeFraction = 0.0)
    }
  }

  test("auto-probe IVF caps the codebook: binding maxLists widens the stride") {
    // n=500, centroidEvery=2, maxLists=5 -> stride = max(2, ceil(500/5)) =
    // 100 -> 5 lists, nProbe = ceil(0.4*5) = 2: must equal the fixed
    // variant at exactly that derived granularity, queries restricted to
    // the same md5 sample
    val capped = VectorOps.topkCosineIvfAuto(emb, k = 5,
        centroidEvery = 2, maxLists = 5)
      .collect().map(_.toSeq).toSet
    val expected = VectorOps.topkCosineIvf(emb, k = 5, nProbe = 2,
        centroidEvery = 100,
        queries = Some(VectorOps.md5SampleQueries(emb, 100)))
      .collect().map(_.toSeq).toSet
    assert(capped == expected && capped.nonEmpty)
    // non-binding cap (every declared scale): identical to the raw rule
    val free = VectorOps.topkCosineIvfAuto(emb, k = 5)
      .collect().map(_.toSeq).toSet
    val freeRaw = VectorOps.topkCosineIvfAuto(emb, k = 5,
        maxLists = Int.MaxValue)
      .collect().map(_.toSeq).toSet
    assert(free == freeRaw)
  }

  test("bounded auto-probe IVF: md5 query sample, full-form agreement") {
    // the declared form: 100-query md5 sample. Its result must be exactly
    // the all-queries result restricted to the sampled query ids — the
    // bound changes WHICH queries run, never any query's answer
    val sample = VectorOps.md5SampleQueries(emb, 100)
      .select("vec_id").as[Long].collect().toSet
    assert(sample.size == 100)
    val bounded = VectorOps.topkCosineIvfAuto(emb, k = 5)
      .collect().map(_.toSeq)
    assert(bounded.map(_.head.asInstanceOf[Long]).toSet == sample)
    val full = VectorOps
      .topkCosineIvfAuto(emb, k = 5, maxQueries = Int.MaxValue)
      .filter(r => sample.contains(r.getLong(0)))
      .collect().map(_.toSeq)
    assert(bounded.toSet == full.toSet)
    // determinism: the sample is a pure function of the ids
    val again = VectorOps.md5SampleQueries(emb, 100)
      .select("vec_id").as[Long].collect().toSet
    assert(again == sample)
  }

  test("kmeans partitions every vector and refining helps cohesion") {
    import graft.functions.ArrayMath.{dot_product, l2_norm}
    val stats = VectorOps.kmeansClusterStats(emb, dim = 64)
      .as[(Long, Long, Double)].collect()
    assert(stats.map(_._2).sum == emb.count()) // a partition, not a sample
    assert(stats.forall(s => s._3 >= -1.0 && s._3 <= 1.0))
    // every cluster id is one of the deterministic seeds
    assert(stats.forall(_._1 % 50 == 0))
    val n = stats.map(_._2).sum.toDouble
    val refined = stats.map(s => s._3 * s._2).sum / n
    // iter-0 baseline: best cosine to a RAW seed vector, per vector —
    // the refined centroids must fit at least as well as the seeds did
    val seeds = emb.filter($"vec_id" % 50 === 0)
      .select($"embedding".as("cv"))
    val seedMean = emb.select($"vec_id", $"embedding".as("v"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(seeds))
      .withColumn("csim", dot_product($"v", $"cv") /
        (l2_norm($"v") * l2_norm($"cv")))
      .groupBy("vec_id")
      .agg(org.apache.spark.sql.functions.max($"csim").as("best"))
      .agg(org.apache.spark.sql.functions.avg($"best"))
      .head().getDouble(0)
    assert(refined >= seedMean - 1e-6,
      s"refined $refined < seed baseline $seedMean")
  }

  test("kmeans converges to an assignment fixpoint within maxIter") {
    // deterministic seeds on the synthetic corpus: the loop must hit a
    // round with zero reassignments before a generous maxIter, and the
    // early exit must equal the fully-unrolled run (fixpoint argument)
    val (assignedA, itersA) =
      VectorOps.kmeansAssign(emb, dim = 64, centroidEvery = 50, maxIter = 25)
    assert(itersA < 25, s"no fixpoint after $itersA refine passes")
    val a = assignedA.select("vec_id", "cluster_id")
      .as[(Long, Long)].collect().toSet
    // running fewer capped passes than convergence needed differs; running
    // more than convergence needed is identical
    val (assignedB, itersB) =
      VectorOps.kmeansAssign(emb, dim = 64, centroidEvery = 50,
                             maxIter = itersA + 5)
    assert(itersB == itersA)
    val b = assignedB.select("vec_id", "cluster_id")
      .as[(Long, Long)].collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      VectorOps.kmeansAssign(emb, dim = 64, centroidEvery = 50, maxIter = 0)
    }
  }

  test("IVF topk achieves reasonable recall vs brute force") {
    val exact = VectorOps.topkCosine(emb, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = VectorOps.topkCosineIvf(emb, k = 5, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.10, s"recall $recall")
    assert(approx.forall { case (q, n) => q != n })
  }

  test("pipeline clean corpus keeps a nonempty deduped subset") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val kept = graft.operators.CorpusPipeline.cleanCorpus(docs, 0.3)
    val n = kept.count()
    assert(n > 0 && n <= docs.count())
    // no exact duplicates survive
    assert(kept.select(md5($"text")).distinct().count() == n)
  }

  test("semantic pipeline stage drops paraphrases, passes unembedded docs") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val clean = graft.operators.CorpusPipeline.cleanCorpus(docs, 0.3)
      .select("doc_id").as[Long].collect().toSet
    val sem = graft.operators.CorpusPipeline
      .cleanCorpusSemantic(docs, emb, 0.3)
      .select("doc_id").as[Long].collect().toSet
    // strictly a subset: the embedding stage removes real paraphrase
    // clusters on this corpus (25 at sf0.001)
    assert(sem.subsetOf(clean) && sem.size < clean.size)
    // docs with no embedding row have no semantic evidence: pass through
    val embedded = emb.select($"vec_id").as[Long].collect().toSet
    assert((clean -- embedded).subsetOf(sem))
  }

  test("l2 normalization lands every vector on the unit sphere") {
    val r = VectorOps.normalizeL2(emb)
      .select("norm_before", "norm_after").as[(Double, Double)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (before, after) => before <= 0.0 || after == 1.0 })
  }

  test("multimodal select joins docs to embeddings 1:1") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val r = VectorOps.multimodalSelect(docs, emb)
    assert(r.count() == docs.count())
    assert(r.select("dim").distinct().as[Long].head() == 64L)
  }

  test("kmeans outliers are exactly each cluster's bottom ceil(n/10) by sim") {
    val assigned = VectorOps
      .kmeansAssign(emb, dim = 64, centroidEvery = 50, maxIter = 2)._1
      .select(col("vec_id"), col("cluster_id"),
        floor(col("csim") * 1e6 + 0.5).cast("long").as("sim_fp"))
      .as[(Long, Long, Long)].collect()
    val expected = assigned.groupBy(_._2).toSeq.flatMap { case (c, rows) =>
      val k = (rows.length * 10 + 99) / 100
      rows.sortBy(r => (r._3, r._1)).take(k).map(r => (c, r._1, r._3))
    }.toSet
    val got = VectorOps
      .kmeansOutliers(emb, dim = 64, centroidEvery = 50, maxIter = 2,
        pct = 10)
      .select("cluster_id", "vec_id", "sim_fp")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
    // the flagged vectors are the LEAST central: every outlier's sim is
    // <= every kept vector's sim within its cluster
    val keptMin = assigned.filterNot(r => got.contains((r._2, r._1, r._3)))
      .groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    assert(got.forall { case (c, _, s) =>
      keptMin.get(c).forall(s <= _) })
  }

  test("IVF-PQ auto-probe equals the fixed variant at the derived nProbe " +
       "and improves ADC recall over the default fixed probe") {
    // the auto rule restated in-memory: stride = max(50, ceil(n/128)),
    // centroids = every stride-th id, nProbe = max(1, ceil(0.4 * nCent))
    val n = emb.count()
    val stride = math.max(50L, math.ceil(n.toDouble / 128).toLong)
    val nCent = emb.filter($"vec_id" % stride === 0).count()
    val nProbe = math.max(1, math.ceil(0.4 * nCent).toInt)
    val auto = VectorOps.topkCosineIvfPqAuto(emb, k = 5).collect()
    val fixed = VectorOps.topkCosineIvfPq(emb, k = 5, nProbe = nProbe)
      .collect()
    assert(auto.map(_.toSeq).toSet == fixed.map(_.toSeq).toSet
      && auto.nonEmpty, s"auto(nProbe=$nProbe) drifted from fixed")
    // probing 40% of the lists must find at least what 4 lists found
    val exact = VectorOps.topkCosine(emb, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1))).count(exact.contains)
      .toDouble / rows.length
    assert(recall(auto) >= recall(
      VectorOps.topkCosineIvfPq(emb, k = 5).collect()) - 1e-9)
  }

  test("prepare-release manifest conserves the survivor corpus exactly") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.filter($"doc_id" % 11 =!= 0)
    val bench = docs.filter($"doc_id" % 11 === 0)
    val manifest = graft.operators.CorpusPipeline
      .prepareRelease(corpus, emb, bench, minQuality = 0.3).collect()
    val byCol = manifest.map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    // every (split, shard) cell unique, splits from the fixed vocabulary
    assert(byCol.map(t => (t._1, t._2)).distinct.length == byCol.length)
    assert(byCol.map(_._1).toSet.subsetOf(Set("train", "valid", "test")))
    // doc conservation: the manifest's doc total == the survivor count of
    // the composed stages (never more than the gated corpus)
    val nDocs = byCol.map(_._3).sum
    assert(nDocs > 0 && nDocs <= graft.operators.CorpusPipeline
      .cleanCorpus(corpus, 0.3).count())
    // shares are exact integer ppm of the token total and sum to <= 1e6
    val tokTotal = byCol.map(_._4).sum
    byCol.foreach { t =>
      assert(t._5 == t._4 * 1000000L / tokTotal, s"share drift in $t") }
    assert(byCol.map(_._5).sum <= 1000000L)
  }

  test("release report: monotone attrition, ppm of input, manifest-consistent") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.filter($"doc_id" % 11 =!= 0)
    val bench = docs.filter($"doc_id" % 11 === 0)
    val rep = graft.operators.CorpusPipeline
      .releaseReport(corpus, emb, bench, minQuality = 0.3)
      .orderBy("stage_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rep.map(_._2).toSeq == Seq("input", "gate", "exact", "minhash",
      "winnowed", "semdedup", "decontaminate", "quarantine"))
    // each stage only ever removes docs/tokens (quarantine row = the
    // decontaminated set minus split-reassigned docs)
    rep.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"stage grew: $a -> $b") }
    // ppm columns are exact integer ppm of the INPUT row
    val (inDocs, inToks) = (rep.head._3, rep.head._4)
    rep.foreach { r =>
      assert(r._5 == r._3 * 1000000L / inDocs, s"docs_ppm drift in $r")
      assert(r._6 == r._4 * 1000000L / inToks, s"tokens_ppm drift in $r")
    }
    // the report cannot disagree with the shipped release: the manifest's
    // doc/token totals are exactly the decontaminate stage's (quarantine
    // MOVES docs between splits, drops none)
    val manifest = graft.operators.CorpusPipeline
      .prepareRelease(corpus, emb, bench, minQuality = 0.3).collect()
    val decon = rep(6)
    assert(manifest.map(_.getLong(2)).sum == decon._3)
    assert(manifest.map(_.getLong(3)).sum == decon._4)
  }
}
