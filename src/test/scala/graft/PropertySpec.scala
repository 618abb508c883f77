package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** Randomized (fixed-seed, deterministic) tests against independent
  * in-memory models — random inputs catch the shapes hand-written fixtures
  * miss (odd components, duplicate edges, dense graphs, singletons).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._

  /** Brute-force union-find ground truth. */
  private def ufComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((1L to n.toLong).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (1L to n.toLong).map(i => i -> find(i)).toMap
  }

  test("connectedComponents equals union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(24)
      val edges = Seq.fill(rnd.nextInt(31)) {
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n))
      }.collect {
        // operator contract: undirected candidate PAIRS (a < b, no loops)
        case (a, b) if a != b => (math.min(a, b), math.max(a, b))
      }.distinct
      val nodes = (1L to n.toLong).toDF("doc_id")
      val got = CorpusOps.connectedComponents(
          nodes, edges.toDF("doc_a", "doc_b"), maxIter = 40)
        .as[(Long, Long)].collect().toMap
      val want = ufComponents(n, edges)
      assert(got == want, s"trial $trial n=$n edges=$edges")
    }
  }

  test("winnowing pairs equal the brute-force model on random corpora") {
    // random small-vocab docs force heavy shingle collisions — the
    // shapes the planted-run fixture can't reach (adjacent equal
    // windows, repeated shingles inside one doc, hub fingerprints)
    val vocab = Array("ox", "ant", "bee", "cat", "dog", "elk", "fox", "gnu")
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def modelPairs(ds: Seq[(Long, String)], k: Int, w: Int,
                   minShared: Int, maxDf: Int): Map[(Long, Long), Long] = {
      val fps = ds.map { case (id, text) =>
        val t = "\\S+".r.findAllIn(text.toLowerCase).toSeq
        val hs = t.sliding(k).filter(_.size == k)
          .map(g => md5hex(g.mkString(" "))).toSeq
        id -> hs.sliding(w).filter(_.size == w).map(_.min).toSet
      }.toMap
      val df = fps.values.flatten.groupBy(identity).map { case (f, xs) => f -> xs.size }
      val kept = fps.map { case (id, s) => id -> s.filter(df(_) <= maxDf) }
      val ids = ds.map(_._1).sorted
      (for {
        i <- ids; j <- ids if i < j
        shared = (kept(i) & kept(j)).size if shared >= minShared
      } yield (i, j) -> shared.toLong).toMap
    }
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 6) {
      val ds = (1L to (4 + rnd.nextInt(10)).toLong).map { id =>
        val n = rnd.nextInt(18)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val maxDf = 1 + rnd.nextInt(8)
      val got = graft.operators.TextOps
        .winnowedPairs(ds.toDF("doc_id", "text"),
          minShared = 1, maxDf = maxDf)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val want = modelPairs(ds, k = 3, w = 4, minShared = 1, maxDf = maxDf)
      assert(got == want, s"trial $trial maxDf=$maxDf: $got vs $want\n$ds")
    }
  }

  test("native winnowed fingerprint selection equals the in-memory model " +
       "across random (k, w) and degenerate window sizes") {
    // the pairs test above pins only the default (k=3, w=4); the native
    // deque must hold for w=1 (every full window selects its own hash),
    // k=1 (unigram grams), ties from repeated shingles, and docs at the
    // exact full-window boundary
    val vocab = Array("ox", "ant", "bee", "cat")
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def model(text: String, k: Int, w: Int): Set[String] = {
      val t = "\\S+".r.findAllIn(text.toLowerCase).toSeq
      val hs = t.sliding(k).filter(_.size == k)
        .map(g => md5hex(g.mkString(" "))).toSeq
      hs.sliding(w).filter(_.size == w).map(_.min).toSet
    }
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 8) {
      val k = 1 + rnd.nextInt(4)
      val w = 1 + rnd.nextInt(6)
      val ds = (1L to 8L).map { id =>
        val n = rnd.nextInt(14)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val got = ds.toDF("doc_id", "text")
        .select($"doc_id", graft.operators.TextOps
          .winnowedFingerprintSet($"text", k, w).as("fps"))
        .as[(Long, Seq[String])].collect().toMap
      ds.foreach { case (id, text) =>
        assert(got(id).toSet == model(text, k, w),
          s"trial $trial k=$k w=$w doc $id '$text'")
      }
    }
  }

  test("banded semantic decontamination equals the brute-force banding " +
       "model on random vectors") {
    import graft.operators.VectorOps
    val dim = 8
    val (bands, rpb) = (8, 4)
    def bucket(v: Array[Float], j: Int): Int =
      (0 until rpb).map { i =>
        val p = j * rpb + i
        val proj = (0 until dim)
          .map(d => v(d).toDouble * VectorOps.planeComponent(p, d)).sum
        if (proj > 0) 1 << i else 0
      }.sum
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = (0 until dim).map(d => a(d).toDouble * b(d).toDouble).sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rnd = new scala.util.Random(47)
    var totalContaminated = 0
    for (trial <- 1 to 4) {
      val n = 12 + rnd.nextInt(16)
      // dim-8 random vectors: cosine std ≈ 1/√8, so τ=0.3 crossings are
      // plentiful and the trials are non-vacuous (asserted at the end)
      val vecs = (1L to n.toLong).map { id =>
        id -> Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      }.toMap
      val tau = 0.3
      val trainIds = vecs.keys.filter(_ % 3 != 0).toSeq.sorted
      val benchIds = vecs.keys.filter(_ % 3 == 0).toSeq.sorted
      val want = trainIds.flatMap { t =>
        val cands = benchIds.filter { b =>
          (0 until bands).exists(j => bucket(vecs(t), j) == bucket(vecs(b), j))
        }
        val sims = cands.map(b => cos(vecs(t), vecs(b))).filter(_ >= tau)
        if (sims.isEmpty) None
        else Some(t -> ((sims.max, sims.length.toLong)))
      }.toMap
      val df = vecs.toSeq.sortBy(_._1)
        .map { case (id, v) => (id, "x", v) }
        .toDF("vec_id", "label", "embedding")
      val got = VectorOps.decontaminateSemanticBanded(
          df.filter($"vec_id" % 3 =!= 0), df.filter($"vec_id" % 3 === 0),
          threshold = tau, dim = dim, bands = bands, rowsPerBand = rpb)
        .as[(Long, Double, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.keySet == want.keySet, s"trial $trial: contaminated sets " +
        s"diverge: ${got.keySet} vs ${want.keySet}")
      want.foreach { case (id, (s, c)) =>
        assert(math.abs(got(id)._1 - s) < 1e-9 && got(id)._2 == c,
          s"trial $trial doc $id: ${got(id)} vs ($s,$c)")
      }
      totalContaminated += want.size
    }
    assert(totalContaminated > 0, "trials were vacuous — no crossings")
  }

  test("anomaly MAD exact + hist equal brute models on random value frames") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 8) {
      val types = Seq("a", "b", "c").take(1 + rnd.nextInt(3))
      val rows = types.flatMap { t =>
        val n = 1 + rnd.nextInt(40)
        (1 to n).map(i => (t, rnd.nextDouble() * 30 - 5))
      }.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
      val ev = rows.toDF("event_id", "event_type", "value")
      def lowerMedian(xs: Seq[Long]): Long = {
        val s0 = xs.sorted; s0(((s0.length + 1) / 2) - 1)
      }
      def interpMedian(xs: Seq[Double]): Double = {
        val s0 = xs.sorted; val n = s0.length
        (s0((n - 1) / 2) + s0(n / 2)) / 2
      }
      // exact operator vs interpolated-median model
      val gotExact = graft.operators.EventOps.anomalyMad(ev, kSigma = 3)
        .select("event_type", "med_fp", "mad_fp", "n_anomalies")
        .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      // hist operator vs lower-median bucket model
      val gotHist = graft.operators.EventOps.anomalyMadHist(ev, kSigma = 3)
        .select("event_type", "med_bucket", "mad_bucket", "n_anomalies")
        .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      for (t <- types) {
        val vs = rows.collect { case (_, `t`, v) => v }
        val m = interpMedian(vs)
        val d = interpMedian(vs.map(v => math.abs(v - m)))
        val flagged = vs.count(v => math.floor(math.abs(v - m) * 1e6 + 0.5).toLong >
          3 * math.floor(d * 1e6 + 0.5).toLong)
        assert(gotExact(t) == ((t, math.floor(m * 1e6 + 0.5).toLong,
          math.floor(d * 1e6 + 0.5).toLong, flagged.toLong)),
          s"trial $trial type $t exact")
        val bs = vs.map(v => math.floor(v).toLong)
        val mb = lowerMedian(bs)
        val db = lowerMedian(bs.map(b => math.abs(b - mb)))
        val fb = bs.count(b => math.abs(b - mb) > 3 * db)
        assert(gotHist(t) == ((t, mb, db, fb.toLong)),
          s"trial $trial type $t hist")
      }
    }
  }

  test("zipf slope equals the in-memory fixed-point OLS on random corpora") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val vocab = (1 to 30).map(i => s"w$i")
      val docs = (1L to 20L).map { id =>
        val n = 3 + rnd.nextInt(40)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
          "en", "s", 0L)
      }
      val topN = 2 + rnd.nextInt(25)
      val got = graft.operators.TextOps.zipfSlope(
          docs.toDF("doc_id", "text", "lang", "source", "n_chars"), topN)
        .select("n_ranks", "slope_fp", "intercept_fp")
        .as[(Long, Long, Long)].head()
      // model: count, rank deterministically (freq desc, token asc), OLS
      val freqs = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (t, xs) => (t, xs.size.toLong) }.toSeq
        .sortBy { case (t, f) => (-f, t) }.take(topN)
      val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
        (math.floor(math.log(i + 1.0) * 1e6 + 0.5).toLong,
         math.floor(math.log(f.toDouble) * 1e6 + 0.5).toLong)
      }
      val nn = pts.length.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (nn * sxy - sx * sy).toDouble / (nn * sxx - sx * sx).toDouble
      val want = (nn, math.floor(slope * 1e6 + 0.5).toLong,
        math.floor((sy.toDouble - slope * sx.toDouble) / nn * 1e6 + 0.5).toLong)
      assert(got == want, s"trial $trial topN=$topN")
    }
  }

  test("keepBestPerCluster equals a brute arg-max on random assignments") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(40)
      val assign = (1L to n.toLong).map(i => (i, 1L + rnd.nextInt(6)))
      val docs = (1L to n.toLong).map(i => (i, rnd.nextInt(10).toLong))
      val sizes = docs.toMap
      val want = assign.groupBy(_._2).flatMap { case (_, members) =>
        val keeper = members.map(_._1)
          .maxBy(id => (sizes(id), -id))
        members.map { case (id, _) => id -> (keeper, id != keeper) }
      }
      val gotFull = CorpusOps.keepBestPerCluster(
          assign.toDF("doc_id", "cluster_id"), docs.toDF("doc_id", "n_chars"))
        .select("doc_id", "keeper_id", "dropped")
        .as[(Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(gotFull == want, s"trial $trial")
    }
  }

  test("repetition signals equal a brute-force model on random token docs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = (1L to 30L).map { id =>
      val n = 2 + rnd.nextInt(18) // ≥2 tokens → at least one 2-gram
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
        "en", "s", 0L)
    }
    val got = graft.operators.TextOps.repetitionSignals(
        docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    val want = docs.map { case (id, text, _, _, _) =>
      val g2 = text.split(" ").toSeq.sliding(2).map(_.mkString(" ")).toSeq
      val n = g2.size.toLong; val d = g2.distinct.size.toLong
      val ppm = (n - d) * 1000000L / n
      id -> ((n, d, g2.groupBy(identity).values.map(_.size).max.toLong,
              ppm, ppm < graft.operators.TextOps.DefaultDupPpmThreshold))
    }.toMap
    assert(got == want)
  }

  test("temperature sampling conserves budget and orders shares by size") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 6) {
      val sizes = (0 until 2 + rnd.nextInt(6)).map(i =>
        s"s$i" -> (1 + rnd.nextInt(200)))
      var id = 0L
      val docs = sizes.flatMap { case (src, n) =>
        (1 to n).map { _ => id += 1; (id, s"t$id", "en", src, 1L) }
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val budget = 1L + rnd.nextInt(100)
      val out = CorpusOps.sampleTemperature(docs, budget).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                   r.getLong(4), r.getLong(5)))
      assert(out.map(_._4).sum <= budget)                 // Σ targets ≤ budget
      assert(out.forall(r => r._6 <= r._2))               // sampled ≤ size
      assert(out.forall(r => r._5 <= 1000000L))           // rate is a ppm
      val bySize = out.sortBy(_._2)
      assert(bySize.map(_._3).sameElements(bySize.map(_._3).sorted),
        s"shares must be monotone in source size: $bySize")
    }
  }

  test("salted join equals plain join on random frames, inner and left") {
    import graft.operators.SkewOps
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 6) {
      // null keys and duplicate small-side keys are the shapes the fixed
      // fixture (and the oracle query) never exercises
      val large = Seq.fill(200)((
        if (rnd.nextInt(10) == 0) Option.empty[Long]
        else Some(rnd.nextInt(8).toLong), rnd.nextInt(100)))
        .toDF("k", "v")
      val small = ((0 to 4).map(i => (Option(i.toLong), s"n$i")) :+
        (Option(2L), "dup")).toDF("k", "name")
      for (jt <- Seq("inner", "left")) {
        // multiset compare (sorted seqs, not sets): duplicate rows are
        // near-certain here, and a dropped-or-doubled duplicate is exactly
        // the failure a buckets off-by-one would produce
        def rows(df: org.apache.spark.sql.DataFrame) = df
          .select("k", "v", "name").collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
        val plain = rows(large.join(small, Seq("k"), jt))
        val salted = rows(SkewOps.saltedJoin(large, small, "k", buckets = 4, jt))
        assert(salted == plain, s"trial $trial $jt")
      }
    }
  }

  test("upsert equals latest-wins on random newer-than-current batches") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2025-01-$day%02d 00:00:00")
    for (trial <- 1 to 6) {
      val keys = (1 to 12).map(i => s"obj_$i")
      val current = keys.map(k =>
        (rnd.nextLong().abs, "m", k, 4L, ts(1), s"e-$k", "text/plain",
         ts(1 + rnd.nextInt(5)), "success"))
        .toDF("id", "mapping_id", "object_name", "size", "last_modified",
              "etag", "content_type", "last_synced", "sync_status")
      // updates: random subset of keys, strictly newer last_synced
      val updates = rnd.shuffle(keys).take(1 + rnd.nextInt(keys.size))
        .map(k => (0L, "m", k, 5L, ts(10), s"new-$k", "text/plain",
                   ts(10 + rnd.nextInt(5)), "success"))
        .toDF("id", "mapping_id", "object_name", "size", "last_modified",
              "etag", "content_type", "last_synced", "sync_status")
      val a = graft.operators.SyncOps.ledgerUpsert(current, updates)
      val b = graft.operators.SyncOps.ledgerLatestWins(current, updates)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"trial $trial")
    }
  }

  /** Brute-force duplicated-span model: duplicated n-windows (second
    * occurrence anywhere), fused when starts are ≤ n apart.
    */
  private def bruteSpans(docs: Seq[(Long, String)], n: Int
                        ): Set[(Long, Long, Long, Long, Long)] = {
    val wins = docs.flatMap { case (id, text) =>
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (0 to tk.length - n).map(i => (id, i.toLong, tk.slice(i, i + n).mkString(" ")))
    }
    val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
    wins.filter(w => counts(w._3) >= 2)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toList
      .flatMap { case (id, ps) =>
        val islands = ps.foldLeft(List.empty[List[Long]]) {
          case (acc @ (cur :: rest), p) if p - cur.head <= n =>
            (p :: cur) :: rest // cur.head is the island's LAST pos (prepend order)
          case (acc, p) => List(p) :: acc
        }
        islands.map { isl =>
          val s = isl.min; val e = isl.max + n - 1
          (id, s, e, e - s + 1, isl.size.toLong)
        }
      }.toSet
  }

  test("duplicated spans equal the brute-force model on random corpora") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "c")
    for (trial <- 1 to 8) {
      // small vocab + short windows force frequent genuine duplicates
      val n = 3
      val docs = (1L to 10L).map { id =>
        val len = 2 + rnd.nextInt(20)
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = graft.operators.TextOps
        .duplicatedSpans(docs.toDF("doc_id", "text"), n).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                   r.getLong(4))).toSet
      assert(got == bruteSpans(docs, n), s"trial $trial docs=$docs")
    }
  }

  test("span trim audit is internally consistent on random corpora") {
    val rnd = new scala.util.Random(99)
    val vocab = Vector("x", "y")
    for (trial <- 1 to 6) {
      val docs = (1L to 8L).map { id =>
        val len = 2 + rnd.nextInt(16)
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val got = graft.operators.TextOps.spanTrimmedDocs(df, 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      got.foreach { case (id, nTok, nTrim, hash) =>
        val len = docs.find(_._1 == id).get._2.split(" ").length.toLong
        assert(nTok == len && nTrim >= 3L && nTrim <= nTok,
          s"trial $trial doc $id")
        // trimmed windows are a subset of the doc: first occurrences of
        // every window in a GLOBALLY unique doc can never be trimmed
      }
      // docs made of one repeated token everywhere (if any) must be
      // trimmed somewhere unless they hold the global first occurrence
      val trimmedIds = got.map(_._1).toSet
      assert(trimmedIds.subsetOf(docs.map(_._1).toSet))
    }
  }

  // ---- stateful streaming operators: random multisets, random trigger
  // splits, arbitrary arrival order — the drained result must equal an
  // independent in-memory model (the order-independence these operators
  // claim in their scaladocs, at property level instead of one fixture).

  import graft.streaming.StreamingOps

  /** Run a stateful op over explicit micro-batches and return the final
    * (max-selector) emission per user as raw rows.
    */
  private def drainBatches[A <: Product : org.apache.spark.sql.Encoder](
      batches: Seq[Seq[A]],
      build: org.apache.spark.sql.Dataset[A] => org.apache.spark.sql.DataFrame)
      : Array[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[A]
    val name = s"prop_drain_${System.nanoTime()}"
    val q = build(mem.toDS()).writeStream.outputMode("update")
      .format("memory").queryName(name).start()
    try batches.foreach { b =>
      if (b.nonEmpty) mem.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).collect()
    spark.catalog.dropTempView(name)
    out
  }

  private def randomEventBatches(rnd: scala.util.Random, users: Int,
                                 events: Int, maxTsUs: Long,
                                 nBatches: Int): Seq[Seq[(Long, Long)]] = {
    val evs = Seq.fill(events)(
      (1L + rnd.nextInt(users), rnd.nextLong(maxTsUs)))
    // shuffled THEN split: arrival order is unrelated to event time
    rnd.shuffle(evs).grouped(math.max(1, evs.size / nBatches)).toSeq
  }

  test("gap-hist state equals the sorted-multiset model on random splits") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val batches = randomEventBatches(rnd, users = 4, events = 40,
        maxTsUs = 5000000L, nBatches = 2 + rnd.nextInt(3))
      val rows = drainBatches[(Long, Long)](batches,
        ds => StreamingOps.gapHistUpdates(spark,
          ds.toDF("user_id", "ts_us").as[StreamingOps.Ev]))
        .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2), r.getSeq[Long](3))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      val model = batches.flatten.groupBy(_._1).map { case (u, evs) =>
        val ts = evs.map(_._2).sorted
        val gaps = ts.zip(ts.tail).map { case (a, b) => (b - a).toString.length.toLong }
        val hist = gaps.groupBy(identity).map { case (d, g) => d -> g.size.toLong }
          .toSeq.sortBy(_._1)
        u -> ((gaps.size.toLong, hist.map(_._1), hist.map(_._2)))
      }
      assert(rows.keySet == model.keySet, s"trial $trial users")
      for (u <- model.keys)
        assert(rows(u)._1 == model(u)._1 && rows(u)._2 == model(u)._2 &&
               rows(u)._3 == model(u)._3, s"trial $trial user $u")
    }
  }

  test("session-length-hist state equals the gap-split model on random splits") {
    val rnd = new scala.util.Random(17)
    val gapUs = 300000L
    for (trial <- 1 to 3) {
      val batches = randomEventBatches(rnd, users = 4, events = 40,
        maxTsUs = 5000000L, nBatches = 2 + rnd.nextInt(3))
      val rows = drainBatches[(Long, Long)](batches,
        ds => StreamingOps.sessionLengthUpdates(spark,
          ds.toDF("user_id", "ts_us").as[StreamingOps.Ev], gapUs))
        .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2), r.getSeq[Long](3))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      val model = batches.flatten.groupBy(_._1).map { case (u, evs) =>
        val ts = evs.map(_._2).sorted
        val sizes = scala.collection.mutable.ArrayBuffer(1L)
        ts.zip(ts.tail).foreach { case (a, b) =>
          if (b - a > gapUs) sizes += 1L else sizes(sizes.size - 1) += 1L
        }
        val hist = sizes.groupBy(identity).map { case (s, g) => s -> g.size.toLong }
          .toSeq.sortBy(_._1)
        u -> ((ts.size.toLong, hist.map(_._1), hist.map(_._2)))
      }
      for (u <- model.keys)
        assert(rows(u) == model(u), s"trial $trial user $u: ${rows(u)} vs ${model(u)}")
    }
  }

  test("funnel state equals the min-per-step model on random splits") {
    val rnd = new scala.util.Random(19)
    val steps = Seq("view", "click", "purchase")
    for (trial <- 1 to 3) {
      val evs = Seq.fill(40)((1L + rnd.nextInt(4),
        rnd.nextLong(5000000L), steps(rnd.nextInt(steps.size))))
      val batches = rnd.shuffle(evs).grouped(14).toSeq
      val rows = drainBatches[(Long, Long, String)](batches,
        ds => StreamingOps.funnelUpdates(spark,
          ds.toDF("user_id", "ts_us", "event_type").as[StreamingOps.EvT],
          steps))
        .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1)._2 }
      val model = evs.groupBy(_._1).map { case (u, es) =>
        u -> steps.map(s =>
          es.filter(_._3 == s).map(_._2).minOption.getOrElse(Long.MaxValue))
      }
      for (u <- model.keys)
        assert(rows(u) == model(u), s"trial $trial user $u")
    }
  }

  test("retention state equals the distinct-day model on random splits") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val evs = Seq.fill(40)((1L + rnd.nextInt(4), rnd.nextInt(60)))
      val batches = rnd.shuffle(evs).grouped(14).toSeq
      val rows = drainBatches[(Long, Int)](batches,
        ds => StreamingOps.retentionUpdates(spark,
          ds.toDF("user_id", "epoch_day").as[StreamingOps.EvD]))
        .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2), r.getSeq[Long](3))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      val model = evs.groupBy(_._1).map { case (u, es) =>
        val days = es.map(_._2).distinct.sorted
        val cohort = days.head
        u -> ((days.size.toLong, cohort,
               days.map(d => ((d - cohort) / 7).toLong).distinct))
      }
      for (u <- model.keys)
        assert(rows(u) == model(u), s"trial $trial user $u")
    }
  }

  test("split quarantine equals the move-rule model on random leaky corpora") {
    // random corpora with planted shared passages (so leaks actually
    // occur); the model recomputes the audit from the operator's own
    // leak report (leak detection carries its own fixture + oracle) +
    // an independent md5 split + the argmax move rule
    def splitOf(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex, 16) % 100
      if (u < 80) "train" else if (u < 90) "valid" else "test"
    }
    val rnd = new scala.util.Random(77)
    var sawLeak = false
    for (trial <- 1 to 4) {
      val n = 20 + rnd.nextInt(25)
      val nShared = 2 + rnd.nextInt(3) // distinct shared passages
      val sharedTexts = (0 until nShared).map(k =>
        (0 to 11).map(j => s"shared${k}tok$j").mkString(" "))
      val docs = (1L to n.toLong).map { i =>
        val t =
          if (rnd.nextInt(3) == 0) sharedTexts(rnd.nextInt(nShared))
          else (0 to 9).map(j => s"u${i}w$j").mkString(" ")
        (i, "en", if (i % 2 == 0) "sA" else "sB", t.length.toLong, t)
      }
      val df = docs.toDF("doc_id", "lang", "source", "n_chars", "text")
      val leaks = CorpusOps.splitLeakage(df)
        .select("train_doc", "heldout_split", "n_shared")
        .as[(Long, String, Long)].collect()
      // argmax rule: max n_shared, ties the lexicographically larger split
      val moves = leaks.groupBy(_._1).map { case (d, rs) =>
        d -> rs.maxBy(r => (r._3, r._2))._2
      }
      val model = docs.groupBy { case (i, _, src, _, _) =>
        (src, moves.getOrElse(i, splitOf(i)))
      }.map { case ((src, split), rows) =>
        (src, split) -> ((rows.length.toLong,
          rows.map(_._5.split("\\s+").count(_.nonEmpty).toLong).sum,
          rows.count(r => moves.contains(r._1)).toLong))
      }
      val got = CorpusOps.splitQuarantine(df)
        .select("source", "split", "n_docs", "n_tokens", "n_quarantined_in")
        .as[(String, String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
      assert(got == model, s"trial $trial: $got vs $model")
      sawLeak ||= leaks.nonEmpty
    }
    assert(sawLeak,
      "fixture degeneracy guard: no trial planted a cross-split leak")
  }

  test("caption savings equals the report recomputed from the drop list " +
       "on random media corpora") {
    import graft.operators.Multimodal
    val rnd = new scala.util.Random(91)
    for (trial <- 1 to 3) {
      val n = 6 + rnd.nextInt(8)
      val docs = (1L to n.toLong).map { i =>
        val t = rnd.nextInt(3) match {
          case 0 => "abcdefgh" * (32 + rnd.nextInt(32)) // periodic: matches
          case 1 => (0 to 30).map(j => s"d${i}t$j").mkString(" ")
          case _ => "aaaaaaaa" * 16 // zero-norm caption: absent → drop
        }
        (i, "en", "s", t.length.toLong, t)
      }
      val df = docs.toDF("doc_id", "lang", "source", "n_chars", "text")
      val verdict = Multimodal.captionDropList(df, threshold = 0.9)
        .select("media_id", "kind", "dropped")
        .as[(Long, String, Boolean)].collect()
      val toks = docs.map(d => d._1 ->
        d._5.split("\\s+").count(_.nonEmpty).toLong).toMap
      val model = verdict.groupBy(_._2).map { case (kind, rows) =>
        val tTot = rows.map(r => toks(r._1)).sum
        val tDrop = rows.filter(_._3).map(r => toks(r._1)).sum
        kind -> ((rows.length.toLong, rows.count(_._3).toLong, tTot, tDrop,
          tDrop * 1000000L / tTot))
      }
      val got = Multimodal.captionSavings(df, threshold = 0.9)
        .select("kind", "n_docs", "n_dropped", "tokens_total",
                "tokens_dropped", "savings_ppm")
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      assert(got == model, s"trial $trial: $got vs $model")
    }
  }
}
