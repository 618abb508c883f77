package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spec.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
    (2L, "the quick brown fox jumps over the lazy cat", "en", "s", 43L), // near-dup of 1
    (3L, "der schnelle braune fuchs und der faule hund", "de", "s", 44L),
    (4L, "el zorro y la casa que los es", "es", "s", 29L),
    (5L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L)  // exact dup of 1
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("zipf slope recovers the exponent of a planted power-law corpus") {
    // token t{i} appears floor(240/i) times, i = 1..40 — frequencies
    // proportional to 1/rank, so the ln-ln OLS slope must sit near -1
    val text = (1 to 40).flatMap(i => Seq.fill(240 / i)(s"t$i")).mkString(" ")
    val corpus = Seq((1L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (n, slopeFp, interceptFp) = TextOps.zipfSlope(corpus, topN = 40)
      .select("n_ranks", "slope_fp", "intercept_fp")
      .as[(Long, Long, Long)].head()
    assert(n == 40)
    // independent model: identical fixed-point OLS in plain Scala
    val freqs = (1 to 40).map(i => 240 / i).sortBy(-_)
    val pts = freqs.zipWithIndex.map { case (f, i) =>
      (math.floor(math.log(i + 1.0) * 1e6 + 0.5).toLong,
       math.floor(math.log(f.toDouble) * 1e6 + 0.5).toLong)
    }
    val nn = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (nn * sxy - sx * sy).toDouble / (nn * sxx - sx * sx).toDouble
    assert(slopeFp == math.floor(slope * 1e6 + 0.5).toLong)
    assert(interceptFp ==
      math.floor((sy.toDouble - slope * sx.toDouble) / nn * 1e6 + 0.5).toLong)
    // the planted exponent: floor(240/i) stays within ~6% of 240/i over
    // i ≤ 40, so the fitted slope lands in a tight band around -1
    assert(slopeFp > -1100000L && slopeFp < -900000L, s"slope_fp=$slopeFp")
  }

  test("zipf fit on a degenerate vocabulary yields explicit nulls, not NaN") {
    // a single distinct token -> one rank -> n*sxx - sx*sx = 0: the fit is
    // undefined and must surface as (n_ranks=1, null, null) — a NaN-born
    // null that skipped the guard would differ engine-to-engine
    val corpus = Seq((1L, "same same same same", "en", "s", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val row = TextOps.zipfSlope(corpus, topN = 40)
      .select("n_ranks", "slope_fp", "intercept_fp").head()
    assert(row.getLong(0) == 1L)
    assert(row.isNullAt(1) && row.isNullAt(2))
  }

  test("exact dedup groups identical content") {
    val r = TextOps.dedupExact(docs)
      .select("keeper_doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(r.contains((1L, 2L)))            // docs 1 and 5 collapse to keeper 1
    assert(r.count(_._2 == 1L) == 3)
  }

  test("ngram jaccard finds the near-duplicate pair") {
    val pairs = TextOps.ngramJaccardPairs(docs, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))        // one word differs → high overlap
    assert(pairs.contains((1L, 5L)))        // identical
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // german unrelated
  }

  test("ngram jaccard hot-shingle cap bounds per-key join cardinality") {
    // 40 docs that share ONLY one boilerplate shingle ("common filler words")
    // plus a genuine near-dup pair; with maxDf=8 the boilerplate key is
    // dropped before the self-join, so the 40×39/2 candidate pairs it would
    // generate never exist, while the real pair still surfaces.
    val boiler = (10L until 50L).map(i =>
      (i, s"common filler words unique$i token$i phrase$i", "en", "s", 40L))
    val dups = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s", 35L),
      (2L, "alpha beta gamma delta epsilon eta", "en", "s", 34L))
    val corpus = (dups ++ boiler).toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = TextOps.ngramJaccardPairs(corpus, 0.3, maxDf = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 >= 10L), s"boilerplate-only pairs: $pairs")
  }

  test("minhash candidates include exact and near duplicates") {
    val pairs = TextOps.minhashCandidates(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)))        // identical signature always collides
    assert(!pairs.contains((3L, 4L)))
  }

  test("incremental dedup keeps only history-unseen, unshadowed batch docs") {
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "der schnelle braune fuchs und der faule hund"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // exact in history
      (11L, "the quick brown fox jumps over the lazy cat"), // near-dup of history
      (12L, "completely fresh content about weather patterns in spring"),
      (13L, "completely fresh content about weather patterns in spring"), // in-batch dup of 12
      (14L, "unrelated musings on distributed query execution engines"))
      .toDF("doc_id", "text")
    val got = TextOps.incrementalDedupSurvivors(history, batch)
      .select("doc_id").as[Long].collect().toSet
    // 10 exact-dropped; 11 band-collides with history doc 1; 13 is the
    // same hash as 12 (not first-in-batch); 12 and 14 survive
    assert(got == Set(12L, 14L))
  }

  test("scored minhash pairs: exact dup scores k/k, banded pairs >= k/bands") {
    val scored = TextOps.minhashScoredPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // same pair set as the unscored candidates
    val cand = TextOps.minhashCandidates(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(scored.keySet == cand)
    // docs 1 and 5 are bit-identical → all 8 signatures agree, ppm = 1e6
    assert(scored((1L, 5L)) == ((8L, 1000000L)))
    // a banded pair shares at least one whole band of k/bands signatures
    assert(scored.values.forall { case (m, ppm) =>
      m >= 2L && ppm == m * 1000000L / 8L })
  }

  test("simhash of identical docs is identical, near-dups within distance") {
    val h = graft.operators.TextOps.withSimhash(docs)
      .as[(Long, Int)].collect().toMap
    assert(h(1L) == h(5L))
    val hamming = Integer.bitCount(h(1L) ^ h(2L))
    assert(hamming <= 6, s"near-dup hamming $hamming too large")
  }

  test("lang id picks marker-bearing language") {
    val r = TextOps.langId(docs)
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(r(1L) == "en" && r(3L) == "de" && r(4L) == "es")
  }

  test("quality score is bounded and higher for stopword-rich text") {
    val r = TextOps.qualityScore(docs)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(r.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("token fertility matches a brute-force regex recount, zero-word safe") {
    val d = Seq(
      (1L, "hello world", "en", "s", 11L),          // 2 words, 2 subwords
      (2L, "don't stop-me now", "en", "s", 17L),    // punct splits subwords
      (3L, "!!!", "xx", "s", 3L),                   // words=1, bpe=3
      (4L, "", "zz", "s", 0L)                       // zero words → null ppm
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.tokenFertility(d).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    val bpe = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
    def counts(texts: Seq[String]) = {
      val w = texts.map(_.split("\\s+").count(_.nonEmpty)).sum.toLong
      val b = texts.map(t => bpe.findAllIn(t.toLowerCase).size).sum.toLong
      (w, b, if (w == 0) -1L else b * 1000000L / w)
    }
    assert(got("en") == counts(Seq("hello world", "don't stop-me now")))
    assert(got("xx") == counts(Seq("!!!")))
    assert(got("zz") == ((0L, 0L, -1L))) // null fertility, not an error
  }

  test("qualityScoreExpr mirrors qualityScore's composite exactly") {
    val viaExpr = docs.select(col("doc_id"),
      TextOps.qualityScoreExpr.as("q")).as[(Long, Double)].collect().toMap
    val viaScore = TextOps.qualityScore(docs)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(viaExpr == viaScore) // bit-for-bit, not approx — the gate's
                                // fixed point rides this equality
  }

  test("cleanGate equals the declarative lang+quality predicate row-for-row") {
    // real corpus: every doc, several thresholds and languages — the gate
    // must keep EXACTLY the declarative chain's rows (the formulas live in
    // two places by necessity; this equality is the contract)
    val real = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    for (minQ <- Seq(0.0, 0.3, 0.45, 0.62, 0.9); lang <- Seq("en", "de")) {
      val declarative = real.filter(
          TextOps.predictedLangExpr === lang &&
          TextOps.qualityScoreExpr >= minQ)
        .select("doc_id").as[Long].collect().toSet
      val viaGate = real.filter(TextOps.cleanGate(minQ, lang))
        .select("doc_id").as[Long].collect().toSet
      assert(viaGate == declarative, s"minQ=$minQ lang=$lang")
    }
    // adversarial edges: empty text, whitespace-only, punct-heavy, unicode
    // (lowercase-changes-length İ), ties across profiles, null text
    val edge = Seq(
      (1L, "", "x"), (2L, "   \t\n ", "x"), (3L, "!!! ??? ;;; :::", "x"),
      (4L, "the la", "x"),                    // en/es tie → first profile (en)
      (5L, "İstanbul the of and is a", "x"), // lowered length grows
      (6L, null.asInstanceOf[String], "x"),
      (7L, "the \u000Bof \u00A0is", "x"), // VT is regex \s; NBSP is NOT
      (8L, "𝕥𝕙𝕖 the of is a and", "x")       // supplementary chars
    ).toDF("doc_id", "text", "lang")
    for (minQ <- Seq(0.0, 0.35, 0.5)) {
      val declarative = edge.filter(
          TextOps.predictedLangExpr === "en" &&
          TextOps.qualityScoreExpr >= minQ)
        .select("doc_id").as[Long].collect().toSet
      val viaGate = edge.filter(TextOps.cleanGate(minQ))
        .select("doc_id").as[Long].collect().toSet
      assert(viaGate == declarative, s"edge minQ=$minQ")
    }
  }

  test("percentile gate keeps the exact-rank top pct per language, ties keep") {
    // en: 4 docs with 3 distinct scores; de/es: singletons
    val d = Seq(
      (1L, "the of and to in is it on for a", "en", "s", 31L),
      (2L, "the of and to in is it on for a", "en", "s", 31L), // tie with 1
      (3L, "zz qq ww", "en", "s", 8L),
      (4L, "the the the and and of of is a to in it on for", "en", "s", 47L),
      (5L, "der und die ist das", "de", "s", 19L),
      (6L, "el la que los es", "es", "s", 16L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val gate = TextOps.qualityPercentileGate(d, pct = 50)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // brute force: per lang, r = ceil(n*0.5); threshold = r-th best score;
    // kept = all docs scoring >= threshold (ties keep)
    val scored = d.withColumn("q_fp",
        floor(TextOps.qualityScoreExpr * 1e6 + lit(0.5)).cast("long"))
      .select("lang", "q_fp").as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted.reverse }
    scored.foreach { case (lang, desc) =>
      val r = math.ceil(desc.length * 50 / 100.0).toLong.toInt
      val thr = desc(r - 1)
      val kept = desc.count(_ >= thr).toLong
      assert(gate(lang) == ((thr, desc.length.toLong, kept)),
        s"lang=$lang expected (thr=$thr, n=${desc.length}, kept=$kept), " +
          s"got ${gate(lang)}")
    }
    // the en tie really exercises ties-keep: docs 1 and 2 share a score
    assert(gate("en")._3 >= 2)

    // the drop list is the gate's complement: exactly the docs strictly
    // below their language's threshold — threshold ties never dropped
    val dropped = TextOps.qualityGateDropList(d, pct = 50)
      .select("doc_id").as[Long].collect().toSet
    val perDoc = d.withColumn("q_fp",
        floor(TextOps.qualityScoreExpr * 1e6 + lit(0.5)).cast("long"))
      .select("doc_id", "lang", "q_fp").as[(Long, String, Long)].collect()
    val thrByLang = scored.map { case (l, desc) =>
      l -> desc(math.ceil(desc.length * 50 / 100.0).toInt - 1) }
    val expectDrop = perDoc.collect {
      case (id, l, q) if q < thrByLang(l) => id }.toSet
    assert(dropped == expectDrop, s"dropped=$dropped expected=$expectDrop")
    // kept + dropped partition the corpus per language
    assert(dropped.size + scored.map { case (l, desc) =>
      desc.count(_ >= thrByLang(l)) }.sum == 6)
  }

  test("repetition signals match a brute-force recount") {
    val rep = Seq(
      (1L, "spam spam spam spam spam and more spam", "en", "s", 38L),
      (2L, "a perfectly varied sentence with no repeats at all", "en", "s", 50L),
      (3L, "one token", "en", "s", 9L),
      (4L, "solo", "en", "s", 4L) // <2 tokens → no 2-grams → absent
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.repetitionSignals(rep).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    val expected = Seq(
      (1L, "spam spam spam spam spam and more spam"),
      (2L, "a perfectly varied sentence with no repeats at all"),
      (3L, "one token")
    ).map { case (id, text) =>
      val g2 = text.toLowerCase.split("\\s+").toSeq.sliding(2).map(_.mkString(" ")).toSeq
      val n = g2.size.toLong
      val d = g2.distinct.size.toLong
      val top = g2.groupBy(identity).values.map(_.size).max.toLong
      val ppm = (n - d) * 1000000L / n
      id -> ((n, d, top, ppm, ppm < TextOps.DefaultDupPpmThreshold))
    }.toMap
    assert(got == expected) // doc 4 absent from both: nothing to judge
    // the degenerate doc is the one the gate drops
    assert(!got(1L)._5 && got(2L)._5)
  }

  test("vocab coverage counts occurrences of the top-N vocab exactly") {
    val d = Seq(
      (1L, "x x x y z", "en", "s", 9L),
      (2L, "x y q", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // vocab top-2 by (freq desc, token asc): x(4), y(2); covered = 6 of 8
    val r = TextOps.vocabCoverage(d, topN = 2).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((8L, 6L, 750000L, 250000L)))
  }

  test("fingerprint is stable for identical content") {
    val fp = TextOps.fingerprint(docs)
      .select("doc_id", "content_hash").as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(5L) && fp(1L) != fp(2L))
  }

  test("contamination finds planted overlap and ignores clean docs") {
    val bench = Seq((100L, "the secret benchmark answer is forty two exactly"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains a 5-token window of the benchmark → ≥3 shared shingles
      (1L, "prefix words the secret benchmark answer is forty then more"),
      (2L, "completely unrelated content about weather patterns today"))
      .toDF("doc_id", "text")
    val hits = TextOps.contamination(corpus, bench, minShared = 3)
      .select("doc_id", "bench_doc_id").as[(Long, Long)].collect()
    assert(hits.toSeq == Seq((1L, 100L)))
  }

  test("contamination fraction counts shared shingles exactly per doc") {
    val bench = Seq((100L, "the secret benchmark answer is forty two exactly"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // 10 tokens → 8 shingles; "the secret benchmark answer is forty"
      // contributes 4 shingles present in the benchmark
      (1L, "prefix words the secret benchmark answer is forty then more"),
      (2L, "completely unrelated content about weather patterns today"))
      .toDF("doc_id", "text")
    val got = TextOps.contaminationFraction(corpus, bench).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(got(1L) == ((8L, 4L, 4L * 1000000L / 8L, true)))
    assert(got(2L)._2 == 0L && got(2L)._3 == 0L && !got(2L)._4)
  }

  test("dup span fraction counts spans shared with OTHER docs only") {
    val docs = Seq(
      // docs 1 and 2 share the 4-token window "one two three four"
      // → 2 shared 3-shingles each
      (1L, "one two three four alpha beta"),   // 4 spans, 2 shared
      (2L, "zz one two three four"),           // 3 spans, 2 shared
      // doc 3 repeats ITS OWN span; distinct-per-doc must not count it
      // as duplicated (nothing shared with other docs)
      (3L, "pq rs tu pq rs tu"),
      (4L, "xx yy"))                           // < 3 tokens → no row
      .toDF("doc_id", "text")
    val got = TextOps.dupSpanFraction(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ((4L, 2L, 500000L)))
    assert(got(2L) == ((3L, 2L, 2L * 1000000L / 3L)))
    // "pq rs tu" appears twice in doc 3 but in no other doc: 3 distinct
    // spans ("pq rs tu", "rs tu pq", "tu pq rs"), zero duplicated
    assert(got(3L) == ((3L, 0L, 0L)))
    assert(!got.contains(4L))
  }

  test("length floor drops exactly the shortest n*pct div 100 per source") {
    val docs = Seq(
      // web: lengths 1,2,3,4,5 → pct=40 drops k = 5*40 div 100 = 2
      (1L, "a", "web"), (2L, "a b", "web"), (3L, "a b c", "web"),
      (4L, "a b c d", "web"), (5L, "a b c d e", "web"),
      // books: 2 docs → k = 0, nothing dropped
      (6L, "x", "books"), (7L, "x y", "books"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.lengthFloor(docs, pct = 40).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map("web" -> ((5L, 2L, 3L)), "books" -> ((2L, 0L, 1L))))
  }

  test("cross-source matrix counts candidate pairs by unordered source pair") {
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, txt, "web"), (2L, txt, "mirror"),   // cross-source pair
      (3L, txt, "mirror"),                     // pairs with 1 (cross) & 2 (within)
      (4L, "unrelated totally different words here", "web"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.crossSourceDupMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // 3 pairs total: (1,2) mirror-web, (1,3) mirror-web, (2,3) mirror-mirror
    assert(got == Map(("mirror", "web") -> ((2L, 666666L)),
                      ("mirror", "mirror") -> ((1L, 333333L))))
  }

  test("explodeParagraphs splits on blank lines, trims, drops empties") {
    val docs = Seq(
      (1L, "first para here\n\n  second para  \n\n\n\nthird"),
      (2L, "single paragraph no separators"),
      (3L, "\n\n\n\n")) // only separators → no paragraphs at all
      .toDF("doc_id", "text")
    val got = TextOps.explodeParagraphs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, 0L, "first para here"), (1L, 1L, "second para"), (1L, 2L, "third"),
      (2L, 0L, "single paragraph no separators")))
  }

  test("paragraph near-dup finds cross-doc boilerplate doc-level minhash misses") {
    // shared footer is 1/3 of each doc — doc-level jaccard too low to band-
    // collide, but the footer PARAGRAPHS are identical
    val footer = "copyright acme corp all rights reserved contact us here"
    val docs = Seq(
      (1L, s"alpha bravo charlie delta echo foxtrot golf hotel\n\n$footer"),
      (2L, s"india juliett kilo lima mike november oscar papa\n\n$footer"))
      .toDF("doc_id", "text")
    val paras = TextOps.explodeParagraphs(docs)
      .select((col("doc_id") * TextOps.ParaIdShift + col("para_idx"))
                .as("para_id"),
              col("para_text"))
    val pairs = TextOps.paragraphNearDupes(paras).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pairs.toSet == Set((1L, 1L, 2L, 1L))) // the two footers, nothing else
    // doc-level minhash on the same corpus reports no candidate pair
    assert(TextOps.minhashCandidates(docs).count() == 0L)
  }

  test("chunkParagraphs windows are non-overlapping and cover every token") {
    val docs = Seq((7L, (1 to 70).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextOps.chunkParagraphs(docs, chunkTokens = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length == 3) // ceil(70/32)
    assert(got.map(_._3).toSet == Set(0L, 1L, 2L))
    assert(got.forall { case (pid, d, i, _) =>
      d == 7L && pid == 7L * TextOps.ParaIdShift + i })
    val texts = got.sortBy(_._3).map(_._4)
    assert(texts(0).startsWith("w1 w2 ") && texts(1).startsWith("w33 ") &&
           texts(2) == (65 to 70).map(i => s"w$i").mkString(" "))
  }

  test("exact-substring contamination needs a verbatim n-token run") {
    val run13 = (1 to 13).map(i => s"t$i").mkString(" ")
    val corpus = Seq(
      (1L, s"pre1 pre2 $run13 post1"),            // verbatim 13-run → flagged
      (2L, (1 to 12).map(i => s"t$i").mkString(" ") + " different tail"),
      (3L, "wholly unrelated words nothing shared with the benchmark at all"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"bench lead $run13 bench tail"))
      .toDF("doc_id", "text")
    val got = TextOps.exactSubstringContamination(corpus, bench).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L)) // doc 2's longest shared run is 12 tokens
  }

  test("contamination report attributes leaks per suite and source") {
    val runA = (1 to 13).map(i => s"a$i").mkString(" ")
    val runB = (1 to 13).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, "s1", s"u1 u2 $runA u3"),          // leaks suite A only
      (2L, "s1", s"$runA v1 $runB v2"),       // leaks BOTH suites
      (3L, "s2", "clean words nothing shared with any benchmark at all ok"),
      (4L, "s2", s"w1 $runB w2"))             // leaks suite B only
      .toDF("doc_id", "source", "text")
    val bench = Seq(
      (100L, "suite_A", s"lead $runA tail"),
      (101L, "suite_B", s"lead $runB tail"))
      .toDF("doc_id", "suite", "text")
    val got = TextOps.exactContaminationReport(corpus, bench).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // unique surrounding tokens → exactly the embedded window matches, so
    // window hits count docs; src totals include the clean doc 3
    assert(got == Map(
      ("suite_A", "s1") -> ((2L, 2L, 2L, 1000000L)),
      ("suite_B", "s1") -> ((1L, 1L, 2L, 500000L)),
      ("suite_B", "s2") -> ((1L, 1L, 2L, 500000L))))
  }

  test("duplicated spans fuse overlapping windows into maximal runs") {
    val run = (1 to 15).map(i => s"r$i").mkString(" ") // 15-token shared run
    val docs = Seq(
      (1L, s"a1 a2 a3 $run z1 z2"),   // run at token offset 3
      (2L, s"$run b1 b2 b3 b4 b5"),   // run at offset 0
      (3L, "nothing duplicated here at all in this document text"))
      .toDF("doc_id", "text")
    val got = TextOps.duplicatedSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet
    // 15-token run ⇒ 3 overlapping 13-windows ⇒ ONE span of 15 tokens
    assert(got == Set((1L, 3L, 17L, 15L, 3L), (2L, 0L, 14L, 15L, 3L)))
  }

  test("span trim keeps the first occurrence and trims the later one") {
    val run = (1 to 15).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $run z1 z2"),  // first occurrence (doc 1 < doc 2)
      (2L, s"$run b1 b2 b3 b4 b5"))  // later occurrence → trimmed
      .toDF("doc_id", "text")
    val got = TextOps.spanTrimmedDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("b1 b2 b3 b4 b5".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got.toSet == Set((2L, 20L, 15L, md))) // doc 1 untouched
  }

  test("vocab growth credits each distinct shingle to its first decile") {
    val docs = (0L to 9L).map { i =>
      val text = i match {
        case 0 => "a b c d"  // shingles "a b c", "b c d" — both new
        case 5 => "a b c x"  // "a b c" seen, "b c x" new
        case _ => "zz yy"    // too short to shingle
      }
      (i, text)
    }.toDF("doc_id", "text")
    val got = TextOps.vocabGrowth(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 2L, 2L), (5L, 1L, 3L)))
  }

  test("length quantiles sit at the exact per-source rank") {
    // source s: lengths 1..10 → p50 = rank 5 → 5 tokens; p90 = rank 9;
    // p99 = rank ceil(9.9) = 10
    val docs = (1L to 10L).map(i => (i, (1L to i).map(j => s"w$j").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.lengthQuantiles(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(("s", 50L) -> 5L, ("s", 90L) -> 9L, ("s", 99L) -> 10L))
  }

  test("candidate degree histogram restores zero-degree docs") {
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, same), (2L, same), (3L, same),  // clique of 3 → degree 2 each
      (4L, "totally different words in this document right here"),
      (5L, "and a third unrelated set of tokens making no pairs"))
      .toDF("doc_id", "text")
    val got = TextOps.candidateDegreeHistogram(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 2L -> 3L))
    assert(got.values.sum == 5L) // sums to the corpus
  }

  test("ngram LM counts rank next tokens per context with exact ppm") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b d"), (4L, "x y z"))
      .toDF("doc_id", "text")
    val got = TextOps.ngramLmCounts(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      ("a b", "c", 2L, 3L, 1L, 666666L),
      ("a b", "d", 1L, 3L, 2L, 333333L),
      ("x y", "z", 1L, 1L, 1L, 1000000L)))
  }

  test("rarity score is the integer mean of 1e6 div df over distinct tokens") {
    val docs = Seq(
      (1L, "common rare1"),        // df(common)=3, df(rare1)=1
      (2L, "common rare2 rare2"),  // distinct tokens only: common, rare2
      (3L, "common"))
      .toDF("doc_id", "text")
    val got = TextOps.rarityScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val wCommon = 1000000L / 3
    assert(got(1L) == ((2L, (wCommon + 1000000L) / 2)))
    assert(got(2L) == ((2L, (wCommon + 1000000L) / 2)))
    assert(got(3L) == ((1L, wCommon)))
  }

  test("boilerplate chunks flag cross-doc repeats and scrub keeps the rest") {
    // one full 32-token chunk shared by docs 1 and 2 (their second chunks
    // differ); doc 3 is all-unique and must survive the scrub untouched
    val shared = (1 to 32).map("t" + _).mkString(" ")
    val docs = Seq(
      (1L, shared + " ua1 ua2 ua3 ua4 ua5"),
      (2L, shared + " ub1 ub2 ub3"),
      (3L, (1 to 40).map("u" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val boiler = TextOps.boilerplateChunks(docs).collect()
    assert(boiler.length == 1)
    val b = boiler.head
    assert(b.getLong(b.fieldIndex("n_docs")) == 2L &&
           b.getLong(b.fieldIndex("n_occurrences")) == 2L &&
           b.getLong(b.fieldIndex("example_doc_id")) == 1L)
    val scrub = TextOps.boilerplateScrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(scrub(1L) == ((2L, 1L, 5L)))   // boiler chunk gone, 5 uniques kept
    assert(scrub(2L) == ((2L, 1L, 3L)))
    assert(scrub(3L) == ((2L, 0L, 40L)))  // nothing repeated, all 40 kept
  }

  test("doc lm score is the floored fixed-point bigram MLE average") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    // unigrams a:3 b:2 c:1; bigrams "a b":2 "a c":1
    val got = TextOps.docLmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((1L, 2000000000L / 3)))
    assert(got(2L) == ((1L, 2000000000L / 3)))
    assert(got(3L) == ((1L, 1000000000L / 3)))
  }

  test("bloom-prefiltered decontamination is bit-identical to exact") {
    // 9-token docs → n=3 windows exist; a deliberately tiny 64-bit bloom
    // forces heavy false-positive collisions, which the exact verify join
    // must remove — outputs stay identical to the exact operator
    val corpus = docs.filter(col("doc_id") % 2 =!= 0)
    val bench = docs.filter(col("doc_id") % 2 === 0)
    val exact = TextOps.exactSubstringContamination(corpus, bench, n = 3)
      .as[(Long, Long)].collect().toSet
    val viaBloom = TextOps.exactContaminationBloom(corpus, bench, n = 3,
        mBits = 64)
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)                // fixture shares 3-token runs
    assert(viaBloom == exact)
  }

  test("winnowing: a shared run of >= w+k-1 tokens ALWAYS pairs, and " +
       "fingerprints equal an in-memory model") {
    import spark.implicits._
    // k=3, w=4 → guarantee threshold w+k-1 = 6 tokens. Docs 1 and 2
    // share exactly a 6-token run embedded in different contexts; docs
    // 3/4 share nothing 6 tokens long.
    val run = "alpha bravo charlie delta echo foxtrot"
    val docs = Seq(
      (1L, s"intro words here $run and a tail"),
      (2L, s"$run completely different ending text now"),
      (3L, "one two three four five six seven eight nine"),
      (4L, "ten eleven twelve thirteen fourteen fifteen sixteen"))
      .toDF("doc_id", "text")
    val pairs = TextOps.winnowedPairs(docs, minShared = 1)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 2L)),
      "the SIGMOD'03 guarantee: a >= w+k-1 token run must share a fingerprint")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L || p._2 == 4L),
      s"no 6-token overlap may pair: $pairs")

    // fingerprint selection equals an in-memory winnow (md5 hex strings,
    // lexicographic window min over FULL windows only)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def winnow(text: String, k: Int = 3, w: Int = 4): Set[String] = {
      val t = "\\S+".r.findAllIn(text.toLowerCase).toSeq
      val hs = t.sliding(k).filter(_.size == k)
        .map(g => md5hex(g.mkString(" "))).toSeq
      hs.sliding(w).filter(_.size == w).map(_.min).toSet
    }
    val wantShared = (winnow(s"intro words here $run and a tail")
      & winnow(s"$run completely different ending text now")).size
    val got = TextOps.winnowedPairs(docs, minShared = 1)
      .as[(Long, Long, Long)].collect()
      .find(p => p._1 == 1L && p._2 == 2L).get._3
    assert(got == wantShared.toLong,
      s"shared fingerprint count $got != model $wantShared")
  }

  test("winnowedFingerprintSet (native expression) equals the in-memory " +
       "model per doc and is empty below w full windows") {
    import spark.implicits._
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def model(text: String, k: Int = 3, w: Int = 4): Set[String] = {
      val t = "\\S+".r.findAllIn(text.toLowerCase).toSeq
      val hs = t.sliding(k).filter(_.size == k)
        .map(g => md5hex(g.mkString(" "))).toSeq
      hs.sliding(w).filter(_.size == w).map(_.min).toSet
    }
    val texts = Seq(
      "The Quick brown fox JUMPS over the lazy dog today",
      "alpha alpha alpha alpha alpha alpha",  // constant grams -> 1 fp
      "a b c d e f",                          // exactly one full window
      "a b c d e",                            // k=3 -> 3 grams < w -> empty
      "a b",                                  // no grams at all
      "")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select($"doc_id", TextOps.winnowedFingerprintSet($"text").as("fps"))
      .as[(Long, Seq[String])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val fps = got(i.toLong)
      assert(fps.toSet == model(t), s"doc $i fingerprint drift")
      assert(fps.distinct == fps, s"doc $i emitted duplicate fingerprints")
    }
  }

  test("winnowed decontamination certainly flags a leaked >= w+k-1 run " +
       "and never flags disjoint text") {
    // the guarantee the shingle-count screens lack: a verbatim >= 6-token
    // (w+k-1) eval passage INSIDE a longer training doc must share a
    // fingerprint with the benchmark doc, however diluted
    val run = "alpha bravo charlie delta echo foxtrot"
    val corpus = Seq(
      (1L, s"training doc padding starts here $run and keeps going on"),
      (2L, "totally unrelated content nine ten eleven twelve thirteen"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"$run is the whole eval prompt"))
      .toDF("doc_id", "text")
    val hits = TextOps.contaminationWinnowed(corpus, bench, minShared = 1)
      .select("doc_id", "bench_doc_id").as[(Long, Long)].collect().toSet
    assert(hits.contains((1L, 100L)), "SIGMOD'03 guarantee violated")
    assert(!hits.exists(_._1 == 2L), s"false positive: $hits")
  }

  test("quality classifier equals the in-memory hashed-bigram model") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def hex6(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).substring(0, 6), 16)
    val b = TextOps.QualityClassifierBuckets
    val thr = TextOps.QualityClassifierThresholds.toMap
      .withDefaultValue(TextOps.QualityClassifierDefaultThreshold)
    def model(text: String, lang: String): Option[(Long, Long, Long, Boolean)] = {
      val t = "\\S+".r.findAllIn(text.toLowerCase).toSeq
      val g2 = t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      if (g2.isEmpty) None else {
        val wSum = g2.map(g => hex6("qw:" + (hex6(g) % b)) % 2001 - 1000).sum
        val milli = wSum * 1000 / g2.size // both engines truncate to zero
        Some((g2.size.toLong, wSum, milli, milli >= thr(lang)))
      }
    }
    val got = TextOps.qualityClassifier(docs)
      .select("doc_id", "n_grams", "w_sum", "score_milli", "keep")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val rows = docs.select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect()
    rows.foreach { case (id, text, lang) =>
      assert(got.get(id) == model(text, lang), s"doc $id classifier drift")
    }
    // a short doc (no bigram) carries nothing to judge and drops out
    val one = Seq((9L, "single", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TextOps.qualityClassifier(one).isEmpty)
  }
}
