package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The corpus-cleaning language+quality gate as ONE native per-row
  * predicate: `predicted_lang == targetLang && quality_score >= minQuality`,
  * computed in a single tokenization pass.
  *
  * Why this exists (r13): the declarative form — `predictedLangExpr === lang
  * && qualityScoreExpr >= q` — embeds SEVEN `marker_count(tokens(text), …)`
  * subtrees (5 language profiles + stopwords + the punct regex), and since
  * [[MarkerCount]] is CodegenFallback the whole Filter drops out of
  * whole-stage codegen, where nothing shares the identical `tokens(text)`
  * children: `regexp_extract_all(lower(text), '\\S+')` re-runs 6× per row.
  * Measured on the r13 closing cycle that pushed `pipeline_clean_corpus`
  * 2.0 → 2.8 s at sf0.1. Here the row is lowered once, tokenized once, and
  * every marker set probed per token in one JVM loop; CodegenFallback is
  * fine for the same reason as MarkerCount — cost is per row, not per
  * subexpression.
  *
  * SEMANTICS ARE A MIRROR, NOT A REINTERPRETATION, of
  * `TextOps.predictedLangExpr` / `TextOps.qualityScoreExpr`
  * (TextOpsSpec asserts filter-set equality against the declarative
  * predicate on the real documents table):
  *  - lowercase via `UTF8String.toLowerCase` — the same routine Spark's
  *    `lower()` uses (UTF8_BINARY collation), not locale-sensitive
  *    `String.toLowerCase`;
  *  - tokens = maximal runs of non-`\s` over the LOWERED text, with Java
  *    regex `\s` = the six ASCII chars (NOT `Character.isWhitespace`);
  *  - punct = code points of the lowered text outside `[a-z0-9\s]`
  *    (code POINTS — a supplementary char counts once, as in Java regex);
  *  - char length = `numChars` of the ORIGINAL text (lowercasing can
  *    change length: İ → i̇), matching `length(col("text"))`;
  *  - language = first profile (declaration order) achieving the max
  *    marker count, `und` when all zero — the when-chain's tie-break;
  *  - quality = `round(min(nTok/100,1)·0.4 + stopRatio·0.3 +
  *    (1 − min(punctRatio·10,1))·0.3, 6)` with Spark `round`'s exact
  *    HALF_UP: `BigDecimal.valueOf(x).setScale(6, HALF_UP)`.
  * Null text → null predicate → row filtered, identical to the
  * declarative chain's null propagation.
  */
case class CleanGate(child: Expression,
                     profiles: Seq[(String, Seq[String])],
                     stopwords: Seq[String],
                     targetLang: String,
                     minQuality: Double)
    extends UnaryExpression with CodegenFallback {

  require(profiles.nonEmpty, "profile set must be non-empty")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "clean_gate"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.sql}")
    }

  @transient private lazy val profileLangs: Array[String] =
    profiles.map(_._1).toArray
  @transient private lazy val profileSets: Array[java.util.HashSet[String]] =
    profiles.map { case (_, ms) =>
      val s = new java.util.HashSet[String](ms.size * 2)
      ms.foreach(s.add); s
    }.toArray
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add); s
  }

  // Java regex \s — exactly these six, NOT Character.isWhitespace
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String]
    val s = raw.toLowerCase.toString
    val len = s.length

    // one pass: tokens + per-profile scores + stopword hits
    val scores = new Array[Int](profileLangs.length)
    var nTok = 0
    var stops = 0
    var i = 0
    while (i < len) {
      if (isWs(s.charAt(i))) i += 1
      else {
        var j = i + 1
        while (j < len && !isWs(s.charAt(j))) j += 1
        val tok = s.substring(i, j)
        nTok += 1
        if (stopSet.contains(tok)) stops += 1
        var p = 0
        while (p < scores.length) {
          if (profileSets(p).contains(tok)) scores(p) += 1
          p += 1
        }
        i = j
      }
    }

    // language: first profile at the max, und when all zero
    var best = 0
    var p = 0
    while (p < scores.length) { if (scores(p) > best) best = scores(p); p += 1 }
    var langIdx = -1
    if (best > 0) {
      var q = 0
      while (q < scores.length && langIdx < 0) {
        if (scores(q) == best) langIdx = q
        q += 1
      }
    }
    val lang = if (langIdx < 0) "und" else profileLangs(langIdx)
    if (lang != targetLang) return false

    // punct over lowered CODE POINTS; denominator = ORIGINAL numChars
    var punct = 0
    var k = 0
    while (k < len) {
      val cp = s.codePointAt(k)
      if (!(cp >= 'a' && cp <= 'z') && !(cp >= '0' && cp <= '9') &&
          !(cp < 128 && isWs(cp.toChar)))
        punct += 1
      k += Character.charCount(cp)
    }
    val charLen = math.max(raw.numChars(), 1)
    val stopRatio = stops.toDouble / math.max(nTok, 1).toDouble
    val punctRatio = punct.toDouble / charLen.toDouble
    val q = math.min(nTok.toDouble / 100.0, 1.0) * 0.4 +
      stopRatio * 0.3 +
      (1.0 - math.min(punctRatio * 10.0, 1.0)) * 0.3
    val rounded = java.math.BigDecimal.valueOf(q)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    rounded >= minQuality
  }

  override protected def withNewChildInternal(newChild: Expression): CleanGate =
    copy(child = newChild)
}

object CleanGate {
  def clean_gate(text: Column, profiles: Seq[(String, Seq[String])],
                 stopwords: Seq[String], targetLang: String,
                 minQuality: Double): Column =
    ColumnBridge.column(CleanGate(ColumnBridge.expression(text), profiles,
                                  stopwords, targetLang, minQuality))
}
