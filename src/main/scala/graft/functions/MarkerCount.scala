package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of marker words in a token array — the hot inner loop
  * of language-ID and stopword-ratio scoring.
  *
  * The composable form, `size(filter(toks, t -> t = m1 OR t = m2 …))`,
  * evaluates interpreted lambda machinery per token — the same class of
  * cost measured at 10-30× for WordShingles/DotProduct (BASELINE.md §: HOF
  * tax). At 100 TB the lang/quality pass is a full-corpus map stage, so
  * this runs one plain JVM loop per row with a hash-set membership probe
  * per token (~50 ns).
  *
  * Codegen'd (r13; was CodegenFallback): langId / quality predicates embed
  * up to seven of these in ONE Filter or Project, and a single fallback
  * expression evicts the whole operator from whole-stage codegen — losing
  * both the virtual-call-free pipeline AND codegen's subexpression
  * elimination of the identical `tokens(text)` children (each fallback
  * marker re-ran its own regexp tokenization). `doGenCode` emits the same
  * loop with the marker set shipped via the references array, so plans
  * over these predicates stay inside one WholeStageCodegen span.
  *
  * Semantics match the HOF form exactly: counts OCCURRENCES (multiset, not
  * distinct hits — `size(array_intersect)` would dedup), which is what the
  * DuckDB oracle's `len(list_filter(...))` computes.
  */
case class MarkerCount(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  require(markers.nonEmpty, "marker set must be non-empty")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "marker_count"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.sql}")
    }

  @transient private lazy val markerSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (markerSet.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw-type cast keeps the generated Java free of generics noise;
    // contains(Object) has identical semantics
    val setRef = ctx.addReferenceObj("markerSet", markerSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
        |final int $n = $c.numElements();
        |int $cnt = 0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($setRef.contains($c.getUTF8String($i))) $cnt++;
        |}
        |${ev.value} = $cnt;
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCount =
    copy(child = newChild)
}

object MarkerCount {
  def marker_count(toks: Column, markers: Seq[String]): Column =
    ColumnBridge.column(MarkerCount(ColumnBridge.expression(toks), markers))
}
