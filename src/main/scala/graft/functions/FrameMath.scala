package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Native per-frame feature vector for multimodal NEAR-dup detection —
  * the codegen replacement for the HOF formulation in
  * `operators/Multimodal.frameFeatures` (hex → 64-element `transform`
  * parse, then `dim` `aggregate(filter(sequence(...)))` sums).
  *
  * Semantics are IDENTICAL by construction (the shared DuckDB oracle
  * depends on it): with unsigned byte values b₀..b_{len−1},
  * `v[j] = dim·Σ_{i ≡ j (mod dim)} bᵢ − Σ bᵢ`, exact Long arithmetic,
  * cast to double per element. What changes is cost: ONE O(len) pass over
  * the raw bytes instead of an O(len·dim) interpreted lambda chain where
  * every `element_at` re-evaluated the whole parse array unless callers
  * placed a barrier — the blowup both the batch eager barrier and the
  * streaming repartition existed to contain. With this expression the
  * barriers are unnecessary: even a predicate that inlines the expression
  * twice pays 2·O(len) primitive byte ops.
  */
case class FrameByteFeatures(child: Expression, dim: Int)
    extends UnaryExpression {

  require(dim > 0, s"dim must be positive, got $dim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "frame_byte_features"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val sums = new Array[Long](dim)
    var total = 0L
    var i = 0
    while (i < bytes.length) {
      val v = (bytes(i) & 0xff).toLong
      sums(i % dim) += v
      total += v
      i += 1
    }
    val out = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      out(j) = (dim * sums(j) - total).toDouble
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName locals — same Janino-collision discipline as DotProduct
      val sums = ctx.freshName("fbfSums")
      val total = ctx.freshName("fbfTotal")
      val out = ctx.freshName("fbfOut")
      val i = ctx.freshName("fbfI")
      val j = ctx.freshName("fbfJ")
      val v = ctx.freshName("fbfV")
      s"""
        long[] $sums = new long[$dim];
        long $total = 0L;
        for (int $i = 0; $i < $a.length; $i++) {
          long $v = (long) ($a[$i] & 0xff);
          $sums[$i % $dim] += $v;
          $total += $v;
        }
        double[] $out = new double[$dim];
        for (int $j = 0; $j < $dim; $j++) {
          $out[$j] = (double) ($dim * $sums[$j] - $total);
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): FrameByteFeatures = copy(child = newChild)
}

object FrameMath {
  def frame_byte_features(frame: Column, dim: Int): Column =
    ColumnBridge.column(
      FrameByteFeatures(ColumnBridge.expression(frame), dim))
}
