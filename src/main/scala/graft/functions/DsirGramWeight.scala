package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** DSIR importance weight of one document's gram array as ONE native
  * expression: Σ over grams of delta(bucket(g)), where
  * bucket(g) = conv(substring(md5(g), 1, 6), 16, 10) % buckets — the
  * first three digest bytes as an unsigned int, mod the bucket count,
  * exactly the gramBuckets idiom the batch operator and the DuckDB
  * oracle restate.
  *
  * Why native, not composed: the streaming ingest scorer
  * ([[graft.streaming.StreamingOps.importanceStream]]) is a stateless
  * per-row projection, and its composable form —
  * `aggregate(transform(grams, element_at(mapLit, md5-slice)), …)` —
  * stays INTERPRETED, re-walking a per-row delta array and boxing every
  * map lookup (r20 StreamProfile: addBatch ≈ 1.1-1.25 s of the row's
  * single trigger was this projection). This expression is one JVM pass:
  * n digests + a direct array index + a running long sum, whole-stage
  * codegen via [[gramWeight]].
  *
  * Parity with the HOF form (pinned by DsirGramWeightSpec): the first 6
  * hex chars of md5 are the first 3 digest bytes as an unsigned value
  * (< 2^24, so conv-to-long never overflows); a bucket absent from the
  * fitted delta map made `element_at` return NULL and the aggregate
  * propagate it — mirrored here by a null slot returning null for the
  * whole document. Empty gram arrays return the aggregate's init (0);
  * the declared caller filters them out first either way.
  */
case class DsirGramWeight(child: Expression, deltas: Array[java.lang.Long],
                          buckets: Int)
    extends UnaryExpression {

  require(buckets >= 1 && deltas.length == buckets,
    "dsir_gram_weight needs one delta slot per bucket")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dsir_gram_weight"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.sql}")
    }

  /** The per-document pass — called from interpreted eval and generated
    * code. Boxed Long so a missing bucket yields NULL like the
    * element_at formulation.
    */
  def gramWeight(grams: ArrayData): java.lang.Long = {
    val n = grams.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    var acc = 0L
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(grams.getUTF8String(i).getBytes)
      val v = ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
      val slot = deltas(v % buckets)
      if (slot == null) return null
      acc += slot.longValue
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override def nullSafeEval(input: Any): Any =
    gramWeight(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("weigher", this,
      classOf[DsirGramWeight].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long ${ev.value}Boxed = $self.gramWeight($c);
         |${ev.isNull} = ${ev.value}Boxed == null;
         |if (!${ev.isNull}) ${ev.value} = ${ev.value}Boxed.longValue();
         |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): DsirGramWeight =
    copy(child = newChild)
}

object DsirGramWeight {
  def dsir_gram_weight(grams: Column, fitted: Map[Long, Long],
                       buckets: Int): Column = {
    val slots = Array.tabulate[java.lang.Long](buckets)(b =>
      fitted.get(b.toLong).map(java.lang.Long.valueOf).orNull)
    ColumnBridge.column(DsirGramWeight(
      ColumnBridge.expression(grams), slots, buckets))
  }
}
