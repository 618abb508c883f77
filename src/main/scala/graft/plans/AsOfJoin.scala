package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` per key — implemented as the full custom-operator
  * stack (logical node → planner strategy → physical sort-merge exec),
  * SURVEY §7.5 tier (c).
  *
  * Execution: EnsureRequirements clusters both sides on the key and sorts
  * each partition by (key, ts); the exec then streams BOTH sides once per
  * partition with O(1) state (current right key + last value). Compared to
  * the union+window composition (EventOps.asofJoin) this avoids unioning
  * the inputs and carries no window buffer — and compared to a range join
  * it never materializes |L|·|R| candidates. The two implementations are
  * asserted equal in AsOfJoinNativeSpec and share the DuckDB ASOF oracle.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightVal: Attribute,
    outAttr: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ outAttr

  // outAttr originates here, not from a child (cf. Generate)
  override def producedAttributes:
      org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression, rightVal: Expression,
    outAttr: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr

  override def producedAttributes:
      org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val valType = rightVal.dataType
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val lExtract = UnsafeProjection.create(Seq(leftKey, leftTs), leftOut)
      val rExtract = UnsafeProjection.create(Seq(rightKey, rightTs, rightVal), rightOut)
      val outProj = UnsafeProjection.create(outAttrs, leftOut :+ outAttr)
      val valueRow = new GenericInternalRow(1)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      // O(1) carried state: the last right (key, value) seen at or before
      // the current left timestamp
      var haveLast = false
      var lastKey: Any = null
      var lastVal: Any = null

      lIter.map { lRow =>
        val lkt = lExtract(lRow)
        val lk = lkt.get(0, keyType)
        val lt = lkt.get(1, tsType)
        // advance right while its (key, ts) <= (left key, left ts)
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rkt = rExtract(rBuf.head)
          val rk = rkt.get(0, keyType)
          val cmp = keyOrd.compare(rk, lk)
          if (cmp < 0 ||
              (cmp == 0 && tsOrd.compare(rkt.get(1, tsType), lt) <= 0)) {
            lastKey = InternalRow.copyValue(rk)
            lastVal = InternalRow.copyValue(rkt.get(2, valType))
            haveLast = true
            rBuf.next()
          } else advancing = false
        }
        val matched = haveLast && keyOrd.compare(lastKey, lk) == 0
        valueRow.update(0, if (matched) lastVal else null)
        outProj(joined(lRow, valueRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, rv, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, rv, out) :: Nil
    case _ => Nil
  }
}
