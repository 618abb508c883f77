package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the constructors `private[sql]`
  * when the Column API was decoupled from Catalyst (SPARK-44444 lineage);
  * custom native expressions still need them. This shim lives in a
  * subpackage of org.apache.spark.sql solely to satisfy that access
  * qualifier — it adds no behavior.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
