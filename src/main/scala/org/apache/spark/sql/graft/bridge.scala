package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from custom Catalyst [[Expression]]s to the public [[Column]] API.
  * Spark 4 wraps classic expressions behind ColumnNode; the converter lives
  * in `org.apache.spark.sql.classic` with private[sql] access, so this shim
  * sits inside the org.apache.spark.sql package — the standard pattern for
  * Spark-native extensions.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
