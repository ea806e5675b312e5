package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column<->Expression conversions that custom
  * Catalyst expressions need in Spark 4.x (the pre-4.0 `new Column(expr)`
  * constructor is gone). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
