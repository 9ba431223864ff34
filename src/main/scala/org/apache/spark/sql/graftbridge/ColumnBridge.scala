package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the package-private Column ↔ Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils, Spark 4.x). Needed to
  * expose custom Catalyst expressions as user-facing Columns — the same
  * technique public Spark extension libraries use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
