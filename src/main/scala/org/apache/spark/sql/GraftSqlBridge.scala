package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions. Spark 4
  * moved these converters behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so extension libraries
  * expose them via a one-file shim in the sql package — the standard
  * pattern for Catalyst extensions built against the public jars. */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
