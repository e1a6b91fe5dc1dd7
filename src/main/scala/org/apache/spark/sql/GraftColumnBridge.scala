package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression conversions —
  * needed to wrap custom Catalyst expressions as user-facing Columns in
  * Spark 4's connect-agnostic Column API. Standard extension-library
  * technique: this file compiles into the `org.apache.spark.sql` package
  * purely to cross the access boundary; no Spark internals are modified. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
