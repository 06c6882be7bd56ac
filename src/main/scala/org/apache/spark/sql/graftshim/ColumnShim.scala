package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge from a raw Catalyst [[Expression]] to a public [[Column]].
 * Spark 4 moved Column construction behind `private[sql]`
 * (`org.apache.spark.sql.classic.ExpressionUtils.column`); this shim
 * lives under `org.apache.spark.sql` solely to re-expose that one
 * constructor to graft's custom expressions (the standard technique for
 * third-party Catalyst extensions that don't go through an injected
 * FunctionRegistry entry).
 */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
