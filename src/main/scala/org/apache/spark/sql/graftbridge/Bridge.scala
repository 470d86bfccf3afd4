package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression adapters. `ExpressionUtils` is private[sql] in
  * Spark 4 (the Connect refactor hid the Expression-backed Column
  * constructor), so the engine's native expressions go through this
  * in-package bridge — the standard pattern for Catalyst extension
  * libraries. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
