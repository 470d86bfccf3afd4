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

  /** Unwraps a (possibly) sort-ordered Column into (key, ascending,
    * nullsFirst). A bare column reads as ASC NULLS FIRST — Spark's
    * default sort order. Columns carry sort direction as an internal
    * ColumnNode since the Spark 4 Connect refactor, so this lives in
    * the in-package bridge. */
  def sortOrderOf(c: Column): (Column, Boolean, Boolean) =
    c.node match {
      case so: org.apache.spark.sql.internal.SortOrder =>
        val asc = so.sortDirection ==
          org.apache.spark.sql.internal.SortOrder.Ascending
        val nf = so.nullOrdering ==
          org.apache.spark.sql.internal.SortOrder.NullsFirst
        (Column(so.child), asc, nf)
      case _ => (c, true, true)
    }
}
