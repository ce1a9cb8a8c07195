package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 made these
  * conversions `private[sql]` (sql-api split), so extension libraries
  * reach them via a same-package bridge — the standard technique for
  * custom-Expression Column APIs.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `$"x".desc` is a SortOrder at the ColumnNode level in Spark 4
    * (not a catalyst SortOrder until analysis), so callers that need
    * the BARE key of a sort column — e.g. to compare keys for
    * equality — must unwrap here, where the node is reachable.
    */
  def stripSortOrder(c: Column): Column = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder => Column(so.child)
    case _ => c
  }
}
