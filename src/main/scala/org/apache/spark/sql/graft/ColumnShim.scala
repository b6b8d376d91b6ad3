package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression converters — the
  * standard shim shape Spark extension libraries use to wrap a custom
  * Catalyst expression in a `Column` WITHOUT registering it in the public
  * SQL function namespace. graft uses it for engine-internal kernels whose
  * preconditions are guaranteed by plan shape but not checkable cheaply at
  * runtime (e.g. `jaccard_sorted_unchecked`): exposing those through
  * `call_function` would make them callable — and silently wrong — from
  * user SQL.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
