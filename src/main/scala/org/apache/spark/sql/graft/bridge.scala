/** Bridge package: lives under `org.apache.spark.sql` so the engine's
  * Catalyst extensions can use `private[sql]` Spark internals
  * (ExpressionUtils, AbstractDataType, …) — the standard pattern for
  * Spark extension libraries. Keep this layer thin: only expression
  * definitions and Column/Expression plumbing; all engine logic stays in
  * the `graft.*` packages.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Bridge {
  /** Wrap a Catalyst expression as a public Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic sessions). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
