package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 moved the classic `Column.expr` accessor behind
  * `private[sql] org.apache.spark.sql.classic.ExpressionUtils` (the
  * Connect refactor made Column engine-agnostic). Function builders
  * registered in the session's FunctionRegistry work on Expressions,
  * while graft's composed operators (e.g. [[graft.functions.DateRound]])
  * are written against the public Column API — this shim, placed under
  * the org.apache.spark.sql namespace like any SparkSessionExtensions
  * integration, converts at the registry boundary so the operator logic
  * itself stays on the stable public surface.
  */
object ColumnBridge {
  /** Eagerly converts to the unresolved Catalyst tree (UnresolvedFunction
    * et al.), which the analyzer then resolves like any parsed SQL —
    * `ExpressionUtils.expression`'s lazy ColumnNodeExpression wrapper
    * stays opaque to the analyzer when returned from a FunctionRegistry
    * builder and dies at codegen as Unevaluable. */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
