package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the conversions `private[sql]`
  * (`classic.ExpressionUtils`); extension libraries conventionally expose
  * them via an object inside the `org.apache.spark.sql` package tree —
  * this is the only file outside the `graft` namespace, and it contains
  * no logic.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eager conversion: `ExpressionUtils.expression` defers behind a
    * `ColumnNodeExpression` leaf, which never resolves when returned from a
    * FunctionRegistry builder (codegen hits the raw node). The converter
    * produces a plain (possibly Unresolved*) Catalyst tree the analyzer
    * resolves normally.
    */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Test seam: apply an extensions object's injected functions to a registry
    * (`SparkSessionExtensions.registerFunctions` is `private[sql]`).
    */
  def applyInjectedFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(reg)
}
