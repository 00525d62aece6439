package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/** Thin accessors for `private[sql]` surfaces. Spark 4 removed the public
  * `Column(expr)` constructor; native Catalyst expressions (graft.functions)
  * are exposed as user-facing Columns through here. This is the only file
  * that lives outside the `graft` namespace.
  */
object Bridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a native aggregate function as a user-facing aggregate Column
    * (`toAggregateExpression` is `private[sql]`).
    */
  def aggColumn(
      f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction)
      : Column =
    ExpressionUtils.column(f.toAggregateExpression())

  /** Register a native expression builder under `name` so it is callable
    * from SQL text and via `functions.call_function(name, ...)`.
    */
  def register(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val info = new ExpressionInfo("graft", name)
    classic.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
  }
}
