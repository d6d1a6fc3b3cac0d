package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters so our
  * custom Catalyst expressions can be exposed as user-facing Columns
  * (Spark 4 wraps Columns around ColumnNode, not Expression).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register SQL functions into a LIVE session (the session-build
    * path is `spark.sql.extensions=graft.GraftExtensions`); the
    * function registry is `private[sql]`, hence bridged here.
    */
  def registerFunctions(spark: SparkSession,
      fns: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder)])
      : Unit =
    fns.foreach { case (id, info, builder) =>
      spark.asInstanceOf[classic.SparkSession]
        .sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
