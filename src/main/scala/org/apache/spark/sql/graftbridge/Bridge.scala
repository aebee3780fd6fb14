package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the Column API independent of
  * Catalyst (`Column` wraps a `ColumnNode`); the conversion helpers live in
  * `org.apache.spark.sql.classic` with `private[sql]` visibility, so this
  * one-file subpackage re-exports them for graft's custom expressions —
  * the same access pattern third-party Spark extensions use.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp SQL function on a live session — the runtime analog of
    * `SparkSessionExtensions.injectFunction` for sessions already built. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Register a temp TABLE function (`SELECT * FROM f(...)`) on a live
    * session — the runtime analog of `injectTableFunction`. */
  def registerTableFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** The analyzed logical plan of a DataFrame (TVF builders return plans). */
  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame].queryExecution.analyzed

  /** A DSv2 literal expression — `LiteralValue`'s companion is
    * `private[sql]`, so code outside org.apache.spark.sql (specs driving
    * SupportsRuntimeV2Filtering directly) builds literals through here. */
  def v2Literal(value: Any, dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.expressions.Expression =
    org.apache.spark.sql.connector.expressions.LiteralValue(value, dt)
}
