package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.functions.CosineSimilarity

/** Session extension registering graft's custom expressions as SQL
  * functions (the TVF/extension surface of §2.13 — the Spark-idiomatic
  * analog of the reference's `graph_accel_*` SQL set-returning functions
  * in graph-accel/ext/src, Rust).
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or  --conf spark.sql.extensions=graft.GraftExtensions
  * then `SELECT cosine_similarity(a.embedding, b.embedding) FROM ...`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_similarity"),
      GraftExtensions.cosineBuilder))
  }
}

object GraftExtensions {
  val cosineBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "cosine_similarity takes exactly 2 arguments")
    val arrD = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Cast(children.head, arrD),
      org.apache.spark.sql.catalyst.expressions.Cast(children(1), arrD))
  }

  /** Register on an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "cosine_similarity", cosineBuilder)
}
