package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session-extension registration for graft's native expressions, making
 * them first-class SQL functions (`SELECT graft_dot(a, b)`) alongside
 * the Column API ([[graft.functions.VectorFunctions]]).
 *
 * Cluster use: `--conf spark.sql.extensions=org.apache.spark.sql.graftshim.GraftExtensions`
 * (applied when the session is BUILT). For an already-running session —
 * tests, notebooks — [[GraftFunctionRegistry.register]] installs the same
 * functions directly on the session's registry.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctionRegistry.dotFunction)
}

object GraftFunctionRegistry {

  /** (name, info, builder) triple in the injectFunction shape. */
  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      {
        case Seq(a, b) => DotProduct(a, b)
        case other => throw new IllegalArgumentException(
          s"graft_dot expects exactly 2 arguments, got ${other.size}")
      })

  /** Install on a live session (the post-build twin of [[GraftExtensions]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      dotFunction._1, dotFunction._2, dotFunction._3)
}
