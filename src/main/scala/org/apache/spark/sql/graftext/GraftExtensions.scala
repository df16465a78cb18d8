package org.apache.spark.sql.graftext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: makes the engine's native expressions
  * available to pure SQL. Configure cluster-wide with
  * `spark.sql.extensions=org.apache.spark.sql.graftext.GraftExtensions`,
  * or call [[GraftFunctions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineSimDescriptor)
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsofJoin)
  }
}

object GraftFunctions {

  private def buildCosine(children: Seq[Expression]): Expression = {
    require(children.length == 2, "cosine_sim takes exactly 2 arguments")
    CosineSimilarityExpr(children.head, children(1))
  }

  /** (name, info, builder) triple for `SparkSessionExtensions.injectFunction`. */
  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, null, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two array<double> vectors", ""),
      buildCosine)

  /** Register on an already-built session (temp function, session-scoped). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", buildCosine, "built-in")
}
