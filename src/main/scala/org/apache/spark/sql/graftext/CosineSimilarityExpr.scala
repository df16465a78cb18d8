// Hosted in an org.apache.spark.sql subpackage: custom Catalyst expressions
// need the private[sql] Expression/Column bridge (ExpressionUtils) and type
// traits — the standard placement for SparkSessionExtensions-style addons.
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for dense cosine similarity over two
  * `array<double>` columns — the hot inner loop of the vector-search
  * operators ([[graft.operators.VectorSearch]]).
  *
  * The composable form `aggregate(zip_with(a, b, _*_), ...)` allocates an
  * intermediate array per row and evaluates three higher-order functions;
  * this expression runs one fused loop, and `doGenCode` emits straight-line
  * Java inside whole-stage codegen (no virtual calls, no allocation), which
  * is what a 100-TB scan × 64-float vectors wants.
  *
  * Semantics match [[TextFns.cosineDense]]: 0.0 when either norm is zero;
  * null if either input is null; mismatched lengths compare the common
  * prefix (callers use fixed-dim embeddings).
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    // include any tail elements in the norms so |v| is always the true norm
    var j = n
    while (j < x.numElements()) { val v = x.getDouble(j); nx += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = y.getDouble(j); ny += v * v; j += 1 }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi"); val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $x.getDouble($i); double $yi = $y.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |for (int $j = $n; $j < $x.numElements(); $j++) {
         |  double $v = $x.getDouble($j); $nx += $v * $v;
         |}
         |for (int $j = $n; $j < $y.numElements(); $j++) {
         |  double $v = $y.getDouble($j); $ny += $v * $v;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  /** Column API: `cosine_sim(a, b)` over `array<double>` columns. */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarityExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
