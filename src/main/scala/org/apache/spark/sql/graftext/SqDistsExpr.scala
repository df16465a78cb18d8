package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the IVF cell-assignment kernel: the
  * k-vector of squared L2 distances from a query/corpus vector to every
  * row of a centroid matrix column —
  * `transform(cents, c => aggregate(zip_with(v, c, (x,y) => (x-y)²),
  * 0.0, +))` fused into one primitive double loop.
  *
  * The composable form evaluates k×dim interpreted lambda applications
  * per vector (Spark's higher-order functions run lambdas on the
  * interpreted path) and allocates k zipped intermediates; this kernel is
  * the same fused-loop move as [[CosineSimilarityExpr]], applied to the
  * hot loop under [[graft.operators.VectorSearch.cellOf]] and the probe
  * selection of every IVF/IVF-PQ query. The centroid matrix stays a
  * COLUMN (the 1-row broadcast `__cents` frame), so the
  * model-rides-as-data plan-invariance property is untouched — only the
  * per-row arithmetic changes representation.
  *
  * Semantics match the HOF form EXACTLY (spec-pinned), including the
  * summation order (index-ascending float adds — bit-identical sums):
  *  - null centroid matrix → null (outer `transform` of null);
  *  - null vector → a k-vector of nulls (each inner `zip_with(null, c)`
  *    is null, so each `aggregate` is null);
  *  - a null centroid row → that element null;
  *  - length mismatch between vector and centroid → that element null
  *    (`zip_with` null-pads the shorter side and the pad poisons the
  *    fold), and a null element in either array poisons the same way.
  */
case class SqDistsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"sq_dists expects (array<double>, array<array<double>>), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val cents = right.eval(input)
    if (cents == null) return null
    SqDistsExpr.sqDists(
      left.eval(input).asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = ${rightGen.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = org.apache.spark.sql.graftext.SqDistsExpr.sqDists(
          ${leftGen.isNull} ? null : ${leftGen.value}, ${rightGen.value});
      }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqDistsExpr {

  /** The fused kernel body (shared by eval and codegen). `vec == null`
    * yields a k-vector of nulls, matching the HOF's inner-null behavior.
    */
  def sqDists(vec: ArrayData, cents: ArrayData): ArrayData = {
    val k = cents.numElements()
    if (vec == null) return new GenericArrayData(new Array[Any](k))
    val n = vec.numElements()
    val out = new Array[Double](k)
    var nulls: Array[Boolean] = null
    var c = 0
    while (c < k) {
      var bad = cents.isNullAt(c)
      if (!bad) {
        val cv = cents.getArray(c)
        if (cv.numElements() != n) bad = true
        else {
          var s = 0.0
          var i = 0
          while (i < n && !bad) {
            if (vec.isNullAt(i) || cv.isNullAt(i)) bad = true
            else { val d = vec.getDouble(i) - cv.getDouble(i); s += d * d }
            i += 1
          }
          if (!bad) out(c) = s
        }
      }
      if (bad) {
        if (nulls == null) nulls = new Array[Boolean](k)
        nulls(c) = true
      }
      c += 1
    }
    if (nulls == null) UnsafeArrayData.fromPrimitiveArray(out)
    else {
      val boxed = new Array[Any](k)
      var i = 0
      while (i < k) { if (!nulls(i)) boxed(i) = java.lang.Double.valueOf(out(i)); i += 1 }
      new GenericArrayData(boxed)
    }
  }

  /** Column API: squared L2 distance from `vec` (`array<double>`) to each
    * row of `cents` (`array<array<double>>`).
    */
  def sqDistsCol(vec: Column, cents: Column): Column =
    ExpressionUtils.column(
      SqDistsExpr(ExpressionUtils.expression(vec), ExpressionUtils.expression(cents)))
}
