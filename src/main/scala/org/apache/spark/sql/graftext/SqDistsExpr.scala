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

/** Sibling of [[SqDistsExpr]] for the dot-product form: the k-vector of
  * `vec · row` over a matrix column — the hyperplane-bucket loop of the
  * LSH ANN path (`annLshTopK`), which ran nPlanes×dim interpreted lambda
  * applications per corpus vector as `aggregate(zip_with(v, plane, *))`
  * per plane. Same null semantics and index-ascending (bit-identical)
  * summation as [[SqDistsExpr]].
  */
case class MatDotsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"mat_dots expects (array<double>, array<array<double>>), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val mat = right.eval(input)
    if (mat == null) return null
    SqDistsExpr.matDots(
      left.eval(input).asInstanceOf[ArrayData], mat.asInstanceOf[ArrayData])
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
        ${ev.value} = org.apache.spark.sql.graftext.SqDistsExpr.matDots(
          ${leftGen.isNull} ? null : ${leftGen.value}, ${rightGen.value});
      }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sibling of [[MatDotsExpr]] for the cosine form: the k-vector of
  * `cos(vec, row)` over a matrix column — the per-document loop of the
  * embedding decontamination pass
  * ([[graft.operators.VectorSearch.semanticDecontaminate]]), where every
  * corpus vector scores against the whole broadcast eval matrix. Each
  * element follows [[CosineSimilarityExpr]]'s arithmetic exactly
  * (prefix dot, tail elements folded into the norms, 0.0 on a zero
  * norm, index-ascending summation), so
  * `transform(mat, r => cosine_sim(v, r))` is the reference form — equal
  * on dense arrays; a null element inside either vector yields a null
  * sim here (defensive) where the HOF form's behavior is
  * representation-dependent. Null matrix → null; null vec → k nulls;
  * null row → that element null.
  */
case class MatCosExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"mat_cos expects (array<double>, array<array<double>>), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val mat = right.eval(input)
    if (mat == null) return null
    SqDistsExpr.matCos(
      left.eval(input).asInstanceOf[ArrayData], mat.asInstanceOf[ArrayData])
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
        ${ev.value} = org.apache.spark.sql.graftext.SqDistsExpr.matCos(
          ${leftGen.isNull} ? null : ${leftGen.value}, ${rightGen.value});
      }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The decontamination-verdict kernel: `struct(max_sim, n_close)` of a
  * vector against a matrix column in ONE fused pass —
  * `array_max(mat_cos(v, mat))` plus
  * `size(filter(mat_cos(v, mat), s => round(s, 6) >= t))` without ever
  * materializing the sims array or paying m interpreted lambda
  * applications per row (the HOF filter's per-element `round` is a
  * BigDecimal construction — measured 25.4 s vs 3.6 s steady at 10× for
  * [[graft.operators.VectorSearch.semanticDecontaminate]]).
  *
  * `n_close` counts rows with `round(sim, 6) >= threshold` under Spark's
  * exact Round-on-double semantics (`BigDecimal.valueOf(s).setScale(6,
  * HALF_UP)`), but only sims inside `threshold ± 1e-6` take the
  * BigDecimal path: outside the window the verdict is forced, because
  * 6-dp rounding moves a value by at most 5e-7 — `s ≥ t + 1e-6` rounds to
  * ≥ t − 5e-7 above it, `s < t − 1e-6` rounds short of t. `max_sim` is
  * the RAW maximum (callers round it; round is monotone so round-of-max
  * equals max-of-rounds), and a NaN sim ranks greatest, exactly as
  * Spark's double ordering makes `array_max` behave. Null matrix →
  * null; null rows and null-element rows are skipped from both the max
  * and the count (exactly as `array_max` and a null-dropping `filter`
  * treat a null sim); a null vector — or one with a null element, which
  * poisons every row — and a matrix with no scoreable row all yield
  * `(null, 0)`, the HOF form's own verdict over all-null sims.
  * `threshold` is a model parameter, folded at construction like
  * [[MinHashSigExpr]]'s.
  */
case class MatCosStatsExpr(left: Expression, right: Expression,
                           threshold: Double)
    extends BinaryExpression {

  override def dataType: DataType = MatCosStatsExpr.outType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"mat_cos_stats expects (array<double>, array<array<double>>), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val mat = right.eval(input)
    if (mat == null) return null
    MatCosStatsExpr.stats(
      left.eval(input).asInstanceOf[ArrayData], mat.asInstanceOf[ArrayData],
      threshold)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    // emit the threshold as a bit-pattern round-trip, not a string-spliced
    // double: interpolating a non-finite value would render "NaN"/
    // "Infinity" — not valid Java literals — and the generated class would
    // fail to compile (silent interpreted fallback, or a hard error under
    // CODEGEN_ONLY); the bits form is exact and compiles for every double
    val thrBits = java.lang.Double.doubleToLongBits(threshold)
    val thrJava = s"java.lang.Double.longBitsToDouble(${thrBits}L)"
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = ${rightGen.isNull};
      InternalRow ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = org.apache.spark.sql.graftext.MatCosStatsExpr.stats(
          ${leftGen.isNull} ? null : ${leftGen.value}, ${rightGen.value},
          $thrJava);
      }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MatCosStatsExpr {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val outType: StructType = StructType(Seq(
    StructField("max_sim", DoubleType, nullable = true),
    StructField("n_close", LongType, nullable = false)))

  /** Spark's Round-on-double, verbatim: decimal HALF_UP at 6 places. */
  private def round6(s: Double): Double =
    java.math.BigDecimal.valueOf(s)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Kernel body (shared by eval and codegen). One pass over the matrix:
    * each scoreable row contributes its raw cosine to the max and its
    * rounded-threshold verdict to the count.
    */
  def stats(vec: ArrayData, mat: ArrayData,
            threshold: Double): InternalRow = {
    val lo = threshold - 1e-6
    val hi = threshold + 1e-6
    var maxSim = Double.NaN
    var any = false
    var nClose = 0L
    // a null vec — or a null vec element, which poisons every row (see
    // SqDistsExpr.hoistVec) — leaves no scoreable row: (null, 0), exactly
    // what array_max + a null-dropping filter yield over all-null sims
    val hoisted = if (vec == null) null else SqDistsExpr.hoistVec(vec)
    if (hoisted == null)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, 0L))
    val (vd, nx) = hoisted
    val k = mat.numElements()
    var c = 0
    while (c < k) {
      val boxed = SqDistsExpr.rowCos(vd, nx, mat, c)
      if (boxed != null) {
        val sim = boxed.doubleValue()
        // NaN ranks GREATEST in Spark's double ordering (array_max over a
        // NaN-containing sims vector returns NaN) — mirror it
        if (!any || sim > maxSim || sim.isNaN) { maxSim = sim; any = true }
        if (sim >= hi) nClose += 1L
        else if (sim >= lo && round6(sim) >= threshold) nClose += 1L
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](if (any) java.lang.Double.valueOf(maxSim) else null, nClose))
  }

  /** Column API: `struct(max_sim, n_close)` of `vec` vs the rows of
    * `mat` at `threshold`.
    */
  def matCosStatsCol(vec: Column, mat: Column, threshold: Double): Column =
    ExpressionUtils.column(
      MatCosStatsExpr(ExpressionUtils.expression(vec),
        ExpressionUtils.expression(mat), threshold))
}

/** Elementwise vector subtraction `a − b` with `zip_with` semantics — the
  * IVF-PQ residual pass (`v − centroid[cell]`), which ran dim interpreted
  * lambda applications per vector. Output length = max(|a|, |b|); the
  * null-padded tail (and any null element) yields a null element, exactly
  * as `zip_with(a, b, (x, y) => x − y)`.
  */
case class VecSubExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_sub expects (array<double>, array<double>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SqDistsExpr.vecSub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftext.SqDistsExpr.vecSub($a, $b);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqDistsExpr {

  /** The fused kernel body (shared by eval and codegen). `vec == null`
    * yields a k-vector of nulls, matching the HOF's inner-null behavior.
    */
  def sqDists(vec: ArrayData, cents: ArrayData): ArrayData =
    rowAggregate(vec, cents, squared = true)

  /** [[MatDotsExpr]]'s kernel body: `vec · row` per matrix row. */
  def matDots(vec: ArrayData, mat: ArrayData): ArrayData =
    rowAggregate(vec, mat, squared = false)

  /** One kernel for both per-row aggregates — `Σ (v−r)²` (`squared`) and
    * `Σ v·r` — so the null-row / length-mismatch / boxed-fallback
    * contract lives in exactly one place. The flag is loop-invariant and
    * perfectly predicted; both call paths stay primitive.
    */
  private def rowAggregate(vec: ArrayData, rows: ArrayData,
                           squared: Boolean): ArrayData = {
    val k = rows.numElements()
    if (vec == null) return new GenericArrayData(new Array[Any](k))
    val n = vec.numElements()
    val out = new Array[Double](k)
    var nulls: Array[Boolean] = null
    var c = 0
    while (c < k) {
      var bad = rows.isNullAt(c)
      if (!bad) {
        val cv = rows.getArray(c)
        if (cv.numElements() != n) bad = true
        else {
          var s = 0.0
          var i = 0
          while (i < n && !bad) {
            if (vec.isNullAt(i) || cv.isNullAt(i)) bad = true
            else if (squared) { val d = vec.getDouble(i) - cv.getDouble(i); s += d * d }
            else s += vec.getDouble(i) * cv.getDouble(i)
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

  /** The hoisted left-vector of the cosine kernels: primitive copy plus
    * the full squared norm, computed ONCE per call. Sound because the
    * per-row semantics make both row-independent — the tail rule scans
    * every vec element into nx whatever the row's length, so nx is always
    * the full |v|², and a null anywhere in vec therefore poisons every
    * row (`null` is returned to signal that degenerate case). Halves the
    * per-element accessor work in the m×dim hot loop (measured 390 s →
    * 207 s at the 100× decontamination fixture, 6.4 → 3.6 s at 10×).
    */
  private[graftext] def hoistVec(vec: ArrayData): (Array[Double], Double) = {
    val n = vec.numElements()
    val vd = new Array[Double](n)
    var nx = 0.0
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val v = vec.getDouble(i)
      vd(i) = v; nx += v * v
      i += 1
    }
    (vd, nx)
  }

  /** The per-row half of the cosine kernels: `cos(vd, row c of mat)` with
    * [[CosineSimilarityExpr.nullSafeEval]]'s exact arithmetic (prefix dot
    * + tail-inclusive row norm; `nx` is the hoisted full |v|²; 0.0 on a
    * zero norm). Returns null (boxed) for an unscoreable row — a null
    * row or a null element — so [[matCos]] and [[MatCosStatsExpr.stats]]
    * share ONE copy of the null/mismatch/zero-norm contract.
    */
  private[graftext] def rowCos(vd: Array[Double], nx: Double,
                               mat: ArrayData, c: Int): java.lang.Double = {
    if (mat.isNullAt(c)) return null
    val rv = mat.getArray(c)
    val n = vd.length
    val m = rv.numElements()
    val common = math.min(n, m)
    var dot = 0.0; var ny = 0.0
    var i = 0
    while (i < common) {
      if (rv.isNullAt(i)) return null
      val yi = rv.getDouble(i)
      dot += vd(i) * yi; ny += yi * yi
      i += 1
    }
    var j = common
    while (j < m) {
      if (rv.isNullAt(j)) return null
      val v = rv.getDouble(j); ny += v * v
      j += 1
    }
    java.lang.Double.valueOf(
      if (nx == 0.0 || ny == 0.0) 0.0
      else dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  /** [[MatCosExpr]]'s kernel body: `cos(vec, row)` per matrix row, each
    * row computed exactly as [[CosineSimilarityExpr.nullSafeEval]] —
    * prefix dot + tail-inclusive norms, 0.0 on a zero norm.
    */
  def matCos(vec: ArrayData, mat: ArrayData): ArrayData = {
    val k = mat.numElements()
    if (vec == null) return new GenericArrayData(new Array[Any](k))
    val hoisted = hoistVec(vec)
    if (hoisted == null) return new GenericArrayData(new Array[Any](k))
    val (vd, nx) = hoisted
    val out = new Array[Double](k)
    var nulls: Array[Boolean] = null
    var c = 0
    while (c < k) {
      val sim = rowCos(vd, nx, mat, c)
      if (sim == null) {
        if (nulls == null) nulls = new Array[Boolean](k)
        nulls(c) = true
      } else out(c) = sim.doubleValue()
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

  /** [[VecSubExpr]]'s kernel body: elementwise `a − b`, zip_with-padded. */
  def vecSub(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements(); val m = b.numElements()
    val len = math.max(n, m)
    val common = math.min(n, m)
    var hasNull = false
    var i = 0
    while (i < common && !hasNull) {
      if (a.isNullAt(i) || b.isNullAt(i)) hasNull = true
      i += 1
    }
    if (!hasNull && len == common) {
      val out = new Array[Double](len)
      var j = 0
      while (j < len) { out(j) = a.getDouble(j) - b.getDouble(j); j += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](len)
      var j = 0
      while (j < len) {
        if (j < common && !a.isNullAt(j) && !b.isNullAt(j))
          out(j) = java.lang.Double.valueOf(a.getDouble(j) - b.getDouble(j))
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Column API: squared L2 distance from `vec` (`array<double>`) to each
    * row of `cents` (`array<array<double>>`).
    */
  def sqDistsCol(vec: Column, cents: Column): Column =
    ExpressionUtils.column(
      SqDistsExpr(ExpressionUtils.expression(vec), ExpressionUtils.expression(cents)))

  /** Column API: dot product of `vec` with each row of `mat`. */
  def matDotsCol(vec: Column, mat: Column): Column =
    ExpressionUtils.column(
      MatDotsExpr(ExpressionUtils.expression(vec), ExpressionUtils.expression(mat)))

  /** Column API: cosine similarity of `vec` with each row of `mat`. */
  def matCosCol(vec: Column, mat: Column): Column =
    ExpressionUtils.column(
      MatCosExpr(ExpressionUtils.expression(vec), ExpressionUtils.expression(mat)))

  /** Column API: elementwise `a − b` over two `array<double>` columns. */
  def vecSubCol(a: Column, b: Column): Column =
    ExpressionUtils.column(
      VecSubExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
