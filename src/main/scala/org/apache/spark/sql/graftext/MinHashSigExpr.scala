package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression for the MinHash signature kernel: given a
  * document's shingle-hash array `hs` (each already reduced mod `prime`),
  * return the `k`-vector `[ min_j pmod(hs(j)*as(i) + bs(i), prime) ]` for
  * `i < k` — the inner loop of [[graft.operators.Dedup.minhashSignatures]]
  * and the per-row streaming signature in
  * [[graft.streaming.DocStream.incrementalAdmissionStream]].
  *
  * The composable form — `transform(sequence(0, k-1), i => array_min(
  * transform(hs, h => pmod(h*a_i + b_i, p))))` — evaluates k×|hs|
  * interpreted lambda applications and allocates k intermediate arrays per
  * row; Spark's higher-order functions run their lambdas on the
  * interpreted path even inside whole-stage codegen. This expression runs
  * one fused primitive loop (|hs| iterations × k register-resident mins)
  * and `doGenCode` emits straight-line Java — the shape a 100-TB
  * admission stream computing a signature per arriving document wants.
  * The w15 100× smoke put the per-document signature algebra at ~4.5 ms;
  * this kernel removes the interpreted-lambda component of that cost.
  *
  * Semantics match the HOF form EXACTLY (spec-pinned by equality over the
  * fixture corpus and every edge shape):
  *  - null elements are skipped (as `array_min` ignores nulls);
  *  - an empty array — or one of only nulls — yields a k-vector of nulls
  *    (`array_min` of an empty/all-null array is null);
  *  - a NULL input array also yields the k-vector of nulls, NOT null: the
  *    HOF's outer `transform` runs over the literal `sequence(0, k-1)`,
  *    so each position evaluates `array_min(transform(NULL, …))` = null —
  *    the expression is therefore never-null (`nullable = false`);
  *  - arithmetic is exact: `hs(j) < prime ≤ 2^31-1` and
  *    `as(i), bs(i) < prime`, so `h*a + b < 2^63` never overflows and
  *    plain `%` (with a defensive negative adjust) IS `pmod`.
  */
case class MinHashSigExpr(child: Expression, as: Array[Long], bs: Array[Long],
                          prime: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(as.length == bs.length && as.nonEmpty, "as/bs must be same non-zero length")

  // Array fields compare by reference under the generated case-class
  // equals, so two independently built but identical kernels would never
  // compare equal — silently defeating every canonicalized-plan match
  // (CacheManager substitution, ReuseExchange, CSE) for plans that build
  // the signature at two call sites. Structural equality restores them;
  // arrays could only ever fail to match, never falsely match, so this is
  // purely a plan-reuse (perf) contract.
  override def equals(other: Any): Boolean = other match {
    case m: MinHashSigExpr =>
      child == m.child && prime == m.prime &&
        java.util.Arrays.equals(as, m.as) && java.util.Arrays.equals(bs, m.bs)
    case _ => false
  }
  override def hashCode(): Int = {
    var h = child.hashCode()
    h = h * 31 + java.util.Arrays.hashCode(as)
    h = h * 31 + java.util.Arrays.hashCode(bs)
    h * 31 + java.lang.Long.hashCode(prime)
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val k = as.length
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(new Array[Any](k))
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val h = arr.getLong(j)
        var i = 0
        while (i < k) {
          var r = (h * as(i) + bs(i)) % prime
          if (r < 0) r += prime
          if (r < mins(i)) mins(i) = r
          i += 1
        }
      }
      j += 1
    }
    if (any) UnsafeArrayData.fromPrimitiveArray(mins)
    else new GenericArrayData(new Array[Any](k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    val k = as.length
    val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val mins = ctx.freshName("mins"); val any = ctx.freshName("any")
    val arr = ctx.freshName("arr"); val h = ctx.freshName("h"); val r = ctx.freshName("r")
    ev.copy(code = code"""
      ${childGen.code}
      long[] $mins = new long[$k];
      java.util.Arrays.fill($mins, Long.MAX_VALUE);
      boolean $any = false;
      if (!${childGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
        int $n = $arr.numElements();
        for (int $j = 0; $j < $n; $j++) {
          if ($arr.isNullAt($j)) continue;
          $any = true;
          long $h = $arr.getLong($j);
          for (int $i = 0; $i < $k; $i++) {
            long $r = ($h * $asRef[$i] + $bsRef[$i]) % ${prime}L;
            if ($r < 0) $r += ${prime}L;
            if ($r < $mins[$i]) $mins[$i] = $r;
          }
        }
      }
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $any
        ? (org.apache.spark.sql.catalyst.util.ArrayData)
            org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins)
        : (org.apache.spark.sql.catalyst.util.ArrayData)
            new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k]);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** Column API: the k-permutation MinHash signature of an `array<long>`
    * shingle-hash column (hashes pre-reduced mod `prime`).
    */
  def minhashSig(hs: Column, as: Array[Long], bs: Array[Long], prime: Long): Column =
    ExpressionUtils.column(
      MinHashSigExpr(ExpressionUtils.expression(hs), as, bs, prime))
}
