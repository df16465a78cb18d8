package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Native Catalyst expression for the SimHash fingerprint kernel: given a
  * document's `array<struct<h: long, cnt: long>>` of (token-hash, count)
  * pairs, return the `bits`-wide fingerprint — bit i set iff
  * `Σ_j (h_j bit i set ? +cnt_j : −cnt_j) > 0`.
  *
  * Replaces the nested-HOF form in
  * [[graft.operators.Dedup.simhashSignatures]] (`aggregate(transform(
  * masks, m => when(aggregate(hc, …)))…)`), which evaluated
  * bits×|tokens| interpreted lambda applications per document — Spark's
  * higher-order functions run lambdas on the interpreted path even inside
  * whole-stage codegen. This kernel makes one pass over the token list
  * with a `long[bits]` accumulator and packs the sign bits at the end;
  * `doGenCode` emits straight-line Java.
  *
  * Null semantics match the HOF form EXACTLY (spec-pinned):
  *  - a NULL input array → 0L, NOT null: each per-bit inner aggregate
  *    over a null list is null, `when(null > 0, m).otherwise(0)` takes
  *    the otherwise branch, and the outer sum of zeros is 0 — so the
  *    expression is never-null (`nullable = false`);
  *  - an empty array → 0L (every per-bit aggregate returns its 0 seed);
  *  - a null element, or an element with null `cnt`, poisons every
  *    per-bit sum from that entry on (`acc + null` is null), so the HOF
  *    yields no set bits — fingerprint 0L;
  *  - a null `h` with non-null `cnt` contributes −cnt to every bit
  *    (`when(null ≠ 0, cnt).otherwise(−cnt)` takes the otherwise branch).
  */
case class SimHashSigExpr(child: Expression, bits: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 63, "bits must be in (0, 63]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.length == 2 && st.fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash_sig expects array<struct<long, long>>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sums = new Array[Long](bits)
    var poisoned = false
    var j = 0
    while (j < n && !poisoned) {
      if (arr.isNullAt(j)) poisoned = true
      else {
        val e = arr.getStruct(j, 2)
        if (e.isNullAt(1)) poisoned = true
        else {
          val cnt = e.getLong(1)
          if (e.isNullAt(0)) {
            var i = 0
            while (i < bits) { sums(i) -= cnt; i += 1 }
          } else {
            val h = e.getLong(0)
            var i = 0
            while (i < bits) {
              sums(i) += (if (((h >>> i) & 1L) != 0L) cnt else -cnt)
              i += 1
            }
          }
        }
      }
      j += 1
    }
    if (poisoned) 0L
    else {
      var out = 0L
      var i = 0
      while (i < bits) { if (sums(i) > 0L) out |= (1L << i); i += 1 }
      out
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val sums = ctx.freshName("sums"); val poisoned = ctx.freshName("poisoned")
    val arr = ctx.freshName("arr"); val e = ctx.freshName("e")
    val h = ctx.freshName("h"); val cnt = ctx.freshName("cnt")
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = 0L;
      if (!${childGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
        int $n = $arr.numElements();
        long[] $sums = new long[$bits];
        boolean $poisoned = false;
        for (int $j = 0; $j < $n && !$poisoned; $j++) {
          if ($arr.isNullAt($j)) { $poisoned = true; continue; }
          org.apache.spark.sql.catalyst.InternalRow $e = $arr.getStruct($j, 2);
          if ($e.isNullAt(1)) { $poisoned = true; continue; }
          long $cnt = $e.getLong(1);
          if ($e.isNullAt(0)) {
            for (int $i = 0; $i < $bits; $i++) $sums[$i] -= $cnt;
          } else {
            long $h = $e.getLong(0);
            for (int $i = 0; $i < $bits; $i++) {
              $sums[$i] += ((($h >>> $i) & 1L) != 0L) ? $cnt : -$cnt;
            }
          }
        }
        if (!$poisoned) {
          for (int $i = 0; $i < $bits; $i++) {
            if ($sums[$i] > 0L) ${ev.value} |= (1L << $i);
          }
        }
      }
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSigExpr {
  /** Column API: the `bits`-wide SimHash fingerprint of an
    * `array<struct<h: long, cnt: long>>` token-hash/count column.
    */
  def simhashSig(hc: Column, bits: Int): Column =
    ExpressionUtils.column(SimHashSigExpr(ExpressionUtils.expression(hc), bits))
}
