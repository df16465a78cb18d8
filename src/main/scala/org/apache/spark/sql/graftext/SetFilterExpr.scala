package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression fusing the engine's hottest lambda: the
  * fixed-set membership filter under every tokenizer call —
  * `filter(words, w => !array_contains(lit(set), w))`
  * ([[graft.functions.TextFns.tokens]]' stopword cut, evaluated once per
  * word of every document every time ANY text operator tokenizes) and its
  * keep-matches twin (`TextQuality.langId`'s per-language marker hits,
  * `qualityScore`'s stopword counter).
  *
  * The HOF chain costs, PER WORD, one interpreted lambda application plus
  * an `ArrayContains` linear scan over the whole set (~94 UTF8String
  * comparisons for the stopword list); this kernel costs one hash-set
  * probe inside generated code. The set is a plan-construction-time
  * constant, so it ships as a reference object (hashed once per executor,
  * not per row).
  *
  * Semantics match the HOF EXACTLY (spec-pinned in TextFnsSpec):
  *  - null array → null;
  *  - a null ELEMENT is dropped on both arms: `array_contains(set, null)`
  *    is null (the set holds no nulls), the negation stays null, and
  *    `filter` keeps only predicate-TRUE elements;
  *  - otherwise keep iff binary-exact membership == `keepMatches`;
  *  - order and duplicates preserved.
  *
  * Equality/canonicalization: `words` is a `Seq[String]` (structural
  * equality — the [[MinHashSigExpr]] r9 lesson), so two call sites with
  * the same set canonicalize identically and cache substitution /
  * ReuseExchange / CSE keep working.
  */
case class SetFilterExpr(child: Expression, words: Seq[String],
                         keepMatches: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = child.dataType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    SetFilterExpr.filterBySet(input.asInstanceOf[ArrayData], set, keepMatches)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftext.SetFilterExpr.filterBySet($x, $setRef, $keepMatches);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SetFilterExpr {

  /** The kernel body (shared by eval and codegen). References returned by
    * `getUTF8String` may point into reused row buffers, but the output is
    * consumed by the parent projection within the same row — the same
    * lifetime contract Spark's own collection expressions rely on.
    */
  def filterBySet(arr: ArrayData, set: java.util.HashSet[UTF8String],
                  keepMatches: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (set.contains(s) == keepMatches) {
          out(k) = s
          k += 1
        }
      }
      i += 1
    }
    if (k == n) new GenericArrayData(out)
    else {
      val trimmed = new Array[Any](k)
      System.arraycopy(out, 0, trimmed, 0, k)
      new GenericArrayData(trimmed)
    }
  }

  /** Column API: elements of `arr` NOT in `words` (order/dups preserved) —
    * the tokenizer's stopword cut.
    */
  def withoutSet(arr: Column, words: Seq[String]): Column =
    ExpressionUtils.column(SetFilterExpr(ExpressionUtils.expression(arr),
      words, keepMatches = false))

  /** Column API: elements of `arr` IN `words` — marker/stopword hit
    * extraction (`size(...)` on top counts them like the HOF form).
    */
  def inSet(arr: Column, words: Seq[String]): Column =
    ExpressionUtils.column(SetFilterExpr(ExpressionUtils.expression(arr),
      words, keepMatches = true))
}
