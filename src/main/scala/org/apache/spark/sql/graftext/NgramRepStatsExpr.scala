package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Per-document n-gram repetition statistics as ONE shuffle-free pass —
  * `struct(n_grams, top_cnt, n_distinct)` over the token array's
  * n-grams — replacing [[graft.operators.TextQuality.ngramRepetition]]'s
  * explode → groupBy(doc_id, hash) → groupBy(doc_id) plan, which pushed
  * one row PER GRAM (Σ tokens rows corpus-wide) through two shuffles to
  * compute an answer that never leaves the document. At 100 TB the
  * per-document statistic must not cost a corpus-wide gram shuffle; the
  * kernel's cost is one hash-map per document, proportional to that
  * document alone.
  *
  * Gram construction matches [[graft.operators.CorpusPrep.ngramsFromTokens]]
  * exactly: fewer than `n` tokens (including zero) → ONE whole-document
  * gram of all tokens joined by " " (empty string for an empty array);
  * otherwise the `size − n + 1` consecutive n-token joins; null tokens
  * are skipped by the join exactly as `concat_ws` skips them. Counting is
  * by exact gram string — the exploded plan groups by `xxhash64(gram)`,
  * identical in the absence of 64-bit collisions (the DuckDB oracle also
  * groups by the exact string). Null token array → null struct (the
  * exploded plan emits no rows for such documents; callers filter nulls).
  */
case class NgramRepStatsExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n > 0, "n must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = NgramRepStatsExpr.outType

  override def nullSafeEval(input: Any): Any =
    NgramRepStatsExpr.stats(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftext.NgramRepStatsExpr.stats($x, $n);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramRepStatsExpr {

  val outType: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  /** Join tokens `[from, until)` by a single space, skipping nulls — the
    * string `concat_ws(" ", …)` would produce.
    */
  private def joined(arr: ArrayData, from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder()
    var first = true
    var i = from
    while (i < until) {
      if (!arr.isNullAt(i)) {
        if (!first) sb.append(' ')
        first = false
        sb.append(arr.getUTF8String(i).toString)
      }
      i += 1
    }
    sb.toString
  }

  /** Kernel body (shared by eval and codegen): count each gram in a
    * per-document hash map; emit total, max count, and distinct count.
    */
  def stats(arr: ArrayData, n: Int): InternalRow = {
    val tot = arr.numElements()
    val counts = new java.util.HashMap[String, Long]()
    def add(g: String): Unit =
      counts.merge(g, 1L, (a, b) => java.lang.Long.valueOf(a + b))
    if (tot < n) add(joined(arr, 0, tot))
    else {
      var i = 0
      while (i <= tot - n) { add(joined(arr, i, i + n)); i += 1 }
    }
    var nGrams = 0L
    var topCnt = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      nGrams += c
      if (c > topCnt) topCnt = c
    }
    new GenericInternalRow(Array[Any](nGrams, topCnt, counts.size().toLong))
  }

  /** Column API: `struct(n_grams, top_cnt, n_distinct)` of the token
    * array's n-grams; null for a null array.
    */
  def ngramRepStats(tokens: Column, n: Int): Column =
    ExpressionUtils.column(NgramRepStatsExpr(ExpressionUtils.expression(tokens), n))
}
