package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document sentence-pair token-set cosine as ONE shuffle-free pass —
  * `array<struct<i, j, sim>>` over a document's kept sentences — replacing
  * [[graft.operators.Summarizer.sentenceSimilaritiesDf]]'s
  * explode → (doc_id, token) self-join → three joins plan, which pushed
  * one row PER SENTENCE-TOKEN corpus-wide through shuffle machinery to
  * compute an answer that never leaves the document (the same shape the
  * n-gram kernel killed for x27). At 100 TB the per-document pair list
  * must not cost corpus-wide token shuffles; the kernel's cost is one
  * pass over each document's own sentences.
  *
  * Semantics match the relational arm EXACTLY (spec-pinned):
  *  - sentences: split on `[.!?]+`, Java-`trim` each piece, keep non-empty
  *    pieces with ≥ 3 whitespace-separated words
  *    ([[graft.functions.TextFns.sentences]]); `sidx` is 1-based over the
  *    KEPT sentences;
  *  - per-sentence DISTINCT token set: `\b[a-z]{3,}\b` over the lowercased
  *    sentence minus the stopword set ([[graft.functions.TextFns.tokens]]
  *    + `array_distinct`);
  *  - pairs (i < j) with ≥ 1 common token (the inner join's contract —
  *    zero-overlap pairs never existed in the relational plan either);
  *    sentences with an EMPTY token set never pair (they had no rows in
  *    the token index);
  *  - sim = round(|∩| / sqrt(|s_i|·|s_j|), 6), HALF_UP like Spark's
  *    `round`.
  *
  * Null text → null (the relational arm emits no rows; callers filter).
  * The stopword set ships as a reference object, hashed once per executor.
  */
case class SentencePairSimsExpr(child: Expression, pattern: String,
                                stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(SentencePairSimsExpr.pairType,
    containsNull = false)

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.length * 2)
    stopwords.foreach(s.add)
    s
  }

  @transient private lazy val regex: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  override def nullSafeEval(input: Any): Any =
    SentencePairSimsExpr.pairs(input.asInstanceOf[UTF8String], regex, set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", set, "java.util.HashSet")
    val reRef = ctx.addReferenceObj("wordRe", regex, "java.util.regex.Pattern")
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftext.SentencePairSimsExpr.pairs($x, $reRef, $setRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SentencePairSimsExpr {

  val pairType: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))

  /** Kept sentences of `text` (split / trim / ≥3-word filter — the
    * [[graft.functions.TextFns.sentences]] contract).
    */
  private def keptSentences(text: String): Array[String] =
    text.split("[.!?]+", -1).iterator
      .map(_.trim)
      .filter(s => s.nonEmpty && {
        var words = 0
        for (w <- s.split("\\s+")) if (w.nonEmpty) words += 1
        words >= 3
      })
      .toArray

  /** Distinct non-stopword word tokens of one sentence. */
  private def tokenSet(s: String, regex: java.util.regex.Pattern,
                       stop: java.util.HashSet[String]): java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    val m = regex.matcher(s.toLowerCase(java.util.Locale.ROOT))
    while (m.find()) {
      val w = m.group()
      if (!stop.contains(w)) out.add(w)
    }
    out
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Kernel body (shared by eval and codegen): all co-tokened sentence
    * pairs (i < j, 1-based) with their 6-dp-rounded set cosine.
    */
  def pairs(text: UTF8String, regex: java.util.regex.Pattern,
            stop: java.util.HashSet[String]): GenericArrayData = {
    val sents = keptSentences(text.toString)
    val n = sents.length
    val sets = new Array[java.util.HashSet[String]](n)
    var i = 0
    while (i < n) { sets(i) = tokenSet(sents(i), regex, stop); i += 1 }
    val out = new java.util.ArrayList[Any]()
    i = 0
    while (i < n) {
      val a = sets(i)
      if (!a.isEmpty) {
        var j = i + 1
        while (j < n) {
          val b = sets(j)
          if (!b.isEmpty) {
            // count the intersection by probing the smaller set's entries
            val (small, large) = if (a.size <= b.size) (a, b) else (b, a)
            var common = 0
            val it = small.iterator()
            while (it.hasNext) if (large.contains(it.next())) common += 1
            if (common > 0) {
              val sim = round6(common / math.sqrt(a.size.toDouble * b.size))
              out.add(new GenericInternalRow(
                Array[Any]((i + 1).toLong, (j + 1).toLong, sim)))
            }
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: `array<struct<i, j, sim>>` of the document's co-tokened
    * sentence pairs; null for null text.
    */
  def sentencePairSims(text: Column, pattern: String,
                       stopwords: Seq[String]): Column =
    ExpressionUtils.column(SentencePairSimsExpr(
      ExpressionUtils.expression(text), pattern, stopwords))
}
