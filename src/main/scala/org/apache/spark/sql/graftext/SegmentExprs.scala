package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The tokenizer-segmentation kernels: the per-WORD merge/match/DP folds of
  * the three subword tokenizers (BPE x46/x48, WordPiece x72/x73, unigram-LM
  * x74/x75/x80) as native Catalyst expressions. Each replaces an
  * interpreted `aggregate` HOF whose lambda re-ran per character of every
  * vocabulary word (with per-step string rebuilds — the BPE merge fold and
  * the WordPiece accumulator are O(len²) string churn per word, ×10 merge
  * passes for BPE), the same shape [[SetFilterExpr]] killed for the
  * stopword cut. The folds only ever run on the Zipf-compressed word table,
  * so the 1× win is a constant — but at 100× the word table is the
  * x-retrieval cohort's measured floor (x48 76.6 s, x73 63.0 s, x74 61.0 s,
  * x75 123.0 s warm), and the constant IS the cost.
  *
  * House contract (the SetFilterExpr/NgramRepStatsExpr pattern): eval and
  * doGenCode dispatch into ONE static body; model state (merge list /
  * vocabulary set / log-prob map) is a plan-construction-time constant
  * shipped as a reference object, built once per executor; the HOF forms
  * stay in the operators as the spec-pinned reference arms; each kernel is
  * SQL-registered. Model arguments are canonically ORDERED `Seq`s so two
  * call sites with the same model canonicalize identically (the
  * [[MinHashSigExpr]] r9 structural-equality lesson).
  */

/** BPE apply pass: segment one word with an already-learned merge list —
  * the kernel form of [[graft.operators.Bpe.segment]]'s
  * `foldLeft(mergePass)` fold. Semantics match the HOF arm exactly
  * (spec-pinned):
  *  - initial symbols = the word's characters plus the `</w>` marker;
  *  - each merge (a, b) is one left-to-right greedy non-overlapping pass:
  *    append symbol x to the output; if the previous symbol == a and
  *    x == b, fuse them into a‖b instead (a just-fused symbol never acts
  *    as the left side again within the same pass — Sennrich 2016);
  *  - pieces = the final symbol sequence; empty word → `["</w>"]` (the
  *    fold's `acc === ""` branch swallows the empty leading symbol).
  * Null word → null.
  */
case class BpeSegmentExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val mergeArr: Array[Array[String]] =
    merges.map(p => Array(p._1, p._2)).toArray

  override def nullSafeEval(input: Any): Any =
    BpeSegmentExpr.segment(input.asInstanceOf[UTF8String], mergeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mergeArr, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftext.BpeSegmentExpr.segment($x, $mRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeSegmentExpr {

  /** Kernel body (shared by eval and codegen). */
  def segment(word: UTF8String, merges: Array[Array[String]]): GenericArrayData = {
    val w = word.toString
    // initial symbolization: chars + the end-of-word marker
    var n = w.length + 1
    var syms = new Array[String](n)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    syms(w.length) = graft.operators.Bpe.Eow
    var m = 0
    while (m < merges.length && n > 1) {
      val a = merges(m)(0)
      val b = merges(m)(1)
      val out = new Array[String](n)
      var k = 0
      var j = 0
      while (j < n) {
        val x = syms(j)
        if (k > 0 && x == b && out(k - 1) == a) out(k - 1) = out(k - 1) + x
        else { out(k) = x; k += 1 }
        j += 1
      }
      syms = out
      n = k
      m += 1
    }
    val pieces = new Array[Any](n)
    i = 0
    while (i < n) { pieces(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(pieces)
  }

  /** Column API: the word's BPE pieces under `merges` (rank order). */
  def bpeSegment(word: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeSegmentExpr(ExpressionUtils.expression(word), merges))
}

/** WordPiece greedy longest-match segmentation against a learned piece
  * vocabulary — the kernel form of
  * [[graft.operators.Wordpiece.segmentWords]]'s accumulator fold (which
  * additionally paid a per-step `regexp_replace` to recover the consumed
  * position, and an `array_contains` linear scan per candidate length).
  * Semantics match the HOF arm exactly (spec-pinned):
  *  - from the current position take the LONGEST vocabulary piece
  *    (lengths `min(maxLen, remaining) .. 1`) and advance past it;
  *  - if NO piece fits at some position, the result is null (the fold's
  *    accumulator went null through `concat` with the null best-length;
  *    under the trained vocabulary this cannot happen — single characters
  *    are always in vocab — but the kernel must mirror the arm on
  *    arbitrary input);
  *  - empty word → `[""]` (`split("", " ")`).
  * Null word → null.
  */
case class WordpieceSegmentExpr(child: Expression, vocab: Seq[String],
                                maxLen: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(maxLen > 0, "maxLen must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    WordpieceSegmentExpr.segment(input.asInstanceOf[UTF8String], set, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wpVocab", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftext.WordpieceSegmentExpr.segment($x, $setRef, $maxLen);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordpieceSegmentExpr {

  /** Kernel body (shared by eval and codegen); null = "no piece fits". */
  def segment(word: UTF8String, vocab: java.util.HashSet[String],
              maxLen: Int): GenericArrayData = {
    val w = word.toString
    if (w.isEmpty) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val out = new java.util.ArrayList[Any]()
    var p = 0
    while (p < w.length) {
      var l = math.min(maxLen, w.length - p)
      var fit = -1
      while (l >= 1 && fit < 0) {
        if (vocab.contains(w.substring(p, p + l))) fit = l
        l -= 1
      }
      if (fit < 0) return null
      out.add(UTF8String.fromString(w.substring(p, p + fit)))
      p += fit
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: the word's greedy longest-match pieces; null when some
    * position has no matching piece.
    */
  def wordpieceSegment(word: Column, vocab: Seq[String], maxLen: Int): Column =
    ExpressionUtils.column(WordpieceSegmentExpr(
      ExpressionUtils.expression(word), vocab, maxLen))
}

/** Unigram-LM Viterbi segmentation of one word under a piece→log-prob
  * model — the kernel form of [[graft.operators.UnigramLm]]'s `dpExpr`
  * fold plus the backwalk, returning
  * `struct(n_pieces, score, pieces array<string>)` in one pass.
  * Semantics match the HOF arms exactly (spec-pinned):
  *  - dp over prefix lengths: dp(i) = max over piece lengths
  *    l ∈ 1..min(maxLen, i) with word[i−l, i) in the model of
  *    (dp(i−l).score + logp, dp(i−l).negn − 1), struct-lexicographic max
  *    (score first, then FEWEST pieces), computed in the identical double
  *    arithmetic; a prefix with no candidate takes the −1e18 sentinel with
  *    negn = 0 (possible only under RESTRICTED models — the EM-pruned
  *    vocabulary — where the relational arm's `coalesce` does the same);
  *  - a word with NO in-vocab substring at all → null (the relational
  *    arm's inner join against the word's substring-map drops the row;
  *    callers filter);
  *  - `pieces` is the backwalk taking, from each consumed position, the
  *    SMALLEST l whose candidate equals dp bit-for-bit (exact double
  *    equality — the winner's value IS that expression); when the final
  *    state is unreachable (sentinel) `pieces` is null and a consumer's
  *    `explode` drops the word, exactly like the arm's null-walk.
  * Null word → null. Model ships as (pieces, logps) parallel Seqs, sorted
  * by piece at construction for canonical structural equality.
  */
case class UnigramViterbiExpr(child: Expression, pieces: Seq[String],
                              logps: Seq[Double], maxLen: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(pieces.length == logps.length, "pieces/logps must align")
  require(maxLen > 0, "maxLen must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = UnigramViterbiExpr.outType
  override def nullable: Boolean = true

  @transient private lazy val model: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), logps(i)); i += 1 }
    m
  }

  override def nullSafeEval(input: Any): Any =
    UnigramViterbiExpr.viterbi(input.asInstanceOf[UTF8String], model, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("ugModel", model, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftext.UnigramViterbiExpr.viterbi($x, $mRef, $maxLen);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramViterbiExpr {

  val outType: StructType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = true)))

  /** The relational arm's "unreachable prefix" sentinel score. */
  val Sentinel: Double = -1.0e18

  /** Kernel body (shared by eval and codegen); null = "no in-vocab
    * substring" (the arm's inner-join drop).
    */
  def viterbi(word: UTF8String, model: java.util.HashMap[String, java.lang.Double],
              maxLen: Int): InternalRow = {
    val w = word.toString
    val len = w.length
    val score = new Array[Double](len + 1)
    val negn = new Array[Int](len + 1)
    var any = false
    var i = 1
    while (i <= len) {
      var bestScore = 0.0d
      var bestNegn = 0
      var found = false
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        val lp = model.get(w.substring(i - l, i))
        if (lp != null) {
          any = true
          // sentinel prefixes still form candidates (score −1e18 + logp),
          // exactly as the relational arm's fold does
          val cs = score(i - l) + lp.doubleValue()
          val cn = negn(i - l) - 1
          if (!found || cs > bestScore || (cs == bestScore && cn > bestNegn)) {
            bestScore = cs
            bestNegn = cn
            found = true
          }
        }
        l += 1
      }
      if (found) { score(i) = bestScore; negn(i) = bestNegn }
      else { score(i) = Sentinel; negn(i) = 0 }
      i += 1
    }
    if (!any) return null
    // backwalk: smallest l whose candidate equals dp bit-for-bit
    // an absorbed-sentinel final score (−1e18 + logp rounds back to −1e18)
    // always has a coalesce-sentinel ancestor where the arm's walk nulls
    // out, so skipping the backwalk for it reproduces the arm exactly
    var piecesArr: GenericArrayData = null
    if (score(len) > Sentinel) {
      val lens = new java.util.ArrayList[Integer]()
      var p = len
      var ok = true
      while (p > 0 && ok) {
        var l = 1
        var fit = -1
        val lMax = math.min(maxLen, p)
        while (l <= lMax && fit < 0) {
          val lp = model.get(w.substring(p - l, p))
          if (lp != null &&
              score(p - l) + lp.doubleValue() == score(p) &&
              negn(p - l) - 1 == negn(p)) fit = l
          l += 1
        }
        if (fit < 0) ok = false
        else { lens.add(fit); p -= fit }
      }
      if (ok) {
        val k = lens.size()
        val out = new Array[Any](k)
        var pos = 0
        var j = k - 1 // walk collected right-to-left; emit left-to-right
        var idx = 0
        while (j >= 0) {
          val l = lens.get(j).intValue()
          out(idx) = UTF8String.fromString(w.substring(pos, pos + l))
          pos += l
          idx += 1
          j -= 1
        }
        piecesArr = new GenericArrayData(out)
      }
    }
    new GenericInternalRow(Array[Any](
      (-negn(len)).toLong, score(len), piecesArr))
  }

  /** Column API: `struct(n_pieces, score, pieces)` of the word's Viterbi
    * segmentation under the (piece, logp) model; null when the word has no
    * in-vocab substring.
    */
  def unigramViterbi(word: Column, model: Seq[(String, Double)],
                     maxLen: Int): Column = {
    val sorted = model.sortBy(_._1)
    ExpressionUtils.column(UnigramViterbiExpr(
      ExpressionUtils.expression(word), sorted.map(_._1), sorted.map(_._2),
      maxLen))
  }
}
