package org.apache.spark.sql.graftext

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression fusing the streaming-side shingle-hash
  * chain: token array → 3-token shingles → 60-bit md5 prefix → mod prime,
  * i.e. `transform(shinglesFromTokens(toks), s => pmod(md5Long60(s), p))`
  * ([[graft.operators.Dedup.shinglesFromTokens]] /
  * [[graft.operators.Dedup.md5Long60]]) in ONE pass with no intermediate
  * shingle strings.
  *
  * The composable chain evaluates two nested interpreted-lambda HOFs per
  * document (shingle construction via `element_at`+`concat_ws`, then
  * md5 → hex → substring → base-16 `conv` per shingle); after the
  * [[MinHashSigExpr]] kernel landed, that chain was the dominant
  * per-document cost left in the w15 100× streaming-admission smoke.
  * This kernel walks the token array once, feeding each shingle's bytes
  * (tokens joined by a single space) straight into a thread-local MD5
  * digest and reducing the first 60 bits of the digest mod `prime` —
  * no hex string, no decimal round-trip, no per-element lambda.
  *
  * Semantics match the HOF chain EXACTLY (spec-pinned):
  *  - null token array → null (the `when`'s null-size condition falls to
  *    the otherwise branch, whose `sequence` bound is null → null array);
  *  - fewer than 3 tokens (including zero) → ONE whole-document shingle,
  *    the tokens joined by " " (md5 of "" for an empty array);
  *  - 3+ tokens → `n−2` consecutive 3-token shingles;
  *  - null tokens are skipped by the join exactly as `concat_ws` skips
  *    them (the separator count shrinks accordingly);
  *  - `conv(substr(md5(s),1,15),16,10)` = the digest's first 8 bytes as
  *    an unsigned big-endian 64-bit value `>>> 4` (15 hex chars = top 60
  *    bits), which is non-negative, so plain `%` IS `pmod`.
  *
  * `prime = 0` skips the final reduction and yields the raw 60-bit value
  * (= `md5Long60` itself) — the batch inverted-index path
  * ([[graft.operators.Dedup.distinctShingleHashes]]) carries full-width
  * h60 keys because the DuckDB oracles join on them.
  */
case class ShingleHashExpr(child: Expression, prime: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(prime >= 0, "prime must be non-negative (0 = raw 60-bit)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    ShingleHashExpr.hashShingles(arr, prime)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftext.ShingleHashExpr.hashShingles($x, ${prime}L);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The K-token-window generalization of [[ShingleHashExpr]]: one 60-bit
  * md5 hash per window start — `transform(sequence(0, n-K), i =>
  * md5Long60(concat_ws(" ", slice(toks, i+1, K))))` fused into a single
  * pass ([[graft.operators.Dedup.windowHashes]], feeding the x64/x65
  * substring-span family, the x77 substring decontaminator, and the w14
  * streaming gate).
  *
  * Unlike the shingle form there is no short-document fallback: the
  * relational call site guards with `where(size(toks) >= K)`, so an
  * under-length (or null-size) array never reaches the expression there;
  * for direct callers an under-length array yields an EMPTY hash array
  * (the composable form's `sequence(0, negative)` would instead walk
  * backwards — a shape the guard exists to exclude).
  */
case class WindowHashExpr(child: Expression, windowTokens: Int, prime: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(windowTokens > 0, "windowTokens must be positive")
  require(prime >= 0, "prime must be non-negative (0 = raw 60-bit)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashExpr.hashWindows(input.asInstanceOf[ArrayData], windowTokens, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = org.apache.spark.sql.graftext.ShingleHashExpr.hashWindows($x, $windowTokens, ${prime}L);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused rolling polynomial hash over a token stream — the x12
  * fingerprint fold `aggregate(toks, 0L, (acc, t) => pmod(acc*1000003 +
  * pmod(md5Long60(t), 1000000007), 2147483647))`
  * ([[graft.operators.TextQuality.fingerprints]]) as one primitive loop
  * with a per-token digest (no interpreted fold lambda, no hex
  * round-trip). All intermediate products fit in a long
  * (`acc < 2^31`, `acc*1000003 < 2^51`), so plain `%` over non-negative
  * operands IS `pmod`.
  *
  * Null semantics match the fold EXACTLY: null array → null; any null
  * token poisons the accumulator (`acc + null`) and the final result is
  * null; an empty array returns the 0 seed.
  */
case class RollingHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    ShingleHashExpr.rollingHash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${childGen.isNull}) {
        Long $boxed = org.apache.spark.sql.graftext.ShingleHashExpr.rollingHash(${childGen.value});
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashExpr {

  private val SpaceByte: Byte = ' '.toByte

  private val localMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of the finished digest (big-endian) mod `prime` —
    * exactly `conv(substr(md5hex, 1, 15), 16, 10) % prime`.
    */
  private def finish60(md: MessageDigest, prime: Long): Long = {
    val d = md.digest()
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (d(i) & 0xffL); i += 1 }
    if (prime > 0) (top >>> 4) % prime else top >>> 4
  }

  /** Feed tokens `[from, until)` of `arr` into `md`, joined by a single
    * space with null tokens skipped — the byte stream `concat_ws(" ", …)`
    * would produce.
    */
  private def updateJoined(md: MessageDigest, arr: ArrayData,
                           from: Int, until: Int): Unit = {
    var first = true
    var i = from
    while (i < until) {
      if (!arr.isNullAt(i)) {
        if (!first) md.update(SpaceByte)
        first = false
        md.update(arr.getUTF8String(i).getBytes)
      }
      i += 1
    }
  }

  /** The fused kernel body (shared by eval and codegen — the generated
    * code calls this static forwarder directly; the per-shingle work is
    * digest updates, so a method boundary costs nothing measurable).
    */
  def hashShingles(arr: ArrayData, prime: Long): ArrayData = {
    val md = localMd5.get()
    val n = arr.numElements()
    if (n < 3) {
      md.reset()
      updateJoined(md, arr, 0, n)
      UnsafeArrayData.fromPrimitiveArray(Array(finish60(md, prime)))
    } else {
      val out = new Array[Long](n - 2)
      var i = 0
      while (i < n - 2) {
        md.reset()
        updateJoined(md, arr, i, i + 3)
        out(i) = finish60(md, prime)
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  /** One hash per K-token window start: `n-K+1` entries for an `n`-token
    * array (empty when `n < K` — callers guard with `size(toks) >= K`).
    */
  def hashWindows(arr: ArrayData, windowTokens: Int, prime: Long): ArrayData = {
    val md = localMd5.get()
    val n = arr.numElements()
    if (n < windowTokens) {
      UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    } else {
      val out = new Array[Long](n - windowTokens + 1)
      var i = 0
      while (i < out.length) {
        md.reset()
        updateJoined(md, arr, i, i + windowTokens)
        out(i) = finish60(md, prime)
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  /** The x12 rolling-fingerprint fold (see [[RollingHashExpr]]); null when
    * any token is null — `acc + null` poisons the HOF fold the same way.
    */
  def rollingHash(arr: ArrayData): java.lang.Long = {
    val md = localMd5.get()
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      val hmod = finish60(md, 0L) % 1000000007L
      acc = (acc * 1000003L + hmod) % 2147483647L
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Column API: per-document shingle-hash array — 3-token shingles,
    * 60-bit md5 prefix, reduced mod `prime`.
    */
  def shingleHashes(tokens: Column, prime: Long): Column =
    ExpressionUtils.column(ShingleHashExpr(ExpressionUtils.expression(tokens), prime))

  /** Column API: per-document K-token window-hash array (raw 60-bit when
    * `prime = 0`).
    */
  def windowHashes(tokens: Column, windowTokens: Int, prime: Long): Column =
    ExpressionUtils.column(
      WindowHashExpr(ExpressionUtils.expression(tokens), windowTokens, prime))

  /** Column API: the x12 rolling polynomial fingerprint of a token array. */
  def rollingFingerprint(tokens: Column): Column =
    ExpressionUtils.column(RollingHashExpr(ExpressionUtils.expression(tokens)))
}
