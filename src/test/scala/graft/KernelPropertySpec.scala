package graft

import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized equality of every fused kernel against its retained HOF
  * reference form — the hand-built edge frames in the per-kernel specs
  * pin the KNOWN edge shapes; this spec throws seeded random input at the
  * same contracts (sizes 0–12, ~10% null elements, ~10% null arrays,
  * mismatched row lengths, multi-byte and space-bearing tokens) so an
  * unanticipated shape difference between the primitive loop and the HOF
  * chain cannot hide. Batched: each property samples one deterministic
  * 300-row frame (fixed ScalaCheck seed — no flakes) and compares the
  * kernel column with the HOF column row-by-row in BOTH the codegen and
  * interpreted paths.
  */
class KernelPropertySpec extends SparkSpec {

  private val N = 300
  private val params = Gen.Parameters.default

  private def sample[A](g: Gen[A], seed: Long): A = g.pureApply(params, Seed(seed))

  private def frame(schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)

  /** Run `body` under whole-stage codegen, then again fully interpreted. */
  private def bothPaths(body: => Unit): Unit = {
    body
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try body
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  private def assertEqual(df: DataFrame, kernel: Column, hof: Column): Unit = {
    val rows = df.select(kernel.as("k"), hof.as("h")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.get(0) == r.get(1), s"row $i: kernel=${r.get(0)} hof=${r.get(1)}")
    }
  }

  private def arrGen[A](elem: Gen[A], maxLen: Int = 12): Gen[Any] =
    Gen.frequency(
      9 -> Gen.chooseNum(0, maxLen).flatMap(n =>
        Gen.listOfN(n, Gen.frequency(9 -> elem.map(_.asInstanceOf[Any]),
          1 -> Gen.const(null: Any))).map(_.toSeq)),
      1 -> Gen.const(null: Any))

  test("random hash arrays: minhash_sig equals the HOF form, both paths") {
    val as = Dedup.HashParams.map(_._1).toArray
    val bs = Dedup.HashParams.map(_._2).toArray
    val hof = transform(sequence(lit(0), lit(Dedup.NumHashes - 1)), i =>
      array_min(transform(col("hs"), h =>
        pmod(h * element_at(lit(as), i + 1) + element_at(lit(bs), i + 1),
          lit(Dedup.Prime)))))
    val schema = StructType(Seq(
      StructField("hs", ArrayType(LongType, containsNull = true), nullable = true)))
    val rows = sample(
      Gen.listOfN(N, arrGen(Gen.chooseNum(0L, Dedup.Prime - 1))), 0xA11CE1L)
      .map(Row(_))
    val df = frame(schema, rows)
    bothPaths(assertEqual(df,
      org.apache.spark.sql.graftext.MinHashSigExpr
        .minhashSig(col("hs"), as, bs, Dedup.Prime), hof))
  }

  test("random (h, cnt) lists: simhash_sig equals the HOF form, both paths") {
    val masks = lit(Array.tabulate(Dedup.SimhashBits)(1L << _))
    val hof = aggregate(
      transform(masks, m =>
        when(aggregate(col("hc"), lit(0L), (acc, e) =>
          acc + when(e("h").bitwiseAND(m) =!= 0, e("cnt")).otherwise(-e("cnt"))) > 0,
          m).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    val entry = StructType(Seq(StructField("h", LongType, nullable = true),
      StructField("cnt", LongType, nullable = true)))
    val schema = StructType(Seq(
      StructField("hc", ArrayType(entry, containsNull = true), nullable = true)))
    val hGen: Gen[Any] = Gen.frequency(
      9 -> Gen.chooseNum(0L, (1L << 60) - 1).map(_.asInstanceOf[Any]),
      1 -> Gen.const(null: Any))
    val cntGen: Gen[Any] = Gen.frequency(
      9 -> Gen.chooseNum(0L, 9L).map(_.asInstanceOf[Any]),
      1 -> Gen.const(null: Any))
    val structGen: Gen[Any] =
      for (h <- hGen; c <- cntGen) yield Row(h, c): Any
    val rows = sample(Gen.listOfN(N, arrGen(structGen)), 0xA11CE2L).map(Row(_))
    val df = frame(schema, rows)
    bothPaths(assertEqual(df,
      org.apache.spark.sql.graftext.SimHashSigExpr
        .simhashSig(col("hc"), Dedup.SimhashBits), hof))
  }

  private val tokGen: Gen[Any] = Gen.frequency(
    6 -> Gen.alphaLowerStr.map(_.take(6): Any),
    1 -> Gen.const("日本語": Any),
    1 -> Gen.const("héllo wörld": Any), // embedded space: join must not care
    1 -> Gen.const("": Any),
    1 -> Gen.const(null: Any))

  private def tokFrame(seed: Long): DataFrame = {
    val schema = StructType(Seq(
      StructField("toks", ArrayType(StringType, containsNull = true), nullable = true)))
    frame(schema, sample(Gen.listOfN(N, arrGen(tokGen)), seed).map(Row(_)))
  }

  test("random token arrays: shingle_hashes and rolling_fingerprint equal " +
       "their HOF forms, both paths") {
    import org.apache.spark.sql.graftext.ShingleHashExpr.{rollingFingerprint, shingleHashes}
    val df = tokFrame(0xA11CE3L)
    val hofShingle = transform(Dedup.shinglesFromTokens(col("toks")),
      s => pmod(Dedup.md5Long60(s), lit(Dedup.Prime)))
    val hofRoll = aggregate(col("toks"), lit(0L),
      (acc, t) => pmod(acc * 1000003L + pmod(Dedup.md5Long60(t), lit(1000000007L)),
        lit(2147483647L)))
    bothPaths {
      assertEqual(df, shingleHashes(col("toks"), Dedup.Prime), hofShingle)
      assertEqual(df, rollingFingerprint(col("toks")), hofRoll)
    }
  }

  test("random token arrays: window_hashes equals the HOF form on covered " +
       "lengths; under-length arrays yield empty, both paths") {
    import org.apache.spark.sql.graftext.ShingleHashExpr.windowHashes
    val w = 3
    val df = tokFrame(0xA11CE4L)
    // the HOF form's sequence(0, n-w) is only well-defined for n >= w
    val hof = transform(sequence(lit(0), size(col("toks")) - w), i =>
      pmod(Dedup.md5Long60(concat_ws(" ", slice(col("toks"), i + 1, lit(w)))),
        lit(Dedup.Prime)))
    bothPaths {
      assertEqual(df.where(size(col("toks")) >= w),
        windowHashes(col("toks"), w, Dedup.Prime), hof)
      val short = df.where(size(col("toks")) < w)
        .select(windowHashes(col("toks"), w, Dedup.Prime).as("k")).collect()
      short.foreach(r => assert(r.getSeq[Any](0).isEmpty,
        s"short array must yield an empty hash array, got ${r.get(0)}"))
    }
  }

  test("random vectors/matrices: sq_dists, mat_dots, vec_sub equal their " +
       "HOF forms, both paths") {
    import org.apache.spark.sql.graftext.SqDistsExpr.{matDotsCol, sqDistsCol, vecSubCol}
    val dGen: Gen[Any] = Gen.chooseNum(-8.0, 8.0).map(_.asInstanceOf[Any])
    // row lengths mix matches and mismatches against the 0–12-long vector
    val matGen: Gen[Any] = Gen.frequency(
      9 -> Gen.chooseNum(0, 5).flatMap(k =>
        Gen.listOfN(k, arrGen(Gen.chooseNum(-8.0, 8.0), maxLen = 12)).map(_.toSeq)),
      1 -> Gen.const(null: Any))
    val schema = StructType(Seq(
      StructField("v", ArrayType(DoubleType, containsNull = true), nullable = true),
      StructField("cents",
        ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = true),
        nullable = true),
      StructField("b", ArrayType(DoubleType, containsNull = true), nullable = true)))
    val rowGen = for {
      v <- arrGen(dGen); m <- matGen; b <- arrGen(dGen)
    } yield Row(v, m, b)
    val df = frame(schema, sample(Gen.listOfN(N, rowGen), 0xA11CE5L))
    val hofDists = transform(col("cents"), c =>
      aggregate(zip_with(col("v"), c, (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, x) => acc + x))
    val hofDots = transform(col("cents"), c =>
      aggregate(zip_with(col("v"), c, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x))
    val hofSub = zip_with(col("v"), col("b"), (x, y) => x - y)
    bothPaths {
      assertEqual(df, sqDistsCol(col("v"), col("cents")), hofDists)
      assertEqual(df, matDotsCol(col("v"), col("cents")), hofDots)
      assertEqual(df, vecSubCol(col("v"), col("b")), hofSub)
    }
  }
}
