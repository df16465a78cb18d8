package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.MinHashSigExpr.minhashSig

/** The fused MinHash-signature kernel must agree EXACTLY with the
  * nested-HOF form it replaced ([[Dedup.minhashSignaturesHof]]) — on real
  * corpus documents, and on the edge shapes `array_min`'s null semantics
  * define: empty arrays and null elements (skipped; an all-null or empty
  * array yields a signature of nulls), in both codegen and interpreted
  * paths.
  */
class MinHashSigExprSpec extends SparkSpec {

  private val as = Dedup.HashParams.map(_._1).toArray
  private val bs = Dedup.HashParams.map(_._2).toArray

  private def hofSig = transform(sequence(lit(0), lit(Dedup.NumHashes - 1)), i =>
    array_min(transform(col("hs"), h =>
      pmod(h * element_at(lit(as), i + 1) + element_at(lit(bs), i + 1),
        lit(Dedup.Prime)))))

  private def edgeFrames = spark.sql(
    """SELECT array(5L, 17L, 123456L, 2147483645L) AS hs
      |UNION ALL SELECT array(0L)
      |UNION ALL SELECT CAST(array() AS array<bigint>)
      |UNION ALL SELECT CAST(NULL AS array<bigint>)
      |UNION ALL SELECT array(CAST(NULL AS bigint), CAST(NULL AS bigint))
      |UNION ALL SELECT array(CAST(NULL AS bigint), 42L, CAST(NULL AS bigint))
      |""".stripMargin)

  test("kernel equals the HOF form on every edge shape, codegen path") {
    val rows = edgeFrames.select(
      minhashSig(col("hs"), as, bs, Dedup.Prime).as("k"),
      hofSig.as("h")).collect()
    rows.foreach { r => assert(r.get(0) == r.get(1), s"${r.get(0)} != ${r.get(1)}") }
    // the empty/NULL/all-null rows are all-null 32-vectors, never null: the
    // HOF's outer transform runs over the literal sequence regardless
    val nulls = rows.map(_.getSeq[Any](0)).filter(s => s != null && s.forall(_ == null))
    assert(nulls.length == 3 && nulls.forall(_.length == Dedup.NumHashes))
    assert(rows.forall(_.get(0) != null))
  }

  test("kernel equals the HOF form on every edge shape, interpreted path") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val rows = edgeFrames.select(
        minhashSig(col("hs"), as, bs, Dedup.Prime).as("k"),
        hofSig.as("h")).collect()
      rows.foreach { r => assert(r.get(0) == r.get(1), s"${r.get(0)} != ${r.get(1)}") }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("minhashSignatures equals the retained HOF reference on corpus docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val kernel = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = Dedup.minhashSignaturesHof(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kernel.nonEmpty && kernel == hof)
  }
}
