package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.SimHashSigExpr.simhashSig

/** The fused SimHash fingerprint kernel must agree EXACTLY with the
  * nested-HOF bitmask form it replaced ([[Dedup.simhashSignaturesHof]]) —
  * on real corpus documents and on the edge shapes the HOF's null
  * semantics define (empty list → 0; a null cnt or null element poisons
  * the whole fingerprint to 0; a null h contributes −cnt to every bit),
  * in both codegen and interpreted paths.
  */
class SimHashSigExprSpec extends SparkSpec {

  private def hofSig = {
    val masks = lit(Array.tabulate(Dedup.SimhashBits)(1L << _))
    aggregate(
      transform(masks, m =>
        when(aggregate(col("hc"), lit(0L), (acc, e) =>
          acc + when(e("h").bitwiseAND(m) =!= 0, e("cnt")).otherwise(-e("cnt"))) > 0,
          m).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  private def edgeFrames = spark.sql(
    """SELECT 0 AS id, array(named_struct('h', 5L, 'cnt', 2L), named_struct('h', 96L, 'cnt', 1L)) AS hc
      |UNION ALL SELECT 1, array(named_struct('h', 1152921504606846975L, 'cnt', 4L))
      |UNION ALL SELECT 2, CAST(array() AS array<struct<h:bigint,cnt:bigint>>)
      |UNION ALL SELECT 3, CAST(NULL AS array<struct<h:bigint,cnt:bigint>>)
      |UNION ALL SELECT 4, array(named_struct('h', CAST(NULL AS bigint), 'cnt', 3L),
      |                          named_struct('h', 7L, 'cnt', 9L))
      |UNION ALL SELECT 5, array(named_struct('h', 7L, 'cnt', CAST(NULL AS bigint)),
      |                          named_struct('h', 1L, 'cnt', 5L))
      |UNION ALL SELECT 6, array(named_struct('h', 1L, 'cnt', 5L),
      |                          named_struct('h', 7L, 'cnt', CAST(NULL AS bigint)))
      |UNION ALL SELECT 7, array(CAST(NULL AS struct<h:bigint,cnt:bigint>),
      |                          named_struct('h', 3L, 'cnt', 1L))
      |""".stripMargin)

  test("kernel equals the HOF form on every edge shape, codegen path") {
    val rows = edgeFrames
      .select(col("id"), simhashSig(col("hc"), Dedup.SimhashBits).as("k"), hofSig.as("h"))
      .orderBy("id").collect()
    rows.foreach { r => assert(r.get(1) == r.get(2), s"row ${r.get(0)}: ${r.get(1)} != ${r.get(2)}") }
    // the all-ones-hash row really sets every bit
    assert(rows(1).getLong(1) == (1L << Dedup.SimhashBits) - 1)
    // empty/NULL lists and poisoned rows (null cnt / null element) are 0L,
    // never null: the HOF's outer aggregate runs over the literal masks
    Seq(2, 3, 5, 6, 7).foreach(i => assert(!rows(i).isNullAt(1) && rows(i).getLong(1) == 0L))
  }

  test("kernel equals the HOF form on every edge shape, interpreted path") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val rows = edgeFrames.select(
        simhashSig(col("hc"), Dedup.SimhashBits).as("k"), hofSig.as("h")).collect()
      rows.foreach { r => assert(r.get(0) == r.get(1), s"${r.get(0)} != ${r.get(1)}") }
      assert(rows.length == 8)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("simhashSignatures equals the retained HOF reference on corpus docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val kernel = Dedup.simhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = Dedup.simhashSignaturesHof(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel.nonEmpty && kernel == hof)
  }
}
