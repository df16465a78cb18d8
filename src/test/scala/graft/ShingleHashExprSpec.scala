package graft

import graft.functions.TextFns
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.ShingleHashExpr.shingleHashes

/** The fused shingle-hash kernel must agree EXACTLY with the HOF chain it
  * replaced — `transform(shinglesFromTokens(toks), s =>
  * pmod(md5Long60(s), Prime))` — on real tokenized corpus documents and
  * on the edge shapes the chain's semantics define (short arrays → one
  * whole-document shingle; empty array → md5 of ""; null array → null;
  * null tokens skipped like concat_ws), in both codegen and interpreted
  * paths, including multi-byte UTF-8 tokens.
  */
class ShingleHashExprSpec extends SparkSpec {

  private def hofHashes = transform(Dedup.shinglesFromTokens(col("toks")),
    s => pmod(Dedup.md5Long60(s), lit(Dedup.Prime)))

  private def edgeFrames = spark.sql(
    """SELECT 0 AS id, array('alpha', 'beta', 'gamma', 'delta') AS toks
      |UNION ALL SELECT 1, array('a', 'b')
      |UNION ALL SELECT 2, array('only')
      |UNION ALL SELECT 3, CAST(array() AS array<string>)
      |UNION ALL SELECT 4, CAST(NULL AS array<string>)
      |UNION ALL SELECT 5, array('a', CAST(NULL AS string), 'c')
      |UNION ALL SELECT 6, array('héllo', 'wörld', '日本語', 'x')
      |UNION ALL SELECT 7, array(CAST(NULL AS string), CAST(NULL AS string))
      |""".stripMargin)

  test("kernel equals the HOF chain on every edge shape, codegen path") {
    val rows = edgeFrames
      .select(col("id"), shingleHashes(col("toks"), Dedup.Prime).as("k"), hofHashes.as("h"))
      .orderBy("id").collect()
    rows.foreach { r => assert(r.get(1) == r.get(2), s"row ${r.get(0)}: ${r.get(1)} != ${r.get(2)}") }
    assert(rows(0).getSeq[Long](1).length == 2) // 4 tokens -> 2 shingles
    assert(rows(1).getSeq[Long](1).length == 1) // short doc -> whole-doc shingle
    assert(rows(3).getSeq[Long](1).length == 1) // empty -> md5("")
    assert(rows(4).isNullAt(1))                 // null array -> null
  }

  test("kernel equals the HOF chain on every edge shape, interpreted path") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val rows = edgeFrames
        .select(col("id"), shingleHashes(col("toks"), Dedup.Prime).as("k"), hofHashes.as("h"))
        .orderBy("id").collect()
      rows.foreach { r => assert(r.get(1) == r.get(2), s"row ${r.get(0)}: ${r.get(1)} != ${r.get(2)}") }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("kernel equals the HOF chain on tokenized corpus documents") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    val diff = docs.select(col("doc_id"),
        shingleHashes(col("toks"), Dedup.Prime).as("k"), hofHashes.as("h"))
      .where(not(col("k") <=> col("h")))
    assert(diff.count() == 0)
    assert(docs.count() > 0) // corpus really loaded
  }

  test("window-hash kernel equals the composable transform chain") {
    import org.apache.spark.sql.graftext.ShingleHashExpr.windowHashes
    val w = 5
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= w)
    val hof = transform(sequence(lit(0), size(col("toks")) - w), i =>
      Dedup.md5Long60(concat_ws(" ", slice(col("toks"), i + 1, lit(w)))))
    val diff = docs.select(col("doc_id"),
        windowHashes(col("toks"), w, 0L).as("k"), hof.as("h"))
      .where(not(col("k") <=> col("h")))
    assert(docs.count() > 0 && diff.count() == 0)
    // raw shingle mode (prime=0, w=3) agrees with the window kernel on
    // long docs (same windows when n >= 3)
    val d3 = docs.where(size(col("toks")) >= 3)
      .select(shingleHashes(col("toks"), 0L).as("s"), windowHashes(col("toks"), 3, 0L).as("w"))
      .where(not(col("s") <=> col("w")))
    assert(d3.count() == 0)
    // under-length arrays yield an empty hash array (call sites guard)
    val short = spark.sql("SELECT array('a','b') AS toks")
      .select(windowHashes(col("toks"), 5, 0L).as("k")).head()
    assert(short.getSeq[Long](0).isEmpty)
  }

  test("rolling-fingerprint kernel equals the interpreted fold") {
    import org.apache.spark.sql.graftext.ShingleHashExpr.rollingFingerprint
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val kernel = graft.operators.TextQuality.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.get(2))).toMap
    val hof = graft.operators.TextQuality.fingerprintsHof(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.get(2))).toMap
    assert(kernel.nonEmpty && kernel == hof)
    // edge shapes: empty array -> 0 seed; null token -> null; null array -> null
    val edges = spark.sql(
      """SELECT 0 AS id, CAST(array() AS array<string>) AS toks
        |UNION ALL SELECT 1, array('a', CAST(NULL AS string))
        |UNION ALL SELECT 2, CAST(NULL AS array<string>)
        |""".stripMargin)
    val hofRoll = aggregate(col("toks"), lit(0L),
      (acc, t) => pmod(acc * 1000003L + pmod(Dedup.md5Long60(t), lit(1000000007L)),
        lit(2147483647L)))
    val rows = edges.select(col("id"), rollingFingerprint(col("toks")).as("k"), hofRoll.as("h"))
      .orderBy("id").collect()
    rows.foreach { r => assert(r.get(1) == r.get(2), s"row ${r.get(0)}: ${r.get(1)} != ${r.get(2)}") }
    assert(rows(0).getLong(1) == 0L && rows(1).isNullAt(1) && rows(2).isNullAt(1))
  }

  test("distinct kernel hashes equal the batch explode path mod Prime") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val viaKernel = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(shingleHashes(col("toks"), Dedup.Prime)).as("h"))
      .distinct()
    val viaBatch = Dedup.distinctShingleHashes(docs)
      .select(col("doc_id"), pmod(col("h60"), lit(Dedup.Prime)).as("h"))
      .distinct()
    assert(viaKernel.exceptAll(viaBatch).count() == 0)
    assert(viaBatch.exceptAll(viaKernel).count() == 0)
  }
}
