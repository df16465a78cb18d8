package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.SetFilterExpr

/** The fused set-membership filter must agree EXACTLY with the HOF chain
  * it replaced — `filter(words, w => [!]array_contains(lit(set), w))` —
  * on real corpus text and on the edge shapes the chain's semantics
  * define (null array → null; null ELEMENTS dropped on both arms, because
  * `array_contains(set, null)` is null and `filter` keeps only
  * predicate-TRUE elements; order/duplicates preserved; binary-exact
  * matching incl. multi-byte UTF-8), in both codegen and interpreted
  * paths.
  */
class SetFilterExprSpec extends SparkSpec {

  private val set = Seq("the", "and", "héllo")

  private def hofNot = filter(col("toks"),
    w => !array_contains(lit(set.toArray), w))
  private def hofIn = filter(col("toks"),
    w => array_contains(lit(set.toArray), w))

  private def edgeFrames = spark.sql(
    """SELECT 0 AS id, array('the', 'cat', 'and', 'the', 'dog') AS toks
      |UNION ALL SELECT 1, array('cat', 'dog')
      |UNION ALL SELECT 2, array('the', 'the', 'and')
      |UNION ALL SELECT 3, CAST(array() AS array<string>)
      |UNION ALL SELECT 4, CAST(NULL AS array<string>)
      |UNION ALL SELECT 5, array('a', CAST(NULL AS string), 'the')
      |UNION ALL SELECT 6, array('héllo', 'wörld', 'THE')
      |""".stripMargin)

  private def checkBoth(): Unit = {
    val rows = edgeFrames.select(col("id"),
        SetFilterExpr.withoutSet(col("toks"), set).as("kNot"), hofNot.as("hNot"),
        SetFilterExpr.inSet(col("toks"), set).as("kIn"), hofIn.as("hIn"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2), s"row ${r.get(0)} not-in: ${r.get(1)} != ${r.get(2)}")
      assert(r.get(3) == r.get(4), s"row ${r.get(0)} in: ${r.get(3)} != ${r.get(4)}")
    }
    assert(rows(0).getSeq[String](1) == Seq("cat", "dog"))         // dups/order kept
    assert(rows(0).getSeq[String](3) == Seq("the", "and", "the"))
    assert(rows(4).isNullAt(1) && rows(4).isNullAt(3))             // null array
    assert(rows(5).getSeq[String](1) == Seq("a"))                  // null element dropped
    assert(rows(6).getSeq[String](3) == Seq("héllo"))              // utf-8 exact, case-exact
  }

  test("kernel equals the HOF filter on every edge shape, codegen path") {
    checkBoth()
  }

  test("kernel equals the HOF filter on every edge shape, interpreted path") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try checkBoth()
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("tokens == tokensHof on the fixture corpus and edge texts") {
    import spark.implicits._
    val docs = sampleDocs.unionByName(Seq(
      (100L, ""), (101L, "the and of"), (102L, "HÉLLO the wörld"),
      (103L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val rows = docs.select(TextFns.tokens(col("text")).as("k"),
        TextFns.tokensHof(col("text")).as("h")).collect()
    rows.foreach(r => assert(r.get(0) == r.get(1), s"${r.get(0)} != ${r.get(1)}"))
  }

  test("SQL set_filter builds the same expression as the Column API") {
    org.apache.spark.sql.graftext.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT set_filter(array('the','cat','and'), array('the','and'), false) AS f," +
      "       set_filter(array('the','cat','and'), array('the','and'), true) AS g")
      .collect()(0)
    assert(got.getSeq[String](0) == Seq("cat"))
    assert(got.getSeq[String](1) == Seq("the", "and"))
  }
}
