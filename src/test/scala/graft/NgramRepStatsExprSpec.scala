package graft

import graft.operators.TextQuality
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.NgramRepStatsExpr.ngramRepStats

/** The shuffle-free n-gram repetition kernel must agree EXACTLY with the
  * exploded plan it replaced (explode → groupBy(doc_id, xxhash64(gram)) →
  * groupBy(doc_id)) on corpus documents and on the gram-construction edge
  * shapes `ngramsFromTokens` defines (short/empty arrays → one
  * whole-document gram; null array → no output row; null tokens skipped
  * like concat_ws), in both codegen and interpreted paths.
  */
class NgramRepStatsExprSpec extends SparkSpec {
  import spark.implicits._

  private def docs = sampleDocs.unionByName(Seq(
    (100L, "one one one one one"),                 // max repetition
    (101L, "two words"),                            // < n tokens after stopcut
    (102L, ""),                                     // empty -> one "" gram
    (103L, "aaa bbb aaa bbb aaa"),                  // alternating bigrams
    (104L, null.asInstanceOf[String])).toDF("doc_id", "text"))

  private def collectBoth = {
    val k = TextQuality.ngramRepetition(docs)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val h = TextQuality.ngramRepetitionExploded(docs)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    (k, h)
  }

  test("kernel equals the exploded plan on corpus + edge shapes, codegen") {
    val (k, h) = collectBoth
    assert(k == h, s"kernel != exploded:\n$k\n$h")
    val byId = k.map(r => r._1 -> r).toMap
    // 5x "one": 4 bigrams, all "one one" -> top_frac 1, dup_frac 3/4
    assert(byId(100L) == ((100L, 4L, 1.0, 0.75)))
    // empty text: one "" gram
    assert(byId(102L) == ((102L, 1L, 1.0, 0.0)))
    // "aaa bbb aaa bbb aaa": grams ab, ba, ab, ba -> top 2/4, dup 2/4
    assert(byId(103L) == ((103L, 4L, 0.5, 0.5)))
    // null text: no row on either arm
    assert(!byId.contains(104L))
  }

  test("kernel equals the exploded plan, interpreted path") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val (k, h) = collectBoth
      assert(k == h)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("no shuffle in the kernel plan; SQL form matches the Column API") {
    val plan = TextQuality.ngramRepetition(docs).queryExecution.executedPlan
    assert(!flattenPlan(plan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      s"per-document stats must not shuffle:\n$plan")
    org.apache.spark.sql.graftext.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT ngram_rep_stats(array('a','b','a','b'), 2) AS s").collect()(0)
      .getStruct(0)
    assert(got.getLong(0) == 3L && got.getLong(1) == 2L && got.getLong(2) == 2L)
  }
}
