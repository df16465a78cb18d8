package graft

import graft.operators.Summarizer
import org.apache.spark.sql.functions._

/** The shuffle-free sentence-pair similarity kernel must agree EXACTLY
  * with the relational (doc_id, token) self-join arm it replaced, on
  * corpus documents and the edge shapes the sentence/token contracts
  * define (null text, stopword-only sentences, <3-word fragments,
  * punctuation runs, zero-overlap pairs), in both codegen and interpreted
  * paths — and its plan must not shuffle.
  */
class SentencePairSimsExprSpec extends SparkSpec {
  import spark.implicits._

  private def docs = {
    // sentencify the fixture docs like the registered s4 entry
    val sentencified = sampleDocs.select(col("doc_id"),
      regexp_replace(col("text"), "((?:\\S+\\s+){6})", "$1. ").as("text"))
    sentencified.unionByName(Seq(
      (100L, "alpha beta gamma works. alpha beta delta sings! gamma delta alpha?"),
      (101L, "the of and is was. the of and. x y."), // stopword-only / short
      (102L, "unique words here only. totally disjoint other sentence."),
      (103L, ""),                                    // empty
      (104L, null.asInstanceOf[String]),             // null -> no rows
      (105L, "one two three... four five six!!! seven eight nine?")
    ).toDF("doc_id", "text"))
  }

  private def collectBoth = {
    val k = Summarizer.sentenceSimilaritiesFused(docs)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val h = Summarizer.sentenceSimilaritiesDf(docs)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    (k, h)
  }

  test("kernel equals the relational self-join arm on corpus + edges, codegen") {
    val (k, h) = collectBoth
    assert(k == h, s"kernel != relational:\n$k\n$h")
    assert(k.nonEmpty, "fixture must produce real pairs")
    val d100 = k.filter(_._1 == 100L)
    // s1={alpha,beta,gamma,works}, s2={alpha,beta,delta,sings},
    // s3={gamma,delta,alpha}: all three pairs share tokens
    assert(d100.map(r => (r._2, r._3)).toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(d100.find(r => (r._2, r._3) == ((1L, 2L))).get._4 == 0.5) // 2/sqrt(16)
    // zero-overlap sentences pair on NEITHER arm
    assert(!k.exists(_._1 == 102L))
    // stopword-only / short sentences and null/empty text: no rows
    assert(!k.exists(r => r._1 == 101L || r._1 == 103L || r._1 == 104L))
  }

  test("kernel equals the relational arm, interpreted path") {
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

  test("no shuffle in the fused s4 plan; SQL form matches the Column API") {
    val plan = Summarizer.sentenceSimilaritiesFused(docs)
      .queryExecution.executedPlan
    assert(!flattenPlan(plan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      s"per-document pair sims must not shuffle:\n$plan")
    org.apache.spark.sql.graftext.GraftFunctions.register(spark)
    val rows = spark.sql(
      "SELECT explode(sentence_pair_sims(" +
        "'alpha beta gamma works. alpha beta delta sings.', " +
        s"'${graft.functions.TextFns.WordPattern.replace("\\", "\\\\")}', " +
        "array('the','of'))) AS p").select("p.i", "p.j", "p.sim").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L &&
      rows(0).getLong(1) == 2L && rows(0).getDouble(2) == 0.5)
  }
}
