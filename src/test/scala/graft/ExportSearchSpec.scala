package graft

import graft.operators.{Export, SemanticSearch}
import org.apache.spark.sql.functions._

/** Export sinks (S9–S11, A7, X9) and TF-IDF semantic search (N30–N31). */
class ExportSearchSpec extends SparkSpec {

  test("nested JSON export: one row per user, events sorted by event_id") {
    val df = Export.qNestedJson(spark, sf0001)
    val row = df.orderBy("user_id").head()
    val json = row.getAs[String]("events_json")
    assert(json.startsWith("""[{"event_id":"""))
    val ids = """"event_id":(\d+)""".r.findAllMatchIn(json).map(_.group(1).toLong).toSeq
    assert(ids == ids.sorted, "events must be ordered by event_id")
    assert(ids.size == row.getAs[Long]("n_events"))
  }

  test("markdown export: header present and code fences rewritten to <pre>") {
    import spark.implicits._
    val docs = Seq((1L, "intro text.\n```python\nprint(1)\n```\ntail.", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val md = Export.markdownDocs(docs).head().getAs[String]("markdown")
    assert(md.startsWith("# Doc 1 [en/s]\n\n"))
    assert(md.contains("<pre>print(1)\n</pre>"))
    assert(!md.contains("```"))
  }

  test("csv export writes a single header file that reads back identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val df = spark.range(5).select(col("id"), (col("id") * 2).as("dbl"))
    Export.writeCsv(df, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 5 && back.columns.toSeq == Seq("id", "dbl"))
  }

  test("query tokenizer matches the column tokenizer") {
    import spark.implicits._
    val text = "The Spark STREAMING window... joins; and the query!"
    val fromCol = Seq(text).toDF("t")
      .select(graft.functions.TextFns.tokens(col("t"))).head().getSeq[String](0)
    assert(SemanticSearch.tokenize(text) == fromCol)
  }

  test("semantic search: self-similar doc ranks first with similarity 1.0-ish") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark streaming window join query performance", "en", "s", 10),
      (1L, "completely unrelated gardening flowers soil", "en", "s", 10),
      (2L, "spark query window", "en", "s", 10))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val hits = SemanticSearch.search(spark, docs).collect()
    assert(hits.nonEmpty && hits.head.getAs[Long]("doc_id") == 0L)
    assert(!hits.map(_.getAs[Long]("doc_id")).contains(1L))
  }

  test("semantic search on testdata returns ≤ limit rows ordered desc") {
    val hits = SemanticSearch.qSemanticSearch(spark, sf0001).collect()
    assert(hits.length <= SemanticSearch.Limit)
    val sims = hits.map(_.getAs[Double]("similarity")).toSeq
    assert(sims == sims.sorted.reverse)
    assert(sims.forall(_ >= SemanticSearch.Threshold))
  }
}
