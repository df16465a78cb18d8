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

  test("html export: page template, fence -> pre/code, newline -> <br>, safe name") {
    import spark.implicits._
    val docs = Seq(
      (7L, "Intro: line!\n```scala\nval x = 1\n```\nend", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val row = Export.htmlDocs(docs).head()
    val html = row.getAs[String]("html")
    assert(html.startsWith("<!DOCTYPE html>\n<html>\n<head>\n"))
    assert(html.contains("<title>Doc 7 [en/web]</title>"))
    assert(html.contains("<h1>Doc 7 [en/web]</h1>"))
    // fence rewritten (language tag dropped) BEFORE the <br> pass, so the
    // pre body's newline also becomes <br> — the reference's exact order
    assert(html.contains("<pre><code>val x = 1</code></pre>"))
    assert(html.contains("Intro: line!<br>"))
    assert(!html.contains("```") && !html.contains("scala\n"))
    assert(html.endsWith("</body>\n</html>"))
    // safe filename from the first line: punctuation stripped, spaces to _
    assert(row.getAs[String]("file_name") == "Intro_line")
  }

  test("csv export writes a single header file that reads back identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val df = spark.range(5).select(col("id"), (col("id") * 2).as("dbl"))
    Export.writeCsv(df, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 5 && back.columns.toSeq == Seq("id", "dbl"))
  }

  test("csv round-trip preserves embedded commas, quotes, and edge whitespace") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_rt").toString
    val vals = Seq("plain", "with, comma", "a \"quoted\" word", " leading and trailing ",
      "embedded\nnewline")
    Export.writeCsv(vals.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s"), dir)
    val back = spark.read
      .schema("id LONG, s STRING").option("header", "true")
      .option("multiLine", "true").csv(dir)
      .as[(Long, String)].collect().sortBy(_._1).map(_._2).toSeq
    assert(back == vals, s"lossy sink: $back")
    // and the oracle-checked d19 entry round-trips real document rows
    val rt = Export.csvRoundtrip(spark, sf0001)
    assert(rt.count() == Tables.documents(spark, sf0001).count())
  }

  test("boolean query parser: NOT extraction, OR detection, AND default") {
    import graft.functions.BooleanQuery._
    assert(parse("a AND b NOT c") == Parsed(Seq("a", "b"), Seq("c"), isOr = false))
    assert(parse("a OR b NOT c NOT d") == Parsed(Seq("a", "b"), Seq("c", "d"), isOr = true))
    assert(parse("Spark") == Parsed(Seq("spark"), Nil, isOr = false))
    assert(toSql("text", "a OR b NOT c") ==
      "(lower(text) LIKE '%a%' OR lower(text) LIKE '%b%') AND lower(text) NOT LIKE '%c%'")
  }

  test("boolean query predicate filters rows like the parsed semantics") {
    import spark.implicits._
    val docs = Seq((1L, "fast scan"), (2L, "merge sort"), (3L, "slow merge"), (4L, "other"))
      .toDF("doc_id", "text")
    val got = docs.where(graft.functions.BooleanQuery.predicate(col("text"), "scan OR merge NOT slow"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("registerAll: the five derived views answer through spark.sql") {
    graft.operators.Views.registerAll(spark, sf0001)
    val n = spark.sql(
      "SELECT count(*) FROM user_summary JOIN type_usage ON 1=1 WHERE user_summary.event_count > 0")
      .head().getLong(0)
    assert(n > 0)
    assert(spark.sql("SELECT * FROM event_pairs").columns.contains("gap_s"))
  }

  test("similarity matrix: symmetric with unit diagonal (N23)") {
    val m = graft.operators.Duplicates.similarityMatrix(sampleDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val n = 6
    assert(m.size == n * n)
    for (i <- 0 until n) assert(m((i.toLong, i.toLong)) == 1.0)
    for (i <- 0 until n; j <- 0 until n if i != j)
      assert(m((i.toLong, j.toLong)) == m((j.toLong, i.toLong)))
    assert(m((0L, 5L)) == 1.0) // the planted exact duplicate
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
