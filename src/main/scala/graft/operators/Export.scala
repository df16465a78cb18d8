package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Export/sink operators (SURVEY.md §2.1 S9–S11, §2.4 A7, §2.8 X9,X12).
  *
  * The reference exports query results as CSV (`sql_search.py:2023-2028`),
  * nested per-conversation JSON built with
  * `json_group_array(json_object(...))` (`access_db.py:201-219`,
  * `sql_search.py:1832-1841`), and Markdown/HTML documents with a
  * code-fence → `<pre>` regex rewrite (`sql_search.py:1843-1968`).
  *
  * Spark-first shape: the nested assembly is `sort_array(collect_list(
  * struct(...)))` + `to_json` — one shuffle on the group key, no driver
  * collection, so a 100 TB export parallelizes across executors and writes
  * straight to distributed storage. The Markdown rewrite is a pure
  * `regexp_replace`/`concat` projection (whole-stage codegen, streams
  * through the scan with no shuffle at all).
  */
object Export {

  /** A7/S10: events rolled up into one JSON document per user — the
    * `json_group_array(json_object(...))` shape of `access_db.py:201-219`.
    * `sort_array` (struct ordering = field order: event_id first) makes the
    * member order deterministic for the oracle hash.
    */
  def nestedJsonByUser(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col("event_id"), col("event_type")))).as("evs"))
      .select(
        col("user_id"), col("n_events"),
        to_json(col("evs")).as("events_json"))

  /** S11/X9: per-document Markdown export with the code-fence → `<pre>`
    * rewrite of `sql_search.py:1936-1945` (DOTALL regex, language tag
    * dropped, body kept via backreference).
    */
  def markdownDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(
        lit("# Doc "), col("doc_id"),
        lit(" ["), col("lang"), lit("/"), col("source"), lit("]\n\n"),
        regexp_replace(col("text"), "(?s)```(\\w*)\\n(.*?)```", "<pre>$2</pre>")
      ).as("markdown"))

  /** S11 (HTML form): full HTML page per document, the
    * `sql_search.py:1905-1968` template — safe filename (strip non-word
    * chars, spaces → underscores), the code-fence → `<pre><code>` rewrite
    * (language tag dropped, body kept), then newline → `<br>` applied to
    * the whole content *after* the fence rewrite, exactly like the
    * reference (so `<pre>` bodies also carry `<br>`). Pure projection:
    * streams through the scan under whole-stage codegen, no shuffle.
    */
  def htmlDocs(docs: DataFrame): DataFrame = {
    val title = concat(lit("Doc "), col("doc_id"),
      lit(" ["), col("lang"), lit("/"), col("source"), lit("]"))
    val safeName = expr(
      "replace(trim(regexp_replace(substring(split_part(text, '\\n', 1), 1, 32), '[^\\\\w\\\\s-]', '')), ' ', '_')")
    val body = regexp_replace(
      regexp_replace(col("text"),
        "(?s)```(\\w*)\\n(.*?)\\n```", "<pre><code>$2</code></pre>"),
      "\n", "<br>")
    docs.select(
      col("doc_id"),
      safeName.as("file_name"),
      concat(
        lit("<!DOCTYPE html>\n<html>\n<head>\n<meta charset=\"UTF-8\">\n<title>"),
        title,
        lit("</title>\n</head>\n<body>\n<div class=\"header\"><h1>"),
        title,
        lit("</h1></div>\n<div class=\"message\"><div class=\"content\">"),
        body,
        lit("</div></div>\n</body>\n</html>")).as("html"))
  }

  /** S9: CSV sink — single deterministic file per export like the
    * reference's one-file CSV writer, but via Spark's writer so the same
    * call scales out by dropping the coalesce.
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true")
      // faithful values: Spark's CSV writer trims cell whitespace by
      // default, which would make the sink lossy for text-derived columns
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
  }

  /** d19 (S9, oracle-checkable): push a deterministic per-document export
    * through the CSV sink and read it back with an explicit schema — the
    * dump the driver hashes is the *round-tripped* data, so the oracle
    * compare proves the sink preserves values (quoting, embedded commas
    * and quotes, whitespace) rather than just that it wrote files.
    */
  def csvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val out = Tables.documents(spark, sfDir).select(
      col("doc_id"), col("lang"), col("source"), col("n_chars"),
      length(col("text")).cast("long").as("text_len"),
      substring(col("text"), 1, 80).as("head"))
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_csv_roundtrip_" + Integer.toHexString(sfDir.hashCode)).getPath
    writeCsv(out, dir)
    spark.read
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("source", StringType), StructField("n_chars", LongType),
        StructField("text_len", LongType), StructField("head", StringType))))
      .option("header", "true")
      // the writer quotes embedded newlines correctly; reading them back
      // needs multiLine (default line-split mode would break the record).
      // Fine here — the round-trip proof is small; a 100 TB CSV *read*
      // should avoid multiLine (it serializes per-file) by not putting
      // raw multiline text in CSV at all
      .option("multiLine", "true")
      .csv(dir)
  }

  /** S10: JSON-lines sink (one conversation document per line). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** d21 (S10, oracle-checkable): push the nested-JSON-by-user export
    * through a REAL JSON file sink and read it back with an explicit
    * schema — parity with d19's CSV treatment. d13 verifies the formatted
    * `events_json` column; this row hashes the ROUND-TRIPPED rows, so an
    * oracle match proves the sink write→read preserves every value — the
    * doubly-JSON-encoded `events_json` string (embedded quotes/braces
    * escaped and restored) being exactly what a column check can't see.
    */
  def jsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val out = nestedJsonByUser(Tables.events(spark, sfDir))
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_json_roundtrip_" + Integer.toHexString(sfDir.hashCode)).getPath
    writeJson(out, dir)
    spark.read
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("n_events", LongType),
        StructField("events_json", StringType))))
      .json(dir)
  }

  /** d22 (S11, oracle-checkable): the Markdown export written to a real
    * file sink and read back — the reference writes one .md file per
    * conversation (`sql_search.py:1843-1903`); the distributed analog is a
    * JSON-lines sink (the only line-oriented sink that survives the
    * markdown bodies' embedded newlines losslessly without multiLine
    * reads), keyed by doc_id so every byte of every document round-trips
    * verifiably.
    */
  def markdownRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val out = markdownDocs(Tables.documents(spark, sfDir))
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_md_roundtrip_" + Integer.toHexString(sfDir.hashCode)).getPath
    writeJson(out, dir)
    spark.read
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("markdown", StringType))))
      .json(dir)
  }

  // --- query entries ---

  def qNestedJson(spark: SparkSession, sfDir: String): DataFrame =
    nestedJsonByUser(Tables.events(spark, sfDir))

  def qMarkdown(spark: SparkSession, sfDir: String): DataFrame =
    markdownDocs(Tables.documents(spark, sfDir))

  def qHtml(spark: SparkSession, sfDir: String): DataFrame =
    htmlDocs(Tables.documents(spark, sfDir))

  def qCsvRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    csvRoundtrip(spark, sfDir)

  def qJsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    jsonRoundtrip(spark, sfDir)

  def qMarkdownRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    markdownRoundtrip(spark, sfDir)
}
