package graft.streaming

import graft.functions.{TextFns, TopKWords}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming document analytics: the corpus arrives as parquet files and
  * the heavy-hitter summary stays current without ever re-scanning — the
  * incremental form of the A14 word-frequency operator, built on the same
  * [[TopKWords]] Misra–Gries aggregate as the batch sketch. The streaming
  * state is ONE bounded counter map (not a per-word aggregation state),
  * which is the only top-k formulation whose state does not grow with the
  * vocabulary of an unbounded ingest.
  */
object DocStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming top-k words over an arriving corpus directory. Complete
    * output mode: each micro-batch emits the current summary row.
    */
  def topWordsStream(spark: SparkSession, dir: String, k: Int = 20,
                     capacity: Int = 4096): DataFrame = {
    val src = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    src.select(explode(TextFns.tokens(col("text"))).as("word"))
      .agg(TopKWords.topKWords(col("word"), k, capacity).as("tops"))
  }

  /** Replay the stream over a static directory; returns the final summary
    * exploded to (word, cnt) rows.
    */
  def replayTopWords(spark: SparkSession, dir: String, k: Int = 20,
                     capacity: Int = 4096,
                     queryName: String = "top_words_mem"): DataFrame = {
    val q: StreamingQuery = topWordsStream(spark, dir, k, capacity)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .select(explode(col("tops")).as("t"))
      .select(col("t.word").as("word"), col("t.cnt").as("cnt"))
  }

  /** Streaming corpus-prep quality gate: the x10 quality score applied to
    * an ARRIVING corpus, emitting per-(source, accepted) counts — the
    * incremental admission filter a continuous ingest runs instead of
    * re-scoring the corpus per batch job. The score is a stateless
    * per-row projection (length/punct/stopword ratios — no corpus
    * aggregate), so the streaming plan carries no per-document state;
    * the only state is the bounded (source × {accept, reject}) count map.
    * Counts are order-free, so the replay result equals the batch
    * computation exactly (the w8 oracle recipe).
    */
  def qualityGateStream(spark: SparkSession, dir: String,
                        threshold: Double = 0.6): DataFrame = {
    val src = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    graft.operators.TextQuality.qualityScore(src, keep = Seq("source"))
      .select(col("source"), (col("quality") >= threshold).as("accepted"))
      .groupBy("source", "accepted").agg(count(lit(1)).as("n"))
  }

  // one linked dir per source file for the process lifetime (the w8
  // pattern: readStream needs a directory; the fixture is a single file)
  private val docSrcDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def docSrcDir(sfDir: String): String = {
    val src = new java.io.File(s"$sfDir/documents.parquet")
    require(src.exists, s"no documents table at ${src.getPath}")
    if (src.isDirectory) src.getPath
    else docSrcDirs.getOrElseUpdate(src.getCanonicalPath, {
      val d = java.nio.file.Files.createTempDirectory("graft_w11_src")
      java.nio.file.Files.createSymbolicLink(
        d.resolve("documents.parquet"), src.toPath.toAbsolutePath)
      d.toFile.deleteOnExit()
      d.toString
    })
  }

  def qQualityGate(spark: SparkSession, sfDir: String): DataFrame = {
    val q = qualityGateStream(spark, docSrcDir(sfDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("w11_stream_quality")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table("w11_stream_quality")
  }
}
