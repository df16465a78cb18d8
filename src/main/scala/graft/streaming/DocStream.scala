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
}
