package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming extension (SURVEY.md §2.10): the reference has no
  * event-time processing — its "streaming" is an incremental file reader —
  * but the engine exposes the streaming form of the batch time-bucket
  * aggregations (A9) as the scale path for continuous ingest: parquet
  * source → watermark → tumbling window → append sink.
  *
  * Batch/stream parity: [[dailyCountsBatch]] is the exact batch equivalent
  * of [[dailyCountsStream]]'s windowed aggregation, so correctness of the
  * streaming plan is testable by replaying a static directory
  * (`processAllAvailable`) and comparing to the batch result.
  */
object EventStream {

  /** events.parquet schema with ts pre-converted (the nanos column reads as
    * long under the legacy conf — see [[graft.Tables.events]]).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as long nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def withTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast(LongType)))

  /** Streaming tumbling-window daily counts with a 1-hour watermark. */
  def dailyCountsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    withTs(src)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("date"),
              col("event_type"), col("n"), col("total_value"))
  }

  /** Batch equivalent of [[dailyCountsStream]] (same output schema). */
  def dailyCountsBatch(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("date"),
              col("event_type"), col("n"), col("total_value"))

  /** Run the streaming query against a static directory to completion via
    * a memory sink; returns the materialized result. Drives the real
    * streaming machinery (source → watermark → stateful agg → sink) in a
    * deterministic, replayable way.
    */
  def replayToMemory(spark: SparkSession, dir: String,
                     queryName: String = "daily_counts"): DataFrame = {
    val q: StreamingQuery = dailyCountsStream(spark, dir)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Query entry: the batch form (oracle-checkable; the streaming form is
    * exercised by the spec via [[replayToMemory]]).
    */
  def qDailyCounts(spark: SparkSession, sfDir: String): DataFrame =
    dailyCountsBatch(spark, sfDir)
}
