package graft

import graft.streaming.EventStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The engine's late-data contract for the watermarked streaming paths
  * (w8/w9/w1 family): in append mode, a row arriving after the 1-hour
  * watermark has closed its window is DROPPED — and which rows those are
  * is predictable batch-side. This spec replays the event stream with one
  * file delivered out of order beyond the watermark and asserts the
  * streamed result equals the batch aggregation over exactly the
  * all-rows-minus-predicted-drops set (and differs from the batch over
  * everything, proving the drop really happened).
  */
class LateDataSpec extends SparkSpec {
  import spark.implicits._

  /** Write `df` as a single parquet FILE at `dir/name` with mtime `t` —
    * the file source processes files oldest-mtime-first, which is how the
    * replay controls arrival order.
    */
  private def writeOneFile(df: DataFrame, dir: java.nio.file.Path,
                           name: String, mtime: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("late-part")
    df.repartition(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val target = dir.resolve(name)
    java.nio.file.Files.copy(part.toPath, target)
    target.toFile.setLastModified(mtime)
  }

  private def events(rows: (Long, String, String, Double)*): DataFrame =
    rows.toSeq.toDF("event_id", "ts_s", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        lit(1L).as("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))

  private def batchAgg(df: DataFrame): DataFrame = df
    .groupBy(window(col("ts"), "1 day"), col("event_type"))
    .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
    .select(date_format(col("window.start"), "yyyy-MM-dd").as("date"),
      col("event_type"), col("n"), col("total_value"))

  test("append-mode watermark: a file delivered beyond the 1h watermark " +
       "drops exactly the batch-predicted rows") {
    // batch 1 advances the watermark to Jan 2 11:00 (max ts − 1 h); the
    // day-1 window [Jan 1, Jan 2) is then closed
    val onTime = events(
      (1L, "2024-01-01 10:00:00", "view", 1.0),
      (2L, "2024-01-01 18:00:00", "view", 2.0),
      (3L, "2024-01-02 12:00:00", "click", 3.0))
    // batch 2, delivered out of order: event 4 lands in the CLOSED day-1
    // window (ts far below the watermark) → the predicted drop; event 5
    // lands in the still-open day-2 window → kept
    val lateFile = events(
      (4L, "2024-01-01 15:00:00", "view", 10.0),
      (5L, "2024-01-02 11:30:00", "click", 4.0))
    // batch 3 advances the watermark past Jan 3 so the day-2 window flushes
    val flushFile = events((6L, "2024-01-04 06:00:00", "view", 1.0))

    // watermark commits lag one batch behind the data that moved them: a
    // batch runs under the watermark committed BEFORE it, which reflects
    // the previous batches' max event time only after one further commit
    // (observed: without this spacer batch, the late file still ran under
    // watermark 0 and nothing dropped). The spacer lets Jan 2 11:00 take
    // effect before the late file's batch plans.
    val spacer = events((9L, "2024-01-02 12:30:00", "view", 0.5))
    val dir = java.nio.file.Files.createTempDirectory("late-arrivals")
    val t0 = System.currentTimeMillis() - 120000
    writeOneFile(onTime, dir, "a_ontime.parquet", t0)
    writeOneFile(spacer, dir, "b_spacer.parquet", t0 + 15000)
    writeOneFile(lateFile, dir, "c_late.parquet", t0 + 30000)
    writeOneFile(flushFile, dir, "d_flush.parquet", t0 + 60000)

    val q: StreamingQuery = EventStream.dailyCountsStream(spark, dir.toString)
      .writeStream.outputMode("append")
      .format("memory").queryName("late_daily")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("late_daily")
      .as[(String, String, Long, Double)].collect().toSet

    // batch-side prediction: everything except event 4, restricted to the
    // windows the final watermark (Jan 4 05:00) has flushed — the day-4
    // window is still open at stream end and append mode withholds it
    val all = onTime.unionByName(spacer).unionByName(lateFile).unionByName(flushFile)
    val predicted = batchAgg(all.where(col("event_id") =!= 4L))
      .where(col("date") < "2024-01-04")
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed == predicted,
      s"streamed $streamed\npredicted $predicted")

    // the drop is real: aggregating everything would give a different
    // day-1 row (3 views / 13.0) than the stream emitted (2 views / 3.0)
    val withLate = batchAgg(all).where(col("date") < "2024-01-04")
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed != withLate, "the late row must not have been aggregated")
    assert(streamed.contains(("2024-01-01", "view", 2L, 3.0)))
  }
}
