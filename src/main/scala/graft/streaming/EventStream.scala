package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

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

  /** events.parquet schema for fixture generations whose ts column is
    * INT64 TIMESTAMP(NANOS) (readable only as long nanos under the legacy
    * conf — see [[graft.Tables.events]]).
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

  /** The events file source with `ts` normalized to (UTC-session)
    * TimestampType. `readStream` needs an explicit schema, and the fixture
    * generation determines the ts parquet encoding (long nanos vs naive
    * micros — [[graft.Tables.events]] documents the history), so sniff the
    * batch footer once and build the matching stream schema; micros files
    * read TimestampType directly (an explicit schema bypasses NTZ
    * inference), nanos files keep the legacy long + divide path.
    */
  private def eventSource(spark: SparkSession, dir: String,
                          oneFilePerTrigger: Boolean = true): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val nanos = spark.read.parquet(dir).schema("ts").dataType == LongType
    val schema = StructType(rawSchema.map(f =>
      if (f.name == "ts" && !nanos) f.copy(dataType = TimestampType) else f))
    val rdr = spark.readStream.schema(schema)
    val src = (if (oneFilePerTrigger) rdr.option("maxFilesPerTrigger", "1")
               else rdr).parquet(dir)
    if (nanos) withTs(src) else src
  }

  /** Streaming tumbling-window daily counts with a 1-hour watermark. */
  def dailyCountsStream(spark: SparkSession, dir: String): DataFrame = {
    eventSource(spark, dir)
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

  /** Sliding-window counts (2 h length, 30 min slide): every event lands
    * in 4 overlapping windows. Spark's `window(ts, len, slide)` generates
    * the window set inside the scan projection — same plan batch or
    * streaming; the oracle has to expand the 4 offsets by hand.
    */
  def qSlidingCounts(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "2 hours", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"), col("n"))

  /** 7-day moving average over the daily counts — the time-series smooth
    * behind activity charts. The window partitions by event_type, so each
    * series computes in parallel; the frame is rows-based over the dense
    * daily grid the tumbling window already produced.
    */
  def qMovingAvgDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("date").rowsBetween(-6, 0)
    dailyCountsBatch(spark, sfDir)
      .select(col("date"), col("event_type"), col("n"),
        round(avg(col("n")).over(w), 6).as("ma7"))
  }

  /** w10: exponentially-weighted moving average over the daily counts —
    * the recursive smooth (pandas `ewm(alpha=0.5, adjust=False)`) the
    * rows-frame moving average can't express. s_1 = x_1,
    * s_t = α·x_t + (1−α)·s_{t−1} with α = 0.5.
    *
    * Determinism: the smooth is evaluated as an *ordered left fold* over
    * the date-sorted series (`aggregate` over a sorted array here,
    * `list_reduce` in the DuckDB oracle) — both engines execute the
    * identical IEEE op sequence, so results are bit-equal, the same
    * recipe that makes TextRank and Lloyd oracle-checkable. The prefix
    * re-fold per output row is O(len²) per series, which is fine for the
    * series this exists for (one row per day per type: thousands of
    * elements after years); the state-of-the-art alternative — a closed
    * form over pow(1−α, t−i) — trades that for float-pow wobble and
    * overflow at long horizons.
    *
    * Scale shape: one narrow aggregation keyed by series, then per-row
    * array work — series count scales out, series length stays human.
    */
  def qEwmaDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = dailyCountsBatch(spark, sfDir)
    val series = daily.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("date"), col("n")))).as("sr"))
    series
      .select(col("event_type"),
        explode(transform(sequence(lit(1), size(col("sr"))), t =>
          struct(
            element_at(col("sr"), t)("date").as("date"),
            element_at(col("sr"), t)("n").as("n"),
            aggregate(slice(col("sr"), lit(2), t - 1),
              element_at(col("sr"), 1)("n").cast("double"),
              (acc, e) => lit(0.5) * e("n") + lit(0.5) * acc).as("ewma"))))
          .as("r"))
      .select(col("r.date").as("date"), col("event_type"), col("r.n").as("n"),
        round(col("r.ewma"), 6).as("ewma"))
  }

  /** Dense-reindexed daily series (`exper_sql.py:1422-1478` semantics): the
    * reference reindexes a daily aggregate onto the full requested date
    * range, zero-filling days with no data. Re-expressed relationally as a
    * `sequence(min_date, max_date)` spine left-joined to the aggregate —
    * the filtered series (high-value purchases) is genuinely gappy, so the
    * zero-fill rows are observable.
    *
    * Scale shape: both the bounds and the filtered aggregate are map-side
    * partial aggs over the scan; the spine is days-count rows exploded from
    * one row, and the aggregate (≤ days rows) broadcasts into the join —
    * no shuffle grows with the fact table.
    */
  def qDenseDailySeries(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
    val spine = ev
      .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("d"))
    val daily = ev
      .filter(col("event_type") === "purchase" && col("value") > 250)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
    spine.join(broadcast(daily), Seq("d"), "left")
      .select(date_format(col("d"), "yyyy-MM-dd").as("date"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
  }

  /** w7: LOCF gap fill over the dense spine — the time-series
    * "carry last observation forward" reindex (pandas `.ffill`) as a pure
    * window op. Per event type, the dense date spine left-joins a sparse
    * daily aggregate (high-value days only, so gaps are real); then
    * `last(_, ignoreNulls)` over (type, day order, unbounded preceding)
    * carries the last seen daily total forward, 0 before the first
    * observation. The window partitions on the series key, so at cluster
    * scale each series fills independently — never a single global sort.
    * The spine side of the cross join is a broadcast handful of rows
    * (one per calendar day).
    */
  def qLocfFill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
    val spine = ev
      .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("d"))
    val types = ev.select("event_type")
      .where(col("event_type").isNotNull && col("event_type") =!= "").distinct()
    val daily = ev.where(col("value") > 200)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(graft.operators.Relational.moneySum(col("value"), 2).as("day_value"))
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    types.crossJoin(broadcast(spine))
      .join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("date"),
        col("day_value"),
        coalesce(last(col("day_value"), ignoreNulls = true).over(w), lit(0.0))
          .as("filled_value"))
  }

  // --- sessionization (beyond-reference: gap-based user sessions) ---

  /** Default session gap: a new session starts when ≥ 30 minutes pass
    * between a user's consecutive events — the same boundary rule as
    * Spark's `session_window` (an event exactly `gap` after the previous
    * one opens a new session), so the relational form below and the
    * windowed forms agree row-for-row.
    */
  val SessionGapSeconds = 1800

  /** Gap-based sessionization as pure relational algebra: `lag` marks
    * session starts, a running sum numbers sessions per user, one
    * aggregation summarizes each. Two window passes over the same
    * (user_id, ts) partitioning — a single shuffle, since both windows and
    * the final groupBy share the user_id hash partitioning.
    *
    * Timestamps compare as exact epoch doubles (microsecond precision is
    * 51 bits here — exactly representable), so the boundary rule is
    * reproducible across engines.
    */
  def sessionizeBatch(spark: SparkSession, sfDir: String,
                      gapSeconds: Int = SessionGapSeconds): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    val epoch = (c: org.apache.spark.sql.Column) => c.cast("double")
    graft.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "value")
      .withColumn("ns",
        when(prev.isNull || (epoch(col("ts")) - epoch(prev) >= gapSeconds), 1).otherwise(0))
      .withColumn("session_idx", sum("ns").over(wRun))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        // whole seconds: the engines' nanos→micros conversions differ at
        // sub-microsecond level, so fractional durations would not
        // cross-check; floored epoch is stable (same as the user-summary
        // view's duration).
        (unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("duration_s"),
        round(sum("value"), 2).as("total_value"))
  }

  /** The same sessions via the built-in `session_window` — the form that
    * also runs under Structured Streaming. Output keyed on (user_id,
    * session_start) for comparison against [[sessionizeBatch]].
    */
  def sessionWindowBatch(spark: SparkSession, sfDir: String,
                         gapSeconds: Int = SessionGapSeconds): DataFrame =
    graft.Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), s"$gapSeconds seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("total_value"))

  /** Streaming sessionization: watermark + `session_window`, append mode —
    * sessions emit once the watermark passes their close. */
  def sessionWindowStream(spark: SparkSession, dir: String,
                          gapSeconds: Int = SessionGapSeconds): DataFrame = {
    eventSource(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), s"$gapSeconds seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("total_value"))
  }

  /** Streaming exact deduplication on the event id — the incremental form
    * of the training-data exact-dedup pass ([[graft.operators.Dedup]]):
    * `dropDuplicatesWithinWatermark` keys state on event_id and expires it
    * once the watermark passes, so state is bounded by the duplicate
    * arrival horizon instead of the whole stream history — the only
    * formulation that survives an unbounded 100 TB ingest.
    */
  def dedupStream(spark: SparkSession, dir: String): DataFrame = {
    eventSource(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
  }

  /** Batch equivalent of [[dedupStream]] (same output schema). */
  def dedupBatch(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
      .dropDuplicates("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** Replay [[dedupStream]] over a static directory to completion. */
  def replayDedup(spark: SparkSession, dir: String,
                  queryName: String = "dedup_mem"): DataFrame = {
    val q: StreamingQuery = dedupStream(spark, dir)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Per-user running session state for [[sessionFlatMapStream]]. */
  case class SessionState(start_micros: Long, last_micros: Long,
                          n_events: Long, total_value: Double)
  case class SessionOut(user_id: Long, session_start: String,
                        n_events: Long, total_value: Double)

  /** Timeout-driven streaming sessionization via `flatMapGroupsWithState`
    * — the generalized custom-state surface (`session_window` handles the
    * gap rule; this shape is what arbitrary session semantics — value
    * caps, event-count splits, churn rules — would extend). State is one
    * fixed-size record per live user; an event-time timeout at
    * last_ts + gap closes a session when the watermark passes it, so
    * state for idle users is reclaimed instead of accumulating.
    */
  def sessionFlatMapStream(spark: SparkSession, dir: String,
                           gapSeconds: Int = SessionGapSeconds): Dataset[SessionOut] = {
    import spark.implicits._
    val src = eventSource(spark, dir)
    val gapMicros = gapSeconds * 1000000L
    def fmt(micros: Long): String =
      java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L))
        .atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    src
      .withWatermark("ts", "1 hour")
      // keep the watermarked ts column alive through the projection — the
      // event-time timeout needs it on the stateful operator's input
      .select(col("user_id"), col("ts"),
        // unix_micros is exact; a double round-trip can land 1µs off and
        // flip a >= gap session boundary on non-whole-second events
        unix_micros(col("ts")).as("ts_micros"),
        col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid, events, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, fmt(s.start_micros), s.n_events,
              math.rint(s.total_value * 100) / 100))
          } else {
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            events.toSeq.sortBy(_._3).foreach { case (_, _, ts, v) =>
              cur match {
                case Some(s) if ts - s.last_micros >= gapMicros =>
                  closed += SessionOut(uid, fmt(s.start_micros), s.n_events,
                    math.rint(s.total_value * 100) / 100)
                  cur = Some(SessionState(ts, ts, 1L, v))
                case Some(s) =>
                  cur = Some(SessionState(s.start_micros, ts, s.n_events + 1, s.total_value + v))
                case None =>
                  cur = Some(SessionState(ts, ts, 1L, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(Math.floorDiv(s.last_micros, 1000L) + gapSeconds * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Replay [[sessionFlatMapStream]] over a static directory. */
  def replaySessionFlatMap(spark: SparkSession, dir: String,
                           queryName: String = "session_fmgs_mem"): DataFrame = {
    val q: StreamingQuery = sessionFlatMapStream(spark, dir).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Stream-stream interval join: each view joined to the same user's
    * clicks within `withinSeconds` after it. Both sides carry a watermark,
    * and the time-range condition bounds the join state — Spark drops a
    * buffered view once the click-side watermark passes view_ts +
    * withinSeconds, so state stays proportional to the interval, not the
    * stream. This is the streaming form of the J2/W2 adjacency analysis
    * for pairs that must not wait for a batch close.
    */
  def viewClickJoinStream(spark: SparkSession, dir: String,
                          withinSeconds: Int = 3600): DataFrame = {
    def side(eventType: String, prefix: String): DataFrame = {
      eventSource(spark, dir)
        .where(col("event_type") === eventType)
        .select(col("user_id").as(s"${prefix}_user"),
          col("event_id").as(s"${prefix}_id"), col("ts").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "1 hour")
    }
    side("view", "v").join(side("click", "c"),
      expr(s"""v_user = c_user AND
              |c_ts >= v_ts AND c_ts <= v_ts + INTERVAL $withinSeconds SECONDS""".stripMargin))
      .select(col("v_user").as("user_id"), col("v_id").as("view_event_id"),
        col("c_id").as("click_event_id"),
        (unix_timestamp(col("c_ts")) - unix_timestamp(col("v_ts"))).as("gap_s"))
  }

  /** Batch equivalent of [[viewClickJoinStream]] (same output schema). */
  def viewClickJoinBatch(spark: SparkSession, sfDir: String,
                         withinSeconds: Int = 3600): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"), col("ts").as("v_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    v.join(c,
      col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr(s"INTERVAL $withinSeconds SECONDS"))
      .select(col("v_user").as("user_id"), col("v_id").as("view_event_id"),
        col("c_id").as("click_event_id"),
        (unix_timestamp(col("c_ts")) - unix_timestamp(col("v_ts"))).as("gap_s"))
  }

  /** Replay [[viewClickJoinStream]] over a static directory. */
  def replayViewClickJoin(spark: SparkSession, dir: String,
                          queryName: String = "vc_join_mem"): DataFrame = {
    val q: StreamingQuery = viewClickJoinStream(spark, dir)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  // --- custom streaming state (mapGroupsWithState) ---

  /** Input row for the stateful per-user aggregator. */
  case class UserEvent(user_id: Long, event_type: String, ts_micros: Long)
  /** Running per-user state: totals survive across micro-batches. */
  case class UserStats(user_id: Long, n_events: Long, n_purchases: Long, last_ts_micros: Long)

  /** Per-user running counters via `mapGroupsWithState` — the custom-state
    * streaming surface (SURVEY §2.10): state is a fixed-size record per
    * key, updated incrementally every micro-batch, never a re-scan. Update
    * output mode; the latest row per user is the current truth.
    */
  def userStatsStream(spark: SparkSession, dir: String): Dataset[UserStats] = {
    import spark.implicits._
    eventSource(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_micros"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (uid, events, state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0L, 0L))
          var n = prev.n_events
          var p = prev.n_purchases
          var last = prev.last_ts_micros
          events.foreach { e =>
            n += 1
            if (e.event_type == "purchase") p += 1
            if (e.ts_micros > last) last = e.ts_micros
          }
          val next = UserStats(uid, n, p, last)
          state.update(next)
          next
      }
  }

  /** Replay the stateful user-stats stream over a static directory; returns
    * the final state per user (max event count across update emissions).
    */
  def replayUserStats(spark: SparkSession, dir: String,
                      queryName: String = "user_stats"): DataFrame = {
    val q = userStatsStream(spark, dir)
      .writeStream.outputMode("update")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("n_purchases").as("n_purchases"),
           max("last_ts_micros").as("last_ts_micros"))
  }

  /** Query entry for the sessionizer (relational form; SQL-expressible). */
  def qSessions(spark: SparkSession, sfDir: String): DataFrame =
    sessionizeBatch(spark, sfDir)

  /** w8: the end-to-end Structured Streaming demo registered as a real
    * query — readStream over the events parquet → 1 h watermark → tumbling
    * daily window → memory sink, replayed to completion, and the *sink
    * contents* are what the driver hashes against the batch oracle. Counts
    * only, deliberately: a streaming replay accumulates partials in
    * micro-batch order, so a float sum could flip a rounding boundary the
    * batch oracle never sees; counts are order-free. Unlike w1 (the batch
    * form of this plan), a failure here means the streaming machinery —
    * source, watermark bookkeeping, state store, sink — changed results.
    */
  def streamDailyDemo(spark: SparkSession, dir: String): DataFrame = {
    eventSource(spark, dir, oneFilePerTrigger = false)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("date"),
              col("event_type"), col("n"))
  }

  // one linked dir per source file for the process lifetime (repeat bench
  // runs and the pre-warm pass reuse it instead of leaking temp dirs)
  private val w8SrcDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The streaming file source only accepts directories; the testdata
    * table is a single parquet file, so expose it through a linked dir.
    */
  private def streamSrcDir(sfDir: String): String = {
    val src = new java.io.File(s"$sfDir/events.parquet")
    require(src.exists, s"no events table at ${src.getPath}")
    if (src.isDirectory) src.getPath
    else w8SrcDirs.getOrElseUpdate(src.getCanonicalPath, {
      val d = java.nio.file.Files.createTempDirectory("graft_w8_src")
      java.nio.file.Files.createSymbolicLink(
        d.resolve("events.parquet"), src.toPath.toAbsolutePath)
      d.toFile.deleteOnExit()
      d.toString
    })
  }

  private def replayToTable(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }

  def qStreamDailyDemo(spark: SparkSession, sfDir: String): DataFrame =
    replayToTable(streamDailyDemo(spark, streamSrcDir(sfDir)), "w8_stream_daily")

  /** w9: stream-static enrichment join — the lookup-table pattern every
    * streaming pipeline needs (enrich a fact stream with a slowly-changing
    * dimension). The static side rides as a broadcast into each
    * micro-batch: no state store grows, no watermark applies to the dim
    * (unlike the stream-stream w3), and the join re-resolves per batch so
    * a refreshed dim table would be picked up. Counts only, same
    * order-free output rule as w8.
    */
  def streamEnrichedDemo(spark: SparkSession, dir: String,
                         customers: DataFrame): DataFrame = {
    val src = eventSource(spark, dir, oneFilePerTrigger = false)
    val dim = customers.select(col("c_custkey").as("user_id"),
      col("c_mktsegment").as("mktsegment"))
    src
      .withWatermark("ts", "1 hour")
      .join(broadcast(dim), "user_id")
      .groupBy(window(col("ts"), "1 day"), col("mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("date"),
              col("mktsegment"), col("n"))
  }

  def qStreamEnriched(spark: SparkSession, sfDir: String): DataFrame =
    replayToTable(
      streamEnrichedDemo(spark, streamSrcDir(sfDir),
        graft.Tables.customer(spark, sfDir)),
      "w9_stream_enriched")
}
