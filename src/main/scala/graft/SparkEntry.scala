package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over the driver test tables, with a DuckDB-equivalent oracle SQL where the
  * semantics are SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The `message_pairs` view analog: window-paired view→click events.
    */
  def entry(spark: SparkSession): DataFrame =
    Views.eventPairs(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_event_pairs"   -> (Views.eventPairs _),
    "v2_user_summary"  -> (Views.userSummary _),
    "v3_length_stats"  -> (Views.lengthStats _),
    "v4_time_activity" -> (Views.timeActivity _),
    "v5_type_usage"    -> (Views.typeUsage _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "v1_event_pairs" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, event_type, ts,
        |         lead(event_id)   OVER w AS next_id,
        |         lead(event_type) OVER w AS next_type,
        |         lead(ts)         OVER w AS next_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS view_event_id, next_id AS click_event_id,
        |       CAST(floor(epoch(next_ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) AS gap_s
        |FROM ordered WHERE event_type = 'view' AND next_type = 'click'""".stripMargin,
    "v2_user_summary" ->
      """SELECT user_id,
        |       count(*) AS event_count,
        |       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view_count,
        |       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click_count,
        |       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase_count,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
        |       (CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT)) / 60.0 AS duration_min
        |FROM events GROUP BY user_id""".stripMargin,
    "v3_length_stats" ->
      """SELECT user_id, event_type, count(*) AS n,
        |       avg(length(props)) AS avg_len, min(length(props)) AS min_len,
        |       max(length(props)) AS max_len, sum(length(props)) AS sum_len
        |FROM events GROUP BY user_id, event_type""".stripMargin,
    "v4_time_activity" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS date,
        |       count(*) AS event_count, count(DISTINCT user_id) AS active_users
        |FROM events GROUP BY 1, 2""".stripMargin,
    "v5_type_usage" ->
      """SELECT event_type, count(*) AS use_count,
        |       count(DISTINCT user_id) AS distinct_users,
        |       round(avg(value), 6) AS avg_value, round(sum(value), 2) AS sum_value
        |FROM events WHERE event_type IS NOT NULL AND event_type <> ''
        |GROUP BY event_type""".stripMargin,
  )
}
