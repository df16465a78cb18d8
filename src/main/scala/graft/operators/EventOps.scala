package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence operators: the reference's conversation/message analytics
  * that need ordering within a conversation (SURVEY.md §2.3 J5, §2.4 A10,
  * §2.5 W3, §2.2 F8, §2.4 A6), expressed on `events` (user_id ≈
  * conversation).
  */
object EventOps {

  /** Day-of-week × hour activity heatmap (A10, `exper_sql.py:362-406`).
    * dow follows Spark `dayofweek`: 1=Sunday … 7=Saturday (the reference's
    * `strftime('%w')` is 0=Sunday — offset by one).
    */
  def activityHeatmap(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(dayofweek(col("ts")).cast("long").as("dow"),
              hour(col("ts")).cast("long").as("hour"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n"))

  /** Context window around matches (J5/W3, `sql_search.py:906-1027`): for
    * every `error` event, the surrounding ±2 events of the same user. The
    * reference issues one SQL query per hit (N+1); here it is a single
    * window numbering pass plus one equi-band self-join on the row number —
    * at cluster scale both sides partition on user_id so the join is
    * co-located after one shuffle.
    */
  def errorContext(spark: SparkSession, sfDir: String, k: Int = 2): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val numbered = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts")
      .withColumn("rn", row_number().over(w))
    val hits = numbered.where(col("event_type") === "error")
      .select(col("user_id").as("h_user_id"), col("event_id").as("hit_event_id"),
              col("rn").as("hit_rn"))
    numbered.join(hits,
        numbered("user_id") === hits("h_user_id") &&
          numbered("rn").between(hits("hit_rn") - k, hits("hit_rn") + k))
      .select(
        col("hit_event_id"),
        col("event_id").as("ctx_event_id"),
        col("event_type").as("ctx_event_type"),
        (col("rn") - col("hit_rn")).cast("long").as("ctx_offset"))
  }

  /** Users with both a purchase and an error event (F8 — the reference's
    * correlated pair-count subqueries, folded into one flags aggregation).
    */
  def purchaseErrorUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select("user_id", "event_type")
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchases"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("errors"))
      .where(col("purchases") > 0 && col("errors") > 0)

  /** GROUP_CONCAT(DISTINCT …) analog (A6, `sql_search.py:717`): sorted
    * distinct event types per user as one comma string.
    */
  def userTypeConcat(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select("user_id", "event_type")
      .groupBy("user_id")
      .agg(concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"))

  /** A2 at scale: sketch-based distinct counts (SURVEY §2.11). At 100 TB an
    * exact `COUNT(DISTINCT user_id)` is a full shuffle of every distinct
    * key; the HLL++ sketch aggregates partially map-side and merges
    * fixed-size state. Exact counts kept alongside for the small-SF oracle
    * runs to quantify the error. Rows-only check: HLL estimates are
    * engine-specific.
    */
  /** Percentile aggregation: exact interpolated p50/p95/p99 of value per
    * event type (both engines use linear interpolation, so the results
    * cross-check), plus the t-digest-style approximate form beside it as
    * the 100 TB path — exact percentile must sort every group's values;
    * the sketch is mergeable fixed-size state. Approx values are
    * engine-specific, so only the exact columns carry the oracle.
    */
  def valuePercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select("event_type", "value")
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))

  /** Percentile sketch (KLL-style `approx_percentile`), checked like e5 —
    * the sketch's internals are engine-specific but its rank-error
    * contract isn't: each estimate must land between the exact percentiles
    * at p ± 0.05 (hundreds of times the sketch's 1e-4 rank bound at
    * accuracy 10000, but tight enough to fail loudly on a broken sketch).
    * The oracle recomputes the exact values and pins the flags to true.
    */
  def approxPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select("event_type", "value")
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50_exact"),
        round(expr("percentile(value, 0.95)"), 6).as("p95_exact"),
        expr("approx_percentile(value, 0.5, 10000)").as("__a50"),
        expr("approx_percentile(value, 0.95, 10000)").as("__a95"),
        expr("percentile(value, 0.45)").as("__lo50"),
        expr("percentile(value, 0.55)").as("__hi50"),
        expr("percentile(value, 0.90)").as("__lo95"),
        expr("percentile(value, 1.0)").as("__hi95"))
      .select(col("event_type"), col("p50_exact"), col("p95_exact"),
        col("__a50").between(col("__lo50"), col("__hi50")).as("p50_ok"),
        col("__a95").between(col("__lo95"), col("__hi95")).as("p95_ok"))

  /** A10 dense form: the 7×24 grid as a pivot — one row per day-of-week,
    * 24 zero-filled hour columns (`exper_sql.py:362-406` reindexes to the
    * dense grid in pandas; `pivot` with explicit values does it in-plan,
    * keeping the aggregation map-side combinable).
    */
  def activityHeatmapDense(spark: SparkSession, sfDir: String): DataFrame = {
    val pivoted = Tables.events(spark, sfDir)
      .select(dayofweek(col("ts")).cast("long").as("dow"), hour(col("ts")).as("hour"))
      .groupBy("dow")
      .pivot("hour", 0 to 23)
      .count()
      .na.fill(0L)
    (0 to 23).foldLeft(pivoted) { (df, h) =>
      df.withColumnRenamed(h.toString, f"h$h%02d")
    }
  }

  /** As-of join (backward): for each purchase, the most recent prior-or-
    * simultaneous view by the same user. A naive formulation is a range
    * self-join plus a per-purchase max — quadratic in events per user; the
    * Spark-first form is ONE window pass over the interleaved stream:
    * `last(view_ts, ignoreNulls)` over (user, time) up to the current row
    * carries the latest view forward, and purchase rows just read it.
    * Scale shape: single shuffle on user_id, no join at all.
    */
  def asofViewBeforePurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .where(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("last_view_ts",
        last(when(col("event_type") === "view", col("ts")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("purchase_event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        date_format(col("last_view_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_view_ts"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("last_view_ts")))
          .as("view_to_purchase_s"))
  }

  /** J-custom: the same latest-view-before-purchase question answered by
    * the native merge as-of operator
    * ([[org.apache.spark.sql.graftext.AsofJoinExec]]) instead of the
    * union+window composition above. Two genuinely separate relations
    * (purchases left, views right), one hash shuffle per side, a streaming
    * merge, and no single-partition window anywhere — the plan that
    * survives a 1000-executor scale-up. Output schema matches
    * [[asofViewBeforePurchase]] so the two forms are directly comparable.
    */
  def asofNative(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("ts").as("view_ts"))
    org.apache.spark.sql.graftext.AsofJoin
      .asof(purchases, views, "user_id", "ts", "v_uid", "view_ts")
      .select(
        col("user_id"),
        col("event_id").as("purchase_event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_view_ts"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("view_ts")))
          .as("view_to_purchase_s"))
  }

  /** Forward as-of with a tolerance window: the first view at-or-after
    * each purchase, but only within one hour — "did the buyer come back to
    * look?". Exercises [[org.apache.spark.sql.graftext.AsofDirection.Forward]]
    * and the tolerance bound (micros) on the native merge operator; same
    * single-shuffle-per-side plan as the backward form. The output carries
    * only the matched TIME (not payload), so equal-time view duplicates
    * cannot make the result nondeterministic.
    */
  def asofForward(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("ts").as("view_ts"))
    org.apache.spark.sql.graftext.AsofJoin
      .asof(purchases, views, "user_id", "ts", "v_uid", "view_ts",
        direction = "forward", tolerance = 3600L * 1000000L)
      .select(
        col("user_id"),
        col("event_id").as("purchase_event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss").as("next_view_ts"),
        (unix_timestamp(col("view_ts")) - unix_timestamp(col("ts")))
          .as("purchase_to_view_s"))
  }

  /** Nearest as-of: the view closest in time to each purchase, on either
    * side, exact-distance ties resolving to the earlier (backward) view.
    * Distances compare in epoch micros.
    */
  def asofNearest(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("ts").as("view_ts"))
    org.apache.spark.sql.graftext.AsofJoin
      .asof(purchases, views, "user_id", "ts", "v_uid", "view_ts",
        direction = "nearest")
      .select(
        col("user_id"),
        col("event_id").as("purchase_event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss").as("nearest_view_ts"),
        abs(unix_timestamp(col("view_ts")) - unix_timestamp(col("ts")))
          .as("distance_s"))
  }

  /** A2 skew-safe exact form: `event_type` has only a handful of hot
    * values, so a direct COUNT(DISTINCT user_id) shuffles every row to ≤5
    * reducers; deduping on the high-cardinality (type, user) composite
    * first spreads the heavy shuffle evenly, and the second shuffle moves
    * one row per distinct pair (see [[graft.functions.Skew]]).
    */
  def distinctUsersSkewSafe(spark: SparkSession, sfDir: String): DataFrame =
    graft.functions.Skew.distinctRewrite(
      Tables.events(spark, sfDir), "event_type", "user_id")

  /** A2 sketch form. HLL++ register contents are engine-specific, so the
    * raw estimate can't hash-match a DuckDB oracle — but the sketch's
    * CONTRACT can: the oracle recomputes the exact count and asserts the
    * estimate landed within a conservative 5× of the requested 1% rsd
    * (HLL++ error is probabilistic but fixed for a given input set, so the
    * flag is deterministic). `approx_ok = false` rows would hash-mismatch
    * the oracle's literal `true`, failing the gate loudly.
    */
  def approxDistinctUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select("event_type", "user_id")
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(
        col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users"))
          <= greatest(col("exact_users") * 0.05, lit(1.0))).as("approx_ok"))

  /** e5b: the SERVING half of e5 — the sketch ALONE. [[approxDistinctUsers]]'
    * row is dominated by the exact `COUNT(DISTINCT)` its error-contract
    * oracle requires next to the estimate, i.e. by the verifier the sketch
    * exists to replace — correct for the oracle, misleading as a
    * benchmark of what a 100 TB user runs. This row computes only the
    * HLL++ estimate (one partial-aggregating pass, mergeable fixed-size
    * registers, no distinct shuffle). The raw estimate is engine-specific
    * register state no DuckDB SQL can reproduce, so this is deliberately a
    * rows-only registration (the one such row in the registry); the
    * estimate's 5%-of-exact contract is still pinned twice — by e5's
    * hash-checked oracle over the SAME sketch ([[approxDistinctUsers]]
    * computes the identical `approx_count_distinct(user_id, 0.01)`), and
    * by the spec asserting this row's values equal e5's estimates.
    */
  def approxDistinctUsersSketchOnly(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select("event_type", "user_id")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))

  /** Ordered conversion funnel view → click → purchase: each step counts
    * users whose step event strictly follows their previous step's first
    * occurrence. Three user_id-keyed aggregate+join rounds that all share
    * one hash partitioning — events stream through narrow (user_id, ts)
    * projections, and the funnel row itself is a 1-row final aggregate.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select("user_id", "event_type", "ts")
    val views = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val clicks = ev.where(col("event_type") === "click")
      .join(views, "user_id").where(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val purchases = ev.where(col("event_type") === "purchase")
      .join(clicks, "user_id").where(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    views.select(lit("view").as("step"), col("user_id"))
      .union(clicks.select(lit("view>click").as("step"), col("user_id")))
      .union(purchases.select(lit("view>click>purchase").as("step"), col("user_id")))
      .groupBy("step").agg(countDistinct("user_id").as("n_users"))
  }

  /** Cohort retention: users grouped by first-active day, with D1/D7
    * return counts — the standard product-analytics rollup. Active
    * (user, day) pairs dedupe first, so the cohort join and both
    * aggregations run over at most |users|×|days| narrow rows; the
    * cohort frame and the activity frame share the user_id partitioning.
    */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val active = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = active.groupBy("user_id").agg(min("day").as("cohort_day"))
    active.join(cohorts, "user_id")
      .groupBy("cohort_day")
      .agg(countDistinct("user_id").as("cohort_size"),
        countDistinct(when(datediff(col("day"), col("cohort_day")) === 1,
          col("user_id"))).as("d1_returned"),
        countDistinct(when(datediff(col("day"), col("cohort_day")) === 7,
          col("user_id"))).as("d7_returned"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
        col("cohort_size"), col("d1_returned"), col("d7_returned"))
  }

  /** Semi-structured payload stats: parse the `props` JSON column with a
    * declared schema (codegen'd `get_json_object`, no UDF) and aggregate
    * the extracted field per event type — the "JSON column at scale"
    * pattern where the parse runs inside the scan projection and only
    * (event_type, k) longs reach the aggregate.
    */
  def propsStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), count("k").as("n_with_k"),
        round(avg("k"), 6).as("avg_k"),
        min("k").as("min_k"), max("k").as("max_k"))

  /** e12: the power-user Pareto report — per activity decile (users
    * ranked by event count, ntile over the per-user aggregate), user and
    * event counts, exact-decimal value totals, event share, and the
    * cumulative share that answers "how much of the load do the top 10%
    * generate". The per-user frame is the only corpus-sized stage; the
    * decile windows run over users (already one row each), the report
    * over 10 rows.
    */
  def powerUserPareto(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("value"))
    val byActivity = Window.orderBy(desc("n_events"), asc("user_id"))
    val all = Window.partitionBy()
    val cum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perUser.withColumn("decile", ntile(10).over(byActivity))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum("n_events").as("n_events"),
        round(sum("value"), 2).cast("double").as("total_value"))
      .withColumn("event_share",
        round(col("n_events").cast("double") / sum("n_events").over(all), 6))
      .withColumn("cum_event_share",
        round(sum(col("n_events")).over(cum).cast("double") /
          sum("n_events").over(all), 6))
  }
}
