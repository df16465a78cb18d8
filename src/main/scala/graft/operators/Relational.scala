package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics pack: every distinct SQL shape of the reference's
  * query surface (SURVEY.md §2.2–§2.8) exercised on the TPC-H-ish driver
  * tables at controlled scale. Join/agg shapes mirror the reference's
  * `conversations ⋈ messages` workloads (J1–J7, A1–A13, T1–T4, W-absent
  * top-k-per-group) but are written Spark-first: broadcast hints on the
  * small dimensions, map-side-combinable conditional sums, window functions
  * instead of self-joins, and rounding pinned where float aggregation order
  * would otherwise make results engine-dependent.
  *
  * Float determinism: money columns carry exactly 2 decimals and discounts 2,
  * so sums rounded to 2 (or products to 4) decimals recover the exact decimal
  * value on any summation order; averages are rounded to 6.
  */
object Relational {

  /** Pricing summary (A1/A3/A4 shapes; classic scan→agg). Filter is pushed
    * to the parquet scan; single shuffle on the 6-value grouping key.
    */
  /** Exact engine-portable money sum: each double term is cast to
    * DECIMAL(18,4) (deterministic per-row rounding of the same IEEE double
    * in any engine), summed exactly in decimal — independent of
    * partitioning and summation order — and emitted as the double nearest
    * that exact decimal. A plain double sum rounds its accumulated ~1-ulp
    * order wobble straight into the output and flips the last digit
    * whenever a group's total lands on a rounding boundary (observed on
    * r3/r14 at sf0.1: …582.02955 → .0296 Spark vs .0295 DuckDB).
    */
  private[graft] def moneySum(term: Column, scale: Int): Column =
    round(sum(term.cast("decimal(18,4)")), scale).cast("double")

  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") <= lit("2000-12-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        moneySum(col("l_extendedprice"), 2).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        // exact decimal sum → one deterministic double division (a plain
        // double avg inherits the sum's order wobble; see moneySum)
        round(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double") /
          count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("count_order"))

  /** Top-10 revenue orders for one market segment (J1 chain + T1 top-k).
    * Catalyst/AQE broadcasts the filtered customer side; top-k runs as
    * TakeOrderedAndProject, no global sort materialization. Tie-broken on
    * o_orderkey so the result set is deterministic across engines.
    */
  def topRevenueOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy("o_orderkey")
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
           date_format(first(col("o_orderdate")), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(10)
  }

  /** Revenue per customer region (J1 ×4 with broadcast dims — the deep join
    * chain shape). region/nation are tiny and broadcast explicitly; the
    * orders⋈lineitem join shuffles once on the order key.
    */
  def regionRevenue(spark: SparkSession, sfDir: String): DataFrame =
    // aggregates the shared grouping-input frame (r14): `rev` is already
    // the per-item decimal(18,4) term, so round(sum(rev), 4) is exactly
    // moneySum over the raw expression — value-identical, oracle-checked
    revenueGroupingInput(spark, sfDir)
      .groupBy("r_name")
      .agg(round(sum(col("rev")), 4).cast("double").as("revenue"),
           count(lit(1)).as("n_items"))

  /** Multi-level aggregation in one pass: `rollup(region, nation)` emits
    * the per-nation rows, per-region subtotals, and the grand total from a
    * single shuffle (Spark expands the grouping sets map-side — no
    * re-aggregation join, no second scan; the three levels of the
    * reference's separate summary queries for the price of one).
    * `grouping()` flags distinguish subtotal rows from real NULLs; labels
    * are coalesced to 'ALL' for a stable, engine-portable output.
    */
  /** Narrow (r_name, n_name, rev-as-decimal) join frame shared by the
    * grouping-set aggregations: Expand duplicates every input row per
    * grouping set, so it should carry 3 columns, not 12; rev is decimal
    * per item before the Expand (see moneySum — the grand total is the
    * biggest sum in the suite and the most boundary-prone).
    */
  /** Shared enriched fact `(c_nationkey, l_orderkey, l_extendedprice,
    * l_discount)` — the lineitem⋈orders⋈customer chain every revenue
    * query walks. Shared-cached (r14): r3/r14/r15 consume it through
    * [[revenueGroupingInput]] and r16's salted form keys it directly, so
    * the order-key shuffle join runs once per corpus (the classic
    * materialized enriched-fact table of a warehouse).
    */
  private def revenueFact(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_extendedprice", "l_discount")
    Caches.shared(l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_nationkey"), col("l_orderkey"),
        col("l_extendedprice"), col("l_discount")))
  }

  private def revenueGroupingInput(spark: SparkSession, sfDir: String): DataFrame = {
    val r = broadcast(Tables.region(spark, sfDir))
    val n = broadcast(Tables.nation(spark, sfDir))
    val fact = revenueFact(spark, sfDir)
    // shared-cached (r14): r3's region aggregate and the r14/r15 grouping
    // sets all aggregate this identical narrow frame
    Caches.shared(fact
      .join(n, fact("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .select(col("r_name"), col("n_name"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)").as("rev")))
  }

  /** SQL form on purpose: in Spark 4.1 the Dataset-API `rollup`/`cube` on
    * any join-derived frame false-positives the ambiguous-self-join
    * detector (the grouping-set Expand duplicates dataset-id-tagged
    * attributes); GROUP BY ROLLUP/CUBE through a SQL entry resolves
    * cleanly and plans the identical Expand + single hash aggregate.
    * Per-call unique view name, dropped right after the (eager) analysis
    * of sql() — a fixed name would be session-global shared state.
    */
  private def groupingSetsQuery(joined: DataFrame, groupByClause: String): DataFrame = {
    val view = s"graft_rollup_input_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    joined.createOrReplaceTempView(view)
    try joined.sparkSession.sql(
      s"""SELECT coalesce(r_name, 'ALL') AS region,
         |       coalesce(n_name, 'ALL') AS nation,
         |       CAST(round(sum(rev), 4) AS DOUBLE) AS revenue,
         |       count(*) AS n_items,
         |       CAST(grouping(r_name) AS BIGINT) AS g_region,
         |       CAST(grouping(n_name) AS BIGINT) AS g_nation
         |FROM $view
         |GROUP BY $groupByClause""".stripMargin)
    finally joined.sparkSession.catalog.dropTempView(view)
  }

  /** Multi-level aggregation in one pass (see class comment on the SQL
    * entry): rollup = per-nation rows, per-region subtotals, grand total,
    * all from one Expand + hash aggregate.
    */
  def revenueRollup(spark: SparkSession, sfDir: String): DataFrame =
    groupingSetsQuery(revenueGroupingInput(spark, sfDir), "ROLLUP (r_name, n_name)")

  /** CUBE adds the nation-only slice to the rollup's grouping sets — all
    * four (r,n)/(r)/(n)/() summaries from the same single-shuffle Expand.
    */
  def revenueCube(spark: SparkSession, sfDir: String): DataFrame =
    groupingSetsQuery(revenueGroupingInput(spark, sfDir), "CUBE (r_name, n_name)")

  /** Manual pivot via conditional aggregation (A4): order counts per
    * priority broken out by status column — the reference's
    * `SUM(CASE WHEN sender=… THEN 1 END)` shape.
    */
  def orderStatusPivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("open_orders"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("filled_orders"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("pending_orders"),
        count(lit(1)).as("total_orders"))

  /** Customers with no large order (U2/anti-join shape; reference never
    * needs it but the engine exposes it): the anti side is filtered before
    * the join so the predicate pushes to the orders scan.
    */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_name", "c_mktsegment")
    val o = Tables.orders(spark, sfDir)
      .where(col("o_totalprice") > 300000).select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
  }

  /** Customers with at least one order — EXISTS semi-join (F7/J4). */
  def customersWithOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
    val o = Tables.orders(spark, sfDir).select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
  }

  /** Left-outer join keeping order-less customers (J3) + HAVING (A5):
    * per-customer order stats, empty customers kept with zero counts.
    */
  def customerOrderStats(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    val o = Tables.orders(spark, sfDir).select("o_custkey", "o_totalprice")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_totalprice")).as("n_orders"),
           coalesce(moneySum(col("o_totalprice"), 2), lit(0.0)).as("total_spent"))
  }

  /** Top-3 parts per brand by retail price — top-k-per-group via window
    * row_number (T2; the reference does this in pandas `head(3)`).
    * Deterministic tie-break on p_partkey.
    */
  def topPartsPerBrand(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(desc("p_retailprice"), asc("p_partkey"))
    Tables.part(spark, sfDir)
      .select("p_brand", "p_partkey", "p_name", "p_retailprice")
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
  }

  /** Monthly revenue time series (A9 time-bucketed aggregation). */
  def monthlyRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
           moneySum(col("o_totalprice"), 2).as("revenue"))

  /** Supplier account stats per nation (J1 + A3 with broadcast dim). */
  def supplierNationStats(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.supplier(spark, sfDir)
    val n = broadcast(Tables.nation(spark, sfDir))
    s.join(n, s("s_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
           moneySum(col("s_acctbal"), 2).as("total_balance"),
           round(avg(col("s_acctbal")), 6).as("avg_balance"))
  }

  /** Histogram / bucketized counts (A11): fixed value buckets over
    * events.value, mirroring the reference's duration-bucket `pd.cut`.
    */
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val v = col("value")
    val bucket = when(v < 50, "00-50").when(v < 100, "050-100")
      .when(v < 200, "100-200").when(v < 500, "200-500").otherwise("500+")
    Tables.events(spark, sfDir)
      .select(col("event_type"), bucket.as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))
  }

  /** Per-group percentage via window over aggregate (A12): each event
    * type's share of total value. The window runs over the 5-row aggregate,
    * not the fact table — no second full-data shuffle.
    */
  /** T2 variant: top-k categories plus an "Other" rollup — the reference's
    * pie-slice shape (`exper_sql.py:1717-1733`, top 3 models + Other done
    * in pandas). Relational form: rank the aggregated categories, relabel
    * the tail, re-aggregate. Both aggregations group a handful of rows —
    * the heavy lifting is the first map-side-combined sum over the fact
    * table.
    */
  def topTypesWithOther(spark: SparkSession, sfDir: String, k: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = Tables.events(spark, sfDir)
      .select("event_type", "value")
      .groupBy("event_type")
      .agg(sum("value").as("total_value"))
    totals
      .withColumn("rk",
        row_number().over(Window.orderBy(desc("total_value"), asc("event_type"))))
      .select(
        when(col("rk") <= k, col("event_type")).otherwise(lit("Other")).as("slice"),
        col("total_value"))
      .groupBy("slice")
      .agg(round(sum("total_value"), 2).as("value"))
  }

  def typeValueShare(spark: SparkSession, sfDir: String): DataFrame = {
    val agged = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(round(sum(col("value")), 2).as("type_value"))
    agged.withColumn("pct",
        round(col("type_value") * 100.0 / sum(col("type_value")).over(Window.partitionBy()), 6))
  }

  /** r16: [[regionRevenue]] with the fact⋈nation edge running through
    * [[graft.functions.Skew.saltedJoin]] — the declarative skew-mitigation
    * form for a hot low-cardinality join key (25 nations over millions of
    * fact rows: every reducer of a plain shuffle join receives a whole
    * nation). The fact's rows spread across 8 deterministic salts, the
    * nation×region dim replicates once per salt, and the shuffle keys on
    * (nationkey, salt) — no single reducer owns a nation. AQE's skew split
    * covers this at runtime when it can; this is the plan-level form for
    * exchanges AQE can't rewrite (stateful/bucketed consumers), registered
    * so the driver times it and the oracle proves result-equality with the
    * unsalted r3.
    */
  def regionRevenueSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val r = Tables.region(spark, sfDir).select("r_regionkey", "r_name")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_regionkey")
    val dim = n.join(r, n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey"), col("r_name"))
    // the salted join keys the same shared enriched fact (r14)
    val fact = revenueFact(spark, sfDir)
      .select(col("c_nationkey").as("n_nationkey"), col("l_orderkey"),
        col("l_extendedprice"), col("l_discount"))
    graft.functions.Skew
      .saltedJoin(fact, dim, "n_nationkey", col("l_orderkey"), nSalts = 8)
      .groupBy("r_name")
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
           count(lit(1)).as("n_items"))
  }
}
