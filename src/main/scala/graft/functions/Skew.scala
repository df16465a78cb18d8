package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot grouping/join keys.
  *
  * Plain `sum`/`count` aggregations don't need these — Spark partial-
  * aggregates map-side. The techniques matter when the aggregate carries
  * its inputs (collect_list, exact distinct, exact quantiles) or when a
  * shuffle join has a hot key AQE cannot split (e.g. pre-3.2 clusters or
  * disabled AQE):
  *
  *  - [[withSalt]]/[[saltedTwoStage]]: explode one hot key into `nSalts`
  *    sub-keys, partially aggregate per (key, salt), then merge per key —
  *    the shuffle spreads over nSalts × keys reducers instead of one per
  *    hot key;
  *  - [[distinctRewrite]]: exact COUNT(DISTINCT v) per hot key as
  *    groupBy(key, v) → groupBy(key) count — the first shuffle keys on
  *    (key, v), which is high-cardinality and therefore skew-free, and the
  *    second only moves one row per distinct value.
  */
object Skew {

  /** Deterministic salt in [0, nSalts) derived from a row-unique column. */
  def saltCol(rowKey: Column, nSalts: Int): Column =
    pmod(xxhash64(rowKey), lit(nSalts.toLong)).cast("int")

  def withSalt(df: DataFrame, rowKey: Column, nSalts: Int): DataFrame =
    df.withColumn("__salt", saltCol(rowKey, nSalts))

  /** Two-stage aggregation over a salted key: `partial` aggregates per
    * (key, salt); `merge` combines the per-salt partials per key.
    */
  def saltedTwoStage(df: DataFrame, key: Column, rowKey: Column, nSalts: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    withSalt(df, rowKey, nSalts)
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(merge.head, merge.tail: _*)

  /** Exact distinct count per key, skew-safe: dedupe on the wide
    * (key, value) composite first, count second.
    */
  def distinctRewrite(df: DataFrame, key: String, value: String): DataFrame =
    df.select(key, value).distinct()
      .groupBy(key)
      .agg(count(lit(1)).as(s"distinct_$value"))

  /** Salted equi-join for a skewed fact side: the fact's hot join keys are
    * spread across `nSalts` sub-keys by a deterministic row-hash salt, and
    * the (small-but-not-broadcastable) dim side is replicated once per
    * salt with `explode(sequence(...))`, so the shuffle keys on
    * (key, salt) and no single reducer receives a whole hot key.
    *
    * Result equals `fact.join(dim, key, "inner")` exactly — only the
    * physical distribution changes. AQE's skew-join split covers the same
    * case at runtime when it can; this is the declarative form for plans
    * AQE can't rewrite (e.g. when the skewed exchange feeds a stateful or
    * bucketed stage).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, rowKey: Column,
                 nSalts: Int): DataFrame = {
    val saltedFact = withSalt(fact, rowKey, nSalts)
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
