package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives: salted two-stage aggregation and the
  * distinct-count rewrite must be result-identical to their direct forms.
  */
class SkewSpec extends SparkSpec {

  test("salted two-stage sum/count equals direct aggregation") {
    val ev = Tables.events(spark, sf0001)
    def canon(rows: Array[org.apache.spark.sql.Row]): Seq[(String, Long, Long)] =
      rows.map(r => (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2))).toSeq
    val direct = canon(ev.groupBy(col("event_type").as("__key"))
      .agg(sum("value").as("s"), count(lit(1)).as("n"))
      .orderBy("__key").collect())
    val salted = canon(Skew.saltedTwoStage(ev, col("event_type"), col("event_id"), nSalts = 8)(
      Seq(sum("value").as("ps"), count(lit(1)).as("pn")),
      Seq(sum("ps").as("s"), sum("pn").as("n")))
      .orderBy("__key").collect())
    assert(salted == direct)
  }

  test("salt column spreads a hot key over multiple sub-keys") {
    val salts = Skew.withSalt(Tables.events(spark, sf0001), col("event_id"), 8)
      .where(col("event_type") === "view")
      .select("__salt").distinct().count()
    assert(salts > 4, s"expected the hot key spread over >4 salts, got $salts")
  }

  test("salted join equals the plain inner join and spreads the shuffle key") {
    val ev = Tables.events(spark, sf0001)
    val dim = ev.select("event_type").distinct()
      .withColumn("type_tag", concat(lit("tag_"), col("event_type")))
    val plain = ev.join(dim, "event_type")
      .select("event_id", "type_tag")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val salted = Skew.saltedJoin(ev, dim, "event_type", col("event_id"), nSalts = 8)
      .select("event_id", "type_tag")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(salted == plain)
    // the join key space really is (key, salt): dim side replicated 8x
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(7))))
    assert(saltedDim.count() == dim.count() * 8)
  }

  test("dfCapFraction bounds candidate fan-out under a planted hot term") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import graft.operators.Duplicates

    def joinOutputRows(p: SparkPlan): Long =
      flattenPlan(p).filter(_.nodeName.contains("Join"))
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum

    // Every document carries one planted ultra-common term plus three
    // unique ones — the worst case the guard exists for: one join key
    // whose fan-out is n² while every other key is singleton.
    val n = 120
    val docs = (0 until n)
      .map(i => (i.toLong, s"common uniq${i}a uniq${i}b uniq${i}c"))
      .toDF("doc_id", "text")

    // Uncapped (oracle-parity mode): all pairs meet through the hot term.
    // collect() (not count()) so the metrics belong to THIS queryExecution
    val exact = Duplicates.pairSimilaritiesSparse(docs, threshold = 0.0)
    assert(exact.collect().length == n * (n - 1) / 2)
    val exactJoinRows = joinOutputRows(exact.queryExecution.executedPlan)
    assert(exactJoinRows >= n.toLong * (n - 1) / 2,
      s"uncapped token join must fan out quadratically, saw $exactJoinRows")

    // Capped at 0.5: the hot term (df = n) is dropped from the candidate
    // join; nothing else is shared, so zero candidates reach the pair
    // aggregation and total join traffic stays linear in corpus size.
    val capped = Duplicates.pairSimilaritiesSparse(docs, threshold = 0.0,
      dfCapFraction = 0.5)
    assert(capped.collect().isEmpty)
    val cappedJoinRows = joinOutputRows(capped.queryExecution.executedPlan)
    assert(cappedJoinRows <= 4L * n,
      s"capped candidate join must stay linear, saw $cappedJoinRows rows")
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // Division of labor with Skew.saltedJoin, demonstrated live:
    //  - AQE skew-join (this test) is the default tool — it measures real
    //    partition sizes after the shuffle and splits hot partitions at
    //    runtime, no query rewrite, exact results. Rely on it whenever the
    //    skewed exchange feeds a plain shuffle join.
    //  - Manual salting (Skew.saltedJoin / saltedTwoStage) is for the
    //    shapes AQE cannot rewrite: a skewed key feeding a *stateful*
    //    streaming stage, a bucketed/pre-partitioned layout that must be
    //    preserved, an aggregation that carries its inputs (collect_list),
    //    or AQE-disabled clusters.
    // The size thresholds below only shrink "skewed" to fixture scale;
    // factor/threshold semantics are what production uses.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one key owns 90% of the fact side; 200 tail keys share the rest
      val fact = spark.range(0, 200000).select(
        when(col("id") < 180000, lit(0L))
          .otherwise(pmod(col("id"), lit(200L)) + 1).as("k"),
        col("id").as("v"))
      val dim = spark.range(0, 201).select(
        col("id").as("k"), concat(lit("t"), col("id")).as("tag"))
      val joined = fact.join(dim, "k")
      // AQE decides from runtime stats, so THIS queryExecution must run
      // (count() would plan a separate execution and leave this one cold)
      assert(joined.collect().length == 200000, "skew split must not change results")
      val smjs = flattenPlan(joined.queryExecution.executedPlan)
        .collect { case s: SortMergeJoinExec => s }
      assert(smjs.nonEmpty, "expected a sort-merge join with broadcast disabled")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE skew split did not fire:\n${joined.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("distinct rewrite equals countDistinct") {
    val ev = Tables.events(spark, sf0001)
    val direct = ev.groupBy("event_type").agg(countDistinct("user_id").as("d"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val rewrite = Skew.distinctRewrite(ev, "event_type", "user_id")
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rewrite == direct)
  }

  test("r16 salted region revenue equals the unsalted r3 result") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("r_name", "revenue", "n_items")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val salted = rows(graft.operators.Relational.regionRevenueSalted(spark, sf0001))
    val plain = rows(graft.operators.Relational.regionRevenue(spark, sf0001))
    assert(salted.nonEmpty && salted == plain)
  }
}
