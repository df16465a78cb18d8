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

  test("distinct rewrite equals countDistinct") {
    val ev = Tables.events(spark, sf0001)
    val direct = ev.groupBy("event_type").agg(countDistinct("user_id").as("d"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val rewrite = Skew.distinctRewrite(ev, "event_type", "user_id")
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rewrite == direct)
  }
}
