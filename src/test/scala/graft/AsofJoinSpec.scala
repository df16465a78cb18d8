package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.{AsofJoin, AsofJoinPlan}

/** The native merge as-of operator: correctness against a brute-force
  * greatest-time-≤ recompute, edge semantics (ties, no-match, null times),
  * and plan shape (merge exec, no window, left filters pushed below).
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof picks the greatest right time <= left time, inclusive ties") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:10"), "t2"),
      (2L, ts("2024-01-01 09:00:00"), "t3"), // before any quote: no match
      (3L, ts("2024-01-01 12:00:00"), "t4")  // key with no quotes at all
    ).toDF("sym", "trade_ts", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:05"), 101.0), // tie with t1: inclusive
      (1L, ts("2024-01-01 10:00:09"), 102.0),
      (1L, ts("2024-01-01 10:00:11"), 103.0), // after t2: never matches
      (2L, ts("2024-01-01 09:30:00"), 50.0)
    ).toDF("q_sym", "quote_ts", "px")
    val got = AsofJoin.asof(trades, quotes, "sym", "trade_ts", "q_sym", "quote_ts")
      .select("trade_id", "px").as[(String, Option[Double])].collect().toMap
    assert(got == Map(
      "t1" -> Some(101.0), "t2" -> Some(102.0), "t3" -> None, "t4" -> None))
  }

  test("date-typed time columns widen via UnixDate and match by day order") {
    val l = Seq((1L, "2024-03-10", "a"), (1L, "2024-03-01", "b"))
      .toDF("k", "d", "tag").select(col("k"), to_date(col("d")).as("d"), col("tag"))
    val r = Seq((1L, "2024-03-05", 5.0), (1L, "2024-02-28", 2.0))
      .toDF("rk", "rd", "v").select(col("rk"), to_date(col("rd")).as("rd"), col("v"))
    val got = AsofJoin.asof(l, r, "k", "d", "rk", "rd")
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(got == Map("a" -> Some(5.0), "b" -> Some(2.0)))
  }

  test("mixed Date/Timestamp time columns are rejected, not silently mismatched") {
    // Date widens to days, Timestamp to epoch micros — comparing them as raw
    // longs would match garbage, so the pairing must fail loudly
    val l = Seq((1L, ts("2024-03-10 00:00:00"), "a")).toDF("k", "t", "tag")
    val r = Seq((1L, "2024-03-05", 5.0))
      .toDF("rk", "rd", "v").select(col("rk"), to_date(col("rd")).as("rd"), col("v"))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, "k", "t", "rk", "rd")
    }
    assert(e.getMessage.contains("mix distinct time types"))
  }

  test("TIMESTAMP_NTZ time columns on both sides are accepted and match") {
    // NTZ is physically epoch-ordered micros, same as TimestampType; the
    // merge must take it directly (naive-timestamp parquet reads as NTZ
    // under Spark's default inference)
    val l = Seq((1L, "2024-03-10 00:00:00", "a")).toDF("k", "t", "tag")
      .select(col("k"), col("t").cast("timestamp_ntz").as("t"), col("tag"))
    val r = Seq((1L, "2024-03-05 00:00:00", 5.0)).toDF("rk", "rt", "v")
      .select(col("rk"), col("rt").cast("timestamp_ntz").as("rt"), col("v"))
    val out = AsofJoin.asof(l, r, "k", "t", "rk", "rt").collect()
    assert(out.length == 1 && out(0).getAs[Double]("v") == 5.0)
    // mixing NTZ with LTZ is rejected like Date/Timestamp
    val lm = l.select(col("k"), col("t").cast("timestamp").as("t"), col("tag"))
    val em = intercept[IllegalArgumentException] {
      AsofJoin.asof(lm, r, "k", "t", "rk", "rt")
    }
    assert(em.getMessage.contains("mix distinct time types"))
  }

  test("right rows with null time sort first and never match") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "a")).toDF("k", "t", "tag")
    val r = Seq(
      (1L, None, 1.0),
      (1L, Some(ts("2024-01-01 09:00:00")), 2.0)
    ).toDF("rk", "rt", "v")
    val got = AsofJoin.asof(l, r, "k", "t", "rk", "rt")
      .select("tag", "v").as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(("a", Some(2.0))))
  }

  test("native as-of equals the brute-force greatest-<= recompute on testdata") {
    val ev = Tables.events(spark, sf0001)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vts"))
    val brute = p.join(v, col("vu") === col("user_id") && col("vts") <= col("ts"), "left")
      .groupBy("user_id", "event_id", "ts").agg(max("vts").as("view_ts"))
      .select(col("event_id"), col("view_ts").cast("string"))
      .as[(Long, Option[String])].collect().toMap
    val native = EventOps.asofNative(spark, sf0001)
      .select(col("purchase_event_id"),
        // second-truncated in the query output; recompute comparison at
        // full precision instead via the raw operator:
        col("asof_view_ts"))
      .as[(Long, Option[String])].collect()
    assert(native.length == brute.size)
    // full-precision check through the operator itself
    val nativeFull = AsofJoin.asof(p, v, "user_id", "ts", "vu", "vts")
      .select(col("event_id"), col("vts").cast("string"))
      .as[(Long, Option[String])].collect().toMap
    assert(nativeFull == brute)
  }

  test("forward picks the least right time >= left time; rows are shared") {
    val l = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"), // both a and b match the same quote
      (1L, ts("2024-01-01 10:00:03"), "b"),
      (1L, ts("2024-01-01 10:00:05"), "c"), // inclusive tie at 10:00:05
      (1L, ts("2024-01-01 10:00:06"), "d")  // nothing after: no match
    ).toDF("k", "t", "tag")
    val r = Seq(
      (1L, ts("2024-01-01 09:59:00"), 1.0), // before everything: never forward
      (1L, ts("2024-01-01 10:00:05"), 2.0)
    ).toDF("rk", "rt", "v")
    val got = AsofJoin.asof(l, r, "k", "t", "rk", "rt", direction = "forward")
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(got == Map("a" -> Some(2.0), "b" -> Some(2.0), "c" -> Some(2.0), "d" -> None))
  }

  test("tolerance bounds the match distance in widened units (micros)") {
    val l = Seq((1L, ts("2024-01-01 10:00:10"), "a")).toDF("k", "t", "tag")
    val r = Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("rk", "rt", "v")
    def run(dir: String, tolMicros: Long) =
      AsofJoin.asof(l, r, "k", "t", "rk", "rt", dir, tolMicros)
        .select("v").as[Option[Double]].collect().head
    assert(run("backward", 10L * 1000000L) == Some(1.0)) // exactly 10 s away
    assert(run("backward", 9L * 1000000L) == None)
    assert(run("nearest", 9L * 1000000L) == None)
  }

  test("nearest picks the closer side; an exact distance tie goes backward") {
    val l = Seq(
      (1L, ts("2024-01-01 10:00:10"), "closer_fwd"),  // 4 s back vs 2 s fwd
      (1L, ts("2024-01-01 10:00:18"), "closer_back"), // 6 s back vs 42 s fwd
      (1L, ts("2024-01-01 10:01:00"), "tie")          // 48 s to both
    ).toDF("k", "t", "tag")
    val r = Seq(
      (1L, ts("2024-01-01 10:00:06"), 1.0),
      (1L, ts("2024-01-01 10:00:12"), 2.0),
      (1L, ts("2024-01-01 10:01:48"), 3.0)
    ).toDF("rk", "rt", "v")
    val got = AsofJoin.asof(l, r, "k", "t", "rk", "rt", direction = "nearest")
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(got == Map(
      "closer_fwd" -> Some(2.0), "closer_back" -> Some(2.0), "tie" -> Some(2.0)))
  }

  test("unknown direction is rejected loudly") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "a")).toDF("k", "t", "tag")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(l, l, "k", "t", "k", "t", direction = "sideways")
    }
    assert(e.getMessage.contains("backward|forward|nearest"))
  }

  test("forward and nearest equal brute-force recomputes on testdata") {
    val ev = Tables.events(spark, sf0001)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vts"))
    val joined = p.join(v, col("vu") === col("user_id"), "left")
      .groupBy("user_id", "event_id", "ts")
      .agg(
        max(when(col("vts") <= col("ts"), col("vts"))).as("bts"),
        min(when(col("vts") >= col("ts"), col("vts"))).as("fts"))
    val bruteFwd = joined
      .select(col("event_id"),
        when(unix_micros(col("fts")) - unix_micros(col("ts")) <= 3600L * 1000000L,
          col("fts")).cast("string"))
      .as[(Long, Option[String])].collect().toMap
    val gotFwd = AsofJoin.asof(p, v, "user_id", "ts", "vu", "vts",
        direction = "forward", tolerance = 3600L * 1000000L)
      .select(col("event_id"), col("vts").cast("string"))
      .as[(Long, Option[String])].collect().toMap
    assert(gotFwd == bruteFwd)
    val bruteNear = joined
      .select(col("event_id"),
        when(col("bts").isNull, col("fts"))
          .when(col("fts").isNull, col("bts"))
          .when(unix_micros(col("ts")) - unix_micros(col("bts"))
            <= unix_micros(col("fts")) - unix_micros(col("ts")), col("bts"))
          .otherwise(col("fts")).cast("string"))
      .as[(Long, Option[String])].collect().toMap
    val gotNear = AsofJoin.asof(p, v, "user_id", "ts", "vu", "vts",
        direction = "nearest")
      .select(col("event_id"), col("vts").cast("string"))
      .as[(Long, Option[String])].collect().toMap
    assert(gotNear == bruteNear)
  }

  test("plan: merge exec present, no window, no nested-loop join") {
    val df = EventOps.asofNative(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Window"), s"native as-of must not plan a window:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("left-only filters push below the as-of join; right filters stay") {
    val ev = Tables.events(spark, sf0001)
    val p = ev.where(col("event_type") === "purchase").select(col("user_id"), col("ts"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vts"))
    val filtered = AsofJoin.asof(p, v, "user_id", "ts", "vu", "vts")
      .where(col("user_id") % 2 === 0)
    val opt = filtered.queryExecution.optimizedPlan
    // after pushdown the top node is the as-of join itself, with the
    // left-side predicate sitting inside its left subtree
    assert(opt.isInstanceOf[AsofJoinPlan], s"filter not pushed:\n$opt")
    val leftSide = opt.asInstanceOf[AsofJoinPlan].left.toString
    assert(leftSide.contains("% 2"), s"left predicate missing below join:\n$leftSide")
    // a right-side predicate must NOT push (it changes match selection)
    val rightFiltered = AsofJoin.asof(p, v, "user_id", "ts", "vu", "vts")
      .where(col("vts").isNotNull)
    assert(!rightFiltered.queryExecution.optimizedPlan.isInstanceOf[AsofJoinPlan])
  }
}
