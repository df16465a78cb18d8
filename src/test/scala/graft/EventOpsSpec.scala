package graft

import graft.operators.EventOps
import graft.streaming.EventStream

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  test("props stats: every event carries k, aggregates are consistent") {
    val got = EventOps.propsStats(spark, sf0001)
      .as[(String, Long, Long, Double, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, n, nk, avg, mn, mx) =>
      assert(nk == n, "synthetic props always carry k")
      assert(mn <= avg && avg <= mx)
    }
  }

  test("e5b sketch-only row: estimates equal e5's sketch and satisfy its " +
       "5%-of-exact error contract") {
    val sketch = EventOps.approxDistinctUsersSketchOnly(spark, sf0001)
      .as[(String, Long)].collect().toMap
    assert(sketch.nonEmpty)
    // same sketch as the e5 verifier row computes: the hash-checked e5
    // oracle (exact count + bound flag) therefore covers these values
    val exact = Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(sketch.keySet == exact.keySet)
    for ((t, est) <- sketch)
      assert(math.abs(est - exact(t)) <= math.max(exact(t) * 0.05, 1.0),
        s"$t: estimate $est vs exact ${exact(t)} outside the e5 bound")
    // and the e5 row itself agrees that the bound holds
    val e5 = EventOps.approxDistinctUsers(spark, sf0001)
      .as[(String, Long, Boolean)].collect()
    assert(e5.forall(_._3), s"e5 approx_ok must be uniformly true: ${e5.toSeq}")
  }

  test("retention cohorts partition the user base with bounded return counts") {
    val got = EventOps.retentionCohorts(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, size, d1, d7) =>
      assert(d1 <= size && d7 <= size, "returners are a subset of the cohort")
    }
    val users = Tables.events(spark, sf0001).select("user_id").distinct().count()
    assert(got.map(_._2).sum == users, "every user belongs to exactly one cohort")
  }

  test("sliding windows: every event lands in exactly len/slide windows") {
    val total = Tables.events(spark, sf0001).count()
    val windowed = EventStream.qSlidingCounts(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].collect()(0)
    assert(windowed == 4 * total, "2h length / 30min slide -> 4 windows per event")
  }

  test("funnel steps are monotonically shrinking and ordered") {
    val steps = EventOps.funnel(spark, sf0001)
      .as[(String, Long)].collect().toMap
    assert(steps.keySet == Set("view", "view>click", "view>click>purchase"))
    assert(steps("view") >= steps("view>click"))
    assert(steps("view>click") >= steps("view>click>purchase"))
    assert(steps("view") > 0)
  }

  test("moving average matches a trailing-7 recompute of the daily counts") {
    val daily = EventStream.dailyCountsBatch(spark, sf0001)
      .select("date", "event_type", "n")
      .as[(String, String, Long)].collect()
    val expected = daily.groupBy(_._2).toSeq.flatMap { case (et, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.zipWithIndex.map { case ((date, _, _), i) =>
        val window = sorted.slice(math.max(0, i - 6), i + 1).map(_._3)
        (date, et) -> math.rint(window.sum.toDouble / window.size * 1e6) / 1e6
      }
    }.toMap
    val got = EventStream.qMovingAvgDaily(spark, sf0001)
      .as[(String, String, Long, Double)].collect()
    assert(got.length == daily.length)
    got.foreach { case (date, et, _, ma7) =>
      assert(math.abs(ma7 - expected((date, et))) < 1e-9, s"($date, $et)")
    }
  }

  test("ewma matches the driver-side recurrence on the daily counts") {
    val daily = EventStream.dailyCountsBatch(spark, sf0001)
      .select("date", "event_type", "n")
      .as[(String, String, Long)].collect()
    val expected = daily.groupBy(_._2).toSeq.flatMap { case (et, rows) =>
      val sorted = rows.sortBy(_._1)
      var s = 0.0
      sorted.zipWithIndex.map { case ((date, _, n), i) =>
        s = if (i == 0) n.toDouble else 0.5 * n + 0.5 * s
        (date, et) -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    val got = EventStream.qEwmaDaily(spark, sf0001)
      .as[(String, String, Long, Double)].collect()
    assert(got.length == daily.length)
    got.foreach { case (date, et, _, ewma) =>
      assert(math.abs(ewma - expected((date, et))) < 1e-9, s"($date, $et)")
    }
  }

  test("dense daily series spans the full event range with zero-filled gaps") {
    val df = EventStream.qDenseDailySeries(spark, sf0001)
    val rows = df.as[(String, Long, Double)].collect().sortBy(_._1)
    // spine covers every day between global min and max, consecutively
    val days = rows.map(_._1)
    assert(days.length == days.distinct.length)
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(days.head, fmt),
      java.time.LocalDate.parse(days.last, fmt)) + 1
    assert(days.length.toLong == span, "spine must be gap-free")
    // the filtered series is sparse at sf0.001: zero-fill rows must exist
    assert(rows.exists(r => r._2 == 0L && r._3 == 0.0))
    assert(rows.exists(_._2 > 0L))
    // the aggregate side joins via broadcast, not a shuffled sort-merge
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("LOCF fill carries the last observation forward per series") {
    val rows = EventStream.qLocfFill(spark, sf0001)
      .as[(String, String, Option[Double], Double)].collect()
    assert(rows.nonEmpty && rows.exists(_._3.isEmpty) && rows.exists(_._3.nonEmpty))
    rows.groupBy(_._1).values.foreach { series =>
      var carry = 0.0
      series.sortBy(_._2).foreach { case (et, date, raw, filled) =>
        carry = raw.getOrElse(carry)
        assert(filled == carry, s"($et, $date): filled=$filled expected=$carry")
      }
    }
  }

  test("power-user pareto: deciles partition users, shares sum to 1, " +
       "activity and cumulative share are monotone") {
    import spark.implicits._
    val out = graft.operators.EventOps.powerUserPareto(spark, sf0001)
      .select("decile", "n_users", "n_events", "event_share", "cum_event_share")
      .as[(Int, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == (1 to 10))
    val ev = Tables.events(spark, sf0001)
    assert(out.map(_._2).sum == ev.select("user_id").distinct().count())
    assert(out.map(_._3).sum == ev.count())
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-4)
    // decile 1 = the most active users; per-user activity is non-increasing
    val perUserAvg = out.map(d => d._3.toDouble / d._2)
    assert(perUserAvg.zip(perUserAvg.tail).forall { case (a, b) => a >= b - 1e-9 })
    assert(out.map(_._5).zip(out.tail.map(_._5)).forall { case (a, b) => b >= a })
    assert(math.abs(out.last._5 - 1.0) < 1e-6)
  }
}
