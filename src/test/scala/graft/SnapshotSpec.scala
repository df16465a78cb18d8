package graft

import graft.operators.Snapshots
import org.apache.spark.sql.functions._

/** Snapshot diff/manifest: planted-diff classification, identity,
  * order/partitioning invariance of the fingerprints, single-character
  * sensitivity, the documented XOR blind spot, and shard mergeability
  * (the property that makes the manifest a 100 TB combine).
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("corpusDiff classifies added/removed/changed/unchanged with char sums") {
    val v1 = docs((1L, "alpha", "s"), (2L, "bravo", "s"), (3L, "charlie", "s"))
    val v2 = docs((2L, "bravo", "s"), (3L, "charlie2", "s"), (4L, "dd", "s"))
    val got = Snapshots.corpusDiff(v1, v2)
      .collect().map(r => (r.getString(1),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("removed") == ((1L, 5L, 0L)))       // alpha only in v1
    assert(got("unchanged") == ((1L, 5L, 5L)))     // bravo
    assert(got("changed") == ((1L, 7L, 8L)))       // charlie -> charlie2
    assert(got("added") == ((1L, 0L, 2L)))         // dd only in v2
  }

  test("corpusDiff of identical snapshots is all-unchanged; source is v2's") {
    val v1 = docs((1L, "x", "old"), (2L, "y", "old"))
    val v2 = docs((1L, "x", "new"), (2L, "y", "old"))
    val rows = Snapshots.corpusDiff(v1, v2).collect()
    assert(rows.forall(_.getString(1) == "unchanged"))
    // doc 1 moved source: reported under the v2 source
    assert(rows.map(r => r.getString(0) -> r.getLong(2)).toMap ==
      Map("new" -> 1L, "old" -> 1L))
  }

  test("manifest is invariant to row order and partitioning") {
    val base = docs((1L, "aa", "s"), (2L, "bb", "s"), (3L, "cc", "t"))
    val a = Snapshots.corpusManifest(base).collect().sortBy(_.getString(0))
    val b = Snapshots.corpusManifest(
        base.orderBy(desc("doc_id")).repartition(7))
      .collect().sortBy(_.getString(0))
    assert(a.toSeq == b.toSeq)
  }

  test("manifest: one changed character moves both fingerprints; " +
    "an even multiset of new identical docs is invisible to XOR only") {
    val base = docs((1L, "aa", "s"), (2L, "bb", "s"))
    def fp(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = Snapshots.corpusManifest(df).collect().head
      (r.getAs[Long]("sum_fp"), r.getAs[Long]("xor_fp"))
    }
    val (s0, x0) = fp(base)
    val (s1, x1) = fp(docs((1L, "ab", "s"), (2L, "bb", "s")))
    assert(s1 != s0 && x1 != x0, "single-char edit must move both")
    val twins = base.union(docs((3L, "zz", "s"), (4L, "zz", "s")))
    val (s2, x2) = fp(twins)
    assert(x2 == x0, "XOR cancels an even count of identical texts")
    assert(s2 != s0, "the modular sum does not — why both are published")
  }

  test("manifest merges across shards: combine(halves) == whole") {
    val all = Tables.documents(spark, sf0001)
    val whole = Snapshots.corpusManifest(all)
      .collect().map(r => r.getString(0) -> r).toMap
    val lo = Snapshots.corpusManifest(all.where($"doc_id" % 2 === 0))
    val hi = Snapshots.corpusManifest(all.where($"doc_id" % 2 =!= 0))
    val two63 = BigInt("9223372036854775808")
    val merged = lo.unionByName(hi)
      .groupBy("source")
      .agg(sum("n_docs").as("n_docs"), sum("n_chars").as("n_chars"),
        min("min_doc_id").as("min_doc_id"), max("max_doc_id").as("max_doc_id"),
        pmod(sum(col("sum_fp").cast("decimal(38,0)")),
          lit(new java.math.BigDecimal(two63.bigInteger)))
          .cast("long").as("sum_fp"),
        expr("bit_xor(xor_fp)").as("xor_fp"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(merged.keySet == whole.keySet)
    for ((src, m) <- merged; w = whole(src)) {
      assert(m.getAs[Long]("n_docs") == w.getAs[Long]("n_docs"), src)
      assert(m.getAs[Long]("n_chars") == w.getAs[Long]("n_chars"), src)
      assert(m.getAs[Long]("min_doc_id") == w.getAs[Long]("min_doc_id"), src)
      assert(m.getAs[Long]("max_doc_id") == w.getAs[Long]("max_doc_id"), src)
      assert(m.getAs[Long]("sum_fp") == w.getAs[Long]("sum_fp"), src)
      assert(m.getAs[Long]("xor_fp") == w.getAs[Long]("xor_fp"), src)
    }
    // n_distinct_texts is deliberately NOT claimed mergeable by addition
    // (a text present in both shards would double-count); a distributed
    // combine re-aggregates distinct digests, which is what corpusManifest
    // itself does over any union of shards.
  }

  test("diff over bucketed snapshots joins exchange-free: the only shuffle " +
       "is the final (source, status) aggregate") {
    def reset(table: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val loc = new java.io.File(s"spark-warehouse/$table")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    reset("snap_v1_test"); reset("snap_v2_test")
    val all = Tables.documents(spark, sf0001).select("doc_id", "source", "text")
    graft.sources.Ingest.writeBucketed(Snapshots.snapV1(all), "snap_v1_test",
      key = "doc_id", buckets = 4)
    graft.sources.Ingest.writeBucketed(Snapshots.snapV2(all), "snap_v2_test",
      key = "doc_id", buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Snapshots.corpusDiff(
        spark.table("snap_v1_test"), spark.table("snap_v2_test"))
      df.collect()
      val nodes = flattenPlan(df.queryExecution.executedPlan)
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("SortMergeJoin") && planStr.contains("FullOuter"),
        s"expected a full-outer sort-merge join, plan:\n$planStr")
      val shuffles = nodes.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.size == 1,
        s"bucketed diff must shuffle only for the final aggregate, " +
        s"found ${shuffles.size} exchanges:\n$planStr")
      // and that one shuffle is the post-join aggregate, not a join input
      assert(shuffles.head.child.output.exists(_.name == "status"))
      // same diff result as the unbucketed path
      val want = Snapshots.corpusDiff(Snapshots.snapV1(all), Snapshots.snapV2(all))
        .collect().map(_.toSeq).toSet
      assert(df.collect().map(_.toSeq).toSet == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("diff shuffles digests, not text: the joined plan carries no text column") {
    val all = Tables.documents(spark, sf0001)
    val df = Snapshots.corpusDiff(Snapshots.snapV1(all), Snapshots.snapV2(all))
    df.collect()
    val shuffles = flattenPlan(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.nonEmpty)
    assert(!shuffles.exists(_.child.output.exists(_.name == "text")),
      "no exchange may carry the document body")
  }
}
