package graft

import graft.operators.Duplicates

/** The session-scoped kernel/edge memos key on canonicalized plan + file
  * paths + a (name, length, mtime) fingerprint of the underlying files.
  * The fingerprint is the in-place-rewrite detector: a parquet directory
  * overwritten at the same path (compaction, an external refresh) must MISS
  * the memo — a long-lived service serving last week's duplicate graph for
  * a refreshed corpus is the failure mode. Spark's own CacheManager entries
  * are cleared via the documented `clearCache`/`refreshByPath` route; these
  * specs pin down that the JVM-level memos refresh on their own.
  */
class MemoStalenessSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(path: String, texts: Seq[String]): Unit =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .repartition(1)
      .write.mode("overwrite").parquet(path)

  test("in-place parquet rewrite refreshes the kernel and edge memos") {
    val dir = java.nio.file.Files.createTempDirectory("memo-stale").toString
    val path = s"$dir/docs.parquet"
    // corpus 1: doc 2 duplicates doc 0 -> component {0, 2}
    writeDocs(path, Seq(
      "alpha beta gamma delta",
      "epsilon zeta eta theta",
      "alpha beta gamma delta"))
    val c1 = Duplicates.components(spark.read.parquet(path))
      .as[(Long, Long)].collect().toMap
    assert(c1 == Map(0L -> 0L, 1L -> 1L, 2L -> 0L))
    // rewrite the SAME path: doc 2 now duplicates doc 1 instead. Clear the
    // SQL cache (the standard Spark procedure after an external rewrite);
    // the JVM memos see the new file fingerprint and recompute.
    writeDocs(path, Seq(
      "alpha beta gamma delta",
      "epsilon zeta eta theta",
      "epsilon zeta eta theta"))
    spark.catalog.clearCache()
    val c2 = Duplicates.components(spark.read.parquet(path))
      .as[(Long, Long)].collect().toMap
    assert(c2 == Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
  }

  test("in-place parquet rewrite refreshes the BPE merge-table memo") {
    val dir = java.nio.file.Files.createTempDirectory("memo-bpe").toString
    val path = s"$dir/docs.parquet"
    writeDocs(path, Seq("aaa aaa aaa aaa", "aaa aab"))
    val m1 = graft.operators.Bpe.learnMerges(spark.read.parquet(path), 1)
      .select("merge_left", "merge_right").as[(String, String)].collect().toSeq
    assert(m1 == Seq(("a", "a"))) // "aa" dominates
    // same path, new corpus where (b, </w>) is the most frequent pair
    writeDocs(path, Seq("aab ccb ddb eeb ffb", "aab ccb ddb eeb ffb"))
    spark.catalog.clearCache()
    val m2 = graft.operators.Bpe.learnMerges(spark.read.parquet(path), 1)
      .select("merge_left", "merge_right").as[(String, String)].collect().toSeq
    assert(m2 == Seq(("b", graft.operators.Bpe.Eow)))
    // unchanged files hit the memo and return the same table
    val m3 = graft.operators.Bpe.learnMerges(spark.read.parquet(path), 1)
      .select("merge_left", "merge_right").as[(String, String)].collect().toSeq
    assert(m3 == m2)
  }

  test("unchanged files still hit the memo (fingerprint is stable)") {
    val dir = java.nio.file.Files.createTempDirectory("memo-stable").toString
    val path = s"$dir/docs.parquet"
    writeDocs(path, Seq("alpha beta gamma delta", "alpha beta gamma delta"))
    val first = Duplicates.components(spark.read.parquet(path))
      .as[(Long, Long)].collect().toMap
    val again = Duplicates.components(spark.read.parquet(path))
      .as[(Long, Long)].collect().toMap
    assert(first == Map(0L -> 0L, 1L -> 0L) && again == first)
  }
}
