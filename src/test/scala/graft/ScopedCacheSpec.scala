package graft

import graft.operators.{Caches, Duplicates, Pipeline}
import org.apache.spark.sql.functions._

/** [[graft.operators.Caches]] — deterministic release of the engine's
  * shared cached subtrees. The cache-and-leave default is right for
  * interactive sessions (the CacheManager substitutes the shared frames
  * into every later consumer), but a long-lived service running many
  * corpora through the pipeline must not accumulate entries forever;
  * `withScope` bounds the lifetime to the batch job.
  */
class ScopedCacheSpec extends SparkSpec {
  import spark.implicits._

  private def docs6 = Seq(
    (0L, "machine learning models improve with quality training data and careful evaluation"),
    (1L, "the weather today is sunny with a gentle breeze from the north"),
    (2L, "machine learning models improve with quality training data and careful evaluation"),
    (3L, "database systems optimize queries through cost based planning and indexing"),
    (4L, "gardens need regular watering sunshine and occasional pruning to thrive"),
    (5L, "neural networks learn representations from large datasets during training epochs"))
    .toDF("doc_id", "text")

  test("processAndWrite leaves the SQL cache empty (scope releases shared frames)") {
    spark.catalog.clearCache()
    val out = java.nio.file.Files.createTempDirectory("scoped-pipe").toString + "/results"
    Pipeline.processAndWrite(docs6, out)
    // non-blocking unpersist drains async; spin briefly before asserting
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
           System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"cached RDDs leaked: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
    // the write itself happened and carried real rows
    val back = spark.read.parquet(out)
    assert(back.count() > 0 && back.columns.contains("relevance_score"))
  }

  test("outside a scope, shared() keeps the cache-and-leave default") {
    spark.catalog.clearCache()
    val pairs = Duplicates.pairSimilarities(docs6)
    pairs.count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "shared frames must stay resident for follow-up consumers outside a scope")
    spark.catalog.clearCache()
  }

  test("nested scopes release at the registering scope; results unaffected") {
    spark.catalog.clearCache()
    // another suite's async (non-blocking) unpersist may still be draining;
    // assert against a settled BASELINE instead of expecting global empty
    def persisted: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def awaitSettled(target: Set[Int] => Boolean): Boolean = {
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!target(persisted) && System.nanoTime() < deadline) Thread.sleep(50)
      target(persisted)
    }
    // wait for the previous test's drain: a still-registered identical
    // cache entry would be REUSED (no new RDD ids) and break the
    // inside-scope liveness check below
    awaitSettled(_.isEmpty)
    val baseline = persisted
    val inner = Caches.withScope {
      val n = Duplicates.pairSimilarities(docs6).count()
      assert((persisted -- baseline).nonEmpty, "frames live inside the scope")
      n
    }
    assert(awaitSettled(p => (p -- baseline).isEmpty),
      s"scope-registered frames survived exit: ${persisted -- baseline}")
    // identical result when recomputed cold
    assert(Duplicates.pairSimilarities(docs6).count() == inner)
    spark.catalog.clearCache()
  }
}
