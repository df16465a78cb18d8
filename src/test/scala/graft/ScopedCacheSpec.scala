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

  /** Establish a clean persistent-RDD baseline: the session is shared
    * across suites, so earlier suites' scope-LESS operator calls (the
    * documented cache-and-leave default) may have left entries behind.
    * Explicit blocking unpersist is synchronous and deterministic — this is
    * baseline setup, not a GC wait.
    */
  private def resetPersisted(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("processAndWrite leaves the SQL cache empty (scope releases shared frames)") {
    resetPersisted()
    val out = java.nio.file.Files.createTempDirectory("scoped-pipe").toString + "/results"
    Pipeline.processAndWrite(docs6, out)
    // no GC spin: scope exit releases caches synchronously (CacheManager
    // removal) and checkpoint RDDs with blocking unpersist — the map must
    // already be empty here
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
    resetPersisted()
    def persisted: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val inner = Caches.withScope {
      val n = Duplicates.pairSimilarities(docs6).count()
      assert(persisted.nonEmpty, "frames live inside the scope")
      n
    }
    // cache removal is synchronous on unpersist (blocking only affects
    // executor block cleanup) — no drain wait needed
    assert(persisted.isEmpty, s"scope-registered frames survived exit: $persisted")
    // identical result when recomputed cold
    assert(Duplicates.pairSimilarities(docs6).count() == inner)
    spark.catalog.clearCache()
  }
}
