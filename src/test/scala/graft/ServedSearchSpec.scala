package graft

import graft.operators.{HybridSearch, SearchIndex, ServedSearch}

/** The persisted search-serving rows (x41b/x44b): lossless persistence,
  * build-at-most-once memoization, and bucket partition pruning — the
  * x82b/x83b contract applied to the positional index.
  */
class ServedSearchSpec extends SparkSpec {

  test("served phrase/hybrid probes equal the inline builds; re-call " +
       "memo-hits with zero rebuilds; postings scan partition-prunes") {
    val first41 = ServedSearch.qPhraseProbeOnly(spark, sf0001).collect()
    val first44 = ServedSearch.qHybridProbeOnly(spark, sf0001).collect()
    assert(first41.nonEmpty && first44.nonEmpty)
    // second call must serve from the memoized artifact — zero rebuilds
    val builds = ServedSearch.indexBuilds.get()
    val second41 = ServedSearch.qPhraseProbeOnly(spark, sf0001).collect()
    val second44 = ServedSearch.qHybridProbeOnly(spark, sf0001).collect()
    assert(ServedSearch.indexBuilds.get() == builds,
      s"probe-only re-call rebuilt the index: $builds -> ${ServedSearch.indexBuilds.get()}")
    assert(second41.toSeq == first41.toSeq)
    assert(second44.toSeq == first44.toSeq)
    // lossless persistence: identical to the inline full-cycle queries
    assert(first41.toSeq == SearchIndex.qPhraseSearch(spark, sf0001).collect().toSeq)
    assert(first44.toSeq == HybridSearch.qHybridSearch(spark, sf0001).collect().toSeq)
    // the probe must PRUNE to its words' buckets: the foldable
    // pmod(xxhash64(lit)) filter has to reach PartitionFilters, or the
    // probe silently reads the whole index
    val plan = ServedSearch.qPhraseProbeOnly(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket[^\\]]*=".r.findFirstIn(plan).isDefined,
      s"no bucket partition filter on the postings scan:\n$plan")
  }
}
