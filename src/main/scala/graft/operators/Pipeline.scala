package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end content-analysis orchestration (SURVEY.md §2.9 N32 /
  * §3.3), mirroring `pipeline/pipeline.py:248-323`: fetch → relevance on
  * the FULL corpus → duplicate detection → unique-document filter →
  * summaries and priorities computed only for unique documents → compiled
  * results + statistics, sunk to a results table.
  *
  * The dependency structure of the reference is preserved (relevance over
  * all docs, downstream stages over unique docs only,
  * `pipeline.py:276-294`), but it is one lazily-composed DAG: the token
  * scan is shared by relevance and dedup, and the final join assembles all
  * scores in a single pass.
  */
object Pipeline {

  /** Per-document analysis results for the unique (post-dedup) corpus. */
  def process(docs: DataFrame,
              keywords: Seq[String] = Relevance.Keywords,
              dupThreshold: Double = 0.8,
              summarySentences: Int = 3): DataFrame = {
    // the graded columns ride the shared frame (p1/p1b/p2 all read it);
    // only the TextRank summary — the one column p1b/p2 never touch — is
    // computed here and re-attached by doc_id. The summary row set is the
    // graded frame's own doc_id spine (= docs⋈unique, by construction)
    // joined back to docs for the full text, so the unique-document
    // selection is never recomputed. Joins are all inner 1:1 on doc_id, so
    // the row set and every column value equal the single-DAG form exactly
    // (column order restored by the final select).
    val graded = gradedResults(docs, keywords, dupThreshold)
    val summaries = docs
      .join(graded.select("doc_id"), "doc_id")
      .select(col("doc_id"),
        Summarizer.summarizeUdf(col("text"), lit(summarySentences)).as("summary"))
    graded
      .join(summaries, "doc_id")
      .select(col("doc_id"), col("text"), col("relevance_score"),
        col("summary"), col("priority_score"), col("priority_level"))
  }

  /** The summary-free pipeline result — every `process` column except the
    * TextRank summary. Shared-cached (r15): p1 joins the summary onto it,
    * p1b emits it as-is, p2 aggregates it — one relevance+dedup+priority
    * assembly per corpus instead of three (the x45 family-table pattern:
    * a frame consumed by several registered rows is built by its first
    * consumer and substituted by CacheManager for the rest).
    */
  private[graft] def gradedResults(docs: DataFrame,
                                   keywords: Seq[String] = Relevance.Keywords,
                                   dupThreshold: Double = 0.8): DataFrame = {
    val rel = Caches.shared(Relevance.relevanceScores(docs, keywords))
    val unique = Duplicates.uniqueDocuments(docs, dupThreshold)
    Caches.shared(docs.join(unique, "doc_id")
      .join(rel, "doc_id")
      .select(
        col("doc_id"),
        substring(col("text"), 1, 500).as("text"),
        col("combined").as("relevance_score"))
      .join(Priority.classify(docs, keywords, precomputedRelevance = Some(rel))
              .select(col("doc_id"), col("priority_score"), col("priority_level")),
            "doc_id"))
  }

  /** Corpus-level statistics of a pipeline run
    * (`pipeline/pipeline.py:325-354`).
    */
  def statistics(results: DataFrame): DataFrame =
    results.agg(
      count(lit(1)).as("n_documents"),
      round(avg("relevance_score"), 6).as("avg_relevance"),
      round(min("relevance_score"), 6).as("min_relevance"),
      round(max("relevance_score"), 6).as("max_relevance"))

  /** The batch-job form of the pipeline: process → sink, with every
    * shared cached subtree built along the way ([[Caches.shared]] sites —
    * the tokenized term counts, the Duplicates TF/pair frames, the
    * relevance frame) released deterministically once the write completes.
    * Long-lived sessions running many corpora through the pipeline stay
    * flat on cache memory; interactive callers keep using [[process]],
    * whose caches remain resident for follow-up queries by design.
    */
  def processAndWrite(docs: DataFrame, path: String,
                      keywords: Seq[String] = Relevance.Keywords,
                      dupThreshold: Double = 0.8,
                      summarySentences: Int = 3): Unit =
    Caches.withScope {
      writeResults(process(docs, keywords, dupThreshold, summarySentences), path)
    }

  /** Sink: the reference's `analysis_results` table as partitioned parquet
    * (`pipeline/pipeline.py:374-429` — message_id/relevance/summary/
    * priority columns).
    */
  def writeResults(results: DataFrame, path: String): Unit =
    results
      .withColumn("analyzed_at", lit("1970-01-01 00:00:00")) // deterministic for tests
      .write.mode("overwrite").parquet(path)

  // --- query entries (rows-only: summary column is TextRank output) ---

  def qPipeline(spark: SparkSession, sfDir: String): DataFrame =
    process(Tables.documents(spark, sfDir))

  def qPipelineStats(spark: SparkSession, sfDir: String): DataFrame =
    statistics(gradedResults(Tables.documents(spark, sfDir)))

  /** The graded pipeline form: every `p1` column except the TextRank
    * summary, so the flagship composition is hash-checked end-to-end and
    * only the fixpoint column stays rows-only. Reads [[gradedResults]]
    * directly (r15) — identical rows and column order to
    * `process(...).drop("summary")`, without the summary join the drop
    * would leave in the plan.
    */
  def qPipelineGraded(spark: SparkSession, sfDir: String): DataFrame =
    gradedResults(Tables.documents(spark, sfDir))

  /** p4: the daily-ingest admission capstone — what actually runs when a
    * new shard arrives at a curated 100 TB corpus. Per arriving (delta)
    * document, the gates in production order, each one already
    * oracle-checked on its own:
    *
    *   1. quality gate (x10 score ≥ threshold) — cheapest, runs first;
    *   2. near-dup vs the PERSISTED index (x66's one-sided band probe);
    *   3. exact dedup WITHIN the shard (x1's digest families, min-id keep).
    *
    * The verdict is the FIRST failing gate, so the report tells the
    * operator where each rejected document died — the accounting a
    * curation team reads after every ingest run. All three gates compose
    * over the same shard scan; nothing touches the index beyond x66's
    * band join.
    */
  def qIngestPipeline(spark: SparkSession, sfDir: String,
                      qualityThreshold: Double = 0.5): DataFrame =
    ingestAdmission(Tables.documents(spark, sfDir),
      qualityThreshold = qualityThreshold)

  def ingestAdmission(docs: DataFrame, deltaMod: Int = 5,
                      qualityThreshold: Double = 0.5): DataFrame = {
    val isDelta = pmod(col("doc_id"), lit(deltaMod.toLong)) === (deltaMod - 1)
    val delta = docs.where(isDelta)
    val quality = TextQuality.qualityScore(delta).select("doc_id", "quality")
    val inc = Dedup.incrementalDedup(docs, deltaMod)
      .select(col("doc_id"), col("n_index_matches"))
    val exact = delta
      .select(col("doc_id"), md5(col("text").cast("binary")).as("digest"))
    val keepers = exact.groupBy("digest").agg(min("doc_id").as("exact_keep_id"))
    // LEFT joins from the delta doc_id spine (probeIndex's contract): an
    // upstream operator that ever stops emitting exactly one row per delta
    // doc must surface that doc as `missing_signal`, never silently drop
    // it from the admission report — the report's row count IS the delta
    // count, by construction (spec-asserted).
    val verdict =
      when(col("quality").isNull || col("n_index_matches").isNull ||
             col("exact_keep_id").isNull, "missing_signal")
        .when(col("quality") < qualityThreshold, "low_quality")
        .when(col("n_index_matches") > 0, "index_duplicate")
        .when(col("doc_id") =!= col("exact_keep_id"), "delta_exact_duplicate")
        .otherwise("admitted")
    delta.select("doc_id")
      .join(quality, Seq("doc_id"), "left")
      .join(inc, Seq("doc_id"), "left")
      .join(exact.join(keepers, "digest").select("doc_id", "exact_keep_id"),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality"), col("n_index_matches"),
        col("exact_keep_id"), verdict.as("verdict"),
        (verdict === "admitted").as("admitted"))
  }
}
