package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-factor priority classification (SURVEY.md §2.9 N24–N29), following
  * `pipeline/priority_classifier.py`: length step-score (`:77-101`), keyword
  * score with critical→1.0 / high→0.7 substring matching (`:103-140`),
  * weighted combination .4 relevance / .2 length / .3 keyword / .1 recency
  * with recency defaulting to 0.5 (`:142-176`), and threshold mapping
  * .85/.65/.45/.25 → CRITICAL/HIGH/MEDIUM/LOW/NONE (`:178-198`).
  *
  * Everything is column arithmetic over one relevance join — a single
  * pass, no UDFs. Reasons (N28) are assembled as an array of conditional
  * strings like the reference's human-readable explanation list.
  */
object Priority {

  /** Critical / high keyword lists for the corpus query entries (the
    * reference's defaults are empty; its test config uses domain words).
    */
  val CriticalKeywords: Seq[String] = Seq("stream")
  val HighKeywords: Seq[String] = Seq("join", "sort")

  /** `precomputedRelevance`: pass an existing [[Relevance.relevanceScores]]
    * frame to share its token-scan subtree instead of rebuilding it — the
    * pipeline (N32) scores relevance once for the whole corpus and feeds it
    * to both the ranking and this classifier, like the reference
    * (`pipeline/pipeline.py:276-291`).
    */
  def classify(docs: DataFrame,
               relevanceKeywords: Seq[String] = Relevance.Keywords,
               critical: Seq[String] = CriticalKeywords,
               high: Seq[String] = HighKeywords,
               precomputedRelevance: Option[DataFrame] = None): DataFrame = {
    val rel = precomputedRelevance
      .getOrElse(Relevance.relevanceScores(docs, relevanceKeywords))
      .select(col("doc_id"), col("combined").as("relevance_score"))
    val combined = round(
      col("relevance_score") * 0.4 + col("length_score") * 0.2 +
        col("keyword_score") * 0.3 + lit(0.5) * 0.1, 6)
    val reasons = array_compact(array(
      when(col("keyword_score") >= 1.0, lit("critical keyword match")),
      when(col("keyword_score") === 0.7, lit("high-priority keyword match")),
      when(col("relevance_score") >= 0.7, lit("high relevance")),
      when(col("length_score") >= 0.8, lit("comprehensive content"))))
    // text-derived scores project BEFORE the join: only (doc_id, two
    // doubles) reach the doc_id shuffle, never the text column itself.
    // Shared-cached (r14): n8 emits this frame whole, n9 aggregates it,
    // and the pipeline joins it — one classification pass per corpus.
    Caches.shared(docs
      .select(col("doc_id"),
        TextFns.lengthScore(col("text")).as("length_score"),
        TextFns.keywordScore(col("text"), critical, high).as("keyword_score"))
      .join(rel, "doc_id")
      .withColumn("priority_score", combined)
      .withColumn("priority_level", TextFns.priorityLevel(col("priority_score")))
      .withColumn("reasons", reasons)
      .select("doc_id", "relevance_score", "length_score", "keyword_score",
              "priority_score", "priority_level", "reasons"))
  }

  /** N29: priority-level distribution histogram. */
  def distribution(docs: DataFrame): DataFrame =
    classify(docs).groupBy("priority_level").agg(count(lit(1)).as("n"))

  // --- query entries ---

  def qClassify(spark: SparkSession, sfDir: String): DataFrame =
    classify(Tables.documents(spark, sfDir))
      .withColumn("reasons", concat_ws("|", col("reasons")))

  def qDistribution(spark: SparkSession, sfDir: String): DataFrame =
    distribution(Tables.documents(spark, sfDir))
}
