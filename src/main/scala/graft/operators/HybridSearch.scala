package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + semantic retrieval with Reciprocal Rank Fusion
  * (Cormack, Clarke & Buettcher 2009, "Reciprocal Rank Fusion outperforms
  * Condorcet and individual rank learning methods"). The reference serves
  * keyword relevance (`sql_search.py:342-392`) and TF-IDF semantic search
  * (`sql_search.py:394-514`) as separate commands; a production retrieval
  * stack runs both and fuses: RRF(d) = Σ_arms 1/(k + rank_arm(d)), which
  * rewards documents surfaced by several retrievers without needing the
  * arms' scores to be calibrated against each other.
  *
  * Scale shape: each arm is already its own top-`poolK` pipeline (BM25 =
  * filtered postings + broadcast scalars + TakeOrderedAndProject; cosine =
  * broadcast query vector over the term inverted index), so the fusion
  * join touches 2·poolK rows — driver-trivial no matter the corpus size.
  * Ranks are computed on 6-dp-rounded scores with doc_id tie-breaks, so
  * they are deterministic across engines, partitionings, and runs.
  */
object HybridSearch {

  /** Standard RRF dampening constant (k=60 in the original paper). */
  val RrfK = 60

  val PoolK = 100
  val TopK = 20

  def hybridSearch(spark: SparkSession, docs: DataFrame,
                   query: String = SemanticSearch.DefaultQuery,
                   poolK: Int = PoolK, topK: Int = TopK, rrfK: Int = RrfK,
                   threshold: Double = SemanticSearch.Threshold): DataFrame = {
    val qTerms = SemanticSearch.tokenize(query).distinct
    // each arm retrieves its own top-poolK pool; zero-score docs are "not
    // retrieved" (bm25Rank pads the corpus with 0-scored rows — cut them)
    val lexW = Window.orderBy(desc("bm25"), asc("doc_id"))
    val lex = Relevance.bm25Rank(docs, qTerms, topK = poolK)
      .where(col("bm25") > 0)
      .select(col("doc_id"), row_number().over(lexW).cast("long").as("lex_rank"))
    val semW = Window.orderBy(desc("similarity"), asc("doc_id"))
    val sem = SemanticSearch.search(spark, docs, query, threshold, poolK)
      .select(col("doc_id"), row_number().over(semW).cast("long").as("sem_rank"))
    // the unpartitioned windows rank <= poolK rows each (post
    // TakeOrderedAndProject) — the single-partition exchange is 100 rows
    fuse(lex, sem, rrfK, topK)
  }

  /** RRF fusion of two ranked pools `(doc_id, lex_rank)` / `(doc_id,
    * sem_rank)` — shared with the served probe ([[ServedSearch]]) so both
    * paths fuse identically.
    */
  private[operators] def fuse(lex: DataFrame, sem: DataFrame,
                              rrfK: Int, topK: Int): DataFrame =
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rank")), lit(0.0)), 6)
          .as("rrf_score"))
      .orderBy(desc("rrf_score"), asc("doc_id"))
      .limit(topK)

  // --- query entry ---

  def qHybridSearch(spark: SparkSession, sfDir: String): DataFrame =
    hybridSearch(spark, Tables.documents(spark, sfDir))
}
