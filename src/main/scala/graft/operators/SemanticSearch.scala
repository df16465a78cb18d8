package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF semantic search (SURVEY.md §2.9 N30–N31).
  *
  * The reference vectorizes ≤10k sampled messages with sklearn
  * `TfidfVectorizer(max_features=5000)` (`sql_search.py:1194-1246`), embeds
  * the query string in the same corpus space, and ranks by cosine with a
  * similarity threshold (default 0.3) and limit (default 20)
  * (`sql_search.py:394-514`).
  *
  * Spark-first shape: the "vector store" is the long-form TF-IDF DataFrame
  * (doc_id, token, weight) restricted to the top-`vocabSize` corpus terms —
  * an inverted index. Scoring a query is a broadcast join of the tiny query
  * vector against that index: one shuffle-free map-side join + one
  * aggregation by doc, so at 100 TB the cost is a scan of only the postings
  * of the query's terms, never a dense N×5000 matrix.
  */
object SemanticSearch {

  val DefaultQuery = "spark streaming window join query performance"
  val VocabSize = 5000
  val Threshold = 0.3
  val Limit = 20

  /** Driver-side tokenizer identical to [[TextFns.tokens]] (the query string
    * is a constant — no reason to run it through the cluster).
    */
  def tokenize(text: String): Seq[String] =
    TextFns.WordPattern.r.findAllIn(text.toLowerCase).toSeq
      .filterNot(TextFns.Stopwords.contains)

  /** Max-normalized query term frequencies, like the corpus TF. */
  def queryTf(query: String): Seq[(String, Double)] = {
    val counts = tokenize(query).groupBy(identity).view.mapValues(_.size).toSeq
    if (counts.isEmpty) Seq.empty
    else {
      val mx = counts.map(_._2).max.toDouble
      counts.map { case (t, c) => t -> c / mx }.sortBy(_._1)
    }
  }

  /** Top-`vocabSize` corpus terms by document frequency (ties broken on the
    * token) — the `max_features` cut of the reference's vectorizer.
    */
  def vocabulary(docs: DataFrame, vocabSize: Int = VocabSize): DataFrame =
    Relevance.idf(docs)
      .orderBy(desc("df"), asc("token")).limit(vocabSize)
      .select("token", "idf")

  /** N31: rank documents by cosine similarity to `query` in the corpus
    * TF-IDF space. Returns hydrated doc rows with the similarity attached.
    */
  def search(spark: SparkSession, docs: DataFrame, query: String = DefaultQuery,
             threshold: Double = Threshold, limit: Int = Limit): DataFrame = {
    import spark.implicits._
    // one tokenize pass: IDF, TF, norms and dots all derive from this
    // cached frame (CacheManager dedupes it against relevanceScores' cache
    // of the canonically-equal plan, so the pipeline shares it too)
    val counts = Caches.shared(Relevance.termCounts(docs))
    // vocab is ≤5000 rows but sits behind a window aggregate, so Catalyst
    // has no size estimate and would pick a sort-merge join — hint it.
    val idf = Relevance.idfFromCounts(counts, docs)
    // top-vocabSize cut via TakeOrderedAndProject (parallel partial top-k
    // per partition), not a single-partition row_number window
    val vocab = broadcast(
      idf.orderBy(desc("df"), asc("token")).limit(VocabSize).select("token", "idf"))
    val docVec = Relevance.tfMaxFromCounts(counts).join(vocab, "token")
      .select(col("doc_id"), col("token"), (col("tf") * col("idf")).as("w"))

    val qTf = queryTf(query).toDF("token", "qtf")
    // query vector in corpus space: terms outside the vocabulary drop out,
    // like sklearn's transform() on unseen terms.
    val qVec = broadcast(qTf.join(vocab, "token")
      .select(col("token"), (col("qtf") * col("idf")).as("qw")))
    val qNorm = qVec.agg(sqrt(sum(col("qw") * col("qw"))).as("qnrm"))

    // norm and dot in ONE pass over the doc vectors: a broadcast left join
    // tags each posting with its query weight (0 when the query lacks the
    // term), so a single doc_id aggregation yields both Σw² and Σw·qw —
    // the vector frame is scanned once, not once per branch, and the
    // norms⋈dots recombination join disappears.
    val dotsAndNorms = docVec.join(qVec, Seq("token"), "left_outer")
      .groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"),
        sum(col("w") * coalesce(col("qw"), lit(0.0))).as("dot"))
    // zero-norm docs/queries (all-zero tf-idf — every term idf 0) can't
    // match anything; drop them before the division like the reference's
    // zero-guard in its cosine (`sql_search.py:2233-2235`).
    // dot > 0 preserves the inner-join contract: documents sharing no
    // (weighted) term with the query never surface, even at threshold <= 0
    val sims = dotsAndNorms.crossJoin(broadcast(qNorm))
      .where(col("nrm") > 0 && col("qnrm") > 0 && col("dot") > 0)
      .select(col("doc_id"),
        round(col("dot") / (col("nrm") * col("qnrm")), 6).as("similarity"))
      .where(col("similarity") >= threshold)

    docs.join(sims, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("similarity"))
      .orderBy(desc("similarity"), asc("doc_id"))
      .limit(limit)
  }

  // --- query entry ---

  def qSemanticSearch(spark: SparkSession, sfDir: String): DataFrame =
    search(spark, Tables.documents(spark, sfDir))
}
