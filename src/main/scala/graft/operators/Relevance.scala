package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF relevance scoring (SURVEY.md §2.9 N1–N10), fully relational — no
  * UDFs, every step a DataFrame the optimizer can see through.
  *
  * Semantics follow `pipeline/relevance_scorer.py`:
  *  - TF is max-normalized per document (`relevance_scorer.py:62-78`);
  *  - IDF = ln(N / (1 + df)) over the corpus (`relevance_scorer.py:80-101`),
  *    missing terms default to ln(N + 1) (`relevance_scorer.py:122`) — moot
  *    here because TF-IDF is only evaluated on terms present in the doc;
  *  - keyword density = matched keyword tokens / all tokens
  *    (`relevance_scorer.py:127-144`) — multiword keywords can never match
  *    a single token; this quirk is preserved;
  *  - coverage = fraction of the keyword list present in the token set
  *    (`relevance_scorer.py:146-160`);
  *  - tfidf keyword score = sum of strictly-positive keyword TF-IDFs over
  *    the keyword count (`relevance_scorer.py:162-181`; negative-IDF terms
  *    are dropped by the `s > 0` filter — preserved);
  *  - combined = 0.3·density + 0.4·coverage + 0.3·tfidf
  *    (`relevance_scorer.py:183-224`).
  *
  * Scale shape: tokens → (doc, term) counts is one shuffle with map-side
  * combine; the per-doc max/sum ride a window over the already-partitioned
  * aggregate; IDF is a tiny per-term table joined back on the term key.
  * Outputs are rounded to 6 decimals so cross-engine float noise (libm `ln`,
  * summation order) cannot flip the oracle.
  */
object Relevance {

  /** Default keyword list for the corpus-level query entries (single-token,
    * present in the synthetic vocabulary). The reference's default list is
    * caller-supplied; tests exercise multiword quirks separately.
    */
  val Keywords: Seq[String] = Seq("spark", "query", "join", "stream", "window")

  /** N1: long-form tokens `(doc_id, token)`, duplicates preserved. */
  def tokensDF(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))

  /** (doc_id, token, cnt) term counts — the base for TF and IDF. */
  def termCounts(docs: DataFrame): DataFrame =
    tokensDF(docs).groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))

  /** N2: max-normalized TF per (doc, term). */
  def tfMax(docs: DataFrame): DataFrame = tfMaxFromCounts(termCounts(docs))

  /** Shared-cached (r14): n1, the TF-IDF chain (n3 + relevanceScores),
    * and n12's vector-store projection all consume the identical window
    * aggregate — one cached build per corpus (guide §2.4).
    */
  private[operators] def tfMaxFromCounts(counts: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id")
    Caches.shared(
      counts.withColumn("tf", col("cnt").cast("double") / max("cnt").over(w)))
  }

  /** N4: corpus IDF per term, ln(N/(1+df)). N is carried via a broadcast
    * 1-row aggregate so the plan stays lazy (no driver-side count).
    */
  def idf(docs: DataFrame): DataFrame = idfFromCounts(termCounts(docs), docs)

  /** Shared-cached (r14): vocab-sized; consumed by n2, the TF-IDF chain,
    * n12's vocabulary cut, and x61's PRF expansion.
    */
  private[operators] def idfFromCounts(counts: DataFrame, docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).as("corpus_n"))
    Caches.shared(counts
      .groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("token"), col("df"),
        log(col("corpus_n").cast("double") / (col("df") + 1)).as("idf")))
  }

  /** N5: TF-IDF long form (doc_id, token, tfidf). */
  def tfidf(docs: DataFrame): DataFrame = tfidfFromCounts(termCounts(docs), docs)

  /** Shared-cached (r14): the long-form TF-IDF index is consumed whole by
    * n3 and filtered by relevanceScores' keyword arm — one cached build.
    */
  private def tfidfFromCounts(counts: DataFrame, docs: DataFrame): DataFrame =
    Caches.shared(tfMaxFromCounts(counts)
      .join(idfFromCounts(counts, docs).select("token", "idf"), "token")
      .select(col("doc_id"), col("token"), (col("tf") * col("idf")).as("tfidf")))

  /** N6–N9: per-document relevance scores for a keyword list. Documents
    * with no tokens (or no matches) score 0 across the board, like the
    * reference's empty-guard paths.
    *
    * One tokenize pass: every aggregate below derives from the cached
    * (doc, token, cnt) frame — token-instance counts come from `sum(cnt)`,
    * identical to counting the raw token rows.
    */
  def relevanceScores(docs: DataFrame, keywords: Seq[String] = Keywords): DataFrame = {
    val kw = keywords.map(_.toLowerCase)
    val kwArr = lit(kw.toArray)
    val counts = Caches.shared(termCounts(docs))
    val perDoc = counts.groupBy("doc_id").agg(
      sum("cnt").as("n_tokens"),
      sum(when(array_contains(kwArr, col("token")), col("cnt")).otherwise(0L)).as("kw_tokens"),
      countDistinct(when(array_contains(kwArr, col("token")), col("token"))).as("kw_matched"))
    val tfkw = tfidfFromCounts(counts, docs)
      .where(array_contains(kwArr, col("token")) && col("tfidf") > 0)
      .groupBy("doc_id").agg(sum(col("tfidf")).as("kw_tfidf_sum"))
    // shared-cached (r14): n4 emits it whole, n5 ranks it, n8/n9's
    // classifier joins it, and the pipeline (p1/p1b/p2) consumes it via
    // the same canonical plan — one cached build per corpus instead of a
    // relevance pass per consumer
    Caches.shared(docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left_outer")
      .join(tfkw, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        round(coalesce(col("kw_tokens") / col("n_tokens"), lit(0.0)), 6).as("density"),
        round(coalesce(col("kw_matched") / lit(kw.size.toDouble), lit(0.0)), 6).as("coverage"),
        round(coalesce(col("kw_tfidf_sum") / lit(kw.size.toDouble), lit(0.0)), 6).as("tfidf_score"),
        round(
          coalesce(col("kw_tokens") / col("n_tokens"), lit(0.0)) * 0.3 +
          coalesce(col("kw_matched") / lit(kw.size.toDouble), lit(0.0)) * 0.4 +
          coalesce(col("kw_tfidf_sum") / lit(kw.size.toDouble), lit(0.0)) * 0.3, 6)
          .as("combined")))
  }

  /** Per-document token length `(doc_id, dl)` over the shared counts
    * frame — shared-cached because every BM25 pass needs it and the plan
    * is identical across consumers (CacheManager dedupes to one entry).
    */
  private[operators] def docLenFromCounts(counts: DataFrame): DataFrame =
    Caches.shared(counts.groupBy("doc_id").agg(sum("cnt").as("dl")))

  /** The 1-row (n_docs, avgdl) BM25 scalar frame, shared-cached for the
    * same reason as [[docLenFromCounts]].
    */
  private[operators] def bm25StatsFrom(docs: DataFrame, counts: DataFrame): DataFrame =
    Caches.shared(docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(counts.agg(sum("cnt").as("tot_tokens")))
      .select(col("n_docs"),
        (col("tot_tokens").cast("double") / col("n_docs")).as("avgdl")))

  /** BM25 ranking (Okapi, with Lucene's non-negative idf form):
    * `Σ_t ln(1 + (N − df + 0.5)/(df + 0.5)) · cnt·(k1+1)/(cnt + k1·(1 − b + b·dl/avgdl))`
    * over the query terms, using raw term counts (BM25 does its own length
    * normalization — no TF max-norm), dl = token count of the document,
    * avgdl = total token count / N (zero-token documents count in N).
    * Zero-match documents score 0, like [[relevanceScores]].
    *
    * Scale shape: the keyword filter cuts the (doc, term) frame to ≤|q|
    * rows per doc before any join; df and the (N, avgdl) scalars are tiny
    * broadcast sides; one per-doc sum, then TakeOrderedAndProject.
    */
  def bm25Rank(docs: DataFrame, keywords: Seq[String] = Keywords,
               k1: Double = 1.2, b: Double = 0.75, topK: Int = 100): DataFrame = {
    val kw = keywords.map(_.toLowerCase)
    val kwArr = lit(kw.toArray)
    // cache-and-leave by design: the CacheManager dedupes this entry with
    // every other consumer of the same canonical termCounts plan (n1–n5,
    // the dedup pack), so unpersisting here would evict a shared subtree.
    // Per-doc scores are a float sum over ≤|keywords| term contributions
    // rounded afterwards — summation order could flip the 6th decimal only
    // on an exact rounding boundary; with ≤8 terms per doc the risk is
    // negligible (if n13 ever wobbles, round per-term contributions first).
    val counts = Caches.shared(termCounts(docs))
    // docLen and the (N, avgdl) scalars are keyword-independent corpus
    // aggregates recomputed by every BM25 consumer (n13, x44's lexical
    // arm, x47's lexical arm, x61's two passes) — shared-cached, the
    // CacheManager dedupes the identical canonical plans into one entry,
    // so the whole retrieval family builds them once per corpus (guide
    // §2.4: two operations keyed the same way share one exchange).
    val docLen = docLenFromCounts(counts)
    val stats = bm25StatsFrom(docs, counts)
    val dfs = counts.where(array_contains(kwArr, col("token")))
      .groupBy("token").agg(count(lit(1)).as("df"))
    val scores = counts.where(array_contains(kwArr, col("token")))
      .join(broadcast(dfs), "token")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("cnt") * lit(k1 + 1.0)) /
          (col("cnt") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("s"))
      .groupBy("doc_id").agg(sum("s").as("score"))
    docs.select("doc_id")
      .join(scores, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), round(coalesce(col("score"), lit(0.0)), 6).as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(topK)
  }

  /** BM25 over a query-terms FRAME — [[bm25Rank]]'s scoring body with the
    * literal keyword filter replaced by a broadcast equi-join, so
    * data-derived term sets (the PRF expansion below) ride as data and
    * the plan shape stays term-set-invariant (the x39/x37 literal
    * lesson). `terms` needs one `token` column; duplicates are dropped.
    */
  def bm25RankFromTerms(docs: DataFrame, terms: DataFrame, k1: Double = 1.2,
                        b: Double = 0.75, topK: Int = 100): DataFrame = {
    val counts = Caches.shared(termCounts(docs))
    val docLen = docLenFromCounts(counts)
    val stats = bm25StatsFrom(docs, counts)
    val matched = counts.join(broadcast(terms.select("token").distinct()), "token")
    val dfs = matched.groupBy("token").agg(count(lit(1)).as("df"))
    val scores = matched
      .join(broadcast(dfs), "token")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("cnt") * lit(k1 + 1.0)) /
          (col("cnt") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("s"))
      .groupBy("doc_id").agg(sum("s").as("score"))
    docs.select("doc_id")
      .join(scores, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), round(coalesce(col("score"), lit(0.0)), 6).as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(topK)
  }

  /** Pseudo-relevance-feedback query expansion (Rocchio 1971 / the RM
    * relevance-model family): run BM25 with the original query, take the
    * top `fbDocs` positive hits as implicit relevance feedback, pick the
    * `expandTerms` highest summed-TF-IDF terms those docs contain (query
    * terms excluded; selection orders on the 6-dp-rounded weight with a
    * term tie-break), and re-rank with BM25 over the expanded term set —
    * the classic fix for vocabulary mismatch, where a relevant document
    * uses synonyms of the query and scores zero lexically.
    *
    * Scale shape: the feedback set is fbDocs rows, the expansion
    * aggregation runs over the feedback docs' Zipf-compressed term
    * counts, and the expanded set rides [[bm25RankFromTerms]]' broadcast
    * frame — no stage widens with corpus size beyond the two BM25 passes.
    */
  def prfExpandedBm25(docs: DataFrame, keywords: Seq[String] = Keywords,
                      fbDocs: Int = 10, expandTerms: Int = 5,
                      k1: Double = 1.2, b: Double = 0.75,
                      topK: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val kw = keywords.map(_.toLowerCase)
    val fb = bm25Rank(docs, keywords, k1, b, fbDocs).where(col("bm25") > 0)
    val counts = Caches.shared(termCounts(docs))
    // the expanded term set is derived model state (deterministic: 6-dp
    // weights, term tie-break) — shared-cached so re-runs skip the whole
    // feedback pass and re-rank against the materialized 5-row term frame
    val exp = Caches.shared(counts.join(fb.select("doc_id"), "doc_id")
      .join(idfFromCounts(counts, docs).select("token", "idf"), "token")
      .where(!col("token").isin(kw: _*))
      .groupBy("token").agg(round(sum(col("cnt") * col("idf")), 6).as("w"))
      .orderBy(desc("w"), asc("token")).limit(expandTerms))
    val allTerms = exp.select("token").unionByName(kw.toDF("token")).distinct()
    bm25RankFromTerms(docs, allTerms, k1, b, topK)
  }

  /** N10: ranked corpus, top-k by combined score (tie-broken on doc_id). */
  def rankDocuments(docs: DataFrame, keywords: Seq[String] = Keywords,
                    topK: Int = 100): DataFrame =
    relevanceScores(docs, keywords)
      .orderBy(desc("combined"), asc("doc_id"))
      .limit(topK)

  // --- query entries over the documents table ---

  def qTf(spark: SparkSession, sfDir: String): DataFrame =
    tfMax(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("token"), col("cnt"), round(col("tf"), 6).as("tf"))

  def qIdf(spark: SparkSession, sfDir: String): DataFrame =
    idf(Tables.documents(spark, sfDir))
      .select(col("token"), col("df"), round(col("idf"), 6).as("idf"))

  def qTfidfTop(spark: SparkSession, sfDir: String): DataFrame =
    tfidf(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("token"), round(col("tfidf"), 6).as("tfidf"))
      .orderBy(desc("tfidf"), asc("doc_id"), asc("token"))
      .limit(200)

  def qRelevance(spark: SparkSession, sfDir: String): DataFrame =
    relevanceScores(Tables.documents(spark, sfDir))

  def qRank(spark: SparkSession, sfDir: String): DataFrame =
    rankDocuments(Tables.documents(spark, sfDir))

  def qBm25(spark: SparkSession, sfDir: String): DataFrame =
    bm25Rank(Tables.documents(spark, sfDir))

  def qPrfBm25(spark: SparkSession, sfDir: String): DataFrame =
    prfExpandedBm25(Tables.documents(spark, sfDir))
}
