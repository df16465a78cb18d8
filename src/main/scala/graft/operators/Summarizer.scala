package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TextRank extractive summarization (SURVEY.md §2.9 N11–N16), following
  * `pipeline/summarizer.py`: sentence split on `[.!?]+` keeping ≥3-word
  * sentences (`:42-61`), token-set cosine sentence similarity (`:78-100`),
  * symmetric zero-diagonal similarity matrix (`:102-120`), PageRank with
  * damping 0.85, ≤100 iterations, numpy-`allclose` convergence
  * (atol 1e-6 + rtol 1e-5 — `:122-159`), top-N selection re-sorted into
  * document order, short-circuit when the document has ≤N sentences
  * (`:161-204`).
  *
  * Documents are independent and their sentence counts are tiny, so the
  * matrix iteration runs inside a per-row Scala UDF — the idiomatic Spark
  * placement (SURVEY §2.11): the *corpus* parallelism is Spark's, the
  * per-document O(s²) math stays local. Deterministic: plain Double
  * arithmetic, fixed iteration rule, ties broken by higher sentence index
  * first (numpy's reversed argsort) then re-sorted ascending.
  */
object Summarizer {

  val Damping = 0.85
  val MaxIter = 100

  /** Each iteration's scores round to 10 decimals, making the damped
    * fixpoint engine-reproducible (the x14 Lloyd technique): summation
    * wobble from evaluation order is ~1e-16 — far below the 5e-11 rounding
    * boundary — so the rounded score vectors, and therefore the convergence
    * decisions and sentence rankings, are bit-identical across partition
    * counts and engines. The perturbation vs the unrounded fixpoint is
    * bounded by 5e-11/(1-d) ≈ 3e-10, noise against the 1e-6 stopping
    * tolerance and typical inter-sentence score gaps.
    */
  private def round10(x: Double): Double =
    BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val stop: Set[String] = TextFns.Stopwords.toSet
  private val wordRe = "\\b[a-z]{3,}\\b".r

  def splitSentences(text: String): Array[String] =
    Option(text).getOrElse("")
      .split("[.!?]+")
      .map(_.trim)
      .filter(s => s.nonEmpty && s.split("\\s+").count(_.nonEmpty) >= 3)

  def tokenSet(text: String): Set[String] =
    wordRe.findAllIn(text.toLowerCase).filterNot(stop).toSet

  def sentenceSimilarity(s1: String, s2: String): Double = {
    val t1 = tokenSet(s1); val t2 = tokenSet(s2)
    if (t1.isEmpty || t2.isEmpty) 0.0
    else {
      val inter = t1.intersect(t2).size
      val denom = math.sqrt(t1.size.toDouble * t2.size)
      if (denom > 0) inter / denom else 0.0
    }
  }

  def similarityMatrix(sentences: Array[String]): Array[Array[Double]] = {
    val n = sentences.length
    val m = Array.fill(n, n)(0.0)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val s = sentenceSimilarity(sentences(i), sentences(j))
        m(i)(j) = s; m(j)(i) = s
        j += 1
      }
      i += 1
    }
    m
  }

  /** PageRank over the row-normalized similarity matrix; numpy-equivalent
    * update `s = (1-d)/n + d·Mᵀ·prev` and `allclose(atol=1e-6, rtol=1e-5)`
    * stopping rule.
    */
  def textrank(matrix: Array[Array[Double]], maxIter: Int = MaxIter): Array[Double] = {
    val n = matrix.length
    if (n == 0) return Array.empty
    val rowSums = matrix.map(r => { val s = r.sum; if (s == 0.0) 1.0 else s })
    val norm = Array.tabulate(n, n)((i, j) => matrix(i)(j) / rowSums(i))
    var scores = Array.fill(n)(1.0 / n)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val prev = scores
      val next = Array.tabulate(n) { j =>
        var acc = 0.0
        var i = 0
        while (i < n) { acc += norm(i)(j) * prev(i); i += 1 }
        round10((1 - Damping) / n + Damping * acc)
      }
      converged = (0 until n).forall(i => math.abs(next(i) - prev(i)) <= 1e-6 + 1e-5 * math.abs(prev(i)))
      scores = next
      it += 1
    }
    scores
  }

  /** N15: extractive summary — top-N sentences by TextRank score, re-sorted
    * into document order, joined with a space.
    */
  def summarize(text: String, numSentences: Int = 3): String = {
    val sentences = splitSentences(text)
    if (sentences.isEmpty) return ""
    if (sentences.length <= numSentences) return sentences.mkString(" ")
    val scores = textrank(similarityMatrix(sentences))
    val ranked = sentences.indices.sortBy(i => (scores(i), i)).reverse
    ranked.take(numSentences).sorted.map(sentences(_)).mkString(" ")
  }

  /** N16: sentences above a max-normalized score threshold, descending. */
  def keySentences(text: String, threshold: Double = 0.5): Array[String] = {
    val sentences = splitSentences(text)
    if (sentences.isEmpty) return Array.empty
    if (sentences.length == 1) return sentences
    val scores = textrank(similarityMatrix(sentences))
    val mx = scores.max
    if (mx == 0.0) return Array.empty
    sentences.indices
      .filter(i => scores(i) / mx >= threshold)
      .sortBy(i => (-scores(i) / mx, i))
      .map(sentences(_))
      .toArray
  }

  /** The summarizer as a column: `String => String` UDF (non-codegen, but
    * the only non-relational operator in the engine — per SURVEY §2.11 this
    * is the intended UDF surface).
    */
  val summarizeUdf = udf((text: String, n: Int) => summarize(text, n))
  val nSentencesUdf = udf((text: String) => splitSentences(text).length)

  // --- query entries (oracle: the damped iteration unrolls into a DuckDB
  // recursive CTE over the normalized edge list — NlpSql.textrankCtes) ---

  def qSummaries(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        nSentencesUdf(col("text")).cast("long").as("n_sentences"),
        summarizeUdf(col("text"), lit(3)).as("summary"))

  /** N16 as a column: key sentences joined with `|` (threshold 0.5). */
  val keySentencesUdf = udf((text: String) => keySentences(text).mkString("|"))

  def qKeySentences(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), keySentencesUdf(col("text")).as("key_sentences"))

  // --- N11–N13 in distributed relational form (no UDF): the sentence
  // split is a codegen'd column pipeline, and pairwise similarity comes
  // from a per-document token inverted index — only co-tokened sentence
  // pairs ever meet the join, so zero-similarity pairs never materialize
  // and the shuffle is keyed on (doc_id, token), never quadratic. ---

  /** N11: one row per kept sentence, indexed in document order. */
  def sentencesDf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(TextFns.sentences(col("text"))).as(Seq("__i", "sentence")))
      .select(col("doc_id"), (col("__i") + 1).cast("long").as("sidx"),
        col("sentence"))

  /** N12/N13: token-set cosine for all co-tokened sentence pairs (i < j). */
  def sentenceSimilaritiesDf(docs: DataFrame): DataFrame = {
    val toks = sentencesDf(docs)
      .select(col("doc_id"), col("sidx"),
        explode(array_distinct(TextFns.tokens(col("sentence")))).as("tok"))
    val sz = toks.groupBy("doc_id", "sidx").agg(count(lit(1)).as("sz"))
    val inter = toks.as("a")
      .join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.tok") === col("b.tok") &&
          col("a.sidx") < col("b.sidx"))
      .groupBy(col("a.doc_id").as("doc_id"), col("a.sidx").as("i"),
        col("b.sidx").as("j"))
      .agg(count(lit(1)).as("ncommon"))
    inter
      .join(sz.withColumnRenamed("sidx", "i").withColumnRenamed("sz", "sz_i"),
        Seq("doc_id", "i"))
      .join(sz.withColumnRenamed("sidx", "j").withColumnRenamed("sz", "sz_j"),
        Seq("doc_id", "j"))
      .select(col("doc_id"), col("i"), col("j"),
        round(col("ncommon") / sqrt(col("sz_i") * col("sz_j")), 6).as("sim"))
  }

  def qSentences(spark: SparkSession, sfDir: String): DataFrame =
    sentencesDf(Tables.documents(spark, sfDir))

  /** N12/N13 as ONE shuffle-free pass: the per-document pair list comes
    * off [[org.apache.spark.sql.graftext.SentencePairSimsExpr]] (one
    * kernel invocation per document) instead of the corpus-wide
    * (doc_id, token) self-join — the answer never leaves the document, so
    * at 100 TB it must not cost corpus-wide token shuffles.
    * [[sentenceSimilaritiesDf]] stays as the relational reference arm the
    * kernel is spec-pinned against.
    */
  def sentenceSimilaritiesFused(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(org.apache.spark.sql.graftext.SentencePairSimsExpr
          .sentencePairSims(col("text"), TextFns.WordPattern, TextFns.Stopwords))
          .as("p"))
      .select(col("doc_id"), col("p.i").as("i"), col("p.j").as("j"),
        col("p.sim").as("sim"))

  /** The synthetic corpus has no sentence punctuation (each doc is one
    * long sentence), which would make the pairwise query vacuously empty —
    * so the registered entry first inserts a deterministic boundary every
    * 12 words (a pure regex both engines replicate), giving the
    * sentence-pair path real multi-sentence input to verify.
    */
  def qSentenceSims(spark: SparkSession, sfDir: String): DataFrame = {
    val sentencified = Tables.documents(spark, sfDir).select(col("doc_id"),
      regexp_replace(col("text"), "((?:\\S+\\s+){12})", "$1. ").as("text"))
    sentenceSimilaritiesFused(sentencified)
  }
}
