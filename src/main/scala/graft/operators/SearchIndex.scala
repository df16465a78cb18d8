package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Positional inverted index and phrase search — the search-engine primitive
  * the reference approximates with `LIKE '%a b%'` substring probes
  * (`sql_search.py:211-238`). A substring LIKE can't distinguish token
  * boundaries, ignores the tokenizer's case/stopword normalization, and is
  * an unindexable full scan per query. The index form is how a corpus is
  * actually served at scale: one shuffle keyed by token builds the postings,
  * and a phrase query touches only the postings of its own words.
  *
  * Scale shape: `positionalIndex` is the classic index build — the only
  * wide exchange is (token, doc_id, pos), never document text. A phrase
  * query then *starts* from the smallest filtered postings lists and joins
  * on (doc_id, aligned position), so the work is proportional to the
  * phrase words' document frequency, not the corpus. Phrase positions are
  * positions in the stopword-filtered token stream ([[TextFns.tokens]]), so
  * "stream the window" matches the phrase ["stream", "window"] — standard
  * stop-worded index semantics (document it, don't fight it).
  */
object SearchIndex {

  /** The positional inverted index: one row per token occurrence.
    * Materialize (write partitioned by a token-hash bucket) to serve many
    * queries; the query operators below compose on it lazily.
    */
  def positionalIndex(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "tok")))

  /** Documents containing `phrase` as consecutive tokens, with occurrence
    * counts, top `k` by count. One join per phrase word after filtering
    * the index to exactly the phrase's tokens — the canonical positional
    * AND-join: word i must appear at `pos0 + i` in the same document.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String], k: Int = 100): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val idx = positionalIndex(docs)
    val first = idx.where(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos").as("p0"))
    val aligned = phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (w, i)) =>
      acc.join(idx.where(col("tok") === w)
        .select(col("doc_id"), (col("pos") - i).as("p0")), Seq("doc_id", "p0"))
    }
    aligned.groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(desc("n_occurrences"), asc("doc_id"))
      .limit(k)
  }

  val DefaultPhrase: Seq[String] = Seq("stream", "window")

  def qPhraseSearch(spark: SparkSession, sfDir: String): DataFrame =
    phraseSearch(Tables.documents(spark, sfDir), DefaultPhrase)
}
