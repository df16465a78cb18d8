package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the NLP operators.
  *
  * Semantics follow the reference toolkit (`/root/reference/`):
  *  - tokenize = regex `\b[a-z]{3,}\b` over lowercased text, minus a fixed
  *    ~100-entry English stopword set (`pipeline/relevance_scorer.py:30-60`,
  *    duplicated at `pipeline/summarizer.py:63-76` and
  *    `pipeline/duplicate_detector.py:42-55`).
  *
  * Everything here is built from `org.apache.spark.sql.functions` only — no
  * UDFs — so the expressions stay inside whole-stage codegen and are usable
  * from both the Scala API and SQL.
  */
object TextFns {

  /** Default stopword set of the reference (`pipeline/relevance_scorer.py:30-43`). */
  val Stopwords: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you", "your",
    "yours", "yourself", "yourselves", "he", "him", "his", "himself", "she", "her",
    "hers", "herself", "it", "its", "itself", "they", "them", "their", "theirs",
    "themselves", "what", "which", "who", "whom", "this", "that", "these", "those",
    "am", "is", "are", "was", "were", "be", "been", "being", "have", "has", "had",
    "having", "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if",
    "or", "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before", "after",
    "above", "below", "to", "from", "up", "down", "in", "out", "on", "off", "over",
    "under", "again", "further", "then", "once")

  /** The reference's word regex (`pipeline/relevance_scorer.py:57`). Same
    * `\b` (ASCII word-boundary) semantics in Java regex, RE2 (DuckDB) and
    * Python `re`, so oracle SQL can reuse it verbatim.
    */
  val WordPattern = "\\b[a-z]{3,}\\b"

  /** All word tokens (duplicates preserved — TF needs them), stopwords
    * removed. The stopword cut is the engine's hottest lambda (it runs
    * once per word of every document under every text operator), so it is
    * the fused [[org.apache.spark.sql.graftext.SetFilterExpr]] kernel —
    * one hash probe per word instead of an interpreted lambda scanning
    * the ~94-entry list. [[tokensHof]] keeps the composable form as the
    * equality-spec reference.
    */
  def tokens(text: Column): Column = {
    val words = regexp_extract_all(lower(text), lit(WordPattern), lit(0))
    org.apache.spark.sql.graftext.SetFilterExpr.withoutSet(words, Stopwords)
  }

  /** The pre-kernel HOF form of [[tokens]] — the spec reference. */
  private[graft] def tokensHof(text: Column): Column = {
    val words = regexp_extract_all(lower(text), lit(WordPattern), lit(0))
    filter(words, w => !array_contains(lit(Stopwords.toArray), w))
  }

  /** Distinct token set (for coverage / set-cosine operators). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Sentence split of the summarizer (`pipeline/summarizer.py:42-61`):
    * split on `[.!?]+` runs, trim, drop empties and sentences with fewer
    * than 3 whitespace-separated words.
    */
  def sentences(text: Column): Column = {
    val raw = split(text, "[.!?]+")
    // trim exactly Java String.trim's set (every char <= U+0020) so the
    // column form, the driver-side Summarizer.splitSentences (which uses
    // String.trim), and the DuckDB oracle agree on any input — a plain
    // char-list trim of " \t\n\r" would diverge on \x0B/\f etc.; the word
    // count ignores empty split tokens like the reference's len(split())
    val trimmed = transform(raw, s =>
      regexp_replace(regexp_replace(s, "^[\\x00-\\x20]+", ""), "[\\x00-\\x20]+$", ""))
    filter(trimmed, s =>
      (s =!= "") && size(filter(split(s, "\\s+"), w => w =!= "")) >= 3)
  }

  /** Whitespace word count (`len(text.split())` of the reference). */
  def wordCount(text: Column): Column =
    size(filter(split(text, "\\s+"), w => w =!= ""))

  /** Length-score step function (`pipeline/priority_classifier.py:77-101`)
    * with the default thresholds 50/200/500.
    */
  def lengthScore(text: Column, minWords: Int = 50, substantial: Int = 200,
                  comprehensive: Int = 500): Column = {
    val wc = wordCount(text)
    when(wc < minWords, 0.1)
      .when(wc < substantial, 0.5)
      .when(wc < comprehensive, 0.8)
      .otherwise(1.0)
  }

  /** Keyword priority score (`pipeline/priority_classifier.py:103-140`):
    * any critical-keyword substring match → 1.0, else any high-keyword → 0.7,
    * else 0.0 (case-insensitive substring containment).
    */
  def keywordScore(text: Column, critical: Seq[String], high: Seq[String]): Column = {
    val lowered = lower(text)
    val hitAny = (kws: Seq[String]) =>
      kws.map(k => lowered.contains(lit(k.toLowerCase))).reduceOption(_ || _).getOrElse(lit(false))
    when(hitAny(critical), 1.0).when(hitAny(high), 0.7).otherwise(0.0)
  }

  /** Score → priority-level mapping (`pipeline/priority_classifier.py:178-198`),
    * default thresholds .85/.65/.45/.25.
    */
  def priorityLevel(score: Column): Column =
    when(score >= 0.85, "CRITICAL")
      .when(score >= 0.65, "HIGH")
      .when(score >= 0.45, "MEDIUM")
      .when(score >= 0.25, "LOW")
      .otherwise("NONE")

  /** Dense-vector cosine similarity over two `array<float|double>` columns
    * (`sql_search.py:2227-2236`). Pure `zip_with`/`aggregate` — codegen-safe,
    * no UDF. Returns 0.0 when either norm is zero.
    */
  def cosineDense(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0d), (acc, x) => acc + x))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / (na * nb))
  }
}
