package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge-pair learning (Sennrich, Haddow & Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — tokenizer training as
  * corpus aggregation. Each iteration counts adjacent symbol pairs over the
  * word-frequency table, merges the most frequent pair everywhere, and
  * records it; the learned merge list IS a tokenizer (apply the merges in
  * rank order to segment unseen text).
  *
  * Spark-first shape: training runs on the *word-frequency table* (distinct
  * word, count), never the token stream — at corpus scale that is the
  * Zipf-compressed vocabulary, built by one hash aggregation over the scan.
  * Every iteration is then a pair-count aggregation plus a projection over
  * the vocabulary frame; only the 1-row argmax reaches the driver (the same
  * k-small-rows-per-iteration contract as the Lloyd trainer), and
  * `localCheckpoint` truncates lineage so the plan shape — and therefore
  * the generated code — is iteration-invariant and compiles once (the x39
  * lesson: carry per-iteration state in a broadcast frame, not literals).
  *
  * Determinism (the oracle contract): symbols live in a double-space-
  * separated string, and `replace(sym, a || '  ' || b, a || b)` is *exactly*
  * the greedy left-to-right non-overlapping BPE merge in both engines —
  * the consumed separator can never break an adjacent match because every
  * boundary owns its own two-space separator. Argmax ties break on the
  * pair's byte order, identical in Spark and DuckDB for this ASCII corpus.
  */
object Bpe {

  /** End-of-word marker symbol (the classic `</w>`), so merges cannot cross
    * word boundaries and word-final units stay distinct from prefixes.
    */
  val Eow = "</w>"

  /** Symbol separator inside the state string. Two spaces, so that a merge
    * consuming a boundary leaves the neighboring boundaries intact (single
    * separators would make `replace` miss the immediately following
    * occurrence in runs like `a b a b`).
    */
  val Sep = "  "

  /** Word-frequency table: one hash aggregation over the token stream. */
  def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial symbolization: characters joined by [[Sep]] plus the [[Eow]]
    * marker — `"the"` becomes `"t  h  e  </w>"`.
    */
  private[graft] def initState(words: DataFrame): DataFrame =
    words.select(col("word"), col("cnt"),
      concat(
        concat_ws(Sep, transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))),
        lit(Sep + Eow)).as("sym"))

  /** Adjacent-pair counts over the current state, weighted by word count
    * (overlapping occurrences both count, like the original Counter over
    * `zip(symbols, symbols[1:])`).
    */
  private[graft] def pairCounts(state: DataFrame): DataFrame =
    state.select(col("cnt"), split(col("sym"), Sep).as("syms"))
      .select(col("cnt"),
        explode(transform(sequence(lit(1), size(col("syms")) - 1), i =>
          struct(element_at(col("syms"), i).as("a"),
                 element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("cnt").as("pair_count"))

  /** Learn `numMerges` merges; returns (rank, merge_left, merge_right,
    * pair_count) in merge order. Stops early if the corpus runs out of
    * pairs (single-symbol words everywhere).
    */
  def learnMerges(docs: DataFrame, numMerges: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var state = initState(wordTable(docs)).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (k <- 1 to numMerges if !exhausted) {
      val best = pairCounts(state)
        .orderBy(desc("pair_count"), asc("a"), asc("b")).limit(1)
        .as[(String, String, Long)].collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = best.head
        merges += ((k.toLong, a, b, c))
        // the merge pair rides in a broadcast 1-row frame, not literals, so
        // every iteration optimizes to the same plan shape (codegen once)
        val pair = broadcast(Seq((a, b)).toDF("ma", "mb"))
        state = state.crossJoin(pair)
          .select(col("word"), col("cnt"),
            expr(s"replace(sym, ma || '$Sep' || mb, ma || mb)").as("sym"))
          .localCheckpoint()
      }
    }
    merges.toSeq.toDF("rank", "merge_left", "merge_right", "pair_count")
  }

  /** Segment `words` with an already-learned merge table: re-run the merges
    * in rank order over the symbol string (the standard BPE apply pass —
    * same `replace` mechanics, no counting). Exposed for the spec and as
    * the serving-side half of the tokenizer.
    */
  def segment(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val init = words.select(col("word"),
      concat(
        concat_ws(Sep, transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))),
        lit(Sep + Eow)).as("sym"))
    val merged = merges.foldLeft(init) { case (st, (a, b)) =>
      st.withColumn("sym",
        expr(s"replace(sym, '$a$Sep$b', '$a$b')"))
    }
    merged.select(col("word"), split(col("sym"), Sep).as("pieces"))
  }

  // --- query entry ---

  def qBpeMerges(spark: SparkSession, sfDir: String): DataFrame =
    learnMerges(Tables.documents(spark, sfDir))
}
