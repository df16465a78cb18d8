package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) Viterbi segmentation (Kudo 2018,
  * "Subword Regularization") — the third member of the tokenizer family:
  * BPE segments by learned merges (x46/x48), WordPiece by greedy longest
  * match (x72/x73); the unigram LM picks, per word, the segmentation
  * maximizing Σ ln p(piece) under a piece probability model — the global
  * optimum greedy matching only approximates. The model here is the
  * frequency-seeded distribution over [[Wordpiece.pieceVocab]] (the
  * paper's EM refinement starts from exactly this seed; one Viterbi
  * E-step is the deterministic, oracle-checkable core).
  *
  * Spark-first shape: the model is piece→ln(freq/total) — a
  * vocabulary-sized frame; each WORD (the Zipf-compressed table, never
  * the token stream) carries a map of its in-vocab substrings' log-probs
  * and runs the O(len·maxLen) Viterbi DP as one `aggregate` fold in
  * whole-stage codegen. Documents join the solved vocabulary on the word
  * key — x48's narrow equi-join.
  *
  * Determinism: scores on both engines are the same doubles (identical
  * arithmetic per path), so argmax comparisons agree exactly; ties break
  * to the FEWEST pieces (score DESC, n ASC), pinned on both sides. Words
  * longer than [[MaxWordLen]] are excluded on both sides (the oracle
  * unrolls the DP; natural-language tokens beyond 24 chars are the noise
  * quality filters drop anyway).
  */
object UnigramLm {

  val MaxWordLen = 24

  /** Piece log-probabilities over the WordPiece vocabulary:
    * ln(freq / Σfreq), full precision (rounding happens only at output).
    */
  def pieceLogProbs(docs: DataFrame,
                    vocabSize: Int = Wordpiece.DefaultVocab,
                    maxLen: Int = Wordpiece.MaxPieceLen): DataFrame = {
    val vocab = Wordpiece.pieceVocab(docs, vocabSize, maxLen)
    val total = vocab.agg(sum("freq").as("total"))
    vocab.crossJoin(broadcast(total))
      .select(col("piece"),
        log(col("freq").cast("double") / col("total")).as("logp"))
  }

  /** Per-word Viterbi solution: `(word, cnt, n_pieces, score)`. */
  def viterbiWords(docs: DataFrame,
                   vocabSize: Int = Wordpiece.DefaultVocab,
                   maxLen: Int = Wordpiece.MaxPieceLen): DataFrame = {
    val lp = pieceLogProbs(docs, vocabSize, maxLen)
    val words = Bpe.wordTable(docs).where(length(col("word")) <= MaxWordLen)
    // per word: map over its distinct in-vocab substrings -> logp
    val wordMaps = words.select(col("word"),
        explode(array_distinct(Wordpiece.substringsOf(col("word"), maxLen)))
          .as("piece"))
      .join(lp, "piece")
      .groupBy("word")
      .agg(map_from_entries(collect_list(struct(col("piece"), col("logp"))))
        .as("m"))
    // DP fold: acc[j+1] = best (score, -n_pieces) for the first j chars;
    // struct max is lexicographic, so (score, negn) DESC = score first,
    // then FEWEST pieces.
    val dp = aggregate(
      sequence(lit(1), length(col("word"))),
      array(struct(lit(0.0d).as("score"), lit(0).as("negn"))),
      (acc, i) => {
        val cands = transform(
          filter(sequence(lit(1), least(lit(maxLen), i)), l =>
            element_at(col("m"), col("word").substr(i - l + 1, l)).isNotNull),
          l => struct(
            (element_at(acc, i - l + 1)("score") +
              element_at(col("m"), col("word").substr(i - l + 1, l)))
              .as("score"),
            (element_at(acc, i - l + 1)("negn") - 1).as("negn")))
        concat(acc, array(array_max(cands)))
      })
    words.join(wordMaps, "word")
      .withColumn("fin", element_at(dp, length(col("word")) + 1))
      .select(col("word"), col("cnt"),
        (-col("fin")("negn")).cast("long").as("n_pieces"),
        col("fin")("score").as("score"))
  }

  /** x74: per-document stats under the Viterbi tokenizer — x48/x73's
    * (n_words, n_subwords, fertility) shape plus the mean per-word
    * segmentation log-likelihood.
    */
  def segmentCorpus(docs: DataFrame,
                    vocabSize: Int = Wordpiece.DefaultVocab,
                    maxLen: Int = Wordpiece.MaxPieceLen): DataFrame = {
    val solved = viterbiWords(docs, vocabSize, maxLen)
      .select("word", "n_pieces", "score")
    docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("word"))
      .where(length(col("word")) <= MaxWordLen)
      .join(solved, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_pieces").as("n_subwords"),
        sum("score").as("sumscore"))
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") / col("n_words"), 6)
          .as("fertility"),
        round(col("sumscore") / col("n_words"), 6).as("avg_logprob"))
  }

  def qUnigramViterbi(spark: SparkSession, sfDir: String): DataFrame =
    segmentCorpus(Tables.documents(spark, sfDir))

  /** x75: the tokenizer bake-off — one row per tokenizer (BPE, WordPiece,
    * unigram-LM) with corpus-level word/subword totals and global
    * fertility, i.e. the table a pipeline owner reads to pick the
    * tokenizer before a training run commits to one. Composes the three
    * already-oracle-checked segmenters; each rides its own
    * vocabulary-sized training and the same narrow word-keyed document
    * join, so the report costs no more than its parts.
    */
  def tokenizerReport(docs: DataFrame): DataFrame = {
    def summarize(name: String, perDoc: DataFrame): DataFrame =
      perDoc.agg(sum("n_words").as("nw"), sum("n_subwords").as("ns"))
        .select(lit(name).as("tokenizer"),
          col("nw").as("n_words"), col("ns").as("n_subwords"),
          round(col("ns").cast("double") / col("nw"), 6).as("fertility"))
    summarize("bpe", Bpe.segmentCorpus(docs))
      .unionByName(summarize("wordpiece", Wordpiece.segmentCorpus(docs)))
      .unionByName(summarize("unigram", segmentCorpus(docs)))
  }

  def qTokenizerReport(spark: SparkSession, sfDir: String): DataFrame =
    tokenizerReport(Tables.documents(spark, sfDir))
}
