package graft

import graft.operators.{Bpe, UnigramLm, Wordpiece}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.{BpeSegmentExpr, UnigramViterbiExpr, WordpieceSegmentExpr}

/** The three tokenizer-segmentation kernels must agree EXACTLY with the
  * interpreted HOF arms they replaced — BPE merge fold, WordPiece greedy
  * fold, unigram Viterbi DP + backwalk — on the corpus word table and the
  * edge shapes each contract defines, in both codegen and interpreted
  * paths; and the pieceVocab top-N must plan distributed (no
  * single-partition window).
  */
class SegmentExprsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val merges8: Seq[(String, String)] = {
    Bpe.learnMerges(sampleDocs, numMerges = 8)
      .select("merge_left", "merge_right").as[(String, String)].collect().toSeq
  }

  private def bpeBoth = {
    val words = Bpe.wordTable(sampleDocs)
    val k = words.select(col("word"),
        BpeSegmentExpr.bpeSegment(col("word"), merges8).as("pieces"))
      .as[(String, Seq[String])].collect().sortBy(_._1).toSeq
    val h = Bpe.segment(words, merges8)
      .as[(String, Seq[String])].collect().sortBy(_._1).toSeq
    (k, h)
  }

  private def wpBoth = {
    val vocab = Wordpiece.vocabPieces(sampleDocs, vocabSize = 50)
    val k = Bpe.wordTable(sampleDocs).select(col("word"),
        WordpieceSegmentExpr.wordpieceSegment(col("word"), vocab,
          Wordpiece.MaxPieceLen).as("pieces"))
      .as[(String, Seq[String])].collect().sortBy(_._1).toSeq
    val h = Wordpiece.segmentWords(sampleDocs, vocabSize = 50)
      .select("word", "pieces").as[(String, Seq[String])].collect().sortBy(_._1).toSeq
    (k, h)
  }

  // a handcrafted restricted model (the emStep lp1 regime, NO char
  // backstop): only "ab" — "abab" reachable, "abx" hits the −1e18
  // sentinel, "xy" has no in-vocab substring at all
  private val restrictedModel = Seq(("ab", math.log(0.5)))
  private def restrictedWords =
    Seq(("abab", 2L), ("abx", 1L), ("xy", 1L)).toDF("word", "cnt")

  /** Kernel vs both relational arms. The DP arm runs over `words`; the
    * backwalk arm runs over `piecesWords` only — under ANSI
    * `element_at` the relational backwalk THROWS on a sentinel
    * (unreachable) word rather than nulling, and production only ever
    * backwalks under the seeded all-reachable model, so the sentinel
    * words' pieces contract (null → explode drops) is asserted on the
    * kernel directly instead.
    */
  private def ugCompare(words: org.apache.spark.sql.DataFrame,
                        model: Seq[(String, Double)],
                        piecesWords: org.apache.spark.sql.DataFrame) = {
    val lpDf = model.toDF("piece", "logp")
    def fusedOf(w: org.apache.spark.sql.DataFrame) =
      w.select(col("word"), col("cnt"),
          UnigramViterbiExpr.unigramViterbi(col("word"), model,
            Wordpiece.MaxPieceLen).as("v"))
        .where(col("v").isNotNull)
    val k = fusedOf(words).select(col("word"), col("cnt"),
        col("v.n_pieces").as("n"), col("v.score").as("s"))
      .as[(String, Long, Long, Double)].collect().sorted.toSeq
    val hFrom = UnigramLm.viterbiFromModel(words, lpDf, Wordpiece.MaxPieceLen)
      .select("word", "cnt", "n_pieces", "score")
      .as[(String, Long, Long, Double)].collect().sorted.toSeq
    val kPieces = fusedOf(piecesWords)
      .select(col("word"), explode(col("v.pieces")).as("piece"))
      .as[(String, String)].collect().sorted.toSeq
    val hPieces = UnigramLm.viterbiPieces(piecesWords, lpDf, Wordpiece.MaxPieceLen)
      .select("word", "piece").as[(String, String)].collect().sorted.toSeq
    (k, hFrom, kPieces, hPieces)
  }

  private def ugBoth = {
    val words = Bpe.wordTable(sampleDocs)
      .where(length(col("word")) <= UnigramLm.MaxWordLen)
    ugCompare(words,
      UnigramLm.pieceLogProbs(sampleDocs, vocabSize = 50)
        .as[(String, Double)].collect().toSeq,
      words)
  }

  private def ugRestricted = ugCompare(restrictedWords, restrictedModel,
    restrictedWords.where(col("word") =!= "abx"))

  test("BPE kernel equals the merge-fold arm on corpus words + edge merges, codegen") {
    val (k, h) = bpeBoth
    assert(k.nonEmpty && k == h)
    // greedy non-overlap: (a,a) on "aaa" merges once, leaving "aa a </w>"
    val aa = Seq("aaa").toDF("word").select(
      BpeSegmentExpr.bpeSegment(col("word"), Seq(("a", "a"))).as("p"))
      .as[Seq[String]].collect().head
    assert(aa == Seq("aa", "a", Bpe.Eow))
    // whole-symbol anchoring: after (t,h), the pair (h,e) must NOT fire
    // against the 'h' inside the fused "th"
    val the = Seq("the").toDF("word").select(
      BpeSegmentExpr.bpeSegment(col("word"), Seq(("t", "h"), ("h", "e"))).as("p"))
      .as[Seq[String]].collect().head
    assert(the == Seq("th", "e", Bpe.Eow))
  }

  test("WordPiece kernel equals the greedy-fold arm on corpus words, codegen; " +
       "no-fit position yields null like the arm's null accumulator") {
    val (k, h) = wpBoth
    assert(k.nonEmpty && k == h)
    val noFit = Seq("abc").toDF("word").select(
      WordpieceSegmentExpr.wordpieceSegment(col("word"), Seq("ab"), 6).as("p"))
      .select(col("p").isNull).as[Boolean].collect().head
    assert(noFit, "position with no matching piece must null the result")
  }

  test("Viterbi kernel equals the DP arm (n_pieces, score) AND the backwalk " +
       "arm (pieces) on corpus + restricted-model sentinel words, codegen") {
    val (k, hFrom, kPieces, hPieces) = ugBoth
    assert(k.nonEmpty && k == hFrom, s"DP mismatch:\n$k\n$hFrom")
    assert(kPieces.nonEmpty && kPieces == hPieces)
    val (rk, rh, rkp, rhp) = ugRestricted
    assert(rk == rh && rkp == rhp)
    // the sentinel word stays a ROW (both arms); its kernel pieces are
    // null so an explode-consumer drops it (the relational backwalk
    // cannot even run on it — ANSI element_at throws on the empty fits)
    assert(rk.exists(r => r._1 == "abx" && r._3 == 0L && r._4 == -1.0e18))
    assert(!rkp.exists(_._1 == "abx"))
    val abxNull = Seq(("abx", 1L)).toDF("word", "cnt").select(
      UnigramViterbiExpr.unigramViterbi(col("word"), restrictedModel,
        Wordpiece.MaxPieceLen).as("v"))
      .select(col("v.pieces").isNull).as[Boolean].collect().head
    assert(abxNull, "sentinel word's pieces must be null")
    // no-in-vocab-substring word dropped on both arms
    assert(!rk.exists(_._1 == "xy"))
    assert(rk.exists(r => r._1 == "abab" && r._3 == 2L))
  }

  test("all three kernels equal their arms on the interpreted path") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val (bk, bh) = bpeBoth
      assert(bk == bh)
      val (wk, wh) = wpBoth
      assert(wk == wh)
      val (uk, uh, up, uhp) = ugBoth
      assert(uk == uh && up == uhp)
      val (rk, rh, rkp, rhp) = ugRestricted
      assert(rk == rh && rkp == rhp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("pieceVocab plans a distributed top-N (TakeOrderedAndProject), not a " +
       "single-partition window") {
    val plan = Wordpiece.pieceVocab(sampleDocs).queryExecution.executedPlan
    val flat = flattenPlan(plan)
    assert(!flat.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"global window survived in pieceVocab:\n$plan")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"expected a TakeOrderedAndProject top-N in pieceVocab:\n$plan")
  }

  test("SQL forms match the Column API") {
    org.apache.spark.sql.graftext.GraftFunctions.register(spark)
    val bpe = spark.sql(
      "SELECT bpe_segment('the', array('t','h','h','e')) AS p")
      .as[Seq[String]].collect().head
    assert(bpe == Seq("th", "e", Bpe.Eow))
    val wp = spark.sql(
      "SELECT wordpiece_segment('thee', array('the','t','h','e'), 6) AS p")
      .as[Seq[String]].collect().head
    assert(wp == Seq("the", "e"))
    val ug = spark.sql(
      "SELECT unigram_viterbi('abab', array('ab'), array(cast(-0.693 AS double)), 6) AS v")
      .select("v.n_pieces", "v.pieces").as[(Long, Seq[String])].collect().head
    assert(ug == ((2L, Seq("ab", "ab"))))
  }
}
