package graft

import graft.operators.{UnigramLm, Wordpiece}
import org.apache.spark.sql.functions._

/** Unigram-LM Viterbi invariants: per-word parity with an in-JVM DP
  * reference, optimality vs the greedy WordPiece segmentation, and the
  * tie-break contract.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def refViterbi(word: String, logp: Map[String, Double],
                         maxLen: Int): (Int, Double) = {
    // dp(j) = best (score, negN) over segmentations of word.take(j)
    val dp = Array.fill(word.length + 1)((Double.NegativeInfinity, 0))
    dp(0) = (0.0, 0)
    for (i <- 1 to word.length) {
      var best = (Double.NegativeInfinity, Int.MinValue)
      for (l <- 1 to math.min(maxLen, i)) {
        val piece = word.substring(i - l, i)
        logp.get(piece).foreach { p =>
          val cand = (dp(i - l)._1 + p, dp(i - l)._2 - 1)
          // lexicographic max: score first, then negN (fewest pieces)
          if (cand._1 > best._1 || (cand._1 == best._1 && cand._2 > best._2))
            best = cand
        }
      }
      dp(i) = best
    }
    (-dp(word.length)._2, dp(word.length)._1)
  }

  test("viterbi matches the in-JVM DP on every vocab word") {
    val logp = UnigramLm.pieceLogProbs(sampleDocs, vocabSize = 50)
      .as[(String, Double)].collect().toMap
    val solved = UnigramLm.viterbiWords(sampleDocs, vocabSize = 50)
      .select("word", "n_pieces", "score").as[(String, Long, Double)].collect()
    assert(solved.nonEmpty)
    solved.foreach { case (w, n, s) =>
      val (rn, rs) = refViterbi(w, logp, Wordpiece.MaxPieceLen)
      assert(n == rn && s == rs, s"viterbi mismatch for '$w': ($n,$s) vs ($rn,$rs)")
    }
  }

  test("viterbi log-likelihood is never below the greedy segmentation's") {
    val logp = UnigramLm.pieceLogProbs(sampleDocs, vocabSize = 50)
      .as[(String, Double)].collect().toMap
    val greedy = Wordpiece.segmentWords(sampleDocs, vocabSize = 50)
      .select("word", "pieces").as[(String, Seq[String])].collect()
    val solved = UnigramLm.viterbiWords(sampleDocs, vocabSize = 50)
      .select("word", "score").as[(String, Double)].collect().toMap
    greedy.foreach { case (w, pieces) =>
      val greedyScore = pieces.map(logp).sum
      assert(solved(w) >= greedyScore - 1e-9,
        s"'$w': viterbi ${solved(w)} < greedy $greedyScore")
    }
  }

  test("viterbi backwalk reconstructs segmentations consistent with the DP") {
    import graft.operators.Bpe
    val logp = UnigramLm.pieceLogProbs(sampleDocs, vocabSize = 50)
      .as[(String, Double)].collect().toMap
    val words = Bpe.wordTable(sampleDocs)
    val lp = UnigramLm.pieceLogProbs(sampleDocs, vocabSize = 50)
    val pieces = UnigramLm.viterbiPieces(words, lp, Wordpiece.MaxPieceLen)
      .select("word", "piece").as[(String, String)].collect()
      .groupBy(_._1).map { case (w, ps) => w -> ps.map(_._2).toSeq }.toMap
    val solved = UnigramLm.viterbiWords(sampleDocs, vocabSize = 50)
      .select("word", "n_pieces", "score").as[(String, Long, Double)].collect()
    assert(solved.nonEmpty)
    solved.foreach { case (w, n, s) =>
      val ps = pieces(w)
      assert(ps.mkString == w, s"'$w': pieces $ps do not concatenate back")
      assert(ps.length == n)
      assert(math.abs(ps.map(logp).sum - s) < 1e-9)
    }
  }

  test("EM step: likelihood is non-decreasing and totals stay consistent") {
    val out = UnigramLm.emStep(sampleDocs, vocabSize = 50)
      .select("iteration", "n_words", "n_subwords", "fertility", "total_loglik")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(0L, 1L))
    assert(out(0)._2 == out(1)._2) // same word occurrences both passes
    assert(out(1)._5 >= out(0)._5 - 1e-6,
      s"EM decreased likelihood: ${out(0)._5} -> ${out(1)._5}")
  }

  test("tokenizer report: one row per tokenizer over the same word stream") {
    val rows = UnigramLm.tokenizerReport(sampleDocs)
      .select("tokenizer", "n_words", "n_subwords", "fertility")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq("bpe", "unigram", "wordpiece"))
    assert(rows.map(_._2).distinct.size == 1) // same corpus word count
    rows.foreach { case (_, nw, ns, f) =>
      assert(nw > 0 && ns >= nw && f >= 1.0)
    }
  }

  test("a word whose whole form is in vocab segments as one piece") {
    // 'alpha' repeated often enough that the full word enters the vocab
    val docs = Seq((0L, "alpha alpha alpha beta"), (1L, "alpha beta")).toDF("doc_id", "text")
    val solved = UnigramLm.viterbiWords(docs, vocabSize = 100)
      .select("word", "n_pieces").as[(String, Long)].collect().toMap
    assert(solved("alpha") == 1L && solved("beta") == 1L)
    val stats = UnigramLm.segmentCorpus(docs, vocabSize = 100)
      .select("doc_id", "fertility").as[(Long, Double)].collect().toMap
    assert(stats.values.forall(_ == 1.0))
  }
}
