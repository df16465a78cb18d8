package graft

import graft.operators.Wordpiece
import org.apache.spark.sql.functions._

/** WordPiece trainer/tokenizer invariants: vocabulary completeness, greedy
  * longest-match parity with an in-JVM reference, and fertility bounds.
  */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def referenceSegment(word: String, vocab: Set[String],
                               maxLen: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      var l = math.min(maxLen, word.length - pos)
      while (l > 1 && !vocab.contains(word.substring(pos, pos + l))) l -= 1
      out += word.substring(pos, pos + l)
      pos += l
    }
    out.toSeq
  }

  test("piece vocab: every character of the corpus is present, and the " +
       "top rows rank by (freq desc, piece)") {
    val vocab = Wordpiece.pieceVocab(sampleDocs, vocabSize = 50)
      .select("piece", "freq", "in_top").as[(String, Long, Boolean)].collect()
    val pieces = vocab.map(_._1).toSet
    val corpusChars = sampleDocs.select(explode(graft.functions.TextFns.tokens(col("text"))))
      .as[String].collect().flatMap(_.toSeq).map(_.toString).toSet
    assert(corpusChars.subsetOf(pieces))
    val top = vocab.filter(_._3).sortBy(t => (-t._2, t._1)).map(_._1).toSeq
    assert(top.size == 50 && vocab.map(_._1).distinct.length == vocab.length)
  }

  test("greedy segmentation matches the in-JVM reference on every vocab word") {
    val vocabSet = Wordpiece.pieceVocab(sampleDocs, vocabSize = 50)
      .select("piece").as[String].collect().toSet
    val seg = Wordpiece.segmentWords(sampleDocs, vocabSize = 50)
      .select("word", "pieces").as[(String, Seq[String])].collect()
    assert(seg.nonEmpty)
    seg.foreach { case (w, pieces) =>
      assert(pieces == referenceSegment(w, vocabSet, Wordpiece.MaxPieceLen),
        s"greedy mismatch for '$w': got $pieces")
      assert(pieces.mkString == w) // pieces partition the word exactly
      assert(pieces.forall(vocabSet.contains))
    }
  }

  test("fertility: a vocabulary holding every whole word gives 1.0; a " +
       "char-only vocabulary gives mean word length") {
    val docs = Seq((0L, "alpha beta alpha"), (1L, "beta gamma")).toDF("doc_id", "text")
    val rich = Wordpiece.segmentCorpus(docs, vocabSize = 1000)
      .select("doc_id", "fertility").as[(Long, Double)].collect().toMap
    assert(rich.values.forall(_ == 1.0))
    val charOnly = Wordpiece.segmentCorpus(docs, vocabSize = 0)
      .select("doc_id", "n_words", "n_subwords").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // doc 0: alpha(5) beta(4) alpha(5) = 14 chars over 3 words
    assert(charOnly.head == ((0L, 3L, 14L)))
  }
}
