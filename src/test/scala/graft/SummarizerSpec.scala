package graft

import graft.operators.Summarizer

/** Summarizer invariants (tests/test_summarizer.py, FIXTURES.md §4). */
class SummarizerSpec extends SparkSpec {

  val longText: String = sampleTexts.take(4).mkString(". ") + "."

  test("sentence split drops <3-word sentences (tests/test_summarizer.py:25-32)") {
    val s = Summarizer.splitSentences("Hi there. This one has five words okay. No! Short bit here too.")
    assert(s.toSeq == Seq("This one has five words okay", "Short bit here too"))
  }

  test("short text returns all sentences (tests/test_summarizer.py:72-79)") {
    val text = "One sentence with words here. Another sentence with words there."
    assert(Summarizer.summarize(text, 3) ==
      "One sentence with words here Another sentence with words there")
  }

  test("similarity matrix symmetric with zero diagonal (tests/test_summarizer.py:58-70)") {
    val m = Summarizer.similarityMatrix(Summarizer.splitSentences(longText))
    val n = m.length
    for (i <- 0 until n) {
      assert(m(i)(i) == 0.0)
      for (j <- 0 until n) assert(m(i)(j) == m(j)(i))
    }
  }

  test("sentence similarity: identical→1, disjoint→0 (tests/test_summarizer.py:44-56)") {
    assert(math.abs(Summarizer.sentenceSimilarity(
      "machine learning rocks greatly", "machine learning rocks greatly") - 1.0) < 1e-9)
    assert(Summarizer.sentenceSimilarity(
      "apple banana cherry fruit", "keyboard mouse monitor screen") == 0.0)
  }

  test("textrank scores positive, bounded below by (1-d)/n") {
    val sentences = Summarizer.splitSentences(longText)
    val scores = Summarizer.textrank(Summarizer.similarityMatrix(sentences))
    assert(scores.length == sentences.length)
    assert(scores.forall(s => s >= (1 - Summarizer.Damping) / sentences.length - 1e-12))
  }

  test("summary selects requested count, in document order") {
    val s = Summarizer.summarize(longText, 2)
    val sentences = Summarizer.splitSentences(longText)
    val chosen = sentences.filter(s.contains)
    assert(chosen.length == 2)
    assert(s == chosen.mkString(" ")) // document order preserved
  }

  test("key sentences above threshold are descending by score") {
    val ks = Summarizer.keySentences(longText, 0.3)
    assert(ks.nonEmpty)
  }

  test("fixpoint scores land exactly on the 10-decimal grid") {
    // engine reproducibility rests on every iteration emitting scores
    // already rounded to 10 decimals, so the oracle's round(…, 10) sees
    // identical values; verify the final vector is a fixed point of round10
    val sentences = Summarizer.splitSentences(longText)
    val scores = Summarizer.textrank(Summarizer.similarityMatrix(sentences))
    scores.foreach { s =>
      val r = BigDecimal(s).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r == s, s"score $s not on the 10-dp grid")
    }
  }

  test("sentencesDf matches driver-side splitSentences on every doc") {
    val got = Summarizer.sentencesDf(sampleDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    sampleTexts.zipWithIndex.foreach { case (t, i) =>
      val want = Summarizer.splitSentences(t).toSeq
      assert(got.getOrElse(i.toLong, Seq.empty) == want, s"doc $i")
    }
  }

  test("sentenceSimilaritiesDf matches driver-side sentenceSimilarity") {
    import spark.implicits._
    val docs = Seq((0L, longText), (1L, sampleTexts.head)).toDF("doc_id", "text")
    val got = Summarizer.sentenceSimilaritiesDf(docs)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
    val sents = Summarizer.splitSentences(longText)
    for (i <- sents.indices; j <- sents.indices if i < j) {
      val want = Summarizer.sentenceSimilarity(sents(i), sents(j))
      val key = (0L, i + 1L, j + 1L)
      if (want > 0)
        assert(math.abs(got(key) - want) < 1e-6, s"pair $key")
      else
        assert(!got.contains(key), s"zero pair $key materialized")
    }
  }
}
