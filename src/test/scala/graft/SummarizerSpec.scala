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
}
