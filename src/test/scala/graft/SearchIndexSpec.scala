package graft

import graft.operators.{CorpusPrep, SearchIndex, TextQuality}
import org.apache.spark.sql.functions._

class SearchIndexSpec extends SparkSpec {
  import spark.implicits._

  test("phrase search finds consecutive-token phrases, not bags of words") {
    val hits = SearchIndex.phraseSearch(sampleDocs, Seq("machine", "learning"))
      .as[(Long, Long)].collect().toMap
    // docs 0 and 5 (the exact duplicate) contain "machine learning" once;
    // doc 1's "deep learning" must not match
    assert(hits == Map(0L -> 1L, 5L -> 1L))
  }

  test("phrase positions are in the stopword-filtered stream") {
    // "learning is a subset" tokenizes to [... learning, subset ...], so
    // the phrase [learning, subset] matches across the dropped stopwords —
    // standard stop-worded index semantics
    val hits = SearchIndex.phraseSearch(sampleDocs, Seq("learning", "subset"))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(0L -> 1L, 5L -> 1L))
  }

  test("phrase search counts repeated occurrences and ranks by count") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta delta"),
      (2L, "alpha beta epsilon"),
      (3L, "beta alpha")).toDF("doc_id", "text")
    val hits = SearchIndex.phraseSearch(docs, Seq("alpha", "beta"))
      .as[(Long, Long)].collect()
    assert(hits.toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("trigram phrase joins all three positions") {
    val hits = SearchIndex
      .phraseSearch(sampleDocs, Seq("machine", "learning", "subset"))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(0L -> 1L, 5L -> 1L))
  }

  test("weighted sample is deterministic, bounded, and excludes weight<=0") {
    val docs = (1L to 50L).map(i => (i, if (i <= 5) 0L else i))
      .toDF("doc_id", "n_chars")
    val s1 = CorpusPrep.weightedSample(docs, n = 20).collect()
    val s2 = CorpusPrep.weightedSample(docs, n = 20).collect()
    assert(s1.toSeq == s2.toSeq, "same salt must reproduce the same sample")
    assert(s1.length == 20)
    assert(s1.map(_.getLong(0)).toSeq == (1L to 20L), "ranks are 1..n")
    assert(s1.forall(_.getLong(2) > 0), "zero-weight rows never sampled")
  }

  test("weighted sample favors heavy weights") {
    // 100 docs at weight 1000 vs 100 at weight 1: a light doc outranks a
    // heavy one only with probability ~1e-3 per pair, so with the fixed
    // salt the 50-sample is (deterministically) dominated by heavy docs
    val docs = (1L to 200L).map(i => (i, if (i <= 100) 1000L else 1L))
      .toDF("doc_id", "n_chars")
    val sample = CorpusPrep.weightedSample(docs, n = 50).collect()
    val heavy = sample.count(_.getLong(1) <= 100)
    assert(heavy >= 45, s"expected heavy-weight dominance, got $heavy/50")
  }

  test("bigram LM: duplicates score equal; repetition is penalized") {
    val scored = TextQuality.bigramLogprob(sampleDocs)
      .select("doc_id", "n_bigrams", "mean_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // exact duplicate docs 0 and 5 must score identically
    assert(scored(0L) == scored(5L))
    // every score is a mean of ln(p<1) terms
    assert(scored.values.forall(_._2 < 0))

    // a document of one repeated rare token pays for its self-transitions:
    // it scores below a document that follows the corpus's common pattern
    val docs = (Seq(
      (100L, "alpha beta gamma delta"),
      (101L, "alpha beta gamma delta"),
      (102L, "zzzz zzzz zzzz zzzz zzzz")) ++
      (1L to 20L).map(i => (200L + i, "alpha beta gamma delta")))
      .toDF("doc_id", "text")
    val s = TextQuality.bigramLogprob(docs)
      .select("doc_id", "mean_logprob").as[(Long, Double)].collect().toMap
    assert(s(100L) > s(102L),
      "corpus-pattern doc must outscore the repeated-rare-token doc")
  }

  test("bigram count is tokens-1 for docs with >=2 tokens; short docs drop") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha"), (3L, ""))
      .toDF("doc_id", "text")
    val rows = TextQuality.bigramLogprob(docs)
      .select("doc_id", "n_bigrams").as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 2L))
  }
}
