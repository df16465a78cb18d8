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

  test("interpolated bigram LM equals an independently-computed reference") {
    // plain-Scala replica of the absolute-discounting formula over a micro
    // corpus — catches marginal/continuation/backoff defects
    val texts = Seq(
      (0L, "alpha beta gamma alpha beta"),
      (1L, "alpha beta alpha gamma gamma"),
      (2L, "beta gamma alpha beta gamma"))
    val d = 0.75
    val toks = texts.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val bg = toks.view.mapValues(t => t.zip(t.drop(1))).toMap
    val docCnt = bg.view.mapValues(_.groupBy(identity).view.mapValues(_.size).toMap).toMap
    val bim = bg.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val cxt = bim.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1p = bim.groupBy(_._1._1).view.mapValues(_.size).toMap
    val uni = toks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val nTot = uni.values.sum.toDouble
    def p(w1: String, w2: String): Double =
      math.max(bim((w1, w2)) - d, 0.0) / cxt(w1) +
        d * n1p(w1) / cxt(w1) * (uni(w2) * 1.0 / nTot)
    val expected = docCnt.map { case (id, m) =>
      val num = m.map { case ((w1, w2), c) => c * math.log(p(w1, w2)) }.sum
      id -> BigDecimal(num / m.values.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val actual = TextQuality.interpBigramLogprob(texts.toDF("doc_id", "text"))
      .select("doc_id", "mean_logprob").as[(Long, Double)].collect().toMap
    for ((id, e) <- expected)
      assert(math.abs(actual(id) - e) < 2e-6, s"doc $id: ${actual(id)} vs $e")
    // context-conditional mass is exactly conserved: for every context,
    // sum_w2 p(w2|w1) over the FULL vocabulary must be 1 (the discounted
    // seen mass plus the redistributed delta*N1+/cxt)
    for (w1 <- cxt.keys) {
      val mass = uni.keys.map(w2 =>
        bim.get((w1, w2)).map(c => math.max(c - d, 0.0) / cxt(w1)).getOrElse(0.0) +
          d * n1p(w1) / cxt(w1) * (uni(w2) * 1.0 / nTot)).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"context $w1 mass $mass != 1")
    }
  }

  test("interpolated LM never pays the add-one floor for seen-context events") {
    // the add-one x43 score of a common transition degrades with vocab
    // size; absolute discounting doesn't — on the same corpus the
    // interpolated model assigns the frequent transition strictly more
    // probability mass, so the corpus-pattern doc scores higher under x59
    // than under x43
    val docs = ((1L to 20L).map(i => (i, "alpha beta gamma delta")) ++
      Seq((100L, "alpha beta gamma delta"))).toDF("doc_id", "text")
    val addOne = TextQuality.bigramLogprob(docs)
      .select("doc_id", "mean_logprob").as[(Long, Double)].collect().toMap
    val interp = TextQuality.interpBigramLogprob(docs)
      .select("doc_id", "mean_logprob").as[(Long, Double)].collect().toMap
    assert(interp(100L) > addOne(100L),
      s"interp ${interp(100L)} should exceed add-one ${addOne(100L)}")
  }

  test("bigram count is tokens-1 for docs with >=2 tokens; short docs drop") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha"), (3L, ""))
      .toDF("doc_id", "text")
    val rows = TextQuality.bigramLogprob(docs)
      .select("doc_id", "n_bigrams").as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 2L))
  }
}
