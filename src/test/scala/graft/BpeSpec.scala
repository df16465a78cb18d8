package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge learning: the classic Sennrich corpus produces the textbook
  * merge sequence, segmentation with the learned table reproduces it on
  * unseen words, and training is partitioning-invariant (the determinism
  * contract the oracle relies on).
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // the worked example from Sennrich, Haddow & Birch 2016 §3.2:
  // low×5 lower×2 newest×6 widest×3
  private lazy val corpus = Seq((0L,
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
     Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
    .toDF("doc_id", "text")

  test("learns the textbook merge sequence on the Sennrich corpus") {
    val merges = Bpe.learnMerges(corpus, numMerges = 5)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(merges.toSeq == Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "est", Bpe.Eow, 9L),
      (4L, "l", "o", 7L),
      (5L, "lo", "w", 7L)))
  }

  test("segment applies learned merges to unseen words") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", Bpe.Eow),
                     ("l", "o"), ("lo", "w"))
    val out = Bpe.segment(Seq("lowest", "low", "newer").toDF("word"), merges)
      .as[(String, Seq[String])].collect().toMap
    // "lowest" was never a training word; its pieces compose from merges
    assert(out("lowest") == Seq("low", "est" + Bpe.Eow))
    assert(out("low") == Seq("low", Bpe.Eow))
    assert(out("newer") == Seq("n", "e", "w", "e", "r", Bpe.Eow))
  }

  test("merges are anchored to whole symbols, never substring boundaries") {
    // state "th  e": merge (h, e) must NOT fire — 'h' is only a suffix of
    // the preceding symbol "th". An unanchored replace would fuse "the"
    // and corrupt the merge table (the (t,h)-then-(h,e) order is a typical
    // English merge sequence). Same for (s, t) against "b  es  t".
    val words = Seq("the", "best").toDF("word")
    val out = Bpe.segment(words, Seq(("t", "h"), ("h", "e"), ("e", "s"), ("s", "t")))
      .as[(String, Seq[String])].collect().toMap
    // "the": (t,h) → "th  e"; (h,e) anchored → no fire; rest no-ops
    assert(out("the") == Seq("th", "e", Bpe.Eow), s"got ${out("the")}")
    // "best": (e,s) → "b  es  t"; (s,t) anchored → no fire
    assert(out("best") == Seq("b", "es", "t", Bpe.Eow), s"got ${out("best")}")
    // overlapping runs stay greedy left-to-right non-overlapping
    val aa = Bpe.segment(Seq("aaa").toDF("word"), Seq(("a", "a")))
      .as[(String, Seq[String])].collect().toMap
    assert(aa("aaa") == Seq("aa", "a", Bpe.Eow), s"got ${aa("aaa")}")
    // merge symbols with SQL metacharacters are data, not syntax
    val quoted = Bpe.segment(Seq("it's").toDF("word"), Seq(("'", "s")))
      .as[(String, Seq[String])].collect().toMap
    assert(quoted("it's") == Seq("i", "t", "'s", Bpe.Eow), s"got ${quoted("it's")}")
  }

  test("segmentCorpus: counts reconcile and fertility is subwords per word") {
    val docs = Seq(
      (1L, "lowest newest lower widest newest"),
      (2L, "low low newest")).toDF("doc_id", "text")
    val out = Bpe.segmentCorpus(docs, numMerges = 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 5L), (2L, 3L)),
      "every (non-stopword) token must survive the vocab join")
    out.foreach { case (_, nWords, nSub, fert) =>
      assert(nSub >= nWords, "each word is at least one piece")
      assert(math.abs(fert - BigDecimal(nSub.toDouble / nWords)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // a fully-merged frequent word costs fewer pieces than a rare one:
    // doc 2 is low/newest-heavy (both learned), so its fertility can never
    // exceed the character-level bound
    assert(out.forall(_._4 <= 7.0))
  }

  test("training is invariant to input partitioning") {
    val docs = Tables.documents(spark, sf0001)
    val m1 = Bpe.learnMerges(docs.repartition(3), numMerges = 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    val m2 = Bpe.learnMerges(docs.repartition(11), numMerges = 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(m1 == m2)
    assert(m1.size == 4)
  }
}
