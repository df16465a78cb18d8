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
