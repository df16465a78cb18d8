package graft

import graft.functions.TopKWords
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitter aggregate: exact when capacity covers the
  * vocabulary, bounded undercount when it doesn't, merge-safe across
  * partitions.
  */
class TopKWordsSpec extends SparkSpec {

  import spark.implicits._

  private def wordsDf(ws: Seq[String], parts: Int) =
    spark.createDataset(ws).repartition(parts).toDF("word")

  private def sketch(ws: Seq[String], k: Int, capacity: Int, parts: Int = 8) =
    wordsDf(ws, parts)
      .agg(TopKWords.topKWords(col("word"), k, capacity).as("tops"))
      .select(explode(col("tops")).as("t"))
      .select(col("t.word"), col("t.cnt"))
      .as[(String, Long)]
      .collect()
      .toSeq

  private val corpus: Seq[String] =
    Seq.fill(50)("alpha") ++ Seq.fill(30)("beta") ++ Seq.fill(20)("gamma") ++
      (1 to 15).map(i => s"rare$i")

  test("exact top-k when capacity covers the vocabulary") {
    val got = sketch(corpus, k = 3, capacity = 1024)
    assert(got == Seq(("alpha", 50L), ("beta", 30L), ("gamma", 20L)))
  }

  test("partition merge is count-exact (same answer at 1 and 8 partitions)") {
    assert(sketch(corpus, 5, 1024, parts = 1) == sketch(corpus, 5, 1024, parts = 8))
  }

  test("undercount bounded by n/(capacity+1) and heavy hitters survive") {
    val capacity = 8
    val n = corpus.size.toLong
    val got = sketch(corpus, k = capacity, capacity = capacity, parts = 4).toMap
    val bound = n / (capacity + 1) + 1
    // the three heavy hitters (true counts 50/30/20 >> bound) must survive
    assert(Set("alpha", "beta", "gamma").subsetOf(got.keySet))
    val truth = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (w, c) =>
      assert(c <= truth(w), s"$w overcounted: $c > ${truth(w)}")
      assert(truth(w) - c <= bound, s"$w undercount ${truth(w) - c} exceeds $bound")
    }
  }

  test("ties broken by word order and k truncates") {
    val got = sketch(Seq("b", "b", "a", "a", "c"), k = 2, capacity = 16)
    assert(got == Seq(("a", 2L), ("b", 2L)))
  }
}
