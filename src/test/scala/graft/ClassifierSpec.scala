package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** Hashed-feature logistic regression: the distillation task is actually
  * learned, training is deterministic across partitionings, and the output
  * contract holds.
  */
class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001)

  test("quality distillation beats the majority base rate") {
    val out = Classifier.qualityDistill(docs)
      .select("y", "pred").as[(Long, Long)].collect()
    assert(out.length == docs.count())
    val base = math.max(out.count(_._1 == 1L), out.count(_._1 == 0L)).toDouble / out.length
    val acc = out.count(r => r._1 == r._2).toDouble / out.length
    assert(acc > base + 0.1,
      s"classifier should clearly beat the $base majority rate, got $acc")
  }

  test("training is invariant to input partitioning (determinism contract)") {
    val labels = Classifier.lmLabels(docs).cache()
    val w3 = Classifier.train(docs.repartition(3), labels)
    val w11 = Classifier.train(docs.repartition(11), labels)
    assert(w3.toSeq == w11.toSeq,
      "8-dp-rounded weight updates must absorb partition-order float wobble")
    assert(w3.exists(_ != 0.0), "training must actually move the weights")
  }

  test("fused tree-aggregate gradient equals the relational two-shuffle path") {
    val labels = Classifier.lmLabels(docs).cache()
    val fused = Classifier.train(docs, labels)
    val relational = Classifier.trainShuffled(docs, labels)
    assert(fused.toSeq == relational.toSeq,
      "8-dp-rounded updates must make the fused partial-gradient sum and " +
        "the relational groupBy-bucket sum produce identical weights")
  }

  test("probabilities lie in (0,1) and the margin decides the prediction") {
    val rows = Classifier.qualityDistill(docs)
      .select("prob", "pred").as[(Double, Long)].collect()
    assert(rows.forall { case (p, _) => p > 0.0 && p < 1.0 })
    // away from the rounded 0.5 boundary, pred must agree with prob
    rows.filter { case (p, _) => math.abs(p - 0.5) > 1e-5 }.foreach {
      case (p, pred) => assert((p > 0.5) == (pred == 1L))
    }
  }

  test("zero-token documents still score via the bias feature") {
    val mixed = Seq((0L, "alpha beta gamma delta epsilon words enough here"),
      (1L, ""), (2L, "12 34 !!")).toDF("doc_id", "text")
    val labels = Seq((0L, 1.0), (1L, 0.0), (2L, 0.0)).toDF("doc_id", "y")
    val out = Classifier.classify(mixed, labels, Classifier.train(mixed, labels))
    assert(out.count() == 3, "token-less docs must not drop out of scoring")
  }
}
