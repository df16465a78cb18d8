package graft

import graft.operators.ClusterTopics
import org.apache.spark.sql.functions._

/** c-TF-IDF cluster topic labels (x55): separable corpora produce
  * separating labels, structural contracts hold, and the plan keeps the
  * model-sized frames on broadcast joins.
  */
class ClusterTopicsSpec extends SparkSpec {
  import spark.implicits._

  // two vocabulary-disjoint topics, several docs each — embeddings are
  // hashed TF-IDF, so disjoint vocabularies give near-orthogonal vectors
  // and any reasonable clustering separates them
  private def twoTopics = Seq(
    (0L, "football goal striker penalty referee football match"),
    (1L, "goal striker match referee stadium football"),
    (2L, "penalty stadium football striker goal referee"),
    (3L, "quantum electron photon particle physics quantum energy"),
    (4L, "electron particle energy photon physics quantum"),
    (5L, "photon physics quantum particle electron energy")
  ).toDF("doc_id", "text")

  test("vocabulary-disjoint topics land in distinct clusters with their own terms") {
    val out = ClusterTopics.clusterTopics(twoTopics, nCells = 2, iters = 3,
      topTerms = 3).collect()
    val byCell = out.groupBy(_.getAs[Int]("cell"))
    assert(byCell.size == 2, s"expected 2 populated cells, got ${byCell.size}")
    val sports = Set("football", "goal", "striker", "penalty", "referee",
      "stadium", "match")
    val physics = Set("quantum", "electron", "photon", "particle", "physics",
      "energy")
    // each cell's label terms must come from exactly one topic's vocabulary
    for ((cell, rows) <- byCell) {
      val terms = rows.map(_.getAs[String]("term")).toSet
      assert(terms.subsetOf(sports) || terms.subsetOf(physics),
        s"cell $cell mixes vocabularies: $terms")
    }
    // and the two cells must pick different topics
    val labelSets = byCell.values.map(_.map(_.getAs[String]("term")).toSet).toSeq
    assert(labelSets(0).intersect(labelSets(1)).isEmpty)
  }

  test("ranks are 1..topTerms per cell, scores descending, n_docs totals the corpus") {
    val out = ClusterTopics.clusterTopics(twoTopics, nCells = 2, iters = 3,
      topTerms = 3).collect()
    for ((_, rows) <- out.groupBy(_.getAs[Int]("cell"))) {
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length))
      val scores = sorted.map(_.getAs[Double]("ctfidf")).toSeq
      assert(scores == scores.sorted.reverse, s"scores not descending: $scores")
    }
    // each doc is in exactly one cell; n_docs is constant within a cell
    val nDocs = out.groupBy(_.getAs[Int]("cell"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("n_docs")).distinct match {
        case Array(n) => n
        case other => fail(s"n_docs varies within a cell: ${other.toSeq}")
      } }
    assert(nDocs.sum == 6L)
  }

  test("distinctive terms outrank corpus-wide terms within a cluster") {
    // "football" is concentrated in the sports cluster; a term spread
    // evenly across clusters would carry a smaller ln(1 + A/f_t) boost
    // relative to its in-cluster tf. Here all terms are concentrated, so
    // simply assert the rank-1 term has the cell's max tf·idf — i.e. the
    // scoring actually ordered by the claimed formula (anti-regression)
    val out = ClusterTopics.clusterTopics(twoTopics, nCells = 2, iters = 3,
      topTerms = 6).collect()
    for ((cell, rows) <- out.groupBy(_.getAs[Int]("cell"))) {
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      val top = sorted.head.getAs[Double]("ctfidf")
      assert(sorted.forall(_.getAs[Double]("ctfidf") <= top),
        s"cell $cell rank-1 term is not the max-score term")
    }
  }

  test("the full-corpus entry emits topTerms rows per populated cell") {
    val out = ClusterTopics.qClusterTopics(spark, sf0001).collect()
    assert(out.nonEmpty)
    for ((cell, rows) <- out.groupBy(_.getAs[Int]("cell")))
      assert(rows.length <= ClusterTopics.TopTerms,
        s"cell $cell has ${rows.length} rows")
  }

  test("plan: term aggregates join broadcast-side, no cartesian beyond the 1-row total") {
    val plan = ClusterTopics.qClusterTopics(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the only BroadcastNestedLoopJoin inputs allowed are 1-row builds
    // (the n_total frame and the centroid matrix) — same contract the
    // suite-wide PlanSpec sweep enforces
  }
}
