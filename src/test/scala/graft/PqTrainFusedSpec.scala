package graft

import graft.operators.VectorSearch
import org.apache.spark.sql.functions._

/** The fused single-pass PQ trainer must reproduce the per-subspace Lloyd
  * chains exactly: same init (the k lowest vec_ids, sliced), same per-cell
  * 6-dp HALF_UP rounding per iteration, same empty-cell carry-over. The
  * per-subspace form ([[VectorSearch.pqTrainPerSubspace]]) is the retained
  * reference; x50/x51/x52/x83/x88's oracles re-derive the same chains in
  * DuckDB, so a divergence here would also be an oracle failure — this
  * spec just localizes it.
  */
class PqTrainFusedSpec extends SparkSpec {

  test("fused pqTrain equals the per-subspace chains on the embeddings fixture") {
    val emb = Tables.embeddings(spark, sf0001)
    val (sdF, fused) = VectorSearch.pqTrain(emb, m = 4, k = 16, iters = 3)
    val (sdR, ref) = VectorSearch.pqTrainPerSubspace(emb, m = 4, k = 16, iters = 3)
    assert(sdF == sdR)
    assert(fused == ref)
  }

  test("fused pqTrain handles empty cells and duplicate vectors like the reference") {
    import spark.implicits._
    // 6 vectors of dim 4 (m=2 -> subDim 2); duplicates force empty cells at
    // k=4 (only 3 distinct points), exercising the keep-old-centroid path
    val rows = Seq(
      (0L, Array(0.0f, 0.0f, 1.0f, 1.0f)),
      (1L, Array(0.0f, 0.0f, 1.0f, 1.0f)),
      (2L, Array(5.0f, 5.0f, -1.0f, 2.0f)),
      (3L, Array(5.0f, 5.0f, -1.0f, 2.0f)),
      (4L, Array(9.0f, 1.0f, 3.0f, 3.0f)),
      (5L, Array(9.0f, 1.0f, 3.0f, 3.0f)))
    val emb = rows.toDF("vec_id", "embedding").withColumn("label", lit("t"))
    val (sdF, fused) = VectorSearch.pqTrain(emb, m = 2, k = 4, iters = 4)
    val (sdR, ref) = VectorSearch.pqTrainPerSubspace(emb, m = 2, k = 4, iters = 4)
    assert(sdF == sdR)
    assert(fused == ref)
  }

  test("fused pqTrain with fewer vectors than k yields the short codebook of the reference") {
    import spark.implicits._
    // n=3 < k=5: the init collect returns a short codebook; the fused
    // decode must unflatten (subspace, cell) by the ACTUAL codebook size
    val rows = Seq(
      (0L, Array(0.0f, 0.0f, 1.0f, 1.0f)),
      (1L, Array(5.0f, 5.0f, -1.0f, 2.0f)),
      (2L, Array(9.0f, 1.0f, 3.0f, 3.0f)))
    val emb = rows.toDF("vec_id", "embedding").withColumn("label", lit("t"))
    val (sdF, fused) = VectorSearch.pqTrain(emb, m = 2, k = 5, iters = 3)
    val (sdR, ref) = VectorSearch.pqTrainPerSubspace(emb, m = 2, k = 5, iters = 3)
    assert(sdF == sdR)
    assert(fused.map(_.length) == Seq(3, 3))
    assert(fused == ref)
  }

  test("fused pqTrain fails fast on the driver for an empty corpus") {
    import spark.implicits._
    val emb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
      .withColumn("label", lit("t"))
    val e = intercept[IllegalArgumentException] {
      VectorSearch.pqTrain(emb, m = 2, k = 4, iters = 2)
    }
    assert(e.getMessage.contains("empty"))
  }
}
