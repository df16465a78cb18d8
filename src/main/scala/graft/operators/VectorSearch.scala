package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CosineSimilarityExpr.cosineSim

/** Similarity search over the embeddings table (SURVEY.md §2.9 N18, N30–N31
  * plus the beyond-reference ANN pack): brute-force cosine top-k as the
  * exact baseline, and a random-hyperplane LSH-bucketed variant as the
  * scale path.
  *
  * The cosine is pure `zip_with`/`aggregate` column algebra on
  * double-widened arrays (bit-deterministic left-to-right summation — same
  * result in any engine), no UDF. The query vector rides a broadcast 1-row
  * cross join, so the scan side streams once with no shuffle; top-k is
  * TakeOrderedAndProject.
  */
object VectorSearch {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact brute-force cosine top-k against one stored vector. */
  def annTopK(embeddings: DataFrame, queryVecId: Long, k: Int = 10): DataFrame = {
    val q = embeddings.where(col("vec_id") === queryVecId)
      .select(asDouble(col("embedding")).as("qvec"))
    embeddings
      .where(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosineSim(asDouble(col("embedding")), col("qvec")), 6).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  /** All-pairs cosine ≥ threshold (embedding near-duplicate detection).
    * Brute force — correct at any density; at corpus scale use [[annLsh]]
    * buckets or MinHash-LSH on discretized vectors instead.
    */
  def nearDuplicatePairs(embeddings: DataFrame, threshold: Double = 0.45): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id1"), asDouble(col("embedding")).as("v1"))
    val b = embeddings.select(col("vec_id").as("id2"), asDouble(col("embedding")).as("v2"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(cosineSim(col("v1"), col("v2")), 6).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Deterministic pseudo-random hyperplanes for LSH bucketing: `nPlanes`
    * sign bits of projections onto LCG-generated vectors. At cluster scale
    * the bucket id becomes the shuffle key: only vectors agreeing on all
    * sign bits meet, cutting the candidate set ~2^nPlanes-fold.
    */
  def hyperplanes(dim: Int, nPlanes: Int = 8, seed: Long = 42L): Seq[Seq[Double]] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }

  /** LSH-bucketed ANN: same top-k contract as [[annTopK]] but the scan is
    * restricted to the query's hyperplane bucket. Approximate — documents
    * on the far side of any plane are not considered.
    */
  def annLshTopK(embeddings: DataFrame, queryVecId: Long, k: Int = 10,
                 dim: Int = 64, nPlanes: Int = 8): DataFrame = {
    val planes = hyperplanes(dim, nPlanes)
    def bucketOf(vec: Column): Column =
      planes.zipWithIndex.map { case (p, i) =>
        val dot = aggregate(
          zip_with(vec, lit(p.toArray), (x, w) => x * w), lit(0.0d), (acc, x) => acc + x)
        when(dot >= 0, shiftleft(lit(1L), i)).otherwise(0L)
      }.reduce(_.bitwiseOR(_))
    val withBucket = embeddings
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", bucketOf(col("v")))
    val q = withBucket.where(col("vec_id") === queryVecId)
      .select(col("v").as("qvec"), col("bucket").as("qbucket"))
    withBucket
      .join(broadcast(q), col("bucket") === col("qbucket") && col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("label"),
        round(cosineSim(col("v"), col("qvec")), 6).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  /** Per-label centroid vectors (the aggregation side of IVF: coarse
    * clusters for probe-restricted search). `array<double>` average via
    * posexplode + groupBy on (label, dim).
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(asDouble(col("embedding"))))
      .toDF("label", "dim", "x")
      .groupBy("label", "dim")
      .agg(avg("x").as("cx"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("cx")))).as("pairs"))
      .select(col("label"), transform(col("pairs"), p => p("cx")).as("centroid"))

  // --- query entries ---

  def qAnnTopK(spark: SparkSession, sfDir: String): DataFrame =
    annTopK(Tables.embeddings(spark, sfDir), queryVecId = 0L)

  def qEmbNearDups(spark: SparkSession, sfDir: String): DataFrame =
    nearDuplicatePairs(Tables.embeddings(spark, sfDir))

  def qAnnLsh(spark: SparkSession, sfDir: String): DataFrame =
    annLshTopK(Tables.embeddings(spark, sfDir), queryVecId = 0L)

  def qLabelCentroidNorms(spark: SparkSession, sfDir: String): DataFrame =
    labelCentroids(Tables.embeddings(spark, sfDir))
      .select(col("label"),
        round(sqrt(aggregate(transform(col("centroid"), x => x * x),
          lit(0.0d), (acc, x) => acc + x)), 6).as("centroid_norm"))
}
