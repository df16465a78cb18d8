package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002;
  * Beyer et al. 2007's unbiased estimator): hash every element uniformly,
  * keep each group's k smallest distinct hashes, estimate the distinct
  * count as (k−1)/u₍k₎ where u₍k₎ is the k-th minimum normalized to
  * (0,1). The demonstration groups are per-source distinct-*shingle*
  * counts — the statistic a dedup planner reads to size LSH band tables
  * and pick `maxShingleDf` caps per domain before running the expensive
  * passes.
  *
  * Why this sketch next to HLL (e5) and count-min (d16): KMV is the
  * mergeable bottom-k synopsis (union = k smallest of the unions — the
  * partial-aggregate shape Spark's shuffle already implements for
  * min-like aggregates), and unlike HLL its estimate is an exact
  * deterministic function of the input set, so the DuckDB oracle can
  * hash-check the *estimator itself*, not just rows.
  *
  * Scale shape: the sketch input is the suite-shared
  * [[Dedup.distinctShingleHashes]] subtree joined to the narrow
  * (doc_id, source) projection; the shuffle carries distinct
  * (source, h60) pairs — Zipf-compressed, 8-byte keys — and the
  * per-group bottom-k window ranks only within each source partition.
  * Groups are sources (bounded); elements are unbounded and never
  * collected.
  *
  * Determinism: md5-60 is the engine-portable hash; the estimate is a
  * ratio of exact integers rounded 4 dp, so both engines compute the
  * identical double.
  */
object Sketches {

  /** Sketch size: stderr ≈ 1/√(k−2) ≈ 6% at 256 — the visibility the
    * planner statistic needs at ~1/1000 of the storage of the exact set.
    */
  val DefaultK = 256

  /** `(source, n_distinct, n_kept, est_distinct, rel_err)` per source:
    * the exact distinct-shingle count (the oracle-checkable ground
    * truth the sketch replaces at scale), the kept bottom-k size, the
    * KMV estimate ((k−1)/u₍k₎, or exact when the group has fewer than k
    * elements), and the relative error of the rounded estimate.
    */
  def kmvShingleDistinct(docs: DataFrame, k: Int = DefaultK): DataFrame = {
    val pairs = sourceShingles(docs)
    val w = Window.partitionBy("source").orderBy(asc("h60"))
    val sketch = pairs.withColumn("r", row_number().over(w))
      .where(col("r") <= k)
      .groupBy("source").agg(count(lit(1)).as("n_kept"), max("h60").as("hk"))
    val exact = pairs.groupBy("source").agg(count(lit(1)).as("n_distinct"))
    sketch.join(exact, "source")
      .select(col("source"), col("n_distinct"), col("n_kept"),
        round(
          when(col("n_kept") < k, col("n_kept").cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              (col("hk").cast("double") / lit(1.152921504606846976e18))),
          4).as("est_distinct"))
      .select(col("source"), col("n_distinct"), col("n_kept"),
        col("est_distinct"),
        round(abs(col("est_distinct") - col("n_distinct").cast("double")) /
          col("n_distinct").cast("double"), 4).as("rel_err"))
  }

  /** Per-(source, shingle-hash) distinct pairs — the shared input of the
    * KMV sketch and the overlap matrix.
    */
  private def sourceShingles(docs: DataFrame): DataFrame =
    // shared-cached (r14): x56 reads it twice (sketch + exact arm), x58
    // three times (sizes + both self-join sides) — one build per corpus
    graft.operators.Caches.shared(Dedup.distinctShingleHashes(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select(col("source"), col("h60")).distinct())

  /** Cross-source content-overlap matrix: for every source pair that
    * shares at least one shingle, the intersection size, Jaccard, and
    * containment (|∩|/min) over the two sources' distinct-shingle sets —
    * the "which domains duplicate each other" statistic a curation team
    * reads before setting mixing weights (a mirror site shows up as
    * containment ≈ 1 long before per-document dedup finds it).
    *
    * Scale shape: the self-join is an equi-join on the shingle hash — a
    * shingle shared by s sources contributes s(s−1)/2 candidate rows, so
    * cost is bounded by sources-per-shingle (domain count), never
    * documents²; the output is at most |sources|²/2 rows. The
    * [[Dedup.distinctShingleHashes]] subtree is the same cached frame the
    * dedup family and x56 consume.
    */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    val pairs = sourceShingles(docs)
    val sizes = pairs.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = pairs.select(col("source").as("src1"), col("h60"))
      .join(pairs.select(col("source").as("src2"), col("h60")), "h60")
      .where(col("src1") < col("src2"))
      .groupBy("src1", "src2").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("source").as("src1"), col("n").as("n1")), "src1")
      .join(sizes.select(col("source").as("src2"), col("n").as("n2")), "src2")
      .select(col("src1"), col("src2"), col("n1"), col("n2"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("n1") + col("n2") - col("n_common")).cast("double"), 6)
          .as("jaccard"),
        round(col("n_common").cast("double") /
          least(col("n1"), col("n2")).cast("double"), 6).as("containment"))
  }

  /** Corpus novelty curve (x67) — the Heaps'-law statistic behind "is the
    * next crawl shard still adding information?": documents are read in
    * id-order shards of `shardWidth`, and each shard reports how many
    * distinct shingles it contains, how many of those are NOVEL (first
    * seen in that shard), the novelty rate, and the cumulative distinct
    * count through that shard. A flattening novel-count column is the
    * empirical signal to stop ingesting a source (or raise its dedup
    * aggressiveness) before paying to process it.
    *
    * Scale shape: two aggregations over the suite-shared
    * [[Dedup.distinctShingleHashes]] frame — per-shard distinct counts,
    * and first-seen = min(shard) per shingle hash grouped by that minimum.
    * Both shuffle 8-byte hash keys (Zipf-compressed, never text); the
    * cumulative sum is a window over the tiny per-shard frame. No step is
    * ever quadratic, and at 100 TB both aggregates are the same map-side
    * partial-combine shape as a word count.
    */
  def noveltyCurve(docs: DataFrame, shardWidth: Long = 50L): DataFrame = {
    // NOT shared-cached (r15, measured): both aggregations below consume
    // this frame, but materializing the shingle-scale (shard, h60) rows
    // costs more than the two map-side aggs it would save — x67 read
    // 0.82 s warm re-deriving from the already-cached shingle frame vs
    // 1.04 s through a cache of this subtree
    val sh = Dedup.distinctShingleHashes(docs)
      .select(expr(s"doc_id div ${shardWidth}L").as("shard"), col("h60"))
      .distinct()
    val perShard = sh.groupBy("shard").agg(count(lit(1)).as("n_distinct"))
    val novel = sh.groupBy("h60").agg(min("shard").as("shard"))
      .groupBy("shard").agg(count(lit(1)).as("n_novel"))
    val byShard = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perShard.join(novel, Seq("shard"), "left")
      .select(col("shard"), col("n_distinct"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_rate",
        round(col("n_novel").cast("double") / col("n_distinct"), 6))
      .withColumn("cum_distinct", sum("n_novel").over(byShard))
  }

  /** Per-source distribution drift (x69): KL(source ‖ corpus) over the
    * unigram token distributions — the domain-shift audit read next to
    * [[sourceOverlap]] when setting mixing weights: overlap says how much
    * *content* two sources share, drift says how far each source's
    * *language* sits from the corpus mixture (a code dump in a prose
    * corpus scores high drift even with zero shared shingles). KL is
    * finite without smoothing because every source term is, by
    * construction, in the corpus distribution.
    *
    * Scale shape: per-(source, token) sums ride the same map-side
    * partial-combine as a word count; the corpus marginal derives from
    * that frame (never a second text scan); the final reduce is one
    * aggregate over Zipf-compressed (source, token) rows. Determinism:
    * both engines evaluate the identical double expression per term, and
    * the 6-dp rounding boundary sits ~7 orders above float-sum
    * partition-order wobble (the x25/x59 argument).
    */
  def sourceDrift(docs: DataFrame): DataFrame = {
    // shared-cached (r14): consumed three times below (marginals + the
    // scoring join), and x81's Zipf fit aggregates the canonically equal
    // subtree (alias names are ignored by plan canonicalization)
    val st = graft.operators.Caches.shared(Relevance.termCounts(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source", "token").agg(sum("cnt").as("scnt")))
    val srcTot = st.groupBy("source")
      .agg(sum("scnt").as("stot"), count(lit(1)).as("n_types"))
    val corpus = st.groupBy("token").agg(sum("scnt").as("ccnt"))
    val corpTot = corpus.agg(sum("ccnt").as("ctot"))
    val ps = col("scnt").cast("double") / col("stot")
    val pc = col("ccnt").cast("double") / col("ctot")
    st.join(corpus, "token")
      .join(srcTot, "source")
      .crossJoin(broadcast(corpTot))
      .groupBy("source", "stot", "n_types")
      .agg(round(sum(ps * log(ps / pc)), 6).as("kl_vs_corpus"))
      .select(col("source"), col("stot").as("n_tokens"), col("n_types"),
        col("kl_vs_corpus"))
  }

  /** Per-source term-frequency Zipf fit (x81) — the vocabulary statistic
    * beside [[sourceDrift]]'s KL and x71's family-size fit: for each
    * source, type/token counts, the Clauset–Shalizi–Newman power-law
    * exponent over its term-frequency distribution (α̂ = 1 + n/Σln(cᵢ/½)),
    * and the head share (top term's fraction of tokens). Natural text
    * sits near α ≈ 2; a flat α or a bloated head flags templated or
    * machine-generated domains before any model ever reads them.
    */
  def termZipf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same shared (source, token) sum frame as [[sourceDrift]]
    val st = graft.operators.Caches.shared(Relevance.termCounts(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source", "token").agg(sum("cnt").as("c")))
    val top = Window.partitionBy("source").orderBy(desc("c"), asc("token"))
    st.withColumn("rk", row_number().over(top))
      .groupBy("source")
      .agg(count(lit(1)).as("n_types"), sum("c").as("n_tokens"),
        round(lit(1.0) + count(lit(1)).cast("double") /
          sum(log(col("c").cast("double") / lit(0.5))), 6).as("alpha_mle"),
        round(max(when(col("rk") === 1, col("c"))).cast("double") /
          sum("c"), 6).as("top_share"))
  }

  def qTermZipf(spark: SparkSession, sfDir: String): DataFrame =
    termZipf(Tables.documents(spark, sfDir))

  // --- query entries ---

  def qKmvShingleDistinct(spark: SparkSession, sfDir: String): DataFrame =
    kmvShingleDistinct(Tables.documents(spark, sfDir))

  def qSourceOverlap(spark: SparkSession, sfDir: String): DataFrame =
    sourceOverlap(Tables.documents(spark, sfDir))

  def qNoveltyCurve(spark: SparkSession, sfDir: String): DataFrame =
    noveltyCurve(Tables.documents(spark, sfDir))

  def qSourceDrift(spark: SparkSession, sfDir: String): DataFrame =
    sourceDrift(Tables.documents(spark, sfDir))
}
