package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines — the steps
  * between "clean documents" and "token stream on disk":
  *
  *  - benchmark decontamination: drop/flag corpus documents that share
  *    token n-grams with an evaluation set (the standard 13-gram overlap
  *    check, parameterized). The eval side is tiny next to the corpus, so
  *    its distinct n-gram hashes broadcast — the corpus side is one scan
  *    plus a partial aggregate, no corpus-sized shuffle on text;
  *  - deterministic train/validation/test split: a salted engine-portable
  *    hash bucket per document. Pure per-row arithmetic — no shuffle, no
  *    RNG state, reproducible across engines and runs, and stable under
  *    corpus append (a document's split never depends on the others);
  *  - sequence packing: the GPT-style concat-then-chunk layout. Documents
  *    are concatenated in deterministic order within a shard and cut into
  *    fixed context windows; each document learns its pack id, offset and
  *    span count from one windowed cumulative sum. Sharding (here by
  *    `source`) keeps every window partition-local — at 100 TB the shard
  *    key becomes `hash(doc_id) % K` so the cumulative sums stay parallel.
  */
object CorpusPrep {

  /** Token n-grams from a materialized token-array column; documents with
    * fewer than n tokens collapse to one whole-document gram (mirrors
    * [[Dedup.shinglesFromTokens]], which is the n=3 case).
    */
  def ngramsFromTokens(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array(concat_ws(" ", tokens)))
      .otherwise(transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + lit(1), lit(n)))))

  /** Distinct (doc_id, gram-hash) pairs. The hash is internal join/group
    * state, never output, so it is native xxhash64, not the portable md5.
    */
  private def distinctNgramHashes(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), TextFns.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), explode(ngramsFromTokens(col("__toks"), n)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
      .distinct()

  /** Flag corpus documents sharing ≥1 token n-gram with the eval set.
    * Returns (doc_id, n_hits, n_ngrams, contamination) for contaminated
    * documents only — the common case is that almost nothing matches, so
    * the output is small even when the corpus is not.
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, n: Int = 5): DataFrame =
    decontaminateGrams(distinctNgramHashes(corpus, n),
      distinctNgramHashes(evalSet, n))

  private def decontaminateGrams(corpusGrams: DataFrame,
                                 evalGrams: DataFrame): DataFrame = {
    val evalHashes = evalGrams.select("h").distinct()
    // shared-cached: the exact (x19) and bloom (x34) paths aggregate the
    // identical per-doc gram counts over the same gram frame — one cached
    // doc-keyed build serves both and every warm re-run
    val sizes = Caches.shared(
      corpusGrams.groupBy("doc_id").agg(count("*").as("n_ngrams")))
    corpusGrams.join(broadcast(evalHashes), "h")
      .groupBy("doc_id").agg(count("*").as("n_hits"))
      .join(sizes, "doc_id")
      .select(col("doc_id"), col("n_hits"), col("n_ngrams"),
        round(col("n_hits") / col("n_ngrams"), 6).as("contamination"))
  }

  /** Decontamination for eval sets too large to broadcast exactly: a
    * compact bloom sketch of the eval n-gram hashes is built distributed
    * (`BloomFilterAggregate` — the planner's own runtime-filter machinery,
    * declared explicitly here because no join for the optimizer to infer
    * it from exists until phase two), broadcast as one binary row, and
    * probe-filters the corpus grams in the scan stage. Bloom filters admit
    * NO false negatives, so the surviving sliver — expected-case ~fpp of
    * the corpus — exact-verifies against the full eval set with an
    * ordinary shuffle equi-join, making the result row-identical to
    * [[decontaminate]] while nothing eval-sized is ever broadcast and the
    * verify shuffle carries only bloom-positive grams.
    */
  def decontaminateBloom(corpus: DataFrame, evalSet: DataFrame, n: Int = 5,
                         expectedItems: Long = 4L * 1024 * 1024,
                         numBits: Long = 32L * 1024 * 1024): DataFrame = {
    val corpusGrams = distinctNgramHashes(corpus, n)
    val evalGrams = distinctNgramHashes(evalSet, n)
    decontaminateGramsBloom(corpusGrams, evalGrams, expectedItems, numBits)
  }

  private[graft] def decontaminateGramsBloom(corpusGrams: DataFrame,
                                             evalGrams: DataFrame,
                                             expectedItems: Long,
                                             numBits: Long): DataFrame = {
    import org.apache.spark.sql.graftext.BloomFns
    val evalHashes = evalGrams.select("h").distinct()
    // The built filter is derived model state (the trained-centroids
    // pattern): one binary row per (eval set, sizing) — shared-cached so
    // a session probes the SAME sketch instead of re-folding the eval
    // hashes into a fresh bitset per query run.
    val sketch = Caches.shared(evalHashes.agg(
      BloomFns.bloomAgg(col("h"), expectedItems, numBits).as("bf")))
    val sizes = Caches.shared(
      corpusGrams.groupBy("doc_id").agg(count("*").as("n_ngrams")))
    val candidates = corpusGrams
      // might_contain requires a constant/scalar-subquery sketch — the
      // same plan shape the optimizer's own runtime filters use
      .where(BloomFns.mightContain(BloomFns.scalar(sketch), col("h")))
      .select("doc_id", "h")
    candidates.join(evalHashes, "h") // exact verify: shuffle only the sliver
      .groupBy("doc_id").agg(count("*").as("n_hits"))
      .join(sizes, "doc_id")
      .select(col("doc_id"), col("n_hits"), col("n_ngrams"),
        round(col("n_hits") / col("n_ngrams"), 6).as("contamination"))
  }

  /** Deterministic split assignment: salted md5-60 bucket in [0, 10000),
    * train < 9000 ≤ validation < 9500 ≤ test. Per-row arithmetic only.
    */
  def assignSplit(docs: DataFrame, salt: String = "graft-split-v1"): DataFrame = {
    val bucket = pmod(Dedup.md5Long60(concat_ws(":", lit(salt), col("doc_id"))), lit(10000L))
    docs.select(col("doc_id"), bucket.as("bucket"),
      when(bucket < 9000, "train").when(bucket < 9500, "validation")
        .otherwise("test").as("split"))
  }

  /** Deterministic dataloader order: the materialized (shard, position)
    * index a trainer consumes for one epoch — the step after mixing
    * ([[mixSources]]) and packing ([[packOffsets]]) that none of them
    * emit. Shard = salted md5-60 hash mod `nShards`, position = dense
    * rank of the same hash within the shard — one uniform global shuffle,
    * reproducible across engines, runs, and partitionings (no RNG), so
    * a preempted job re-derives the identical order and resumes at
    * (shard, pos) instead of re-randomizing mid-epoch.
    *
    * Within-shard ordering reuses the shard hash: a shard holds one
    * residue class of h, and h's order within any residue class is still
    * a uniform shuffle, so one hash pays for both decisions. Unlike
    * [[assignSplit]], positions are NOT append-stable by design — the
    * order is computed once per corpus release (a new doc's hash shifts
    * later positions), which is exactly what "epoch over snapshot N"
    * means.
    *
    * Scale shape: one hash-partition exchange on `shard` with an
    * in-partition sort — the plan a distributed index writer wants
    * (each shard's index file is one partition, written sorted); the
    * hash is uniform so shards balance to ±O(√(n/nShards)) without
    * salting.
    */
  def trainingOrder(docs: DataFrame, nShards: Int = 8,
                    salt: String = "graft-order-v1"): DataFrame = {
    val h = Dedup.md5Long60(concat_ws(":", lit(salt), col("doc_id")))
    val w = Window.partitionBy("shard").orderBy(asc("__h"), asc("doc_id"))
    docs.select(col("doc_id"), col("source"), h.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), col("source"), col("shard"), col("pos"))
  }

  /** Train→validation n-gram leakage audit: for each document the split
    * assigns to `validation`, the fraction of its distinct token n-grams
    * NOT present anywhere in the `train` split. Complements the
    * decontamination pair ([[decontaminate]]/[[decontaminateBloom]], which
    * audit against an *external* eval table): this one audits the corpus's
    * own split boundary — near-zero novelty means the held-out perplexity
    * is measuring memorized text, not generalization.
    *
    * Scale shape: the split column derives per-row from the salted doc_id
    * hash (no self-join to re-attach it), and the train side is ~90% of
    * the corpus so nothing broadcasts — the audit is one shuffle equi-join
    * on the gram hash (uniformly distributed by construction, so no
    * salting needed) between the validation grams and the distinct train
    * grams, followed by a per-doc partial aggregation.
    */
  def splitNovelty(docs: DataFrame, n: Int = 8,
                   salt: String = "graft-split-v1"): DataFrame = {
    val bucket = pmod(Dedup.md5Long60(concat_ws(":", lit(salt), col("doc_id"))), lit(10000L))
    val withSplit = docs.withColumn("__split",
      when(bucket < 9000, "train").when(bucket < 9500, "validation")
        .otherwise("test"))
    val trainGrams = distinctNgramHashes(
        withSplit.where(col("__split") === "train"), n)
      .select("h").distinct().withColumn("__seen", lit(1L))
    val valGrams = distinctNgramHashes(
      withSplit.where(col("__split") === "validation"), n)
    valGrams.join(trainGrams, Seq("h"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum("__seen"), lit(0L)).as("n_seen"))
      .select(col("doc_id"), col("n_grams"), col("n_seen"),
        round(lit(1.0) - col("n_seen") / col("n_grams"), 6).as("novelty"))
  }

  /** Concat-then-chunk packing layout: within each shard (`source`),
    * documents concatenate in doc_id order and cut into `ctxLen`-token
    * windows. Emits where each document lands: starting pack, offset in
    * that pack, and how many packs it spans. `div` keeps the arithmetic
    * in longs — a 100 TB shard's cumulative token count overflows double
    * mantissas long before it overflows a long.
    */
  def packOffsets(docs: DataFrame, ctxLen: Int = 512): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    docs
      .select(col("doc_id"), col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_end", sum("n_tokens").over(w))
      .withColumn("offset", col("cum_end") - col("n_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"offset div $ctxLen").as("pack_id"),
        pmod(col("offset"), lit(ctxLen.toLong)).as("pack_offset"),
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr(s"(cum_end - 1) div $ctxLen") - expr(s"offset div $ctxLen") + 1)
          .as("n_packs"))
  }

  /** Cross-document duplication: for each document, the fraction of its
    * distinct n-grams that also appear in at least one other document —
    * the passage-level duplication signal behind suffix-based training-set
    * dedup (Lee et al. 2022), approximated at n-gram granularity. Grams
    * travel as internal xxhash64 longs (never output — the oracle groups
    * by the gram string); document frequencies come from a window count
    * over the gram hash, so the distinct gram stream shuffles once by hash
    * and once by doc_id — no df table, no join back, and documents
    * themselves never shuffle.
    */
  def crossDocDuplication(docs: DataFrame, n: Int = 5): DataFrame =
    docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), explode(ngramsFromTokens(col("__toks"), n)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
      .distinct()
      .withColumn("gram_df", count("*").over(Window.partitionBy("h")))
      .groupBy("doc_id")
      .agg(count("*").as("n_ngrams"),
        sum(when(col("gram_df") > 1, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_ngrams"), col("n_shared"),
        round(col("n_shared") / col("n_ngrams"), 6).as("shared_frac"))

  /** Domain mixing: per-source sampling rates applied deterministically.
    * rate < 1 down-samples (keep the bucket fraction), rate > 1 up-samples
    * epoch-style (⌊rate⌋ copies everywhere, one extra copy for the
    * fractional bucket share) — the standard way training mixes weight
    * sources without an RNG. Per-row arithmetic, no shuffle; the same
    * salted bucket makes the decision reproducible across engines and
    * stable under corpus append.
    */
  def mixSources(docs: DataFrame, rates: Map[String, Double],
                 defaultRate: Double = 1.0, salt: String = "graft-mix-v1"): DataFrame = {
    val bucket = pmod(Dedup.md5Long60(concat_ws(":", lit(salt), col("doc_id"))), lit(10000L))
    val rate = rates.foldLeft(lit(defaultRate): Column) { case (acc, (s, r)) =>
      when(col("source") === s, lit(r)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("source"), bucket.as("bucket"),
        round(rate, 6).as("rate"),
        (floor(rate) + when(bucket < (rate - floor(rate)) * 10000, 1).otherwise(0))
          .cast("long").as("n_copies"))
      .withColumn("accept", col("n_copies") >= 1)
  }

  /** Token-budget corpus selection: the selection step downstream of
    * quality scoring — each source keeps its highest-quality documents
    * until a per-source token budget is exhausted (the per-domain token
    * caps of budgeted pretraining mixes, cf. SlimPajama / data-constrained
    * scaling recipes). Order is (quality DESC, doc_id) on the
    * 6-dp-rounded x10 score — deterministic; a document is selected while
    * the running total *before* it is under budget, so the first
    * over-budget document still lands (greedy-until-exceeded — budgets
    * stay reachable when a single document exceeds them).
    *
    * Scale shape: only the narrow (doc_id, source, quality, tokens) frame
    * enters the per-source window cumsum — text stays at the scan; each
    * source's ordered pass is a range partition at cluster scale.
    */
  def tokenBudgetSelect(docs: DataFrame, budgetPerSource: Long = 10000L): DataFrame = {
    val w = Window.partitionBy("source").orderBy(desc("quality"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    TextQuality.qualityScore(docs).select("doc_id", "quality")
      .join(TextQuality.tokenCounts(docs).select("doc_id", "ws_tokens"), "doc_id")
      .join(docs.select("doc_id", "source"), "doc_id")
      .withColumn("cum_before", coalesce(sum("ws_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("quality"), col("ws_tokens"),
        (col("cum_before") < budgetPerSource).as("selected"))
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"): each document draws
    * key = −ln(u)/w from a uniform u and the n smallest keys are the
    * sample — exactly equivalent to drawing documents one at a time with
    * probability proportional to weight, without replacement. The uniform
    * comes from the salted engine-portable md5-60 hash (the [[assignSplit]]
    * recipe), not an RNG, so the sample is reproducible across engines,
    * runs, and partitionings, and stable under corpus append.
    *
    * Keys round to 12 dp before ranking: the only cross-engine wobble in
    * the pipeline is `ln`'s final ulp (~1e-19 at these magnitudes), which
    * the rounding absorbs while leaving the ordering statistics intact.
    *
    * Scale shape: per-row arithmetic on a narrow (doc_id, weight)
    * projection followed by one TakeOrderedAndProject — the canonical
    * "sample 10k docs from 100 TB proportional to quality" one-pass plan;
    * text never leaves the scan.
    */
  def weightedSample(docs: DataFrame, n: Int = 100,
                     weight: Column = col("n_chars"),
                     salt: String = "graft-wsample-v1"): DataFrame = {
    val h = Dedup.md5Long60(concat_ws(":", lit(salt), col("doc_id")))
    // u ∈ (0, 1]: (h + 1) / 2^60 — pure IEEE round-to-nearest ops, so any
    // engine computes the identical double
    val u = (h.cast("double") + 1.0) / lit(1.152921504606846976e18)
    val key = round(-log(u) / weight.cast("double"), 12)
    val ranked = docs.where(weight > 0)
      .select(col("doc_id"), weight.cast("long").as("weight"), key.as("es_key"))
      .orderBy(asc("es_key"), asc("doc_id"))
      .limit(n)
    ranked.withColumn("sample_rank",
        row_number().over(Window.orderBy(asc("es_key"), asc("doc_id"))).cast("long"))
      .select(col("sample_rank"), col("doc_id"), col("weight"),
        round(col("es_key"), 6).as("es_key"))
  }

  // --- query entries ---

  /** Stand-in benchmark: every 20th document is "the eval set". Both
    * sides split from ONE cached gram frame — the corpus tokenizes once,
    * not twice (a real eval set is a separate small table; here the
    * self-split would otherwise re-scan the full corpus).
    */
  def qDecontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = distinctNgramHashes(Tables.documents(spark, sfDir), 5).cache()
    decontaminateGrams(grams.where(col("doc_id") % 20 =!= 0),
      grams.where(col("doc_id") % 20 === 0))
  }

  /** x34: same corpus/eval split as [[qDecontaminate]], through the bloom
    * prefilter + exact-verify path — result-identical by construction, so
    * the two queries share oracle semantics.
    */
  def qDecontaminateBloom(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = distinctNgramHashes(Tables.documents(spark, sfDir), 5).cache()
    decontaminateGramsBloom(grams.where(col("doc_id") % 20 =!= 0),
      grams.where(col("doc_id") % 20 === 0),
      expectedItems = 1L * 1024 * 1024, numBits = 8L * 1024 * 1024)
  }

  def qAssignSplit(spark: SparkSession, sfDir: String): DataFrame =
    assignSplit(Tables.documents(spark, sfDir))

  def qTrainingOrder(spark: SparkSession, sfDir: String): DataFrame =
    trainingOrder(Tables.documents(spark, sfDir))

  def qSplitNovelty(spark: SparkSession, sfDir: String): DataFrame =
    splitNovelty(Tables.documents(spark, sfDir))

  def qPackOffsets(spark: SparkSession, sfDir: String): DataFrame =
    packOffsets(Tables.documents(spark, sfDir))

  def qCrossDocDuplication(spark: SparkSession, sfDir: String): DataFrame =
    crossDocDuplication(Tables.documents(spark, sfDir))

  /** End-to-end prep capstone: exact-dedup keep → quality gate on the
    * emitted Gopher metrics (re-thresholded for the synthetic corpus:
    * word count alone — zero synthetic docs carry English function words)
    * → split assignment → per-split doc and token totals. Every stage is
    * one of the registered operators; the joins all key on doc_id, so AQE
    * coalesces them onto one partitioning.
    */
  def qPrepPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val wDigest = Window.partitionBy(md5(col("text").cast("binary")))
    val uniq = docs
      .withColumn("__keep", col("doc_id") === min("doc_id").over(wDigest))
      .where(col("__keep")).select("doc_id")
    val good = TextQuality.gopherRules(docs)
      .where(col("n_words").between(50L, 100000L)).select("doc_id")
    val toks = docs.select(col("doc_id"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
    assignSplit(docs).select("doc_id", "split")
      .join(uniq, "doc_id").join(good, "doc_id").join(toks, "doc_id")
      .groupBy("split")
      .agg(count("*").as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("split")
  }

  /** Budget 1000 tokens/source ≈ 2/3 of a sf0.01 source's tokens, so both
    * flag values appear at every test scale. */
  def qTokenBudget(spark: SparkSession, sfDir: String): DataFrame =
    tokenBudgetSelect(Tables.documents(spark, sfDir), budgetPerSource = 1000L)

  /** Mixing rates cycle 0.25 / 0.5 / 1.0 / 2.5 over the src<i> sources. */
  def qMixSources(spark: SparkSession, sfDir: String): DataFrame = {
    val cycle = Seq(0.25, 0.5, 1.0, 2.5)
    val rates = (0 until 20).map(i => s"src$i" -> cycle(i % 4)).toMap
    mixSources(Tables.documents(spark, sfDir), rates)
  }

  /** Temperature-scaled source mixing weights: the α-sampling recipe of
    * multilingual/pretraining mixes (sample source i with probability
    * ∝ n_i^α; α < 1 flattens the natural distribution toward uniform,
    * upweighting small sources). α is fixed at 0.5 so the power is
    * `sqrt` — exactly rounded IEEE-754 in every engine, which keeps the
    * oracle hash stable where a general `pow` could wobble in the last
    * ulp. `sample_factor` (α-share / natural share) is the per-source
    * rate to feed [[mixSources]]; the whole result is one row per source.
    *
    * Scale shape: a per-row token count, one partial-aggregated groupBy
    * on source, and a broadcast single-row totals join — nothing leaves
    * the executors but (source, counts) rows.
    */
  def temperatureMixRates(docs: DataFrame): DataFrame = {
    val perSource = docs
      .select(col("source"), TextFns.wordCount(col("text")).cast("long").as("toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .withColumn("w", round(sqrt(col("n_tokens").cast("double")), 6))
    val totals = perSource.agg(
      sum("n_tokens").as("tot_tokens"),
      // exact decimal sum of the already-6dp-rounded weights: summation
      // order can't wobble the total (moneySum precedent)
      sum(col("w").cast("decimal(24,6)")).as("tot_w"))
    perSource.crossJoin(broadcast(totals))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("tot_tokens").cast("double"), 6)
          .as("natural_share"),
        round(col("w") / col("tot_w").cast("double"), 6).as("alpha_share"))
      .withColumn("sample_factor",
        round(col("alpha_share") / col("natural_share"), 6))
  }

  def qMixTemperature(spark: SparkSession, sfDir: String): DataFrame =
    temperatureMixRates(Tables.documents(spark, sfDir))

  /** n_chars as the weight: the proxy for "sample proportional to document
    * size" (token-budget-shaped sampling); any per-doc score column works.
    */
  def qWeightedSample(spark: SparkSession, sfDir: String): DataFrame =
    weightedSample(Tables.documents(spark, sfDir))

  /** Packing-efficiency report (x62): per candidate context length, the
    * padding waste of naive one-doc-per-sequence padding (every document
    * rounds up to ⌈tokens/ctx⌉ blocks) versus [[packOffsets]]' concat-
    * then-chunk layout (only the global tail pads) — the report that
    * justifies the packing pass before a training run commits to a
    * context length. Waste fractions are exact-integer ratios rounded
    * 6 dp; block counts are pure integer arithmetic, so both engines
    * agree bit-for-bit. One aggregation over the narrow x11 token-count
    * frame exploded by the candidate lengths — corpus-size-independent
    * output.
    */
  def packingEfficiency(docs: DataFrame,
                        ctxLens: Seq[Int] = Seq(256, 512, 1024)): DataFrame = {
    val toks = TextQuality.tokenCounts(docs).select(col("doc_id"), col("ws_tokens"))
    toks.select(col("ws_tokens"),
        explode(lit(ctxLens.toArray)).as("ctx"))
      .groupBy("ctx")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("total_tokens"),
        // integer `div`, not double-divide + floor: exact at any magnitude
        // (double division drifts past 2^53 total tokens — 100 TB territory)
        sum(expr("(ws_tokens + ctx - 1) div ctx")).as("naive_blocks"))
      .select(col("ctx"), col("n_docs"), col("total_tokens"),
        col("naive_blocks"),
        expr("(total_tokens + ctx - 1) div ctx").as("packed_blocks"))
      .select(col("ctx"), col("n_docs"), col("total_tokens"),
        col("naive_blocks"), col("packed_blocks"),
        round(lit(1.0) - col("total_tokens") * lit(1.0) /
          (col("naive_blocks") * col("ctx")), 6).as("naive_waste"),
        round(lit(1.0) - col("total_tokens") * lit(1.0) /
          (col("packed_blocks") * col("ctx")), 6).as("packed_waste"))
  }

  def qPackingEfficiency(spark: SparkSession, sfDir: String): DataFrame =
    packingEfficiency(Tables.documents(spark, sfDir))
}
