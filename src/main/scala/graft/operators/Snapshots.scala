package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus snapshot versioning: the diff and manifest a training-data
  * pipeline publishes per corpus release so that downstream consumers can
  * answer "what changed since the snapshot I trained on?" and "is the
  * copy I received byte-identical to the copy you published?" without
  * ever re-shipping or re-scanning text. The reference has no snapshot
  * tooling (its corpus is a single live SQLite/DuckDB file); these are
  * the beyond-reference operations a 100 TB pipeline needs the moment a
  * corpus has more than one version or more than one home.
  *
  * Scale shape (both operators): text is digested AT THE SCAN — the only
  * thing that ever shuffles is the narrow (doc_id, source, digest,
  * n_chars) projection, never the document body. The diff is one
  * full-outer equi-join on doc_id (snapshots written through
  * [[graft.sources.Ingest]]'s bucketed writer join exchange-free); the
  * manifest is one map-side-combinable aggregation per source.
  *
  * Determinism: digests are md5 (engine-portable, the NOTES round-2
  * rule); the manifest fingerprints are order-independent by
  * construction — a commutative sum mod 2^63 and a commutative XOR over
  * per-document md5-60 values — so partitioning, shard order, and
  * ingestion order cannot change them.
  */
object Snapshots {

  /** Per-(source, status) diff summary between two corpus snapshots.
    *
    * Statuses: `added` (doc_id only in v2), `removed` (only in v1),
    * `changed` (present in both, text digest differs), `unchanged`.
    * Output: `(source, status, n_docs, chars_v1, chars_v2)` where the
    * char columns sum document lengths on each side (0 where absent) —
    * the release-note numbers for a corpus bump, and the audit that
    * catches a silent in-place rewrite (a `changed` count where the
    * publisher claimed append-only).
    *
    * The join carries digests, not text: a changed 100 KB document costs
    * the diff 16 bytes. `source` is taken from the side that has the row
    * (v2 wins when both do — a document that changed source reports the
    * new one, matching "what is this snapshot now").
    */
  def corpusDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    def digested(df: DataFrame, tag: String): DataFrame =
      df.select(col("doc_id"),
        col("source").as(s"source_$tag"),
        md5(coalesce(col("text"), concat(lit("null:"), col("doc_id"))))
          .as(s"dig_$tag"),
        length(coalesce(col("text"), lit(""))).cast("long")
          .as(s"chars_$tag"))
    val a = digested(v1, "v1")
    val b = digested(v2, "v2")
    val status = when(col("dig_v1").isNull, "added")
      .when(col("dig_v2").isNull, "removed")
      .when(col("dig_v1") === col("dig_v2"), "unchanged")
      .otherwise("changed")
    a.join(b, Seq("doc_id"), "full_outer")
      .select(coalesce(col("source_v2"), col("source_v1")).as("source"),
        status.as("status"),
        coalesce(col("chars_v1"), lit(0L)).as("c1"),
        coalesce(col("chars_v2"), lit(0L)).as("c2"))
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"),
        sum("c1").as("chars_v1"), sum("c2").as("chars_v2"))
  }

  /** Per-source integrity manifest:
    * `(source, n_docs, n_distinct_texts, n_chars, min_doc_id, max_doc_id,
    * sum_fp, xor_fp)`.
    *
    * `sum_fp` = Σ md5-60(text) mod 2^63 and `xor_fp` = XOR of the same
    * values: both are order- and partitioning-independent, mergeable
    * across shards (a 100 TB manifest is the combine of per-file
    * manifests), and verifiable by any engine with md5. Two fingerprints
    * because their blind spots differ — XOR cancels any document
    * multiset that appears an even number of times (two new identical
    * docs leave `xor_fp` unchanged), while the modular sum is
    * multiset-sensitive; published together, a collision must fool both.
    * `n_distinct_texts` is the exact-dup headline (n_docs −
    * n_distinct_texts = byte-identical copies) read before any dedup
    * pass runs.
    */
  def corpusManifest(docs: DataFrame): DataFrame = {
    val dig = docs.select(col("source"), col("doc_id"),
      length(coalesce(col("text"), lit(""))).cast("long").as("len"),
      Dedup.md5Long60(coalesce(col("text"),
        concat(lit("null:"), col("doc_id")))).as("h60"))
    val twoTo63 = lit(new java.math.BigDecimal("9223372036854775808"))
    dig.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("h60").as("n_distinct_texts"),
        sum("len").as("n_chars"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"),
        pmod(sum(col("h60").cast("decimal(38,0)")), twoTo63)
          .cast("long").as("sum_fp"),
        expr("bit_xor(h60)").as("xor_fp"))
  }

  // --- deterministic two-version derivation for the registered query ---
  // v1 = documents minus the "added in v2" set (doc_id % 17 == 2);
  // v2 = documents minus the "removed in v2" set (doc_id % 13 == 3),
  //      with doc_id % 11 == 5 texts revised in place.
  // Both versions are pure projections of the one committed table, so the
  // DuckDB oracle derives the identical pair of snapshots.

  private[graft] def snapV1(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % 17 =!= 2)

  private[graft] def snapV2(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % 13 =!= 3)
      .withColumn("text",
        when(col("doc_id") % 11 === 5, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))

  // --- query entries ---

  def qCorpusDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    corpusDiff(snapV1(docs), snapV2(docs))
  }

  def qCorpusManifest(spark: SparkSession, sfDir: String): DataFrame =
    corpusManifest(Tables.documents(spark, sfDir))
}
