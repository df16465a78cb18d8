package graft

import graft.operators.Dedup
import graft.streaming.DocStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** w12 streaming near-dup admission — the replay contract:
  *
  *  1. the streamed keep-set equals a batch greedy replay of the same rule
  *     (kept ⟺ no kept earlier near-dup) over the full arrived prefix,
  *     including collisions resolved through the cross-batch band state;
  *  2. on clique-shaped duplicate families (identical copies — the planted
  *     fixture) the streamed keep-set coincides with batch x45's
  *     transitive-closure keep rule, even when the copies arrive in a
  *     LATER micro-batch than their original.
  */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Write `df` as a single parquet FILE at `target` with mtime `t`. */
  private def writeOneFile(df: DataFrame, dir: java.nio.file.Path,
                           name: String, mtime: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("w12-part")
    df.repartition(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val target = dir.resolve(name)
    java.nio.file.Files.copy(part.toPath, target)
    target.toFile.setLastModified(mtime)
  }

  private def greedyReplay(all: DataFrame): Map[Long, Boolean] = {
    val edges = Dedup.minhashLshPairs(all.select("doc_id", "text"))
      .select("id1", "id2").as[(Long, Long)].collect()
    val smaller = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
    val kept = scala.collection.mutable.Set.empty[Long]
    all.select("doc_id").as[Long].collect().sorted.map { d =>
      val admit = !smaller.getOrElse(d, Array.empty[Long]).exists(kept)
      if (admit) kept += d
      d -> admit
    }.toMap
  }

  test("streamed verdicts == batch greedy replay; clones in a later batch " +
       "are rejected via the band state; clique families match x45") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val clones = docs.where(col("doc_id") === 0L)
      .select(explode(sequence(lit(100000L), lit(100019L))).as("doc_id"),
        col("text"))
    val full = DocStream.docSchema.fieldNames.toSeq
    def pad(df: DataFrame): DataFrame =
      df.withColumn("lang", lit("en")).withColumn("source", lit("fixture"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select(full.map(col): _*)
    val dir = java.nio.file.Files.createTempDirectory("w12-arrivals")
    val t0 = System.currentTimeMillis() - 60000
    writeOneFile(pad(docs), dir, "a_originals.parquet", t0)
    writeOneFile(pad(clones), dir, "b_clones.parquet", t0 + 30000)

    val streamed = DocStream.replayNearDupAdmission(spark, dir.toString)
      .as[(Long, Boolean)].collect().toMap
    val allDocs = docs.unionByName(clones)
    assert(streamed.size == allDocs.count(),
      "every arrived doc gets exactly one verdict")

    // contract 1: exact equality with the batch greedy replay
    assert(streamed == greedyReplay(allDocs))

    // contract 2: the cross-batch clique — doc 0 admitted in batch 1, all
    // 20 clones rejected in batch 2 THROUGH THE STATE (no within-batch
    // pair involves doc 0), matching batch x45's keep rule on the family
    assert(streamed(0L), "the original stays admitted")
    assert((100000L to 100019L).forall(id => !streamed(id)),
      "every later-arriving clone must be rejected")
    val x45 = Dedup.minhashDedup(allDocs)
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(x45(0L) && (100000L to 100019L).forall(id => !x45(id)),
      "x45 agrees on the clique family")
  }

  test("admitBatch is idempotent under micro-batch retry: a redelivered " +
       "batchId changes neither verdicts nor state") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val b1 = docs.where(col("doc_id") < 20)
    val b2 = docs.where(col("doc_id") >= 20 && col("doc_id") < 40)
      .unionByName(b1.where(col("doc_id") === 0L)
        .select(lit(900000L).as("doc_id"), col("text"))) // cross-batch dup
    val stateDir = java.nio.file.Files.createTempDirectory("w12-idem").toString
    def snapshot(): (Set[String], Set[String], Set[String]) = (
      spark.read.parquet(s"$stateDir/bands").collect().map(_.toString).toSet,
      spark.read.parquet(s"$stateDir/sigs").collect().map(_.toString).toSet,
      spark.read.parquet(s"$stateDir/verdicts").collect().map(_.toString).toSet)

    val v1 = DocStream.admitBatch(b1, stateDir, 0.5, batchId = 0L)
      .as[(Long, Boolean)].collect().toMap
    val v2 = DocStream.admitBatch(b2, stateDir, 0.5, batchId = 1L)
      .as[(Long, Boolean)].collect().toMap
    assert(v1.nonEmpty && v2.nonEmpty)
    assert(!v2(900000L), "cross-batch duplicate rejected through the state")
    val before = snapshot()

    // redeliver batch 1 (the crash-retry Spark performs after a failure
    // downstream of the commit): marker short-circuits — same verdicts,
    // byte-identical state, no double-append
    val retried = DocStream.admitBatch(b2, stateDir, 0.5, batchId = 1L)
      .as[(Long, Boolean)].collect().toMap
    assert(retried == v2, "retry must return the committed verdicts")
    assert(snapshot() == before, "retry must not mutate state")

    // the next batch still sees exactly one copy of the state: a doc
    // colliding with batch-0 content is rejected once, deterministically
    val b3 = b1.where(col("doc_id") === 1L)
      .select(lit(900001L).as("doc_id"), col("text"))
    val v3 = DocStream.admitBatch(b3, stateDir, 0.5, batchId = 2L)
      .as[(Long, Boolean)].collect().toMap
    assert(!v3(900001L), "post-retry batches admit against committed state")
  }

  test("admission-state compaction: verdicts identical with and without " +
       "compaction, probes read the compacted generation, files shrink") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val dirA = java.nio.file.Files.createTempDirectory("w12-nocompact").toString
    val dirB = java.nio.file.Files.createTempDirectory("w12-compact").toString
    def partFiles(root: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(root))
    }
    // five micro-batches; B compacts every 2 committed deltas, A never
    for (i <- 0 until 5) {
      val b = docs.where(col("doc_id") % 5 === i)
      val va = DocStream.admitBatch(b, dirA, 0.5, i.toLong, compactEvery = 0)
        .as[(Long, Boolean)].collect().toMap
      val vb = DocStream.admitBatch(b, dirB, 0.5, i.toLong, compactEvery = 2)
        .as[(Long, Boolean)].collect().toMap
      assert(va == vb, s"batch $i verdicts diverge under compaction")
    }
    // B holds a committed generation and strictly fewer state files than A
    assert(new java.io.File(s"$dirB/compact_commits").listFiles().nonEmpty,
      "compaction must have committed a generation")
    val (filesA, filesB) = (partFiles(s"$dirA/bands") + partFiles(s"$dirA/sigs"),
      partFiles(s"$dirB/bands") + partFiles(s"$dirB/sigs") +
      partFiles(s"$dirB/compact"))
    assert(filesB < filesA, s"compacted state must shrink: A=$filesA B=$filesB")
    info(s"state part files after 5 batches: uncompacted=$filesA compacted=$filesB")
    // post-hoc compaction of A preserves probe behavior: clones of
    // already-admitted docs are rejected through the compacted state on
    // both sides, with identical verdicts
    DocStream.compactAdmissionState(spark, dirA)
    val probe = docs.where(col("doc_id") < 10)
      .select((col("doc_id") + 800000L).as("doc_id"), col("text"))
    val pa = DocStream.admitBatch(probe, dirA, 0.5, 5L, compactEvery = 0)
      .as[(Long, Boolean)].collect().toMap
    val pb = DocStream.admitBatch(probe, dirB, 0.5, 5L, compactEvery = 2)
      .as[(Long, Boolean)].collect().toMap
    assert(pa == pb, "post-compaction probes diverge")
    assert(pa.values.forall(_ == false),
      "every clone of an admitted doc must be rejected through compacted state")
    // compaction must also bound the commits/ listing a long-running
    // stream pays on EVERY micro-batch: markers at/below the fold point
    // are pruned (the compaction marker subsumes them)
    val markers = Option(new java.io.File(s"$dirB/commits").listFiles())
      .map(_.length).getOrElse(0)
    assert(markers <= 3,
      s"subsumed commit markers must be pruned, found $markers after 6 batches")
  }

  test("admitBatch first-batch retry: a crash between the state writes " +
       "leaves no marker, and the retry must not trip over partial state") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .where(col("doc_id") < 20)
    val stateDir = java.nio.file.Files.createTempDirectory("w12-crash").toString
    // simulate batch 0 dying between the bands write and the sigs write:
    // bands/batch_id=0 exists (here: footerless — the worst case), sigs
    // and the commit marker don't
    assert(new java.io.File(s"$stateDir/bands/batch_id=0").mkdirs())
    val v = DocStream.admitBatch(docs, stateDir, 0.5, batchId = 0L)
      .as[(Long, Boolean)].collect().toMap
    assert(v.size == 20, "retry of the first batch must recompute cleanly")
    assert(new java.io.File(s"$stateDir/commits/0").exists(), "and commit")
    // and the stream continues: batch 1 reads exactly the committed state
    val dup = docs.where(col("doc_id") === 0L)
      .select(lit(910000L).as("doc_id"), col("text"))
    val v1 = DocStream.admitBatch(dup, stateDir, 0.5, batchId = 1L)
      .as[(Long, Boolean)].collect().toMap
    assert(!v1(910000L), "the duplicate is rejected through the repaired state")
  }
}
