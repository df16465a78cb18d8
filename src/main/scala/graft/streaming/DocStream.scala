package graft.streaming

import graft.functions.{TextFns, TopKWords}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming document analytics: the corpus arrives as parquet files and
  * the heavy-hitter summary stays current without ever re-scanning — the
  * incremental form of the A14 word-frequency operator, built on the same
  * [[TopKWords]] Misra–Gries aggregate as the batch sketch. The streaming
  * state is ONE bounded counter map (not a per-word aggregation state),
  * which is the only top-k formulation whose state does not grow with the
  * vocabulary of an unbounded ingest.
  */
object DocStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming top-k words over an arriving corpus directory. Complete
    * output mode: each micro-batch emits the current summary row.
    */
  def topWordsStream(spark: SparkSession, dir: String, k: Int = 20,
                     capacity: Int = 4096): DataFrame = {
    val src = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    src.select(explode(TextFns.tokens(col("text"))).as("word"))
      .agg(TopKWords.topKWords(col("word"), k, capacity).as("tops"))
  }

  /** Replay the stream over a static directory; returns the final summary
    * exploded to (word, cnt) rows.
    */
  def replayTopWords(spark: SparkSession, dir: String, k: Int = 20,
                     capacity: Int = 4096,
                     queryName: String = "top_words_mem"): DataFrame = {
    val q: StreamingQuery = topWordsStream(spark, dir, k, capacity)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .select(explode(col("tops")).as("t"))
      .select(col("t.word").as("word"), col("t.cnt").as("cnt"))
  }

  /** Streaming corpus-prep quality gate: the x10 quality score applied to
    * an ARRIVING corpus, emitting per-(source, accepted) counts — the
    * incremental admission filter a continuous ingest runs instead of
    * re-scoring the corpus per batch job. The score is a stateless
    * per-row projection (length/punct/stopword ratios — no corpus
    * aggregate), so the streaming plan carries no per-document state;
    * the only state is the bounded (source × {accept, reject}) count map.
    * Counts are order-free, so the replay result equals the batch
    * computation exactly (the w8 oracle recipe).
    */
  def qualityGateStream(spark: SparkSession, dir: String,
                        threshold: Double = 0.6): DataFrame = {
    val src = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    graft.operators.TextQuality.qualityScore(src, keep = Seq("source"))
      .select(col("source"), (col("quality") >= threshold).as("accepted"))
      .groupBy("source", "accepted").agg(count(lit(1)).as("n"))
  }

  // one linked dir per source file for the process lifetime (the w8
  // pattern: readStream needs a directory; the fixture is a single file)
  private val docSrcDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def docSrcDir(sfDir: String): String = {
    val src = new java.io.File(s"$sfDir/documents.parquet")
    require(src.exists, s"no documents table at ${src.getPath}")
    if (src.isDirectory) src.getPath
    else docSrcDirs.getOrElseUpdate(src.getCanonicalPath, {
      val d = java.nio.file.Files.createTempDirectory("graft_w11_src")
      java.nio.file.Files.createSymbolicLink(
        d.resolve("documents.parquet"), src.toPath.toAbsolutePath)
      d.toFile.deleteOnExit()
      d.toString
    })
  }

  /** w12: streaming NEAR-duplicate admission — the LSH-band stateful
    * variant of the exact-dedup stream (w2's `dropDuplicatesWithinWatermark`
    * keys on identity; this keys on content similarity). Each arriving
    * document is admitted iff its MinHash signature, estimated against
    * every PREVIOUSLY ADMITTED document sharing an LSH band bucket, stays
    * under `minEstJaccard` — the greedy admission rule streaming ingest
    * actually runs (a rejected doc is gone; a later chain-merge cannot
    * retro-reject what was already admitted, which is where this
    * deliberately differs from batch x45's transitive-closure families:
    * on clique-shaped duplicate families — the planted fixture, identical
    * copies — the two keep-sets coincide; on chains a-b-c the stream keeps
    * the chain ends, the replay spec pins both facts).
    *
    * Shape, 100 TB-first: state is the admitted corpus's band-bucket
    * table plus its signatures — parquet keyed by `band_key`, the same
    * layout a production admission service holds in a key-value store.
    * Each micro-batch does ONE equi-join of its band rows against the
    * state (collisions only — never a corpus scan), verifies candidates
    * by signature agreement, resolves within-batch pairs with the LSH
    * pair join, and appends the admitted docs' bands/signatures. The only
    * driver-side step is the greedy scan over the batch's own verdicts —
    * bounded by micro-batch size, never by corpus size.
    *
    * Failure contract — the standard `foreachBatch` idempotence pattern:
    * every write (band rows, signatures, verdicts) lands in a per-batch
    * `batch_id=<id>` partition directory in OVERWRITE mode, and a commit
    * marker is created only after all three succeed. A micro-batch retry
    * (Spark redelivers the same batchId after a crash) therefore either
    * (a) sees the marker and returns the persisted verdicts without
    * recomputing or re-appending, or (b) wholesale-replaces its own
    * half-written partition before committing. All marker and listing
    * operations go through `org.apache.hadoop.fs.FileSystem`, so the
    * protocol holds unchanged on HDFS/S3A state dirs, not just local
    * paths. The state read never lists the bands/sigs roots: it reads an
    * EXPLICIT path list built from the commits/ directory (committed
    * predecessor partitions only, `basePath`-anchored), so a visible but
    * footerless partition left by a crashed attempt — including this
    * batch's own — can never poison schema inference on a retry.
    *
    * Long-running streams: every micro-batch adds one `batch_id=` delta
    * partition, so after `compactEvery` committed deltas the state is
    * COMPACTED — rewritten into one sorted generation table (see
    * [[compactAdmissionState]]); reads then union the latest committed
    * generation with the deltas that followed it.
    */
  private[graft] def admitBatch(batch: DataFrame, stateDir: String,
                                minEstJaccard: Double, batchId: Long,
                                compactEvery: Int = 8): DataFrame = {
    val sparkPre = batch.sparkSession
    val fs = stateFs(sparkPre, stateDir)
    val commitsDir = new Path(s"$stateDir/commits")
    val commitMarker = new Path(commitsDir, batchId.toString)
    val verdictsPath = s"$stateDir/verdicts/batch_id=$batchId"
    // committed ⟺ the batch's own marker exists OR the batch is at/below
    // the latest compaction's fold point (compaction prunes the markers
    // it subsumes — see [[compactAdmissionState]] — so the marker alone
    // is not the full committed set)
    if (fs.exists(commitMarker) ||
        latestCompaction(fs, stateDir).exists(_._2 >= batchId))
      return sparkPre.read.parquet(verdictsPath)
    graft.operators.Caches.withScope {
      val spark = sparkPre
      import spark.implicits._
      import graft.operators.Dedup
      val docs = batch.select("doc_id", "text")
      // shared-cached up front (released at the scope exit below): the
      // batch's signatures and band rows are read by the state join, the
      // within-batch pair join, AND both state-delta writes — without the
      // cache each consumer re-reads the batch files and recomputes the
      // signature kernel
      val sigs = graft.operators.Caches.shared(Dedup.minhashSignatures(docs))
      val bands = graft.operators.Caches.shared(Dedup.bandRows(sigs))
      val bandsPath = s"$stateDir/bands"
      val sigsPath = s"$stateDir/sigs"
      val extColl: Set[Long] = committedState(spark, fs, stateDir, batchId)
        .map { case (stBandsRaw, stSigsRaw) =>
          val stBands = stBandsRaw.withColumnRenamed("doc_id", "old_id")
          val stSigs = stSigsRaw
            .select(col("doc_id").as("old_id"), col("signature").as("old_sig"))
          bands.join(stBands, Seq("band_idx", "band_key"))
            .select("doc_id", "old_id").distinct()
            .join(sigs, "doc_id")
            .join(stSigs, "old_id")
            .where((size(filter(zip_with(col("signature"), col("old_sig"),
                (x, y) => x === y), b => b)).cast("double") / Dedup.NumHashes)
              >= minEstJaccard)
            .select(col("doc_id")).distinct().as[Long].collect().toSet
        }.getOrElse(Set.empty)
      // within-batch near-dup pairs (id1 < id2), then the greedy scan in
      // arrival (doc_id) order — both bounded by the micro-batch
      val internal = Dedup.minhashLshPairs(docs, minEstJaccard)
        .select("id1", "id2").as[(Long, Long)].collect()
      val smaller = internal.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
      // NOT derivable from sigs: a null-text doc has no signature row but
      // must still receive a verdict (admitted — nothing to collide with)
      val ids = docs.select("doc_id").as[Long].collect().sorted
      val kept = scala.collection.mutable.Set.empty[Long]
      val verdicts = ids.map { d =>
        val admit = !extColl(d) &&
          !smaller.getOrElse(d, Array.empty[Long]).exists(kept)
        if (admit) kept += d
        (d, admit)
      }
      val keptIds = verdicts.filter(_._2).map(_._1)
      val keptDf = keptIds.toSeq.toDF("doc_id")
      // State-delta file sizing (guide §6): the join output inherits the
      // session's shuffle partitioning, so each micro-batch would shed
      // 3 × shuffle.partitions near-empty files into the state dir —
      // fragmentation the compactor then pays for. Size file counts from
      // the DRIVER-KNOWN row counts (the verdicts were just collected)
      // at ~512k narrow rows per file; batch sizes at any scale produce
      // a handful of well-filled deltas instead.
      def nFiles(rows: Long): Int =
        math.max(1L, math.min(10000L, (rows + 511999L) / 512000L)).toInt
      val bandFiles = nFiles(keptIds.length.toLong * Dedup.NumBands)
      bands.join(keptDf, "doc_id").coalesce(bandFiles).write.mode("overwrite")
        .parquet(s"$bandsPath/batch_id=$batchId")
      sigs.join(keptDf, "doc_id").coalesce(nFiles(keptIds.length.toLong))
        .write.mode("overwrite").parquet(s"$sigsPath/batch_id=$batchId")
      val verdictsDf = verdicts.toSeq.toDF("doc_id", "kept")
      verdictsDf.coalesce(nFiles(verdicts.length.toLong))
        .write.mode("overwrite").parquet(verdictsPath)
      fs.mkdirs(commitsDir)
      fs.createNewFile(commitMarker)
      // state maintenance AFTER the commit: this batch's result is durable
      // whether or not the compaction below completes
      if (compactEvery > 0) {
        val upto = latestCompaction(fs, stateDir).map(_._2).getOrElse(-1L)
        if (listCommitted(fs, commitsDir).count(_ > upto) >= compactEvery)
          compactAdmissionState(spark, stateDir)
      }
      verdictsDf
    }
  }

  private def stateFs(spark: SparkSession, stateDir: String): FileSystem =
    new Path(stateDir).getFileSystem(spark.sessionState.newHadoopConf())

  private def listCommitted(fs: FileSystem, commitsDir: Path): Seq[Long] =
    if (!fs.exists(commitsDir)) Seq.empty
    else fs.listStatus(commitsDir).toSeq
      .flatMap(s => s.getPath.getName.toLongOption)

  /** Latest committed compaction generation as (gen, upto): the marker
    * file name `<gen>_<upto>` carries both, so readers never open marker
    * contents. Absent dir / unparsable names → no compaction.
    */
  private def latestCompaction(fs: FileSystem, stateDir: String): Option[(Long, Long)] = {
    val dir = new Path(s"$stateDir/compact_commits")
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq.flatMap { s =>
      s.getPath.getName.split("_") match {
        case Array(g, u) =>
          for (gl <- g.toLongOption; ul <- u.toLongOption) yield (gl, ul)
        case _ => None
      }
    }.maxByOption(_._1)
  }

  /** The committed admission state visible to `batchId`, as (bands, sigs)
    * frames — None when no predecessor has committed. Reads ONLY explicit
    * committed paths: the latest compacted generation (if any) unioned
    * with the delta partitions that committed after it, each delta named
    * by its commits/ marker and read under `basePath` so `batch_id` stays
    * a partition column. A corrupt uncommitted partition (crashed attempt)
    * is never in the list, so it can never fail a retry's schema
    * inference.
    */
  private def committedState(spark: SparkSession, fs: FileSystem,
                             stateDir: String,
                             batchId: Long): Option[(DataFrame, DataFrame)] = {
    val comp = latestCompaction(fs, stateDir).filter(_._2 < batchId)
    val upto = comp.map(_._2).getOrElse(-1L)
    val deltas = listCommitted(fs, new Path(s"$stateDir/commits"))
      .filter(b => b > upto && b < batchId).sorted
    if (comp.isEmpty && deltas.isEmpty) None
    else {
      def read(sub: String, cols: Seq[String]): DataFrame = {
        val root = s"$stateDir/$sub"
        val deltaDf =
          if (deltas.isEmpty) None
          else Some(spark.read.option("basePath", root)
            .parquet(deltas.map(b => s"$root/batch_id=$b"): _*)
            .select(cols.map(col): _*))
        val compDf = comp.map { case (g, _) =>
          spark.read.parquet(s"$stateDir/compact/gen=$g/$sub")
            .select(cols.map(col): _*)
        }
        (compDf.toSeq ++ deltaDf.toSeq).reduce(_.unionByName(_))
      }
      Some((read("bands", Seq("doc_id", "band_idx", "band_key")),
            read("sigs", Seq("doc_id", "signature"))))
    }
  }

  /** Compact the admission state: rewrite the latest compacted generation
    * plus every delta partition committed since into ONE sorted state
    * table per side (`compact/gen=<g>/{bands,sigs}`), committed by a
    * `compact_commits/<g>_<upto>` marker written LAST. Readers always use
    * the highest committed generation, so a crash at any point leaves the
    * previous state fully readable: a half-written generation has no
    * marker and is simply overwritten by the next attempt (same gen id).
    * After the marker commits, superseded delta partitions, their commit
    * markers, and older generations are garbage-collected best-effort.
    * GC cost is bounded by what exists on disk (the state roots are
    * LISTED, not reconstructed from the full marker history), and marker
    * pruning keeps the per-batch commits/ listing O(compactEvery) for the
    * stream's whole lifetime; a crash mid-GC leaves stale directories no
    * read path references, and the next compaction's listing-based sweep
    * collects them.
    *
    * Bands sort by (band_idx, band_key): the probe join's keys become
    * contiguous runs, so parquet row-group stats prune non-colliding
    * ranges — the "one sorted band table" a long-running admission
    * service wants instead of thousands of per-batch files.
    */
  private[graft] def compactAdmissionState(spark: SparkSession,
                                           stateDir: String): Unit = {
    val fs = stateFs(spark, stateDir)
    val committed = listCommitted(fs, new Path(s"$stateDir/commits"))
    if (committed.isEmpty) return
    val upto = committed.max
    val prevGen = latestCompaction(fs, stateDir)
    if (prevGen.exists(_._2 >= upto)) return // nothing new to fold in
    val gen = prevGen.map(_._1 + 1).getOrElse(0L)
    committedState(spark, fs, stateDir, upto + 1).foreach { case (bands, sigs) =>
      bands.sort("band_idx", "band_key", "doc_id")
        .write.mode("overwrite").parquet(s"$stateDir/compact/gen=$gen/bands")
      sigs.sort("doc_id")
        .write.mode("overwrite").parquet(s"$stateDir/compact/gen=$gen/sigs")
      val marker = new Path(s"$stateDir/compact_commits/${gen}_$upto")
      fs.mkdirs(marker.getParent)
      fs.createNewFile(marker)
      // GC by LISTING each state root (one RPC per side) and deleting the
      // batch_id dirs at/below the fold point — proportional to what is
      // actually on disk, never to stream lifetime, and it sweeps up
      // leftovers from a crash during an earlier GC for free. Then prune
      // the subsumed commit markers: admitBatch treats batchId ≤ upto as
      // committed via the compaction marker, so commits/ listings on the
      // hot per-batch path stay O(compactEvery) instead of growing one
      // tiny file per micro-batch forever.
      // best-effort means "a missing path or FS hiccup is fine to skip —
      // the next compaction's sweep collects it"; it does NOT mean eating
      // thread interrupts or fatal JVM errors (OOM, linkage), so only
      // NonFatal faults are swallowed — an InterruptedException propagates
      // and shutdown stays prompt
      import scala.util.control.NonFatal
      for (sub <- Seq("bands", "sigs")) {
        val root = new Path(s"$stateDir/$sub")
        val stale =
          try fs.listStatus(root).toSeq.filter(
            _.getPath.getName.stripPrefix("batch_id=").toLongOption.exists(_ <= upto))
          catch { case NonFatal(_) => Seq.empty }
        for (s <- stale)
          try fs.delete(s.getPath, true) catch { case NonFatal(_) => () }
      }
      for (b <- committed if b <= upto)
        try fs.delete(new Path(s"$stateDir/commits/$b"), false)
        catch { case NonFatal(_) => () }
      for ((g, u) <- prevGen) {
        try fs.delete(new Path(s"$stateDir/compact/gen=$g"), true)
        catch { case NonFatal(_) => () }
        try fs.delete(new Path(s"$stateDir/compact_commits/${g}_$u"), false)
        catch { case NonFatal(_) => () }
      }
    }
  }

  /** Replay the admission stream over a static directory to completion;
    * returns the full (doc_id, kept) verdict table. Fresh state per call —
    * the replay is idempotent, and within a run each micro-batch commits
    * its verdicts inside [[admitBatch]]'s batchId-guarded transaction (no
    * separate sink append that a retry could double-write).
    */
  def replayNearDupAdmission(spark: SparkSession, dir: String,
                             minEstJaccard: Double = 0.5): DataFrame = {
    val stateDir = java.nio.file.Files.createTempDirectory("graft_w12_state").toString
    val q: StreamingQuery = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, stateDir, minEstJaccard, batchId): Unit
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(s"$stateDir/verdicts").select("doc_id", "kept")
  }

  def qNearDupAdmission(spark: SparkSession, sfDir: String): DataFrame =
    replayNearDupAdmission(spark, docSrcDir(sfDir))

  def qQualityGate(spark: SparkSession, sfDir: String): DataFrame = {
    val q = qualityGateStream(spark, docSrcDir(sfDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("w11_stream_quality")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table("w11_stream_quality")
  }

  /** w13: streaming KMV distinct-shingle sketch per source — the
    * mergeable-synopsis member of the streaming pack. The batch x56
    * derives each source's bottom-k with a window over the distinct-hash
    * shuffle; here the [[graft.functions.KmvSketch]] aggregator folds
    * arriving shingle hashes into a bounded sorted buffer per source and
    * Spark's partial/merge aggregation does the union — state is
    * k longs per source, NOT the distinct-hash set, which is the whole
    * point of a sketch on an unbounded ingest. KMV is set-based, so the
    * streamed estimate equals the batch estimate exactly (no distinct()
    * needed upstream), and the replay hash-checks against the same
    * estimator SQL as x56.
    */
  def kmvDistinctStream(spark: SparkSession, dir: String,
                        k: Int = graft.operators.Sketches.DefaultK): DataFrame = {
    val src = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    src.select(col("source"), TextFns.tokens(col("text")).as("toks"))
      .select(col("source"),
        explode(org.apache.spark.sql.graftext.ShingleHashExpr
          .shingleHashes(col("toks"), 0L)).as("h60"))
      .groupBy("source")
      .agg(graft.functions.KmvSketch.kmv(col("h60"), k).as("sk"))
      .select(col("source"), col("sk.n_kept").as("n_kept"),
        col("sk.est_distinct").as("est_distinct"))
  }

  def replayKmvDistinct(spark: SparkSession, dir: String,
                        k: Int = graft.operators.Sketches.DefaultK): DataFrame = {
    val q: StreamingQuery = kmvDistinctStream(spark, dir, k)
      .writeStream.outputMode("complete")
      .format("memory").queryName("w13_kmv")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table("w13_kmv")
  }

  def qKmvStream(spark: SparkSession, sfDir: String): DataFrame =
    replayKmvDistinct(spark, docSrcDir(sfDir))

  /** w14: streaming exact-substring decontamination — x77 as an admission
    * stream. The eval set's distinct window hashes are a STATIC frame
    * (benchmark-sized) broadcast into every micro-batch; each arriving
    * train document's window stream joins it STATELESSLY and the sink
    * receives one row per contaminated window. No streaming aggregation,
    * no watermark, zero state — the per-doc verdicts are an ordinary
    * batch aggregate over the sink, so the replay equals batch x77
    * exactly. This is the decontamination shape a continuous ingest
    * actually wants: the eval fingerprint table changes only when
    * benchmarks do.
    */
  def substrDecontamStream(spark: SparkSession, dir: String,
                           evalHashes: DataFrame,
                           windowTokens: Int = 20,
                           evalMod: Int = 20): DataFrame = {
    val src = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .where(pmod(col("doc_id"), lit(evalMod.toLong)) =!= 0)
    graft.operators.Dedup.windowHashes(src, windowTokens)
      .join(broadcast(evalHashes), "h")
      .select("doc_id", "pos")
  }

  def replaySubstrDecontam(spark: SparkSession, dir: String,
                           windowTokens: Int = 20,
                           evalMod: Int = 20): DataFrame = {
    val batchDocs = spark.read.schema(docSchema).parquet(dir)
    // cached for the same reason as w15's index frames: the stream-static
    // broadcast is rebuilt per micro-batch, and without the cache each
    // rebuild re-derives the eval window hashes from the raw corpus
    val evalHashes = graft.operators.Dedup
      .windowHashes(batchDocs.where(pmod(col("doc_id"), lit(evalMod.toLong)) === 0),
        windowTokens)
      .select("h").distinct().cache()
    val q: StreamingQuery =
      substrDecontamStream(spark, dir, evalHashes, windowTokens, evalMod)
        .writeStream.outputMode("append")
        .format("memory").queryName("w14_hits")
        .start()
    q.processAllAvailable()
    q.stop()
    evalHashes.unpersist(blocking = false)
    val hits = spark.table("w14_hits")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_windows"),
        min("pos").cast("long").as("first_pos"))
    batchDocs.where(pmod(col("doc_id"), lit(evalMod.toLong)) =!= 0)
      .select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_contaminated_windows"), lit(0L))
          .as("n_contaminated_windows"),
        coalesce(col("first_pos"), lit(-1L)).as("first_pos"),
        col("n_contaminated_windows").isNull.as("clean"))
  }

  def qSubstrDecontamStream(spark: SparkSession, sfDir: String): DataFrame =
    replaySubstrDecontam(spark, docSrcDir(sfDir))

  /** w15: incremental MinHash admission against a FIXED persisted index —
    * x66/x70 as a stream, completing the admission set: w12 dedups the
    * stream against ITSELF (stateful band buckets), this admits arrivals
    * against yesterday's CORPUS (stateless on the streaming side — the
    * index frames are static state, exactly x70's parquet artifact). The
    * stream-static join strategy is the PLANNER's choice: a small index
    * auto-broadcasts; a corpus-scale one (past broadcast limits) takes
    * the partitioned equi-join on the band key, where x70's
    * band_idx-partitioned layout keeps the static side's scan pruned.
    *
    * The MinHash signature is computed PER ROW (the fused
    * [[org.apache.spark.sql.graftext.MinHashSigExpr]] kernel over the
    * document's own shingle multiset — no explode/groupBy, so the
    * streaming plan carries zero aggregation state; min over the multiset
    * equals min over the distinct set, so it matches
    * [[graft.operators.Dedup.minhashSignatures]] exactly). Band rows fan out via posexplode
    * (a stateless generator), join the static index bands, verify
    * against the static index signatures, and the sink gets one row per
    * (delta doc, matching index doc). Verdicts are a batch aggregate
    * over the sink — the replay hash-matches batch x66's oracle.
    */
  def incrementalAdmissionStream(spark: SparkSession, dir: String,
                                 indexBands: DataFrame, indexSigs: DataFrame,
                                 minEstJaccard: Double = 0.5,
                                 deltaMod: Int = 5): DataFrame = {
    import graft.operators.Dedup
    val toks = TextFns.tokens(col("text"))
    val hs = org.apache.spark.sql.graftext.ShingleHashExpr
      .shingleHashes(col("__toks"), Dedup.Prime)
    val as = Dedup.HashParams.map(_._1).toArray
    val bs = Dedup.HashParams.map(_._2).toArray
    val signature = org.apache.spark.sql.graftext.MinHashSigExpr
      .minhashSig(col("__hs"), as, bs, Dedup.Prime)
    val bandKeys = transform(sequence(lit(0), lit(Dedup.NumBands - 1)), b =>
      Dedup.md5Long60(concat_ws("_", b,
        slice(col("signature"), b * Dedup.RowsPerBand + 1, lit(Dedup.RowsPerBand)))))
    val src = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .where(pmod(col("doc_id"), lit(deltaMod.toLong)) === (deltaMod - 1))
    val deltaBands = src
      .withColumn("__toks", toks)
      .withColumn("__hs", hs)
      .withColumn("signature", signature)
      .select(col("doc_id").as("delta_id"), col("signature"),
        posexplode(bandKeys).as(Seq("band_idx", "band_key")))
    // a pair colliding in several bands emits several identical rows here
    // (an in-stream dropDuplicates would be STATEFUL); the replay dedups
    // them batch-side at the sink, keeping the stream state-free
    // no broadcast hints: a forced broadcast would cap the admissible
    // index size at the driver's broadcast limit — let the planner pick
    // (it broadcasts the fixture-sized index on its own)
    deltaBands
      .join(indexBands.select(col("doc_id").as("index_id"),
        col("band_idx"), col("band_key")), Seq("band_idx", "band_key"))
      .select("delta_id", "index_id", "signature")
      .join(indexSigs.select(col("doc_id").as("index_id"),
        col("signature").as("sig2")), "index_id")
      .select(col("delta_id"), col("index_id"),
        (size(filter(zip_with(col("signature"), col("sig2"), (x, y) => x === y),
          b => b)).cast("double") / Dedup.NumHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
  }

  def replayIncrementalAdmission(spark: SparkSession, dir: String,
                                 minEstJaccard: Double = 0.5,
                                 deltaMod: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Dedup
    val batchDocs = spark.read.schema(docSchema).parquet(dir)
    val isDelta = pmod(col("doc_id"), lit(deltaMod.toLong)) === (deltaMod - 1)
    // CACHE the static index side: a stream-static join re-executes the
    // static plan on EVERY micro-batch, so without this the whole
    // tokenize→shingle→signature chain over the full index corpus reran
    // per arriving file — at the 100× smoke that was ~90 of the 104 s.
    // Materializing once is the train-once/serve-many shape (a production
    // admission service reads a persisted index — x70's probeIndex);
    // released after the replay completes (the result frame reads only
    // the memory sink, never these).
    val indexSigs = Dedup.minhashSignatures(batchDocs.where(!isDelta)).cache()
    val indexBands = Dedup.bandRows(indexSigs).cache()
    val q: StreamingQuery =
      incrementalAdmissionStream(spark, dir, indexBands, indexSigs,
        minEstJaccard, deltaMod)
        .writeStream.outputMode("append")
        .format("memory").queryName("w15_matches")
        .start()
    q.processAllAvailable()
    q.stop()
    indexBands.unpersist(blocking = false)
    indexSigs.unpersist(blocking = false)
    val byBest = Window.partitionBy("delta_id")
      .orderBy(col("est_jaccard").desc, col("index_id").asc)
    val best = spark.table("w15_matches")
      .dropDuplicates("delta_id", "index_id") // multi-band collisions
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(byBest))
      .groupBy("delta_id")
      .agg(count(lit(1)).as("n_index_matches"),
        max(when(col("rn") === 1, col("index_id"))).as("best_match_id"),
        max(when(col("rn") === 1, col("est_jaccard"))).as("best_est_jaccard"))
    batchDocs.where(isDelta).select("doc_id")
      .join(best.withColumnRenamed("delta_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_index_matches"), lit(0L)).as("n_index_matches"),
        coalesce(col("best_match_id"), lit(-1L)).as("best_match_id"),
        coalesce(col("best_est_jaccard"), lit(0.0)).as("best_est_jaccard"),
        col("n_index_matches").isNull.as("keep"))
  }

  def qIncrementalAdmissionStream(spark: SparkSession, sfDir: String): DataFrame =
    replayIncrementalAdmission(spark, docSrcDir(sfDir))
}
