package graft

import graft.operators.Multimodal
import graft.streaming.EventStream
import org.apache.spark.sql.functions.{col, count, lit}

/** Streaming parity and multimodal plumbing specs. */
class StreamingMultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("streaming daily counts replay == batch equivalent") {
    val batch = EventStream.dailyCountsBatch(spark, sf0001)
      .orderBy("date", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    // the file stream source wants a directory: stage the fixture in a tmp dir
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStream.replayToMemory(spark, dir.toString)
      .orderBy("date", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(streamed == batch)
  }

  test("stream-static enrichment join replay == batch join; no event lost") {
    import org.apache.spark.sql.functions.{col, count, date_format, lit}
    val out = EventStream.qStreamEnriched(spark, sf0001)
      .orderBy("date", "mktsegment")
      .as[(String, String, Long)].collect().toSeq
    val batch = Tables.events(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("user_id") === col("c_custkey"))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("date"),
        col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("n"))
      .orderBy("date", "mktsegment")
      .as[(String, String, Long)].collect().toSeq
    assert(out == batch)
    // every event carries a matching dim row in this fixture, so the inner
    // join must not shrink the stream
    assert(out.map(_._3).sum == Tables.events(spark, sf0001).count())
  }

  test("sessionize: relational lag/cumsum form == session_window form") {
    val rel = EventStream.sessionizeBatch(spark, sf0001)
      .select("user_id", "session_start", "n_events", "total_value")
      .orderBy("user_id", "session_start")
      .as[(Long, String, Long, Double)].collect().toSeq
    val sw = EventStream.sessionWindowBatch(spark, sf0001)
      .select("user_id", "session_start", "n_events", "total_value")
      .orderBy("user_id", "session_start")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(rel.nonEmpty && rel == sw)
  }

  test("streaming session_window emits only watermark-closed sessions consistent with batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.sessionWindowStream(spark, dir.toString)
      .writeStream.outputMode("append").format("memory").queryName("sessions_mem").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_mem")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = EventStream.sessionWindowBatch(spark, sf0001)
      .as[(Long, String, Long, Double)].collect().toSet
    // append mode holds back sessions the watermark has not closed; all
    // emitted rows must be exact batch sessions.
    assert(streamed.subsetOf(batch))
  }

  test("streaming top-k words across micro-batches == batch sketch") {
    // stage the corpus as THREE files so the summary state merges across
    // three micro-batches (maxFilesPerTrigger=1), not within one
    val dir = java.nio.file.Files.createTempDirectory("graft-topw")
    Tables.documents(spark, sf0001).repartition(3)
      .write.mode("overwrite").parquet(dir.toString)
    val streamed = graft.streaming.DocStream.replayTopWords(spark, dir.toString)
      .as[(String, Long)].collect().toSeq
    val batch = graft.operators.DocOps.topWordsSketch(spark, sf0001)
      .as[(String, Long)].collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming dedup drops cross-microbatch duplicates within the watermark") {
    // stage the fixture TWICE: every event arrives again in a later
    // micro-batch (maxFilesPerTrigger=1), all within the 1h watermark
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events_a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events_b.parquet"))
    val streamed = EventStream.replayDedup(spark, dir.toString)
      .as[(Long, Long, String, Double)].collect().toSeq
    val batch = EventStream.dedupBatch(spark, sf0001)
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(streamed.map(_._1).distinct.size == streamed.size, "emitted a duplicate event_id")
    assert(streamed.sortBy(_._1) == batch.sortBy(_._1))
  }

  test("flatMapGroupsWithState sessions: every emitted session is a batch session") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmgs")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStream.replaySessionFlatMap(spark, dir.toString)
      .as[(Long, String, Long, Double)].collect().toSeq
    val batch = EventStream.sessionizeBatch(spark, sf0001)
      .select("user_id", "session_start", "n_events", "total_value")
      .as[(Long, String, Long, Double)].collect().toSet
    // sessions still open at end-of-stream never time out; everything that
    // DID emit must be an exact batch session, with no duplicates, and the
    // watermark must have closed a substantial share
    assert(streamed.distinct.size == streamed.size)
    assert(streamed.toSet.subsetOf(batch),
      s"streamed sessions not in batch: ${streamed.toSet -- batch}")
    assert(streamed.size >= batch.size / 2,
      s"too few closed sessions: ${streamed.size} of ${batch.size}")
  }

  test("stream-stream interval join replay == batch interval join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vcjoin")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStream.replayViewClickJoin(spark, dir.toString)
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = EventStream.viewClickJoinBatch(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    // inner stream-stream join emits on match arrival: replay to completion
    // must produce exactly the batch join
    assert(streamed == batch)
  }

  test("mapGroupsWithState user stats replay == batch per-user counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ustats")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStream.replayUserStats(spark, dir.toString)
      .select("user_id", "n_events", "n_purchases")
      .as[(Long, Long, Long)].collect().toMap2
    val batch = Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when($"event_type" === "purchase", 1L).otherwise(0L)).as("p"))
      .as[(Long, Long, Long)].collect().toMap2
    assert(streamed == batch)
  }

  implicit class TripleMap(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("stateless quality filters run unchanged under structured streaming") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qstream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/documents.parquet"),
      dir.resolve("documents.parquet"))
    val batchDocs = spark.read.parquet(s"$sf0001/documents.parquet")
    val streamDocs = spark.readStream.schema(batchDocs.schema).parquet(dir.toString)
    // the same operator plan runs in both modes — no streaming-specific code
    val q = graft.operators.TextQuality.gopherRules(streamDocs)
      .writeStream.outputMode("append").format("memory")
      .queryName("gopher_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("gopher_stream").orderBy("doc_id").collect().toSeq
    val batch = graft.operators.TextQuality.gopherRules(batchDocs)
      .orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming quality gate replay == batch gate; gate partitions the corpus") {
    val gated = graft.streaming.DocStream.qQualityGate(spark, sf0001)
      .orderBy("source", "accepted").collect().toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val batch = graft.operators.TextQuality.qualityScore(docs, keep = Seq("source"))
      .select(col("source"), (col("quality") >= 0.6).as("accepted"))
      .groupBy("source", "accepted").agg(count(lit(1)).as("n"))
      .orderBy("source", "accepted").collect().toSeq
    assert(gated == batch)
    // every document is counted exactly once across the accept/reject split
    assert(gated.map(_.getAs[Long]("n")).sum == docs.count())
  }

  test("qualityScore keep-columns do not change the x10 output shape") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val base = graft.operators.TextQuality.qualityScore(docs)
    assert(base.columns.toSeq == Seq("doc_id", "n_chars_measured", "n_words",
      "punct_ratio", "stopword_ratio", "quality"))
    val kept = graft.operators.TextQuality.qualityScore(docs, keep = Seq("source"))
    assert(kept.columns.toSeq == base.columns.toSeq :+ "source")
    // identical scores either way
    assert(kept.drop("source").orderBy("doc_id").collect().toSeq ==
           base.orderBy("doc_id").collect().toSeq)
  }

  test("multimodal: decoded metadata matches payload bytes") {
    val metas = Multimodal.extractMeta(Multimodal.syntheticAssets(spark, sf0001))
      .collect()
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(metas.nonEmpty)
    metas.foreach { m =>
      assert(m.n_bytes == docs(m.asset_id)) // ascii corpus: bytes == chars
      assert(m.width >= 1 && m.width <= 64 && m.height >= 1 && m.height <= 64)
    }
  }

  test("multimodal: resize emits exactly w*h bytes for every image asset") {
    val resized = Multimodal.resize(Multimodal.syntheticAssets(spark, sf0001), 8, 8).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(r => r.payload.length == 64 && r.width == 8 && r.height == 8))
    val imageIds = Multimodal.syntheticAssets(spark, sf0001)
      .filter(_.kind == "image").map(_.asset_id).collect().toSet
    assert(resized.map(_.asset_id).toSet == imageIds)
  }

  test("multimodal: feature vectors have fixed dim, are normalized and deterministic") {
    val f1 = Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, sf0001))
      .collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, sf0001))
      .collect().sortBy(_.asset_id)
    assert(f1.nonEmpty && f1.forall(_.features.length == 16))
    // histogram over all bytes, divided by byte count → sums to ~1
    assert(f1.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3))
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  test("multimodal: frame sampling only on video assets, every 4th 64-byte chunk") {
    val frames = Multimodal.sampleFrames(Multimodal.syntheticAssets(spark, sf0001)).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    assert(frames.forall(f => f.offset == f.frame_idx.toLong * 64))
    val videoIds = Multimodal.syntheticAssets(spark, sf0001)
      .filter(_.kind == "video").map(_.asset_id).collect().toSet
    assert(frames.map(_.asset_id).toSet.subsetOf(videoIds))
  }

  test("multimodal exact dedup: identical payloads group across kinds, " +
       "lowest id keeps, distinct payloads stay singletons") {
    val payload = "shared binary payload".getBytes("UTF-8")
    val assets = Seq(
      Multimodal.Asset(0L, "image", payload),
      Multimodal.Asset(1L, "audio", payload.clone()), // same bytes, other kind
      Multimodal.Asset(2L, "video", "different bytes".getBytes("UTF-8")),
      Multimodal.Asset(3L, "image", payload.clone())).toDS()
    val out = Multimodal.exactAssetDups(assets)
      .select("asset_id", "family_size", "keep_id", "is_duplicate")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(out(0) == ((0L, 3L, 0L, false)))
    assert(out(1) == ((1L, 3L, 0L, true)))
    assert(out(2) == ((2L, 1L, 2L, false)))
    assert(out(3) == ((3L, 3L, 0L, true)))
  }

  /** Encode a w×h raster as a real BMP via the pure-JVM codec. */
  private def bmpBytes(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos), "JVM must ship a BMP writer")
    bos.toByteArray
  }

  test("multimodal: BMP assets decode FOR REAL — true raster dimensions, " +
       "pixel-content checksum, genuine luminance resample, decoded features") {
    // 6×4 gradient, a byte-identical twin, a different image, and a payload
    // with a BMP magic that does NOT parse (must fall back to the stub)
    def grad(x: Int, y: Int): Int = ((x * 37 + y * 11) % 256) * 0x010101
    val a = bmpBytes(6, 4)(grad)
    val b = bmpBytes(6, 4)((x, y) => grad(x, y) ^ 0x0000FF)
    val white = bmpBytes(4, 4)((_, _) => 0xFFFFFF)
    val junk = "BM but not actually a bitmap payload".getBytes("UTF-8")
    val assets = Seq(
      Multimodal.Asset(0L, "image", a),
      Multimodal.Asset(1L, "image", a.clone()),
      Multimodal.Asset(2L, "image", b),
      Multimodal.Asset(3L, "image", white),
      Multimodal.Asset(4L, "image", junk)).toDS()

    // m2 path: REAL dimensions (the stub would derive ≤64 fake dims from
    // the first two bytes — 'B','M' would give 3×14 for every BMP)
    val metas = Multimodal.extractMeta(assets).collect().sortBy(_.asset_id)
    assert(metas(0).width == 6 && metas(0).height == 4)
    assert(metas(3).width == 4 && metas(3).height == 4)
    // checksum is over decoded PIXELS: byte-identical twins agree, a
    // one-channel flip changes it
    assert(metas(0).checksum == metas(1).checksum)
    assert(metas(0).checksum != metas(2).checksum)
    // unparseable magic falls back to the stub, no crash
    assert(metas(4).width == ('B' & 0x3F) + 1 && metas(4).height == ('M' & 0x3F) + 1)

    // m4 path: resample reads the decoded raster — an all-white image
    // resizes to all-255 luminance bytes, which no container-byte sampling
    // could produce (BMP headers contain zeros)
    val resized = Multimodal.resize(assets, 2, 2).collect()
      .map(r => r.asset_id -> r.payload).toMap
    assert(resized(3L).forall(b => (b & 0xFF) == 255))
    // nearest-neighbor on the gradient: pixel (0,0) lum = grad(0,0) = 0
    assert((resized(0L)(0) & 0xFF) == 0)

    // m5 path: features histogram the decoded luminance — all-white lands
    // its whole mass in the top bucket
    val feats = Multimodal.extractFeatures(assets).collect()
      .map(f => f.asset_id -> f.features).toMap
    assert(feats(3L)(15) == 1.0f && feats(3L).slice(0, 15).forall(_ == 0.0f))

    // m6 path: content families group on decoded pixel identity
    val dups = Multimodal.exactAssetDups(assets)
      .select("asset_id", "family_size", "keep_id", "is_duplicate")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(dups(0) == ((0L, 2L, 0L, false)) && dups(1) == ((1L, 2L, 0L, true)))
    assert(dups(2)._2 == 1L && dups(3)._2 == 1L && dups(4)._2 == 1L)
  }

  test("multimodal: PNG and JPEG assets decode FOR REAL through the same " +
       "seam, kind gates the decoder, content identity crosses containers") {
    def encode(fmt: String, w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JVM must ship a $fmt writer")
      bos.toByteArray
    }
    def grad(x: Int, y: Int): Int = ((x * 37 + y * 11) % 256) * 0x010101
    val png = encode("png", 6, 4)(grad)
    val jpg = encode("jpg", 5, 7)(grad)
    val bmp = encode("bmp", 6, 4)(grad)
    assert(png(0) == 0x89.toByte && jpg(0) == 0xFF.toByte, "real containers")
    val assets = Seq(
      Multimodal.Asset(0L, "image", png),
      Multimodal.Asset(1L, "image", jpg),
      Multimodal.Asset(2L, "image", bmp),
      // same PNG bytes under a non-image kind: the typed kind column, not
      // payload sniffing, selects the decoder — this must take the fake
      Multimodal.Asset(3L, "audio", png.clone())).toDS()
    val metas = Multimodal.extractMeta(assets).collect()
      .map(m => m.asset_id -> m).toMap
    // true raster dimensions from both containers (the stub would derive
    // fake dims from the first two bytes)
    assert(metas(0L).width == 6 && metas(0L).height == 4, "PNG real dims")
    assert(metas(1L).width == 5 && metas(1L).height == 7, "JPEG real dims")
    // PNG is lossless: the same raster through PNG and BMP containers has
    // the same decoded-pixel checksum — content identity, not bytes
    // (m6's family key also folds n_bytes, so cross-container twins stay
    // separate families there; the checksum column is the content signal)
    assert(metas(0L).checksum == metas(2L).checksum,
      "PNG and BMP encodings of one raster are the same content")
    // kind gating: identical PNG bytes under kind=audio take the fake path
    assert(metas(3L).width == (png(0) & 0x3F) + 1 &&
      metas(3L).height == (png(1) & 0x3F) + 1,
      "non-image kind must not decode as an image")
    // m4: resample reads the real decoded raster for both formats
    val resized = Multimodal.resize(assets, 2, 2).collect()
      .map(r => r.asset_id -> r.payload).toMap
    assert((resized(0L)(0) & 0xFF) == 0, "PNG gradient pixel (0,0) lum = 0")
    assert(resized.contains(1L) && !resized.contains(3L))
  }

  test("multimodal: WAV assets decode FOR REAL — container sample rate, " +
       "channels, sample width, frame length; non-WAV falls to the fake") {
    import javax.sound.sampled._
    def wavBytes(rateHz: Float, bits: Int, channels: Int,
                 nFrames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rateHz, bits, channels, true, false)
      val frameSize = channels * bits / 8
      val pcm = Array.tabulate[Byte](nFrames * frameSize)(i => (i * 31 % 127).toByte)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val assets = Seq(
      Multimodal.Asset(0L, "audio", wavBytes(16000f, 16, 1, 1600)),
      Multimodal.Asset(1L, "audio", wavBytes(8000f, 8, 2, 400)),
      Multimodal.Asset(2L, "audio", "RIFFxxxxWAVE but not a real container".getBytes("UTF-8")),
      Multimodal.Asset(3L, "audio", "plain text payload here".getBytes("UTF-8")),
      Multimodal.Asset(4L, "image", wavBytes(16000f, 16, 1, 10))) // wrong kind: excluded
    .toDS()
    val metas = Multimodal.extractAudioMeta(assets).collect()
      .map(m => m.asset_id -> m).toMap
    // real container fields, not byte-derived fakes
    assert(metas(0L).sample_rate == 16000 && metas(0L).channels == 1 &&
      metas(0L).bits == 16 && metas(0L).n_frames == 1600 &&
      metas(0L).duration_ms == 100)
    assert(metas(1L).sample_rate == 8000 && metas(1L).channels == 2 &&
      metas(1L).bits == 8 && metas(1L).n_frames == 400 &&
      metas(1L).duration_ms == 50)
    // RIFF magic that does not parse falls back to the fake (byte math,
    // no crash): 'R' = 82 -> 8000*(1+(82&3)) = 24000
    assert(metas(2L).sample_rate == 24000)
    // plain payloads take the fake branch; 'p' = 112 -> 8000*(1+(112&3)) = 8000
    assert(metas(3L).sample_rate == 8000)
    // only audio-kind assets are described
    assert(!metas.contains(4L) && metas.size == 4)
  }
}
