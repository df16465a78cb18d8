package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines (beyond-reference
  * pack): image/audio/video assets as opaque `binary` columns with typed
  * metadata, batch-decoded per partition.
  *
  * Decode dispatch: image payloads in the formats the bare JVM ships
  * codecs for — BMP, PNG, JPEG, and GIF via `javax.imageio` — decode FOR
  * REAL ([[ImageIoDecoder]] — true raster dimensions, pixel-content
  * checksum, genuine nearest-neighbor resampling), WAV audio decodes via
  * `javax.sound.sampled` ([[WavDecoder]]); video (genuinely ffmpeg
  * territory — no pure-JVM codec exists) is STUBBED behind
  * [[FakeDecoder]], a deterministic byte-inspection fake with the same
  * signature a real decoder would have. The decoder is selected by the
  * asset's typed `kind` column first (payload sniffing alone must not
  * route an audio payload down the image path), then by payload magic.
  * Everything Spark-side is real and tested either way: the asset schema,
  * the `Dataset[Asset].mapPartitions` batch shape (decoder initialized once
  * per partition, exactly how a heavyweight codec handle should be scoped
  * on an executor), partition sizing by byte budget, and frame-sampling
  * fan-out.
  */
object Multimodal {

  case class Asset(asset_id: Long, kind: String, payload: Array[Byte])
  case class AssetMeta(asset_id: Long, kind: String, n_bytes: Long,
                       width: Int, height: Int, checksum: Long)
  case class Frame(asset_id: Long, frame_idx: Int, offset: Long, frame_bytes: Array[Byte])

  /** REAL decoder for the image families the bare JVM ships codecs for:
    * BMP, PNG, JPEG, and GIF via `javax.imageio` (no native libs
    * required). Payloads whose magic matches and parse cleanly decode for
    * real — true raster dimensions, a checksum over the decoded PIXELS
    * (content identity of the image, not its container bytes), and
    * genuine nearest-neighbor resampling of the decoded raster.
    * Everything else falls through to [[FakeDecoder]], so the
    * corpus-wide plumbing keeps one signature while the mainstream image
    * formats exercise a real decode path end-to-end.
    */
  object ImageIoDecoder {
    def hasImageMagic(p: Array[Byte]): Boolean =
      p.length > 3 &&
        ((p(0) == 'B'.toByte && p(1) == 'M'.toByte) ||                 // BMP
         (p(0) == 0x89.toByte && p(1) == 'P'.toByte &&
          p(2) == 'N'.toByte && p(3) == 'G'.toByte) ||                 // PNG
         (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte &&
          p(2) == 0xFF.toByte) ||                                      // JPEG
         (p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
          p(2) == 'F'.toByte && p(3) == '8'.toByte))                   // GIF

    def tryDecode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (!hasImageMagic(payload)) None
      else
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        catch { case _: Throwable => None }

    /** (width, height, checksum-over-pixels): two BMPs with different
      * container bytes but equal rasters are the SAME content — the
      * property a content-addressed asset store dedups on.
      */
    def meta(img: java.awt.image.BufferedImage): (Int, Int, Long) = {
      var ck = 1125899906842597L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          ck = ck * 31 + (img.getRGB(x, y) & 0xFFFFFF)
          x += 1
        }
        y += 1
      }
      (img.getWidth, img.getHeight, ck)
    }

    /** Nearest-neighbor luminance resample of the decoded raster to a
      * w×h byte grid (ITU-R 601 integer weights — deterministic).
      */
    def grayResize(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](w * h)
      var i = 0
      while (i < out.length) {
        val sx = ((i % w).toLong * img.getWidth / w).toInt
        val sy = ((i / w).toLong * img.getHeight / h).toInt
        val rgb = img.getRGB(sx, sy)
        val lum = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000
        out(i) = lum.toByte
        i += 1
      }
      out
    }
  }

  /** REAL decoder for the one audio family the bare JVM ships a codec
    * for: RIFF/WAVE PCM via `javax.sound.sampled` — true sample rate,
    * channel count, sample width, and frame length from the actual
    * container. Non-WAV payloads fall through to the deterministic fake
    * in [[extractAudioMeta]]. The [[ImageIoDecoder]] counterpart for the
    * image seam.
    */
  object WavDecoder {
    def isWav(p: Array[Byte]): Boolean =
      p.length > 12 &&
        p(0) == 'R'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte &&
        p(3) == 'F'.toByte && p(8) == 'W'.toByte && p(9) == 'A'.toByte &&
        p(10) == 'V'.toByte && p(11) == 'E'.toByte

    /** (sample_rate, channels, bits, n_frames) — None when the magic is
      * absent or the container does not parse.
      */
    def tryDecode(p: Array[Byte]): Option[(Int, Int, Int, Long)] =
      if (!isWav(p)) None
      else
        try {
          val ais = javax.sound.sampled.AudioSystem
            .getAudioInputStream(new java.io.ByteArrayInputStream(p))
          try {
            val f = ais.getFormat
            Some((f.getSampleRate.toInt, f.getChannels,
              f.getSampleSizeInBits, ais.getFrameLength))
          } finally ais.close()
        } catch { case _: Throwable => None }
  }

  /** STUB decoder — deterministic byte inspection standing in for a codec.
    * A real deployment replaces `decodeMeta`/`sampleFrames` bodies with
    * libjpeg/ffmpeg calls; the call sites, batching and schemas stay as-is.
    * [[ImageIoDecoder]] front-runs it for BMP payloads.
    */
  object FakeDecoder {
    def decodeMeta(payload: Array[Byte]): (Int, Int, Long) = {
      val w = if (payload.isEmpty) 0 else (payload(0) & 0x3F) + 1
      val h = if (payload.length < 2) 0 else (payload(1) & 0x3F) + 1
      var ck = 1125899906842597L
      var i = 0
      while (i < payload.length) { ck = ck * 31 + payload(i); i += 1 }
      (w, h, ck)
    }
    def sampleFrames(payload: Array[Byte], every: Int): Iterator[(Int, Long, Array[Byte])] =
      payload.grouped(every).zipWithIndex.collect {
        case (chunk, idx) if idx % 4 == 0 => (idx, idx.toLong * every, chunk)
      }
  }

  /** Synthesize an assets table from the documents corpus (UTF-8 payloads)
    * — the container ships no binary media, so tests and queries exercise
    * the plumbing on deterministic bytes.
    */
  def syntheticAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[Asset]
  }

  /** Metadata extraction: one decoder per partition, streamed batches —
    * the canonical executor-side shape for codec-bound work.
    */
  def extractMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: val codec = Codec.open() — once per partition
      it.map { a =>
        // kind gates the decoder: payload sniffing alone must not route an
        // audio/video payload whose bytes happen to parse as an image down
        // the image path — the typed metadata column selects the codec
        val (w, h, ck) = (if (a.kind == "image")
            ImageIoDecoder.tryDecode(a.payload) else None)
          .map(ImageIoDecoder.meta)
          .getOrElse(FakeDecoder.decodeMeta(a.payload))
        AssetMeta(a.asset_id, a.kind, a.payload.length.toLong, w, h, ck)
      }
    }
  }

  /** Frame sampling fan-out: video assets → every-4th 64-byte frame. */
  def sampleFrames(assets: Dataset[Asset], frameBytes: Int = 64): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      FakeDecoder.sampleFrames(a.payload, frameBytes).map {
        case (idx, off, bytes) => Frame(a.asset_id, idx, off, bytes)
      }
    }
  }

  case class AudioMeta(asset_id: Long, kind: String, n_bytes: Long,
                       sample_rate: Long, channels: Long, bits: Long,
                       n_frames: Long, duration_ms: Long)

  /** Audio metadata for the `audio`-kind assets: WAV payloads decode FOR
    * REAL ([[WavDecoder]] — the container's true format chunk and frame
    * length); everything else derives a deterministic fake from the
    * payload's first bytes (SQL-replicable integer arithmetic, so the
    * registered query keeps a DuckDB oracle). Same per-partition batch
    * shape as [[extractMeta]].
    */
  def extractAudioMeta(assets: Dataset[Asset]): Dataset[AudioMeta] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.map { a =>
        val n = a.payload.length.toLong
        val (sr, ch, bits, frames) = WavDecoder.tryDecode(a.payload).getOrElse {
          if (n < 3) (0, 0, 0, 0L)
          else {
            val sr = 8000 * (1 + (a.payload(0) & 3))
            val ch = 1 + (a.payload(1) & 1)
            val bits = 8 * (1 + (a.payload(2) & 1))
            (sr, ch, bits, n / (ch * bits / 8))
          }
        }
        val durMs = if (sr == 0) 0L else frames * 1000L / sr
        AudioMeta(a.asset_id, a.kind, n, sr.toLong, ch.toLong, bits.toLong,
          frames, durMs)
      }
    }
  }

  case class ResizedAsset(asset_id: Long, kind: String, width: Int, height: Int,
                          payload: Array[Byte])
  case class AssetFeatures(asset_id: Long, kind: String, features: Array[Float])

  /** Resize: stub nearest-neighbor "resample" to a fixed `w`×`h` byte grid
    * (a real impl swaps the body for the codec's scaler; the per-partition
    * batch shape and output schema are the contract).
    */
  def resize(assets: Dataset[Asset], w: Int = 8, h: Int = 8): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      it.map { a =>
        val out = ImageIoDecoder.tryDecode(a.payload) match {
          case Some(img) => ImageIoDecoder.grayResize(img, w, h) // real resample
          case None =>
            val stub = new Array[Byte](w * h)
            val n = a.payload.length
            var i = 0
            while (i < stub.length) {
              stub(i) = if (n == 0) 0 else a.payload((i.toLong * n / stub.length).toInt)
              i += 1
            }
            stub
        }
        ResizedAsset(a.asset_id, a.kind, w, h, out)
      }
    }
  }

  /** Feature extraction: stub `dim`-float embedding per asset (deterministic
    * byte-histogram projection — a real impl calls the vision/audio model
    * here). Output feeds [[VectorSearch]] directly.
    */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 16): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: model session initialized once per partition
      it.map { a =>
        // decodable image-KIND assets featurize over the DECODED luminance
        // raster; everything else histograms the raw bytes (the stub path)
        val bytes = (if (a.kind == "image")
            ImageIoDecoder.tryDecode(a.payload) else None)
          .map(img => ImageIoDecoder.grayResize(img, img.getWidth, img.getHeight))
          .getOrElse(a.payload)
        val f = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) {
          f(((bytes(i) & 0xFF) * dim / 256) % dim) += 1.0f
          i += 1
        }
        val n = math.max(bytes.length, 1).toFloat
        var j = 0
        while (j < dim) { f(j) /= n; j += 1 }
        AssetFeatures(a.asset_id, a.kind, f)
      }
    }
  }

  // --- query entries ---

  /** Byte/metadata columns expressible relationally (oracle-checkable):
    * size, sha256, first-byte-derived fake dimensions — the column-level
    * mirror of [[extractMeta]].
    */
  def qAssetMeta(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      sha2(col("text").cast("binary"), 256).as("sha256"),
      (ascii(col("text")) % 64 + 1).cast("long").as("fake_width"),
      (ascii(substring(col("text"), 2, 1)) % 64 + 1).cast("long").as("fake_height"))

  /** The mapPartitions decode path itself (rows-only check — stub decoder
    * has no SQL equivalent).
    */
  def qDecodedMeta(spark: SparkSession, sfDir: String): DataFrame =
    extractMeta(syntheticAssets(spark, sfDir)).toDF()

  def qFrames(spark: SparkSession, sfDir: String): DataFrame =
    sampleFrames(syntheticAssets(spark, sfDir)).toDF()
      .select(col("asset_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("offset"), length(col("frame_bytes")).cast("long").as("n_bytes"))

  def qResized(spark: SparkSession, sfDir: String): DataFrame =
    resize(syntheticAssets(spark, sfDir)).toDF()
      .select(col("asset_id"), col("width"), col("height"),
        length(col("payload")).cast("long").as("n_bytes"))

  /** Long-form feature dump: one row per (asset, bucket) with the float32
    * histogram value. Oracle-checkable because the whole float path is
    * replicable: the bucket counts are exact integers (float32 increments
    * stay exact below 2^24), the single float32 division k/n is IEEE-754
    * binary32 in any engine (DuckDB REAL division verified bit-identical
    * to JVM float), and the double widening is exact — no accumulation
    * order anywhere.
    */
  def qFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(syntheticAssets(spark, sfDir)).toDF()
      .select(col("asset_id"), col("kind"),
        posexplode(transform(col("features"), x => x.cast("double")))
          .as(Seq("bucket", "f")))
      .select(col("asset_id"), col("kind"),
        col("bucket").cast("long").as("bucket"), round(col("f"), 6).as("f"))

  /** Exact multimodal dedup by decoded content identity (m6) — the x1
    * digest pass for binary assets: group on (n_bytes, checksum) from the
    * per-partition decode, keep the lowest asset_id per family, flag the
    * rest. Content identity deliberately ignores `kind` — the same bytes
    * ingested under two modalities is still one payload, which is how
    * content-addressed asset stores dedup. The checksum is the
    * [[FakeDecoder]] rolling hash (a real deployment uses the codec's
    * content digest); the grouping/keep plumbing is the real contract.
    *
    * Scale shape: identical to [[Dedup.exactDuplicates]] — one hash
    * shuffle on the (n_bytes, checksum) key, a broadcast-size family
    * frame joined back, never any pairwise comparison.
    */
  def exactAssetDups(assets: Dataset[Asset]): DataFrame = {
    val meta = extractMeta(assets).toDF()
      .select(col("asset_id"), col("kind"), col("n_bytes"), col("checksum"))
    val families = meta.groupBy("n_bytes", "checksum")
      .agg(count(lit(1)).as("family_size"), min("asset_id").as("keep_id"))
    meta.join(families, Seq("n_bytes", "checksum"))
      .select(col("asset_id"), col("kind"), col("n_bytes"), col("checksum"),
        col("family_size"), col("keep_id"),
        (col("asset_id") =!= col("keep_id")).as("is_duplicate"))
  }

  def qExactAssetDups(spark: SparkSession, sfDir: String): DataFrame =
    exactAssetDups(syntheticAssets(spark, sfDir))

  def qAudioMeta(spark: SparkSession, sfDir: String): DataFrame =
    extractAudioMeta(syntheticAssets(spark, sfDir)).toDF()
}
