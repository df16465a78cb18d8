package graft

import graft.operators.Multimodal
import graft.streaming.EventStream

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

  test("multimodal: frame sampling only on video assets, every 4th 64-byte chunk") {
    val frames = Multimodal.sampleFrames(Multimodal.syntheticAssets(spark, sf0001)).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    assert(frames.forall(f => f.offset == f.frame_idx.toLong * 64))
    val videoIds = Multimodal.syntheticAssets(spark, sf0001)
      .filter(_.kind == "video").map(_.asset_id).collect().toSet
    assert(frames.map(_.asset_id).toSet.subsetOf(videoIds))
  }
}
