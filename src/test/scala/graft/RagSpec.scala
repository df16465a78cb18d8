package graft

import graft.operators.Rag
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RagSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private val query = "spark streaming window join query performance"

  test("chunkRows: windows step by chunkSize - overlap, ids are doc-scoped") {
    // 40 tokens, chunkSize 8, overlap 2 -> step 6 -> starts 0,6,...,36 (7 chunks);
    // the last window is a 4-token tail (slice past the end is short, not
    // padded). Tokens must be letter-only: WordPattern is \b[a-z]{3,}\b.
    val text = (0 until 40)
      .map(i => s"tok${('a' + i / 26).toChar}${('a' + i % 26).toChar}").mkString(" ")
    val chunks = Rag.chunkRows(corpus(Seq((3L, text))), chunkSize = 8, overlap = 2)
      .select(col("vec_id"), col("label"), size(col("toks")).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(chunks.map(_._1).toSeq == (0 to 6).map(3L * Rag.ChunkIdStride + _))
    assert(chunks.forall(_._2 == 3L))
    assert(chunks.map(_._3).toSeq == Seq(8, 8, 8, 8, 8, 8, 4))
  }

  test("chunkRows: a short document still yields exactly one chunk") {
    val chunks = Rag.chunkRows(corpus(Seq((1L, "tiny doc only four tokens"))))
      .collect()
    assert(chunks.length == 1)
    assert(chunks.head.getLong(0) == 1L * Rag.ChunkIdStride)
  }

  test("rag retrieve: the query-saturated doc wins, unrelated doc trails") {
    val docs = corpus(Seq(
      (1L, "spark streaming window join query performance spark streaming window join query performance spark streaming window join query performance"),
      (2L, "spark streaming data processing with window functions at scale"),
      (3L, "cooking pasta recipes with tomato and basil sauce tonight"),
      (4L, "join performance tuning for window queries in spark clusters"),
      (5L, "streaming query engines and their performance characteristics today")))
    val out = Rag.ragRetrieve(spark, docs, query,
      nCells = 2, nprobe = 2, iters = 2).collect()
    assert(out.head.getLong(0) == 1L, "both-arm leader must fuse to rank 1")
    // the pasta doc shares no query term: the lexical arm never sees it
    // (BM25 = 0), and with only the ANN arm's pool rank it fuses last
    val pasta = out.find(_.getLong(0) == 3L)
    pasta.foreach { r =>
      assert(r.isNullAt(1), "no shared term -> null lex_rank")
      assert(out.last.getLong(0) == 3L, "sem-only doc fuses below both-arm docs")
    }
  }

  test("rrf_score is the 6-dp sum of the per-arm reciprocal ranks") {
    val docs = corpus(Seq(
      (1L, "spark streaming window join query performance"),
      (2L, "spark window join latency tuning knobs"),
      (3L, "query performance and join strategies for streams"),
      (4L, "streaming window aggregation performance notes")))
    val rows = Rag.ragRetrieve(spark, docs, query, nCells = 2, nprobe = 2,
        iters = 2)
      .select("lex_rank", "sem_rank", "rrf_score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lex = if (r.isNullAt(0)) 0.0 else 1.0 / (Rag.RrfK + r.getLong(0))
      val sem = if (r.isNullAt(1)) 0.0 else 1.0 / (Rag.RrfK + r.getLong(1))
      assert(math.abs(r.getDouble(2) - BigDecimal(lex + sem)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }

  test("out-of-corpus query terms drop out of the embedding space") {
    val docs = corpus(Seq(
      (1L, "spark streaming window join query performance metrics"),
      (2L, "spark window join latency and throughput numbers"),
      (3L, "unrelated gardening advice about roses and tulips blooming")))
    // 'zzzunseen' appears in no document: the idf join drops it, so the
    // result must equal the same query without it
    val a = Rag.ragRetrieve(spark, docs, query + " zzzunseen",
      nCells = 2, nprobe = 2, iters = 2).collect().toSeq
    val b = Rag.ragRetrieve(spark, docs, query,
      nCells = 2, nprobe = 2, iters = 2).collect().toSeq
    assert(a == b)
  }

  test("rag retrieve is deterministic across runs on the sf fixture") {
    val docs = Tables.documents(spark, sf0001)
    val a = Rag.ragRetrieve(spark, docs).collect().toSeq
    val b = Rag.ragRetrieve(spark, docs).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size <= Rag.TopK)
  }
}
