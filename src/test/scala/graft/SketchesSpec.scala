package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** KMV distinct sketch (x56): exact below k, estimator accuracy at the
  * theoretical stderr above k, and the estimate's determinism.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // letter-only words (the tokenizer drops digits): aaa, aab, ... — i.e.
  // base-26 in three letters, distinct for i < 17576
  private def word(i: Int): String =
    f"w${('a' + i / 676).toChar}${('a' + i / 26 % 26).toChar}${('a' + i % 26).toChar}"

  private def corpus(nDocs: Int, wordsPerDoc: Int, nSources: Int) = {
    val rows = (0 until nDocs).map { d =>
      val text = (0 until wordsPerDoc)
        .map(j => word(d * wordsPerDoc + j)).mkString(" ")
      (d.toLong, text, s"s${d % nSources}")
    }
    rows.toDF("doc_id", "text", "source")
  }

  test("groups smaller than k report the exact count with zero error") {
    val out = Sketches.kmvShingleDistinct(corpus(6, 20, 2), k = 256).collect()
    assert(out.length == 2)
    for (r <- out) {
      assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_distinct"))
      assert(r.getAs[Double]("est_distinct") == r.getAs[Long]("n_distinct").toDouble)
      assert(r.getAs[Double]("rel_err") == 0.0)
    }
  }

  test("above k the estimator lands within a few stderr of the truth") {
    // ~40 docs x ~58 distinct shingles per doc per source, all words unique
    // -> ~2300 distinct shingles per source >> k = 64; stderr ~ 1/sqrt(62)
    // ~ 12.7%, so 4 stderr ~ 51% is a generous non-flaky bound (the hash is
    // fixed, so this is deterministic — the bound just documents magnitude)
    val out = Sketches.kmvShingleDistinct(corpus(80, 60, 2), k = 64).collect()
    assert(out.length == 2)
    for (r <- out) {
      assert(r.getAs[Long]("n_kept") == 64L)
      val exact = r.getAs[Long]("n_distinct").toDouble
      val est = r.getAs[Double]("est_distinct")
      assert(exact > 1000, s"fixture degenerate: only $exact distinct")
      assert(math.abs(est - exact) / exact < 0.51,
        s"estimate $est vs exact $exact drifts beyond 4 stderr")
    }
  }

  test("the estimate is a pure function of the input set (partition-invariant)") {
    val docs = corpus(40, 30, 3)
    val a = Sketches.kmvShingleDistinct(docs.repartition(1), k = 32)
      .orderBy("source").collect().toSeq
    val b = Sketches.kmvShingleDistinct(docs.repartition(13), k = 32)
      .orderBy("source").collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("source overlap: a mirrored source shows containment 1.0, disjoint sources emit no row") {
    // B carries a strict subset of A's documents (a partial mirror); C is
    // vocabulary-disjoint from both
    val docsA = (0 until 6).map(d => (d.toLong,
      (0 until 30).map(j => word(d * 30 + j)).mkString(" "), "A"))
    val docsB = docsA.take(3).map { case (id, t, _) => (id + 100L, t, "B") }
    val docsC = (0 until 4).map(d => (d.toLong + 200L,
      (0 until 30).map(j => word(10000 + d * 30 + j)).mkString(" "), "C"))
    val docs = (docsA ++ docsB ++ docsC).toDF("doc_id", "text", "source")
    val out = Sketches.sourceOverlap(docs).collect()
      .map(r => ((r.getAs[String]("src1"), r.getAs[String]("src2")), r)).toMap
    // only the (A,B) pair shares shingles
    assert(out.keySet == Set(("A", "B")))
    val ab = out(("A", "B"))
    // B ⊂ A: every B shingle is in A
    assert(ab.getAs[Double]("containment") == 1.0)
    assert(ab.getAs[Long]("n_common") == ab.getAs[Long]("n2"))
    assert(ab.getAs[Double]("jaccard") < 1.0 && ab.getAs[Double]("jaccard") > 0.0)
  }

  test("the full-corpus entry emits one row per source") {
    val out = Sketches.qKmvShingleDistinct(spark, sf0001)
    assert(out.count() == out.select("source").distinct().count())
    assert(out.count() > 0)
  }

  test("novelty curve: an all-repeat shard reports zero novelty and the " +
       "cumulative count equals the exact distinct total") {
    // shards of 2: shard 0 = {novel A, novel B}, shard 1 = {copy of A, copy
    // of B} (nothing novel), shard 2 = {novel C, copy of B}
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "ocean tide current wave reef lagoon surf harbor"
    val c = "granite basalt quartz feldspar mica schist gneiss marble"
    val docs = Seq(0L -> a, 1L -> b, 2L -> a, 3L -> b, 4L -> c, 5L -> b)
      .toDF("doc_id", "text")
    val out = Sketches.noveltyCurve(docs, shardWidth = 2L)
      .select("shard", "n_distinct", "n_novel", "novelty_rate", "cum_distinct")
      .as[(Long, Long, Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(0L, 1L, 2L))
    val distinctShingles = out.head._2 // shard 0 holds A∪B, all novel
    assert(out(0)._3 == distinctShingles && out(0)._4 == 1.0)
    assert(out(1)._3 == 0L && out(1)._4 == 0.0)
    assert(out(2)._3 > 0L && out(2)._4 < 1.0)
    // cumulative distinct through the last shard == exact corpus distinct
    val exact = graft.operators.Dedup.distinctShingleHashes(docs)
      .select("h60").distinct().count()
    assert(out.last._5 == exact && out.last._5 == out.map(_._3).sum)
  }

  test("novelty curve on the fixture: cumulative distinct is the running " +
       "novel sum and novelty never exceeds the shard's distinct count") {
    val out = Sketches.qNoveltyCurve(spark, sf0001)
      .select("shard", "n_distinct", "n_novel", "novelty_rate", "cum_distinct")
      .as[(Long, Long, Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(out.nonEmpty && out.head._3 == out.head._2) // first shard all novel
    assert(out.map(_._3).scanLeft(0L)(_ + _).tail == out.map(_._5))
    out.foreach { case (_, d, n, r, _) =>
      assert(n <= d && r >= 0.0 && r <= 1.0)
    }
  }

  test("streaming substring decontamination replay == batch x77") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_contaminated_windows", "first_pos", "clean")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val streamed = rows(graft.streaming.DocStream.qSubstrDecontamStream(spark, sf0001))
    val batch = rows(graft.operators.Dedup.substrDecontaminate(
      Tables.documents(spark, sf0001)))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming incremental admission replay == batch x66") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_index_matches", "best_match_id", "best_est_jaccard", "keep")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    val streamed = rows(
      graft.streaming.DocStream.qIncrementalAdmissionStream(spark, sf0001))
    val batch = rows(graft.operators.Dedup.qIncrementalDedup(spark, sf0001))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming KMV sketch replay == batch x56 estimator columns") {
    val streamed = graft.streaming.DocStream.qKmvStream(spark, sf0001)
      .select("source", "n_kept", "est_distinct")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val batch = Sketches.qKmvShingleDistinct(spark, sf0001)
      .select("source", "n_kept", "est_distinct")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("KMV aggregator: bounded buffer, duplicate-insensitive, merge-order-free") {
    val agg = new graft.functions.KmvSketch.KmvAgg(4)
    val hs = Seq(50L, 10L, 30L, 10L, 20L, 40L, 5L, 50L)
    val folded = hs.foldLeft(agg.zero)(agg.reduce)
    assert(folded.ks == Vector(5L, 10L, 20L, 30L)) // bottom-4 distinct
    val (l, r) = hs.splitAt(3)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == folded)
    assert(agg.finish(folded).n_kept == 4)
  }

  test("term zipf: uniform frequencies give the closed-form alpha, " +
       "a heavy head inflates top_share") {
    // source U: 4 distinct words once each (uniform); source H: one word
    // 9 times plus 3 singletons (heavy head)
    val docs = Seq(
      (0L, "granite basalt quartz feldspar", "U"),
      (1L, ("boiler " * 9) + "valve piston gasket", "H"))
      .toDF("doc_id", "text", "source")
    val out = Sketches.termZipf(docs)
      .select("source", "n_types", "n_tokens", "alpha_mle", "top_share")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val u = out("U")
    assert(u._2 == 4 && u._3 == 4)
    val alphaUniform = 1.0 + 4.0 / (4 * math.log(1 / 0.5))
    assert(math.abs(u._4 - alphaUniform) < 1e-6 && u._5 == 0.25)
    val h = out("H")
    assert(h._2 == 4 && h._3 == 12 && h._5 == 0.75)
    assert(h._4 < u._4) // the heavy head flattens (lowers) alpha
  }

  test("source drift: a source matching the corpus mixture scores near 0, " +
       "a divergent source scores higher; KL is non-negative") {
    // two big prose-alike sources + one tiny divergent jargon source
    val prose = "machine learning models train gradient descent optimizer weights"
    val jargon = "mutex semaphore deadlock spinlock interrupt scheduler kernel preemption"
    val rows =
      (0 until 20).map(i => (i.toLong, prose, "A")) ++
      (20 until 40).map(i => (i.toLong, prose, "B")) ++
      Seq((40L, jargon, "C"))
    val docs = rows.toDF("doc_id", "text", "source")
    val out = Sketches.sourceDrift(docs)
      .select("source", "n_tokens", "n_types", "kl_vs_corpus")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set("A", "B", "C"))
    out.values.foreach { case (_, nt, ty, kl) =>
      assert(kl >= 0.0 && nt > 0 && ty > 0)
    }
    // A and B are identical distributions ≈ the corpus bulk → tiny KL;
    // C's vocabulary is disjoint from the bulk → large KL
    assert(out("A")._4 == out("B")._4)
    assert(out("C")._4 > out("A")._4 + 1.0)
    assert(out("A")._4 < 0.1)
  }
}
