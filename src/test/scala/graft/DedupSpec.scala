package graft

import graft.operators.{Dedup, VectorSearch}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Scale-dedup pack invariants: planted duplicates must be found by every
  * method; signatures deterministic.
  */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  test("exact duplicates: planted identical pair (0,5) grouped") {
    val groups = Dedup.exactDuplicates(sampleDocs)
      .select("group_size", "keep_doc").as[(Long, Long)].collect()
    assert(groups.toSeq == Seq((2L, 0L)))
  }

  test("jaccard pairs: identical docs → 1.0; found at θ=0.5") {
    val pairs = Dedup.jaccardPairs(sampleDocs, 0.5)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.exists { case (a, b, j) => a == 0 && b == 5 && j == 1.0 })
  }

  test("minhash signatures deterministic and identical for identical docs") {
    val sigs = Dedup.minhashSignatures(sampleDocs)
      .select("doc_id", "signature").as[(Long, Seq[Long])].collect().toMap
    assert(sigs(0L) == sigs(5L))
    assert(sigs(0L).length == Dedup.NumHashes)
    assert(sigs(0L) != sigs(1L))
  }

  test("minhash LSH finds the planted pair with est_jaccard 1.0") {
    val pairs = Dedup.minhashLshPairs(sampleDocs)
      .select("id1", "id2", "est_jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.exists { case (a, b, j) => a == 0 && b == 5 && j == 1.0 })
  }

  test("simhash: identical docs → hamming 0; signatures fit SimhashBits") {
    val sigs = Dedup.simhashSignatures(sampleDocs)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(5L))
    assert(sigs.values.forall(s => s >= 0L && s < (1L << Dedup.SimhashBits)))
    val pairs = Dedup.simhashPairs(sampleDocs, maxHamming = 3)
      .select("id1", "id2", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.exists { case (a, b, h) => a == 0 && b == 5 && h == 0 })
  }

  test("containment: a doc fully quoted inside a longer one scores 1.0 " +
       "where jaccard stays below threshold") {
    // quoted = every shingle of the short doc appears in the long host; the
    // host adds enough unrelated text that jaccard dilutes under 0.5
    // letter-only fillers: the tokenizer's \b[a-z]{3,}\b drops any word with
    // a digit, so "filler1"-style padding would vanish entirely
    val short0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val fillers = (1 to 120).map(i =>
      s"word${('a' + i / 26 % 26).toChar}${('a' + i % 26).toChar}")
    val host = short0 + " " + fillers.mkString(" ")
    val docs = Seq((0L, short0), (1L, host),
      (2L, "completely different text about ships and harbors and tides"))
      .toDF("doc_id", "text")
    // short: 10 tokens → 8 shingles, all inside host's 130-token stream
    // (128 shingles): c1 = 8/8 = 1, c2 = 8/128, jaccard = 8/128
    val pairs = Dedup.containmentPairs(docs, 0.9)
      .select("id1", "id2", "c1", "c2", "containment")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(pairs.toSeq == Seq((0L, 1L, 1.0, 0.0625, 1.0)),
      s"expected the quoted doc contained at 1.0, got ${pairs.toSeq}")
    val jac = Dedup.jaccardPairs(docs, 0.5).count()
    assert(jac == 0, "jaccard should miss the subsumption pair at θ=0.5")
  }

  test("containment candidates: prefix-filtered join equals the naive " +
       "all-pairs answer across thresholds") {
    val docs = sampleDocs
    for (t <- Seq(0.3, 0.6, 0.9)) {
      val fast = Dedup.containmentPairs(docs, t)
        .select("id1", "id2", "containment")
        .as[(Long, Long, Double)].collect().toSet
      // naive: every co-shingled pair, exact intersection over min size
      val ds = Dedup.distinctShingleHashes(docs)
      val sz = ds.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val naive = ds.select(col("doc_id").as("id1"), col("h60"))
        .join(ds.select(col("doc_id").as("id2"), col("h60")), "h60")
        .where(col("id1") < col("id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
        .join(sz.select(col("doc_id").as("id1"), col("n").as("s1")), "id1")
        .join(sz.select(col("doc_id").as("id2"), col("n").as("s2")), "id2")
        .select(col("id1"), col("id2"),
          round(col("inter").cast("double") / least(col("s1"), col("s2")), 6)
            .as("containment"))
        .where(col("containment") >= t)
        .as[(Long, Long, Double)].collect().toSet
      assert(fast == naive, s"θ=$t: prefix-filtered=$fast naive=$naive")
    }
  }

  test("dense cosine: identical vectors → 1.0, orthogonal → 0.0") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
      .select(TextFns.cosineDense(
        transform(col("a"), _.cast("double")),
        transform(col("b"), _.cast("double"))).as("sim"))
    val sims = df.as[Double].collect()
    assert(math.abs(sims(0) - 1.0) < 1e-12 && sims(1) == 0.0)
  }

  test("ann top-k returns k ordered results, excludes the query vector") {
    val top = VectorSearch.annTopK(Tables.embeddings(spark, sf0001), 0L, 10)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(top.length == 10)
    assert(!top.exists(_._1 == 0L))
    assert(top.map(_._2).toSeq == top.map(_._2).sorted(Ordering[Double].reverse).toSeq)
  }

  test("knn join: each query gets k ranked neighbors matching single-query search") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.where(col("vec_id") % 50 === 0)
    val corpus = emb.where(col("vec_id") % 50 =!= 0)
    val got = VectorSearch.knnJoin(corpus, queries, k = 5)
      .select("query_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Long)].collect()
    val perQuery = got.groupBy(_._1)
    assert(perQuery.forall(_._2.length == 5))
    perQuery.foreach { case (_, rows) =>
      val ranked = rows.sortBy(_._4)
      assert(ranked.map(_._4).toSeq == (1L to 5L), "ranks are 1..k")
      assert(ranked.sliding(2).forall { case Array(a, b) => a._3 >= b._3 }, "sims descend")
    }
    // over the same corpus, the batched join reproduces the single-query op
    val single = VectorSearch.annTopK(emb, queryVecId = 0L, k = 5)
      .select("vec_id").as[Long].collect().toSet
    val batch0 = VectorSearch.knnJoin(
      emb.where(col("vec_id") =!= 0), queries.where(col("vec_id") === 0), k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(batch0 == single)
  }

  test("blocked near-dup pairs == brute-force pairs, with no nested-loop join") {
    val emb = Tables.embeddings(spark, sf0001)
    val brute = VectorSearch.nearDuplicatePairs(emb)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val blocked = VectorSearch.nearDuplicatePairsBlocked(emb)
    val got = blocked.as[(Long, Long, Double)].collect().sorted.toSeq
    assert(got == brute, "blocked plan must be exact, not approximate")
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"blocked all-pairs must shuffle on block pairs, plan:\n$plan")
    // uneven block counts still cover everything
    val got5 = VectorSearch.nearDuplicatePairsBlocked(emb, nBlocks = 5)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(got5 == brute)
  }

  test("vector digest-first arms equal the member plans: blocked pairs " +
       "expand exactly, semantic dedup verdicts derive exactly") {
    // regimes: a 3-strong byte-identical vector family (100-102) with a
    // near neighbor (103, cos 0.96); an orthogonal singleton (104);
    // zero-norm byte twins (200, 201 — kernel sim convention 0.0, so they
    // never pair at positive thresholds and are never pruned); a few
    // distinct background vectors. dup mass 1 - 8/11 = 0.27 -> digest arm.
    val emb = Seq(
      (0L, "a", Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, "b", Seq(0.0, 1.0, 0.0, 0.0)),
      (2L, "c", Seq(0.5, 0.5, 0.5, 0.0)),
      (100L, "f", Seq(0.6, 0.8, 0.0, 0.0)),
      (101L, "f", Seq(0.6, 0.8, 0.0, 0.0)),
      (102L, "f", Seq(0.6, 0.8, 0.0, 0.0)),
      (103L, "g", Seq(0.8, 0.6, 0.0, 0.0)),
      (104L, "h", Seq(0.0, 0.0, 1.0, 0.0)),
      (200L, "z", Seq(0.0, 0.0, 0.0, 0.0)),
      (201L, "z", Seq(0.0, 0.0, 0.0, 0.0)),
      (300L, "i", Seq(0.0, 0.0, 0.6, 0.8))).toDF("vec_id", "label", "embedding")
    // blocked near-dup pairs
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.as[(Long, Long, Double)].collect().toSet
    val mem = pairs(VectorSearch.nearDuplicatePairsBlockedMembers(emb, 0.45, 4))
    val dig = pairs(VectorSearch.nearDuplicatePairsBlockedDigestFirst(emb, 0.45, 4))
    assert(dig == mem, s"digest != member: ${dig -- mem} / ${mem -- dig}")
    assert(pairs(VectorSearch.nearDuplicatePairsBlocked(emb, 0.45, 4)) == dig,
      "public dispatch must take the digest arm on this fixture")
    assert(Seq((100L, 101L), (100L, 102L), (101L, 102L)).forall(p =>
      mem.contains((p._1, p._2, 1.0))), s"family pairs at 1.0 missing: $mem")
    val cross = mem.filter { case (a, b, _) => a >= 100L && a <= 102L && b == 103L }
    assert(cross.size == 3 && cross.map(_._3).size == 1,
      s"family x neighbor pairs must share the rep sim: $cross")
    val zero = Set(200L, 201L)
    assert(!mem.exists { case (a, b, _) => zero(a) || zero(b) },
      "zero-norm twins never pair at positive thresholds")
    // semantic dedup
    def verdicts(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Boolean)] =
      df.as[(Long, Int, Boolean)].collect().toSet
    val vMem = verdicts(VectorSearch.semanticDedupMembers(emb, 4, 2, 0.45))
    val vDig = verdicts(VectorSearch.semanticDedupDigestFirst(emb, 4, 2, 0.45))
    assert(vDig == vMem, s"verdicts differ: ${vDig -- vMem} / ${vMem -- vDig}")
    assert(verdicts(VectorSearch.semanticDedup(emb, 4, 2, 0.45)) == vDig)
    val kept = vMem.map(r => r._1 -> r._3).toMap
    // non-rep twins pruned by their rep; zero-norm twins never pruned
    assert(!kept(101L) && !kept(102L) && kept(200L) && kept(201L))
  }

  test("LSH ANN results are a subset-quality approximation of brute force") {
    val exact = VectorSearch.annTopK(Tables.embeddings(spark, sf0001), 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val lsh = VectorSearch.annLshTopK(Tables.embeddings(spark, sf0001), 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    // same bucket ⇒ every LSH hit is a real vector; overlap is expected but
    // not guaranteed — assert plumbing invariants only
    assert(lsh.size <= 10 && !lsh.contains(0L))
  }

  test("pair-similarity strategies agree: kernel == inverted index (testdata)") {
    val docs = Tables.documents(spark, sf0001)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id1", "id2").as[(Long, Long, Double)].collect().toSeq
    val kernel = canon(graft.operators.Duplicates.pairSimilaritiesKernel(docs, 0.5))
    val sparse = canon(graft.operators.Duplicates.pairSimilaritiesSparse(docs, 0.5))
    assert(kernel.nonEmpty && kernel == sparse)
  }

  test("IVF ANN with nprobe = nCells equals brute force exactly") {
    val emb = Tables.embeddings(spark, sf0001)
    val exact = VectorSearch.annTopK(emb, 0L, 10)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    val full = VectorSearch.annIvfTopK(emb, 0L, 10, nCells = 8, nprobe = 8)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    assert(full == exact)
  }

  test("batched IVF kNN join with nprobe = nCells equals the exact kNN join") {
    val e = Tables.embeddings(spark, sf0001)
    val corpus = e.where(col("vec_id") % 50 =!= 0)
    val queries = e.where(col("vec_id") % 50 === 0)
    val exact = VectorSearch.knnJoin(corpus, queries, 5)
      .select("query_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val full = VectorSearch.ivfKnnJoin(corpus, queries, 5,
      nCells = 8, nprobe = 8, trainSet = e)
      .select("query_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(full == exact)
  }

  test("exact-substring spans: planted shared run found with exact bounds, " +
       "within-doc repetition flagged, unique docs clean") {
    // distinct letter-only filler tokens (the tokenizer's \b[a-z]{3,}\b
    // drops anything with digits), with docs 0 and 1 sharing an exact
    // 24-token run mid-document
    def toks(tag: String, n: Int) = (0 until n)
      .map(i => s"$tag${('a' + i % 26).toChar}${('a' + i / 26).toChar}zz")
      .mkString(" ")
    val shared = toks("shared", 24)
    val docs = Seq(
      (0L, s"${toks("alpha", 8)} $shared ${toks("beta", 8)}"),
      (1L, s"${toks("gamma", 5)} $shared ${toks("delta", 11)}"),
      (2L, toks("unique", 40)),
      // within-doc repetition: the same 20-token block twice back-to-back
      (3L, s"${toks("rep", 20)} ${toks("rep", 20)}"))
      .toDF("doc_id", "text")
    val spans = graft.operators.Dedup.exactSubstrSpans(docs, windowTokens = 20)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.toSeq.sortBy(_._2)).toMap
    // docs 0/1: one span each, exactly the 24-token shared run — window
    // starts 8..12 (doc 0) and 5..9 (doc 1), 5 windows, 24 tokens
    assert(spans(0L) == Seq((0L, 8L, 24L, 5L)), s"doc0: ${spans.get(0L)}")
    assert(spans(1L) == Seq((1L, 5L, 24L, 5L)), s"doc1: ${spans.get(1L)}")
    assert(!spans.contains(2L), "the unique doc carries no span")
    // doc 3 (the 20-token block twice): exactly w(0) == w(20) — interior
    // windows straddle the boundary and are unique — so two disjoint
    // 20-token spans at starts 0 and 20, each supported by one window
    assert(spans(3L) == Seq((3L, 0L, 20L, 1L), (3L, 20L, 20L, 1L)),
      s"doc3: ${spans.get(3L)}")
  }

  test("dup-span stats: overlapping span intervals union; zero-span docs report 0") {
    def toks(tag: String, n: Int) = (0 until n)
      .map(i => s"$tag${('a' + i % 26).toChar}${('a' + i / 26).toChar}zz")
      .mkString(" ")
    val blockA = toks("ovla", 22) // shared run A: windows 0..2 of doc 0
    val blockB = toks("ovlb", 22) // shared run B, overlapping A's coverage
    val docs = (Seq(
      // doc 0: A then B back-to-back, A alone in doc 1, B alone in doc 2;
      // doc 0's two spans [0,21] and [22,43] are ADJACENT islands that
      // must sum exactly. Docs 4-6 below add genuinely OVERLAPPING spans.
      (0L, s"$blockA $blockB"),
      (1L, s"$blockA ${toks("tail", 10)}"),
      (2L, s"${toks("head", 10)} $blockB"),
      (3L, toks("clean", 30))) ++ {
      // TRUE interval overlap: S is 32 tokens; doc 4 = S; doc 5 shares
      // S's 22-token PREFIX, doc 6 its 22-token SUFFIX. Doc 4's dup spans
      // are (start 0, 22 tokens) and (start 10, 22 tokens) — naive sum 44
      // exceeds the 32-token doc; the interval union must report 32.
      val s32 = toks("ess", 32).split(" ")
      Seq(
        (4L, s32.mkString(" ")),
        (5L, s"${s32.take(22).mkString(" ")} ${toks("fin", 10)}"),
        (6L, s"${toks("pre", 10)} ${s32.drop(10).mkString(" ")}"))
    }).toDF("doc_id", "text")
    val stats = graft.operators.Dedup.dupSpanStats(docs)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // doc 0: 44 tokens, both blocks duplicated → full coverage
    assert(stats(0L) == ((0L, 44L, 44L, 1.0, true)), s"doc0: ${stats(0L)}")
    // doc 1: 32 tokens, A's 22 covered → 0.6875 ≥ 0.5 → drop
    assert(stats(1L) == ((1L, 32L, 22L, 0.6875, true)), s"doc1: ${stats(1L)}")
    assert(stats(2L)._3 == 22L && stats(2L)._5, s"doc2: ${stats(2L)}")
    // doc 3: clean — zero coverage via the left join
    assert(stats(3L) == ((3L, 30L, 0L, 0.0, false)), s"doc3: ${stats(3L)}")
    // doc 4: spans (0,22) and (10,22) overlap — union reports 32, not 44
    assert(stats(4L) == ((4L, 32L, 32L, 1.0, true)), s"doc4: ${stats(4L)}")
    assert(stats(5L)._3 == 22L && stats(6L)._3 == 22L,
      s"prefix/suffix sharers: ${stats(5L)} ${stats(6L)}")
  }

  test("dup-span stats from materialized spans: parquet round-trip of the x64 " +
       "output feeds the gate losslessly (production layout)") {
    def toks(tag: String, n: Int) = (0 until n)
      .map(i => s"$tag${('a' + i % 26).toChar}${('a' + i / 26).toChar}zz")
      .mkString(" ")
    val blockA = toks("ovla", 22)
    val docs = Seq(
      (0L, s"$blockA ${toks("pad", 10)}"),
      (1L, s"${toks("head", 6)} $blockA"),
      (2L, toks("clean", 30))).toDF("doc_id", "text")
    val recompute = graft.operators.Dedup.dupSpanStats(docs)
      .orderBy("doc_id").collect()
    // the production shape: spans materialized once (here: a real parquet
    // write + read-back, so the frame has no lineage back to the corpus),
    // then fed to the stats overload
    val dir = java.nio.file.Files.createTempDirectory("graft_spans").toString
    graft.operators.Dedup.exactSubstrSpans(docs).write
      .mode("overwrite").parquet(dir)
    val fromMaterialized = graft.operators.Dedup
      .dupSpanStatsFrom(spark.read.parquet(dir), docs)
      .orderBy("doc_id").collect()
    assert(fromMaterialized.toSeq == recompute.toSeq)
  }

  test("span-table serving row (x90): first call writes the spans table at " +
       "most once per corpus, re-call memo-hits without rewriting, results " +
       "equal the in-session x65 path") {
    import graft.operators.Dedup
    // first call may build (0 or 1+ writes depending on whether an earlier
    // test already populated the memo for this corpus fingerprint)
    val first = Dedup.qDupSpanStatsPersisted(spark, sf0001)
      .orderBy("doc_id").collect()
    assert(first.nonEmpty)
    // re-call must serve from the memoized artifact: zero new writes
    val writesBefore = Dedup.spanTableWrites.get()
    val second = Dedup.qDupSpanStatsPersisted(spark, sf0001)
      .orderBy("doc_id").collect()
    assert(Dedup.spanTableWrites.get() == writesBefore,
      s"x90 re-call rewrote the span table: $writesBefore -> " +
        s"${Dedup.spanTableWrites.get()}")
    assert(second.toSeq == first.toSeq)
    // the persisted layout is lossless vs the in-session shared-cache path
    val inSession = Dedup.qDupSpanStats(spark, sf0001)
      .orderBy("doc_id").collect()
    assert(first.toSeq == inSession.toSeq)
  }

  test("remove dup spans: planted runs excised with order preserved, clean " +
       "docs verbatim, and drops reconcile with the x65 coverage") {
    def toks(tag: String, n: Int) = (0 until n)
      .map(i => s"$tag${('a' + i % 26).toChar}${('a' + i / 26).toChar}zz")
      .mkString(" ")
    val shared = toks("shared", 24)
    val docs = (Seq(
      (0L, s"${toks("alpha", 8)} $shared ${toks("beta", 8)}"),
      (1L, s"${toks("gamma", 5)} $shared ${toks("delta", 11)}"),
      (2L, toks("unique", 40))) ++ {
      // true interval overlap (the x65 fixture): union must excise 32,
      // not a double-counted 44
      val s32 = toks("ess", 32).split(" ")
      Seq((4L, s32.mkString(" ")),
        (5L, s"${s32.take(22).mkString(" ")} ${toks("fin", 10)}"),
        (6L, s"${toks("pre", 10)} ${s32.drop(10).mkString(" ")}"))
    }).toDF("doc_id", "text")
    val out = graft.operators.Dedup.removeDupSpans(docs)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // doc 0: the 24 shared tokens cut, alpha+beta survive in order
    assert(out(0L) == ((0L, 40L, 16L,
      s"${toks("alpha", 8)} ${toks("beta", 8)}")), s"doc0: ${out(0L)}")
    assert(out(1L)._3 == 16L && !out(1L)._4.contains("sharedaa"),
      s"doc1: ${out(1L)}")
    // clean doc passes through verbatim (token-joined)
    assert(out(2L) == ((2L, 40L, 40L, toks("unique", 40))), s"doc2: ${out(2L)}")
    // doc 4 fully covered by the overlapping spans → empty output
    assert(out(4L) == ((4L, 32L, 0L, "")), s"doc4: ${out(4L)}")
    // cross-operator reconciliation: dropped tokens == x65's dup_tokens
    val cov = graft.operators.Dedup.dupSpanStats(docs)
      .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
    out.values.foreach { case (id, n, k, _) =>
      assert(n - k == cov(id), s"doc $id: dropped ${n - k} vs x65 ${cov(id)}")
    }
  }

  test("dedup report: clone losses accounted exactly per method") {
    // docs 0 and 5 of the shared fixture are byte-identical → the exact
    // method drops exactly one doc and its token count; minhash drops at
    // least as much (near-dups subsume exact dups)
    val docs = sampleDocs.withColumn("source", lit("s"))
    val rep = graft.operators.Dedup.dedupReport(docs).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(rep.keySet == Set("exact", "minhash"))
    val ex = rep("exact")
    assert(ex.getAs[Long]("n_docs") == 6L && ex.getAs[Long]("n_kept") == 5L)
    val cloneTokens = sampleTexts(0).split("\\s+").length
    assert(ex.getAs[Long]("tokens_total") - ex.getAs[Long]("tokens_kept") == cloneTokens)
    val mh = rep("minhash")
    assert(mh.getAs[Long]("n_kept") <= ex.getAs[Long]("n_kept"))
    assert(mh.getAs[Long]("tokens_kept") <= ex.getAs[Long]("tokens_kept"))
    // drop fractions agree with the counts they summarize
    assert(ex.getAs[Double]("doc_drop_pct") ==
      BigDecimal(1.0 / 6.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("quality-keep dedup keeps the highest-quality family member, one per family") {
    // docs 0 and 5 are byte-identical (same quality — doc_id breaks the
    // tie at the lower id), so the shared fixture pins the tie rule; a
    // quality-ORDERED case: a long clean doc vs a punctuation-mangled
    // near-dup of it must keep the clean one regardless of id order
    val base = "machine learning pipelines process large corpora with careful " +
      "deduplication quality filtering and tokenization before any training run"
    val docs = (sampleTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++ Seq(
      (100L, "!!! ??? " + base + " ### $$$ %%% @@@ !!! ??? ###"),
      (101L, base))).toDF("doc_id", "text")
    val out = graft.operators.Dedup.qualityKeepDedup(docs).collect()
    // exactly one kept per family
    for ((fam, rows) <- out.groupBy(_.getAs[Long]("family")))
      assert(rows.count(_.getAs[Boolean]("kept")) == 1, s"family $fam")
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the identical pair ties on quality -> lower id kept
    assert(byId(0L).getAs[Long]("family") == byId(5L).getAs[Long]("family"))
    assert(byId(0L).getAs[Boolean]("kept") && !byId(5L).getAs[Boolean]("kept"))
    // the mangled/clean pair must be one family with the CLEAN doc kept,
    // even though the mangled one has the lower id
    assert(byId(100L).getAs[Long]("family") == byId(101L).getAs[Long]("family"),
      "planted near-dups must land in one family")
    assert(byId(101L).getAs[Boolean]("kept") && !byId(100L).getAs[Boolean]("kept"),
      "the higher-quality member must be the keeper")
  }

  test("hard negatives: different-label only, ranked, and exact at full probes") {
    val e = Tables.embeddings(spark, sf0001)
    val corpus = e.where(col("vec_id") % 50 =!= 0)
    val queries = e.where(col("vec_id") % 50 === 0)
    val hn = VectorSearch.hardNegatives(corpus, queries, k = 5, poolK = 50,
      nCells = 8, nprobe = 8, trainSet = e).collect()
    assert(hn.nonEmpty)
    // no negative shares its query's label
    assert(hn.forall(r => r.getAs[Any]("label") != r.getAs[Any]("query_label")))
    // ranks are 1..n per query with descending sims
    for ((_, rows) <- hn.groupBy(_.getAs[Long]("query_id"))) {
      val sorted = rows.sortBy(_.getAs[Long]("neg_rank"))
      assert(sorted.map(_.getAs[Long]("neg_rank")).toSeq == (1L to sorted.length))
      val sims = sorted.map(_.getAs[Double]("sim")).toSeq
      assert(sims == sims.sorted.reverse)
    }
    // at nprobe = nCells with poolK >= corpus the pool is the exact
    // neighbor list, so mining equals a brute-force filter over knnJoin
    val n = corpus.count().toInt
    val brute = VectorSearch.knnJoin(corpus, queries, n)
      .join(queries.select(col("vec_id").as("query_id"),
        col("label").as("query_label")), "query_id")
      .where(col("label") =!= col("query_label"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("vec_id"))
    val expected = brute.withColumn("neg_rank", row_number().over(w).cast("long"))
      .where(col("neg_rank") <= 5)
      .select("query_id", "vec_id", "sim", "neg_rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val mined = VectorSearch.hardNegatives(corpus, queries, k = 5, poolK = n,
      nCells = 8, nprobe = 8, trainSet = e)
      .select("query_id", "vec_id", "sim", "neg_rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(mined == expected)
  }

  test("IVF recall: one row per query, recall in [0,1], and 1.0 at full probes") {
    val e = Tables.embeddings(spark, sf0001)
    val corpus = e.where(col("vec_id") % 50 =!= 0)
    val queries = e.where(col("vec_id") % 50 === 0)
    val nq = queries.count()
    val partial = VectorSearch.ivfRecall(corpus, queries, 5,
      nCells = 8, nprobe = 2, trainSet = e)
      .select("query_id", "recall").as[(Long, Double)].collect()
    assert(partial.length == nq)
    assert(partial.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
    val full = VectorSearch.ivfRecall(corpus, queries, 5,
      nCells = 8, nprobe = 8, trainSet = e)
      .select("recall").as[Double].collect()
    assert(full.length == nq && full.forall(_ == 1.0))
  }

  test("int8 quantization: codes in range, reconstruction within scale/2 per dim") {
    val emb = Tables.embeddings(spark, sf0001)
    val rows = VectorSearch.quantize(emb)
      .select("vec_id", "scale", "qvec").as[(Long, Double, Seq[Int])].collect()
    val orig = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, scale, q) =>
      assert(q.forall(c => c >= -127 && c <= 127), s"vec $id code out of int8 range")
      q.zip(orig(id)).foreach { case (c, v) =>
        assert(math.abs(c * scale - v.toDouble) <= scale / 2 + 1e-12,
          s"vec $id reconstruction error exceeds scale/2")
      }
    }
  }

  test("PQ codes: in range, one row per vector, and exact at k >= n") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = VectorSearch.pqCodes(emb, m = 4, k = 16, iters = 3)
      .as[(Long, Long, Int, Int, Int, Int, Double)].collect()
    assert(out.length == emb.count())
    out.foreach { case (id, _, c0, c1, c2, c3, mse) =>
      assert(Seq(c0, c1, c2, c3).forall(c => c >= 0 && c < 16),
        s"vec $id code outside [0,16)")
      assert(mse >= 0.0)
    }
    // a codebook big enough to hold every distinct subvector reconstructs
    // exactly: Lloyd init seeds one centroid per vector, so every
    // assignment distance is 0 from iteration 0 onward
    val tiny = (0L until 6L).map(i =>
      (i, i % 2, Array.tabulate(8)(d => (i * 8 + d).toFloat)))
      .toDF("vec_id", "label", "embedding")
    val exact = VectorSearch.pqCodes(tiny, m = 2, k = 6, iters = 2)
      .select("mse").as[Double].collect()
    assert(exact.forall(_ == 0.0), s"k>=n must reconstruct exactly: ${exact.toSeq}")
  }

  test("PQ-ADC top-k approximates the exact top-k and never reads the query row") {
    val emb = Tables.embeddings(spark, sf0001)
    // ADC approximates EUCLIDEAN distance (cosine knnJoin is the wrong
    // comparator unless vectors are normalized) — exact L2 in-memory
    val all = emb.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap.view.mapValues(_.map(_.toDouble).toArray).toMap
    val q = all(0L)
    val ranked = (all - 0L).toSeq
      .map { case (id, v) =>
        (id, v.zip(q).map { case (x, y) => (x - y) * (x - y) }.sum)
      }
      .sortBy { case (id, d) => (d, id) }.map(_._1)
    val top100 = ranked.take(100).toSet
    val adc = VectorSearch.pqAdcTopK(emb, 0L, kTop = 10)
      .as[(Long, Long, Double)].collect()
    assert(adc.length == 10 && !adc.map(_._1).contains(0L))
    assert(adc.map(_._3).toSeq == adc.map(_._3).sorted.toSeq, "ascending by distance")
    // the sf fixture is near-random high-dim data: pairwise distances
    // concentrate (measured ~[1.3, 2.7]), so 16-cell codebook distortion
    // legitimately swamps individual neighbor gaps. Require strong
    // correlation (most picks inside the exact top quintile), not recall.
    assert((top100 & adc.map(_._1).toSet).size >= 5,
      s"ADC uncorrelated with exact ranks: ${adc.map(_._1).map(ranked.indexOf).toSeq}")
  }

  test("PQ refine: a corpus-wide shortlist recovers the exact top-k, and a " +
       "50-shortlist rerank dominates plain ADC by exact distance") {
    val emb = Tables.embeddings(spark, sf0001)
    val all = emb.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap.view.mapValues(_.map(_.toDouble).toArray).toMap
    val q = all(0L)
    def exactD(id: Long): Double =
      all(id).zip(q).map { case (x, y) => (x - y) * (x - y) }.sum
    def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the operator sorts by (round6(exact), vec_id) — mirror that exactly
    val bruteTop = (all - 0L).keysIterator.toSeq
      .sortBy(id => (round6(exactD(id)), id)).take(10)
    val full = VectorSearch.pqAdcRefineTopK(emb, 0L, kTop = 10,
      shortlist = all.size)
      .select("vec_id", "exact_dist").as[(Long, Double)].collect()
    assert(full.map(_._1).toSeq == bruteTop,
      s"corpus-wide shortlist must be the exact top-k: ${full.toSeq}")
    full.foreach { case (id, d) =>
      assert(math.abs(d - round6(exactD(id))) < 1e-9, s"exact_dist off for $id")
    }
    // ADC top-10 is a prefix of the ADC 50-shortlist, so refine minimizes
    // exact distance over a SUPERSET of plain ADC's picks — its sorted
    // exact distances must dominate pairwise
    val adcIds = VectorSearch.pqAdcTopK(emb, 0L, kTop = 10)
      .select("vec_id").as[Long].collect()
    val refined = VectorSearch.pqAdcRefineTopK(emb, 0L, kTop = 10)
      .select("vec_id", "exact_dist").as[(Long, Double)].collect()
    val dAdc = adcIds.map(exactD).sorted
    val dRef = refined.map(r => exactD(r._1)).sorted
    assert(dRef.zip(dAdc).forall { case (r, a) => r <= a + 1e-12 },
      s"refine must dominate ADC: ${dRef.toSeq} vs ${dAdc.toSeq}")
  }

  test("PQ refine clamps a shortlist narrower than kTop (the kTop contract " +
       "holds for any argument combination)") {
    val emb = Tables.embeddings(spark, sf0001)
    val clamped = VectorSearch.pqAdcRefineTopK(emb, 0L, kTop = 10, shortlist = 3)
      .select("vec_id").as[Long].collect()
    assert(clamped.length == 10,
      s"shortlist=3 silently truncated the top-10: ${clamped.length} rows")
    // clamping means shortlist<=kTop degenerates to shortlist==kTop — an
    // exact re-sort of the ADC top-k
    val atK = VectorSearch.pqAdcRefineTopK(emb, 0L, kTop = 10, shortlist = 10)
      .select("vec_id").as[Long].collect()
    assert(clamped.toSeq == atK.toSeq)
  }

  test("PQ-ADC retrieves cluster-mates exactly on separable data") {
    // 3 well-separated clusters of 8, tight intra-cluster noise: codebook
    // cells align with clusters, so ADC must return the query's 7 mates
    // ahead of everything else
    val vecs = for (c <- 0 until 3; i <- 0 until 8) yield {
      val id = (c * 8 + i).toLong
      val base = Array.tabulate(8)(d => if (d % 3 == c) 10.0f * (c + 1) else 0.0f)
      (id, c.toLong, base.zipWithIndex.map { case (x, d) =>
        x + 0.01f * ((id + d) % 5) })
    }
    val df = vecs.toDF("vec_id", "label", "embedding")
    val out = VectorSearch.pqAdcTopK(df, 0L, kTop = 7, m = 2, k = 4, iters = 3)
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSet == (1L to 7L).toSet,
      s"cluster mates must win: ${out.toSeq}")
    assert(out.forall(_._2 == 0L))
  }

  test("IVF-PQ retrieves cluster-mates and scans only probed cells") {
    // clusters interleave with ids (c = id % 3) so the first-nCells Lloyd
    // seeds land one per cluster — with contiguous ids the seeds would all
    // come from cluster 0 and k-means would split it instead
    val vecs = (0 until 24).map { idInt =>
      val id = idInt.toLong
      val c = idInt % 3
      val base = Array.tabulate(8)(d => if (d % 3 == c) 10.0f * (c + 1) else 0.0f)
      (id, c.toLong, base.zipWithIndex.map { case (x, d) =>
        x + 0.01f * ((id + d) % 5) })
    }
    val df = vecs.toDF("vec_id", "label", "embedding")
    // nprobe=1 on separable clusters: the probed cell IS the query's
    // cluster, so the result is exactly the 7 mates and nothing leaks in
    // from unprobed cells
    val out = VectorSearch.ivfPqTopK(df, 0L, kTop = 10,
      nCells = 3, cIters = 3, m = 2, k = 4, iters = 2, nprobe = 1)
      .as[(Long, Long, Int, Double)].collect()
    assert(out.length == 7, s"nprobe=1 must bound the scan to one cell: ${out.toSeq}")
    assert(out.map(_._1).toSet == (3L until 24L by 3).toSet, s"got ${out.toSeq}")
    assert(out.map(_._3).distinct.length == 1, "all hits share the probed cell")
  }

  test("IVF-PQ on the fixture: valid shape, ascending, probe-bounded") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = VectorSearch.ivfPqTopK(emb, 0L, kTop = 10)
      .as[(Long, Long, Int, Double)].collect()
    assert(out.length == 10 && !out.map(_._1).contains(0L))
    assert(out.map(_._4).toSeq == out.map(_._4).sorted.toSeq)
    assert(out.map(_._3).distinct.length <= 4, "hits confined to nprobe cells")
  }

  test("PQ training is invariant to input partitioning") {
    val emb = Tables.embeddings(spark, sf0001)
    val a = VectorSearch.pqCodes(emb.repartition(3), m = 4, k = 8, iters = 2)
      .as[(Long, Long, Int, Int, Int, Int, Double)].collect().sortBy(_._1).toSeq
    val b = VectorSearch.pqCodes(emb.repartition(11), m = 4, k = 8, iters = 2)
      .as[(Long, Long, Int, Int, Int, Int, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("quantized ANN top-k closely matches the exact top-k") {
    val emb = Tables.embeddings(spark, sf0001)
    val exact = VectorSearch.annTopK(emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val quant = VectorSearch.annTopKQuantized(emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(quant.size == 10 && !quant.contains(0L))
    assert((exact & quant).size >= 8, s"recall too low: ${(exact & quant).size}/10")
  }

  test("longest dup span equals the planted overlap length") {
    // 30 distinct non-stopword tokens; doc 1 replaces position 16 —
    // longest shared consecutive run = positions 1..15
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val words = (0 until 30).map(i => s"tok${letters(i % 26)}${letters(i / 26)}word")
    val d0 = words.mkString(" ")
    val d1 = words.updated(15, "replacedword").mkString(" ")
    val docs = Seq((0L, d0), (1L, d1), (2L, "totally different content here"))
      .toDF("doc_id", "text")
    val spans = Dedup.longestDupSpans(docs, minEstJaccard = 0.3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(spans == Seq((0L, 1L, 15L)), s"got $spans")
  }

  test("semantic dedup matches an in-memory greedy reference; no nested-loop join") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = VectorSearch.semanticDedup(emb, nCells = 8, iters = 3, threshold = 0.4)
    val plan = out.queryExecution.executedPlan
    assert(!plan.toString.contains("CartesianProduct"),
      s"within-cell dedup must stay an equi join, plan:\n$plan")
    // the only nested-loop joins allowed are the sanctioned 1-row centroid
    // frame broadcasts (a LocalTableScan build side); a corpus-scale BNLJ
    // would have file scans on both sides
    plan.foreach {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        val build = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
          case _                                                 => j.right
        }
        assert(build.toString.contains("LocalTableScan"),
          s"non-centroid nested-loop join in semanticDedup plan:\n$j")
      case _ => ()
    }
    val rows = out.select("vec_id", "cell", "kept").as[(Long, Int, Boolean)].collect()
    val vecs = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    assert(rows.length == vecs.size && rows.exists(!_._3) && rows.exists(_._3))
    def sim(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1 }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    rows.groupBy(_._2).values.foreach { cellRows =>
      val ids = cellRows.map(_._1).sorted.toSeq
      val pruned = ids.filter(id => ids.exists(o => o < id &&
        BigDecimal(sim(vecs(o), vecs(id)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.4)).toSet
      cellRows.foreach { case (id, _, kept) =>
        assert(kept == !pruned.contains(id), s"vec $id kept=$kept disagrees with reference")
      }
    }
  }

  test("IVF ANN with partial probes returns valid ordered approximations") {
    val ivf = VectorSearch.annIvfTopK(Tables.embeddings(spark, sf0001), 0L, 10)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(ivf.nonEmpty && !ivf.exists(_._1 == 0L))
    assert(ivf.map(_._2).toSeq == ivf.map(_._2).sorted(Ordering[Double].reverse).toSeq)
  }

  test("substring decontamination: a quoted 22-token eval passage flags " +
       "exactly its 3 windows; clean and too-short train docs report clean") {
    val passage = (0 until 25).map(i => s"bench${('a' + i).toChar}").mkString(" ")
    val filler = (0 until 30).map(i =>
      s"plain${('a' + i % 26).toChar}${('a' + i / 26).toChar}").mkString(" ")
    val clean = (0 until 30).map(i =>
      s"other${('a' + i % 26).toChar}${('a' + i / 26).toChar}").mkString(" ")
    val docs = Seq(
      0L -> passage,                                            // eval (0 % 20 == 0)
      1L -> (filler + " " + passage.split(" ").take(22).mkString(" ")),
      2L -> clean,
      3L -> "alpha beta gamma").toDF("doc_id", "text")
    val out = Dedup.substrDecontaminate(docs)
      .select("doc_id", "n_contaminated_windows", "first_pos", "clean")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
    assert(out(0) == ((1L, 3L, 30L, false))) // windows at 30, 31, 32
    assert(out(1) == ((2L, 0L, -1L, true)))
    assert(out(2) == ((3L, 0L, -1L, true)))
  }

  test("incremental dedup on the fixture: output is exactly the delta " +
       "shard, flags are mutually consistent, matches point at the index") {
    val out = Dedup.qIncrementalDedup(spark, sf0001)
      .select("doc_id", "n_index_matches", "best_match_id", "best_est_jaccard", "keep")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    val expected = Tables.documents(spark, sf0001)
      .where(col("doc_id") % 5 === 4).select("doc_id").as[Long].collect().toSet
    assert(out.map(_._1).toSet == expected && out.size == expected.size)
    out.foreach { case (_, n, best, est, keep) =>
      assert(keep == (n == 0L))
      if (n == 0L) assert(best == -1L && est == 0.0)
      else assert(best % 5 != 4 && est >= 0.5 && est <= 1.0)
    }
  }

  test("lsh bucket ledger: every band row is accounted for and the " +
       "candidate-pair arithmetic is exact") {
    val out = Dedup.lshBucketStats(sampleDocs)
      .select("bucket_n", "n_buckets", "n_rows", "candidate_pairs")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._3).sum == 6L * Dedup.NumBands)
    out.foreach { case (s, nb, nr, cp) =>
      assert(nr == s * nb && cp == nb * s * (s - 1) / 2)
    }
    assert(out.exists(_._1 >= 2L)) // the planted identical pair collides
  }

  test("minhash calibration: the planted identical pair reports " +
       "est = exact = 1 with zero error") {
    val out = Dedup.minhashCalibrationMembers(sampleDocs, 0.5)
      .select("est_bucket", "n_pairs", "mean_est", "mean_exact", "mae")
      .as[(Double, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq((1.0, 1L, 1.0, 1.0, 0.0)))
  }

  test("minhash calibration digest-first arm: rep-weighted buckets equal " +
       "the member enumeration; the dispatch picks it on dup-heavy input") {
    import spark.implicits._
    // regimes: a 3-strong byte-identical family (100-102) + a near-dup
    // cross neighbor (103, shingle Jaccard 3/4) whose rep pair must expand
    // at weight 3; token-free byte twins (200, 201 — sign via the
    // whole-text fallback shingle, so unlike the TF-cosine op they DO pair
    // at est = exact = 1); the fixture's planted exact duplicate (0, 5)
    val extra = Seq(
      (100L, "glacier moraine cirque arete tarn"),
      (101L, "glacier moraine cirque arete tarn"),
      (102L, "glacier moraine cirque arete tarn"),
      (103L, "glacier moraine cirque arete tarn ridge"),
      (200L, "!!! ??"), (201L, "!!! ??")).toDF("doc_id", "text")
    val docs = sampleDocs.unionByName(extra)
    def run(f: => org.apache.spark.sql.DataFrame): Set[(Double, Long, Double, Double, Double)] =
      f.select("est_bucket", "n_pairs", "mean_est", "mean_exact", "mae")
        .as[(Double, Long, Double, Double, Double)].collect().toSet
    val members = run(Dedup.minhashCalibrationMembers(docs, 0.5))
    val digest = run(Dedup.minhashCalibrationDigestFirst(docs, 0.5))
    assert(digest == members,
      s"rep-weighted != member enumeration: ${digest -- members} / ${members -- digest}")
    // dup mass 1 - 8/12 = 0.33: the public dispatch routes digest-first
    assert(run(Dedup.minhashCalibration(docs)) == digest)
    // the 1.0 bucket carries every within-family pair: C(3,2) + (0,5) +
    // the token-free twins = 5, all at est = exact = 1
    assert(members.contains((1.0, 5L, 1.0, 1.0, 0.0)), s"got: $members")
    // the cross rep pair (100, 103) expanded at family weight 3 — a
    // sub-1.0 bucket whose pair count is the member-level 3, not 1
    val crossBuckets = members.filter(_._1 < 1.0)
    assert(crossBuckets.map(_._2).sum == 3L,
      s"cross candidates must weight by fam size: $crossBuckets")
    crossBuckets.foreach { case (_, _, _, meanExact, _) =>
      assert(math.abs(meanExact - 0.75) < 1e-9) // 3 shared / 4 union shingles
    }
    // degenerate threshold > 1.0: the member arm's est cut admits nothing,
    // so the digest arm's within-family mass must stay out too
    assert(run(Dedup.minhashCalibrationDigestFirst(docs, 1.5)) ==
      run(Dedup.minhashCalibrationMembers(docs, 1.5)),
      "minEstJaccard > 1.0 must empty BOTH arms")
    assert(run(Dedup.minhashCalibrationDigestFirst(docs, 1.5)).isEmpty)
  }

  test("vector digest-first arm drops NaN-poisoned byte-twin families " +
       "exactly like the member kernel") {
    import spark.implicits._
    // Spark SQL orders NaN greatest (NaN >= t is TRUE), while the member
    // kernel's Scala `s >= cut` on a NaN cosine is FALSE — the digest
    // arm's within-family gate must side with the kernel.
    val emb = Seq(
      (100L, Seq(0.6, 0.8, 0.0, 0.0)),
      (101L, Seq(0.6, 0.8, 0.0, 0.0)),
      (102L, Seq(0.6, 0.8, 0.0, 0.0)),
      (400L, Seq(Double.NaN, 1.0, 0.0, 0.0)),
      (401L, Seq(Double.NaN, 1.0, 0.0, 0.0)),
      (402L, Seq(Double.NaN, 1.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0)),
      (2L, Seq(0.5, 0.5, 0.5, 0.0))).toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.as[(Long, Long, Double)].collect().toSet
    val mem = pairs(VectorSearch.nearDuplicatePairsBlockedMembers(emb, 0.45, 4))
    val dig = pairs(VectorSearch.nearDuplicatePairsBlockedDigestFirst(emb, 0.45, 4))
    assert(dig == mem, s"NaN handling diverges: ${dig -- mem} / ${mem -- dig}")
    assert(!mem.exists { case (a, b, _) => a >= 400L || b >= 400L },
      "NaN-poisoned pairs must be dropped on both arms")
    assert(mem.contains((100L, 101L, 1.0)), "healthy family still pairs")
  }

  test("ingest admission (p4): verdicts fire in gate order on a planted shard") {
    // high-quality text generator: ~120 words, ~1/3 stopwords, no punct
    def longText(seedWords: Seq[String]): String =
      (0 until 40).flatMap(i =>
        Seq("the", seedWords(i % seedWords.length) + ('a' + i % 26).toChar,
            "with")).mkString(" ")
    val a = longText(Seq("alpha", "beta", "gamma"))
    val b = longText(Seq("ocean", "tide", "reef"))
    val fillers = (0 until 26).map(i => longText(Seq(
      s"fill${('a' + i).toChar}", s"word${('a' + i).toChar}", s"stone${('a' + i).toChar}")))
    // ids 0..24; delta = {4, 9, 14, 19, 24}
    val texts = (0 to 24).map {
      case 0      => a          // index original
      case 9 | 14 => a          // delta copies of the index doc
      case 4 | 24 => b          // delta twins, unseen by the index
      case 19     => "zz !!"    // junk: fails the quality gate
      case i      => fillers(i)
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = graft.operators.Pipeline.ingestAdmission(docs)
      .select("doc_id", "verdict", "admitted")
      .as[(Long, String, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(4L, 9L, 14L, 19L, 24L))
    assert(out.map(_._2) == Seq("admitted", "index_duplicate",
      "index_duplicate", "low_quality", "delta_exact_duplicate"))
    assert(out.map(_._3) == Seq(true, false, false, false, false))
    // the accounting contract: one report row per delta doc, always —
    // the gate frames join LEFT from the delta spine, so a misbehaving
    // upstream surfaces as `missing_signal` instead of dropping rows
    val deltaCount = docs.where(pmod(col("doc_id"), lit(5L)) === 4L).count()
    assert(out.size.toLong == deltaCount,
      s"report must cover every delta doc: ${out.size} vs $deltaCount")
  }

  test("family-size stats: planted families land in the right histogram " +
       "buckets and the MLE matches the closed form") {
    // 3 identical copies of A (family of 3), 2 of B (family of 2), 2 singletons
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "ocean tide current wave reef lagoon surf harbor breeze cliff"
    val texts = Seq(a, a, a, b, b,
      "granite basalt quartz feldspar mica schist gneiss marble slate",
      "violin cello clarinet bassoon trumpet timpani harp piccolo flute")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Dedup.familySizeStats(docs)
      .select("family_size", "n_families", "n_docs", "family_share", "alpha_mle")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(t => (t._1, t._2, t._3)) ==
      Seq((1L, 2L, 2L), (2L, 1L, 2L), (3L, 1L, 3L)))
    assert(out.map(_._4).sum == 1.0)
    // α̂ = 1 + n / Σ ln(s/0.5), n = 4 families with sizes {1,1,2,3}
    val expected = 1.0 + 4.0 /
      Seq(1.0, 1.0, 2.0, 3.0).map(s => math.log(s / 0.5)).sum
    assert(math.abs(out.head._5 - expected) < 1e-6)
    assert(out.map(_._5).distinct.size == 1) // alpha constant across rows
  }

  test("persisted LSH index: the parquet round-trip probe equals the inline " +
       "incremental dedup, and a band filter prunes partitions") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_index_matches", "best_match_id", "best_est_jaccard", "keep")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    val inline = rows(Dedup.qIncrementalDedup(spark, sf0001))
    val persisted = rows(Dedup.qIncrementalDedupPersisted(spark, sf0001))
    assert(inline.nonEmpty && persisted == inline)
    // the partitioned band layout prunes at file listing when probing;
    // resolve the artifact path the way the operator does (the previous
    // hand-built legacy path only worked while a stale pre-sessionScopedDir
    // directory lingered in tmp)
    val dir = graft.operators.Artifacts.sessionScopedDir(spark, "lsh_index", sf0001)
    val pruned = spark.read.parquet(dir + "/bands").where(col("band_idx") === 0)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("band_idx"),
      s"expected band_idx partition filter in:\n$scan")
  }

  test("ivf cell stats: populations partition the corpus, shares sum to 1, " +
       "and surplus cells report empty") {
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val out = VectorSearch.ivfCellStats(emb, nCells = 16)
      .select("cell", "n_vecs", "share", "skew", "avg_sqdist")
      .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == (0 until 16))
    assert(out.map(_._2).sum == n)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4)
    out.foreach { case (_, nv, share, skew, d) =>
      assert(d >= 0.0)
      assert(math.abs(skew - share * 16) < 2e-3)
      if (nv == 0) assert(share == 0.0 && d == 0.0)
    }
    // more cells than vectors forces empty cells into the report
    val tiny = VectorSearch.ivfCellStats(emb.where(col("vec_id") < 5), nCells = 8)
      .select("n_vecs").as[Long].collect()
    assert(tiny.length == 8 && tiny.count(_ == 0L) >= 3 && tiny.sum == 5)
  }

  test("incremental dedup: delta docs drop only on INDEX matches; " +
       "delta-internal duplicates are invisible to the one-sided join") {
    // ids 0..14, deltaMod=5 → delta = {4, 9, 14}, index = the rest.
    //  - doc 9 copies index docs 0 AND 1 → dropped, 2 matches, best id 0
    //  - docs 4 and 14 are identical to EACH OTHER (both delta) but match
    //    nothing in the index → both kept, proving delta×delta never joins
    val fillers = Seq(
      "Deep learning uses neural networks with multiple layers to process patterns.",
      "The transformer architecture revolutionized processing with attention mechanisms.",
      "Relational databases organize information into tables with rows and columns.",
      "Photosynthesis converts sunlight carbon dioxide and water into glucose energy.",
      "Volcanic eruptions reshape landscapes through lava flows and ash deposition.",
      "Symphony orchestras balance strings woodwinds brass and percussion sections.",
      "Coral reefs host extraordinary biodiversity across tropical ocean waters.",
      "Medieval cathedrals demonstrate remarkable engineering with flying buttresses.",
      "Quantum computers exploit superposition and entanglement for parallel computation.",
      "Glaciers carve valleys over millennia leaving moraines and polished bedrock.")
    val dupText = sampleTexts.head
    val deltaOnlyText = "Natural language processing enables computers to parse human language."
    val texts = (0 to 14).map {
      case 0 | 1 => dupText
      case 9     => dupText
      case 4 | 14 => deltaOnlyText
      case i     => fillers((i * 7) % fillers.length)
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(docs, deltaMod = 5)
      .select("doc_id", "n_index_matches", "best_match_id", "best_est_jaccard", "keep")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(4L, 9L, 14L))
    assert(out(1) == ((9L, 2L, 0L, 1.0, false)))
    assert(out(0) == ((4L, 0L, -1L, 0.0, true)))
    assert(out(2) == ((14L, 0L, -1L, 0.0, true)))
  }
}
