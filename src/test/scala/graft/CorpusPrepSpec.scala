package graft

import graft.operators.CorpusPrep
import org.apache.spark.sql.functions._

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  test("decontamination flags only documents sharing an n-gram with the eval set") {
    val evalSet = Seq(
      (100L, "alpha bravo charlie delta echo foxtrot")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words alpha bravo charlie delta echo then more trailing words"),
      (2L, "completely unrelated content about gardens and weather patterns today"),
      (3L, "alpha bravo charlie")). // only a 3-gram, shorter than n=5 — no hit
      toDF("doc_id", "text")
    val got = CorpusPrep.decontaminate(corpus, evalSet, n = 5)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L))
    val (_, hits, total, frac) = got(1L)
    assert(hits == 1L) // "alpha bravo charlie delta echo" is the one shared 5-gram
    assert(total == 6L) // 10 tokens → 6 distinct 5-grams
    assert(math.abs(frac - 1.0 / 6) < 1e-6)
  }

  test("bloom-prefiltered decontamination equals the exact broadcast join") {
    // bloom admits no false negatives, so prefilter + exact verify must be
    // row-identical to the exact path — on the planted corpus and testdata
    val evalSet = Seq(
      (100L, "alpha bravo charlie delta echo foxtrot")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words alpha bravo charlie delta echo then more trailing words"),
      (2L, "completely unrelated content about gardens and weather patterns today"),
      (3L, "alpha bravo charlie")).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(canon(CorpusPrep.decontaminateBloom(corpus, evalSet, n = 5)) ==
           canon(CorpusPrep.decontaminate(corpus, evalSet, n = 5)))
    val docs = Tables.documents(spark, sf0001)
    val c = docs.where(col("doc_id") % 20 =!= 0)
    val e = docs.where(col("doc_id") % 20 === 0)
    val exact = canon(CorpusPrep.decontaminate(c, e))
    val bloom = canon(CorpusPrep.decontaminateBloom(c, e))
    assert(exact.nonEmpty && bloom == exact)
  }

  test("split assignment is deterministic, bucketed, and consistently named") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = CorpusPrep.assignSplit(docs).as[(Long, Long, String)].collect().sortBy(_._1)
    val b = CorpusPrep.assignSplit(docs).as[(Long, Long, String)].collect().sortBy(_._1)
    assert(a.sameElements(b), "same salt must give identical assignments")
    assert(a.forall { case (_, bucket, _) => bucket >= 0 && bucket < 10000 })
    assert(a.forall { case (_, bucket, split) =>
      split == (if (bucket < 9000) "train" else if (bucket < 9500) "validation" else "test")
    })
    // a different salt reshuffles at least one document
    val c = CorpusPrep.assignSplit(docs, salt = "other").as[(Long, Long, String)].collect().sortBy(_._1)
    assert(!a.map(_._2).sameElements(c.map(_._2)))
  }

  test("training order: a deterministic partition into dense balanced shards, " +
       "invariant to input partitioning") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = docs.count()
    val a = CorpusPrep.trainingOrder(docs, nShards = 4)
      .as[(Long, String, Int, Long)].collect().sortBy(_._1)
    // every doc exactly once; (shard, pos) unique
    assert(a.length == n)
    assert(a.map(r => (r._3, r._4)).distinct.length == n)
    // dense positions per shard: 0..size-1
    a.groupBy(_._3).foreach { case (s, rows) =>
      assert(rows.map(_._4).sorted.sameElements(0L until rows.length.toLong), s"shard $s")
    }
    // balanced within a loose bound (hash-uniform; deterministic fixture)
    val sizes = a.groupBy(_._3).view.mapValues(_.length).values.toSeq
    assert(sizes.size == 4 && sizes.max <= sizes.min * 2, s"imbalance: $sizes")
    // invariant to partitioning and row order
    val b = CorpusPrep.trainingOrder(docs.orderBy(desc("doc_id")).repartition(13),
        nShards = 4)
      .as[(Long, String, Int, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
    // a different salt produces a different order
    val c = CorpusPrep.trainingOrder(docs, nShards = 4, salt = "other")
      .as[(Long, String, Int, Long)].collect().sortBy(_._1)
    assert(!a.map(r => (r._3, r._4)).sameElements(c.map(r => (r._3, r._4))))
  }

  test("split novelty: copied validation doc scores 0, unique doc scores 1") {
    // find real bucket assignments first — the split hashes doc_id, so the
    // fixture must plant text on ids that actually land in each split
    val ids = (0L until 400L).toDF("doc_id")
    val bySplit = CorpusPrep.assignSplit(ids).as[(Long, Long, String)]
      .collect().groupBy(_._3).view.mapValues(_.map(_._1).sorted).toMap
    val trainIds = bySplit("train").take(2)
    val valIds = bySplit("validation").take(2)
    assert(trainIds.size == 2 && valIds.size == 2, s"degenerate fixture: $bySplit")
    val leaked = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (trainIds(0), leaked),
      (trainIds(1), "completely separate training text about database engines and storage"),
      (valIds(0), leaked), // every 8-gram seen in train
      (valIds(1), "unique validation prose mentioning telescopes nebulae quasars pulsars comets meteors"))
      .toDF("doc_id", "text")
    val out = CorpusPrep.splitNovelty(docs).as[(Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet == valIds.toSet, "only validation docs are audited")
    assert(out(valIds(0))._4 == 0.0, "fully-leaked doc has zero novelty")
    assert(out(valIds(0))._2 == out(valIds(0))._3, "all grams seen")
    assert(out(valIds(1))._4 == 1.0, "disjoint doc is fully novel")
    assert(out(valIds(1))._3 == 0L)
  }

  test("chunking with zero overlap partitions the token stream exactly") {
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(rnd.nextInt(40))(words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val totals = docs
      .select($"doc_id", size(graft.functions.TextFns.tokens($"text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    val chunks = graft.operators.TextQuality.chunkTokens(docs, chunkSize = 7, overlap = 0)
      .as[(Long, Long, Long, Long, String)].collect()
    chunks.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._4).sum == totals(id), s"doc $id token coverage")
      val expected = math.max(1, math.ceil(totals(id) / 7.0).toInt)
      assert(rows.length == expected, s"doc $id chunk count")
    }
    assert(chunks.map(_._1).distinct.length == 40)
  }

  test("packing offsets are contiguous head-to-tail within each shard") {
    val rnd = new scala.util.Random(11)
    val words = Vector("golf", "hotel", "india", "juliet", "kilo")
    val docs = (1L to 60L).map(i =>
      (i, s"src${rnd.nextInt(4)}",
        Seq.fill(rnd.nextInt(25))(words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = CorpusPrep.packOffsets(docs, ctxLen = 16)
      .as[(Long, String, Long, Long, Long, Long)].collect()
    got.groupBy(_._2).foreach { case (src, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, n, packId, packOff, nPacks) =>
        assert(packId * 16 + packOff == cum, s"$src doc $id offset")
        if (n > 0)
          assert(nPacks == (cum + n - 1) / 16 - cum / 16 + 1, s"$src doc $id span")
        cum += n
      }
    }
  }

  test("prep pipeline: split totals cover the deduped, gated corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val rows = CorpusPrep.qPrepPipeline(spark, sf0001)
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._1).toSet.subsetOf(Set("train", "validation", "test")))
    assert(rows.forall(r => r._2 > 0 && r._3 > 0))
    val kept = rows.map(_._2).sum
    assert(kept <= docs.count(), "pipeline can only drop documents")
    val train = rows.find(_._1 == "train").map(_._2).getOrElse(0L)
    assert(train > kept / 2, "train split holds the 90% bucket share")
  }

  test("cross-doc duplication: shared n-gram fraction per document") {
    val shared = "alpha bravo charlie delta echo" // one 5-gram, in docs 1 and 2
    val df = Seq(
      (1L, shared),
      (2L, s"$shared foxtrot golf hotel india juliet"),
      (3L, "kilo lima mike november oscar papa")).toDF("doc_id", "text")
    val got = CorpusPrep.crossDocDuplication(df, n = 5)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 1L, 1L, 1.0)), "doc 1 is entirely shared")
    // doc 2 has 6 grams, exactly one shared with doc 1
    assert(got(2L)._2 == 6L && got(2L)._3 == 1L)
    assert(math.abs(got(2L)._4 - 1.0 / 6) < 1e-6)
    assert(got(3L) == ((3L, 2L, 0L, 0.0)), "6 tokens -> 2 grams, none shared")
  }

  test("source mixing: fractional rates give deterministic copy counts") {
    val docs = (1L to 400L).map(i => (i, if (i % 2 == 0) "heavy" else "light", "txt"))
      .toDF("doc_id", "source", "text")
    val got = CorpusPrep.mixSources(docs, Map("heavy" -> 2.5, "light" -> 0.25))
      .select("doc_id", "source", "n_copies", "accept")
      .as[(Long, String, Long, Boolean)].collect()
    val heavy = got.filter(_._2 == "heavy")
    val light = got.filter(_._2 == "light")
    assert(heavy.forall(r => r._3 == 2L || r._3 == 3L), "2.5x -> 2 or 3 copies")
    assert(heavy.forall(_._4), "up-sampled sources always accept")
    assert(light.forall(r => r._3 == 0L || r._3 == 1L))
    // the fractional shares land near their targets over 200 docs each
    val heavy3 = heavy.count(_._3 == 3L).toDouble / heavy.length
    val light1 = light.count(_._3 == 1L).toDouble / light.length
    assert(math.abs(heavy3 - 0.5) < 0.15, s"heavy 3-copy share $heavy3")
    assert(math.abs(light1 - 0.25) < 0.15, s"light keep share $light1")
    // re-running yields the identical assignment
    val again = CorpusPrep.mixSources(docs, Map("heavy" -> 2.5, "light" -> 0.25))
      .select("doc_id", "source", "n_copies", "accept")
      .as[(Long, String, Long, Boolean)].collect()
    assert(got.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("temperature mixing flattens toward uniform and preserves the budget") {
    // token masses 10000 / 100: sqrt-flattening must upweight the small
    // source and downweight the large one, and the α-shares must sum to 1
    val docs =
      ((1L to 100L).map(i => (i, "big", ("w " * 100).trim)) ++
       (101L to 110L).map(i => (i, "small", ("w " * 10).trim))).toDF("doc_id", "source", "text")
    val got = CorpusPrep.temperatureMixRates(docs)
      .select("source", "n_tokens", "natural_share", "alpha_share", "sample_factor")
      .as[(String, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    val big = got("big"); val small = got("small")
    assert(big._2 == 10000L && small._2 == 100L)
    assert(math.abs(big._3 + small._3 - 1.0) < 1e-5)
    assert(math.abs(big._4 + small._4 - 1.0) < 1e-5)
    assert(small._4 > small._3, "alpha < 1 upweights the small source")
    assert(big._4 < big._3, "alpha < 1 downweights the large source")
    assert(small._5 > 1.0 && big._5 < 1.0)
    // exact sqrt mass: w_big=100, w_small=10 -> alpha shares 10/11, 1/11
    assert(math.abs(big._4 - 100.0 / 110.0) < 1e-5)
    assert(math.abs(small._4 - 10.0 / 110.0) < 1e-5)
  }

  test("packing lays documents head-to-tail within each source shard") {
    // token counts: a1=4, a2=8, a3=5 (source a); b1=12 (source b); ctx=10
    val docs = Seq(
      (1L, "a", "alpha bravo charlie delta"),
      (2L, "a", "echo foxtrot golf hotel india juliet kilo lima"),
      (3L, "a", "mike november oscar papa quebec"),
      (4L, "b", "romeo sierra tango uniform victor whiskey xray yankee zulu alpha bravo charlie"))
      .toDF("doc_id", "source", "text")
    val got = CorpusPrep.packOffsets(docs, ctxLen = 10)
      .as[(Long, String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // (doc, source, n_tokens, pack_id, pack_offset, n_packs)
    assert(got(1L) == ((1L, "a", 4L, 0L, 0L, 1L)))
    assert(got(2L) == ((2L, "a", 8L, 0L, 4L, 2L))) // spans packs 0 and 1
    assert(got(3L) == ((3L, "a", 5L, 1L, 2L, 1L)))
    assert(got(4L) == ((4L, "b", 12L, 0L, 0L, 2L))) // shard b starts at its own pack 0
  }

  test("token budget: greedy prefix per source, first over-budget doc lands") {
    val budget = 500L
    val rows = CorpusPrep.tokenBudgetSelect(Tables.documents(spark, sf0001), budget)
      .select("doc_id", "source", "quality", "ws_tokens", "selected")
      .as[(Long, String, Double, Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.exists(_._5) && rows.exists(!_._5))
    rows.groupBy(_._2).values.foreach { src =>
      // replay the greedy in order: selected must be exactly the prefix
      // whose pre-inclusion cumsum is under budget
      val ordered = src.sortBy(r => (-r._3, r._1))
      var cum = 0L
      ordered.foreach { case (id, _, _, toks, selected) =>
        assert(selected == (cum < budget), s"doc $id selected=$selected at cum=$cum")
        cum += toks
      }
      // selection is a prefix: no selected doc after the first unselected
      val flags = ordered.map(_._5)
      assert(!flags.dropWhile(identity).contains(true))
    }
  }

  test("packing: empty documents occupy zero packs at the current offset") {
    val docs = Seq(
      (1L, "a", "alpha bravo charlie"),
      (2L, "a", ""),
      (3L, "a", "delta echo")).toDF("doc_id", "source", "text")
    val got = CorpusPrep.packOffsets(docs, ctxLen = 4)
      .as[(Long, String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(2L) == ((2L, "a", 0L, 0L, 3L, 0L)))
    assert(got(3L) == ((3L, "a", 2L, 0L, 3L, 2L))) // 2 tokens across packs 0/1
  }

  test("packing efficiency: block counts and waste match hand-computed values") {
    // 3 docs of 3, 5, and 9 whitespace tokens; ctx = 4:
    // naive blocks = ceil(3/4)+ceil(5/4)+ceil(9/4) = 1+2+3 = 6
    // packed blocks = ceil(17/4) = 5
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a b c d e"),
      (3L, "a b c d e f g h i")).toDF("doc_id", "text")
    val r = CorpusPrep.packingEfficiency(docs, Seq(4)).collect().head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("total_tokens") == 17L)
    assert(r.getAs[Long]("naive_blocks") == 6L)
    assert(r.getAs[Long]("packed_blocks") == 5L)
    assert(r.getAs[Double]("naive_waste") ==
      BigDecimal(1.0 - 17.0 / 24.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("packed_waste") ==
      BigDecimal(1.0 - 17.0 / 20.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // packed waste never exceeds naive waste at any length
    val multi = CorpusPrep.packingEfficiency(docs).collect()
    assert(multi.forall(m =>
      m.getAs[Double]("packed_waste") <= m.getAs[Double]("naive_waste")))
  }
}
