package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling (x53/x54): hashed-gram feature accounting,
  * the sign of the log-likelihood-ratio weights on a planted target
  * domain, and the Gumbel draw's determinism + finiteness.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two distinct "domains" with disjoint content words: wiki-ish docs
  // (target) and spam-ish docs, plus one doc of each vocabulary mix
  private def planted = Seq(
    (0L, "history science culture history science encyclopedia article", "wiki"),
    (1L, "science culture article history encyclopedia knowledge", "wiki"),
    (2L, "buy cheap pills discount offer casino winner prize", "spam"),
    (3L, "cheap offer casino discount winner pills jackpot", "spam"),
    (4L, "history science article encyclopedia culture knowledge", "unlabeled"),
    (5L, "buy cheap discount casino offer prize winner", "unlabeled"),
    (6L, "", "unlabeled")
  ).toDF("doc_id", "text", "source")

  test("n_grams counts unigrams plus adjacent bigrams of the filtered stream") {
    val w = Dsir.importanceWeights(planted, Seq("wiki"))
      .select("doc_id", "n_grams").as[(Long, Long)].collect().toMap
    // doc 0: 7 tokens -> 7 unigrams + 6 bigrams = 13
    assert(w(0L) == 13L)
    // doc 6: empty -> zero grams, still present
    assert(w(6L) == 0L)
    assert(w.size == 7)
  }

  test("documents rank by target-likeness; zero-gram documents weigh 0") {
    // absolute signs are smoothing-dependent (B >> gram counts pulls every
    // observed-gram LLR toward ln((tc+1)/(rc+1)) < 0) — the meaningful,
    // smoothing-robust property is the ORDERING: every wiki-vocabulary
    // document must outscore every spam-vocabulary document under a wiki
    // target, with clear separation
    val w = Dsir.importanceWeights(planted, Seq("wiki"))
      .select("doc_id", "log_weight").as[(Long, Double)].collect().toMap
    val wiki = Seq(0L, 1L, 4L).map(w)
    val spam = Seq(2L, 3L, 5L).map(w)
    assert(wiki.min > spam.max + 1.0,
      s"wiki-vocab docs $wiki should clearly outscore spam-vocab docs $spam")
    // the zero-gram doc is exactly 0
    assert(w(6L) == 0.0)
  }

  test("weights equal an independently-computed reference implementation") {
    // plain-Scala replica of the whole pipeline: tokenize, gram, hash,
    // smooth, score — catches bucketing/smoothing/join defects the
    // structural tests can't
    val stop = graft.functions.TextFns.Stopwords.toSet
    def md5Long60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val rows = Seq(
      (0L, "history science culture history science encyclopedia article", "wiki"),
      (1L, "science culture article history encyclopedia knowledge", "wiki"),
      (2L, "buy cheap pills discount offer casino winner prize", "spam"),
      (3L, "cheap offer casino discount winner pills jackpot", "spam"),
      (4L, "history science article encyclopedia culture knowledge", "unlabeled"),
      (5L, "buy cheap discount casino offer prize winner", "unlabeled"),
      (6L, "", "unlabeled"))
    val B = Dsir.NumBuckets
    def grams(text: String): Seq[String] = {
      val t = text.split("\\s+").filter(w => w.matches("[a-z]{3,}") && !stop(w)).toSeq
      t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val feat: Map[Long, Map[Long, Long]] = rows.map { case (id, text, _) =>
      id -> grams(text).groupBy(g => md5Long60(g) % B)
        .map { case (b, gs) => b -> gs.size.toLong }
    }.toMap
    def distOf(ids: Seq[Long]): Map[Long, Long] =
      ids.flatMap(feat(_).toSeq).groupBy(_._1)
        .map { case (b, cs) => b -> cs.map(_._2).sum }
    val raw = distOf(rows.map(_._1))
    val tgt = distOf(rows.filter(_._3 == "wiki").map(_._1))
    val (nr, nt) = (raw.values.sum, tgt.values.sum)
    def llr(b: Long): Double =
      math.log((tgt.getOrElse(b, 0L) + 1).toDouble / (nt + B)) -
      math.log((raw(b) + 1).toDouble / (nr + B))
    val expected = rows.map { case (id, _, _) =>
      id -> BigDecimal(feat(id).map { case (b, c) => c * llr(b) }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val actual = Dsir.importanceWeights(planted, Seq("wiki"))
      .select("doc_id", "log_weight").as[(Long, Double)].collect().toMap
    for ((id, e) <- expected)
      assert(math.abs(actual(id) - e) < 2e-6, s"doc $id: engine ${actual(id)} vs reference $e")
  }

  test("gumbel sample is deterministic, finite, ranked, and biased to weight") {
    val s1 = Dsir.gumbelSample(planted, n = 4, targetSources = Seq("wiki"))
      .collect().map(r => (r.getAs[Long]("sample_rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("gumbel_key")))
    val s2 = Dsir.gumbelSample(planted, n = 4, targetSources = Seq("wiki"))
      .collect().map(r => (r.getAs[Long]("sample_rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("gumbel_key")))
    assert(s1.toSeq == s2.toSeq)
    assert(s1.length == 4)
    assert(s1.forall { case (_, _, k) => !k.isNaN && !k.isInfinite })
    // ranks are 1..n in descending key order
    assert(s1.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    val keys = s1.map(_._3).toSeq
    assert(keys == keys.sorted.reverse)
  }

  test("the full-corpus entry covers every document once") {
    val out = Dsir.qDsirWeights(spark, sf0001)
    val n = out.count()
    assert(n == out.select("doc_id").distinct().count())
    assert(n > 0)
  }

  test("plan: the bucket-LLR model rides a broadcast join, no cartesian") {
    val plan = Dsir.qDsirWeights(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the <= NumBuckets-row LLR frame must broadcast into the scoring join")
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoop"))
  }
}
