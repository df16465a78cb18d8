package graft

class WorstSpansSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("worst span localizes the planted low-likelihood run") {
    // common phrase repeated across docs -> its bigrams are high-prob;
    // doc 0 hides a 12-token gibberish run between two common stretches
    val common = "alpha beta gamma delta epsilon zeta"
    val commonRun = (common + " ") * 3 // 18 tokens
    val gibberish = (0 until 12).map(i =>
      s"qxz${('a' + i).toChar}${('a' + i).toChar}junk").mkString(" ")
    val target = commonRun + gibberish + " " + commonRun.trim
    val docs = ((1 to 8).map(i => (i.toLong, (common + " ") * 5)) :+
      (0L -> target)).toDF("doc_id", "text")
    val out = graft.operators.TextQuality.worstSpans(docs)
      .select("doc_id", "n_bigrams", "worst_start", "worst_mean")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val (_, n, start, mean) = out(0L)
    assert(n == 18 + 12 + 18 - 1)
    // the worst 10-bigram window must overlap the gibberish run
    // (gibberish token positions 18..29 -> bigram positions 17..29)
    assert(start >= 17L - 9 && start <= 29L,
      s"worst span at $start does not overlap the planted run")
    // and it must score strictly below a pure-common doc's worst window
    val cleanWorst = out(1L)._4
    assert(mean < cleanWorst)
  }
}

import graft.operators.TextQuality

/** Text-quality operators on planted fixtures: repetition, PII redaction,
  * fingerprints, language ID.
  */
class TextQualitySpec extends SparkSpec {

  test("cleanText: NFC composes, NFKC does not fire, zero-width and " +
       "controls strip, whitespace collapses") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val composed = "caf\u00e9"            // é as one code point
    val decomposed = "cafe\u0301"         // e + COMBINING ACUTE
    val cases = Seq(
      (1L, decomposed),
      // U+FB01 ligature is a COMPATIBILITY equivalence - NFC keeps it
      (2L, "\uFB01le"),
      // zero-width space / joiner / BOM stripped
      (3L, "a\u200Bb\u200Dc\uFEFFd"),
      // C0 controls stripped outright (no space left behind)
      (4L, "a\u0000\u0007bc"),
      // VT/FF stripped, then tab/CRLF collapse with spaces
      (5L, "x \t y\r\nz\u000B\u000Cw"),
      (6L, "  already   clean  "),
      // ZWSP between base letter and combining mark BLOCKS composition \u2014
      // the strip must run BEFORE NFC so the acute still composes onto e
      (7L, "cafe\u200B\u0301"))
      .toDF("doc_id", "text")
    val out = cases.select(col("doc_id"),
        graft.operators.TextQuality.cleanText(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == composed)
    assert(out(2L) == "\uFB01le")
    assert(out(3L) == "abcd")
    assert(out(4L) == "abc")
    assert(out(5L) == "x y zw")
    assert(out(6L) == "already clean")
    assert(out(7L) == composed,
      "strip-then-NFC must yield the composed form, not decomposed leftovers")
  }

  test("normalizeText flags changed documents and digests canonical text") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "cafe\u0301"), (2L, "plain text"))
      .toDF("doc_id", "text")
    val rows = graft.operators.TextQuality.normalizeText(docs)
      .select("doc_id", "n_chars_raw", "n_chars_norm", "changed", "norm_digest")
      .as[(Long, Long, Long, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(rows(1L) == ((5L, 4L, true,
      // md5 of the composed form's UTF-8 bytes
      java.security.MessageDigest.getInstance("MD5")
        .digest("caf\u00e9".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)))
    assert(rows(2L)._3 == false && rows(2L)._1 == 10L && rows(2L)._2 == 10L)
  }

  import spark.implicits._

  test("cross-doc line dedup keeps first occurrence, exempts short lines") {
    val longA = "this is a long repeated boilerplate line here"
    val longB = "another sufficiently long and unique line of text"
    val df = Seq(
      (1L, s"$longA\nshort\n$longB"),
      (2L, s"intro line that is long enough to participate\n$longA"),
      (3L, s"$longA\nshort"), // both lines dropped/kept: longA dup, short exempt
      (4L, "tiny")).toDF("doc_id", "text")
    val got = graft.operators.TextQuality.crossDocLineDedup(df)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_kept", "n_dropped")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 0L),   // first occurrence of longA + exempt + unique
      (2L, 2L, 1L, 1L),   // longA already seen in doc 1
      (3L, 2L, 1L, 1L),   // longA dropped, "short" exempt
      (4L, 1L, 1L, 0L)))  // under minChars: always kept
    // reassembly preserves original line order of the kept lines
    val text2 = graft.operators.TextQuality.crossDocLineDedup(df)
      .where($"doc_id" === 2L).select("dedup_md5").as[String].head()
    val expect2 = java.security.MessageDigest.getInstance("MD5")
      .digest("intro line that is long enough to participate".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(text2 == expect2)
  }

  test("repetition stats: duplicate lines counted, empties dropped") {
    val df = Seq(
      (1L, "a line\na line\nanother\n\n  \na line"),
      (2L, "unique one\nunique two"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextQuality.repetitionStats(df)
      .as[(Long, Long, Long, Double)].collect().toMap2
    assert(got(1L) == (4L, 2L, 0.5))
    assert(got(2L) == (2L, 2L, 0.0))
    assert(got(3L) == (0L, 0L, 0.0))
  }

  test("PII redaction: emails and urls counted and replaced") {
    val df = Seq(
      (1L, "mail me at a.b@example.com or see https://example.com/x?q=1 now"),
      (2L, "no pii here")).toDF("doc_id", "text")
    val counts = TextQuality.redactPii(df)
      .select("doc_id", "n_emails", "n_urls").as[(Long, Long, Long)].collect().toMap2
    assert(counts(1L) == (1L, 1L))
    assert(counts(2L) == (0L, 0L))
    // the redacted digest differs from the original text's digest for doc 1 only
    val joined = TextQuality.redactPii(df)
      .join(df, "doc_id")
      .selectExpr("doc_id", "redacted_md5 = md5(cast(text AS binary)) AS unchanged")
      .as[(Long, Boolean)].collect().toMap
    assert(!joined(1L) && joined(2L))
  }

  test("fingerprints: formatting-invariant digest, order-sensitive rolling hash") {
    val df = Seq(
      (1L, "Spark   engine\n rocks"),
      (2L, "spark engine rocks"),    // same after normalization
      (3L, "rocks engine spark")).   // same tokens, different order
      toDF("doc_id", "text")
    val fp = TextQuality.fingerprints(df)
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fp(1L)._1 == fp(2L)._1, "digest must ignore case/whitespace")
    assert(fp(1L)._2 == fp(2L)._2)
    assert(fp(2L)._1 != fp(3L)._1)
    assert(fp(2L)._2 != fp(3L)._2, "rolling hash must be order-sensitive")
  }

  test("chunking: fixed windows with overlap cover the token stream") {
    val df = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (2L, "")).toDF("doc_id", "text")
    // chunkSize=4, overlap=1 → step=3 → starts 0,3,6,9 over 10 tokens
    val rows = TextQuality.chunkTokens(df, chunkSize = 4, overlap = 1)
      .as[(Long, Long, Long, Long, String)].collect()
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L)))
    // windows overlap: chunk 0 = tokens 1..4, chunk 1 starts at token 4
    assert(d1(0)._5 != d1(1)._5)
    // empty doc still yields exactly one empty chunk (not zero rows)
    val d2 = rows.filter(_._1 == 2L)
    assert(d2.map(r => (r._2, r._4)).toSeq == Seq((0L, 0L)))
  }

  test("C4 filter keeps punctuated 5-word lines and applies page rules") {
    val good = "This line has five proper words.\n" +
      "Another sentence with enough words here!\n" +
      "Does this question also have enough words?\n" +
      "too short."                   // < 5 words → dropped
    val df = Seq(
      (1L, good),
      (2L, good + "\nsee { config"),            // brace → page dropped
      (3L, good.replace("words.", "words")),    // first line loses its period
      (4L, "Lorem Ipsum dolor sit amet etc.\n" + good)). // lorem ipsum page
      toDF("doc_id", "text")
    val got = TextQuality.c4LineFilter(df)
      .select("doc_id", "n_lines", "n_kept", "keep_doc")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 3L, true)))
    assert(got(2L) == ((2L, 5L, 3L, false)), "curly brace must drop the page")
    assert(got(3L) == ((3L, 4L, 2L, false)), "only 2 kept lines -> dropped")
    assert(!got(4L)._4, "lorem ipsum page must be dropped")
  }

  test("ngram repetition: top and duplicate bigram fractions") {
    val df = Seq(
      // bigrams: (alpha bravo) x2, (bravo alpha) x1, (bravo charlie) x1
      (1L, "alpha bravo alpha bravo charlie"),
      (2L, "alpha bravo charlie delta")). // all bigrams distinct
      toDF("doc_id", "text")
    val got = TextQuality.ngramRepetition(df, n = 2)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 0.5, 0.25)))
    assert(got(2L) == ((2L, 3L, round6(1.0 / 3), 0.0)))
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("unigram LM scoring matches hand-computed smoothed log-probs") {
    // corpus tokens: alpha x4, bravo x1 -> n_total=5, vocab=2, denom=7
    val df = Seq(
      (1L, "alpha alpha alpha"),
      (2L, "alpha bravo")).toDF("doc_id", "text")
    val got = TextQuality.unigramLogprob(df)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val pAlpha = math.log(5.0 / 7)  // (4+1)/(5+2)
    val pBravo = math.log(2.0 / 7)  // (1+1)/(5+2)
    assert(got(1L)._2 == 3L)
    assert(math.abs(got(1L)._3 - pAlpha) < 1e-6)
    assert(math.abs(got(2L)._3 - (pAlpha + pBravo) / 2) < 1e-6)
    // frequent-word docs score higher than rare-word docs
    assert(got(1L)._3 > got(2L)._3)
  }

  test("domain stats roll URLs up to lowercased hosts with doc and mention counts") {
    val df = Seq(
      (1L, "see https://Example.com/a and https://example.com/b plus http://other.org/x", "Web"),
      (2L, "more at https://example.com/c", "web"),
      (3L, "no links here", "Forum")).toDF("doc_id", "text", "source")
    val got = TextQuality.domainStats(df)
      .as[(String, Long, Long)].collect()
    // url-less doc 3 falls back to its lowercased source tag
    assert(got.toSeq == Seq(
      ("example.com", 2L, 3L), ("forum", 1L, 1L), ("other.org", 1L, 1L)))
  }

  test("Gopher rules: metrics and keep decision per document") {
    // 66 natural words incl. required function words -> passes every rule
    val natural = ("the quick brown fox jumps over that lazy dog with " +
      "plenty of words to have and hold in this long sentence again ") * 3
    val bullets = (1 to 10).map(i => s"- bullet item $i").mkString("\n")
    val symbols = "the " + Seq.fill(60)("x#").mkString(" ")
    val df = Seq(
      (1L, natural.trim),
      (2L, bullets),       // 100% bullet lines → dropped
      (3L, symbols),       // symbol ratio 1.0 → dropped
      (4L, "too few words here")). // word count < 50 → dropped
      toDF("doc_id", "text")
    val got = TextQuality.gopherRules(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(8), "natural text must pass")
    assert(got(1L).getLong(1) == 66L)
    assert(got(1L).getLong(7) >= 2L, "required stopword count")
    assert(!got(2L).getBoolean(8) && got(2L).getDouble(4) == 1.0)
    assert(!got(3L).getBoolean(8) && got(3L).getDouble(3) > 0.1)
    assert(!got(4L).getBoolean(8))
  }

  test("language ID picks the marker-heavy language with confidence") {
    val df = Seq(
      (1L, "xx", "the cat and the dog ran for the hills with that stick"),
      (2L, "xx", "le chat et la maison les oiseaux que pour")).toDF("doc_id", "lang", "text")
    val got = TextQuality.langId(df)
      .select("doc_id", "detected_lang").as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "fr")
  }

  test("CCNet buckets: per-source terciles balanced, head outscores tail") {
    val docs = Tables.documents(spark, sf0001)
    val rows = TextQuality.ccnetBuckets(docs)
      .select("doc_id", "source", "mean_logprob", "bucket")
      .as[(Long, String, Double, String)].collect()
    assert(rows.nonEmpty && rows.map(_._4).toSet == Set("head", "middle", "tail"))
    rows.groupBy(_._2).values.foreach { src =>
      val sizes = src.groupBy(_._4).view.mapValues(_.size).toMap
      // ntile terciles differ by at most one document
      assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced: $sizes")
      // every head score >= every tail score within the source
      val head = src.filter(_._4 == "head").map(_._3)
      val tail = src.filter(_._4 == "tail").map(_._3)
      assert(head.min >= tail.max, "head tercile scored below tail")
    }
  }

  private implicit class Tuple4Map(rows: Array[(Long, Long, Long, Double)]) {
    def toMap2: Map[Long, (Long, Long, Double)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
  private implicit class Tuple3Map(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
