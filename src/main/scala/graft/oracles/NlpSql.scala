package graft.oracles

import graft.functions.TextFns
import graft.operators.{Priority, Relevance, Summarizer}

/** DuckDB oracle SQL builders for the NLP operators — the same tokenizer
  * regex, stopword list, normalizations, rounding, and thresholds as the
  * Spark implementations in [[graft.operators.Relevance]],
  * [[graft.operators.Duplicates]] and [[graft.operators.Priority]], so the
  * driver's hash compare is reproducible across engines.
  */
object NlpSql {

  private val stop = TextFns.Stopwords.map(w => s"'$w'").mkString(", ")
  private def kwList(kws: Seq[String]) = kws.map(k => s"'$k'").mkString("(", ", ", ")")

  /** Shared CTE prefix: tokens → stopword-filtered → per-(doc,term) counts. */
  val baseCtes: String =
    s"""toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b')) AS token
       |  FROM documents),
       |fil AS (SELECT doc_id, token FROM toks WHERE token NOT IN ($stop)),
       |cnts AS (SELECT doc_id, token, count(*) AS cnt FROM fil GROUP BY doc_id, token)""".stripMargin

  val tfSql: String =
    s"""WITH $baseCtes
       |SELECT doc_id, token, cnt,
       |       round(cnt * 1.0 / max(cnt) OVER (PARTITION BY doc_id), 6) AS tf
       |FROM cnts""".stripMargin

  val idfSql: String =
    s"""WITH $baseCtes
       |SELECT token, count(*) AS df,
       |       round(ln((SELECT count(*) FROM documents) * 1.0 / (1 + count(*))), 6) AS idf
       |FROM cnts GROUP BY token""".stripMargin

  val tfidfTopSql: String =
    s"""WITH $baseCtes,
       |tf AS (SELECT doc_id, token, cnt * 1.0 / max(cnt) OVER (PARTITION BY doc_id) AS tf
       |       FROM cnts),
       |idf AS (SELECT token,
       |               ln((SELECT count(*) FROM documents) * 1.0 / (1 + count(*))) AS idf
       |        FROM cnts GROUP BY token)
       |SELECT tf.doc_id, tf.token, round(tf.tf * idf.idf, 6) AS tfidf
       |FROM tf JOIN idf USING (token)
       |ORDER BY tfidf DESC, doc_id, token LIMIT 200""".stripMargin

  /** Relevance CTE chain for a keyword list; yields per-doc density /
    * coverage / tfidf_score / combined, all rounded to 6.
    */
  def relevanceSql(kws: Seq[String]): String = {
    val in = kwList(kws.map(_.toLowerCase))
    val k = kws.size
    s"""$baseCtes,
       |tf AS (SELECT doc_id, token, cnt * 1.0 / max(cnt) OVER (PARTITION BY doc_id) AS tf
       |       FROM cnts),
       |idf AS (SELECT token,
       |               ln((SELECT count(*) FROM documents) * 1.0 / (1 + count(*))) AS idf
       |        FROM cnts GROUP BY token),
       |tfidf AS (SELECT tf.doc_id, tf.token, tf.tf * idf.idf AS tfidf
       |          FROM tf JOIN idf USING (token)),
       |perdoc AS (
       |  SELECT doc_id, count(*) AS n_tokens,
       |         sum(CASE WHEN token IN $in THEN 1 ELSE 0 END) AS kw_tokens,
       |         count(DISTINCT CASE WHEN token IN $in THEN token END) AS kw_matched
       |  FROM fil GROUP BY doc_id),
       |tfkw AS (SELECT doc_id, sum(tfidf) AS kw_tfidf_sum FROM tfidf
       |         WHERE token IN $in AND tfidf > 0 GROUP BY doc_id),
       |rel AS (
       |  SELECT d.doc_id,
       |         round(coalesce(kw_tokens * 1.0 / n_tokens, 0), 6) AS density,
       |         round(coalesce(kw_matched * 1.0 / $k, 0), 6) AS coverage,
       |         round(coalesce(kw_tfidf_sum / $k, 0), 6) AS tfidf_score,
       |         round(coalesce(kw_tokens * 1.0 / n_tokens, 0) * 0.3 +
       |               coalesce(kw_matched * 1.0 / $k, 0) * 0.4 +
       |               coalesce(kw_tfidf_sum / $k, 0) * 0.3, 6) AS combined
       |  FROM documents d
       |  LEFT JOIN perdoc USING (doc_id) LEFT JOIN tfkw USING (doc_id))""".stripMargin
  }

  val relevanceQuerySql: String =
    s"""WITH ${relevanceSql(Relevance.Keywords)}
       |SELECT doc_id, density, coverage, tfidf_score, combined FROM rel""".stripMargin

  val rankQuerySql: String =
    s"""WITH ${relevanceSql(Relevance.Keywords)}
       |SELECT doc_id, density, coverage, tfidf_score, combined FROM rel
       |ORDER BY combined DESC, doc_id LIMIT 100""".stripMargin

  /** BM25 oracle ([[graft.operators.Relevance.bm25Rank]]): same Okapi
    * formula with Lucene's non-negative idf, raw term counts, dl from the
    * counts CTE, avgdl = total tokens / corpus count (zero-token docs in
    * the denominator), zero-match docs at 0.
    */
  def bm25Sql(kws: Seq[String], k1: Double = 1.2, b: Double = 0.75,
              topK: Int = 100): String = {
    val in = kwList(kws.map(_.toLowerCase))
    s"""WITH $baseCtes,
       |dl AS (SELECT doc_id, sum(cnt) AS dl FROM cnts GROUP BY doc_id),
       |stats AS (
       |  SELECT (SELECT count(*) FROM documents) AS n_docs,
       |         (SELECT sum(cnt) FROM cnts) * 1.0
       |           / (SELECT count(*) FROM documents) AS avgdl),
       |dfs AS (SELECT token, count(*) AS df FROM cnts
       |        WHERE token IN $in GROUP BY token),
       |s AS (
       |  SELECT c.doc_id,
       |         sum(ln(1.0 + (st.n_docs - f.df + 0.5) / (f.df + 0.5)) *
       |             (c.cnt * ${k1 + 1.0}) /
       |             (c.cnt + $k1 * (${1.0 - b} + $b * dl.dl / st.avgdl))) AS score
       |  FROM cnts c JOIN dfs f USING (token) JOIN dl USING (doc_id)
       |  CROSS JOIN stats st
       |  GROUP BY c.doc_id)
       |SELECT d.doc_id, round(coalesce(s.score, 0.0), 6) AS bm25
       |FROM documents d LEFT JOIN s USING (doc_id)
       |ORDER BY bm25 DESC, d.doc_id LIMIT $topK""".stripMargin
  }

  /** PRF query expansion ([[graft.operators.Relevance.prfExpandedBm25]],
    * x61): base BM25 over the literal query, top-`fbDocs` positive hits as
    * feedback, `expandTerms` highest rounded summed-TF-IDF non-query
    * terms, then BM25 again over the expanded set (terms via a CTE join —
    * the same shape the engine's terms-frame variant plans).
    */
  def prfBm25Sql(kws: Seq[String], fbDocs: Int = 10, expandTerms: Int = 5,
                 k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): String = {
    val lower = kws.map(_.toLowerCase)
    val in = kwList(lower)
    val kwValues = lower.map(k => s"('$k')").mkString(", ")
    s"""WITH $baseCtes,
       |dl AS (SELECT doc_id, sum(cnt) AS dl FROM cnts GROUP BY doc_id),
       |stats AS (
       |  SELECT (SELECT count(*) FROM documents) AS n_docs,
       |         (SELECT sum(cnt) FROM cnts) * 1.0
       |           / (SELECT count(*) FROM documents) AS avgdl),
       |bdfs AS (SELECT token, count(*) AS df FROM cnts
       |         WHERE token IN $in GROUP BY token),
       |bs AS (
       |  SELECT c.doc_id,
       |         sum(ln(1.0 + (st.n_docs - f.df + 0.5) / (f.df + 0.5)) *
       |             (c.cnt * ${k1 + 1.0}) /
       |             (c.cnt + $k1 * (${1.0 - b} + $b * dl.dl / st.avgdl))) AS score
       |  FROM cnts c JOIN bdfs f USING (token) JOIN dl USING (doc_id)
       |  CROSS JOIN stats st
       |  GROUP BY c.doc_id),
       |fb AS (SELECT d.doc_id, round(coalesce(bs.score, 0.0), 6) AS bm25
       |       FROM documents d LEFT JOIN bs USING (doc_id)
       |       ORDER BY bm25 DESC, d.doc_id LIMIT $fbDocs),
       |fbpos AS (SELECT doc_id FROM fb WHERE bm25 > 0),
       |idf AS (SELECT token,
       |               ln((SELECT count(*) FROM documents) * 1.0 / (1 + count(*))) AS idf
       |        FROM cnts GROUP BY token),
       |expt AS (SELECT c.token, round(sum(c.cnt * idf.idf), 6) AS w
       |         FROM cnts c JOIN fbpos USING (doc_id) JOIN idf USING (token)
       |         WHERE c.token NOT IN $in
       |         GROUP BY c.token ORDER BY w DESC, c.token LIMIT $expandTerms),
       |allt AS (SELECT token FROM expt UNION SELECT * FROM (VALUES $kwValues) v(token)),
       |edfs AS (SELECT token, count(*) AS df FROM cnts
       |         WHERE token IN (SELECT token FROM allt) GROUP BY token),
       |es AS (
       |  SELECT c.doc_id,
       |         sum(ln(1.0 + (st.n_docs - f.df + 0.5) / (f.df + 0.5)) *
       |             (c.cnt * ${k1 + 1.0}) /
       |             (c.cnt + $k1 * (${1.0 - b} + $b * dl.dl / st.avgdl))) AS score
       |  FROM cnts c JOIN edfs f USING (token) JOIN dl USING (doc_id)
       |  CROSS JOIN stats st
       |  GROUP BY c.doc_id)
       |SELECT d.doc_id, round(coalesce(es.score, 0.0), 6) AS bm25
       |FROM documents d LEFT JOIN es USING (doc_id)
       |ORDER BY bm25 DESC, d.doc_id LIMIT $topK""".stripMargin
  }

  /** Sum-normalized TF + inverted-index cosine pairs ≥ θ on rounded sim. */
  def dupPairsSql(threshold: Double = 0.8): String =
    s"""WITH $baseCtes,
       |tf AS (SELECT doc_id, token, cnt * 1.0 / sum(cnt) OVER (PARTITION BY doc_id) AS tf
       |       FROM cnts),
       |norms AS (SELECT doc_id, sqrt(sum(tf * tf)) AS nrm FROM tf GROUP BY doc_id),
       |dots AS (SELECT a.doc_id AS id1, b.doc_id AS id2, sum(a.tf * b.tf) AS dot
       |         FROM tf a JOIN tf b ON a.token = b.token AND a.doc_id < b.doc_id
       |         GROUP BY 1, 2)
       |SELECT id1, id2, round(dot / (na.nrm * nb.nrm), 6) AS sim
       |FROM dots
       |JOIN norms na ON id1 = na.doc_id
       |JOIN norms nb ON id2 = nb.doc_id
       |WHERE round(dot / (na.nrm * nb.nrm), 6) >= $threshold""".stripMargin

  /** n6b ([[graft.operators.Duplicates.pairSummary]]): the n6 pair list
    * folded to its dyadic 1/32 similarity histogram. The oracle enumerates
    * member pairs (the sf0.01 corpus is dup-light so Spark's dispatch runs
    * the same member plan); the digest-first weighted form is spec-pinned
    * against this enumeration on a twin-heavy fixture.
    */
  def dupPairSummarySql(threshold: Double = 0.8): String =
    s"""WITH pairs AS (${dupPairsSql(threshold)})
       |SELECT floor(sim * 32) / 32 AS sim_bucket,
       |       count(*) AS n_pairs,
       |       round(avg(sim), 6) AS mean_sim,
       |       min(sim) AS min_sim,
       |       max(sim) AS max_sim
       |FROM pairs GROUP BY 1""".stripMargin

  /** Shared closure CTEs: duplicate pairs ≥ θ → undirected edges →
    * transitive reachability (recursive CTE) → per-doc min-label component.
    * Mirrors [[graft.operators.Duplicates.components]] exactly: the edge
    * set is the (already hash-matching) `n6_dup_pairs` result, and the
    * component label is the smallest doc_id reachable (incl. self).
    * CTE names are prefixed `cc` so this composes with [[relevanceSql]].
    */
  def componentCtes(threshold: Double = 0.8): String =
    s"""cctf AS (SELECT doc_id, token, cnt * 1.0 / sum(cnt) OVER (PARTITION BY doc_id) AS tf
       |         FROM cnts),
       |ccnorms AS (SELECT doc_id, sqrt(sum(tf * tf)) AS nrm FROM cctf GROUP BY doc_id),
       |ccdots AS (SELECT a.doc_id AS id1, b.doc_id AS id2, sum(a.tf * b.tf) AS dot
       |           FROM cctf a JOIN cctf b ON a.token = b.token AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |ccpairs AS (
       |  SELECT id1, id2 FROM ccdots
       |  JOIN ccnorms na ON id1 = na.doc_id JOIN ccnorms nb ON id2 = nb.doc_id
       |  WHERE round(dot / (na.nrm * nb.nrm), 6) >= $threshold),
       |ccedges AS (SELECT id1 AS a, id2 AS b FROM ccpairs
       |            UNION ALL SELECT id2, id1 FROM ccpairs),
       |ccreach(a, b) AS (
       |  SELECT a, b FROM ccedges
       |  UNION
       |  SELECT r.a, e.b FROM ccreach r JOIN ccedges e ON r.b = e.a),
       |cccomp AS (
       |  SELECT d.doc_id,
       |         CAST(least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS BIGINT) AS component
       |  FROM documents d LEFT JOIN ccreach r ON r.a = d.doc_id
       |  GROUP BY d.doc_id)""".stripMargin

  /** N21 single-linkage components (doc_id → min-reachable label). */
  def componentsSql(threshold: Double = 0.8): String =
    s"""WITH RECURSIVE $baseCtes,
       |${componentCtes(threshold)}
       |SELECT doc_id, component FROM cccomp""".stripMargin

  /** N22 unique documents: exactly the ids that label their own component. */
  def uniqueDocsSql(threshold: Double = 0.8): String =
    s"""WITH RECURSIVE $baseCtes,
       |${componentCtes(threshold)}
       |SELECT doc_id FROM cccomp WHERE component = doc_id""".stripMargin

  /** N32 pipeline statistics: relevance aggregates over the unique
    * (post-dedup) corpus — [[relevanceSql]] composed with the component
    * closure, mirroring [[graft.operators.Pipeline.statistics]].
    */
  def pipelineStatsSql(kws: Seq[String], threshold: Double = 0.8): String =
    s"""WITH RECURSIVE ${relevanceSql(kws)},
       |${componentCtes(threshold)}
       |SELECT count(*) AS n_documents,
       |       round(avg(combined), 6) AS avg_relevance,
       |       round(min(combined), 6) AS min_relevance,
       |       round(max(combined), 6) AS max_relevance
       |FROM rel JOIN (SELECT doc_id FROM cccomp WHERE component = doc_id) u
       |  USING (doc_id)""".stripMargin

  def nearDupsSql(targetId: Long = 0L, threshold: Double = 0.8): String =
    s"""WITH $baseCtes,
       |tf AS (SELECT doc_id, token, cnt * 1.0 / sum(cnt) OVER (PARTITION BY doc_id) AS tf
       |       FROM cnts),
       |norms AS (SELECT doc_id, sqrt(sum(tf * tf)) AS nrm FROM tf GROUP BY doc_id),
       |dots AS (SELECT a.doc_id, sum(a.tf * t.tf) AS dot
       |         FROM tf a JOIN tf t ON a.token = t.token
       |         WHERE t.doc_id = $targetId AND a.doc_id <> $targetId
       |         GROUP BY 1)
       |SELECT d.doc_id, round(d.dot / (n.nrm * nt.nrm), 6) AS sim
       |FROM dots d
       |JOIN norms n ON d.doc_id = n.doc_id
       |CROSS JOIN (SELECT nrm AS nrm FROM norms WHERE doc_id = $targetId) nt(nrm)
       |WHERE round(d.dot / (n.nrm * nt.nrm), 6) >= $threshold""".stripMargin

  /** Priority classification on top of the relevance CTEs. */
  /** Priority-scoring CTEs (`scored`, `final`) over an existing `rel` CTE —
    * shared by [[prioritySql]] and [[pipelineGradedSql]].
    */
  private val priorityCtes: String = {
    val crit = Priority.CriticalKeywords
      .map(k => s"lower(text) LIKE '%${k.toLowerCase}%'").mkString(" OR ")
    val high = Priority.HighKeywords
      .map(k => s"lower(text) LIKE '%${k.toLowerCase}%'").mkString(" OR ")
    s"""scored AS (
       |  SELECT d.doc_id,
       |         rel.combined AS relevance_score,
       |         CASE WHEN wc < 50 THEN 0.1 WHEN wc < 200 THEN 0.5
       |              WHEN wc < 500 THEN 0.8 ELSE 1.0 END AS length_score,
       |         CASE WHEN $crit THEN 1.0 WHEN $high THEN 0.7 ELSE 0.0 END AS keyword_score
       |  FROM (SELECT doc_id, text,
       |               len(list_filter(regexp_split_to_array(text, '\\s+'),
       |                   x -> x <> '')) AS wc
       |        FROM documents) d
       |  JOIN rel ON d.doc_id = rel.doc_id),
       |final AS (
       |  SELECT doc_id, relevance_score, length_score, keyword_score,
       |         round(relevance_score * 0.4 + length_score * 0.2 +
       |               keyword_score * 0.3 + 0.5 * 0.1, 6) AS priority_score
       |  FROM scored)""".stripMargin
  }

  private val priorityLevelCase: String =
    """CASE WHEN priority_score >= 0.85 THEN 'CRITICAL'
      |     WHEN priority_score >= 0.65 THEN 'HIGH'
      |     WHEN priority_score >= 0.45 THEN 'MEDIUM'
      |     WHEN priority_score >= 0.25 THEN 'LOW'
      |     ELSE 'NONE' END""".stripMargin

  val prioritySql: String =
    s"""WITH ${relevanceSql(Relevance.Keywords)},
       |$priorityCtes
       |SELECT doc_id, relevance_score, length_score, keyword_score, priority_score,
       |       $priorityLevelCase AS priority_level,
       |       concat_ws('|',
       |         CASE WHEN keyword_score >= 1.0 THEN 'critical keyword match' END,
       |         CASE WHEN keyword_score = 0.7 THEN 'high-priority keyword match' END,
       |         CASE WHEN relevance_score >= 0.7 THEN 'high relevance' END,
       |         CASE WHEN length_score >= 0.8 THEN 'comprehensive content' END) AS reasons
       |FROM final""".stripMargin

  /** N32 pipeline (graded form): everything `p1` computes except the
    * TextRank summary column — relevance over the full corpus, the
    * duplicate-closure unique filter, priority scores — so the flagship
    * composition itself is hash-checked, with only the fixpoint column
    * left to the rows-only entry. Mirrors
    * [[graft.operators.Pipeline.process]] minus `summary`.
    */
  def pipelineGradedSql(threshold: Double = 0.8): String =
    s"""WITH RECURSIVE ${relevanceSql(Relevance.Keywords)},
       |${componentCtes(threshold)},
       |$priorityCtes
       |SELECT r.doc_id, substring(d.text, 1, 500) AS text,
       |       r.combined AS relevance_score,
       |       f.priority_score,
       |       $priorityLevelCase AS priority_level
       |FROM rel r
       |JOIN (SELECT doc_id FROM cccomp WHERE component = doc_id) u ON r.doc_id = u.doc_id
       |JOIN final f ON r.doc_id = f.doc_id
       |JOIN documents d ON r.doc_id = d.doc_id""".stripMargin

  /** TextRank CTE chain (N11–N16): sentence split → per-sentence token
    * sets → pairwise token-set cosine → row-normalized edge list → the
    * damped PageRank iteration as a DuckDB recursive CTE, with the
    * numpy-`allclose` stopping rule applied per document via a windowed
    * `bool_and` and per-iteration rounding to 10 decimals matching
    * [[graft.operators.Summarizer.textrank]]'s reproducible fixpoint (the
    * x14 Lloyd technique — wobble ~1e-16 ≪ the 5e-11 rounding boundary, so
    * both engines iterate on identical score vectors and stop at identical
    * iterations).
    *
    * Mechanics: zero-weight self-edges keep every sentence flowing through
    * the per-iteration aggregate (isolated sentences included) and carry
    * `prev[j]` for the convergence test as `sum(CASE WHEN i = j ...)`;
    * converged documents stop recursing, so each document's final score
    * vector is its max-iteration rows (`smfinal`).
    */
  /** Sentence split (N11): `[.!?]+` split, trim, keep ≥3-word sentences,
    * indexed in document order — mirrors
    * [[graft.operators.Summarizer.splitSentences]].
    */
  def sentenceCtesFrom(src: String): String =
    s"""smraw AS (
       |  SELECT doc_id,
       |         unnest(regexp_split_to_array(text, '[.!?]+')) AS piece,
       |         unnest(generate_series(1, len(regexp_split_to_array(text, '[.!?]+')))) AS pos
       |  FROM $src),
       |smsents AS (
       |  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS sidx, s
       |  FROM (SELECT doc_id, pos,
       |               regexp_replace(regexp_replace(piece, '^[\\x00-\\x20]+', ''),
       |                              '[\\x00-\\x20]+$$', '') AS s
       |        FROM smraw)
       |  WHERE s <> '' AND len(list_filter(regexp_split_to_array(s, '\\s+'), x -> x <> '')) >= 3),
       |smcount AS (SELECT doc_id, count(*) AS n FROM smsents GROUP BY doc_id)""".stripMargin

  val sentenceCtes: String = sentenceCtesFrom("documents")

  /** Pairwise sentence token-set cosine (N12/N13) via the per-document
    * token inverted index — only co-tokened pairs meet, so zero-similarity
    * pairs never materialize.
    */
  val sentenceSimCtes: String =
    s"""smtokf AS (
       |  SELECT DISTINCT doc_id, sidx, tok FROM (
       |    SELECT doc_id, sidx, unnest(regexp_extract_all(lower(s), '\\b[a-z]{3,}\\b')) AS tok
       |    FROM smsents)
       |  WHERE tok NOT IN ($stop)),
       |smsz AS (SELECT doc_id, sidx, count(*) AS sz FROM smtokf GROUP BY 1, 2),
       |sminter AS (
       |  SELECT a.doc_id, a.sidx AS i, b.sidx AS j, count(*) AS ncommon
       |  FROM smtokf a JOIN smtokf b ON a.doc_id = b.doc_id AND a.tok = b.tok AND a.sidx < b.sidx
       |  GROUP BY 1, 2, 3),
       |smsim AS (
       |  SELECT mi.doc_id, mi.i, mi.j, mi.ncommon / sqrt(ta.sz * tb.sz) AS sim
       |  FROM sminter mi
       |  JOIN smsz ta ON mi.doc_id = ta.doc_id AND mi.i = ta.sidx
       |  JOIN smsz tb ON mi.doc_id = tb.doc_id AND mi.j = tb.sidx)""".stripMargin

  val textrankCtes: String =
    s"""$sentenceCtes,
       |$sentenceSimCtes,
       |smsym AS (
       |  SELECT doc_id, i, j, sim FROM smsim
       |  UNION ALL SELECT doc_id, j, i, sim FROM smsim),
       |smrow AS (SELECT doc_id, i, sum(sim) AS rs FROM smsym GROUP BY 1, 2),
       |smedges AS (
       |  SELECT m.doc_id, m.i, m.j, m.sim / r.rs AS w
       |  FROM smsym m JOIN smrow r ON m.doc_id = r.doc_id AND m.i = r.i
       |  UNION ALL
       |  SELECT doc_id, sidx, sidx, 0.0 FROM smsents),
       |sminit AS (
       |  SELECT s.doc_id, s.sidx AS j, 1.0 / c.n AS score, 0 AS it, c.n AS n, false AS frozen
       |  FROM smsents s JOIN smcount c USING (doc_id) WHERE c.n >= 2),
       |smtr AS (
       |  SELECT * FROM sminit
       |  UNION ALL
       |  SELECT doc_id, j, score, it, n, frozen FROM (
       |    SELECT doc_id, j, score, prevsc, it, n,
       |           bool_and(abs(score - prevsc) <= 1e-6 + 1e-5 * abs(prevsc))
       |             OVER (PARTITION BY doc_id) AS frozen
       |    FROM (
       |      SELECT e.doc_id, e.j,
       |             round((1 - 0.85) / any_value(p.n) + 0.85 * sum(e.w * p.score), 10) AS score,
       |             sum(CASE WHEN e.i = e.j THEN p.score ELSE 0.0 END) AS prevsc,
       |             any_value(p.it) + 1 AS it, any_value(p.n) AS n
       |      FROM smtr p JOIN smedges e ON p.doc_id = e.doc_id AND p.j = e.i
       |      WHERE NOT p.frozen AND p.it < ${Summarizer.MaxIter}
       |      GROUP BY e.doc_id, e.j) g) u),
       |smfinal AS (
       |  SELECT doc_id, j, score
       |  FROM (SELECT doc_id, j, score,
       |               row_number() OVER (PARTITION BY doc_id, j ORDER BY it DESC) AS rn
       |        FROM smtr) WHERE rn = 1)""".stripMargin

  /** N11 sentence split — mirrors [[graft.operators.Summarizer.sentencesDf]]. */
  val sentencesSql: String =
    s"""WITH $sentenceCtes
       |SELECT doc_id, CAST(sidx AS BIGINT) AS sidx, s AS sentence FROM smsents""".stripMargin

  /** N12/N13 pairwise sentence similarity — mirrors
    * [[graft.operators.Summarizer.sentenceSimilaritiesDf]].
    */
  /** s4 runs over a "sentencified" corpus: the synthetic documents carry no
    * sentence punctuation (each doc is one long sentence, so the pairwise
    * query would be vacuously empty); a deterministic boundary every 12
    * words — the same regex both engines replicate, DuckDB needing the 'g'
    * flag to match Java's replace-all — gives the pair path real input.
    */
  val sentenceSimsSql: String =
    s"""WITH sdocs AS (
       |  SELECT doc_id,
       |         regexp_replace(text, '(\\S+\\s+){12}', '\\0. ', 'g') AS text
       |  FROM documents),
       |${sentenceCtesFrom("sdocs")},
       |$sentenceSimCtes
       |SELECT doc_id, CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       |       round(sim, 6) AS sim
       |FROM smsim""".stripMargin

  /** d20 context-window search — mirrors
    * [[graft.operators.DocOps.contextWindowSearch]]: the s4 sentencify +
    * split CTEs, top-`topN` keyword hits in (doc_id, sidx) order, then the
    * ±`k` context expansion as a window replay of the reference's per-hit
    * N+1 loop (`sql_search.py:906-1027`). LIMIT binds before expansion.
    */
  def contextWindowSql(kw: String = "window", k: Int = 2,
                       topN: Int = 50): String =
    s"""WITH sdocs AS (
       |  SELECT doc_id,
       |         regexp_replace(text, '(\\S+\\s+){12}', '\\0. ', 'g') AS text
       |  FROM documents),
       |${sentenceCtesFrom("sdocs")},
       |hits AS (
       |  SELECT doc_id, sidx FROM smsents
       |  WHERE contains(lower(s), '$kw')
       |  ORDER BY doc_id, sidx LIMIT $topN)
       |SELECT h.doc_id, d.source, CAST(h.sidx AS BIGINT) AS hit_sidx,
       |       CAST(s.sidx AS BIGINT) AS sidx, s.s AS sentence,
       |       s.sidx = h.sidx AS is_match
       |FROM hits h
       |JOIN smsents s ON s.doc_id = h.doc_id
       |  AND s.sidx BETWEEN h.sidx - $k AND h.sidx + $k
       |JOIN documents d ON d.doc_id = h.doc_id""".stripMargin

  /** Summary CTEs on top of [[textrankCtes]]: top-3 by (score desc, index
    * desc — numpy's reversed argsort tie-break), re-sorted into document
    * order; documents with ≤3 sentences short-circuit to all sentences.
    */
  val summaryCtes: String =
    s"""$textrankCtes,
       |smtop3 AS (
       |  SELECT f.doc_id, f.j
       |  FROM (SELECT doc_id, j, score,
       |               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, j DESC) AS rk
       |        FROM smfinal) f
       |  JOIN smcount c USING (doc_id)
       |  WHERE c.n > 3 AND f.rk <= 3),
       |smchosen AS (
       |  SELECT s.doc_id, s.sidx, s.s FROM smsents s JOIN smcount c USING (doc_id) WHERE c.n <= 3
       |  UNION ALL
       |  SELECT s.doc_id, s.sidx, s.s FROM smsents s JOIN smtop3 t ON s.doc_id = t.doc_id AND s.sidx = t.j),
       |smsummary AS (
       |  SELECT doc_id, string_agg(s, ' ' ORDER BY sidx) AS summary FROM smchosen GROUP BY doc_id)""".stripMargin

  /** N15 extractive summaries — mirrors [[graft.operators.Summarizer.qSummaries]]. */
  val summariesSql: String =
    s"""WITH RECURSIVE $summaryCtes
       |SELECT d.doc_id,
       |       CAST(coalesce(c.n, 0) AS BIGINT) AS n_sentences,
       |       coalesce(su.summary, '') AS summary
       |FROM documents d
       |LEFT JOIN smcount c USING (doc_id)
       |LEFT JOIN smsummary su ON d.doc_id = su.doc_id""".stripMargin

  /** N16 key sentences — max-normalized score ≥ 0.5, descending (ties by
    * index), `|`-joined; single-sentence documents short-circuit. Mirrors
    * [[graft.operators.Summarizer.qKeySentences]].
    */
  val keySentencesSql: String =
    s"""WITH RECURSIVE $textrankCtes,
       |smmx AS (SELECT doc_id, max(score) AS mx FROM smfinal GROUP BY doc_id),
       |smkept AS (
       |  SELECT f.doc_id, f.j, f.score / m.mx AS rel
       |  FROM smfinal f JOIN smmx m USING (doc_id)
       |  WHERE m.mx > 0 AND f.score / m.mx >= 0.5),
       |smkey AS (
       |  SELECT k.doc_id, string_agg(s.s, '|' ORDER BY k.rel DESC, k.j) AS ks
       |  FROM smkept k JOIN smsents s ON k.doc_id = s.doc_id AND k.j = s.sidx
       |  GROUP BY k.doc_id),
       |smsingle AS (
       |  SELECT s.doc_id, s.s AS ks FROM smsents s JOIN smcount c USING (doc_id) WHERE c.n = 1)
       |SELECT d.doc_id, coalesce(k.ks, sg.ks, '') AS key_sentences
       |FROM documents d
       |LEFT JOIN smkey k ON d.doc_id = k.doc_id
       |LEFT JOIN smsingle sg ON d.doc_id = sg.doc_id""".stripMargin

  /** N32 pipeline, full form: [[pipelineGradedSql]] plus the TextRank
    * summary column via [[summaryCtes]] — mirrors
    * [[graft.operators.Pipeline.process]] column-for-column.
    */
  def pipelineSql(threshold: Double = 0.8): String =
    s"""WITH RECURSIVE ${relevanceSql(Relevance.Keywords)},
       |${componentCtes(threshold)},
       |$priorityCtes,
       |$summaryCtes
       |SELECT r.doc_id, substring(d.text, 1, 500) AS text,
       |       r.combined AS relevance_score,
       |       coalesce(su.summary, '') AS summary,
       |       f.priority_score,
       |       $priorityLevelCase AS priority_level
       |FROM rel r
       |JOIN (SELECT doc_id FROM cccomp WHERE component = doc_id) u ON r.doc_id = u.doc_id
       |JOIN final f ON r.doc_id = f.doc_id
       |JOIN documents d ON r.doc_id = d.doc_id
       |LEFT JOIN smsummary su ON r.doc_id = su.doc_id""".stripMargin

  /** N30/N31 semantic search: TF-IDF vectors over the top-`vocabSize` corpus
    * terms, query embedded in the same space, cosine ≥ threshold, top-k.
    * Mirrors [[graft.operators.SemanticSearch.search]].
    */
  def semanticSearchSql(queryTf: Seq[(String, Double)], vocabSize: Int,
                        threshold: Double, limit: Int): String = {
    val qvals = queryTf.map { case (t, w) => s"('$t', $w)" }.mkString(", ")
    s"""WITH $baseCtes,
       |idfall AS (SELECT token, count(*) AS df,
       |                  ln((SELECT count(*) FROM documents) * 1.0 / (1 + count(*))) AS idf
       |           FROM cnts GROUP BY token),
       |vocab AS (SELECT token, idf FROM (
       |            SELECT token, idf, row_number() OVER (ORDER BY df DESC, token) AS rk
       |            FROM idfall) WHERE rk <= $vocabSize),
       |tf AS (SELECT doc_id, token, cnt * 1.0 / max(cnt) OVER (PARTITION BY doc_id) AS tf
       |       FROM cnts),
       |docvec AS (SELECT doc_id, token, tf * idf AS w FROM tf JOIN vocab USING (token)),
       |docnorm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM docvec GROUP BY doc_id),
       |qraw(token, qtf) AS (VALUES $qvals),
       |qvec AS (SELECT token, qtf * idf AS qw FROM qraw JOIN vocab USING (token)),
       |qnorm AS (SELECT sqrt(sum(qw * qw)) AS qnrm FROM qvec),
       |dots AS (SELECT doc_id, sum(w * qw) AS dot
       |         FROM docvec JOIN qvec USING (token) GROUP BY doc_id),
       |sims AS (SELECT doc_id, round(dot / (nrm * qnrm), 6) AS similarity
       |         FROM dots JOIN docnorm USING (doc_id) CROSS JOIN qnorm
       |         WHERE nrm > 0 AND qnrm > 0)
       |SELECT d.doc_id, d.lang, d.source, d.n_chars, s.similarity
       |FROM documents d JOIN sims s USING (doc_id)
       |WHERE s.similarity >= $threshold
       |ORDER BY s.similarity DESC, d.doc_id LIMIT $limit""".stripMargin
  }

  val priorityDistributionSql: String =
    s"""WITH ${relevanceSql(Relevance.Keywords)},
       |scored AS (
       |  SELECT round(rel.combined * 0.4 +
       |               (CASE WHEN wc < 50 THEN 0.1 WHEN wc < 200 THEN 0.5
       |                     WHEN wc < 500 THEN 0.8 ELSE 1.0 END) * 0.2 +
       |               (CASE WHEN ${Priority.CriticalKeywords.map(k => s"lower(text) LIKE '%${k.toLowerCase}%'").mkString(" OR ")} THEN 1.0
       |                     WHEN ${Priority.HighKeywords.map(k => s"lower(text) LIKE '%${k.toLowerCase}%'").mkString(" OR ")} THEN 0.7
       |                     ELSE 0.0 END) * 0.3 + 0.05, 6) AS priority_score
       |  FROM (SELECT doc_id, text,
       |               len(list_filter(regexp_split_to_array(text, '\\s+'),
       |                   x -> x <> '')) AS wc
       |        FROM documents) d
       |  JOIN rel ON d.doc_id = rel.doc_id)
       |SELECT CASE WHEN priority_score >= 0.85 THEN 'CRITICAL'
       |            WHEN priority_score >= 0.65 THEN 'HIGH'
       |            WHEN priority_score >= 0.45 THEN 'MEDIUM'
       |            WHEN priority_score >= 0.25 THEN 'LOW'
       |            ELSE 'NONE' END AS priority_level,
       |       count(*) AS n
       |FROM scored GROUP BY 1""".stripMargin

  /** Hybrid RRF retrieval ([[graft.operators.HybridSearch.hybridSearch]]):
    * the BM25 and semantic-search oracles verbatim as the two arm pools
    * (each keeps its own nested CTE scope), positive-score cut on the
    * lexical arm, per-arm ranks on the 6-dp-rounded scores with doc_id
    * tie-breaks, fused with 1/(k + rank) sums.
    */
  def hybridSearchSql(queryTf: Seq[(String, Double)], kws: Seq[String],
                      vocabSize: Int, threshold: Double,
                      poolK: Int = 100, topK: Int = 20, rrfK: Int = 60): String =
    s"""WITH lexpool AS (${bm25Sql(kws, topK = poolK)}),
       |sempool AS (${semanticSearchSql(queryTf, vocabSize, threshold, poolK)}),
       |lex AS (
       |  SELECT doc_id,
       |         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
       |           AS lex_rank
       |  FROM lexpool WHERE bm25 > 0),
       |sem AS (
       |  SELECT doc_id,
       |         CAST(row_number() OVER (ORDER BY similarity DESC, doc_id) AS BIGINT)
       |           AS sem_rank
       |  FROM sempool)
       |SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
       |       round(coalesce(1.0 / CAST($rrfK + l.lex_rank AS DOUBLE), 0.0) +
       |             coalesce(1.0 / CAST($rrfK + s.sem_rank AS DOUBLE), 0.0), 6)
       |         AS rrf_score
       |FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
       |ORDER BY rrf_score DESC, doc_id LIMIT $topK""".stripMargin
}
