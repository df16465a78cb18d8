package graft.oracles

import graft.functions.TextFns
import graft.operators.{Dedup, TextQuality, VectorSearch}

/** DuckDB oracle SQL for the training-data pipeline operators
  * ([[graft.operators.Dedup]], [[graft.operators.VectorSearch]],
  * [[graft.operators.TextQuality]], [[graft.operators.Multimodal]],
  * [[graft.streaming.EventStream]]).
  */
object TrainSql {

  private val stop = TextFns.Stopwords.map(w => s"'$w'").mkString(", ")

  val exactDigestSql: String =
    """SELECT doc_id, digest,
      |       count(*) OVER (PARTITION BY digest) AS group_size,
      |       min(doc_id) OVER (PARTITION BY digest) AS keep_doc,
      |       doc_id <> min(doc_id) OVER (PARTITION BY digest) AS is_duplicate
      |FROM (SELECT doc_id, md5(text) AS digest FROM documents)""".stripMargin

  val jaccardPairsSql: String =
    s"""WITH toksl AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(t) < 3 THEN [coalesce(array_to_string(t, ' '), '')]
       |         ELSE list_transform(range(len(t) - 2),
       |                i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END) AS shingle
       |  FROM toksl),
       |ds AS (SELECT DISTINCT doc_id,
       |              ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h60 FROM sh),
       |sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
       |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
       |          FROM ds a JOIN ds b ON a.h60 = b.h60 AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT id1, id2, round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard
       |FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
       |WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= 0.5""".stripMargin

  /** The [[Dedup.md5Long60]] engine-portable hash in DuckDB dialect. */
  private def md5Long60Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** Shared shingle CTEs (same tokenizer + 3-shingle rule as
    * [[Dedup.shinglesFromTokens]]), over `from` (default the documents
    * table; the capped-guard oracles pass the planted-fixture CTE).
    */
  private def shingleCtesFrom(from: String): String =
    s"""toksl AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM $from),
       |sh AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(t) < 3 THEN [coalesce(array_to_string(t, ' '), '')]
       |         ELSE list_transform(range(len(t) - 2),
       |                i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END) AS shingle
       |  FROM toksl),
       |ds AS (SELECT DISTINCT doc_id,
       |              ${md5Long60Sql("shingle")} AS h60 FROM sh)""".stripMargin

  private val shingleCtes: String = shingleCtesFrom("documents")

  /** The planted-hot-family fixture of the capped-guard oracles, mirroring
    * [[Dedup.plantedHotCorpus]]: documents plus `copies` identical clones
    * of doc 0 at ids ≥ `baseId`.
    */
  private def plantedCorpusCte(copies: Int = 200, baseId: Long = 100000L): String =
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT CAST($baseId + r.i AS BIGINT) AS doc_id, d0.text
       |  FROM (SELECT unnest(range(0, $copies)) AS i) r,
       |       (SELECT text FROM documents WHERE doc_id = 0) d0)""".stripMargin

  /** Asymmetric containment oracle ([[Dedup.containmentPairs]]): naive
    * co-shingle join, |∩| over each side's set size, pair kept when the
    * min-side (max-direction) 6-dp-rounded containment reaches threshold.
    */
  def containmentPairsSql(threshold: Double = 0.6): String =
    s"""WITH $shingleCtes,
       |sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
       |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
       |          FROM ds a JOIN ds b ON a.h60 = b.h60 AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT id1, id2, x.n AS s1, y.n AS s2,
       |       round(c * 1.0 / x.n, 6) AS c1,
       |       round(c * 1.0 / y.n, 6) AS c2,
       |       round(c * 1.0 / least(x.n, y.n), 6) AS containment
       |FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
       |WHERE round(c * 1.0 / least(x.n, y.n), 6) >= $threshold""".stripMargin

  /** Exclusion tail shared by the capped-guard oracles: drop every pair
    * touching the planted family or its source doc 0, and every pair BOTH
    * of whose endpoints are doc-0 neighbors (pairs of the source's own
    * near-duplicates share only family-hot keys, so the capped candidate
    * stage cannot see them — verified on both committed SFs). `pairs` must
    * be a CTE holding the naive answer over the planted corpus.
    */
  private def cappedExclusionTail(cols: String, baseId: Long): String =
    s"""nbr AS (SELECT id2 AS d FROM pairs WHERE id1 = 0 AND id2 < $baseId)
       |SELECT $cols FROM pairs
       |WHERE id1 <> 0 AND id2 <> 0 AND id1 < $baseId AND id2 < $baseId
       |  AND NOT (id1 IN (SELECT d FROM nbr) AND id2 IN (SELECT d FROM nbr))""".stripMargin

  /** Capped-jaccard oracle (x2b — [[Dedup.jaccardPairs]] with
    * `maxShingleDf` binding): on the planted fixture the corpus-hot prefix
    * keys are exactly the family's shingles, and the candidate prefixes of
    * the family members — and of doc 0's own near-duplicates — consist
    * only of those, so capped mode is the exact answer minus pairs inside
    * that hot neighborhood ([[cappedExclusionTail]]); surviving pairs keep
    * exact-identical scores (the verify phase recomputes |∩| over FULL
    * sets). The oracle computes the naive all-pairs answer over the same
    * fixture and applies the exclusion.
    */
  def jaccardCappedSql(threshold: Double = 0.5, baseId: Long = 100000L): String =
    s"""WITH pairs AS (
       |WITH ${plantedCorpusCte()},
       |${shingleCtesFrom("corpus")},
       |sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
       |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
       |          FROM ds a JOIN ds b ON a.h60 = b.h60 AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT id1, id2, round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard
       |FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
       |WHERE round(c * 1.0 / (x.n + y.n - c), 6) >= $threshold),
       |${cappedExclusionTail("id1, id2, jaccard", baseId)}""".stripMargin

  /** Capped-containment oracle (x36b): same exclusion argument as
    * [[jaccardCappedSql]] — the family's shingles are the only keys over
    * the cap in both the prefix and the full index on this fixture.
    */
  def containmentCappedSql(threshold: Double = 0.6, baseId: Long = 100000L): String =
    s"""WITH pairs AS (
       |WITH ${plantedCorpusCte()},
       |${shingleCtesFrom("corpus")},
       |sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
       |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
       |          FROM ds a JOIN ds b ON a.h60 = b.h60 AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT id1, id2, x.n AS s1, y.n AS s2,
       |       round(c * 1.0 / x.n, 6) AS c1,
       |       round(c * 1.0 / y.n, 6) AS c2,
       |       round(c * 1.0 / least(x.n, y.n), 6) AS containment
       |FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
       |WHERE round(c * 1.0 / least(x.n, y.n), 6) >= $threshold),
       |${cappedExclusionTail("id1, id2, s1, s2, c1, c2, containment", baseId)}""".stripMargin

  /** MinHash-LSH candidate pairs, mirroring [[Dedup.minhashLshPairs]]:
    * md5-60 shingle hash mod the Mersenne prime, the same 32 (a,b)
    * permutation literals, 8 bands of 4 hashed through md5-60 of the
    * joined band string, est_jaccard = agreeing positions / 32 (dyadic —
    * no float flake).
    */
  def minhashLshSql(minEstJaccard: Double = 0.5): String =
    minhashLshSqlFrom(minEstJaccard, shingleCtes, "")

  /** Capped-LSH oracle (x3b — [[Dedup.minhashLshPairs]] with
    * `maxBucketSize` binding): the 201 identical family rows put every one
    * of the family's band buckets over the cap, so the family contributes
    * zero candidates; all other band buckets stay far under it. Capped
    * mode = the uncapped answer minus pairs touching the family.
    */
  def minhashLshCappedSql(minEstJaccard: Double = 0.5,
                          baseId: Long = 100000L): String =
    s"""WITH pairs AS (
       |${minhashLshSqlFrom(minEstJaccard,
           s"${plantedCorpusCte()},\n${shingleCtesFrom("corpus")}", "")}),
       |${cappedExclusionTail("id1, id2, est_jaccard", baseId)}""".stripMargin

  /** The `hashed → perms → sigl → sigs → bands` MinHash/LSH CTE chain
    * (expects a `ds(doc_id, h60)` CTE in scope) — shared by the x3 pair
    * oracles and the x66 incremental oracle.
    */
  private def sigBandCtes: String = {
    val permVals = Dedup.HashParams.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    val p = Dedup.Prime
    val rb = Dedup.RowsPerBand
    s"""hashed AS (SELECT doc_id, h60 % $p AS h FROM ds),
       |perms(pidx, a, b) AS (VALUES $permVals),
       |sigl AS (SELECT doc_id, pidx, min((a * h + b) % $p) AS s
       |         FROM hashed CROSS JOIN perms GROUP BY doc_id, pidx),
       |sigs AS (SELECT doc_id, list(s ORDER BY pidx) AS sig FROM sigl GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, b.bidx,
       |         ${md5Long60Sql(
                   s"b.bidx::VARCHAR || '_' || array_to_string(sig[b.bidx * $rb + 1 : b.bidx * $rb + $rb], '_')")}
       |           AS band_key
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, ${Dedup.NumBands})) AS bidx) b)""".stripMargin
  }

  private def minhashLshSqlFrom(minEstJaccard: Double, ctes: String,
                                extraWhere: String): String = {
    val n = Dedup.NumHashes
    s"""WITH $ctes,
       |$sigBandCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM bands a JOIN bands b ON a.bidx = b.bidx AND a.band_key = b.band_key
       |  WHERE a.doc_id < b.doc_id)
       |SELECT id1, id2,
       |       len(list_filter(range(1, ${n + 1}), i -> s1.sig[i] = s2.sig[i])) / $n.0
       |         AS est_jaccard
       |FROM cand JOIN sigs s1 ON id1 = s1.doc_id JOIN sigs s2 ON id2 = s2.doc_id
       |WHERE len(list_filter(range(1, ${n + 1}), i -> s1.sig[i] = s2.sig[i])) / $n.0
       |        >= $minEstJaccard$extraWhere""".stripMargin
  }

  /** Incremental delta-vs-index dedup ([[Dedup.incrementalDedup]], x66):
    * the x3 signature/band chain with a ONE-SIDED candidate join — delta
    * docs (`doc_id % m = m−1`) probe index docs (the rest) only — then
    * best-match selection by (est_jaccard DESC, index_id ASC) and a left
    * join back onto every delta doc. est_jaccard = agreeing/32 is dyadic,
    * so the cross-engine ordering is exact.
    */
  def incrementalDedupSql(deltaMod: Int = 5, minEstJaccard: Double = 0.5): String = {
    val n = Dedup.NumHashes
    val d = deltaMod - 1
    s"""WITH $shingleCtes,
       |$sigBandCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS delta_id, b.doc_id AS index_id
       |  FROM bands a JOIN bands b ON a.bidx = b.bidx AND a.band_key = b.band_key
       |  WHERE a.doc_id % $deltaMod = $d AND b.doc_id % $deltaMod <> $d),
       |ver AS (
       |  SELECT delta_id, index_id,
       |         len(list_filter(range(1, ${n + 1}), i -> s1.sig[i] = s2.sig[i])) / $n.0
       |           AS est_jaccard
       |  FROM cand JOIN sigs s1 ON delta_id = s1.doc_id
       |            JOIN sigs s2 ON index_id = s2.doc_id
       |  WHERE len(list_filter(range(1, ${n + 1}), i -> s1.sig[i] = s2.sig[i])) / $n.0
       |          >= $minEstJaccard),
       |ranked AS (
       |  SELECT delta_id, index_id, est_jaccard,
       |         row_number() OVER (PARTITION BY delta_id
       |                            ORDER BY est_jaccard DESC, index_id) AS rn,
       |         count(*) OVER (PARTITION BY delta_id) AS n_matches
       |  FROM ver),
       |best AS (
       |  SELECT delta_id, n_matches, index_id AS best_id, est_jaccard AS best_est
       |  FROM ranked WHERE rn = 1)
       |SELECT doc.doc_id,
       |       coalesce(b.n_matches, 0) AS n_index_matches,
       |       coalesce(b.best_id, -1) AS best_match_id,
       |       coalesce(b.best_est, 0.0) AS best_est_jaccard,
       |       b.delta_id IS NULL AS keep
       |FROM documents doc LEFT JOIN best b ON doc.doc_id = b.delta_id
       |WHERE doc.doc_id % $deltaMod = $d""".stripMargin
  }

  /** Longest shared token run per LSH candidate pair
    * ([[Dedup.longestDupSpans]]): the x3 query as a CTE, token positions
    * from the same filtered list, diagonal gaps-and-islands. Positions are
    * 1-based here vs Spark's 0-based posexplode — only differences enter
    * the diagonal and run keys, so the offset cancels.
    */
  def dupSpansSql(minEstJaccard: Double = 0.5): String =
    s"""WITH mh AS (${minhashLshSql(minEstJaccard)}),
       |toksl2 AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |ptoks AS (
       |  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
       |  FROM toksl2),
       |m AS (
       |  SELECT mh.id1, mh.id2, a.pos AS i, a.pos - b.pos AS diag
       |  FROM mh
       |  JOIN ptoks a ON a.doc_id = mh.id1
       |  JOIN ptoks b ON b.doc_id = mh.id2 AND b.tok = a.tok),
       |runs AS (
       |  SELECT id1, id2, diag,
       |         i - row_number() OVER (PARTITION BY id1, id2, diag ORDER BY i) AS run
       |  FROM m),
       |lens AS (
       |  SELECT id1, id2, count(*) AS len
       |  FROM runs GROUP BY id1, id2, diag, run)
       |SELECT id1, id2, CAST(max(len) AS BIGINT) AS longest_span
       |FROM lens GROUP BY id1, id2""".stripMargin

  /** SimHash near-dup pairs, mirroring [[Dedup.simhashPairs]]: md5-60
    * token hash, ±count per bit, 60-bit fingerprint, 4×15-bit chunk
    * candidates, Hamming via bit_count(xor).
    */
  def simhashPairsSql(maxHamming: Int = 3): String = {
    val bits = Dedup.SimhashBits
    val cb = Dedup.SimhashChunkBits
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b')) AS token
       |  FROM documents),
       |fil AS (SELECT doc_id, token FROM toks WHERE token NOT IN ($stop)),
       |cnts AS (SELECT doc_id, token, count(*) AS cnt FROM fil GROUP BY doc_id, token),
       |hashed AS (SELECT doc_id, cnt, ${md5Long60Sql("token")} AS h FROM cnts),
       |bitsums AS (
       |  SELECT doc_id, b.bi,
       |         sum(CASE WHEN (h >> b.bi) & 1 = 1 THEN cnt ELSE -cnt END) AS s
       |  FROM hashed CROSS JOIN (SELECT unnest(range(0, $bits)) AS bi) b
       |  GROUP BY doc_id, b.bi),
       |simh AS (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bi) ELSE 0 END) AS BIGINT)
       |           AS simhash
       |  FROM bitsums GROUP BY doc_id),
       |chunks AS (
       |  SELECT doc_id, simhash, c.ci, (simhash >> (c.ci * $cb)) & ${(1L << cb) - 1} AS chunk
       |  FROM simh CROSS JOIN (SELECT unnest(range(0, ${Dedup.SimhashChunks})) AS ci) c),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
       |                  a.simhash AS h1, b.simhash AS h2
       |  FROM chunks a JOIN chunks b ON a.ci = b.ci AND a.chunk = b.chunk
       |  WHERE a.doc_id < b.doc_id)
       |SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(h1, h2)) <= $maxHamming""".stripMargin
  }

  /** LSH-bucketed ANN, mirroring [[VectorSearch.annLshTopK]]: the 8×64
    * LCG hyperplane matrix rides the SQL as double literals (Java
    * shortest-repr strings parse back to the identical doubles), bucket =
    * OR of sign bits, exact cosine within the query's bucket.
    */
  def annLshSql(queryVecId: Long = 0L, k: Int = 10,
                dim: Int = 64, nPlanes: Int = 8): String = {
    val planes = VectorSearch.hyperplanes(dim, nPlanes)
    val planeVals = planes.zipWithIndex.map { case (p, i) =>
      s"($i, [${p.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n       ")
    s"""WITH planes(pidx, pvec) AS (VALUES
       |       $planeVals),
       |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |dots AS (
       |  SELECT vec_id, pidx,
       |         list_sum(list_transform(range(1, ${dim + 1}), i -> v[i] * pvec[i])) AS dot
       |  FROM e CROSS JOIN planes),
       |buckets AS (
       |  SELECT vec_id, CAST(sum(CASE WHEN dot >= 0 THEN (1::BIGINT << pidx) ELSE 0 END)
       |                      AS BIGINT) AS bucket
       |  FROM dots GROUP BY vec_id)
       |SELECT e.vec_id, e.label,
       |       round(list_cosine_similarity(e.v, q.qv), 6) AS sim
       |FROM e JOIN buckets be USING (vec_id)
       |CROSS JOIN (SELECT e2.v AS qv, b2.bucket AS qbucket
       |            FROM e e2 JOIN buckets b2 USING (vec_id)
       |            WHERE e2.vec_id = $queryVecId) q
       |WHERE be.bucket = q.qbucket AND e.vec_id <> $queryVecId
       |ORDER BY sim DESC, e.vec_id LIMIT $k""".stripMargin
  }

  private def sqDist(vExpr: String, cExpr: String, dim: Int): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), " +
      s"i -> ($vExpr[i]-$cExpr[i])*($vExpr[i]-$cExpr[i])))"

  /** `aTab AS (…)`: nearest-centroid assignment of every vector in CTE `v`
    * against centroid table `cTab`; argmin ties break to the lower cell
    * (matching Spark's `array_position` first-match).
    */
  private def assignCte(cTab: String, aTab: String, dim: Int,
                        mat: Boolean = false): String =
    s"""$aTab AS ${if (mat) "MATERIALIZED " else ""}(
       |  SELECT vec_id, v, cell FROM (
       |    SELECT x.vec_id, x.v, c.cell,
       |           row_number() OVER (PARTITION BY x.vec_id
       |             ORDER BY ${sqDist("x.v", "c.c", dim)}, c.cell) AS rk
       |    FROM v x CROSS JOIN $cTab c)
       |  WHERE rk = 1)""".stripMargin

  private def recomputeCte(aTab: String, cPrev: String, cNext: String,
                           mat: Boolean = false): String =
    s"""$cNext AS ${if (mat) "MATERIALIZED " else ""}(
       |  SELECT cell, list(round(m, 6) ORDER BY d) AS c FROM (
       |    SELECT cell, d, avg(val) AS m FROM (
       |      SELECT cell, unnest(v) AS val, generate_subscripts(v, 1) AS d
       |      FROM $aTab)
       |    GROUP BY cell, d)
       |  GROUP BY cell
       |  UNION ALL
       |  SELECT cell, c FROM $cPrev
       |  WHERE cell NOT IN (SELECT cell FROM $aTab GROUP BY cell))""".stripMargin

  /** Shared WITH-prefix for the k-means family: `v` (double-widened
    * embeddings), `c0` (init = first `nCells` vectors by vec_id), and the
    * unrolled Lloyd chain a0/c1 … a{iters-1}/c{iters} (recursive CTEs can't
    * aggregate). Determinism contract shared with
    * [[graft.operators.VectorSearch.kmeansCentroids]]: argmin ties break to
    * the lower cell, every recomputed centroid coordinate rounds to
    * 6 decimals (float-sum order wobble ~1e-13 ≪ the 5e-7 boundary), empty
    * cells carry the previous centroid forward.
    */
  private def lloydChain(nCells: Int, iters: Int, dim: Int,
                         vSrc: String =
                           "SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings",
                         mat: Boolean = false): String = {
    val iterations = (0 until iters).flatMap { t =>
      Seq(assignCte(s"c$t", s"a$t", dim, mat),
        recomputeCte(s"a$t", s"c$t", s"c${t + 1}", mat))
    }.mkString(",\n")
    s"""v AS (
       |  $vSrc),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
       |         v AS c
       |  FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT $nCells)),
       |$iterations""".stripMargin
  }

  /** IVF ANN oracle ([[graft.operators.VectorSearch.annIvfTopK]]): the
    * same fixed-iteration Lloyd chain as the engine (see [[lloydChain]]),
    * nprobe cell pruning, exact cosine within the probed cells.
    */
  def ivfTopKSql(queryVecId: Long = 0L, k: Int = 10, nCells: Int = 16,
                 nprobe: Int = 3, iters: Int = 5, dim: Int = 64): String = {
    def assign(cTab: String, aTab: String): String = assignCte(cTab, aTab, dim)
    s"""WITH ${lloydChain(nCells, iters, dim)},
       |q AS (SELECT v AS qv FROM v WHERE vec_id = $queryVecId),
       |pr AS (
       |  SELECT cell FROM (
       |    SELECT c.cell, ${sqDist("q.qv", "c.c", dim)} AS dist
       |    FROM c$iters c CROSS JOIN q)
       |  ORDER BY dist, cell LIMIT $nprobe),
       |${assign(s"c$iters", "fin")}
       |SELECT f.vec_id, x.label,
       |       round(list_cosine_similarity(f.v, q.qv), 6) AS sim
       |FROM fin f JOIN v x USING (vec_id) CROSS JOIN q
       |WHERE f.cell IN (SELECT cell FROM pr) AND f.vec_id <> $queryVecId
       |ORDER BY sim DESC, f.vec_id LIMIT $k""".stripMargin
  }

  /** IVF index-health report ([[graft.operators.VectorSearch.ivfCellStats]],
    * x68): the engine's Lloyd chain, final assignment, per-cell population
    * + share + skew-vs-uniform + DECIMAL-summed 6-dp quantization
    * distortion, with a cell spine so empty cells report zero.
    */
  def ivfCellStatsSql(nCells: Int = 16, iters: Int = 5, dim: Int = 64): String =
    s"""WITH ${lloydChain(nCells, iters, dim)},
       |${assignCte(s"c$iters", "fin", dim)},
       |dd AS (
       |  SELECT f.cell,
       |         round(${sqDist("f.v", "c.c", dim)}, 6)::DECIMAL(28,6) AS sqd
       |  FROM fin f JOIN c$iters c USING (cell)),
       |per AS (SELECT cell, count(*) AS n_vecs, sum(sqd) AS sumd
       |        FROM dd GROUP BY 1),
       |spine AS (SELECT unnest(range(0, $nCells))::INTEGER AS cell),
       |tot AS (SELECT sum(n_vecs) AS t FROM per)
       |SELECT s.cell, coalesce(p.n_vecs, 0) AS n_vecs,
       |       round(coalesce(p.n_vecs, 0) * 1.0 / t, 6) AS share,
       |       round(coalesce(p.n_vecs, 0) * $nCells.0 / t, 4) AS skew,
       |       round(CASE WHEN coalesce(p.n_vecs, 0) > 0
       |                  THEN (p.sumd::DOUBLE) / p.n_vecs ELSE 0.0 END, 6)
       |         AS avg_sqdist
       |FROM spine s LEFT JOIN per p USING (cell) CROSS JOIN tot""".stripMargin

  /** Shared CTE tail for the batched-IVF family
    * ([[graft.operators.VectorSearch.ivfKnnJoin]]): final cell assignment,
    * the %50 query split, per-query nprobe cell probes (ties to the lower
    * cell), cell-equi candidates, per-query rank.
    */
  private def ivfKnnCtes(k: Int, nCells: Int, nprobe: Int, iters: Int,
                         dim: Int): String =
    s"""${lloydChain(nCells, iters, dim)},
       |${assignCte(s"c$iters", "fin", dim)},
       |q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id % 50 = 0),
       |pr AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.query_id, c.cell,
       |           row_number() OVER (PARTITION BY q.query_id
       |             ORDER BY ${sqDist("q.qv", "c.c", dim)}, c.cell) AS rk
       |    FROM q CROSS JOIN c$iters c)
       |  WHERE rk <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, f.vec_id, x.label,
       |         round(list_cosine_similarity(f.v, q.qv), 6) AS sim
       |  FROM fin f JOIN pr p ON f.cell = p.cell
       |  JOIN q ON q.query_id = p.query_id
       |  JOIN v x ON x.vec_id = f.vec_id
       |  WHERE f.vec_id % 50 <> 0 AND f.vec_id <> p.query_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |                                   ORDER BY sim DESC, vec_id) AS rank
       |      FROM cand)""".stripMargin

  /** Batched IVF kNN join oracle: top-k per query from the probed cells. */
  def ivfKnnJoinSql(k: Int = 5, nCells: Int = 16, nprobe: Int = 3,
                    iters: Int = 5, dim: Int = 64): String =
    s"""WITH ${ivfKnnCtes(k, nCells, nprobe, iters, dim)}
       |SELECT query_id, vec_id, label, sim, CAST(rank AS BIGINT) AS rank
       |FROM r WHERE rank <= $k""".stripMargin

  /** Hard-negative mining oracle
    * ([[graft.operators.VectorSearch.hardNegatives]], x57): the x37
    * candidate chain truncated to the top-`poolK` pool, a label
    * anti-filter against the query's own label, and a re-rank — the same
    * two-stage ranking the engine performs.
    */
  def hardNegativesSql(k: Int = 5, poolK: Int = 50, nCells: Int = 16,
                       nprobe: Int = 3, iters: Int = 5,
                       dim: Int = 64): String =
    s"""WITH ${ivfKnnCtes(poolK, nCells, nprobe, iters, dim)},
       |hn AS (
       |  SELECT c.query_id, q.label AS query_label, c.vec_id, c.label, c.sim
       |  FROM r c JOIN v q ON q.vec_id = c.query_id
       |  WHERE c.rank <= $poolK AND c.label <> q.label),
       |rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |                                    ORDER BY sim DESC, vec_id) AS neg_rank
       |       FROM hn)
       |SELECT query_id, query_label, vec_id, label, sim,
       |       CAST(neg_rank AS BIGINT) AS neg_rank
       |FROM rr WHERE neg_rank <= $k""".stripMargin

  /** Recall@k oracle ([[graft.operators.VectorSearch.ivfRecall]]): exact
    * top-k (the x26 shape) left-joined with the IVF top-k per query.
    */
  def ivfRecallSql(k: Int = 5, nCells: Int = 16, nprobe: Int = 3,
                   iters: Int = 5, dim: Int = 64): String =
    s"""WITH ${ivfKnnCtes(k, nCells, nprobe, iters, dim)},
       |ik AS (SELECT query_id, vec_id FROM r WHERE rank <= $k),
       |ex AS (
       |  SELECT q.query_id, e.vec_id,
       |         round(list_cosine_similarity(e.v, q.qv), 6) AS sim
       |  FROM v e CROSS JOIN q
       |  WHERE e.vec_id % 50 <> 0 AND e.vec_id <> q.query_id),
       |er AS (SELECT query_id, vec_id,
       |              row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY sim DESC, vec_id) AS rank
       |       FROM ex),
       |ek AS (SELECT query_id, vec_id FROM er WHERE rank <= $k)
       |SELECT e.query_id, CAST(count(i.vec_id) AS BIGINT) AS n_hits,
       |       round(count(i.vec_id) * 1.0 / $k, 6) AS recall
       |FROM ek e LEFT JOIN ik i ON e.query_id = i.query_id AND e.vec_id = i.vec_id
       |GROUP BY e.query_id""".stripMargin

  /** SemDeDup-style semantic dedup oracle
    * ([[graft.operators.VectorSearch.semanticDedup]]): the same Lloyd chain
    * as x14, final cell assignment, within-cell pairwise cosine, greedy
    * first-occurrence keep — a vector is pruned iff a lower-id vector in
    * its cell is within `threshold` (same convention as the x29 line
    * dedup).
    */
  def semanticDedupSql(nCells: Int = 16, iters: Int = 5,
                       threshold: Double = 0.45, dim: Int = 64): String =
    s"""WITH ${lloydChain(nCells, iters, dim)},
       |${assignCte(s"c$iters", "fin", dim)},
       |pruned AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM fin a JOIN fin b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= $threshold)
       |SELECT f.vec_id, f.cell, (p.vec_id IS NULL) AS kept
       |FROM fin f LEFT JOIN pruned p USING (vec_id)""".stripMargin

  val annTopKSql: String =
    """SELECT e.vec_id, e.label,
      |       round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS sim
      |FROM embeddings e
      |CROSS JOIN (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q
      |WHERE e.vec_id <> 0
      |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin

  /** Batched k-NN join ([[VectorSearch.knnJoin]]): every 50th vector
    * queries the rest, rank over (sim desc, vec_id).
    */
  val knnJoinSql: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id % 50 = 0),
      |s AS (
      |  SELECT q.query_id, e.vec_id, e.label,
      |         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS sim
      |  FROM embeddings e CROSS JOIN q
      |  WHERE e.vec_id % 50 <> 0 AND e.vec_id <> q.query_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |                                   ORDER BY sim DESC, vec_id) AS rank FROM s)
      |SELECT query_id, vec_id, label, sim, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 5""".stripMargin

  /** Embedding decontamination
    * ([[graft.operators.VectorSearch.semanticDecontaminate]], x86): the
    * per-pair rounded cosines aggregate per corpus doc — max(round) here
    * equals the engine's round(max) by round's monotonicity.
    */
  val semanticDecontamSql: String =
    """WITH ev AS (SELECT vec_id, embedding::DOUBLE[] AS v
      |            FROM embeddings WHERE vec_id % 10 = 0),
      |c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
      |      FROM embeddings WHERE vec_id % 10 <> 0),
      |s AS (SELECT c.vec_id, c.label,
      |             round(list_cosine_similarity(c.v, e.v), 6) AS sim
      |      FROM c CROSS JOIN ev e)
      |SELECT vec_id, label, max(sim) AS max_sim,
      |       CAST(count(*) FILTER (WHERE sim >= 0.4) AS BIGINT) AS n_close,
      |       max(sim) >= 0.4 AS contaminated
      |FROM s GROUP BY 1, 2""".stripMargin

  /** IVF-celled embedding decontamination
    * ([[graft.operators.VectorSearch.semanticDecontaminateIvf]], x86b):
    * the Lloyd chain trains on the EVAL split (the lloydChain `v` CTE is
    * the eval set, so `fin` assigns eval vectors to cells), each corpus
    * doc probes its nprobe nearest cells, candidates meet on the cell
    * id, and the corpus spine left-join gives the no-candidate verdict.
    */
  def semanticDecontamIvfSql(threshold: Double = 0.4, nCells: Int = 16,
                             nprobe: Int = 3, iters: Int = 5,
                             dim: Int = 64): String =
    s"""WITH ${lloydChain(nCells, iters, dim,
            vSrc = "SELECT vec_id, label, embedding::DOUBLE[] AS v " +
              "FROM embeddings WHERE vec_id % 10 = 0")},
       |${assignCte(s"c$iters", "fin", dim)},
       |corp AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
       |         FROM embeddings WHERE vec_id % 10 <> 0),
       |pr AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.vec_id AS query_id, c.cell,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${sqDist("q.v", "c.c", dim)}, c.cell) AS rk
       |    FROM corp q CROSS JOIN c$iters c)
       |  WHERE rk <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, round(list_cosine_similarity(f.v, q.v), 6) AS sim
       |  FROM fin f JOIN pr p ON f.cell = p.cell
       |  JOIN corp q ON q.vec_id = p.query_id),
       |agg AS (
       |  SELECT query_id, max(sim) AS max_sim,
       |         CAST(count(*) FILTER (WHERE sim >= $threshold) AS BIGINT)
       |           AS n_close
       |  FROM cand GROUP BY 1)
       |SELECT c.vec_id, c.label, a.max_sim,
       |       coalesce(a.n_close, 0) AS n_close,
       |       coalesce(a.max_sim >= $threshold, false) AS contaminated
       |FROM corp c LEFT JOIN agg a ON a.query_id = c.vec_id""".stripMargin

  val embNearDupsSql: String =
    """SELECT a.vec_id AS id1, b.vec_id AS id2,
      |       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45""".stripMargin

  /** [[VectorSearch.quantize]] in SQL: same max-abs/127 scale, same
    * away-from-zero rounding (both engines), dims exploded to scalars.
    */
  val quantizedSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (
      |  SELECT vec_id, v,
      |         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0.0 THEN 1.0
      |              ELSE list_max(list_transform(v, x -> abs(x))) / 127.0 END AS scale
      |  FROM e)
      |SELECT vec_id, CAST(i.range AS INT) AS dim,
      |       CAST(round(v[i.range + 1] / scale) AS INT) AS q,
      |       round(scale, 6) AS scale
      |FROM s, range(0, 64) i""".stripMargin

  val centroidNormsSql: String =
    """WITH per AS (
      |  SELECT label, i.range AS dim, avg(embedding[i.range + 1]::DOUBLE) AS cx
      |  FROM embeddings, range(0, 64) i GROUP BY 1, 2)
      |SELECT label, round(sqrt(sum(cx * cx)), 6) AS centroid_norm
      |FROM per GROUP BY label""".stripMargin

  val langIdSql: String = {
    val hitCols = TextQuality.LangMarkers.map { case (lang, ms) =>
      val in = ms.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(words, x -> x IN ($in))) AS c_$lang"
    }.mkString(",\n         ")
    val langs = TextQuality.LangMarkers.map(_._1)
    val caseChain = langs.map(l => s"WHEN c_$l = g AND g > 0 THEN '$l'").mkString(" ")
    s"""WITH w AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z]+') AS words
       |           FROM documents),
       |c AS (SELECT doc_id, lang, len(words) AS nw,
       |         $hitCols
       |      FROM w),
       |g AS (SELECT *, greatest(${langs.map("c_" + _).mkString(", ")}) AS g FROM c)
       |SELECT doc_id, lang AS declared_lang,
       |       CASE $caseChain ELSE 'und' END AS detected_lang,
       |       round(g * 1.0 / greatest(nw, 1), 6) AS confidence
       |FROM g""".stripMargin
  }

  val qualitySql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |         length(text) AS n_chars_measured,
       |         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_words,
       |         (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) * 1.0
       |           / greatest(length(text), 1) AS punct_ratio,
       |         len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
       |             w -> w IN ($stop))) * 1.0
       |           / greatest(len(regexp_extract_all(lower(text), '[a-z]+')), 1) AS stop_ratio
       |  FROM documents)
       |SELECT doc_id, n_chars_measured, n_words,
       |       round(punct_ratio, 6) AS punct_ratio,
       |       round(stop_ratio, 6) AS stopword_ratio,
       |       round(least(n_chars_measured / 500.0, 1.0) * 0.25 +
       |             least(n_words / 100.0, 1.0) * 0.25 +
       |             (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.25 +
       |             (CASE WHEN stop_ratio >= 0.10 AND stop_ratio <= 0.60
       |                   THEN 1.0 ELSE 0.0 END) * 0.25, 6) AS quality
       |FROM m""".stripMargin

  /** Streaming quality gate ([[graft.streaming.DocStream.qualityGateStream]],
    * w11): the batch equivalent of the replayed stream — counts are
    * order-free, so the memory-sink contents must equal this exactly.
    */
  def streamQualityGateSql(threshold: Double = 0.6): String =
    s"""WITH q AS ($qualitySql)
       |SELECT d.source, (q.quality >= $threshold) AS accepted,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM q JOIN documents d USING (doc_id) GROUP BY 1, 2""".stripMargin

  val tokenCountsSql: String =
    """SELECT doc_id,
      |       len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS ws_tokens,
      |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpeish_tokens,
      |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) * 1.0
      |         / greatest(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')), 1)
      |         AS fertility
      |FROM documents""".stripMargin

  val fingerprintsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents)
       |SELECT d.doc_id,
       |       md5(regexp_replace(trim(lower(d.text)), '\\s+', ' ', 'g')) AS content_md5,
       |       list_reduce(
       |         list_concat([0::BIGINT],
       |           list_transform(toks.t,
       |             x -> ${md5Long60Sql("x")} % 1000000007)),
       |         (acc, x) -> (acc * 1000003 + x) % 2147483647) AS rolling_hash
       |FROM documents d JOIN toks USING (doc_id)""".stripMargin

  /** Token-window chunking ([[TextQuality.chunkTokens]]) — same stopword
    * tokenizer, same start grid, DuckDB's inclusive-clamping list slice
    * mirrors Spark's `slice(arr, start, len)`.
    */
  def chunksSql(chunkSize: Int = 128, overlap: Int = 32): String = {
    val step = chunkSize - overlap
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |starts AS (
       |  SELECT doc_id, t,
       |         unnest(range(0, greatest(len(t), 1), $step)) AS start
       |  FROM toks)
       |SELECT doc_id, start // $step AS chunk_idx, start,
       |       len(t[start + 1 : start + $chunkSize]) AS n_tokens,
       |       md5(coalesce(array_to_string(t[start + 1 : start + $chunkSize], ' '), '')) AS chunk_md5
       |FROM starts""".stripMargin
  }

  /** Benchmark decontamination ([[graft.operators.CorpusPrep.decontaminate]]):
    * distinct n-grams per document (by string — Spark's xxhash64 key is
    * internal), eval set = doc_id % 20 == 0, corpus = the rest, hits
    * counted per corpus document.
    */
  def decontaminateSql(n: Int = 5): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(t) < $n THEN [coalesce(array_to_string(t, ' '), '')]
       |         ELSE list_transform(range(len(t) - ${n - 1}),
       |                i -> array_to_string(t[i + 1 : i + $n], ' ')) END) AS gram
       |  FROM toks),
       |h AS (SELECT DISTINCT doc_id, gram FROM g),
       |ev AS (SELECT DISTINCT gram FROM h WHERE doc_id % 20 = 0),
       |corpus AS (SELECT * FROM h WHERE doc_id % 20 <> 0),
       |sz AS (SELECT doc_id, count(*) AS n FROM corpus GROUP BY 1),
       |hits AS (SELECT doc_id, count(*) AS c
       |         FROM corpus JOIN ev USING (gram) GROUP BY 1)
       |SELECT doc_id, CAST(c AS BIGINT) AS n_hits, CAST(n AS BIGINT) AS n_ngrams,
       |       round(c * 1.0 / n, 6) AS contamination
       |FROM hits JOIN sz USING (doc_id)""".stripMargin

  /** Split leakage audit ([[graft.operators.CorpusPrep.splitNovelty]]):
    * per-validation-doc fraction of distinct n-grams absent from the train
    * split. Grams compare by string (Spark's xxhash64 key is internal);
    * the split replays the salted md5-60 bucket of x20.
    */
  def splitNoveltySql(n: Int = 8): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |sp AS (
       |  SELECT doc_id,
       |         CASE WHEN ${md5Long60Sql("'graft-split-v1:' || doc_id")} % 10000 < 9000 THEN 'train'
       |              WHEN ${md5Long60Sql("'graft-split-v1:' || doc_id")} % 10000 < 9500 THEN 'validation'
       |              ELSE 'test' END AS split
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(t) < $n THEN [coalesce(array_to_string(t, ' '), '')]
       |         ELSE list_transform(range(len(t) - ${n - 1}),
       |                i -> array_to_string(t[i + 1 : i + $n], ' ')) END) AS gram
       |  FROM toks),
       |h AS (SELECT DISTINCT doc_id, gram FROM g),
       |hs AS (SELECT h.doc_id, h.gram, sp.split FROM h JOIN sp USING (doc_id)),
       |tr AS (SELECT DISTINCT gram FROM hs WHERE split = 'train'),
       |va AS (SELECT doc_id, gram FROM hs WHERE split = 'validation')
       |SELECT va.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |       CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
       |       round(1.0 - sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
       |         AS novelty
       |FROM va LEFT JOIN tr ON va.gram = tr.gram
       |GROUP BY va.doc_id""".stripMargin

  /** Cross-document duplication ([[graft.operators.CorpusPrep.crossDocDuplication]]):
    * distinct n-grams per doc (by string — the Spark side's xxhash64 is
    * internal), global document frequencies, shared fraction per doc.
    */
  def crossDocDuplicationSql(n: Int = 5): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(t) < $n THEN [coalesce(array_to_string(t, ' '), '')]
       |         ELSE list_transform(range(len(t) - ${n - 1}),
       |                i -> array_to_string(t[i + 1 : i + $n], ' ')) END) AS gram
       |  FROM toks),
       |h AS (SELECT DISTINCT doc_id, gram FROM g),
       |w AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS gram_df FROM h)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
       |       CAST(sum(CASE WHEN gram_df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |       round(sum(CASE WHEN gram_df > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
       |         AS shared_frac
       |FROM w
       |GROUP BY doc_id""".stripMargin

  /** Prep-pipeline capstone ([[graft.operators.CorpusPrep.qPrepPipeline]]):
    * exact-dedup keep ∩ word-count gate, split buckets, per-split totals.
    */
  val prepPipelineSql: String =
    s"""WITH uniq AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
       |    FROM documents) WHERE NOT is_dup),
       |good AS (
       |  SELECT doc_id FROM documents
       |  WHERE CASE WHEN len(trim(text)) = 0 THEN 0
       |             ELSE len(string_split_regex(trim(text), '\\s+')) END
       |        BETWEEN 50 AND 100000),
       |toks AS (
       |  SELECT doc_id,
       |         len(list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                         w -> w NOT IN ($stop))) AS n_tokens
       |  FROM documents),
       |sp AS (
       |  SELECT doc_id,
       |         CASE WHEN ${md5Long60Sql("'graft-split-v1:' || doc_id")} % 10000 < 9000 THEN 'train'
       |              WHEN ${md5Long60Sql("'graft-split-v1:' || doc_id")} % 10000 < 9500 THEN 'validation'
       |              ELSE 'test' END AS split
       |  FROM documents)
       |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM sp JOIN uniq USING (doc_id) JOIN good USING (doc_id) JOIN toks USING (doc_id)
       |GROUP BY split""".stripMargin

  /** Deterministic split buckets ([[graft.operators.CorpusPrep.assignSplit]]). */
  val assignSplitSql: String =
    s"""SELECT doc_id,
       |       CAST(${md5Long60Sql("'graft-split-v1:' || doc_id")} % 10000 AS BIGINT) AS bucket,
       |       CASE WHEN ${md5Long60Sql("'graft-split-v1:' || doc_id")} % 10000 < 9000 THEN 'train'
       |            WHEN ${md5Long60Sql("'graft-split-v1:' || doc_id")} % 10000 < 9500 THEN 'validation'
       |            ELSE 'test' END AS split
       |FROM documents""".stripMargin

  /** Dataloader order ([[graft.operators.CorpusPrep.trainingOrder]],
    * x87): salted md5-60 shard + dense within-shard rank of the same
    * hash. The hash is non-negative (15 hex chars < 2^60), so `%` here
    * equals the engine's `pmod`.
    */
  val trainingOrderSql: String = {
    val h = md5Long60Sql("'graft-order-v1:' || doc_id")
    s"""WITH h AS (SELECT doc_id, source, $h AS hh FROM documents)
       |SELECT doc_id, source, CAST(hh % 8 AS INT) AS shard,
       |       CAST(row_number() OVER (PARTITION BY hh % 8
       |                               ORDER BY hh, doc_id) - 1 AS BIGINT) AS pos
       |FROM h""".stripMargin
  }

  /** Domain mixing ([[graft.operators.CorpusPrep.mixSources]]) with the
    * query's 0.25/0.5/1.0/2.5 rate cycle over the src<i> sources.
    */
  val mixSourcesSql: String = {
    val bucket = md5Long60Sql("'graft-mix-v1:' || doc_id") + " % 10000"
    s"""WITH r AS (
       |  SELECT doc_id, source, CAST($bucket AS BIGINT) AS bucket,
       |         CASE CAST(substr(source, 4) AS INT) % 4
       |              WHEN 0 THEN 0.25 WHEN 1 THEN 0.5
       |              WHEN 2 THEN 1.0 ELSE 2.5 END AS rate
       |  FROM documents)
       |SELECT doc_id, source, bucket, round(CAST(rate AS DOUBLE), 6) AS rate,
       |       CAST(floor(rate) + CASE WHEN bucket < (rate - floor(rate)) * 10000
       |                               THEN 1 ELSE 0 END AS BIGINT) AS n_copies,
       |       floor(rate) + CASE WHEN bucket < (rate - floor(rate)) * 10000
       |                          THEN 1 ELSE 0 END >= 1 AS accept
       |FROM r""".stripMargin
  }

  /** Temperature mixing weights
    * ([[graft.operators.CorpusPrep.temperatureMixRates]]): α = 0.5 so the
    * power is IEEE-exact sqrt; the weight total sums 6dp-rounded decimals
    * exactly, and sample_factor recomputes from the two ROUNDED share
    * columns, mirroring the Spark expression tree step for step.
    */
  val mixTemperatureSql: String =
    """WITH t AS (
      |  SELECT source, count(*) AS n_docs,
      |         CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'),
      |                                  x -> x <> ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |w AS (SELECT *, round(sqrt(n_tokens), 6) AS w FROM t),
      |tot AS (SELECT sum(n_tokens) AS tot_tokens,
      |               sum(CAST(w AS DECIMAL(24,6))) AS tot_w FROM w),
      |sel AS (
      |  SELECT source, n_docs, n_tokens,
      |         round(n_tokens * 1.0 / tot_tokens, 6) AS natural_share,
      |         round(w / CAST(tot_w AS DOUBLE), 6) AS alpha_share
      |  FROM w, tot)
      |SELECT source, n_docs, n_tokens, natural_share, alpha_share,
      |       round(alpha_share / natural_share, 6) AS sample_factor
      |FROM sel""".stripMargin

  /** Concat-then-chunk packing ([[graft.operators.CorpusPrep.packOffsets]]):
    * windowed cumulative token count per source shard, integer division
    * into fixed context windows.
    */
  def packOffsetsSql(ctxLen: Int = 512): String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |         len(list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                         w -> w NOT IN ($stop))) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, source, n_tokens,
       |             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum_end
       |      FROM toks)
       |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST((cum_end - n_tokens) // $ctxLen AS BIGINT) AS pack_id,
       |       CAST((cum_end - n_tokens) % $ctxLen AS BIGINT) AS pack_offset,
       |       CAST(CASE WHEN n_tokens = 0 THEN 0
       |                 ELSE (cum_end - 1) // $ctxLen - (cum_end - n_tokens) // $ctxLen + 1
       |            END AS BIGINT) AS n_packs
       |FROM c""".stripMargin

  /** C4 line filter ([[TextQuality.c4LineFilter]]): same trim → terminal
    * punctuation → ≥5-word rules, same document keep rule, digest of the
    * surviving lines joined by newline.
    */
  /** Cross-corpus line dedup ([[graft.operators.TextQuality.crossDocLineDedup]]). */
  val lineDedupSql: String =
    """WITH l AS (
      |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
      |         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos
      |  FROM documents),
      |firsts AS (
      |  SELECT doc_id, pos, line FROM (
      |    SELECT doc_id, pos, line,
      |           row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rk
      |    FROM l WHERE length(line) >= 20)
      |  WHERE rk = 1),
      |kept AS (
      |  SELECT doc_id, pos, line FROM l WHERE length(line) < 20
      |  UNION ALL SELECT doc_id, pos, line FROM firsts),
      |r AS (
      |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
      |         CAST(count(*) AS BIGINT) AS n_kept
      |  FROM kept GROUP BY doc_id)
      |SELECT d.doc_id,
      |       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
      |       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
      |       CAST(len(string_split(d.text, chr(10))) - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped,
      |       md5(coalesce(r.text_dedup, '')) AS dedup_md5
      |FROM documents d LEFT JOIN r USING (doc_id)""".stripMargin

  val c4FilterSql: String =
    """WITH l AS (
      |  SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM documents),
      |k AS (
      |  SELECT doc_id, text, len(lines) AS n_lines,
      |         list_filter(list_transform(lines, x -> trim(x)),
      |                     t -> regexp_matches(t, '[.!?"]$')
      |                          AND len(string_split_regex(t, '\s+')) >= 5) AS kept
      |  FROM l)
      |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
      |       CAST(len(kept) AS BIGINT) AS n_kept,
      |       len(kept) >= 3 AND NOT contains(text, '{')
      |         AND NOT contains(lower(text), 'lorem ipsum') AS keep_doc,
      |       md5(coalesce(array_to_string(kept, chr(10)), '')) AS kept_md5
      |FROM k""".stripMargin

  /** Token-budget selection oracle ([[CorpusPrep.tokenBudgetSelect]]):
    * composes the x10 quality and x11 token-count queries as CTEs (DuckDB
    * allows a CTE body to carry its own WITH), then the same per-source
    * greedy-until-exceeded window cumsum.
    */
  def tokenBudgetSql(budgetPerSource: Long = 10000L): String =
    s"""WITH q AS ($qualitySql),
       |t AS ($tokenCountsSql),
       |j AS (
       |  SELECT d.doc_id, d.source, q.quality, t.ws_tokens
       |  FROM documents d JOIN q USING (doc_id) JOIN t USING (doc_id)),
       |c AS (
       |  SELECT *, coalesce(sum(ws_tokens) OVER (
       |    PARTITION BY source ORDER BY quality DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM j)
       |SELECT doc_id, source, quality, CAST(ws_tokens AS BIGINT) AS ws_tokens,
       |       (cum_before < $budgetPerSource) AS selected
       |FROM c""".stripMargin

  /** Unigram LM scoring ([[TextQuality.unigramLogprob]]): add-one smoothed
    * corpus unigram model, mean natural-log probability per document.
    */
  val unigramLogprobSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(
       |    list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                w -> w NOT IN ($stop))) AS word
       |  FROM documents),
       |dtc AS (SELECT doc_id, word, count(*) AS cnt FROM toks GROUP BY 1, 2),
       |model AS (SELECT word, sum(cnt) AS gcnt FROM dtc GROUP BY 1),
       |tot AS (SELECT sum(gcnt) AS n_total, count(*) AS n_vocab FROM model)
       |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |       round(sum(cnt * ln((gcnt + 1) / (n_total + n_vocab))) / sum(cnt), 6)
       |         AS mean_logprob
       |FROM dtc JOIN model USING (word), tot
       |GROUP BY doc_id""".stripMargin

  /** Hashed-feature logistic-regression oracle
    * ([[graft.operators.Classifier.qualityDistill]]): the same fixed GD
    * iterations unrolled as chained CTEs (recursive SQL cannot aggregate —
    * the Lloyd-chain precedent), the same md5-60 bucket hash, the same
    * per-iteration 8-dp weight rounding, the same raw-margin prediction.
    * Labels come from the x25 unigram-LM score: top half by
    * `ntile(2) OVER (ORDER BY score DESC, doc_id)` (both engines order the
    * identical 6-dp-rounded values), unscored documents label 0.
    */
  def qualityDistillSql(lr: Double = 2.0, iters: Int = 10,
                        buckets: Int = 64,
                        quantileLabels: Boolean = false): String = {
    // x39b swaps the ntile(2) halves for a quantile_cont(0.5) threshold —
    // the interpolated median over the same 6-dp-rounded scores, y = 1 iff
    // score >= T (ties at the median all keep label 1; unscored docs 0).
    // Both engines interpolate the identical middle pair, and every score
    // sorts outside (lo, hi), so the compare is ULP-robust (Classifier
    // Scaladoc).
    val labelCtes =
      if (quantileLabels)
        """thr AS (SELECT quantile_cont(mean_logprob, 0.5) AS t FROM sc),
          |lab AS MATERIALIZED (SELECT d.doc_id,
          |               CASE WHEN sc.mean_logprob >= thr.t THEN 1.0 ELSE 0.0 END AS y
          |        FROM documents d LEFT JOIN sc USING (doc_id), thr),""".stripMargin
      else
        """halves AS (
          |  SELECT doc_id, ntile(2) OVER (ORDER BY mean_logprob DESC, doc_id) AS half
          |  FROM sc),
          |lab AS MATERIALIZED (SELECT d.doc_id,
          |               CASE WHEN h.half = 1 THEN 1.0 ELSE 0.0 END AS y
          |        FROM documents d LEFT JOIN halves h USING (doc_id)),""".stripMargin
    // every w$t is referenced twice (directly and via g$t → s$t), so an
    // inlining planner would expand the chain 2^iters times — MATERIALIZED
    // pins each step to run once (the deeper-than-Lloyd chain needs it)
    val iterCtes = (0 until iters).map { t =>
      s"""s$t AS MATERIALIZED (SELECT f.doc_id, sum(f.v * w.wt) AS s
         |        FROM feats f JOIN w$t w USING (j) GROUP BY 1),
         |e$t AS MATERIALIZED (SELECT s.doc_id, 1.0 / (1.0 + exp(-s.s)) - l.y AS err
         |        FROM s$t s JOIN lab l USING (doc_id)),
         |g$t AS MATERIALIZED (SELECT f.j, sum(e.err * f.v) / nn.n AS g
         |        FROM feats f JOIN e$t e USING (doc_id), nd nn GROUP BY f.j, nn.n),
         |w${t + 1} AS MATERIALIZED (SELECT w.j, round(w.wt - $lr * coalesce(g.g, 0.0), 8) AS wt
         |              FROM w$t w LEFT JOIN g$t g USING (j))""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(
       |    list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                w -> w NOT IN ($stop))) AS word
       |  FROM documents),
       |dtc AS MATERIALIZED (SELECT doc_id, word, count(*) AS cnt FROM toks GROUP BY 1, 2),
       |lens AS (SELECT doc_id, sum(cnt) AS len FROM dtc GROUP BY 1),
       |feats AS MATERIALIZED (
       |  SELECT doc_id, j, sum(cnt) * 1.0 / any_value(len) AS v FROM (
       |    SELECT d.doc_id, CAST(${md5Long60Sql("word")} % $buckets AS INT) AS j,
       |           cnt, len
       |    FROM dtc d JOIN lens USING (doc_id))
       |  GROUP BY doc_id, j
       |  UNION ALL
       |  SELECT doc_id, $buckets AS j, 1.0 AS v FROM documents),
       |model AS (SELECT word, sum(cnt) AS gcnt FROM dtc GROUP BY 1),
       |tot AS (SELECT sum(gcnt) AS n_total, count(*) AS n_vocab FROM model),
       |sc AS (
       |  SELECT doc_id,
       |         round(sum(cnt * ln((gcnt + 1) / (n_total + n_vocab))) / sum(cnt), 6)
       |           AS mean_logprob
       |  FROM dtc JOIN model USING (word), tot
       |  GROUP BY doc_id),
       |$labelCtes
       |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |w0 AS (SELECT CAST(range AS INT) AS j, 0.0 AS wt FROM range(0, ${buckets + 1})),
       |$iterCtes,
       |sf AS (SELECT f.doc_id, sum(f.v * w.wt) AS s
       |       FROM feats f JOIN w$iters w USING (j) GROUP BY 1)
       |SELECT s.doc_id, CAST(l.y AS BIGINT) AS y,
       |       round(1.0 / (1.0 + exp(-s.s)), 6) AS prob,
       |       CAST(CASE WHEN s.s >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
       |FROM sf s JOIN lab l USING (doc_id)""".stripMargin
  }

  /** Canonicalization oracle ([[TextQuality.normalizeText]]): DuckDB's
    * `nfc_normalize` (utf8proc) against the JVM Normalizer — both
    * implement Unicode canonical composition — then the identical strip
    * and collapse regexes (RE2 and Java agree on these classes; \x0B/\f
    * sit in the strip set precisely because their `\s` definitions
    * differ).
    */
  val normalizeSql: String =
    """WITH n AS (
      |  SELECT doc_id, text,
      |         trim(regexp_replace(nfc_normalize(regexp_replace(text,
      |           '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{200B}-\x{200D}\x{FEFF}]', '', 'g')),
      |           '\s+', ' ', 'g')) AS norm
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(length(text) AS BIGINT) AS n_chars_raw,
      |       CAST(length(norm) AS BIGINT) AS n_chars_norm,
      |       (norm <> text) AS changed,
      |       md5(norm) AS norm_digest
      |FROM n""".stripMargin

  /** CCNet quality-bucket oracle ([[TextQuality.ccnetBuckets]]): the x25
    * unigram score, then per-source `ntile(3)` over the 6-dp-rounded
    * score (DESC, doc_id) — the tie order both engines share.
    */
  val ccnetBucketsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(
       |    list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                w -> w NOT IN ($stop))) AS word
       |  FROM documents),
       |dtc AS (SELECT doc_id, word, count(*) AS cnt FROM toks GROUP BY 1, 2),
       |model AS (SELECT word, sum(cnt) AS gcnt FROM dtc GROUP BY 1),
       |tot AS (SELECT sum(gcnt) AS n_total, count(*) AS n_vocab FROM model),
       |sc AS (
       |  SELECT doc_id,
       |         round(sum(cnt * ln((gcnt + 1) / (n_total + n_vocab))) / sum(cnt), 6)
       |           AS mean_logprob
       |  FROM dtc JOIN model USING (word), tot
       |  GROUP BY doc_id),
       |b AS (
       |  SELECT d.doc_id, d.source, sc.mean_logprob,
       |         ntile(3) OVER (PARTITION BY d.source
       |                        ORDER BY sc.mean_logprob DESC, d.doc_id) AS t
       |  FROM documents d JOIN sc USING (doc_id))
       |SELECT doc_id, source, mean_logprob,
       |       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM b""".stripMargin

  /** N-gram repetition fractions ([[TextQuality.ngramRepetition]], n=2):
    * same bigram grid, grouped by the gram string (the Spark side groups
    * by an internal xxhash64 of it — counts agree, the hash is never
    * emitted).
    */
  def ngramRepetitionSql(n: Int = 2): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(t) < $n THEN [coalesce(array_to_string(t, ' '), '')]
       |         ELSE list_transform(range(len(t) - ${n - 1}),
       |                i -> array_to_string(t[i + 1 : i + $n], ' ')) END) AS gram
       |  FROM toks),
       |c AS (SELECT doc_id, gram, count(*) AS cnt
       |      FROM g GROUP BY 1, 2)
       |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
       |       round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top_frac,
       |       round(CAST(sum(cnt) - count(*) AS DOUBLE) / sum(cnt), 6) AS dup_frac
       |FROM c GROUP BY doc_id""".stripMargin

  /** Gopher document-level quality rules ([[TextQuality.gopherRules]]):
    * same whitespace words, line trims, symbol counts and thresholds; the
    * keep rule compares the raw (unrounded) metrics like the Spark side.
    */
  val gopherRulesSql: String =
    """WITH w AS (
      |  SELECT doc_id, text,
      |         CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
      |              ELSE string_split_regex(trim(text), '\s+') END AS words,
      |         list_transform(string_split(text, chr(10)), x -> trim(x)) AS lines
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, len(words) AS n_words,
      |         CAST(coalesce(list_sum(list_transform(words, x -> len(x))), 0) AS DOUBLE)
      |           / greatest(len(words), 1) AS mean_word_len,
      |         (len(text) - len(replace(text, '#', ''))
      |           + (len(text) - len(replace(text, '...', ''))) / 3.0)
      |           / greatest(len(words), 1) AS symbol_ratio,
      |         CAST(len(list_filter(lines, t -> regexp_matches(t, '^[-*•]'))) AS DOUBLE)
      |           / greatest(len(lines), 1) AS bullet_frac,
      |         CAST(len(list_filter(lines, t -> regexp_matches(t, '(\.\.\.|…)$'))) AS DOUBLE)
      |           / greatest(len(lines), 1) AS ellipsis_frac,
      |         CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
      |           / greatest(len(words), 1) AS alpha_frac,
      |         len(list_intersect(list_distinct(list_transform(words, x -> lower(x))),
      |             ['the','be','to','of','and','that','have','with'])) AS n_req_stops
      |  FROM w)
      |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
      |       round(mean_word_len, 6) AS mean_word_len,
      |       round(symbol_ratio, 6) AS symbol_ratio,
      |       round(bullet_frac, 6) AS bullet_frac,
      |       round(ellipsis_frac, 6) AS ellipsis_frac,
      |       round(alpha_frac, 6) AS alpha_frac,
      |       CAST(n_req_stops AS BIGINT) AS n_req_stops,
      |       n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
      |         AND symbol_ratio < 0.1 AND bullet_frac < 0.9 AND ellipsis_frac < 0.3
      |         AND alpha_frac > 0.8 AND n_req_stops >= 2 AS keep_doc
      |FROM m""".stripMargin

  /** Gopher-style duplicate-line fraction ([[TextQuality.repetitionStats]]). */
  val repetitionSql: String =
    """WITH l AS (
      |  SELECT doc_id,
      |         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
      |                     x -> x <> '') AS ls
      |  FROM documents)
      |SELECT doc_id, len(ls) AS n_lines, len(list_distinct(ls)) AS n_distinct_lines,
      |       round(CASE WHEN len(ls) = 0 THEN 0.0
      |                  ELSE 1.0 - len(list_distinct(ls)) * 1.0 / len(ls) END, 6)
      |         AS dup_line_ratio
      |FROM l""".stripMargin

  /** PII pattern pass ([[TextQuality.redactPii]]) — same Java/RE2-portable
    * regexes, emails replaced before URLs.
    */
  val redactPiiSql: String = {
    val email = TextQuality.EmailPattern
    val url = TextQuality.UrlPattern
    s"""SELECT doc_id,
       |       len(regexp_extract_all(text, '$email')) AS n_emails,
       |       len(regexp_extract_all(text, '$url')) AS n_urls,
       |       md5(regexp_replace(regexp_replace(text, '$email', '[EMAIL]', 'g'),
       |                          '$url', '[URL]', 'g')) AS redacted_md5
       |FROM documents""".stripMargin
  }

  val assetMetaSql: String =
    """SELECT doc_id AS asset_id,
      |       CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |       octet_length(encode(text)) AS n_bytes,
      |       sha256(text) AS sha256,
      |       unicode(text) % 64 + 1 AS fake_width,
      |       unicode(substr(text, 2, 1)) % 64 + 1 AS fake_height
      |FROM documents""".stripMargin

  /** The [[graft.operators.Multimodal.FakeDecoder]] metadata stub in SQL.
    * Valid because the synthetic corpus is pure ASCII, so UTF-8 payload
    * bytes equal code points: the wrapping-64-bit rolling checksum
    * `ck = ck*31 + byte` folds in HUGEINT arithmetic mod 2^64 (seed
    * prepended — this DuckDB's list_reduce takes no initial value), then
    * maps back to the signed BIGINT Spark's Long wrap produces.
    */
  val decodedMetaSql: String = {
    val seed = 1125899906842597L
    val two64 = "18446744073709551616::HUGEINT"
    s"""WITH ck AS (
       |  SELECT doc_id,
       |         list_reduce(
       |           list_concat([$seed::HUGEINT],
       |             list_transform(
       |               list_filter(string_split(text, ''), c -> c <> ''),
       |               c -> unicode(c)::HUGEINT)),
       |           (acc, x) -> (acc * 31 + x) % $two64) AS raw
       |  FROM documents)
       |SELECT d.doc_id AS asset_id,
       |       CASE WHEN d.doc_id % 3 = 0 THEN 'image'
       |            WHEN d.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |       octet_length(encode(d.text)) AS n_bytes,
       |       CASE WHEN length(d.text) = 0 THEN 0
       |            ELSE (unicode(substr(d.text, 1, 1)) & 63) + 1 END AS width,
       |       CASE WHEN length(d.text) < 2 THEN 0
       |            ELSE (unicode(substr(d.text, 2, 1)) & 63) + 1 END AS height,
       |       CASE WHEN ck.raw >= 9223372036854775808::HUGEINT
       |            THEN (ck.raw - $two64)::BIGINT ELSE ck.raw::BIGINT END AS checksum
       |FROM documents d JOIN ck USING (doc_id)""".stripMargin
  }

  /** Exact multimodal dedup by decoded content identity
    * ([[graft.operators.Multimodal.exactAssetDups]], m6): the
    * [[decodedMetaSql]] checksum fold, grouped on (n_bytes, checksum),
    * min-id keeper per family.
    */
  /** The [[graft.operators.Multimodal.extractAudioMeta]] fake path in SQL
    * (m7): the synthetic corpus has no WAV payloads, so every audio asset
    * takes the deterministic byte-derived branch — pure integer
    * arithmetic over the first three (ASCII ⇒ byte = code point) payload
    * bytes, integer-division frame and duration math.
    */
  val audioMetaSql: String =
    """WITH fmt AS (
      |  SELECT doc_id,
      |         octet_length(encode(text)) AS n_bytes,
      |         CASE WHEN octet_length(encode(text)) < 3 THEN 0
      |              ELSE 8000 * (1 + (unicode(substr(text, 1, 1)) & 3)) END AS sample_rate,
      |         CASE WHEN octet_length(encode(text)) < 3 THEN 0
      |              ELSE 1 + (unicode(substr(text, 2, 1)) & 1) END AS channels,
      |         CASE WHEN octet_length(encode(text)) < 3 THEN 0
      |              ELSE 8 * (1 + (unicode(substr(text, 3, 1)) & 1)) END AS bits
      |  FROM documents WHERE doc_id % 3 = 1)
      |SELECT doc_id AS asset_id, 'audio' AS kind,
      |       n_bytes::BIGINT AS n_bytes,
      |       sample_rate::BIGINT AS sample_rate,
      |       channels::BIGINT AS channels,
      |       bits::BIGINT AS bits,
      |       (CASE WHEN channels = 0 THEN 0
      |             ELSE n_bytes // (channels * bits // 8) END)::BIGINT AS n_frames,
      |       (CASE WHEN sample_rate = 0 THEN 0
      |             ELSE (n_bytes // (channels * bits // 8)) * 1000 // sample_rate
      |        END)::BIGINT AS duration_ms
      |FROM fmt""".stripMargin

  val exactAssetDupsSql: String = {
    val seed = 1125899906842597L
    val two64 = "18446744073709551616::HUGEINT"
    s"""WITH ck AS (
       |  SELECT doc_id,
       |         list_reduce(
       |           list_concat([$seed::HUGEINT],
       |             list_transform(
       |               list_filter(string_split(text, ''), c -> c <> ''),
       |               c -> unicode(c)::HUGEINT)),
       |           (acc, x) -> (acc * 31 + x) % $two64) AS raw
       |  FROM documents),
       |meta AS (
       |  SELECT d.doc_id AS asset_id,
       |         CASE WHEN d.doc_id % 3 = 0 THEN 'image'
       |              WHEN d.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |         octet_length(encode(d.text)) AS n_bytes,
       |         CASE WHEN ck.raw >= 9223372036854775808::HUGEINT
       |              THEN (ck.raw - $two64)::BIGINT ELSE ck.raw::BIGINT END AS checksum
       |  FROM documents d JOIN ck USING (doc_id)),
       |fam AS (
       |  SELECT n_bytes, checksum, count(*) AS family_size,
       |         min(asset_id) AS keep_id
       |  FROM meta GROUP BY 1, 2)
       |SELECT m.asset_id, m.kind, m.n_bytes, m.checksum,
       |       f.family_size, f.keep_id,
       |       m.asset_id <> f.keep_id AS is_duplicate
       |FROM meta m JOIN fam f USING (n_bytes, checksum)""".stripMargin
  }

  val dailyCountsSql: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS date, event_type,
      |       count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Dense date spine ([[graft.streaming.EventStream.qDenseDailySeries]]). */
  val denseDailySeriesSql: String =
    """WITH b AS (
      |  SELECT min(date_trunc('day', ts)) AS d0, max(date_trunc('day', ts)) AS d1
      |  FROM events),
      |spine AS (
      |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d FROM b),
      |daily AS (
      |  SELECT date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS n,
      |         round(sum(value), 2) AS total_value
      |  FROM events WHERE event_type = 'purchase' AND value > 250 GROUP BY 1)
      |SELECT strftime(s.d, '%Y-%m-%d') AS date,
      |       coalesce(daily.n, 0) AS n,
      |       coalesce(daily.total_value, 0.0) AS total_value
      |FROM spine s LEFT JOIN daily ON s.d = daily.d""".stripMargin

  /** LOCF gap fill ([[graft.streaming.EventStream.qLocfFill]]): per-type
    * dense spine, sparse high-value daily totals (exact decimal sums),
    * `last_value IGNORE NULLS` carry-forward, 0 before first observation.
    */
  val locfFillSql: String =
    """WITH b AS (
      |  SELECT min(date_trunc('day', ts)) AS d0, max(date_trunc('day', ts)) AS d1
      |  FROM events),
      |spine AS (
      |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d FROM b),
      |types AS (
      |  SELECT DISTINCT event_type FROM events
      |  WHERE event_type IS NOT NULL AND event_type <> ''),
      |daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS d,
      |         CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS day_value
      |  FROM events WHERE value > 200 GROUP BY 1, 2),
      |g AS (
      |  SELECT t.event_type, s.d, daily.day_value
      |  FROM types t CROSS JOIN spine s
      |  LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = s.d)
      |SELECT event_type, strftime(d, '%Y-%m-%d') AS date, day_value,
      |       coalesce(last_value(day_value IGNORE NULLS) OVER (
      |         PARTITION BY event_type ORDER BY d
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS filled_value
      |FROM g""".stripMargin

  /** 7-day moving average ([[graft.streaming.EventStream.qMovingAvgDaily]]). */
  val movingAvgDailySql: String =
    """WITH d AS (
      |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS date, event_type,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT date, event_type, n,
      |       round(avg(n) OVER (PARTITION BY event_type ORDER BY date
      |                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
      |FROM d""".stripMargin

  /** EWMA smooth ([[graft.streaming.EventStream.qEwmaDaily]]): the same
    * date-sorted left fold, executed by `list_reduce` — element order and
    * op sequence match Spark's `aggregate` fold exactly, so the doubles
    * are bit-equal before the cosmetic 6-dp round.
    */
  val ewmaDailySql: String =
    """WITH d AS (
      |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS date,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT event_type,
      |             list(struct_pack(date := date, n := n) ORDER BY date) AS sr
      |      FROM d GROUP BY 1)
      |SELECT event_type, r.date AS date, r.n AS n, round(r.ewma, 6) AS ewma
      |FROM s, UNNEST(list_transform(range(1, len(sr) + 1), t -> struct_pack(
      |    date := sr[t].date, n := sr[t].n,
      |    ewma := list_reduce(list_transform(sr[1:t], e -> CAST(e.n AS DOUBLE)),
      |                        (acc, x) -> 0.5 * x + 0.5 * acc)))) AS u(r)""".stripMargin

  /** Conversion funnel ([[graft.operators.EventOps.funnel]]). */
  /** Power-user Pareto report
    * ([[graft.operators.EventOps.powerUserPareto]], e12): per activity
    * decile, exact-decimal value totals and event shares.
    */
  val powerUserParetoSql: String =
    """WITH pu AS (
      |  SELECT user_id, count(*) AS n_events,
      |         sum(CAST(value AS DECIMAL(18,2))) AS value
      |  FROM events GROUP BY 1),
      |dec AS (
      |  SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
      |         CAST(sum(n_events) AS BIGINT) AS n_events,
      |         CAST(round(sum(value), 2) AS DOUBLE) AS total_value
      |  FROM (SELECT *, ntile(10) OVER (ORDER BY n_events DESC, user_id)
      |          AS decile FROM pu)
      |  GROUP BY 1),
      |tot AS (SELECT sum(n_events) AS te FROM dec)
      |SELECT decile, n_users, n_events, total_value,
      |       round(n_events * 1.0 / te, 6) AS event_share,
      |       round(CAST(sum(n_events) OVER (ORDER BY decile) AS DOUBLE) / te, 6)
      |         AS cum_event_share
      |FROM dec, tot""".stripMargin

  val funnelSql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t_click
      |  FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t_purchase
      |  FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
      |SELECT step, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM (
      |  SELECT 'view' AS step, user_id FROM v
      |  UNION ALL SELECT 'view>click', user_id FROM c
      |  UNION ALL SELECT 'view>click>purchase', user_id FROM p)
      |GROUP BY step""".stripMargin

  /** Cohort retention ([[graft.operators.EventOps.retentionCohorts]]). */
  val retentionSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS day FROM events),
      |cohorts AS (SELECT user_id, min(day) AS cohort_day FROM active GROUP BY 1)
      |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_size,
      |       CAST(count(DISTINCT CASE WHEN day - cohort_day = 1 THEN user_id END)
      |            AS BIGINT) AS d1_returned,
      |       CAST(count(DISTINCT CASE WHEN day - cohort_day = 7 THEN user_id END)
      |            AS BIGINT) AS d7_returned
      |FROM active JOIN cohorts USING (user_id)
      |GROUP BY cohort_day""".stripMargin

  /** Sliding-window counts ([[graft.streaming.EventStream.qSlidingCounts]]):
    * manual 4-offset expansion of the 2h/30min window set.
    */
  val slidingCountsSql: String =
    """WITH w AS (
      |  SELECT e.event_type,
      |         to_timestamp(CAST(floor((epoch(e.ts) - o.off) / 7200) AS BIGINT) * 7200
      |                      + o.off) AS win_start
      |  FROM events e
      |  CROSS JOIN (SELECT unnest([0, 1800, 3600, 5400]) AS off) o)
      |SELECT strftime(win_start, '%Y-%m-%d %H:%M') AS win_start, event_type,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM w GROUP BY 1, 2""".stripMargin

  /** Props JSON field stats ([[graft.operators.EventOps.propsStats]]). */
  val propsStatsSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(count(k) AS BIGINT) AS n_with_k,
      |       round(avg(k), 6) AS avg_k,
      |       CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
      |FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events)
      |GROUP BY event_type""".stripMargin

  /** Phrase search over the positional index
    * ([[graft.operators.SearchIndex.phraseSearch]]): same tokenizer,
    * consecutive-position joins (DuckDB positions are 1-based, Spark's
    * 0-based — only position *differences* join, so the offset cancels).
    */
  def phraseSearchSql(phrase: Seq[String], k: Int = 100): String = {
    val joins = phrase.zipWithIndex.tail.map { case (w, i) =>
      s"JOIN p b$i ON b$i.doc_id = a.doc_id AND b$i.pos = a.p0 + $i AND b$i.tok = '$w'"
    }.mkString("\n       |  ")
    s"""WITH toksl AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |p AS (SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
       |      FROM toksl),
       |a AS (SELECT doc_id, pos AS p0 FROM p WHERE tok = '${phrase.head}'),
       |m AS (
       |  SELECT a.doc_id FROM a
       |  $joins)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
       |FROM m GROUP BY doc_id
       |ORDER BY n_occurrences DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Efraimidis–Spirakis weighted sample
    * ([[graft.operators.CorpusPrep.weightedSample]]): identical salted
    * md5-60 uniform, identical −ln(u)/w key rounded to 12 dp before the
    * rank (absorbs ln's last-ulp engine difference).
    */
  def weightedSampleSql(n: Int = 100): String =
    s"""WITH keyed AS (
       |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
       |         round(-ln((CAST(${md5Long60Sql("'graft-wsample-v1:' || doc_id")}
       |                         AS DOUBLE) + 1.0) / 1152921504606846976.0)
       |               / CAST(n_chars AS DOUBLE), 12) AS k
       |  FROM documents WHERE n_chars > 0),
       |top AS (SELECT * FROM keyed ORDER BY k, doc_id LIMIT $n)
       |SELECT CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS sample_rank,
       |       doc_id, weight, round(k, 6) AS es_key
       |FROM top""".stripMargin

  /** Bigram LM ([[graft.operators.TextQuality.bigramLogprob]]): same
    * count-weighted Σ cnt·ln p form as the x25 unigram oracle; unigram
    * denominators come from the full token stream (1-token docs included),
    * bigrams only from docs with ≥ 2 tokens.
    */
  val bigramLmSql: String =
    s"""WITH toksl AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |pos AS (SELECT doc_id, t, unnest(range(len(t) - 1)) AS i
       |        FROM toksl WHERE len(t) >= 2),
       |bgc AS (SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2, count(*) AS cnt
       |        FROM pos GROUP BY 1, 2, 3),
       |bim AS (SELECT w1, w2, sum(cnt) AS bcnt FROM bgc GROUP BY 1, 2),
       |uni AS (SELECT word, count(*) AS ucnt
       |        FROM (SELECT unnest(t) AS word FROM toksl) GROUP BY 1),
       |voc AS (SELECT count(*) AS n_vocab FROM uni)
       |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       |       round(sum(cnt * ln((bcnt + 1) / (ucnt + n_vocab))) / sum(cnt), 6)
       |         AS mean_logprob
       |FROM bgc JOIN bim USING (w1, w2) JOIN uni ON uni.word = bgc.w1, voc
       |GROUP BY doc_id""".stripMargin

  /** Interpolated bigram LM with absolute discounting
    * ([[graft.operators.TextQuality.interpBigramLogprob]], x59): the x43
    * CTE shapes plus the context marginal/continuation counts and the MLE
    * unigram; the p-expression mirrors the engine's operator order
    * left-to-right so both engines evaluate the identical double chain.
    */
  def interpBigramLmSql(discount: Double = 0.75): String =
    s"""WITH toksl AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |pos AS (SELECT doc_id, t, unnest(range(len(t) - 1)) AS i
       |        FROM toksl WHERE len(t) >= 2),
       |bgc AS (SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2, count(*) AS cnt
       |        FROM pos GROUP BY 1, 2, 3),
       |bim AS (SELECT w1, w2, sum(cnt) AS bcnt FROM bgc GROUP BY 1, 2),
       |ctx AS (SELECT w1, sum(bcnt) AS cxt, count(*) AS n1p FROM bim GROUP BY 1),
       |uni AS (SELECT word AS w2, count(*) AS ucnt
       |        FROM (SELECT unnest(t) AS word FROM toksl) GROUP BY 1),
       |tot AS (SELECT sum(ucnt) AS n_total FROM uni)
       |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       |       round(sum(cnt * ln(
       |         greatest(bcnt - $discount, 0.0) / cxt +
       |         $discount * n1p / cxt * (ucnt * 1.0 / n_total)
       |       )) / sum(cnt), 6) AS mean_logprob
       |FROM bgc JOIN bim USING (w1, w2) JOIN ctx USING (w1)
       |     JOIN uni USING (w2), tot
       |GROUP BY doc_id""".stripMargin

  /** MinHash dedup capstone ([[graft.operators.Dedup.minhashDedup]]): the
    * x3 pair query as the edge set, recursive-CTE transitive closure, per
    * doc the min reachable label (incl. self), family sizes, kept =
    * self-labeled — the same closure recipe as the n10 components oracle.
    */
  def minhashDedupSql(minEstJaccard: Double = 0.5): String =
    s"""WITH RECURSIVE mh AS (${minhashLshSql(minEstJaccard)}),
       |medges AS (SELECT id1 AS a, id2 AS b FROM mh
       |           UNION ALL SELECT id2, id1 FROM mh),
       |mreach(a, b) AS (
       |  SELECT a, b FROM medges
       |  UNION
       |  SELECT r.a, e.b FROM mreach r JOIN medges e ON r.b = e.a),
       |mcomp AS (
       |  SELECT d.doc_id,
       |         CAST(least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS BIGINT) AS family
       |  FROM documents d LEFT JOIN mreach r ON r.a = d.doc_id
       |  GROUP BY d.doc_id),
       |mfams AS (SELECT family, CAST(count(*) AS BIGINT) AS family_size
       |          FROM mcomp GROUP BY family)
       |SELECT doc_id, family, family_size, doc_id = family AS kept
       |FROM mcomp JOIN mfams USING (family)""".stripMargin

  /** Windowed low-likelihood spans
    * ([[graft.operators.TextQuality.worstSpans]], x79): per-position
    * add-one bigram log-probs (the x43 model), doc-partitioned sliding
    * mean rounded 6 dp, argmin with (mean, pos) tie-break.
    */
  def worstSpansSql(window: Int = 10): String =
    s"""WITH toksl AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |pr AS (
       |  SELECT doc_id, i AS pos, t[i+1] AS w1, t[i+2] AS w2
       |  FROM (SELECT doc_id, t, unnest(range(len(t) - 1)) AS i
       |        FROM toksl WHERE len(t) >= 2)),
       |bim AS (SELECT w1, w2, count(*) AS bcnt FROM pr GROUP BY 1, 2),
       |uni AS (SELECT word AS w1, count(*) AS ucnt
       |        FROM (SELECT unnest(t) AS word FROM toksl) GROUP BY 1),
       |voc AS (SELECT count(*) AS n_vocab FROM uni),
       |lp AS (
       |  SELECT pr.doc_id, pr.pos,
       |         ln((bcnt + 1) * 1.0 / (ucnt + n_vocab)) AS lp
       |  FROM pr JOIN bim USING (w1, w2) JOIN uni USING (w1), voc),
       |wm AS (
       |  SELECT doc_id, pos,
       |         count(*) OVER (PARTITION BY doc_id) AS n_bigrams,
       |         round(avg(lp) OVER (PARTITION BY doc_id ORDER BY pos
       |                 ROWS BETWEEN CURRENT ROW AND ${window - 1} FOLLOWING), 6)
       |           AS wmean
       |  FROM lp)
       |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       |       CAST(pos AS BIGINT) AS worst_start, wmean AS worst_mean
       |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |                                   ORDER BY wmean, pos) AS rk
       |      FROM wm WHERE pos <= n_bigrams - $window)
       |WHERE rk = 1""".stripMargin

  /** LSH band-bucket ledger ([[graft.operators.Dedup.lshBucketStats]],
    * x78): the sig/band chain, bucket sizes, size histogram with row and
    * candidate-pair accounting (integer arithmetic).
    */
  def lshBucketStatsSql(): String =
    s"""WITH $shingleCtes,
       |$sigBandCtes,
       |bsz AS (SELECT bidx, band_key, count(*) AS bucket_n
       |        FROM bands GROUP BY 1, 2)
       |SELECT bucket_n, CAST(count(*) AS BIGINT) AS n_buckets,
       |       CAST(bucket_n * count(*) AS BIGINT) AS n_rows,
       |       CAST(count(*) * bucket_n * (bucket_n - 1) // 2 AS BIGINT)
       |         AS candidate_pairs
       |FROM bsz GROUP BY bucket_n""".stripMargin

  /** MinHash estimator calibration
    * ([[graft.operators.Dedup.minhashCalibration]], x76): the x3 pairs as
    * a derived table, exact Jaccard only on those candidates, dyadic 1/8
    * estimate buckets.
    */
  def minhashCalibrationSql(minEstJaccard: Double = 0.5): String =
    s"""WITH $shingleCtes,
       |mh AS (SELECT id1, id2, est_jaccard FROM (${minhashLshSql(minEstJaccard)}) t),
       |sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
       |iv AS (SELECT m.id1, m.id2, count(*) AS inter
       |       FROM mh m JOIN ds a ON a.doc_id = m.id1
       |                 JOIN ds b ON b.doc_id = m.id2 AND b.h60 = a.h60
       |       GROUP BY 1, 2),
       |ex AS (
       |  SELECT m.est_jaccard,
       |         round(coalesce(iv.inter, 0) * 1.0 /
       |               (s1.n + s2.n - coalesce(iv.inter, 0)), 6) AS exact_j
       |  FROM mh m LEFT JOIN iv USING (id1, id2)
       |       JOIN sz s1 ON m.id1 = s1.doc_id
       |       JOIN sz s2 ON m.id2 = s2.doc_id)
       |SELECT floor(est_jaccard * 8) / 8 AS est_bucket,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       round(avg(est_jaccard), 6) AS mean_est,
       |       round(avg(exact_j), 6) AS mean_exact,
       |       round(avg(abs(est_jaccard - exact_j)), 6) AS mae
       |FROM ex GROUP BY 1""".stripMargin

  /** Family-size histogram + power-law MLE
    * ([[graft.operators.Dedup.familySizeStats]], x71): the x45 closure as
    * a derived table, one row per family, Clauset α̂ = 1 + n/Σln(sᵢ/0.5).
    */
  def familySizeStatsSql(minEstJaccard: Double = 0.5): String =
    s"""WITH fams AS (
       |  SELECT family, family_size FROM (${minhashDedupSql(minEstJaccard)})
       |  WHERE kept),
       |hist AS (SELECT family_size, count(*) AS n_families FROM fams GROUP BY 1),
       |mle AS (SELECT count(*) AS nf, sum(ln(family_size / 0.5)) AS logsum
       |        FROM fams)
       |SELECT h.family_size, CAST(h.n_families AS BIGINT) AS n_families,
       |       CAST(h.family_size * h.n_families AS BIGINT) AS n_docs,
       |       round(h.n_families * 1.0 / mle.nf, 6) AS family_share,
       |       round(1.0 + mle.nf / mle.logsum, 6) AS alpha_mle
       |FROM hist h, mle""".stripMargin

  /** x64 oracle ([[graft.operators.Dedup.exactSubstrSpans]]): same window
    * hashing (md5-60 over the joined K-token window), global count ≥ 2,
    * gaps-and-islands merge of consecutive duplicated window starts.
    */
  def exactSubstrSpansSql(windowTokens: Int = 20): String =
    s"""WITH toksl AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |tk AS (SELECT doc_id, t FROM toksl WHERE len(t) >= $windowTokens),
       |wins AS (
       |  SELECT doc_id, i AS pos,
       |         ${md5Long60Sql(s"array_to_string(t[i+1:i+$windowTokens], ' ')")} AS h
       |  FROM (SELECT doc_id, t, unnest(range(len(t) - $windowTokens + 1)) AS i
       |        FROM tk)),
       |dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) > 1),
       |flagged AS (SELECT doc_id, pos FROM wins JOIN dup USING (h)),
       |runs AS (SELECT doc_id, pos,
       |                pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS run
       |         FROM flagged)
       |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |       CAST(max(pos) - min(pos) + $windowTokens AS BIGINT) AS span_tokens,
       |       CAST(count(*) AS BIGINT) AS n_windows
       |FROM runs GROUP BY doc_id, run""".stripMargin

  /** Exact-substring decontamination
    * ([[graft.operators.Dedup.substrDecontaminate]], x77): x64's window
    * hashes, eval = doc_id % evalMod = 0, one-sided hash join, left join
    * back onto every train doc.
    */
  def substrDecontaminateSql(windowTokens: Int = 20, evalMod: Int = 20): String =
    s"""WITH toksl AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |tk AS (SELECT doc_id, t FROM toksl WHERE len(t) >= $windowTokens),
       |wins AS (
       |  SELECT doc_id, i AS pos,
       |         ${md5Long60Sql(s"array_to_string(t[i+1:i+$windowTokens], ' ')")} AS h
       |  FROM (SELECT doc_id, t, unnest(range(len(t) - $windowTokens + 1)) AS i
       |        FROM tk)),
       |ev AS (SELECT DISTINCT h FROM wins WHERE doc_id % $evalMod = 0),
       |hits AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
       |         CAST(min(pos) AS BIGINT) AS fp
       |  FROM wins JOIN ev USING (h)
       |  WHERE doc_id % $evalMod <> 0
       |  GROUP BY 1)
       |SELECT d.doc_id, coalesce(h.n, 0) AS n_contaminated_windows,
       |       coalesce(h.fp, -1) AS first_pos,
       |       h.doc_id IS NULL AS clean
       |FROM documents d LEFT JOIN hits h USING (doc_id)
       |WHERE d.doc_id % $evalMod <> 0""".stripMargin

  /** x65 oracle ([[graft.operators.Dedup.dupSpanStats]]): the x64 span
    * CTEs, a per-document interval union over (start, end) (running max of
    * previous ends marks island starts), then coverage joined to token
    * counts; zero-span documents report zero via the left join.
    */
  def dupSpanStatsSql(windowTokens: Int = 20,
                      dropThreshold: Double = 0.5): String =
    s"""WITH spans AS (${exactSubstrSpansSql(windowTokens)}),
       |iv AS (SELECT doc_id, span_start AS s,
       |              span_start + span_tokens - 1 AS e FROM spans),
       |pm AS (
       |  SELECT doc_id, s, e,
       |         CASE WHEN s > coalesce(max(e) OVER (
       |                PARTITION BY doc_id ORDER BY s
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |              THEN 1 ELSE 0 END AS fresh
       |  FROM iv),
       |isl AS (
       |  SELECT doc_id, s, e,
       |         sum(fresh) OVER (PARTITION BY doc_id ORDER BY s) AS island
       |  FROM pm),
       |cov AS (
       |  SELECT doc_id, CAST(sum(cov) AS BIGINT) AS dup_tokens
       |  FROM (SELECT doc_id, island, max(e) - min(s) + 1 AS cov
       |        FROM isl GROUP BY doc_id, island)
       |  GROUP BY doc_id),
       |toksl AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents)
       |SELECT tl.doc_id, CAST(len(tl.t) AS BIGINT) AS n_tokens,
       |       coalesce(c.dup_tokens, 0) AS dup_tokens,
       |       round(coalesce(c.dup_tokens, 0) * 1.0 /
       |             greatest(len(tl.t), 1), 6) AS dup_fraction,
       |       round(coalesce(c.dup_tokens, 0) * 1.0 /
       |             greatest(len(tl.t), 1), 6) >= $dropThreshold AS would_drop
       |FROM toksl tl LEFT JOIN cov c ON c.doc_id = tl.doc_id""".stripMargin

  /** x89 oracle ([[graft.operators.Dedup.removeDupSpans]]): the x64 span
    * CTEs, the x65 island merge kept as intervals, token positions
    * filtered by NOT EXISTS against the document's own islands, and the
    * survivors re-joined in position order.
    */
  def removeDupSpansSql(windowTokens: Int = 20): String =
    s"""WITH spans AS (${exactSubstrSpansSql(windowTokens)}),
       |iv AS (SELECT doc_id, span_start AS s,
       |              span_start + span_tokens - 1 AS e FROM spans),
       |pm AS (
       |  SELECT doc_id, s, e,
       |         CASE WHEN s > coalesce(max(e) OVER (
       |                PARTITION BY doc_id ORDER BY s
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |              THEN 1 ELSE 0 END AS fresh
       |  FROM iv),
       |isl AS (
       |  SELECT doc_id, s, e,
       |         sum(fresh) OVER (PARTITION BY doc_id ORDER BY s) AS island
       |  FROM pm),
       |islands AS (
       |  SELECT doc_id, min(s) AS i0, max(e) AS i1
       |  FROM isl GROUP BY doc_id, island),
       |toksl AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |tokpos AS (
       |  SELECT doc_id, i AS pos, t[i + 1] AS tok
       |  FROM (SELECT doc_id, t, unnest(range(len(t))) AS i FROM toksl)),
       |keptpos AS (
       |  SELECT tp.doc_id, tp.pos, tp.tok
       |  FROM tokpos tp
       |  WHERE NOT EXISTS (SELECT 1 FROM islands z
       |                    WHERE z.doc_id = tp.doc_id
       |                      AND tp.pos BETWEEN z.i0 AND z.i1)),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |         string_agg(tok, ' ' ORDER BY pos) AS clean_text
       |  FROM keptpos GROUP BY doc_id)
       |SELECT tl.doc_id, CAST(len(tl.t) AS BIGINT) AS n_tokens,
       |       coalesce(a.n_kept, 0) AS n_kept,
       |       coalesce(a.clean_text, '') AS clean_text
       |FROM toksl tl LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** w12 oracle ([[graft.streaming.DocStream.replayNearDupAdmission]]):
    * greedy near-dup admission in doc_id (arrival) order over the x3 LSH
    * pair graph — kept(d) ⟺ no KEPT earlier neighbor. This is the
    * lexicographically-first maximal independent set, computed as a
    * recursive wave: round 0 decides docs with no smaller neighbor; each
    * later round decides docs whose smaller neighbors all carry verdicts
    * (the working table re-emits the full verdict set each round — the
    * smtr state-carrying recipe — and stops when everyone is decided).
    * Deliberately NOT the x45 transitive-closure keep rule: an admission
    * stream cannot retro-reject, so chain middles are dropped and chain
    * ends both kept; on clique-shaped families the two coincide.
    */
  def nearDupAdmissionSql(minEstJaccard: Double = 0.5): String =
    s"""WITH RECURSIVE mh AS (${minhashLshSql(minEstJaccard)}),
       |tot AS (SELECT count(*) AS n FROM documents),
       |adm(it, doc_id, kept) AS (
       |  SELECT 0, d.doc_id, true FROM documents d
       |  WHERE NOT EXISTS (SELECT 1 FROM mh WHERE id2 = d.doc_id)
       |  UNION ALL
       |  (
       |    SELECT it + 1, doc_id, kept FROM adm
       |    WHERE (SELECT count(*) FROM adm) < (SELECT n FROM tot)
       |    UNION ALL
       |    SELECT (SELECT max(it) FROM adm) + 1, d.doc_id,
       |           NOT EXISTS (SELECT 1 FROM mh e JOIN adm a ON a.doc_id = e.id1
       |                       WHERE e.id2 = d.doc_id AND a.kept)
       |    FROM documents d
       |    WHERE NOT EXISTS (SELECT 1 FROM adm a2 WHERE a2.doc_id = d.doc_id)
       |      AND NOT EXISTS (SELECT 1 FROM mh e WHERE e.id2 = d.doc_id
       |                      AND e.id1 NOT IN (SELECT doc_id FROM adm))
       |  )
       |)
       |SELECT doc_id, kept FROM (
       |  SELECT doc_id, kept,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY it DESC) AS rn
       |  FROM adm)
       |WHERE rn = 1""".stripMargin

  /** x45b oracle ([[graft.operators.Dedup.qMinhashDedupIterative]]): the
    * x45 closure recipe over the planted-hot fixture. The engine runs it
    * with `maxCollectEdges = 0` — the distributed min-label-propagation
    * arm — and the answer must be byte-identical to this recursive-CTE
    * closure; the physical components path is invisible to the result.
    * The nested LSH WITH references the outer `corpus` CTE (DuckDB scopes
    * outer CTEs into nested WITH bodies).
    */
  def minhashDedupIterSql(minEstJaccard: Double = 0.5): String =
    s"""WITH RECURSIVE ${plantedCorpusCte()},
       |mh AS (${minhashLshSqlFrom(minEstJaccard, shingleCtesFrom("corpus"), "")}),
       |medges AS (SELECT id1 AS a, id2 AS b FROM mh
       |           UNION ALL SELECT id2, id1 FROM mh),
       |mreach(a, b) AS (
       |  SELECT a, b FROM medges
       |  UNION
       |  SELECT r.a, e.b FROM mreach r JOIN medges e ON r.b = e.a),
       |mcomp AS (
       |  SELECT d.doc_id,
       |         CAST(least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS BIGINT) AS family
       |  FROM corpus d LEFT JOIN mreach r ON r.a = d.doc_id
       |  GROUP BY d.doc_id),
       |mfams AS (SELECT family, CAST(count(*) AS BIGINT) AS family_size
       |          FROM mcomp GROUP BY family)
       |SELECT doc_id, family, family_size, doc_id = family AS kept
       |FROM mcomp JOIN mfams USING (family)""".stripMargin

  /** BPE merge learning oracle ([[graft.operators.Bpe.learnMerges]]):
    * the iterative argmax+merge loop unrolled as chained CTEs (the x39
    * recipe). Each step's state and argmax are referenced twice, so both
    * are MATERIALIZED — an inlining planner would otherwise expand the
    * chain 2^iters times. The merge pass is the same position-aware
    * whole-symbol fold as [[graft.operators.Bpe.mergePass]], expressed
    * with `list_reduce` (append `x` without a separator iff the
    * accumulator's last whole symbol is `a` and `x` is `b`); the
    * DESC/a/b argmax order is plain byte order on this corpus.
    */
  /** RAG capstone oracle ([[graft.operators.Rag.ragRetrieve]], x47): the
    * full chunk → hashed-TF-IDF embed → IVF retrieve → RRF pipeline
    * replayed in DuckDB — x18's window construction, the x39 hashing
    * trick lifted to dense vectors, the x14/x37 Lloyd chain trained over
    * the DERIVED chunk embeddings ([[lloydChain]]'s `v` source is
    * parameterized for exactly this), the n13 BM25 arm, and x44's RRF
    * fusion. Embedding coordinates round to 6 dp at construction on both
    * sides — that is what makes a trained-quantizer pipeline over derived
    * vectors hash-reproducible across engines.
    *
    * Every multiply-referenced stage is MATERIALIZED (r12): unlike the
    * raw-embeddings chains, the Lloyd base here is itself a 6-CTE derived
    * pipeline (chunk → count → IDF → hash-fold → densify), and with plain
    * CTEs DuckDB's inlining re-expands that pipeline under each of the
    * chain's references — the whole-oracle cost that made x47 the sf0.1
    * sweep's 122 s / OOM-adjacent outlier. The materialized frames are
    * all small (≈n_chunks rows of 64-double lists, 16-row centroid
    * tables), so pinning them trades MBs for the exponential
    * re-computation.
    */
  def ragRetrieveSql(query: String = graft.operators.SemanticSearch.DefaultQuery,
                     chunkSize: Int = 32, overlap: Int = 8, dim: Int = 64,
                     nCells: Int = 16, nprobe: Int = 4, iters: Int = 3,
                     poolK: Int = 100, topK: Int = 20, rrfK: Int = 60,
                     stride: Long = 100000L): String = {
    val step = chunkSize - overlap
    val qTerms = graft.operators.SemanticSearch.tokenize(query)
    val qcntVals = qTerms.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy(_._1)
      .map { case (t, c) => s"('$t', CAST($c AS BIGINT))" }.mkString(", ")
    val lexpool = NlpSql.bm25Sql(qTerms.distinct, topK = poolK)
    s"""WITH lexpool AS ($lexpool),
       |ctoks AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |chunks AS MATERIALIZED (
       |  SELECT doc_id * $stride + start // $step AS vec_id, doc_id AS label,
       |         t[start + 1 : start + $chunkSize] AS ctk
       |  FROM (SELECT doc_id, t, unnest(range(0, greatest(len(t), 1), $step)) AS start
       |        FROM ctoks)),
       |ccounts AS MATERIALIZED (
       |  SELECT vec_id, label, token, count(*) AS cnt
       |  FROM (SELECT vec_id, label, unnest(ctk) AS token FROM chunks)
       |  GROUP BY 1, 2, 3),
       |nch AS (SELECT count(*) AS n_chunks FROM chunks),
       |cidf AS MATERIALIZED (
       |  SELECT token, ln(n_chunks * 1.0 / (df + 1)) AS idf
       |  FROM (SELECT token, count(*) AS df FROM ccounts GROUP BY 1)
       |  CROSS JOIN nch),
       |cwj AS MATERIALIZED (
       |  SELECT vec_id, label,
       |         CAST(${md5Long60Sql("token")} % $dim AS INTEGER) AS j,
       |         round(sum(cnt * idf), 6) AS wj
       |  FROM ccounts JOIN cidf USING (token) GROUP BY 1, 2, 3),
       |cvec AS (
       |  SELECT vec_id, label, list(coalesce(wj, 0.0) ORDER BY j) AS v FROM (
       |    SELECT s.vec_id, s.label, s.j, w.wj
       |    FROM (SELECT vec_id, label, unnest(range(0, $dim)) AS j
       |          FROM (SELECT DISTINCT vec_id, label FROM cwj)) s
       |    LEFT JOIN cwj w ON w.vec_id = s.vec_id AND w.j = s.j)
       |  GROUP BY 1, 2),
       |cemb AS MATERIALIZED (SELECT vec_id, label, v FROM cvec
       |         WHERE list_max(list_transform(v, x -> abs(x))) > 0),
       |qcnt(token, cnt) AS (VALUES $qcntVals),
       |qwj AS (
       |  SELECT CAST(${md5Long60Sql("token")} % $dim AS INTEGER) AS j,
       |         round(sum(cnt * idf), 6) AS wj
       |  FROM qcnt JOIN cidf USING (token) GROUP BY 1),
       |qvec AS (
       |  SELECT list(coalesce(w.wj, 0.0) ORDER BY s.j) AS qv
       |  FROM (SELECT unnest(range(0, $dim)) AS j) s
       |  LEFT JOIN qwj w ON w.j = s.j),
       |${lloydChain(nCells, iters, dim, vSrc = "SELECT vec_id, label, v FROM cemb",
                     mat = true)},
       |${assignCte(s"c$iters", "fin", dim, mat = true)},
       |pr AS (
       |  SELECT cell FROM (
       |    SELECT c.cell, ${sqDist("q.qv", "c.c", dim)} AS dist
       |    FROM c$iters c CROSS JOIN qvec q)
       |  ORDER BY dist, cell LIMIT $nprobe),
       |cand AS (
       |  SELECT f.vec_id, x.label,
       |         round(list_cosine_similarity(f.v, q.qv), 6) AS sim
       |  FROM fin f JOIN v x USING (vec_id) CROSS JOIN qvec q
       |  WHERE f.cell IN (SELECT cell FROM pr)),
       |r AS (SELECT *, row_number() OVER (ORDER BY sim DESC, vec_id) AS rank FROM cand),
       |semdocs AS (SELECT label AS doc_id, max(sim) AS best_sim
       |            FROM r WHERE rank <= $poolK GROUP BY 1),
       |sem AS (SELECT doc_id,
       |               CAST(row_number() OVER (ORDER BY best_sim DESC, doc_id) AS BIGINT) AS sem_rank
       |        FROM semdocs),
       |lex AS (SELECT doc_id,
       |               CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rank
       |        FROM lexpool WHERE bm25 > 0)
       |SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
       |       round(coalesce(1.0 / CAST($rrfK + l.lex_rank AS DOUBLE), 0.0) +
       |             coalesce(1.0 / CAST($rrfK + s.sem_rank AS DOUBLE), 0.0), 6)
       |         AS rrf_score
       |FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
       |ORDER BY rrf_score DESC, doc_id LIMIT $topK""".stripMargin
  }

  /** Product-quantization oracle ([[graft.operators.VectorSearch.pqCodes]],
    * x50): m independent Lloyd chains, one per contiguous subvector slice,
    * each the same 6-dp-rounded trainer as [[lloydChain]] but with
    * prefixed CTE names (MATERIALIZED — the chains are referenced twice
    * per level and four run side by side); codes join back per vec_id and
    * the reconstruction MSE sums the per-subspace assignment distances.
    */
  def pqCodesSql(m: Int = 4, k: Int = 16, iters: Int = 3,
                 dim: Int = 64): String = {
    val subDim = dim / m
    val joins = (0 until m).map(s => s"JOIN s${s}fin f$s USING (vec_id)").mkString("\n")
    val codes = (0 until m).map(s => s"f$s.cell AS code$s").mkString(", ")
    val errs = (0 until m).map(s => s"f$s.dist").mkString(" + ")
    s"""WITH v AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |${pqChains(m, k, iters, subDim)}
       |SELECT b.vec_id, b.label, $codes,
       |       round(($errs) / $dim, 6) AS mse
       |FROM v b
       |$joins""".stripMargin
  }

  /** PQ-ADC top-k oracle ([[graft.operators.VectorSearch.pqAdcTopK]],
    * x51): the same per-subspace chains, a per-subspace lookup table of
    * query-subvector → codeword squared distances, and the scan as m
    * LUT joins on the code.
    */
  def pqAdcSql(queryVecId: Long = 0L, kTop: Int = 10, m: Int = 4,
               k: Int = 16, iters: Int = 3, dim: Int = 64): String = {
    val subDim = dim / m
    val luts = (0 until m).map { s =>
      val lo = s * subDim + 1
      val hi = (s + 1) * subDim
      s"""qs$s AS (SELECT v[$lo : $hi] AS v FROM v WHERE vec_id = $queryVecId),
         |lut$s AS (SELECT c.cell, ${sqDist("q.v", "c.c", subDim)} AS d
         |          FROM s${s}c$iters c CROSS JOIN qs$s q)""".stripMargin
    }.mkString(",\n")
    val joins = (0 until m).map(s =>
      s"JOIN s${s}fin f$s USING (vec_id) JOIN lut$s l$s ON l$s.cell = f$s.cell")
      .mkString("\n")
    val dists = (0 until m).map(s => s"l$s.d").mkString(" + ")
    s"""WITH v AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |${pqChains(m, k, iters, subDim)},
       |$luts
       |SELECT b.vec_id, b.label, round($dists, 6) AS adc_dist
       |FROM v b
       |$joins
       |WHERE b.vec_id <> $queryVecId
       |ORDER BY adc_dist, b.vec_id LIMIT $kTop""".stripMargin
  }

  /** PQ-ADC + exact-rerank refine oracle
    * ([[graft.operators.VectorSearch.pqAdcRefineTopK]], x88): the x51
    * query verbatim over-fetched to `shortlist` rows as a nested-WITH CTE
    * (the ragRetrieveSql composition pattern), joined back to the raw
    * vectors for the exact squared distance to the query, re-sorted.
    */
  def pqAdcRefineSql(queryVecId: Long = 0L, kTop: Int = 10,
                     shortlist: Int = 50, m: Int = 4, k: Int = 16,
                     iters: Int = 3, dim: Int = 64): String = {
    val short = pqAdcSql(queryVecId, shortlist, m, k, iters, dim)
    s"""WITH short AS ($short),
       |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |qv AS (SELECT v FROM ev WHERE vec_id = $queryVecId)
       |SELECT s.vec_id, s.label, s.adc_dist,
       |       round(${sqDist("e.v", "q.v", dim)}, 6) AS exact_dist
       |FROM short s JOIN ev e USING (vec_id) CROSS JOIN qv q
       |ORDER BY exact_dist, s.vec_id LIMIT $kTop""".stripMargin
  }

  /** IVF-PQ oracle ([[graft.operators.VectorSearch.ivfPqTopK]], x52): the
    * x14 coarse Lloyd chain, residuals vs the assigned centroid, the m PQ
    * chains retargeted at the residual CTE, probe cells by exact
    * query→centroid distance, one ADC LUT per cell (the query residual is
    * cell-dependent), and the scan as code-joins restricted to probed
    * cells.
    */
  def ivfPqSql(queryVecId: Long = 0L, kTop: Int = 10, nCells: Int = 16,
               cIters: Int = 5, m: Int = 4, k: Int = 16, iters: Int = 3,
               nprobe: Int = 4, dim: Int = 64): String = {
    val subDim = dim / m
    val resExpr = s"list_transform(range(1, ${dim + 1}), i -> a.v[i] - c.c[i])"
    val rqExpr = s"list_transform(range(1, ${dim + 1}), i -> q.v[i] - c.c[i])"
    val luts = (0 until m).map { s =>
      val lo = s * subDim + 1
      val hi = (s + 1) * subDim
      s"""rqs$s AS (SELECT cell, v[$lo : $hi] AS v FROM rq),
         |lut$s AS (SELECT r.cell AS qcell, b.cell AS code,
         |                 ${sqDist("r.v", "b.c", subDim)} AS d
         |          FROM rqs$s r CROSS JOIN s${s}c$iters b)""".stripMargin
    }.mkString(",\n")
    val joins = (0 until m).map(s =>
      s"JOIN s${s}fin f$s ON f$s.vec_id = a.vec_id " +
        s"JOIN lut$s l$s ON l$s.qcell = a.cell AND l$s.code = f$s.cell")
      .mkString("\n")
    val dists = (0 until m).map(s => s"l$s.d").mkString(" + ")
    s"""WITH ${lloydChain(nCells, cIters, dim, mat = true)},
       |${assignCte(s"c$cIters", "asg", dim, mat = true)},
       |res AS MATERIALIZED (
       |  SELECT a.vec_id, a.cell, $resExpr AS v
       |  FROM asg a JOIN c$cIters c USING (cell)),
       |${pqChains(m, k, iters, subDim, src = "res")},
       |qv AS (SELECT v FROM v WHERE vec_id = $queryVecId),
       |pr AS (
       |  SELECT cell FROM (
       |    SELECT c.cell, ${sqDist("q.v", "c.c", dim)} AS d
       |    FROM c$cIters c CROSS JOIN qv q)
       |  ORDER BY d, cell LIMIT $nprobe),
       |rq AS (
       |  SELECT c.cell, $rqExpr AS v
       |  FROM c$cIters c CROSS JOIN qv q),
       |$luts
       |SELECT a.vec_id, b.label, a.cell, round($dists, 6) AS adc_dist
       |FROM asg a JOIN v b ON b.vec_id = a.vec_id
       |$joins
       |WHERE a.cell IN (SELECT cell FROM pr) AND a.vec_id <> $queryVecId
       |ORDER BY adc_dist, a.vec_id LIMIT $kTop""".stripMargin
  }

  /** The m prefixed per-subspace Lloyd chains + final assignments
    * (`s{s}v → s{s}c0 → s{s}a0/c1 … → s{s}fin`), composing over a `v`
    * CTE of `(vec_id, …, v)`.
    */
  private def pqChains(m: Int, k: Int, iters: Int, subDim: Int,
                       src: String = "v"): String = {
    def chain(s: Int): String = {
      val lo = s * subDim + 1
      val hi = (s + 1) * subDim
      val p = s"s$s"
      def assign(cTab: String, aTab: String): String =
        s"""$aTab AS MATERIALIZED (
           |  SELECT vec_id, v, cell, dist FROM (
           |    SELECT x.vec_id, x.v, c.cell, ${sqDist("x.v", "c.c", subDim)} AS dist,
           |           row_number() OVER (PARTITION BY x.vec_id
           |             ORDER BY ${sqDist("x.v", "c.c", subDim)}, c.cell) AS rk
           |    FROM ${p}v x CROSS JOIN $cTab c)
           |  WHERE rk = 1)""".stripMargin
      def recompute(aTab: String, cPrev: String, cNext: String): String =
        s"""$cNext AS MATERIALIZED (
           |  SELECT cell, list(round(mu, 6) ORDER BY d) AS c FROM (
           |    SELECT cell, d, avg(val) AS mu FROM (
           |      SELECT cell, unnest(v) AS val, generate_subscripts(v, 1) AS d
           |      FROM $aTab)
           |    GROUP BY cell, d)
           |  GROUP BY cell
           |  UNION ALL
           |  SELECT cell, c FROM $cPrev
           |  WHERE cell NOT IN (SELECT cell FROM $aTab GROUP BY cell))""".stripMargin
      val iterations = (0 until iters).flatMap { t =>
        Seq(assign(s"${p}c$t", s"${p}a$t"), recompute(s"${p}a$t", s"${p}c$t", s"${p}c${t + 1}"))
      }.mkString(",\n")
      s"""${p}v AS MATERIALIZED (
         |  SELECT vec_id, v[$lo : $hi] AS v FROM $src),
         |${p}c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
         |         v AS c
         |  FROM (SELECT vec_id, v FROM ${p}v ORDER BY vec_id LIMIT $k)),
         |$iterations,
         |${p}fin AS MATERIALIZED (${finalAssign(p, subDim, iters)})""".stripMargin
    }
    (0 until m).map(chain).mkString(",\n")
  }

  private def finalAssign(p: String, subDim: Int, iters: Int): String =
    s"""SELECT vec_id, cell, dist FROM (
       |    SELECT x.vec_id, c.cell, ${sqDist("x.v", "c.c", subDim)} AS dist,
       |           row_number() OVER (PARTITION BY x.vec_id
       |             ORDER BY ${sqDist("x.v", "c.c", subDim)}, c.cell) AS rk
       |    FROM ${p}v x CROSS JOIN ${p}c$iters c)
       |  WHERE rk = 1""".stripMargin

  /** The shared learned-merge CTE chain (toks → words → st0 → bp1/st1 …
    * bpN/stN): `toks` carries `(doc_id, word)` so consumers can join the
    * final segmented state back to documents; the training CTEs group it
    * away. Both [[bpeMergesSql]] (the merge table, x46) and
    * [[bpeSegmentSql]] (the applied tokenizer, x48) compose over this.
    */
  private def bpeChain(numMerges: Int): String = {
    val iterCtes = (1 to numMerges).map { k =>
      val prev = s"st${k - 1}"
      s"""bp$k AS MATERIALIZED (
         |  SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pair_count FROM (
         |    SELECT syms[i] AS a, syms[i + 1] AS b, cnt FROM (
         |      SELECT cnt, syms, unnest(range(1, len(syms))) AS i
         |      FROM (SELECT cnt, string_split(sym, '  ') AS syms FROM $prev)))
         |  GROUP BY a, b ORDER BY pair_count DESC, a, b LIMIT 1),
         |st$k AS MATERIALIZED (
         |  SELECT word, cnt,
         |         list_reduce(string_split(sym, '  '),
         |           (acc, x) -> CASE WHEN x = m.b AND (acc = m.a OR ends_with(acc, '  ' || m.a))
         |                            THEN acc || x ELSE acc || '  ' || x END) AS sym
         |  FROM $prev, bp$k m)""".stripMargin
    }.mkString(",\n")
    s"""toks AS (
       |  SELECT doc_id, unnest(
       |    list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                w -> w NOT IN ($stop))) AS word
       |  FROM documents),
       |words AS (SELECT word, count(*) AS cnt FROM toks GROUP BY 1),
       |st0 AS MATERIALIZED (
       |  SELECT word, cnt,
       |         array_to_string(regexp_extract_all(word, '.'), '  ') || '  </w>' AS sym
       |  FROM words),
       |$iterCtes""".stripMargin
  }

  def bpeMergesSql(numMerges: Int = 10): String = {
    val selects = (1 to numMerges).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS "rank", a AS merge_left, b AS merge_right, pair_count FROM bp$k"""
    }.mkString("\nUNION ALL\n")
    s"""WITH ${bpeChain(numMerges)}
       |$selects""".stripMargin
  }

  /** Applied-tokenizer oracle ([[graft.operators.Bpe.segmentCorpus]], x48):
    * the final merge state st$numMerges holds each vocabulary word's
    * segmentation; documents join it on the word key and aggregate
    * per-document word/subword counts plus the fertility ratio (6 dp on a
    * ratio of exact integers — engine-stable).
    */
  def bpeSegmentSql(numMerges: Int = 10): String =
    s"""WITH ${bpeChain(numMerges)},
       |seg AS (
       |  SELECT word, CAST(len(string_split(sym, '  ')) AS BIGINT) AS n_pieces
       |  FROM st$numMerges)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(n_pieces) AS BIGINT) AS n_subwords,
       |       round(sum(n_pieces) * 1.0 / count(*), 6) AS fertility
       |FROM toks JOIN seg USING (word)
       |GROUP BY doc_id""".stripMargin

  /** WordPiece vocab/segment CTEs
    * ([[graft.operators.Wordpiece]], x72/x73): substring frequencies over
    * the word table, (freq DESC, piece) ranking with the single-char
    * backstop, and the greedy longest-match segmentation as a RECURSIVE
    * CTE — each step left-joins the vocabulary once per candidate length
    * ($maxLen..2) against the substring at the current position and
    * advances by the longest hit (1 = the char backstop), so pieces per
    * word = recursion rows − 1.
    *
    * Relational on purpose: the natural `list_reduce` fold hits a
    * nondeterministic DuckDB 1.0.0 executor bug — under this query shape
    * a row's fold result could be swapped with another row's ('small'
    * receiving 'group''s segmentation), even with every input carried
    * inside the accumulator struct. The recursive join form has no
    * lambdas and replays the identical greedy semantics.
    */
  /** toks/words/substring-frequency/vocab CTEs shared by the WordPiece
    * (x72/x73) and unigram-LM (x74) oracles.
    */
  private def wpVocabCtes(vocabSize: Int, maxLen: Int): String = {
    val subExpr =
      s"""flatten(list_transform(range(1, len(word) + 1), s ->
         |  list_transform(range(1, least($maxLen, len(word) - s + 1) + 1),
         |    l -> word[s:s+l-1])))""".stripMargin
    s"""toks AS (
       |  SELECT doc_id, unnest(
       |    list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                w -> w NOT IN ($stop))) AS word
       |  FROM documents),
       |words AS (SELECT word, count(*) AS cnt FROM toks GROUP BY 1),
       |subpieces AS (
       |  SELECT cnt, unnest($subExpr) AS piece FROM words),
       |ranked AS (
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq,
       |         row_number() OVER (ORDER BY sum(cnt) DESC, piece) AS rnk
       |  FROM subpieces GROUP BY piece),
       |vocab AS (
       |  SELECT piece, freq, TRUE AS in_top FROM ranked WHERE rnk <= $vocabSize
       |  UNION ALL
       |  SELECT piece, freq, FALSE FROM ranked
       |  WHERE len(piece) = 1 AND rnk > $vocabSize)""".stripMargin
  }

  private def wordpieceCtes(vocabSize: Int, maxLen: Int): String = {
    val joins = (maxLen to 2 by -1).map(l =>
      s"LEFT JOIN vocab v$l ON len(w.word) - w.pos >= $l " +
        s"AND v$l.piece = w.word[w.pos+1:w.pos+$l]").mkString("\n  ")
    val step = "COALESCE(" + (maxLen to 2 by -1)
      .map(l => s"CASE WHEN v$l.piece IS NOT NULL THEN $l END")
      .mkString(", ") + ", 1)"
    s"""${wpVocabCtes(vocabSize, maxLen)},
       |wseg(word, pos) AS (
       |  SELECT word, 0 FROM words
       |  UNION ALL
       |  SELECT w.word, w.pos + $step
       |  FROM wseg w
       |  $joins
       |  WHERE w.pos < len(w.word)),
       |segn AS (
       |  SELECT word, CAST(count(*) - 1 AS BIGINT) AS n_pieces
       |  FROM wseg GROUP BY word)""".stripMargin
  }

  def wordpieceVocabSql(vocabSize: Int = graft.operators.Wordpiece.DefaultVocab,
                        maxLen: Int = graft.operators.Wordpiece.MaxPieceLen): String =
    s"""WITH RECURSIVE ${wordpieceCtes(vocabSize, maxLen)}
       |SELECT piece, freq, in_top FROM vocab""".stripMargin

  def wordpieceSegmentSql(vocabSize: Int = graft.operators.Wordpiece.DefaultVocab,
                          maxLen: Int = graft.operators.Wordpiece.MaxPieceLen): String =
    s"""WITH RECURSIVE ${wordpieceCtes(vocabSize, maxLen)}
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(n_pieces) AS BIGINT) AS n_subwords,
       |       round(sum(n_pieces) * 1.0 / count(*), 6) AS fertility
       |FROM toks JOIN segn USING (word)
       |GROUP BY doc_id""".stripMargin

  /** Unigram-LM Viterbi oracle ([[graft.operators.UnigramLm]], x74): the
    * shared vocab CTEs, logp = ln(freq/Σfreq), and the DP unrolled one
    * MATERIALIZED CTE per consumed-prefix length (the Lloyd-chain recipe —
    * recursive CTEs can't take the per-word argmax). dp_i holds, for every
    * word of length ≥ i, the best (score, −n_pieces) over segmentations of
    * its first i characters; candidates come from dp_(i−l) + logp of the
    * length-l piece ending at i, tie-break (score DESC, negn DESC) ==
    * Spark's lexicographic struct max.
    */
  /** The unrolled Viterbi DP chain over CTE `wl(word, cnt)` under model
    * CTE `model(piece, logp)`: `${p}dp0..${p}dp$maxWordLen` plus
    * `${p}fin(word, score, negn)` — one MATERIALIZED CTE per
    * consumed-prefix length (the Lloyd-chain recipe), tie-break
    * (score DESC, negn DESC) == Spark's lexicographic struct max.
    */
  private def viterbiDpChain(p: String, model: String, maxLen: Int,
                             maxWordLen: Int): String = {
    val dpCtes = (1 to maxWordLen).map { i =>
      val arms = (1 to math.min(maxLen, i)).map { l =>
        s"""SELECT d.word, d.score + v.logp AS score, d.negn - 1 AS negn
           |      FROM ${p}dp${i - l} d JOIN $model v ON v.piece = d.word[${i - l + 1}:$i]
           |      WHERE len(d.word) >= $i""".stripMargin
      }.mkString("\n      UNION ALL\n      ")
      s"""${p}dp$i AS MATERIALIZED (
         |  SELECT word, score, negn FROM (
         |    SELECT word, score, negn,
         |           row_number() OVER (PARTITION BY word
         |                              ORDER BY score DESC, negn DESC) AS rk
         |    FROM (
         |      $arms))
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val finArms = (1 to maxWordLen).map(i =>
      s"SELECT word, score, negn FROM ${p}dp$i WHERE len(word) = $i")
      .mkString("\n  UNION ALL\n  ")
    s"""${p}dp0 AS (SELECT word, CAST(0.0 AS DOUBLE) AS score, 0 AS negn FROM wl),
       |$dpCtes,
       |${p}fin AS (
       |  $finArms)""".stripMargin
  }

  def unigramViterbiSql(vocabSize: Int = graft.operators.Wordpiece.DefaultVocab,
                        maxLen: Int = graft.operators.Wordpiece.MaxPieceLen,
                        maxWordLen: Int = graft.operators.UnigramLm.MaxWordLen): String =
    s"""WITH ${wpVocabCtes(vocabSize, maxLen)},
       |vocabp AS (
       |  SELECT piece, ln(freq * 1.0 / (SELECT sum(freq) FROM vocab)) AS logp
       |  FROM vocab),
       |wl AS (SELECT word, cnt FROM words WHERE len(word) <= $maxWordLen),
       |${viterbiDpChain("", "vocabp", maxLen, maxWordLen)}
       |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(-f.negn) AS BIGINT) AS n_subwords,
       |       round(sum(-f.negn) * 1.0 / count(*), 6) AS fertility,
       |       round(sum(f.score) / count(*), 6) AS avg_logprob
       |FROM toks t JOIN fin f USING (word)
       |GROUP BY t.doc_id""".stripMargin

  /** Hard-EM step oracle ([[graft.operators.UnigramLm.emStep]], x80): the
    * seeded chain, a RECURSIVE backwalk over the union of its dp levels
    * (per step, six vocab/dp left-join probes pick the SMALLEST piece
    * length whose candidate equals dp[pos] bit-for-bit — the engine's
    * tie-break), the recounted-MLE model, the second chain, one summary
    * row per iteration.
    */
  def emStepSql(vocabSize: Int = graft.operators.Wordpiece.DefaultVocab,
                maxLen: Int = graft.operators.Wordpiece.MaxPieceLen,
                maxWordLen: Int = graft.operators.UnigramLm.MaxWordLen): String = {
    val dpAllArms = (0 to maxWordLen).map(i =>
      s"SELECT word, $i AS i, score, negn FROM adp$i")
      .mkString("\n  UNION ALL\n  ")
    val probes = (1 to maxLen).map { l =>
      s"""LEFT JOIN vocabp v$l ON b.pos >= $l
         |       AND v$l.piece = b.word[b.pos-$l+1:b.pos]
         |  LEFT JOIN adpAll q$l ON q$l.word = b.word AND q$l.i = b.pos - $l
         |       AND q$l.score + v$l.logp = cur.score
         |       AND q$l.negn - 1 = cur.negn""".stripMargin
    }.mkString("\n  ")
    val pick = "COALESCE(" + (1 to maxLen)
      .map(l => s"CASE WHEN q$l.i IS NOT NULL THEN $l END").mkString(", ") + ")"
    def summary(iter: Int, fin: String): String =
      s"""SELECT CAST($iter AS BIGINT) AS iteration,
         |       CAST(sum(w.cnt) AS BIGINT) AS n_words,
         |       CAST(sum(w.cnt * -f.negn) AS BIGINT) AS n_subwords,
         |       round(sum(w.cnt * -f.negn) * 1.0 / sum(w.cnt), 6) AS fertility,
         |       round(sum(w.cnt * f.score), 4) AS total_loglik
         |FROM $fin f JOIN wl w USING (word)""".stripMargin
    s"""WITH RECURSIVE ${wpVocabCtes(vocabSize, maxLen)},
       |vocabp AS (
       |  SELECT piece, ln(freq * 1.0 / (SELECT sum(freq) FROM vocab)) AS logp
       |  FROM vocab),
       |wl AS (SELECT word, cnt FROM words WHERE len(word) <= $maxWordLen),
       |${viterbiDpChain("a", "vocabp", maxLen, maxWordLen)},
       |adpAll AS MATERIALIZED (
       |  $dpAllArms),
       |bw(word, pos, piece) AS (
       |  SELECT word, len(word), CAST(NULL AS VARCHAR) FROM wl
       |  UNION ALL
       |  SELECT b.word, b.pos - $pick,
       |         b.word[b.pos - $pick + 1 : b.pos]
       |  FROM bw b
       |  JOIN adpAll cur ON cur.word = b.word AND cur.i = b.pos
       |  $probes
       |  WHERE b.pos > 0),
       |cnt2 AS MATERIALIZED (
       |  -- MATERIALIZED is load-bearing: chain B references the model in
       |  -- every join arm, and an inlined CTE would re-run the recursive
       |  -- backwalk once per arm
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq
       |  FROM bw JOIN wl USING (word)
       |  WHERE piece IS NOT NULL GROUP BY 1),
       |tot2 AS MATERIALIZED (SELECT sum(freq) AS total FROM cnt2),
       |vocabp2 AS MATERIALIZED (SELECT piece, ln(freq * 1.0 / total) AS logp
       |                         FROM cnt2, tot2),
       |${viterbiDpChain("b", "vocabp2", maxLen, maxWordLen)}
       |${summary(0, "afin")}
       |UNION ALL
       |${summary(1, "bfin")}""".stripMargin
  }

  /** Daily-ingest admission capstone
    * ([[graft.operators.Pipeline.qIngestPipeline]], p4): the x10 quality
    * formula, the x66 one-sided probe as a derived table, and the x1
    * digest families within the delta; verdict = first failing gate.
    */
  def ingestPipelineSql(deltaMod: Int = 5,
                        qualityThreshold: Double = 0.5): String = {
    val d = deltaMod - 1
    s"""WITH q AS ($qualitySql),
       |inc AS (SELECT doc_id, n_index_matches
       |        FROM (${incrementalDedupSql(deltaMod)}) t),
       |dig AS (SELECT doc_id, md5(text) AS digest FROM documents
       |        WHERE doc_id % $deltaMod = $d),
       |keepers AS (SELECT digest, min(doc_id) AS exact_keep_id
       |            FROM dig GROUP BY 1),
       |base AS (
       |  SELECT g.doc_id, q.quality, i.n_index_matches, k.exact_keep_id,
       |         CASE WHEN q.quality < $qualityThreshold THEN 'low_quality'
       |              WHEN i.n_index_matches > 0 THEN 'index_duplicate'
       |              WHEN g.doc_id <> k.exact_keep_id THEN 'delta_exact_duplicate'
       |              ELSE 'admitted' END AS verdict
       |  FROM dig g
       |  JOIN q ON g.doc_id = q.doc_id
       |  JOIN inc i ON g.doc_id = i.doc_id
       |  JOIN keepers k USING (digest))
       |SELECT doc_id, quality, n_index_matches, exact_keep_id, verdict,
       |       verdict = 'admitted' AS admitted
       |FROM base""".stripMargin
  }

  /** Tokenizer bake-off ([[graft.operators.UnigramLm.tokenizerReport]],
    * x75): the three segmenter oracles embedded as derived tables, one
    * corpus-level summary row each.
    */
  def tokenizerReportSql(): String = {
    def arm(name: String, sql: String): String =
      s"""SELECT '$name' AS tokenizer,
         |       CAST(sum(n_words) AS BIGINT) AS n_words,
         |       CAST(sum(n_subwords) AS BIGINT) AS n_subwords,
         |       round(sum(n_subwords) * 1.0 / sum(n_words), 6) AS fertility
         |FROM (
         |$sql
         |)""".stripMargin
    s"""${arm("bpe", bpeSegmentSql())}
       |UNION ALL
       |${arm("wordpiece", wordpieceSegmentSql())}
       |UNION ALL
       |${arm("unigram", unigramViterbiSql())}""".stripMargin
  }

  /** KMV distinct sketch ([[graft.operators.Sketches.kmvShingleDistinct]],
    * x56): per-source bottom-k over the shared distinct-shingle-hash set,
    * estimate (k−1)/u₍k₎ with u₍k₎ = h₍k₎/2^60, exact when the group is
    * smaller than k.
    */
  def kmvShingleDistinctSql(k: Int = graft.operators.Sketches.DefaultK): String =
    s"""WITH $shingleCtes,
       |pairs AS (SELECT DISTINCT d.source, s.h60
       |          FROM ds s JOIN documents d USING (doc_id)),
       |rk AS (SELECT source, h60,
       |              row_number() OVER (PARTITION BY source ORDER BY h60) AS r
       |       FROM pairs),
       |sk AS (SELECT source, count(*) AS n_kept, max(h60) AS hk
       |       FROM rk WHERE r <= $k GROUP BY 1),
       |ex AS (SELECT source, count(*) AS n_distinct FROM pairs GROUP BY 1),
       |est AS (
       |  SELECT sk.source, CAST(ex.n_distinct AS BIGINT) AS n_distinct,
       |         CAST(sk.n_kept AS BIGINT) AS n_kept,
       |         round(CASE WHEN sk.n_kept < $k THEN sk.n_kept * 1.0
       |                    ELSE ($k - 1) * 1.0 /
       |                         (sk.hk * 1.0 / 1152921504606846976.0) END,
       |               4) AS est_distinct
       |  FROM sk JOIN ex USING (source))
       |SELECT source, n_distinct, n_kept, est_distinct,
       |       round(abs(est_distinct - n_distinct) / n_distinct, 4) AS rel_err
       |FROM est""".stripMargin

  /** Streaming KMV sketch replay
    * ([[graft.streaming.DocStream.kmvDistinctStream]], w13): the x56
    * estimator columns only — the stream never sees the exact distinct
    * count, but KMV is set-based so its estimate equals the batch one.
    */
  def kmvStreamSql(k: Int = graft.operators.Sketches.DefaultK): String =
    s"""WITH $shingleCtes,
       |pairs AS (SELECT DISTINCT d.source, s.h60
       |          FROM ds s JOIN documents d USING (doc_id)),
       |rk AS (SELECT source, h60,
       |              row_number() OVER (PARTITION BY source ORDER BY h60) AS r
       |       FROM pairs),
       |sk AS (SELECT source, count(*) AS n_kept, max(h60) AS hk
       |       FROM rk WHERE r <= $k GROUP BY 1)
       |SELECT source, CAST(n_kept AS BIGINT) AS n_kept,
       |       round(CASE WHEN n_kept < $k THEN n_kept * 1.0
       |                  ELSE ($k - 1) * 1.0 / (hk * 1.0 / 1152921504606846976.0)
       |             END, 4) AS est_distinct
       |FROM sk""".stripMargin

  /** Cross-source overlap matrix
    * ([[graft.operators.Sketches.sourceOverlap]], x58): equi-join on the
    * shared shingle-hash set, Jaccard + containment per source pair.
    */
  val sourceOverlapSql: String =
    s"""WITH $shingleCtes,
       |pairs AS (SELECT DISTINCT d.source, s.h60
       |          FROM ds s JOIN documents d USING (doc_id)),
       |sz AS (SELECT source, count(*) AS n FROM pairs GROUP BY 1),
       |inter AS (
       |  SELECT a.source AS src1, b.source AS src2, count(*) AS c
       |  FROM pairs a JOIN pairs b ON a.h60 = b.h60 AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT src1, src2, CAST(x.n AS BIGINT) AS n1, CAST(y.n AS BIGINT) AS n2,
       |       CAST(c AS BIGINT) AS n_common,
       |       round(c * 1.0 / (x.n + y.n - c), 6) AS jaccard,
       |       round(c * 1.0 / least(x.n, y.n), 6) AS containment
       |FROM inter JOIN sz x ON src1 = x.source JOIN sz y ON src2 = y.source""".stripMargin

  /** Per-source unigram KL drift
    * ([[graft.operators.Sketches.sourceDrift]], x69): the x25 token CTE,
    * per-(source, word) sums, KL(source ‖ corpus) with the engine's exact
    * double expression per term.
    */
  val sourceDriftSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(
       |    list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                w -> w NOT IN ($stop))) AS word
       |  FROM documents),
       |dtc AS (SELECT doc_id, word, count(*) AS cnt FROM toks GROUP BY 1, 2),
       |st AS (SELECT d.source, t.word, sum(cnt) AS scnt
       |       FROM dtc t JOIN documents d USING (doc_id) GROUP BY 1, 2),
       |stot AS (SELECT source, sum(scnt) AS stot, count(*) AS n_types
       |         FROM st GROUP BY 1),
       |corp AS (SELECT word, sum(scnt) AS ccnt FROM st GROUP BY 1),
       |ctot AS (SELECT sum(ccnt) AS ctot FROM corp)
       |SELECT s.source, CAST(t.stot AS BIGINT) AS n_tokens,
       |       CAST(t.n_types AS BIGINT) AS n_types,
       |       round(sum((s.scnt * 1.0 / t.stot) *
       |                 ln((s.scnt * 1.0 / t.stot) /
       |                    (c.ccnt * 1.0 / ctot.ctot))), 6) AS kl_vs_corpus
       |FROM st s JOIN corp c USING (word) JOIN stot t USING (source), ctot
       |GROUP BY 1, 2, 3""".stripMargin

  /** Per-source term-frequency Zipf fit
    * ([[graft.operators.Sketches.termZipf]], x81): the x69 source/token
    * counts, CSN α̂ over type counts, head share.
    */
  val termZipfSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(
       |    list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                w -> w NOT IN ($stop))) AS word
       |  FROM documents),
       |dtc AS (SELECT doc_id, word, count(*) AS cnt FROM toks GROUP BY 1, 2),
       |st AS (SELECT d.source, t.word, sum(cnt) AS c
       |       FROM dtc t JOIN documents d USING (doc_id) GROUP BY 1, 2),
       |rk AS (SELECT source, c,
       |              row_number() OVER (PARTITION BY source
       |                                 ORDER BY c DESC, word) AS rk
       |       FROM st)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_types,
       |       CAST(sum(c) AS BIGINT) AS n_tokens,
       |       round(1.0 + count(*) / sum(ln(c / 0.5)), 6) AS alpha_mle,
       |       round(max(CASE WHEN rk = 1 THEN c END) * 1.0 / sum(c), 6)
       |         AS top_share
       |FROM rk GROUP BY source""".stripMargin

  /** Corpus novelty curve ([[graft.operators.Sketches.noveltyCurve]],
    * x67): per id-order shard, distinct shingles, novel shingles
    * (first-seen = min shard), novelty rate, cumulative distinct.
    */
  def noveltyCurveSql(shardWidth: Long = 50L): String =
    s"""WITH $shingleCtes,
       |shrd AS (SELECT DISTINCT doc_id // $shardWidth AS shard, h60 FROM ds),
       |per AS (SELECT shard, count(*) AS n_distinct FROM shrd GROUP BY 1),
       |fs AS (SELECT h60, min(shard) AS shard FROM shrd GROUP BY 1),
       |nov AS (SELECT shard, count(*) AS n_novel FROM fs GROUP BY 1)
       |SELECT p.shard, p.n_distinct,
       |       coalesce(n.n_novel, 0) AS n_novel,
       |       round(coalesce(n.n_novel, 0) * 1.0 / p.n_distinct, 6) AS novelty_rate,
       |       CAST(sum(coalesce(n.n_novel, 0)) OVER (ORDER BY p.shard) AS BIGINT)
       |         AS cum_distinct
       |FROM per p LEFT JOIN nov n USING (shard)""".stripMargin

  /** Cluster topic labels ([[graft.operators.ClusterTopics]], x55): the
    * x47 hashed-TF-IDF embedder at document granularity, the shared Lloyd
    * chain over the derived embeddings, then class-based TF-IDF
    * (tf_{t,c} · ln(1 + A/f_t), A = token mass / nCells) ranked per cell
    * on the 6-dp-rounded score with a term tie-break.
    */
  def clusterTopicsSql(dim: Int = 64, nCells: Int = 8, iters: Int = 3,
                       topTerms: Int = 5): String =
    s"""WITH toksl AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |dtc AS (
       |  SELECT doc_id, token, count(*) AS cnt
       |  FROM (SELECT doc_id, unnest(t) AS token FROM toksl)
       |  GROUP BY 1, 2),
       |didf AS (
       |  SELECT token,
       |         ln((SELECT count(*) FROM documents) * 1.0 / (df + 1)) AS idf
       |  FROM (SELECT token, count(*) AS df FROM dtc GROUP BY 1)),
       |dwj AS (
       |  SELECT doc_id AS vec_id, doc_id AS label,
       |         CAST(${md5Long60Sql("token")} % $dim AS INTEGER) AS j,
       |         round(sum(cnt * idf), 6) AS wj
       |  FROM dtc JOIN didf USING (token) GROUP BY 1, 2, 3),
       |dvec AS (
       |  SELECT vec_id, label, list(coalesce(wj, 0.0) ORDER BY j) AS v FROM (
       |    SELECT s.vec_id, s.label, s.j, w.wj
       |    FROM (SELECT vec_id, label, unnest(range(0, $dim)) AS j
       |          FROM (SELECT DISTINCT vec_id, label FROM dwj)) s
       |    LEFT JOIN dwj w ON w.vec_id = s.vec_id AND w.j = s.j)
       |  GROUP BY 1, 2),
       |demb AS (SELECT vec_id, label, v FROM dvec
       |         WHERE list_max(list_transform(v, x -> abs(x))) > 0),
       |${lloydChain(nCells, iters, dim, vSrc = "SELECT vec_id, label, v FROM demb")},
       |${assignCte(s"c$iters", "fin", dim)},
       |cellterm AS (
       |  SELECT f.cell, d.token, sum(d.cnt) AS tf
       |  FROM dtc d JOIN fin f ON f.vec_id = d.doc_id GROUP BY 1, 2),
       |gtermf AS (SELECT token, sum(cnt) AS ft FROM dtc GROUP BY 1),
       |tot AS (SELECT sum(cnt) AS n_total FROM dtc),
       |scored AS (
       |  SELECT cell, token,
       |         round(tf * ln(1.0 + (n_total * 1.0 / $nCells) / ft), 6) AS ctfidf
       |  FROM cellterm JOIN gtermf USING (token), tot),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY cell
       |                                    ORDER BY ctfidf DESC, token) AS rank
       |       FROM scored),
       |ndc AS (SELECT cell, count(*) AS n_docs FROM fin GROUP BY 1)
       |SELECT r.cell, CAST(n.n_docs AS BIGINT) AS n_docs, r.token AS term,
       |       CAST(r.rank AS BIGINT) AS rank, r.ctfidf
       |FROM rk r JOIN ndc n USING (cell)
       |WHERE r.rank <= $topTerms""".stripMargin

  /** Dedup ROI report ([[graft.operators.Dedup.dedupReport]], x60): the
    * x1 and x45 keep flags joined to whitespace token counts, one global
    * aggregate per method.
    */
  def dedupReportSql(minEstJaccard: Double = 0.5): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         len(list_filter(regexp_split_to_array(text, '\\s+'),
       |             x -> x <> '')) AS ws_tokens
       |  FROM documents),
       |ex AS (SELECT doc_id,
       |              NOT (doc_id <> min(doc_id) OVER (PARTITION BY digest)) AS kept
       |       FROM (SELECT doc_id, md5(text) AS digest FROM documents)),
       |mh AS (SELECT doc_id, kept FROM (${minhashDedupSql(minEstJaccard)})),
       |rep AS (
       |  SELECT 'exact' AS method, e.kept, t.ws_tokens
       |  FROM ex e JOIN t USING (doc_id)
       |  UNION ALL
       |  SELECT 'minhash' AS method, m.kept, t.ws_tokens
       |  FROM mh m JOIN t USING (doc_id))
       |SELECT method, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(ws_tokens) AS BIGINT) AS tokens_total,
       |       CAST(sum(CASE WHEN kept THEN ws_tokens ELSE 0 END) AS BIGINT)
       |         AS tokens_kept,
       |       round((count(*) - sum(CASE WHEN kept THEN 1 ELSE 0 END)) * 1.0
       |             / count(*), 6) AS doc_drop_pct,
       |       round((sum(ws_tokens) - sum(CASE WHEN kept THEN ws_tokens ELSE 0 END))
       |             * 1.0 / sum(ws_tokens), 6) AS token_drop_pct
       |FROM rep GROUP BY method""".stripMargin

  /** Quality-keep dedup ([[graft.operators.Dedup.qualityKeepDedup]], x63):
    * the x45 families re-kept by the x10 quality score (DESC, doc_id).
    */
  def qualityKeepDedupSql(minEstJaccard: Double = 0.5): String =
    s"""WITH mh AS (SELECT doc_id, family, family_size
       |            FROM (${minhashDedupSql(minEstJaccard)})),
       |qs AS (SELECT doc_id, quality FROM ($qualitySql))
       |SELECT m.doc_id, m.family, CAST(m.family_size AS BIGINT) AS family_size,
       |       qs.quality,
       |       row_number() OVER (PARTITION BY m.family
       |                          ORDER BY qs.quality DESC, m.doc_id) = 1 AS kept
       |FROM mh m JOIN qs USING (doc_id)""".stripMargin

  /** Packing-efficiency report
    * ([[graft.operators.CorpusPrep.packingEfficiency]], x62): integer
    * block arithmetic per candidate context length, waste ratios rounded
    * 6 dp.
    */
  def packingEfficiencySql(ctxLens: Seq[Int] = Seq(256, 512, 1024)): String = {
    val lens = ctxLens.mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |         len(list_filter(regexp_split_to_array(text, '\\s+'),
       |             x -> x <> '')) AS ws_tokens
       |  FROM documents),
       |g AS (
       |  SELECT c.ctx, count(*) AS n_docs, sum(t.ws_tokens) AS total_tokens,
       |         sum((t.ws_tokens + c.ctx - 1) // c.ctx) AS naive_blocks
       |  FROM t CROSS JOIN (SELECT unnest([$lens]) AS ctx) c
       |  GROUP BY c.ctx)
       |SELECT CAST(ctx AS INTEGER) AS ctx, CAST(n_docs AS BIGINT) AS n_docs,
       |       CAST(total_tokens AS BIGINT) AS total_tokens,
       |       CAST(naive_blocks AS BIGINT) AS naive_blocks,
       |       CAST((total_tokens + ctx - 1) // ctx AS BIGINT) AS packed_blocks,
       |       round(1.0 - total_tokens * 1.0 / (naive_blocks * ctx), 6)
       |         AS naive_waste,
       |       round(1.0 - total_tokens * 1.0 /
       |             (((total_tokens + ctx - 1) // ctx) * ctx), 6) AS packed_waste
       |FROM g""".stripMargin
  }

  /** Shared CTEs for the DSIR family ([[graft.operators.Dsir]], x53/x54):
    * hashed unigram+bigram bucket counts, the raw and target bucket
    * distributions, the add-1-smoothed per-bucket log-likelihood ratio,
    * and per-document log-weights (every document, zero-gram docs at
    * weight 0). Same tokenizer + post-stopword bigram adjacency as the
    * x43 bigram LM; same md5-60 bucket hash as x39.
    */
  private def dsirCtes(targetSources: Seq[String], buckets: Int): String = {
    val targetIn = targetSources.map(s => s"'$s'").mkString(", ")
    s"""toksl AS (
       |  SELECT doc_id,
       |         list_filter(regexp_extract_all(lower(text), '\\b[a-z]{3,}\\b'),
       |                     w -> w NOT IN ($stop)) AS t
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest(t) AS g FROM toksl
       |  UNION ALL
       |  SELECT doc_id, t[i+1] || ' ' || t[i+2] AS g
       |  FROM (SELECT doc_id, t, unnest(range(len(t) - 1)) AS i
       |        FROM toksl WHERE len(t) >= 2)),
       |feat AS (
       |  SELECT doc_id, CAST(${md5Long60Sql("g")} % $buckets AS INTEGER) AS b,
       |         count(*) AS cnt
       |  FROM grams GROUP BY 1, 2),
       |rawd AS (SELECT b, sum(cnt) AS rc FROM feat GROUP BY 1),
       |tgtd AS (SELECT b, sum(cnt) AS tc
       |         FROM feat JOIN documents USING (doc_id)
       |         WHERE source IN ($targetIn) GROUP BY 1),
       |dist AS (
       |  SELECT r.b,
       |         ln((coalesce(t.tc, 0) + 1) * 1.0 /
       |            ((SELECT coalesce(sum(tc), 0) FROM tgtd) + $buckets))
       |       - ln((r.rc + 1) * 1.0 /
       |            ((SELECT sum(rc) FROM rawd) + $buckets)) AS llr
       |  FROM rawd r LEFT JOIN tgtd t USING (b)),
       |wts AS (
       |  SELECT f.doc_id, sum(f.cnt) AS n_grams,
       |         round(sum(f.cnt * d.llr), 6) AS log_weight
       |  FROM feat f JOIN dist d USING (b) GROUP BY 1),
       |fullw AS (
       |  SELECT d.doc_id, d.source,
       |         CAST(coalesce(w.n_grams, 0) AS BIGINT) AS n_grams,
       |         coalesce(w.log_weight, 0.0) AS log_weight
       |  FROM documents d LEFT JOIN wts w USING (doc_id))""".stripMargin
  }

  /** Per-document DSIR importance weights
    * ([[graft.operators.Dsir.importanceWeights]]).
    */
  def dsirWeightsSql(targetSources: Seq[String] =
                       graft.operators.Dsir.DefaultTargetSources,
                     buckets: Int = graft.operators.Dsir.NumBuckets): String =
    s"""WITH ${dsirCtes(targetSources, buckets)}
       |SELECT doc_id, source, n_grams, log_weight FROM fullw""".stripMargin

  /** Gumbel-top-k DSIR resample ([[graft.operators.Dsir.gumbelSample]]):
    * key = log w − ln(−ln u) with u = (md5-60(salt:doc_id) + ½)/2^60,
    * clamped to ≤ 1 − 1e-12 exactly as the engine does (the double cast
    * of h near 2^60 can round u to exactly 1.0, where −ln(−ln u) hits a
    * pole that engines disagree on).
    */
  def dsirSampleSql(n: Int = 100,
                    targetSources: Seq[String] =
                      graft.operators.Dsir.DefaultTargetSources,
                    buckets: Int = graft.operators.Dsir.NumBuckets,
                    salt: String = graft.operators.Dsir.DefaultSalt): String =
    s"""WITH ${dsirCtes(targetSources, buckets)},
       |keyed AS (
       |  SELECT doc_id, source, log_weight,
       |         round(log_weight -
       |               ln(-ln(least((CAST(${md5Long60Sql(s"'$salt:' || doc_id")}
       |                                  AS DOUBLE) + 0.5) / 1152921504606846976.0,
       |                            1.0 - 1e-12))),
       |               6) AS gumbel_key
       |  FROM fullw),
       |top AS (SELECT * FROM keyed ORDER BY gumbel_key DESC, doc_id LIMIT $n)
       |SELECT CAST(row_number() OVER (ORDER BY gumbel_key DESC, doc_id)
       |            AS BIGINT) AS sample_rank,
       |       doc_id, source, log_weight, gumbel_key
       |FROM top""".stripMargin

  /** Snapshot diff summary ([[graft.operators.Snapshots.corpusDiff]],
    * x84): both versions derive from the one committed table exactly as
    * the engine's `snapV1`/`snapV2` do, digests compare via md5, and the
    * full-outer join classifies added/removed/changed/unchanged.
    */
  val corpusDiffSql: String =
    s"""WITH v1 AS (SELECT doc_id, source, text FROM documents
       |            WHERE doc_id % 17 != 2),
       |v2 AS (SELECT doc_id, source,
       |              CASE WHEN doc_id % 11 = 5 THEN text || ' rev2'
       |                   ELSE text END AS text
       |       FROM documents WHERE doc_id % 13 != 3),
       |a AS (SELECT doc_id, source AS source_v1,
       |             md5(coalesce(text, 'null:' || doc_id)) AS dig_v1,
       |             length(coalesce(text, '')) AS chars_v1 FROM v1),
       |b AS (SELECT doc_id, source AS source_v2,
       |             md5(coalesce(text, 'null:' || doc_id)) AS dig_v2,
       |             length(coalesce(text, '')) AS chars_v2 FROM v2),
       |j AS (SELECT coalesce(b.source_v2, a.source_v1) AS source,
       |             CASE WHEN a.dig_v1 IS NULL THEN 'added'
       |                  WHEN b.dig_v2 IS NULL THEN 'removed'
       |                  WHEN a.dig_v1 = b.dig_v2 THEN 'unchanged'
       |                  ELSE 'changed' END AS status,
       |             coalesce(a.chars_v1, 0) AS c1,
       |             coalesce(b.chars_v2, 0) AS c2
       |      FROM a FULL OUTER JOIN b USING (doc_id))
       |SELECT source, status, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(c1) AS BIGINT) AS chars_v1,
       |       CAST(sum(c2) AS BIGINT) AS chars_v2
       |FROM j GROUP BY 1, 2""".stripMargin

  /** Per-source integrity manifest
    * ([[graft.operators.Snapshots.corpusManifest]], x85): the
    * order-independent fingerprints — Σ md5-60 mod 2^63 (HUGEINT
    * arithmetic, exact) and XOR — plus exact doc/char/distinct counts.
    */
  val corpusManifestSql: String =
    s"""WITH dig AS (
       |  SELECT source, doc_id, length(coalesce(text, '')) AS len,
       |         ${md5Long60Sql("coalesce(text, 'null:' || doc_id)")} AS h60
       |  FROM documents)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(count(DISTINCT h60) AS BIGINT) AS n_distinct_texts,
       |       CAST(sum(len) AS BIGINT) AS n_chars,
       |       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
       |       CAST(sum(CAST(h60 AS HUGEINT)) %
       |            CAST('9223372036854775808' AS HUGEINT) AS BIGINT) AS sum_fp,
       |       bit_xor(h60) AS xor_fp
       |FROM dig GROUP BY 1""".stripMargin
}
