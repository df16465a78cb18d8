package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.GraftFunctions

/** Every native kernel must be reachable from pure SQL after
  * registration, with results identical to the Column API — the
  * extension surface a cluster enables via
  * `spark.sql.extensions=...GraftExtensions`.
  */
class GraftFunctionsSpec extends SparkSpec {

  test("all kernel functions are callable from SQL with correct results") {
    GraftFunctions.register(spark)

    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
        |  sq_dists(array(1.0d, 2.0d), array(array(1.0d, 2.0d), array(0.0d, 0.0d))) AS sqd,
        |  shingle_hashes(array('a', 'b', 'c', 'd'), 0) AS sh,
        |  window_hashes(array('a', 'b', 'c', 'd'), 2, 0) AS wh,
        |  rolling_fingerprint(array('a', 'b')) AS rf,
        |  simhash_sig(array(named_struct('h', 5L, 'cnt', 2L)), 60) AS ss,
        |  minhash_sig(array(5L), array(1L), array(0L), 7L) AS ms
        |""".stripMargin).head()

    assert(r.getDouble(0) == 1.0)
    assert(r.getSeq[Double](1) == Seq(0.0, 5.0))
    assert(r.getSeq[Long](2).length == 2)  // 4 tokens -> 2 shingles
    assert(r.getSeq[Long](3).length == 3)  // 4 tokens, w=2 -> 3 windows
    assert(!r.isNullAt(4))
    assert(r.getLong(5) == 5L)             // single entry: fingerprint = h itself
    assert(r.getSeq[Long](6) == Seq(5L))   // (5*1+0) % 7

    // SQL results equal the Column API on a real column
    import org.apache.spark.sql.graftext.ShingleHashExpr
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("toks"))
    docs.createOrReplaceTempView("__gf_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, shingle_hashes(toks, 0) AS h FROM __gf_docs").collect()
      .map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
    val viaCol = docs.select(col("doc_id"),
        ShingleHashExpr.shingleHashes(col("toks"), 0L).as("h")).collect()
      .map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
    assert(viaSql.nonEmpty && viaSql == viaCol)
  }

  test("int-typed array literals widen: the natural SQL spelling works") {
    GraftFunctions.register(spark)
    // array(1, 2) is array<int> in SQL — the registry must widen it like
    // the scalar path widens int literals, not die in toLongArray
    val r = spark.sql(
      "SELECT minhash_sig(array(5L), array(1, 2), array(0, 1), 7) AS ms").head()
    assert(r.getSeq[Long](0) == Seq(5L, 4L)) // (5*1+0)%7, (5*2+1)%7
  }

  test("non-literal model parameters are rejected at build time") {
    GraftFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(array('a'), cast(rand() * 10 AS bigint))").head()
    }
    assert(err.getMessage.contains("literal") ||
      err.getMessage.toLowerCase.contains("foldable"))
  }
}
