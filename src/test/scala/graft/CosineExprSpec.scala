package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CosineSimilarityExpr.cosineSim

/** The custom Catalyst expression must agree exactly with the composable
  * `aggregate(zip_with(...))` form (same fused-loop summation order) in
  * both codegen and interpreted paths.
  */
class CosineExprSpec extends SparkSpec {

  import spark.implicits._

  private def vecs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(0.0, 0.0), Seq(1.0, 1.0)),
    (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),
    (Seq(0.5, -0.25, 8.0), Seq(0.5, -0.25, 8.0))).toDF("a", "b")

  test("custom expression equals composable form on all cases") {
    val rows = vecs.select(
      cosineSim(col("a"), col("b")).as("expr"),
      TextFns.cosineDense(col("a"), col("b")).as("builtin"))
      .as[(Double, Double)].collect()
    rows.foreach { case (e, b) => assert(e == b, s"$e != $b") }
  }

  test("interpreted path (codegen off) gives identical results") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val rows = vecs.select(cosineSim(col("a"), col("b"))).as[Double].collect()
      assert(math.abs(rows(0) - 0.9746318461970762) < 1e-12)
      assert(rows(1) == 0.0) // zero-norm guard
      assert(rows(2) == 0.0)
      assert(math.abs(rows(3) - 1.0) < 1e-12)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("cosine_sim is callable from SQL after registration") {
    org.apache.spark.sql.graftext.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s1, " +
      "cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS s2").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("extensions class injects the function into a fresh session") {
    val ext = new org.apache.spark.sql.graftext.GraftExtensions()
    // the running session can't be rebuilt in-JVM; assert the descriptor
    // wiring directly instead.
    val (ident, _, builder) = org.apache.spark.sql.graftext.GraftFunctions.cosineSimDescriptor
    assert(ident.funcName == "cosine_sim")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = builder(Seq(Literal.create(Array(1.0), org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)), Literal.create(Array(1.0),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))))
    assert(e.isInstanceOf[org.apache.spark.sql.graftext.CosineSimilarityExpr])
    assert(ext != null)
  }

  test("null inputs yield null") {
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val r = df.select(cosineSim(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }
}
