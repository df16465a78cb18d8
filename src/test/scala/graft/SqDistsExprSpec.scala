package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.SqDistsExpr.sqDistsCol

/** The fused squared-distances kernel must agree EXACTLY with the
  * `transform(cents, c => aggregate(zip_with(v, c, (x,y)=>(x-y)²), 0, +))`
  * form it replaced — bit-identical float sums (same index-ascending
  * order) on real embeddings, and matching null semantics on every edge
  * shape (null matrix → null; null vector → k nulls; null centroid row /
  * length mismatch / null element → that element null) — in both codegen
  * and interpreted paths. Cell assignment through [[graft.operators
  * .VectorSearch.cellOf]] must be unchanged vs the retained HOF form.
  */
class SqDistsExprSpec extends SparkSpec {

  private def hofDists = transform(col("cents"), c =>
    aggregate(zip_with(col("v"), c, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x))

  private def edgeFrames = spark.sql(
    """SELECT 0 AS id, array(1.0d, 2.0d, 3.0d) AS v,
      |       array(array(1.0d, 2.0d, 3.0d), array(0.5d, -1.5d, 2.25d)) AS cents
      |UNION ALL SELECT 1, array(0.1d, 0.2d), array(array(0.3d, 0.4d))
      |UNION ALL SELECT 2, array(1.0d, 2.0d), CAST(NULL AS array<array<double>>)
      |UNION ALL SELECT 3, CAST(NULL AS array<double>), array(array(1.0d), array(2.0d))
      |UNION ALL SELECT 4, array(1.0d, 2.0d),
      |       array(CAST(NULL AS array<double>), array(3.0d, 4.0d))
      |UNION ALL SELECT 5, array(1.0d, 2.0d), array(array(3.0d))
      |UNION ALL SELECT 6, array(1.0d, CAST(NULL AS double)),
      |       array(array(3.0d, 4.0d))
      |""".stripMargin)

  test("kernel equals the HOF form on every edge shape, codegen path") {
    val rows = edgeFrames
      .select(col("id"), sqDistsCol(col("v"), col("cents")).as("k"), hofDists.as("h"))
      .orderBy("id").collect()
    rows.foreach { r => assert(r.get(1) == r.get(2), s"row ${r.get(0)}: ${r.get(1)} != ${r.get(2)}") }
    assert(rows(2).isNullAt(1))                       // null matrix -> null
    assert(rows(3).getSeq[Any](1) == Seq(null, null)) // null vector -> k nulls
    assert(rows(5).getSeq[Any](1) == Seq(null))       // length mismatch -> null elem
  }

  test("kernel equals the HOF form on every edge shape, interpreted path") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val rows = edgeFrames
        .select(col("id"), sqDistsCol(col("v"), col("cents")).as("k"), hofDists.as("h"))
        .orderBy("id").collect()
      rows.foreach { r => assert(r.get(1) == r.get(2), s"row ${r.get(0)}: ${r.get(1)} != ${r.get(2)}") }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("mat_dots and vec_sub equal their HOF forms on every edge shape") {
    import org.apache.spark.sql.graftext.SqDistsExpr.{matDotsCol, vecSubCol}
    val hofDots = transform(col("cents"), c =>
      aggregate(zip_with(col("v"), c, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x))
    val dotRows = edgeFrames
      .select(col("id"), matDotsCol(col("v"), col("cents")).as("k"), hofDots.as("h"))
      .orderBy("id").collect()
    dotRows.foreach { r => assert(r.get(1) == r.get(2), s"row ${r.get(0)}: ${r.get(1)} != ${r.get(2)}") }

    val subEdges = spark.sql(
      """SELECT 0 AS id, array(3.0d, 5.0d) AS a, array(1.0d, 1.5d) AS b
        |UNION ALL SELECT 1, array(1.0d, 2.0d, 3.0d), array(1.0d)
        |UNION ALL SELECT 2, array(1.0d), array(1.0d, 2.0d, 3.0d)
        |UNION ALL SELECT 3, CAST(NULL AS array<double>), array(1.0d)
        |UNION ALL SELECT 4, array(1.0d, CAST(NULL AS double)), array(2.0d, 3.0d)
        |UNION ALL SELECT 5, CAST(array() AS array<double>), CAST(array() AS array<double>)
        |""".stripMargin)
    val subRows = subEdges
      .select(col("id"), vecSubCol(col("a"), col("b")).as("k"),
        zip_with(col("a"), col("b"), (x, y) => x - y).as("h"))
      .orderBy("id").collect()
    subRows.foreach { r => assert(r.get(1) == r.get(2), s"row ${r.get(0)}: ${r.get(1)} != ${r.get(2)}") }
    assert(subRows(1).getSeq[Any](1) == Seq(0.0, null, null)) // pad tail -> nulls
    assert(subRows(3).isNullAt(1))                            // null input -> null
  }

  test("mat_cos equals transform(mat, r => cosine_sim(v, r)) on dense and " +
       "top-level-null shapes, codegen and interpreted") {
    import org.apache.spark.sql.graftext.SqDistsExpr.matCosCol
    import org.apache.spark.sql.graftext.CosineSimilarityExpr.cosineSim
    // id 6 (null ELEMENT) is excluded: the kernel yields a null sim there
    // by contract, while the HOF form's read of a null slot is
    // representation-dependent — the only documented divergence.
    val hofCos = transform(col("cents"), c => cosineSim(col("v"), c))
    def check(): Unit = {
      val rows = edgeFrames.where(col("id") =!= 6)
        .select(col("id"), matCosCol(col("v"), col("cents")).as("k"), hofCos.as("h"))
        .orderBy("id").collect()
      rows.foreach { r => assert(r.get(1) == r.get(2), s"row ${r.get(0)}: ${r.get(1)} != ${r.get(2)}") }
      assert(rows(2).isNullAt(1))                       // null matrix -> null
      assert(rows(3).getSeq[Any](1) == Seq(null, null)) // null vector -> k nulls
    }
    check()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // the contract case the HOF reference can't pin: null element -> null sim
    val nullElem = edgeFrames.where(col("id") === 6)
      .select(matCosCol(col("v"), col("cents"))).collect().head
    assert(nullElem.getSeq[Any](0) == Seq(null))
  }

  test("mat_cos on real embeddings equals the pairwise cosine_sim kernel") {
    import org.apache.spark.sql.graftext.SqDistsExpr.matCosCol
    import org.apache.spark.sql.graftext.CosineSimilarityExpr.cosineSim
    import spark.implicits._
    val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val mat = embs.orderBy("vec_id").limit(5).collect()
      .map(_.getSeq[Double](1).toSeq)
    val matDf = Seq(Tuple1(mat.toSeq)).toDF("cents")
    val viaKernel = embs.crossJoin(broadcast(matDf))
      .select(col("vec_id"), posexplode(matCosCol(col("v"), col("cents"))))
      .toDF("vec_id", "j", "sim_k")
    val viaPairs = embs.crossJoin(broadcast(matDf))
      .select(col("vec_id"), col("v"), posexplode(col("cents")))
      .toDF("vec_id", "v", "j", "r")
      .select(col("vec_id"), col("j"), cosineSim(col("v"), col("r")).as("sim_p"))
    assert(viaKernel.join(viaPairs, Seq("vec_id", "j"))
      .where(not(col("sim_k") <=> col("sim_p"))).count() == 0)
    assert(viaKernel.count() == embs.count() * 5)
  }

  test("mat_cos_stats equals array_max + rounded-threshold filter over " +
       "mat_cos, including thresholds ON a rounded sim (boundary window)") {
    import org.apache.spark.sql.graftext.MatCosStatsExpr.matCosStatsCol
    import org.apache.spark.sql.graftext.SqDistsExpr.matCosCol
    import spark.implicits._
    val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val mat = embs.orderBy("vec_id").limit(7).collect()
      .map(_.getSeq[Double](1).toSeq)
    val matDf = Seq(Tuple1(mat.toSeq)).toDF("cents")
    // a threshold equal to an actual rounded sim lands inside the ±1e-6
    // BigDecimal window — the path a generic threshold never exercises
    val someSim = embs.crossJoin(broadcast(matDf))
      .select(explode(matCosCol(col("v"), col("cents"))).as("s"))
      .select(round(col("s"), 6).as("r")).where(col("r") > 0.1)
      .orderBy("r").limit(1).collect().head.getDouble(0)
    for (t <- Seq(0.25, someSim, someSim + 1e-6, someSim - 1e-6)) {
      val both = embs.crossJoin(broadcast(matDf))
        .select(col("vec_id"),
          matCosStatsCol(col("v"), col("cents"), t).as("k"),
          struct(
            array_max(matCosCol(col("v"), col("cents"))).as("max_sim"),
            size(filter(matCosCol(col("v"), col("cents")),
              s => round(s, 6) >= lit(t))).cast("long").as("n_close")).as("h"))
      assert(both.where(not(col("k") <=> col("h"))).count() == 0, s"t=$t")
    }
    // degenerate shapes, each mirroring what array_max + a null-dropping
    // filter yield over the HOF sims: null matrix -> null; a null vec (or
    // one with a null element — every row poisoned) and an empty matrix
    // -> (null, 0); an unscoreable (null) row is skipped
    val edge = spark.sql(
      """SELECT matv, cents FROM VALUES
        |  (CAST(NULL AS array<double>), array(array(1.0d))),
        |  (array(1.0d), CAST(NULL AS array<array<double>>)),
        |  (array(1.0d), CAST(array() AS array<array<double>>)),
        |  (array(1.0d), array(CAST(NULL AS array<double>), array(2.0d))),
        |  (array(1.0d, CAST(NULL AS double)), array(array(1.0d, 2.0d)))
        |AS t(matv, cents)""".stripMargin)
      .select(matCosStatsCol(col("matv"), col("cents"), 0.5).as("k")).collect()
    assert(edge(0).getStruct(0).isNullAt(0) && edge(0).getStruct(0).getLong(1) == 0L)
    assert(edge(1).isNullAt(0))
    assert(edge(2).getStruct(0).isNullAt(0) && edge(2).getStruct(0).getLong(1) == 0L)
    assert(edge(3).getStruct(0).getDouble(0) == 1.0 &&
      edge(3).getStruct(0).getLong(1) == 1L)
    assert(edge(4).getStruct(0).isNullAt(0) && edge(4).getStruct(0).getLong(1) == 0L)
    // NaN sims rank greatest, exactly as array_max orders doubles
    val nan = spark.sql(
      """SELECT array(1.0d, 0.0d) AS matv,
        |       array(array(1.0d, 0.0d),
        |             array(cast('Infinity' as double), 0.0d)) AS cents""".stripMargin)
      .select(matCosStatsCol(col("matv"), col("cents"), 0.5).as("k"),
        array_max(matCosCol(col("matv"), col("cents"))).as("h")).collect().head
    assert(nan.getStruct(0).getDouble(0).isNaN && nan.getDouble(1).isNaN)
  }

  test("cell assignment is bit-identical to the HOF form on real embeddings") {
    import graft.operators.VectorSearch
    val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = embs.limit(7).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    import spark.implicits._
    val centsDf = Seq(Tuple1(cents.map(_.toSeq).toSeq)).toDF("cents")
    val assigned = embs
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .crossJoin(broadcast(centsDf))
      .select(col("vec_id"),
        VectorSearch.cellOf(col("v"), col("cents")).as("kcell"),
        VectorSearch.cellOfHof(col("v"), col("cents")).as("hcell"))
    assert(assigned.where(not(col("kcell") <=> col("hcell"))).count() == 0)
    assert(assigned.count() > 0)
  }
}
