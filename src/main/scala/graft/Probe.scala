package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: run one registered query repeatedly to split per-plan
  * first-run cost (codegen, parquet footers, stage setup) from
  * steady-state execution. `tools/run_class.sh graft.Probe <name> <sfDir>
  * [reps]`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reps=0: print the executed plan instead of timing (dev plan audits).
    // Execute FIRST: under adaptive query execution the pre-run
    // executedPlan is only the initial AdaptiveSparkPlan — runtime
    // re-optimizations (e.g. a sort-merge join AQE converts to broadcast
    // once it sees the real build-side size) exist only after a run, and
    // a plan audit that misses them would mis-grade the join strategy.
    // After execRows the same tree prints `isFinalPlan=true` with the plan
    // the engine actually ran.
    if (reps == 0) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      Bench.execRows(df)
      println(df.queryExecution.executedPlan.toString)
      spark.stop(); return
    }
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      // materialize the query's own plan (Bench.execRows semantics) — a
      // count() on top lets column pruning delete projection-only compute
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = Bench.execRows(df)
      val path = graft.operators.Duplicates.lastComponentsPath
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n" +
        (if (path.nonEmpty) s" componentsPath=$path" else ""))
      // SPARK_GRAFT_PRINT_PLAN=1: executed plan after the LAST rep too —
      // warm-run plans differ from cold (cache substitution changes join
      // strategies), and reps=0 can only show the cold one
      if (i == reps && sys.env.get("SPARK_GRAFT_PRINT_PLAN").contains("1"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
