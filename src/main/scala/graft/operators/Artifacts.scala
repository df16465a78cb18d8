package graft.operators

import org.apache.spark.sql.SparkSession

/** Scratch locations for persisted index artifacts built by registered
  * queries (the LSH index of x70, the IVF/IVF-PQ indexes of x82/x83).
  */
object Artifacts {

  /** Session-scoped artifact directory under `java.io.tmpdir`:
    *
    *  - unique per Spark application (the applicationId component), so two
    *    concurrent sessions benching the same fixture never share a path —
    *    an overwrite-mode rewrite cannot delete files another session is
    *    mid-read on;
    *  - keyed by the FULL key string (sanitized), not a 32-bit hash, so
    *    distinct fixtures can never collide into one directory.
    *
    * The same session calling again with the same key reuses the path —
    * deliberate: bench re-runs overwrite their own artifact, which is part
    * of the measured cost, and readers within one session are sequential.
    */
  def sessionScopedDir(spark: SparkSession, kind: String, key: String): String = {
    val safe = key.replaceAll("[^A-Za-z0-9._-]", "_")
    new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"),
        "graft_" + spark.sparkContext.applicationId),
      s"${kind}_$safe").getPath
  }
}
