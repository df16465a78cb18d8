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
    *  - keyed by a sanitized form of the FULL key string plus its md5 (the
    *    sanitization alone is not injective — "data/sf1" and "data_sf1"
    *    would collide — so the digest restores one-directory-per-key).
    *
    * The same session calling again with the same key reuses the path —
    * deliberate: bench re-runs overwrite their own artifact, which is part
    * of the measured cost, and readers within one session are sequential.
    * The session root is deleted on JVM exit (artifacts are rebuildable
    * scratch — without the hook, repeated bench runs would grow tmp
    * unboundedly).
    */
  def sessionScopedDir(spark: SparkSession, kind: String, key: String): String = {
    val safe = key.replaceAll("[^A-Za-z0-9._-]", "_")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_" + spark.sparkContext.applicationId)
    cleanupOnExit(root)
    new java.io.File(root, s"${kind}_${safe}_$digest").getPath
  }

  private val hooked = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def cleanupOnExit(root: java.io.File): Unit =
    if (hooked.add(root.getPath))
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(root)))

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
