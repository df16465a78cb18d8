package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver test tables (see /root/repo/TESTDATA.md).
  *
  * All analytics operators take a `sfDir` (e.g. `/root/testdata/sf0.01`) and
  * read parquet through these helpers so column pruning / filter pushdown
  * reach the scan. The reference's domain maps onto these tables
  * (SURVEY.md §7.0): `events` plays `messages` (user_id = conversation key,
  * event_type = sender/model analog, props = metadata JSON), `documents` is
  * the message-content corpus for the NLP pipeline, `embeddings` is the
  * semantic-search vector store.
  */
object Tables {
  // Memoized per (session, path): `spark.read.parquet` eagerly lists the
  // directory and reads a footer for the schema, so a 100+-query suite
  // pays that per query per table without this. The tables are immutable
  // test fixtures, so reusing the resolved relation is safe; entries of
  // stopped sessions are dropped on the next lookup so neither they nor
  // their DataFrames outlive the session in multi-session processes.
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    memo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    memo.getOrElseUpdate((spark, s"$sfDir/$name.parquet"),
      spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  def region(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = read(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = read(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = read(spark, sfDir, "lineitem")
  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp. Read nanos as long (legacy conf) and truncate to
    * microsecond TimestampType — the same precision a native reader would
    * keep. Conf is set on the session lazily so any driver-created session
    * works too.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, sfDir, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast(LongType)))
    else raw
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")
}
