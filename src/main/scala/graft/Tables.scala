package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver fixture tables (`TESTDATA.md`).
  *
  * Centralizes the one genuinely tricky read: `events.parquet` stores its
  * `ts` column as parquet TIMESTAMP(NANOS), which Spark's vectorized reader
  * rejects by default. We flip the session conf
  * `spark.sql.legacy.parquet.nanosAsLong` at read time (safe to set
  * repeatedly) and convert the raw nanosecond longs to a microsecond
  * `TimestampType` — the same truncation DuckDB applies when casting
  * TIMESTAMP_NS to TIMESTAMP, so oracle comparisons line up.
  *
  * At 100 TB these readers are where partition pruning / pushdown begin:
  * they return a bare scan, so every downstream filter/projection reaches
  * the parquet reader (verify with `.explain`: `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  // Memoized per (session, path): repeated queries over the same fixture
  // reuse one resolved relation, so file listing + schema resolution
  // happen once per session instead of once per query (measurable in
  // Bench, where 63 queries would otherwise re-list every scan).
  // DataFrames are immutable plans — sharing them is safe.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts` converted from TIMESTAMP(NANOS) to a usable
    * microsecond timestamp. Integer division truncates toward zero ==
    * floor for the post-1970 fixture data.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val key = (spark, s"$sfDir/events.parquet#converted")
    val cached = cache.get(key)
    if (cached != null) cached
    else {
      // Built OUTSIDE computeIfAbsent: the inner table() also touches
      // this map, and nested computeIfAbsent on one ConcurrentHashMap
      // throws "Recursive update" whenever the two keys land in the
      // same bin (nondeterministic — it appeared only after unrelated
      // cache keys shifted the table layout). putIfAbsent keeps the
      // memoization race-safe; losers just drop their duplicate plan.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = table(spark, sfDir, "events")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      cache.putIfAbsent(key, df)
      cache.get(key)
    }
  }
}
