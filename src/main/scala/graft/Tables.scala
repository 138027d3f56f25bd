package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver fixture tables (`TESTDATA.md`).
  *
  * Centralizes the one genuinely tricky read: `events.parquet`'s `ts`
  * column has shipped in two physical forms across fixture generations —
  * parquet TIMESTAMP(NANOS) (rounds 1-8), which Spark's vectorized
  * reader rejects unless `spark.sql.legacy.parquet.nanosAsLong` maps it
  * to a raw long, and plain microsecond TIMESTAMP(isAdjustedToUTC=false)
  * (round 9+), which Spark reads natively as TIMESTAMP_NTZ. [[events]]
  * dispatches on the resolved read schema and normalizes BOTH to the
  * same session-zone `TimestampType` wall-clock (UTC session), so every
  * downstream query and the DuckDB oracle see identical values
  * regardless of which generation wrote the file.
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

  /** `events` with `ts` normalized to session-zone `TimestampType`,
    * whatever the fixture generation wrote:
    *  - raw nanosecond long (TIMESTAMP(NANOS) under the legacy conf):
    *    integer-divide to micros (truncation toward zero == floor for the
    *    post-1970 fixture data — the same truncation DuckDB applies
    *    casting TIMESTAMP_NS to TIMESTAMP);
    *  - TIMESTAMP_NTZ (micros, isAdjustedToUTC=false): reinterpret the
    *    wall-clock in the session zone (UTC) — a value-preserving cast;
    *  - already TimestampType: pass through.
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
      val raw = table(spark, sfDir, "events")
      val df = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
      cache.putIfAbsent(key, df)
      cache.get(key)
    }
  }
}
