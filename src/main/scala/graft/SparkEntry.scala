package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-domain registries:
  *  - [[CoreQueries]]: SURVEY.md §2 operator semantics + harness breadth
  *    (joins, agg variants, set ops, windows, streaming-shaped queries)
  *  - [[LlmQueries]]: large-scale training-data pipeline ops (dedup,
  *    similarity search, text analysis, multimodal)
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    CoreQueries.all ++ CoreQueries2.all ++ CoreQueries3.all ++
      CoreQueries4.all ++ CoreQueries5.all ++ CoreQueries6.all ++
      CoreQueries7.all ++ CoreQueries8.all ++ CoreQueries9.all ++
      CoreQueries10.all ++ CoreQueries11.all ++ CoreQueries12.all ++
      CoreQueries13.all ++ CoreQueries14.all ++ CoreQueries15.all ++
      CoreQueries16.all ++ CoreQueries17.all ++ CoreQueries18.all ++
      CoreQueries19.all ++ CoreQueries20.all ++ CoreQueries21.all ++
      CoreQueries22.all ++ CoreQueries23.all ++ CoreQueries24.all ++
      CoreQueries25.all ++
      LlmQueries.all ++ LlmQueries2.all ++ LlmQueries3.all ++
      LlmQueries4.all ++ LlmQueries5.all ++ LlmQueries6.all ++
      LlmQueries7.all ++ LlmQueries8.all ++ LlmQueries9.all ++
      LlmQueries10.all ++ LlmQueries11.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's Gold-layer window aggregation (SURVEY §3.1) — clean,
    * grouped diff + cumsum over `events`.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_gold_window")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
