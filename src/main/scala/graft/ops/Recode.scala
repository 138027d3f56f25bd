package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F5: dictionary recode — pandas `Series.replace(dict)` with unmapped
  * values passing through (`/root/reference/main.py:265,572-590`).
  *
  * Two implementations with identical semantics:
  *  - `viaMapLiteral`: a `typedLit(Map)` lookup — pure expression, stays
  *    inside whole-stage codegen. Right choice for small dictionaries
  *    (the reference's is 17 entries).
  *  - `viaBroadcastJoin`: left join against a mapping DataFrame with an
  *    explicit `broadcast` hint. Right choice when the dictionary is
  *    large or itself a table; still shuffle-free at 100 TB because the
  *    dimension is broadcast to every executor.
  */
object Recode {

  def viaMapLiteral(c: Column, mapping: Map[String, String]): Column =
    coalesce(typedLit(mapping).getItem(c), c)

  def viaBroadcastJoin(df: DataFrame, column: String,
                       mapping: DataFrame): DataFrame = {
    // mapping schema: (key STRING, value STRING)
    val m = mapping.withColumnRenamed("key", "__recode_key")
      .withColumnRenamed("value", "__recode_value")
    df.join(broadcast(m), df(column) === m("__recode_key"), "left")
      .withColumn(column, coalesce(col("__recode_value"), col(column)))
      .drop("__recode_key", "__recode_value")
  }

  /** The reference's country-normalization dictionary
    * (`normalizaciones_paises`, `/root/reference/main.py:572-590`), kept
    * as data for pipeline fidelity — including its quirks (e.g.
    * 'Hong Kong' → 'Japan'). Unmapped values pass through unchanged.
    */
  val countryRecode: Map[String, String] = Map(
    "British Virgin Islands" -> "United Kingdom",
    "Cayman Islands" -> "United Kingdom",
    "London" -> "United Kingdom",
    "HK" -> "United Kingdom",
    "UK" -> "United Kingdom",
    "San Francisco" -> "United States",
    "California" -> "United States",
    "Las Vegas" -> "United States",
    "US" -> "United States",
    "Virginia" -> "United States",
    "Wilmington" -> "United States",
    "Delaware" -> "United States",
    "Chiba-cho" -> "Japan",
    "Nihonbashi" -> "Japan",
    "Chuo-ku" -> "Japan",
    "Tokyo" -> "Japan",
    "Hong Kong" -> "Japan"
  )
}
