package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's exchanges reshape (`procesamiento_melt_datos_full`,
  * `/root/reference/main.py:195-234`): the CoinLore exchanges endpoint
  * returns ONE wide row of `<id>.<field>` columns, which the reference
  * melts (A1), regex-splits the variable name (A2), and pivots back to
  * one-row-per-id with `aggfunc='first'` (A3).
  *
  * Scale note: a million-column wide row is planner-hostile; `unpivot`
  * of N columns is fine for the reference's ~1.7k but the right 100 TB
  * shape is to never widen — parse the raw JSON object as a map and
  * explode (see `graft.sources.JsonNormalize.explodeWideObject`). Both
  * paths are implemented; ReshapeSpec proves them equivalent.
  */
object Reshape {

  /** A1: melt — all columns except `ids` become (variable, value) rows. */
  def melt(df: DataFrame, ids: Seq[String], variableCol: String = "variable",
           valueCol: String = "value"): DataFrame = {
    // Backtick-quote: melted column names contain literal dots
    // ("<id>.<field>") that a bare col() would parse as struct access.
    val quote = (n: String) => col(s"`${n.replace("`", "")}`")
    val valueCols = df.columns.filterNot(ids.contains).toIndexedSeq
    df.unpivot(ids.map(quote).toArray, valueCols.map(quote).toArray, variableCol, valueCol)
  }

  /** A2: split `"<id>.<field>"` into two columns via regex groups
    * (`variable.str.extract(r'(\d+)\.(.*)')`, `/root/reference/main.py:219`).
    */
  def regexSplitVariable(df: DataFrame, src: String = "variable",
                         idCol: String = "crypto_id"): DataFrame =
    df.withColumn(idCol, regexp_extract(col(src), "(\\d+)\\.(.*)", 1))
      .withColumn(src, regexp_extract(col(src), "(\\d+)\\.(.*)", 2))

  /** A3: pivot long→wide with pandas `aggfunc='first'` semantics — pandas
    * `first` skips NaN, so the match is Spark `first(col, ignoreNulls=true)`.
    * `pivotValues` should be supplied when known (skips the extra
    * distinct-collect job Spark otherwise runs to discover the columns).
    */
  def pivotFirst(df: DataFrame, key: String, variableCol: String,
                 valueCol: String, pivotValues: Seq[String] = Nil): DataFrame = {
    val g = df.groupBy(col(key))
    val p = if (pivotValues.nonEmpty) g.pivot(variableCol, pivotValues)
            else g.pivot(variableCol)
    p.agg(first(col(valueCol), ignoreNulls = true))
  }

  /** The full A1→A3 composite over a one-row-wide exchanges frame. */
  def meltSplitPivot(wide: DataFrame, fields: Seq[String]): DataFrame = {
    val long = melt(wide, Nil)
    val split = regexSplitVariable(long)
    pivotFirst(split, "crypto_id", "variable", "value", fields)
  }
}
