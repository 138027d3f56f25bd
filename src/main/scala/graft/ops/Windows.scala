package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's Gold-layer window aggregation
  * (`columnas_agregacion`, `/root/reference/main.py:345-388`):
  * grouped lag-difference (A6) and grouped running sum (A5) after a
  * multi-key sort (A7).
  *
  * Scale notes (100 TB): both ops are a single shuffle on the group key —
  * `Window.partitionBy(grp)` — with partition-local sorting; no global
  * sort is ever needed (the reference's `sort_values` is global only
  * because pandas has no partitions). Skewed group keys (one coin with
  * billions of rows) would need key-salting + a two-level rollup; for
  * running sums that changes semantics, so the real lever is
  * range-partitioning within the group via AQE.
  */
object Windows {

  /** A6: `groupby(grp)[c].diff().fillna(df[c])` — per-group lag-1
    * difference; the first row of each group falls back to its own value
    * (pandas' NaN-fillna behavior).
    */
  def groupedDiff(df: DataFrame, grp: Seq[String], order: Seq[Column],
                  cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(grp.map(col): _*).orderBy(order: _*)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(s"diff_$c", coalesce(col(c) - lag(col(c), 1).over(w), col(c)))
    }
  }

  /** A5: `groupby(grp)[c].cumsum()` — per-group running total with the
    * implicit rows-between(unboundedPreceding, currentRow) frame.
    */
  def groupedCumsum(df: DataFrame, grp: Seq[String], order: Seq[Column],
                    cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(grp.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(s"cumsum_$c", sum(col(c)).over(w))
    }
  }

  /** A5+A6+A7 composite, mirroring `columnas_agregacion`'s argument shape:
    * sort keys are `grp ++ diffCols ++ cumsumCols` (the reference orders by
    * the *value* columns, `/root/reference/main.py:373` — reproduced
    * verbatim), plus caller-supplied tiebreakers for determinism (pandas'
    * stable sort has no Spark equivalent, so ties must be broken
    * explicitly).
    */
  def goldAggregate(df: DataFrame, grp: String, diffCols: Seq[String],
                    cumsumCols: Seq[String], tiebreak: Seq[String]): DataFrame = {
    val order = (diffCols ++ cumsumCols ++ tiebreak).map(col)
    val d1 = groupedDiff(df, Seq(grp), order, diffCols)
    groupedCumsum(d1, Seq(grp), order, cumsumCols)
  }
}
