package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** The reference's Silver-layer cleaning pass, re-expressed as Catalyst
  * expressions (reference: `/root/reference/main.py:253-332`).
  *
  * Semantics preserved from pandas (SURVEY.md §2.5):
  *  - F4  `replace('', np.nan)`      → empty string → NULL
  *  - F6  `fillna('Sin Dato')`       → string null-fill
  *  - F7  `fillna(0)`                → numeric null-fill
  *  - F8  `pd.to_numeric(errors='coerce')` → `try_cast` (Spark 4 runs ANSI
  *        mode ON by default; a plain cast would *throw* where pandas
  *        coerces to NaN — `try_cast` restores coerce-to-null)
  *  - F9  `.round(3)` — pandas rounds half-to-even → `bround`, not `round`
  *  - F11 `'{:.3f}'.format(x)` → `format_string("%.3f", x)` (NOT
  *        `format_number`, which inserts thousands separators pandas lacks)
  *
  * Everything is a single `select` projection (P4): one whole-stage-codegen
  * span, no per-column `withColumn` plan bloat, no UDFs.
  */
object Cleaning {

  /** F4: '' → NULL for the given string columns. */
  def emptyToNull(c: Column): Column = when(c === lit(""), lit(null)).otherwise(c)

  /** F8+F7+F9: lenient numeric coercion, zero-fill, half-even round(3). */
  def coerceNumeric(c: Column, scale: Int = 3): Column =
    bround(coalesce(c.try_cast(DoubleType), lit(0.0)), scale)

  /** F4+F6: empty→null→'Sin Dato' for string columns. */
  def fillString(c: Column, default: String = "Sin Dato"): Column =
    coalesce(emptyToNull(c), lit(default))

  /** F11: fixed 3-decimal string format, no grouping separators. */
  def formatFixed(c: Column, scale: Int = 3): Column =
    format_string(s"%.${scale}f", c.cast(DoubleType))

  /** The full Silver pass (`procesamiento_datos_incremental`,
    * `/root/reference/main.py:298-342`): dispatch per column — numeric
    * columns coerce+fill+round, string columns empty→null→fill. One
    * projection over the whole schema.
    */
  def silverClean(df: DataFrame, numericCols: Set[String]): DataFrame = {
    val projected = df.schema.fields.map { f =>
      if (numericCols.contains(f.name)) coerceNumeric(col(f.name)).as(f.name)
      else if (f.dataType == StringType) fillString(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** P3: the reference's column-count guard (`main.py:209-210`) — fail
    * loudly instead of print-and-swallow.
    */
  def requireColumns(df: DataFrame, atLeast: Int): DataFrame = {
    require(df.columns.length >= atLeast,
      s"expected >= $atLeast columns, got ${df.columns.length}")
    df
  }
}
