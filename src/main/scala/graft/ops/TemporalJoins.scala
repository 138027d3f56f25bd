package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: AS-OF join and bounded
  * range join — built by composing existing operators (SURVEY §7.3
  * preference order: compose before custom plans).
  *
  * Both avoid the naive O(|L|·|R|) theta-join:
  *  - as-of: union-tag + single window pass — ONE shuffle on
  *    (keys, time), state O(1) per partition stream. This is the
  *    sort-merge as-of shape a native engine would run, expressed with
  *    stock operators so Catalyst/AQE still own scheduling.
  *  - range join: time-bucket banding — each side joins only within
  *    (key, bucket±1), so candidate pairs stay ~linear for bounded
  *    windows; the exact predicate filters inside the band.
  */
object TemporalJoins {

  /** AS-OF join: for each left row, the latest right row with
    * `rightTime <= leftTime` (strictly `<` when `strict`), per key.
    *
    * Implementation: tag both sides, union, window-sort by (keys, time,
    * tag) and carry the last-seen right payload forward with
    * `last(ignoreNulls)`. `payload` columns from the right are returned
    * with an `asof_` prefix; left rows keep all their columns.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String], strict: Boolean = false): DataFrame = {
    val t = "__asof_t"
    val tag = "__asof_tag" // right=0 sorts before left=1 at equal times (non-strict)
    val l = left.withColumn(t, col(leftTime)).withColumn(tag, lit(1))
      .withColumns(payload.map(p => s"__p_$p" -> lit(null).cast(
        right.schema(p).dataType)).toMap)
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as(t) :+ lit(0).as(tag)) ++
        payload.map(p => col(p).as(s"__p_$p")): _*)
    val lAligned = l.select(r.columns.map(col) ++
      left.columns.filterNot(c => r.columns.contains(c)).map(col): _*)
    val unioned = lAligned.unionByName(
      r.withColumns(left.columns.filterNot(c => r.columns.contains(c))
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap))
    val order = if (strict) Seq(col(t), col(tag).desc) else Seq(col(t), col(tag))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, if (strict) -1 else 0)
    val carried = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(s"asof_$p", last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }
    carried.filter(col(tag) === 1)
      .drop((payload.map(p => s"__p_$p") :+ t :+ tag): _*)
  }

  /** Bounded range self/two-table join: pairs (l, r) with the same keys
    * and `|lTime - rTime| <= window`. Banding: join on (keys, coarse
    * bucket) for bucket ∈ {b-1, b, b+1}, then apply the exact predicate.
    * Candidates per row are bounded by 3-bucket density — never all
    * pairs.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTime: String, rightTime: String,
                windowMicros: Long): DataFrame = {
    // left probes its own and both neighbor buckets; right sits in one
    val lBanded = left.withColumn("__t", unix_micros(col(leftTime)))
      .withColumn("__probe", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bucket", (col("__t") / windowMicros).cast("long") + col("__probe"))
      .drop("__probe")
    val rBanded = right.withColumn("__rt", unix_micros(col(rightTime)))
      .withColumn("__bucket", (col("__rt") / windowMicros).cast("long"))
    lBanded.join(rBanded, keys :+ "__bucket")
      .filter(abs(col("__t") - col("__rt")) <= windowMicros)
      .drop("__bucket", "__t", "__rt")
  }
}
