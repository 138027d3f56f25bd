package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.graft.TopNgramCountExpr

/** Native per-row text-repetition expressions (see
  * [[org.apache.spark.sql.graft.TopNgramCountExpr]]): per-document
  * metrics computed in the scan pass instead of through exploded
  * keyed aggregation.
  */
object TextExpressions {
  /** Max frequency of any word n-gram in `text` (≥1; whole text counts
    * as one gram when shorter than n tokens).
    */
  def topNgramCount(text: Column, n: Int): Column =
    GraftColumnBridge.column(TopNgramCountExpr(
      GraftColumnBridge.expression(text), n))
}
