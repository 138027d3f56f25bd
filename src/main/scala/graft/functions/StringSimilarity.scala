package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.graft.JaroWinklerExpr

/** Native string-similarity expressions for record linkage (see
  * [[org.apache.spark.sql.graft.JaroWinklerExpr]] for semantics). The
  * Column API mirrors `functions.levenshtein`, which covers the
  * edit-distance half of the linkage toolkit natively.
  */
object StringSimilarity {
  /** Jaro–Winkler similarity in [0, 1]; DuckDB-equivalent semantics. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinklerExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
