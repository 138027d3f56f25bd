package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.graft.{DotProductF, SumSqF}

/** Native Catalyst expressions for embedding math over `array<float>`.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) evaluate their
  * lambdas interpreted — measured ~10× slower than generated code on the
  * similarity hot path. These expressions generate a tight primitive loop
  * via `doGenCode` (and a matching interpreted `nullSafeEval` fallback),
  * accumulating in double left-to-right — the same order as both the HOF
  * formulation and DuckDB's list kernels, so results are bit-identical
  * and oracle comparisons are unaffected.
  */
object VectorExpressions {
  /** Σ aᵢ·bᵢ in double over two float arrays (length = min of the two). */
  def dotF(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductF(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Σ xᵢ² in double over a float array. */
  def sumSqF(v: Column): Column =
    GraftColumnBridge.column(SumSqF(GraftColumnBridge.expression(v)))
}
