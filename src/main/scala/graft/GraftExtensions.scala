package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{DotProductF, SumSqF}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions with the SQL function registry so they're usable from
  * `spark.sql` as well as the Column API, and injects the engine's
  * algebraic optimizer rules (e.g. `dot_f(a,a)` → `sum_sq_f(a)`,
  * [[org.apache.spark.sql.graft.DotSelfToSumSq]]).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * programmatically via `SparkSession.builder.withExtensions`. The
  * driver's Verify/Bench sessions don't set it, so every registered
  * query uses the Column API (`VectorExpressions`) directly — the
  * extension exists for the SQL front door and is covered by
  * ExtensionsSpec.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "dot_f takes 2 arguments")
        DotProductF(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sum_sq_f"),
      new ExpressionInfo(classOf[SumSqF].getName, "sum_sq_f"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "sum_sq_f takes 1 argument")
        SumSqF(children.head)
      }))
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.DotSelfToSumSq)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.RangeJoinBanding)
  }
}
