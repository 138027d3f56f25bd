package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Scale lint over the whole query registry: an unpartitioned Window
  * funnels every row through ONE task ("WindowExec: No Partition
  * Defined"), which is correct on test data and fatal at corpus scale.
  * Guards the q_pack_sequences two-pass prefix-sum rewrite (llm.Packing)
  * against regressing back to the single OVER-clause formulation.
  */
class PlanLintSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Documented exceptions — each has an explicit scale note at its
    * definition site and a dimension-bounded input (hundreds of rows).
    */
  private val allow = Set("q_lead_ntile", "q_null_ordering")

  test("no registered query plans an unpartitioned Window outside the allowlist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if !allow(name) &&
        fn(spark, sf).queryExecution.optimizedPlan.collectFirst {
          case w: LogicalWindow if w.partitionSpec.isEmpty => w
        }.nonEmpty => name
    }
    assert(offenders.isEmpty,
      s"unpartitioned (single-task) Window in: ${offenders.mkString(", ")}")
  }
}
