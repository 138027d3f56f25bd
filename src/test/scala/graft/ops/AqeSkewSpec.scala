package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AQE as the runtime complement to Skew.saltedJoin: when one join key
  * dominates, adaptive execution must detect the oversized shuffle
  * partition at runtime and split it (skew-join rewrite) — no manual
  * salting, no plan change in user code. This pins the engine's claim
  * that hot-key joins survive scale-up on stock Spark configuration
  * knobs alone.
  */
class AqeSkewSpec extends AnyFunSuite {

  test("AQE splits a hot-key partition: SortMergeJoin flips to isSkewJoin at runtime") {
    // Session-scoped conf tweaks (newSession shares the context but not
    // runtime SQL conf): thresholds scaled down so the ~MB-sized test
    // skew registers the same way a ~GB hot key would in production.
    val s: SparkSession = TestSpark.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "4")

    // 50k facts, 90% on key 1 (+ padding so the hot partition's bytes
    // clear the scaled-down threshold); dims: one row per key.
    val facts = s.range(0, 50000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100).as("k"),
        lpad(col("id").cast("string"), 64, "x").as("pad"))
    val dims = s.range(0, 100)
      .select(col("id").as("k"), concat(lit("dim"), col("id")).as("name"))

    val joined = facts.join(dims, "k")
    // Execute THIS frame (not a derived count — that is a different
    // query whose adaptive run would leave `joined`'s plan un-finalized).
    assert(joined.collect().length == 50000) // every fact key has a dim row

    val finalPlan = (joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // Plain tree collect stops at materialized query-stage boundaries,
    // so assert on the final-plan rendering: the join must be the skew
    // variant reading split ("AQEShuffleRead skewed") partitions.
    assert(finalPlan.contains("SortMergeJoin"),
      s"expected a sort-merge join, got:\n$finalPlan")
    assert(finalPlan.contains("skew=true") && finalPlan.contains("AQEShuffleRead skewed"),
      s"AQE did not mark the join as skew-handled:\n$finalPlan")
  }
}
