package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the point of q_bucketed_join's layout: with both facts
  * bucketed on the join key (same bucket count) and broadcast disabled,
  * the sort-merge join plans with ZERO shuffle under it — bucket i of
  * each table reads into the same task. This is the plan property a
  * 100-TB fact-to-fact join lives on; the registry query itself only
  * proves result correctness (the oracle is the plain join).
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-to-fact join plans shuffle-free under the sort-merge join") {
    val root = graft.lake.Scratch.dir("graft-bkt-spec")
    CoreQueries19.writeBucketed(spark,
      Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority"),
      "graft_bkt_spec_orders", "o_orderkey", root + "/orders")
    CoreQueries19.writeBucketed(spark,
      Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice"),
      "graft_bkt_spec_lineitem", "l_orderkey", root + "/lineitem")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the sort-merge path (broadcast is also shuffle-free but
      // proves nothing about bucketing); disable AQE so the static
      // plan we inspect is the executed one
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("graft_bkt_spec_orders")
        .join(spark.table("graft_bkt_spec_lineitem"),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect() // materialize so executedPlan is final
      val plan = joined.queryExecution.executedPlan
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a sort-merge join, got:\n$plan")
      val shufflesUnderJoin = smj.flatMap(_.collect { case e: ShuffleExchangeExec => e })
      assert(shufflesUnderJoin.isEmpty,
        s"bucketed join must not shuffle either side:\n$plan")
      // and the layout is invisible in results: same rows as the plain join
      val plain = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
        .join(Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_spec_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_spec_lineitem")
    }
  }
}
