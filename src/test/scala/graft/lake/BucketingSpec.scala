package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Bucketed co-located joins: the SURVEY §7 "pre-partition big joins"
  * lever. Writing both join sides bucketed+sorted on the key lets
  * sort-merge join run with ZERO Exchange — the physical plan proof that
  * repeated fact-fact joins at 100 TB can amortize their shuffle into
  * the write.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle (no Exchange in the plan)") {
    // external tables via explicit path — no warehouse config needed
    val wh = Files.createTempDirectory("graft-bucket").toString
    val sf = "/root/testdata/sf0.001"
    // force SMJ (the fixtures are small enough to auto-broadcast, which
    // would hide the bucketing effect this test is about)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {

    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // bucketed+sorted on the join key on both sides, and the groupBy is
    // on the bucket key too: the whole plan runs with ZERO Exchange
    assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join + bucket-key agg should not shuffle at all, plan:\n$plan")

    assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
