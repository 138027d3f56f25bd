package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Plan-level proof of the scan-efficiency levers: filter pushdown,
  * column pruning, static partition pruning, and dynamic partition
  * pruning (DPP) against LayerWriter-partitioned data.
  */
class PruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("filters and projections reach the parquet scan (PushedFilters + ReadSchema)") {
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") > lit("1996-01-01 00:00:00"))
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[.*GreaterThan\\(l_shipdate.*"),
      s"shipdate filter not pushed:\n$plan")
    // column pruning: the scan reads only the 3 needed columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_extendedprice"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("static partition pruning on a LayerWriter-partitioned table") {
    val base = Files.createTempDirectory("graft-prune").toString
    val target = LayerPath(base, "Silver", "t", "events_p")
    val ev = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .drop("ts") // nanos column not needed; keep the test focused
    LayerWriter.write(ev, target, LayerWriter.Overwrite, partitionCol = Some("day"))

    val pruned = LayerWriter.read(spark, target).filter(col("day") === "2024-01-05")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    // partition filter present on the scan, not a post-scan Filter
    assert(scan.contains("PartitionFilters") && scan.contains("day"),
      s"partition filter missing from scan:\n$scan")
    assert(pruned.count() > 0)
  }

  test("dynamic partition pruning: fact partitions pruned by a filtered dim join") {
    val base = Files.createTempDirectory("graft-dpp").toString
    // fact partitioned by nationkey-as-string; dim filtered to one nation
    val fact = Tables.customer(spark, sf)
      .withColumn("nk", col("c_nationkey").cast("string"))
    LayerWriter.write(fact, LayerPath(base, "f", "t", "cust_p"),
      LayerWriter.Overwrite, partitionCol = Some("nk"))
    val dim = Tables.nation(spark, sf).filter(col("n_name") === "JAPAN")
      .withColumn("nk", col("n_nationkey").cast("string"))

    val joined = LayerWriter.read(spark, LayerPath(base, "f", "t", "cust_p"))
      .join(dim, Seq("nk"))
      .select("c_custkey", "n_name")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("SubqueryBroadcast")
        || plan.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning in plan:\n$plan")
  }
}
