package graft.lake

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Completes the storage-layout evidence beside BucketedJoinSpec:
  * a LayerWriter `partitionBy` layout must turn an equality filter on
  * the partition column into PARTITION PRUNING — the scan plans with a
  * partition filter and reads only the matching directory's files,
  * never the table. At 100 TB this is the difference between reading
  * one event type and reading all of them; the layout claim in
  * LayerWriter's scaladoc ("the 100 TB partition-pruning lever") is
  * asserted here instead of trusted.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("equality filter on the partition column prunes to one directory's files") {
    val target = LayerPath(Scratch.dir("graft-prune"), "silver", "events", "by_type")
    LayerWriter.write(
      Tables.events(spark, sf).select("event_id", "event_type", "value"),
      target, partitionCol = Some("event_type"))

    val all = LayerWriter.read(spark, target)
    val nTypes = all.select("event_type").distinct().count()
    assert(nTypes > 1, "fixture must have several partition values")

    def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
      df.collect()
      val scans = df.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, s"no file scan in:\n${df.queryExecution.executedPlan}")
      scans.head
    }

    val full = scanOf(all.select("event_id"))
    val pruned = scanOf(
      all.filter(col("event_type") === "click").select("event_id"))

    // the filter must reach the scan as a PARTITION filter (directory
    // pruning), not a post-scan predicate over all files
    assert(pruned.partitionFilters.nonEmpty,
      s"no partition filter on the scan:\n$pruned")
    val fullFiles = full.metrics("numFiles").value
    val prunedFiles = pruned.metrics("numFiles").value
    assert(prunedFiles > 0 && prunedFiles < fullFiles,
      s"expected pruned file count in (0, $fullFiles), got $prunedFiles")

    // pruning must be invisible in results
    assert(all.filter(col("event_type") === "click").count() ==
      Tables.events(spark, sf).filter(col("event_type") === "click").count())
  }
}
