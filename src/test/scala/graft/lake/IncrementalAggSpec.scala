package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("folding batches incrementally equals aggregating everything at once") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"), col("value"))
    val statePath = Files.createTempDirectory("graft-incr").toString + "/agg"

    // feed in three arbitrary slices
    val slices = Seq(
      events.filter(col("value") < 30),
      events.filter(col("value") >= 30 && col("value") < 60),
      events.filter(col("value") >= 60))
    slices.foreach { b =>
      IncrementalAgg.update(spark, statePath, b,
        col("day"), col("event_type"), col("value"))
    }

    val vt = VersionedTable(spark, statePath)
    assert(vt.versions() == Seq(0, 1, 2)) // one auditable version per refresh

    val incr = IncrementalAgg.finalize(vt.read())
      .select(col("bucket").cast("string"), col("key"), col("n"),
        round(col("vsum"), 6), round(col("vavg"), 6))
      .as[(String, String, Long, Double, Double)].collect().toSet
    val direct = IncrementalAgg.finalize(
        IncrementalAgg.partials(events, col("day"), col("event_type"), col("value")))
      .select(col("bucket").cast("string"), col("key"), col("n"),
        round(col("vsum"), 6), round(col("vavg"), 6))
      .as[(String, String, Long, Double, Double)].collect().toSet
    assert(incr == direct)
  }

  test("empty-state bootstrap and single-batch update work") {
    val statePath = Files.createTempDirectory("graft-incr2").toString + "/agg"
    val batch = Seq((1L, "a", 2.0), (1L, "a", 4.0), (2L, "b", 10.0))
      .toDF("d", "k", "v")
    IncrementalAgg.update(spark, statePath, batch, col("d"), col("k"), col("v"))
    val out = IncrementalAgg.finalize(VersionedTable(spark, statePath).read())
      .as[(Long, String, Long, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out((1L, "a"))._3 == 2L && out((1L, "a"))._7 == 3.0) // n, avg
    assert(out((2L, "b"))._6 == 10.0) // max
  }
}
