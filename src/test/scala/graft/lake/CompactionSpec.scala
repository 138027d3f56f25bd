package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (known Morton codes)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(Compaction.zValue(col("x"), col("y"), 8).as("z"))
    // z(5,3) = x bits {0,2} at even slots + y bits {0,1} at odd slots
    //        = (1 + 16) + (2 + 8) = 27
    assert(df.as[Long].collect().toSeq == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("zorderLayout yields non-overlapping z-ranges per partition") {
    val df = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val laid = Compaction.zorderLayout(df, col("x"), col("y"), bits = 6, numFiles = 8)
      .withColumn("z", Compaction.zValue(col("x"), col("y"), 6))
    val ranges = laid
      .select(spark_partition_id().as("p"), col("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // clustering is lossless
    assert(laid.count() == 4096)
  }

  test("compact bin-packs many small files into few, preserving rows") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      .repartition(50).write.parquet(in)
    val (before, after, rows) = Compaction.compact(spark, in, out, targetRowsPerFile = 500)
    assert(before == 50 && rows == 1000L)
    assert(after == 2)
    val got = spark.read.parquet(out).agg(sum("id")).as[Long].head()
    assert(got == (0L until 1000L).sum)
  }

  test("r19: compactSmallFiles folds ONLY the small files; big files survive by identity") {
    val dir = Files.createTempDirectory("graft-compact-small").toString + "/t"
    val t = VersionedTable(spark, dir)
    // 2 big files (500 rows each) + 12 tiny appends (1 row each)
    t.commitOverwrite(spark.range(0, 1000).toDF("id").repartitionByRange(2, col("id")))
    val bigFiles = t.snapshotDataFiles().toSet
    (0 until 12).foreach(i =>
      t.commitAppend(Seq(10000L + i).toDF("id")))
    assert(t.snapshotDataFiles().size == 14)
    val v = t.compactSmallFiles(targetRowsPerFile = 400, minSmallFiles = 4)
    assert(v.nonEmpty)
    val after = t.snapshotDataFiles()
    // big files untouched BY IDENTITY; the 12 tiny ones folded into 1
    assert(bigFiles.subsetOf(after.toSet), "compact rewrote a big file")
    assert(after.size == 3, s"expected 2 big + 1 compacted, got ${after.size}")
    assert(t.read().count() == 1012)
    assert(t.history().last._2 == "compact")
    // idempotent hygiene: nothing small left => no-op
    assert(t.compactSmallFiles(400, 4).isEmpty)
    // below the floor: no-op (2 tiny files are cheaper than a commit)
    t.commitAppend(Seq(20000L).toDF("id"))
    t.commitAppend(Seq(20001L).toDF("id"))
    assert(t.compactSmallFiles(400, 4).isEmpty)
  }
}
