package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** r17: partition columns on the VERSIONED lake. Partition columns are
  * ordinary schema columns that additionally shape the file layout —
  * every data file holds exactly ONE partition-value combination — so
  * a partition predicate prunes to exactly the partition's files
  * through the ordinary stats layer, and replacePartitions swaps whole
  * partitions while every other partition's files survive BY IDENTITY.
  */
class PartitionedLakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = VersionedTable(spark,
    Files.createTempDirectory("graft-part").toString + "/t")

  private def frame(days: Seq[String], perDay: Int) =
    days.flatMap(d => (1 to perDay).map(i => (d, s"$d#$i", i.toLong)))
      .toDF("day", "k", "n")

  test("files never mix partition values; a partition predicate plans exactly the partition's files") {
    val t = fresh()
    t.commitOverwritePartitioned(frame(Seq("a", "b", "c"), 50), Seq("day"))
    assert(t.partitionColumns() == Seq("day"))
    // one-value-per-file: every file's rows carry a single `day`
    t.snapshotDataFiles().foreach { f =>
      val days = spark.read.parquet(s"${t.tablePath}/$f")
        .select("day").distinct().as[String].collect().toSeq
      assert(days.size == 1, s"file $f mixes partition values: $days")
    }
    // EXACT pruning: the candidate set for day='b' is precisely the
    // files holding 'b' rows — not a superset
    val bFiles = t.snapshotDataFiles().filter { f =>
      spark.read.parquet(s"${t.tablePath}/$f")
        .filter(col("day") === "b").limit(1).count() > 0
    }.toSet
    assert(t.candidateFiles(col("day") === "b").toSet == bFiles,
      "partition-predicate pruning must plan exactly the partition's files")
    assert(bFiles.nonEmpty && bFiles.size < t.snapshotDataFiles().size)
    // appends keep the layout
    t.commitAppend(frame(Seq("b", "d"), 10))
    t.snapshotDataFiles().foreach { f =>
      assert(spark.read.parquet(s"${t.tablePath}/$f")
        .select("day").distinct().count() == 1)
    }
    assert(t.read().count() == 170)
  }

  test("replacePartitions swaps exactly the batch's partitions; neighbors survive by file identity") {
    val t = fresh()
    t.commitOverwritePartitioned(frame(Seq("a", "b", "c"), 20), Seq("day"))
    val before = t.snapshotDataFiles()
    val aFiles = before.filter(f => spark.read.parquet(s"${t.tablePath}/$f")
      .filter(col("day") === "a").limit(1).count() > 0).toSet
    val cFiles = before.filter(f => spark.read.parquet(s"${t.tablePath}/$f")
      .filter(col("day") === "c").limit(1).count() > 0).toSet
    // replace partitions a and b with fresh content (different sizes)
    val v = t.replacePartitions(frame(Seq("a"), 5).unionByName(frame(Seq("b"), 7)))
    assert(v.nonEmpty)
    val after = t.snapshotDataFiles().toSet
    // untouched partition c: every file survives BY IDENTITY
    assert(cFiles.subsetOf(after), "partition c's files must survive the overwrite")
    // replaced partition a: none of its old files remain
    assert(aFiles.intersect(after).isEmpty, "partition a's old files must be gone")
    // content: a=5, b=7, c=20
    assert(t.read().groupBy("day").count().as[(String, Long)].collect().toMap ==
      Map("a" -> 5L, "b" -> 7L, "c" -> 20L))
    // time travel to the pre-replace version still shows the old content
    assert(t.read(Some(0)).filter(col("day") === "a").count() == 20)
    // empty batch is a no-op
    assert(t.replacePartitions(frame(Nil, 0)).isEmpty)
    // idempotent variant: a replayed batch id commits nothing
    assert(t.replacePartitionsIdempotent(frame(Seq("b"), 1), "rp", 1L).nonEmpty)
    assert(t.replacePartitionsIdempotent(frame(Seq("b"), 9), "rp", 1L).isEmpty)
    assert(t.read().filter(col("day") === "b").count() == 1)
  }

  test("partitioning is fixed at creation; partition-column DDL is refused") {
    val t = fresh()
    t.commitOverwritePartitioned(frame(Seq("a"), 3), Seq("day"))
    intercept[Exception] {
      t.commitOverwritePartitioned(frame(Seq("a"), 3), Seq("k"))
    }
    intercept[Exception] { t.renameColumn("day", "dt") }
    intercept[Exception] { t.dropColumn("day") }
    intercept[Exception] { t.replacePartitions(frame(Seq("a"), 1).drop("day")) }
    // unpartitioned tables refuse replacePartitions loudly
    val u = fresh()
    u.commitOverwrite(Seq((1L, "x")).toDF("id", "v"))
    intercept[Exception] { u.replacePartitions(Seq((1L, "y")).toDF("id", "v")) }
  }

  test("table properties ride the commit log: set/unset, persist across writes and restore") {
    val t = fresh()
    t.commitOverwrite(Seq((1L, "a")).toDF("id", "v"))
    assert(t.properties().isEmpty)
    t.setProperties(Seq("owner.team" -> "data-eng", "retention.days" -> "30"))
    assert(t.properties().toMap ==
      Map("owner.team" -> "data-eng", "retention.days" -> "30"))
    // properties persist across content commits (definition, not content)
    t.commitAppend(Seq((2L, "b")).toDF("id", "v"))
    t.commitOverwrite(Seq((3L, "c")).toDF("id", "v"))
    assert(t.properties().toMap.size == 2)
    // upsert + unset
    t.setProperties(Seq("retention.days" -> "7"))
    assert(t.properties().toMap.apply("retention.days") == "7")
    t.unsetProperties(Seq("owner.team"))
    assert(t.properties().toMap == Map("retention.days" -> "7"))
    // restore rolls back CONTENT, not definition
    t.restore(0)
    assert(t.read().select("id").as[Long].collect().toSeq == Seq(1L))
    assert(t.properties().toMap == Map("retention.days" -> "7"))
  }
}
