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

  test("r18: the native scan exposes a REAL partitionSchema recovered from the stats layer") {
    val t = fresh()
    t.commitOverwritePartitioned(frame(Seq("a", "b", "c"), 30), Seq("day"))
    val df = t.read()
    // logical column order survives the data/partition schema split
    assert(df.columns.toSeq == Seq("day", "k", "n"))
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1)
    assert(scans.head.relation.partitionSchema.fieldNames.toSeq == Seq("day"))
    // Spark's OWN planner prunes a partition predicate: the scan's
    // selected partitions shrink to one, with no lake-private rule
    val pruned = df.filter(col("day") === "b")
    assert(pruned.count() == 30)
    val ps = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(ps.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition, got ${ps.selectedPartitions.partitionCount}")
    // values come from the directory metadata, not a file read: a
    // partition-column-only projection still answers correctly
    assert(df.select("day").distinct().as[String].collect().sorted.toSeq ==
      Seq("a", "b", "c"))
  }

  test("r18: dynamic partition pruning fires on a star join against the lake fact table") {
    // fact table on the counting filesystem: the pruning proof is which
    // data files execution actually OPENS (AQE's final-plan metric
    // copies aren't driven, so SQL metrics can't carry this assert)
    spark.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", classOf[CountingLocalFs].getName)
    val factDir = Files.createTempDirectory("graft-dpp-fact").toString + "/t"
    // write through the plain scheme (staging's recursive listing), read
    // through the counting one — same directory
    VersionedTable(spark, factDir)
      .commitOverwritePartitioned(frame(Seq("a", "b", "c", "d"), 40), Seq("day"))
    val t = VersionedTable(spark, "cfs://" + factDir)
    // the dim must be FILE-backed with a real Filter node — a local
    // Seq collapses to a LocalRelation and DPP has no selective
    // predicate to hook (exactly the star shape: parquet dim, filtered)
    val dimPath = Files.createTempDirectory("graft-dpp-dim").toString + "/dim"
    Seq(("a", "drop"), ("b", "keep"), ("c", "drop"), ("d", "drop"))
      .toDF("dim_day", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
    val joined = t.read().join(dim, col("day") === col("dim_day"))
    val bFiles = t.candidateFiles(col("day") === "b").toSet
    CountingLocalFs.reset()
    assert(joined.count() == 40)
    // runtime proof: execution opened ONLY the matched partition's data
    // files — the other three partitions were dynamically pruned
    val openedData = CountingLocalFs.openedNames(p =>
      p.endsWith(".parquet") && !p.contains("_graft_log"))
    assert(openedData.nonEmpty && openedData.subsetOf(bFiles),
      s"expected only ${bFiles.size} 'b'-partition files opened, " +
        s"got $openedData")
    // the fact-side scan carries a dynamic-pruning partition filter —
    // the runtime filter a selective dim join injects (unwrap AQE's
    // root to reach the final physical plan)
    val plan = joined.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.partitionSchema.nonEmpty => s
    }.head
    val hasDpp = scan.partitionFilters.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression]))
    assert(hasDpp, s"expected a DynamicPruningExpression in " +
      s"partitionFilters, got ${scan.partitionFilters}")
  }

  test("r18: partitionStats answers partition queries from metadata — zero data files opened") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", classOf[CountingLocalFs].getName)
    val dir = Files.createTempDirectory("graft-pstats").toString + "/t"
    VersionedTable(spark, dir)
      .commitOverwritePartitioned(frame(Seq("a", "b", "c"), 25), Seq("day"))
    val t = VersionedTable(spark, "cfs://" + dir)
    CountingLocalFs.reset()
    val stats = t.partitionStats().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(stats.map(s => (s._1, s._3)).toSeq ==
      Seq(("a", 25L), ("b", 25L), ("c", 25L)))
    assert(stats.forall(s => s._2 >= 1 && s._4 > 0)) // n_files, bytes real
    val openedData = CountingLocalFs.openedNames(p =>
      p.endsWith(".parquet") && !p.contains("_graft_log"))
    assert(openedData.isEmpty,
      s"partitionStats must not open data files, opened: $openedData")
    // DV overlay breaks per-file exactness → honest fallback, same rows
    t.deleteMoR(col("k") === "a#1")
    val after = t.partitionStats().collect()
      .map(r => (r.getString(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(after == Seq(("a", 24L), ("b", 25L), ("c", 25L)))
  }

  test("r18: racing replacePartitions on DISJOINT partitions both land (file-disjoint rebase)") {
    val t = fresh()
    t.commitOverwritePartitioned(frame(Seq("a", "b", "c"), 20), Seq("day"))
    // two writers, two different partitions — their read-sets (the
    // replaced partitions' files) are disjoint, so the optimistic
    // rebase must let the loser retry and land, never abort
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ths = Seq("a", "c").map { day =>
      new Thread(() => try {
        val h = VersionedTable(spark, t.tablePath)
        h.replacePartitions(
          frame(Seq(day), 5).withColumn("n", col("n") * 100))
        ()
      } catch { case e: Throwable => errs.add(e); () })
    }
    ths.foreach(_.start()); ths.foreach(_.join(120000))
    assert(errs.isEmpty, s"racing disjoint replacePartitions failed: " +
      s"${Option(errs.peek()).map(_.getMessage)}")
    val out = t.read().groupBy("day")
      .agg(count(lit(1)).as("n"), sum("n").as("s")).orderBy("day")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // a and c replaced (5 rows each), b untouched (20 rows)
    assert(out == Seq(("a", 5L), ("b", 20L), ("c", 5L)), out.toString)
    assert(t.read().filter(col("day") === "a")
      .agg(max("n")).head().getLong(0) == 500)
  }

  test("r18: over-long string stats truncate conservatively and decline partition recovery") {
    val t = fresh()
    val longA = "a" * 200
    val longB = "b" * 200
    t.commitOverwritePartitioned(
      Seq((longA, 1L), (longB, 2L)).toDF("key", "n"), Seq("key"))
    // stats truncated: pruning still conservative — the right file is
    // always kept (correctness), even though values exceed the cap
    assert(t.readWhere(col("key") === longA).count() == 1)
    assert(t.readWhere(col("key") === longB).select("n").as[Long].head() == 2L)
    // a truncated pair can never claim min == max, so the partition
    // fast path declines instead of mis-recovering values
    assert(t.partitionTuplesInternal(None).isEmpty)
    assert(t.read().queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head.relation.partitionSchema.isEmpty)
    // and the stored stats really are bounded
    val probe = t.candidateFiles(col("key") === ("a" * 64))
    assert(probe.nonEmpty) // prefix-range keeps the longA file
  }
}
