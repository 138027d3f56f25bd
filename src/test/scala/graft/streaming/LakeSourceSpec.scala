package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.VersionedTable

/** The `graft-lake` Structured Streaming SOURCE
  * (org.apache.spark.sql.graft.GraftLakeSourceProvider): the versioned
  * lake consumed as a live change-feed stream with ENGINE-checkpointed
  * offsets (offset = commit version) — the trigger-driven completion
  * of ChangeFeedReader's poll API, and the read-side mirror of
  * EventStreams' exactly-once lake sink.
  */
class LakeSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scratch(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("readStream.format(graft-lake) delivers the change feed incrementally; batches equal changesBetween") {
    val dir = scratch("graft-lsrc") + "/t"
    val ckpt = scratch("graft-lsrc-ckpt")
    val t = VersionedTable(spark, dir)
    t.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))   // v0
    t.commitAppend(Seq((3L, "c")).toDF("id", "v"))                 // v1

    val got = ArrayBuffer.empty[(Long, Seq[(Long, String, Int, String)])]
    val q = spark.readStream.format("graft-lake").load(dir)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        val rows = df.select("id", "v", "_commit_version", "_change_type")
          .as[(Long, String, Int, String)].collect().sorted.toSeq
        got.synchronized { got += ((id, rows)); () }
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()

    // initial batch: the SNAPSHOT at the head as inserts (Delta's
    // starting-snapshot behavior), tagged with the head version
    assert(got.size == 1 && got.head._2 ==
      Seq((1L, "a", 1, "insert"), (2L, "b", 1, "insert"), (3L, "c", 1, "insert")))

    // appends while the stream runs: delivered incrementally, never rescanned
    t.commitAppend(Seq((4L, "d")).toDF("id", "v"))                 // v2
    q.processAllAvailable()
    assert(got.size == 2)
    assert(got(1)._2 == Seq((4L, "d", 2, "insert")))

    // a MoR delete surfaces as exactly its marked delete rows
    t.deleteMoR(col("id") === 2L)                                  // v3
    q.processAllAvailable()
    assert(got.size == 3)
    assert(got(2)._2 == Seq((2L, "b", 3, "delete")))
    q.stop()
  }

  test("lake-to-lake stream is exactly-once across a crash-replayed micro-batch (checkpointed offsets + idempotent sink)") {
    val bronzeDir = scratch("graft-lsrc-b") + "/bronze"
    val silverDir = scratch("graft-lsrc-s") + "/silver"
    val ckpt = scratch("graft-lsrc-ck")
    val bronze = VersionedTable(spark, bronzeDir)
    bronze.commitOverwrite(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "value"))

    // Bronze→Silver driven by a REAL streaming query: the engine
    // checkpoints the consumed commit version; the sink appends
    // idempotently keyed by the micro-batch id
    def run(checkpoint: String) =
      spark.readStream.format("graft-lake").load(bronzeDir)
        .writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          val silver = VersionedTable(spark, silverDir)
          val ins = df.filter(col("_change_type") === "insert")
            .select(col("id"), col("value"))
          silver.commitAppendIdempotent(ins, "lake2lake", id)
          ()
        }
        .option("checkpointLocation", checkpoint)
        .start()

    val q1 = run(ckpt); q1.processAllAvailable(); q1.stop()
    val silver = VersionedTable(spark, silverDir)
    assert(silver.read().count() == 2)
    assert(silver.lastCommittedBatch("lake2lake").contains(0L))

    // crash at the worst moment: the sink landed batch 0 but the engine
    // died before recording it complete. Fresh-JVM restart = clone the
    // checkpoint (Spark caches metadata logs per path in-JVM), drop the
    // engine's commit marker, restart — batch 0 re-delivers with the
    // SAME id and range, and the sink's ledger makes it a no-op.
    val ckpt2 = scratch("graft-lsrc-ck2")
    java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt)).forEach { p =>
      val dst = java.nio.file.Paths.get(ckpt2)
        .resolve(java.nio.file.Paths.get(ckpt).relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    assert(new java.io.File(new java.io.File(ckpt2, "commits"), "0").delete())
    new java.io.File(new java.io.File(ckpt2, "commits"), ".0.crc").delete()

    // new bronze data arrives while the query is down
    bronze.commitAppend(Seq((3L, 3.0)).toDF("id", "value"))

    val q2 = run(ckpt2); q2.processAllAvailable(); q2.stop()
    // no duplicates from the replay; the new commit landed exactly once
    assert(silver.read().select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(silver.historyDF().orderBy("version")
      .select("txn_app", "txn_batch").as[(String, Long)].collect().toSeq ==
      Seq(("lake2lake", 0L), ("lake2lake", 1L)))
  }

  test("initial batch is the SNAPSHOT, not a history replay: pre-start deletes never surface") {
    val dir = scratch("graft-lsrc-snap") + "/t"
    val ckpt = scratch("graft-lsrc-snap-ckpt")
    val t = VersionedTable(spark, dir)
    t.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))   // v0
    t.deleteMoR(col("id") === 2L)                                  // v1
    // a history replay would deliver insert(2) + delete(2); an
    // insert-only consumer would resurrect the deleted row
    val got = ArrayBuffer.empty[Seq[(Long, String)]]
    val q = spark.readStream.format("graft-lake").load(dir)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.filter(col("_change_type") === "insert")
          .select("id", "v").as[(Long, String)].collect().sorted.toSeq
        got.synchronized { got += rows; () }
      }
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable(); q.stop()
    assert(got.flatten.toSeq == Seq((1L, "a")))
  }

  test("a fresh stream bootstraps on a table whose early versions a vacuum stranded") {
    val dir = scratch("graft-lsrc-vac") + "/t"
    val ckpt = scratch("graft-lsrc-vac-ckpt")
    val t = VersionedTable(spark, dir)
    t.commitOverwrite(Seq((1L, "a")).toDF("id", "v"))
    t.commitOverwrite(Seq((2L, "b")).toDF("id", "v"))
    t.commitOverwrite(Seq((3L, "c")).toDF("id", "v"))
    t.vacuum(retainVersions = 2, minAgeMs = 0L)   // horizon = v1
    // changesBetween(-1, head) would fail below the horizon; the
    // snapshot-shaped initial batch needs none of the stranded files
    val got = ArrayBuffer.empty[Seq[Long]]
    val q = spark.readStream.format("graft-lake").load(dir)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.select("id").as[Long].collect().sorted.toSeq
        got.synchronized { got += rows; () }
      }
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable(); q.stop()
    assert(got.flatten.toSeq == Seq(3L))
  }

  test("mid-stream DDL: an added column is invisible (schema fixed at start); a rename fails the query loudly") {
    val dir = scratch("graft-lsrc-ddl") + "/t"
    val t = VersionedTable(spark, dir)
    t.commitOverwrite(Seq((1L, "a")).toDF("id", "v"))
    def start(ckpt: String) = {
      val got = ArrayBuffer.empty[Seq[Long]]
      val q = spark.readStream.format("graft-lake").load(dir)
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          val rows = df.select("id").as[Long].collect().toSeq
          got.synchronized { got += rows; () }
        }
        .option("checkpointLocation", ckpt).start()
      (q, got)
    }
    val (q1, got1) = start(scratch("graft-lsrc-ddl-ck1"))
    q1.processAllAvailable()
    // schema EVOLUTION mid-stream: the stream's schema is fixed at
    // start, so the new column simply doesn't surface — no failure,
    // the pinned projection carries on
    t.commitAppend(Seq((2L, "b", 9.0)).toDF("id", "v", "extra"),
      allowNewColumns = true)
    q1.processAllAvailable()
    assert(got1.flatten.sorted == Seq(1L, 2L))
    // a RENAME breaks the pinned projection: the LIVE query fails
    // loudly on its next batch instead of silently streaming the
    // wrong shape (a fresh start simply adopts the new schema)
    t.renameColumn("v", "label")
    t.commitAppend(Seq((3L, "c", 1.0)).toDF("id", "label", "extra"))
    val e = intercept[Exception] {
      q1.processAllAvailable()
      q1.stop()
    }
    assert(e.getMessage != null, "rename under a live stream must fail it")
  }

  test("format-string lake-to-lake: source AND sink via format(graft-lake), exactly-once across a crash replay") {
    val bronzeDir = scratch("graft-lsnk-b") + "/bronze"
    val silverDir = scratch("graft-lsnk-s") + "/silver"
    val ckpt = scratch("graft-lsnk-ck")
    val bronze = VersionedTable(spark, bronzeDir)
    bronze.commitOverwrite(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "value"))

    // no foreachBatch anywhere: the engine carries the offsets, the
    // sink carries the delivery ledger
    def run(checkpoint: String) =
      spark.readStream.format("graft-lake").load(bronzeDir)
        .filter(col("_change_type") === "insert")
        .drop("_commit_version", "_change_type")
        .writeStream.format("graft-lake")
        .option("appId", "l2l")
        .option("checkpointLocation", checkpoint)
        .start(silverDir)

    val q1 = run(ckpt); q1.processAllAvailable(); q1.stop()
    val silver = VersionedTable(spark, silverDir)
    assert(silver.read().select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    assert(silver.lastCommittedBatch("l2l").contains(0L))

    // crash between the sink's commit and the engine's marker: clone
    // the checkpoint, drop the marker, restart — the re-delivered
    // batch 0 must no-op on the sink's ledger
    val ckpt2 = scratch("graft-lsnk-ck2")
    java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt)).forEach { p =>
      val dst = java.nio.file.Paths.get(ckpt2)
        .resolve(java.nio.file.Paths.get(ckpt).relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    assert(new java.io.File(new java.io.File(ckpt2, "commits"), "0").delete())
    new java.io.File(new java.io.File(ckpt2, "commits"), ".0.crc").delete()
    bronze.commitAppend(Seq((3L, 3.0)).toDF("id", "value"))

    val q2 = run(ckpt2); q2.processAllAvailable(); q2.stop()
    assert(silver.read().select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(silver.historyDF().orderBy("version")
      .select("txn_app", "txn_batch").as[(String, Long)].collect().toSeq ==
      Seq(("l2l", 0L), ("l2l", 1L)))
  }

  test("Complete mode: a streaming aggregation lands as idempotent overwrites, exactly-once across a crash replay") {
    val bronzeDir = scratch("graft-lsnk-cm-b") + "/bronze"
    val goldDir = scratch("graft-lsnk-cm-g") + "/gold"
    val ckpt = scratch("graft-lsnk-cm-ck")
    val bronze = VersionedTable(spark, bronzeDir)
    bronze.commitOverwrite(
      Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "value"))

    def run(checkpoint: String) =
      spark.readStream.format("graft-lake").load(bronzeDir)
        .filter(col("_change_type") === "insert")
        .groupBy("k").agg(count(lit(1)).as("n"), sum("value").as("vsum"))
        .writeStream.format("graft-lake")
        .outputMode("complete")
        .option("appId", "cm")
        .option("checkpointLocation", checkpoint)
        .start(goldDir)

    val q1 = run(ckpt)
    q1.processAllAvailable()
    bronze.commitAppend(Seq(("b", 4.0)).toDF("k", "value"))
    q1.processAllAvailable()
    q1.stop()
    val gold = VersionedTable(spark, goldDir)
    def state() = gold.read().select("k", "n", "vsum")
      .as[(String, Long, Double)].collect().sorted.toSeq
    assert(state() == Seq(("a", 2L, 3.0), ("b", 2L, 7.0)))
    assert(gold.history().map(_._2) == Seq("overwrite", "overwrite"))
    assert(gold.historyDF().orderBy("version")
      .select("txn_app", "txn_batch").as[(String, Long)].collect().toSeq ==
      Seq(("cm", 0L), ("cm", 1L)))

    // crash between the sink's overwrite and the engine's marker:
    // clone the checkpoint, drop batch 1's marker, restart — the
    // re-delivered batch recomputes the same aggregate and must NO-OP
    // on the ledger instead of stacking a third overwrite
    val ckpt2 = scratch("graft-lsnk-cm-ck2")
    java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt)).forEach { p =>
      val dst = java.nio.file.Paths.get(ckpt2)
        .resolve(java.nio.file.Paths.get(ckpt).relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    assert(new java.io.File(new java.io.File(ckpt2, "commits"), "1").delete())
    new java.io.File(new java.io.File(ckpt2, "commits"), ".1.crc").delete()
    val q2 = run(ckpt2); q2.processAllAvailable(); q2.stop()
    assert(gold.history().size == 2, "replayed Complete batch re-committed")
    assert(state() == Seq(("a", 2L, 3.0), ("b", 2L, 7.0)))
  }

  test("Update mode: each batch replaces exactly its keys' rows via scoped overwrite; unchanged keys survive") {
    val bronzeDir = scratch("graft-lsnk-up-b") + "/bronze"
    val goldDir = scratch("graft-lsnk-up-g") + "/gold"
    val bronze = VersionedTable(spark, bronzeDir)
    bronze.commitOverwrite(
      Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("k", "value"))
    val q = spark.readStream.format("graft-lake").load(bronzeDir)
      .filter(col("_change_type") === "insert")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("value").as("vsum"))
      .writeStream.format("graft-lake")
      .outputMode("update")
      .option("updateKeys", "k")
      .option("appId", "up")
      .option("checkpointLocation", scratch("graft-lsnk-up-ck"))
      .start(goldDir)
    try {
      q.processAllAvailable()            // batch 0: seeds the state
      bronze.commitAppend(Seq(("a", 4.0)).toDF("k", "value"))
      q.processAllAvailable()            // batch 1: ONLY key 'a' changed
    } finally q.stop()
    val gold = VersionedTable(spark, goldDir)
    // first batch seeds (overwrite on the empty table); the incremental
    // batch is a FILE-scoped swap of exactly the hit files (r17's
    // distributed scope), never a full rewrite
    assert(gold.history().map(_._2) == Seq("overwrite", "replaceFiles"))
    assert(gold.read().select("k", "n", "vsum")
      .as[(String, Long, Double)].collect().sorted.toSeq ==
      Seq(("a", 2L, 5.0), ("b", 1L, 2.0), ("c", 1L, 3.0)))
    assert(gold.historyDF().orderBy("version")
      .select("txn_app", "txn_batch").as[(String, Long)].collect().toSeq ==
      Seq(("up", 0L), ("up", 1L)))
  }

  test("r18: partitionOverwrite=dynamic sink — each batch swaps exactly its partitions, replay-exact") {
    val bronzeDir = scratch("graft-lsnk-po-b") + "/bronze"
    val goldDir = scratch("graft-lsnk-po-g") + "/gold"
    val bronze = VersionedTable(spark, bronzeDir)
    bronze.commitOverwrite(
      Seq(("d1", 1L, 10.0), ("d2", 2L, 20.0)).toDF("day", "id", "v"))
    // the target must be a PARTITIONED table (partitioning fixed at
    // creation — the sink swaps whole partitions)
    val gold = VersionedTable(spark, goldDir)
    gold.commitOverwritePartitioned(
      Seq(("d1", 0L, 0.0), ("d2", 0L, 0.0), ("d3", 0L, 0.0))
        .toDF("day", "id", "v"), Seq("day"))
    val d3Files = gold.candidateFiles(col("day") === "d3").toSet
    val q = spark.readStream.format("graft-lake").load(bronzeDir)
      .filter(col("_change_type") === "insert")
      .select("day", "id", "v")
      .writeStream.format("graft-lake")
      .outputMode("append")
      .option("partitionOverwrite", "dynamic")
      .option("appId", "po")
      .option("checkpointLocation", scratch("graft-lsnk-po-ck"))
      .start(goldDir)
    try {
      q.processAllAvailable()  // batch 0: reloads d1 and d2
      bronze.commitAppend(Seq(("d1", 3L, 30.0)).toDF("day", "id", "v"))
      q.processAllAvailable()  // batch 1: reloads ONLY d1
    } finally q.stop()
    // d3 was never in any batch: its seed files survive BY IDENTITY
    assert(d3Files.subsetOf(gold.snapshotDataFiles().toSet),
      "untouched partition's files must survive the streaming reloads")
    // batch 1 replaced d1 wholesale (not appended): only the batch row
    assert(gold.read().filter(col("day") === "d1")
      .select("id", "v").as[(Long, Double)].collect().toSeq ==
      Seq((3L, 30.0)))
    assert(gold.read().filter(col("day") === "d2")
      .select("id").as[Long].collect().toSeq == Seq(2L))
    // the ledger carries both batches; a restarted query replays nothing
    assert(gold.historyDF().filter(col("txn_app") === "po").count() == 2)
    assert(gold.replacePartitionsIdempotent(
      Seq(("d1", 99L, 9.9)).toDF("day", "id", "v"), "po", 1L).isEmpty)
  }

  test("Update sink at 100k distinct keys: file-scoped, no cap, untouched files survive, replay commits nothing (r17)") {
    import org.apache.spark.sql.graft.GraftLakeSink
    import org.apache.spark.sql.streaming.OutputMode
    val goldDir = scratch("graft-lsnk-big") + "/gold"
    val gold = VersionedTable(spark, goldDir)
    // 150k-key state, range-partitioned into 6 files so key stats are
    // tight per file — the shape the distributed scope join prunes on
    gold.commitOverwrite((0L until 150000L).map(k => (k, 1L, k * 1.0))
      .toDF("k", "n", "vsum").repartitionByRange(6, col("k")))
    val files0 = gold.snapshotDataFiles()
    // which files hold ONLY keys >= 120000 (must survive untouched)
    val upperFiles = files0.filter { f =>
      spark.read.parquet(s"$goldDir/$f").agg(min("k")).head.getLong(0) >= 120000L
    }.toSet
    assert(upperFiles.nonEmpty, "fixture: need at least one upper-range file")
    // the batch updates 100k DISTINCT keys — 10× the r16 cap that made
    // the sink refuse this batch outright
    val batch = (0L until 100000L).map(k => (k, 2L, k * 2.0))
      .toDF("k", "n", "vsum")
    val sink = new GraftLakeSink(spark, goldDir, "bigup",
      OutputMode.Update(), Seq("k"))
    sink.addBatch(0, batch)
    // landed SCOPED (a file swap), never a full overwrite
    assert(gold.history().map(_._2) == Seq("overwrite", "replaceFiles"),
      s"100k-key batch must land file-scoped: ${gold.history().map(_._2)}")
    // files the batch's key range cannot touch survive BY IDENTITY
    assert(upperFiles.subsetOf(gold.snapshotDataFiles().toSet),
      "untouched upper-range files must survive the Update batch")
    // content: 100k keys updated, 50k untouched
    assert(gold.read().count() == 150000L)
    assert(gold.read().filter(col("n") === 2L).count() == 100000L)
    assert(gold.read().filter(col("k") >= 100000L && col("n") === 1L)
      .count() == 50000L)
    // engine-shaped replay of the SAME batch id: the txn ledger makes
    // it commit nothing
    val vBefore = gold.latestVersion()
    sink.addBatch(0, batch)
    assert(gold.latestVersion() == vBefore, "replayed batch re-committed")
  }

  test("the sink rejects Update without updateKeys, and partitionBy, loudly") {
    val bronzeDir = scratch("graft-lsnk-rej") + "/t"
    VersionedTable(spark, bronzeDir)
      .commitOverwrite(Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[Exception] {
      spark.readStream.format("graft-lake").load(bronzeDir)
        .groupBy("v").count()
        .writeStream.format("graft-lake")
        .outputMode("update")
        .option("appId", "rej")
        .option("checkpointLocation", scratch("graft-lsnk-rej-ck"))
        .start(scratch("graft-lsnk-rej-out") + "/out")
    }
    assert(e.getMessage.contains("updateKeys"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.readStream.format("graft-lake").load(bronzeDir)
        .drop("_commit_version", "_change_type")
        .writeStream.format("graft-lake")
        .partitionBy("v")
        .option("appId", "rej2")
        .option("checkpointLocation", scratch("graft-lsnk-rej-ck2"))
        .start(scratch("graft-lsnk-rej-out2") + "/out")
    }
    assert(e2.getMessage.contains("partitionBy"), e2.getMessage)
  }

  test("a commit backlog lands as BOUNDED micro-batches (maxCommitsPerTrigger), and a kill/restart mid-backlog resumes exactly") {
    val dir = scratch("graft-lsrc-bk") + "/t"
    val ckpt = scratch("graft-lsrc-bk-ckpt")
    val t = VersionedTable(spark, dir)
    t.commitOverwrite(Seq((0L, "seed")).toDF("id", "v"))           // v0

    // run 1: consume the snapshot, then go down
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Long, Int)]]()
    val failAt = new java.util.concurrent.atomic.AtomicLong(-1L)
    def run() = spark.readStream.format("graft-lake")
      .option("maxCommitsPerTrigger", 2)
      .load(dir)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        val rows = df.select("id", "_commit_version")
          .as[(Long, Int)].collect().sorted.toSeq
        got.put(id, rows)
        if (id == failAt.get()) sys.error("injected crash mid-backlog")
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = run(); q1.processAllAvailable(); q1.stop()
    assert(got.size == 1) // the snapshot batch

    // a 10-commit backlog accumulates while the query is down
    (1L to 10L).foreach(i => t.commitAppend(Seq((i, s"r$i")).toDF("id", "v")))

    // run 2: the backlog must arrive as ceil(10/2)=5 BOUNDED batches,
    // each spanning at most 2 versions and ending on a version
    // boundary — and we kill the query on its 3rd backlog batch
    failAt.set(3L)
    val q2 = run()
    intercept[Exception] { q2.processAllAvailable(); q2.awaitTermination() }
    // run 3: restart resumes at the checkpoint — the killed batch
    // re-delivers with the SAME id and range (map overwrite), the rest
    // follows; no loss, no duplicates
    failAt.set(-1L)
    val q3 = run(); q3.processAllAvailable(); q3.stop()

    val batches = got.asInstanceOf[java.util.Map[Long, Seq[(Long, Int)]]]
    val ids = batches.keySet().toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
    assert(ids.toSeq == (0L to 5L), s"expected 6 batch ids, got ${ids.toSeq}")
    // every backlog batch is bounded: at most 2 commit versions
    (1L to 5L).foreach { id =>
      val vs = batches.get(id).map(_._2).distinct
      assert(vs.nonEmpty && vs.size <= 2, s"batch $id spanned versions $vs")
    }
    // exactly-once across the kill: the union is precisely the table
    val all = (0L to 5L).flatMap(id => batches.get(id).map(_._1)).sorted
    assert(all == (0L to 10L), s"lost/duplicated rows: $all")
  }

  test("maxBytesPerTrigger bounds a backlog by LOG-RECORDED bytes: one fat commit lands alone, thin ones group; kill/restart exact") {
    val dir = scratch("graft-lsrc-bb") + "/t"
    val ckpt = scratch("graft-lsrc-bb-ckpt")
    val t = VersionedTable(spark, dir)
    t.commitOverwrite(Seq((0L, "seed")).toDF("id", "v"))            // v0

    val got = new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Long, Int)]]()
    val failAt = new java.util.concurrent.atomic.AtomicLong(-1L)
    def run(budget: Long) = spark.readStream.format("graft-lake")
      .option("maxBytesPerTrigger", budget)
      .load(dir)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        val rows = df.select("id", "_commit_version")
          .as[(Long, Int)].collect().sorted.toSeq
        got.put(id, rows)
        if (id == failAt.get()) sys.error("injected crash mid-byte-backlog")
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()

    // consume the snapshot first so the backlog below is pure
    // commit-phase admission (budget irrelevant for this drain)
    val q0 = run(Long.MaxValue >> 1); q0.processAllAvailable(); q0.stop()
    assert(got.size == 1)

    // backlog: 3 thin commits, ONE fat commit, 3 more thin ones
    (1L to 3L).foreach(i => t.commitAppend(Seq((i, s"r$i")).toDF("id", "v")))
    t.commitAppend((100L to 4099L).map(i => (i, s"fat$i")).toDF("id", "v")
      .repartition(1))                                              // v4, fat
    (5L to 7L).foreach(i => t.commitAppend(Seq((i, s"r$i")).toDF("id", "v")))

    // budget from the LOG's own accounting: 3 thin commits fit, the
    // fat one exceeds it on its own (and must still make progress)
    val thinBytes = (1 to 3).map(v => t.commitChangedBytes(v)).max
    val fatBytes = t.commitChangedBytes(4)
    val budget = thinBytes * 3 + 2
    assert(fatBytes > budget,
      s"test setup: fat commit ($fatBytes B) must exceed the budget ($budget B)")

    failAt.set(2L) // die on the batch after the first backlog batch
    val q1 = run(budget)
    intercept[Exception] { q1.processAllAvailable(); q1.awaitTermination() }
    failAt.set(-1L)
    val q2 = run(budget); q2.processAllAvailable(); q2.stop()

    val ids = got.keySet().toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq
    assert(ids.size >= 4, s"byte budget did not split the backlog: $ids")
    // every backlog batch respects the budget — or is a single
    // oversized commit admitted alone for progress
    ids.filter(_ >= 1L).foreach { id =>
      val vs = got.get(id).map(_._2).distinct.sorted
      val bytes = vs.map(t.commitChangedBytes).sum
      assert(bytes <= budget || vs.size == 1,
        s"batch $id spans versions $vs with $bytes B over the $budget B budget")
    }
    // the fat commit's version shares its batch with no other version
    val fatBatch = ids.find(id => got.get(id).exists(_._2 == 4)).get
    assert(got.get(fatBatch).map(_._2).distinct == Seq(4),
      s"fat commit must land alone, got versions ${got.get(fatBatch).map(_._2).distinct}")
    // exactly-once across the kill: the union is precisely the table
    val all = ids.flatMap(id => got.get(id).map(_._1)).sorted
    assert(all == (Seq(0L) ++ (1L to 3L) ++ (100L to 4099L) ++ (5L to 7L)).sorted,
      "lost/duplicated rows across the byte-budgeted kill/restart")
  }

  test("the initial snapshot is CHUNKED by maxFilesPerTrigger; a crash mid-bootstrap resumes at the last chunk") {
    val dir = scratch("graft-lsrc-ch") + "/t"
    val ckpt = scratch("graft-lsrc-ch-ckpt")
    val t = VersionedTable(spark, dir)
    // 8 data files: a bootstrap at maxFilesPerTrigger=3 must land as
    // ceil(8/3) = 3 checkpointable batches, never one giant scan
    t.commitOverwrite((1L to 80L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(8))
    assert(t.snapshotDataFiles().size == 8)

    val got = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    val failAt = new java.util.concurrent.atomic.AtomicLong(1L)
    def run() = spark.readStream.format("graft-lake")
      .option("maxFilesPerTrigger", 3)
      .load(dir)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        val vs = df.select("_commit_version").distinct().as[Int].collect().toSeq
        assert(vs.forall(_ == 0), s"bootstrap rows must tag the pinned version, got $vs")
        got.put(id, df.select("id").as[Long].collect().sorted.toSeq)
        if (id == failAt.get()) sys.error("injected crash mid-bootstrap")
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    // run 1 dies on its second chunk; the first chunk's offset is
    // checkpointed — the restart must NOT redo it
    val q1 = run()
    intercept[Exception] { q1.processAllAvailable(); q1.awaitTermination() }
    failAt.set(-1L)
    val q2 = run(); q2.processAllAvailable(); q2.stop()

    val ids = got.keySet().toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
    assert(ids.toSeq == Seq(0L, 1L, 2L), s"expected 3 bootstrap chunks, got ${ids.toSeq}")
    (0L to 2L).foreach(id => assert(got.get(id).nonEmpty, s"chunk $id empty"))
    val all = (0L to 2L).flatMap(id => got.get(id)).sorted
    assert(all == (1L to 80L), s"bootstrap lost/duplicated rows")
  }

  test("Trigger.AvailableNow drains the WHOLE backlog as bounded batches and terminates (SupportsTriggerAvailableNow)") {
    val dir = scratch("graft-lsrc-an") + "/t"
    val t = VersionedTable(spark, dir)
    // 9 one-file commits: a rate-limited source without the
    // AvailableNow contract would have its FIRST bounded offset pinned
    // as the run's target — one chunk delivered, the rest silently
    // skipped, query 'successfully' terminated
    t.commitOverwrite(Seq((0L, "seed")).toDF("id", "v"))
    (1L to 8L).foreach(i => t.commitAppend(Seq((i, s"r$i")).toDF("id", "v")))
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    val q = spark.readStream.format("graft-lake")
      .option("maxFilesPerTrigger", 3)
      .load(dir)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        got.put(id, df.select("id").as[Long].collect().sorted.toSeq); ()
      }
      .option("checkpointLocation", scratch("graft-lsrc-an-ck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000L), "AvailableNow query must terminate")
    val ids = got.keySet().toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
    assert(ids.length >= 3, s"a 9-file bootstrap at maxFilesPerTrigger=3 " +
      s"must land as >= 3 bounded batches, got ${ids.toSeq}")
    val all = ids.flatMap(got.get(_)).sorted.toSeq
    assert(all == (0L to 8L), s"AvailableNow under-consumed: $all")
  }

  test("Trigger.Once ignores the per-trigger caps: one batch, everything (the Kafka/Delta Once contract)") {
    val dir = scratch("graft-lsrc-once") + "/t"
    val t = VersionedTable(spark, dir)
    t.commitOverwrite(Seq((0L, "seed")).toDF("id", "v"))
    (1L to 6L).foreach(i => t.commitAppend(Seq((i, s"r$i")).toDF("id", "v")))
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    val q = spark.readStream.format("graft-lake")
      .option("maxFilesPerTrigger", 2)
      .load(dir)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        got.put(id, df.select("id").as[Long].collect().sorted.toSeq); ()
      }
      .option("checkpointLocation", scratch("graft-lsrc-once-ck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    assert(q.awaitTermination(120000L), "Once query must terminate")
    assert(got.size == 1, s"Trigger.Once must deliver ONE batch, got ${got.size}")
    assert(got.get(0L) == (0L to 6L), s"Once under-consumed: ${got.get(0L)}")
  }

  test("startingVersion streams the feed from that version (no snapshot); below the vacuum horizon it fails loudly at start") {
    val dir = scratch("graft-lsrc-sv") + "/t"
    val t = VersionedTable(spark, dir)
    t.commitOverwrite(Seq((1L, "a")).toDF("id", "v"))              // v0
    t.commitAppend(Seq((2L, "b")).toDF("id", "v"))                 // v1
    t.commitAppend(Seq((3L, "c")).toDF("id", "v"))                 // v2
    t.deleteMoR(col("id") === 2L)                                  // v3

    val got = ArrayBuffer.empty[(Long, Int, String)]
    val q = spark.readStream.format("graft-lake")
      .option("startingVersion", 2)
      .load(dir)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.select("id", "_commit_version", "_change_type")
          .as[(Long, Int, String)].collect().toSeq
        got.synchronized { got ++= rows; () }
      }
      .option("checkpointLocation", scratch("graft-lsrc-sv-ck")).start()
    q.processAllAvailable(); q.stop()
    // the feed from v2 inclusive == changesBetween(1, head), multiset
    val expect = t.changesBetween(1, 3)
      .select("id", "_commit_version", "_change_type")
      .as[(Long, Int, String)].collect().toSeq
    assert(got.sorted.toSeq == expect.sorted.toSeq)
    assert(got.forall(_._2 >= 2), "nothing before startingVersion may surface")

    // two overwrites orphan every pre-v4 file (the MoR-delete version
    // v3 still references the originals, so ONE overwrite strands
    // nothing); the vacuum then writes a horizon — a feed from v1 is
    // no longer reconstructible
    t.commitOverwrite(Seq((9L, "z")).toDF("id", "v"))              // v4
    t.commitOverwrite(Seq((10L, "w")).toDF("id", "v"))             // v5
    t.vacuum(retainVersions = 2, minAgeMs = 0L)
    assert(t.changeFeedFloor() > 1, "fixture must strand v1")
    // createSource runs on the stream thread, so the loud failure
    // surfaces through the query, not through .start()
    val e = intercept[Exception] {
      val bad = spark.readStream.format("graft-lake")
        .option("startingVersion", 1)
        .load(dir)
        .writeStream
        .foreachBatch { (_: DataFrame, _: Long) => () }
        .option("checkpointLocation", scratch("graft-lsrc-sv-ck2")).start()
      try bad.processAllAvailable() finally bad.stop()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("vacuum horizon"), chain(e))
  }

  test("the source fails loudly on a not-yet-created table instead of streaming nothing") {
    val dir = scratch("graft-lsrc-empty") + "/t"
    val e = intercept[Exception] {
      spark.readStream.format("graft-lake").load(dir)
    }
    assert(e.getMessage != null && e.getMessage.contains("no committed versions"),
      s"got: ${e.getMessage}")
  }

  test("r19: optimizeWrite + autoCompact bound the file count across a many-batch run") {
    val bronzeDir = scratch("graft-hyg-b") + "/bronze"
    val ctlDir = scratch("graft-hyg-c") + "/ctl"
    val hygDir = scratch("graft-hyg-h") + "/hyg"
    val bronze = VersionedTable(spark, bronzeDir)
    bronze.commitOverwrite(spark.range(0, 8).toDF("id").repartition(4))

    def run(out: String, ckpt: String, hygiene: Boolean) = {
      var w = spark.readStream.format("graft-lake").load(bronzeDir)
        .filter(col("_change_type") === "insert")
        .drop("_commit_version", "_change_type")
        .writeStream.format("graft-lake")
        .option("appId", if (hygiene) "hyg" else "ctl")
        .option("maxCommitsPerTrigger", "1")
        .option("checkpointLocation", ckpt)
      if (hygiene) w = w.option("optimizeWrite", "true")
        .option("optimizeWrite.targetRows", "100000")
        .option("autoCompact.every", "8")
        .option("autoCompact.minFiles", "4")
      w.start(out)
    }
    val qc = run(ctlDir, scratch("graft-hyg-ck1"), hygiene = false)
    val qh = run(hygDir, scratch("graft-hyg-ck2"), hygiene = true)
    (1 to 20).foreach { i =>
      bronze.commitAppend(spark.range(i * 100L, i * 100L + 8).toDF("id")
        .repartition(4))
      qc.processAllAvailable(); qh.processAllAvailable()
    }
    qc.stop(); qh.stop()
    val ctl = VersionedTable(spark, ctlDir)
    val hyg = VersionedTable(spark, hygDir)
    // identical content...
    assert(hyg.read().select("id").as[Long].collect().sorted.toSeq ==
      ctl.read().select("id").as[Long].collect().sorted.toSeq)
    assert(hyg.read().count() == 168)
    // ...but bounded files: the control leaves one-file-per-partition-
    // per-batch litter, hygiene coalesces each batch AND folds the
    // residue every 8 batches
    val ctlFiles = ctl.snapshotDataFiles().size
    val hygFiles = hyg.snapshotDataFiles().size
    assert(ctlFiles >= 20, s"control fixture too small: $ctlFiles files")
    assert(hygFiles <= 8, s"hygiene left $hygFiles files (control: $ctlFiles)")
    assert(hyg.history().map(_._2).contains("compact"),
      "auto-compact never ran")
    // replay safety intact: the ledger carries every batch exactly once
    assert(hyg.lastCommittedBatch("hyg").contains(20L))
  }
}
