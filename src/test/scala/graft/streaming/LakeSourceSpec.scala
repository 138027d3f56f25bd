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

  test("the sink rejects non-append output modes and partitionBy loudly") {
    val bronzeDir = scratch("graft-lsnk-rej") + "/t"
    VersionedTable(spark, bronzeDir)
      .commitOverwrite(Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[Exception] {
      spark.readStream.format("graft-lake").load(bronzeDir)
        .groupBy("v").count()
        .writeStream.format("graft-lake")
        .outputMode("complete")
        .option("checkpointLocation", scratch("graft-lsnk-rej-ck"))
        .start(scratch("graft-lsnk-rej-out") + "/out")
    }
    assert(e.getMessage.contains("Append output mode only"), e.getMessage)
  }

  test("the source fails loudly on a not-yet-created table instead of streaming nothing") {
    val dir = scratch("graft-lsrc-empty") + "/t"
    val e = intercept[Exception] {
      spark.readStream.format("graft-lake").load(dir)
    }
    assert(e.getMessage != null && e.getMessage.contains("no committed versions"),
      s"got: ${e.getMessage}")
  }
}
