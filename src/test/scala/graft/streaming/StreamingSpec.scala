package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
case class Doc(doc_id: Long, ts: Timestamp, text: String)

/** Batch-mode session_window reference for the stateful-session
  * equivalence test (same output shape as statefulSessionAgg).
  */
object EventStreamsBatchRef {
  def nativeSessions(events: org.apache.spark.sql.DataFrame,
                     gap: String): Set[(Long, String, Long, Double)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n"), sum("value").as("tv"))
      .select(col("user_id"), col("sw.start").cast("string"), col("n"), col("tv"))
      .as[(Long, String, Long, Double)].collect().toSet
  }
}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("streaming dedup within watermark drops re-delivered event_ids") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.dedupWithinWatermark(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    input.addData(Ev(1, ts(1), 1, 1.0), Ev(2, ts(2), 1, 2.0), Ev(1, ts(1), 1, 1.0))
    q.processAllAvailable()
    input.addData(Ev(2, ts(3), 1, 2.0), Ev(3, ts(4), 1, 3.0))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted.toSeq
    q.stop()
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("streaming content dedup drops re-posted text under fresh ids, within and across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = EventStreams.dedupByContentSignature(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("content_dedup_out")
      .outputMode("append").start()
    val boiler = "alpha beta gamma delta epsilon zeta eta theta"
    input.addData(Doc(1, ts(1), boiler), Doc(2, ts(2), boiler),
      Doc(3, ts(3), "completely different words in this one"))
    q.processAllAvailable()
    input.addData(Doc(4, ts(4), boiler)) // re-post in a LATER batch, same content
    q.processAllAvailable()
    val ids = spark.table("content_dedup_out").select("doc_id")
      .as[Long].collect().sorted.toSeq
    q.stop()
    assert(ids == Seq(1L, 3L), s"survivors: $ids")
  }

  test("streaming content dedup state survives a checkpoint restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cd-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cd-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-cd-out").toString
    val boiler = "alpha beta gamma delta epsilon zeta eta theta"
    val batch1 = Seq(Doc(1, ts(1), boiler),
      Doc(2, ts(2), "completely different words in this one")).toDF()
    batch1.write.mode("append").parquet(dir)
    def run() = EventStreams.dedupByContentSignature(
        spark.readStream.schema(batch1.schema).parquet(dir), "1 hour")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = run(); q1.processAllAvailable(); q1.stop()
    // a content dup arrives while the query is DOWN; the restarted query
    // must recover the signature state from the checkpoint and drop it
    Seq(Doc(3, ts(3), boiler), Doc(4, ts(4), "genuinely novel text arrives here"))
      .toDF().write.mode("append").parquet(dir)
    val q2 = run(); q2.processAllAvailable(); q2.stop()
    val ids = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L), s"survivors after restart: $ids")
  }

  test("transformWithState running totals accumulate across micro-batches (RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB provider; scope it to this
    // query and restore the default for the other suites.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Ev]
      val q = EventStreams.runningTotals(input.toDF())
        .writeStream.format("memory").queryName("tws_out").outputMode("update").start()
      input.addData(Ev(1, ts(1), 1, 1.0), Ev(2, ts(2), 1, 2.0), Ev(3, ts(3), 2, 5.0))
      q.processAllAvailable()
      input.addData(Ev(4, ts(4), 1, 4.0), Ev(5, ts(5), 3, 7.0))
      q.processAllAvailable()
      // Latest update per user wins: state accumulated across batches.
      val last = spark.table("tws_out")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("total_value"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.total_value"))
        .as[(Long, Long, Double)].collect()
        .map { case (u, n, t) => u -> ((n, t)) }.toMap
      q.stop()
      assert(last(1L) == ((3L, 7.0)))  // 1.0 + 2.0, then + 4.0
      assert(last(2L) == ((1L, 5.0)))
      assert(last(3L) == ((1L, 7.0)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("tumbling windows close when the watermark passes (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumble_out").outputMode("append").start()
    input.addData(Ev(1, ts(1), 1, 1.0), Ev(2, ts(8), 1, 2.0))
    q.processAllAvailable()
    // advance event time far enough to close the first window
    input.addData(Ev(3, ts(30), 1, 3.0))
    q.processAllAvailable()
    input.addData(Ev(4, ts(59), 1, 4.0))
    q.processAllAvailable()
    val rows = spark.table("tumble_out")
      .select(col("window_start").cast("string"), col("n_events"))
      .as[(String, Long)].collect().toMap
    q.stop()
    assert(rows("2024-01-01 00:00:00") == 2L)
  }

  test("late data beyond the watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("late_out").outputMode("append").start()
    input.addData(Ev(1, ts(1), 1, 1.0))
    q.processAllAvailable()
    input.addData(Ev(2, ts(40), 1, 2.0)) // watermark → 00:35
    q.processAllAvailable()
    input.addData(Ev(3, ts(2), 1, 9.0)) // 39 minutes late → dropped
    q.processAllAvailable()
    input.addData(Ev(4, ts(59), 1, 4.0))
    q.processAllAvailable()
    val first = spark.table("late_out")
      .filter(col("window_start") === ts(0)).select("n_events").as[Long].collect()
    q.stop()
    assert(first.toSeq == Seq(1L)) // the late event never lands
  }

  test("file-source stream: new parquet files are picked up incrementally with checkpointing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val batch1 = Seq(Ev(1, ts(1), 1, 1.0), Ev(2, ts(2), 1, 2.0)).toDF()
    batch1.write.mode("append").parquet(dir)

    val stream = spark.readStream.schema(batch1.schema).parquet(dir)
    val q = EventStreams.dedupWithinWatermark(stream, "10 minutes")
      .writeStream.format("memory").queryName("file_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("file_out").count() == 2)
    // a second file arrives — only its new ids land
    Seq(Ev(2, ts(2), 1, 2.0), Ev(3, ts(3), 1, 3.0)).toDF()
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    val ids = spark.table("file_out").select("event_id").as[Long].collect().sorted.toSeq
    q.stop()
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("stream-stream interval join pairs purchases with preceding clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = EventStreams.clicksLeadingToPurchase(
      clicks.toDF(), purchases.toDF(), horizon = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    clicks.addData(Ev(1, ts(5), 1, 1.0), Ev(2, ts(50), 1, 1.0), Ev(3, ts(8), 2, 1.0))
    purchases.addData(Ev(100, ts(20), 1, 9.0))
    q.processAllAvailable()
    val rows = spark.table("ss_join")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    q.stop()
    // click 1 (t=5, same user, within 30m before t=20) matches;
    // click 2 is AFTER the purchase; click 3 is another user
    assert(rows == Set((100L, 1L)))
  }

  test("left-outer interval join emits unmatched purchases after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = EventStreams.purchasesWithOptionalClick(
      clicks.toDF(), purchases.toDF(), horizon = "30 minutes", lateness = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ss_outer")
      .outputMode("append").start()
    // user 1 purchases with a preceding click; user 2 purchases with none
    clicks.addData(Ev(1, ts(5), 1, 1.0))
    purchases.addData(Ev(100, ts(20), 1, 9.0), Ev(101, ts(20), 2, 9.0))
    q.processAllAvailable()
    val matched = spark.table("ss_outer")
      .select("purchase_id", "click_id").as[(Long, Option[Long])].collect().toSet
    // inner match emits immediately; the null row must NOT have emitted
    // yet (a click could still arrive within lateness)
    assert(matched == Set((100L, Some(1L))))
    // advance both watermarks far past the join window: the unmatched
    // purchase can now prove no-match and emit its outer row
    clicks.addData(Ev(9, ts(120), 9, 1.0))
    purchases.addData(Ev(900, ts(120), 9, 1.0))
    q.processAllAvailable()
    clicks.addData(Ev(10, ts(180), 9, 1.0))
    purchases.addData(Ev(901, ts(180), 9, 1.0))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("ss_outer")
      .select("purchase_id", "click_id").as[(Long, Option[Long])].collect().toSet
    assert(all.contains((101L, None)))
  }

  test("full-outer interval join emits unmatched rows from BOTH sides after watermarks pass") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = EventStreams.clickPurchaseFullOuter(
      clicks.toDF(), purchases.toDF(), horizon = "30 minutes", lateness = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ss_full")
      .outputMode("append").start()
    // user 1: click + purchase (inner match); user 2: purchase with no
    // click; user 3: click that leads to no purchase
    clicks.addData(Ev(1, ts(5), 1, 1.0), Ev(2, ts(5), 3, 1.0))
    purchases.addData(Ev(100, ts(20), 1, 9.0), Ev(101, ts(20), 2, 9.0))
    q.processAllAvailable()
    val matched = spark.table("ss_full")
      .select("purchase_id", "click_id").as[(Option[Long], Option[Long])]
      .collect().toSet
    // only the inner match may have emitted; both outer rows await
    // the opposite side's watermark proof
    assert(matched == Set((Some(100L), Some(1L))))
    // advance both watermarks far past every join window
    clicks.addData(Ev(9, ts(120), 9, 1.0))
    purchases.addData(Ev(900, ts(120), 9, 1.0))
    q.processAllAvailable()
    clicks.addData(Ev(10, ts(180), 9, 1.0))
    purchases.addData(Ev(901, ts(180), 9, 1.0))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("ss_full")
      .select("user_id", "purchase_id", "click_id")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(all.contains((2L, Some(101L), None)), "unmatched purchase must emit a null click")
    assert(all.contains((3L, None, Some(2L))), "unmatched click must emit a null purchase")
  }

  test("foreachBatch sink lands micro-batches via insert-only merge (replay-safe)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val target = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString
    val q = EventStreams.writeToLayer(input.toDF(), target, Seq("event_id"), ckpt)
    input.addData(Ev(1, ts(1), 1, 1.0), Ev(2, ts(2), 1, 2.0))
    q.processAllAvailable()
    // re-delivery of id 2 in a later batch: merge drops it
    input.addData(Ev(2, ts(2), 1, 2.0), Ev(3, ts(3), 1, 3.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.read.parquet(target).select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("flatMapGroupsWithState sessions: gap split, timeout close, agg values") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.statefulSessionAgg(input.toDF(),
        gapMs = 30 * 60 * 1000L, lateness = "5 minutes")
      .writeStream.format("memory").queryName("fmgws_out").outputMode("append").start()
    // session 1: two events 10 min apart for user 1; user 2 gets one
    input.addData(Ev(1, ts(1), 1, 1.0), Ev(2, ts(11), 1, 2.0), Ev(3, ts(5), 2, 5.0))
    q.processAllAvailable()
    assert(spark.table("fmgws_out").isEmpty) // nothing closed yet
    // jump event time past gap+lateness: sessions time out and emit
    input.addData(Ev(4, Timestamp.valueOf("2024-01-01 02:00:00"), 1, 3.0))
    q.processAllAvailable()
    input.addData(Ev(5, Timestamp.valueOf("2024-01-01 04:00:00"), 3, 0.0))
    q.processAllAvailable()
    val rows = spark.table("fmgws_out")
      .select(col("user_id"), col("session_start").cast("string"),
        col("n_events"), col("total_value"))
      .as[(Long, String, Long, Double)].collect().toSet
    q.stop()
    assert(rows.contains((1L, "2024-01-01 00:01:00", 2L, 3.0)))
    assert(rows.contains((2L, "2024-01-01 00:05:00", 1L, 5.0)))
    // the 02:00 event for user 1 closed as its own session too
    assert(rows.contains((1L, "2024-01-01 02:00:00", 1L, 3.0)))
  }

  test("stateful sessions agree with native session_window on a replayed batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val evs = (0 until 40).map { i =>
      Ev(i, ts(i * 2 % 60), 1L + i % 3, i.toDouble) // spread over 3 users
    }
    val q = EventStreams.statefulSessionAgg(input.toDF(),
        gapMs = 10 * 60 * 1000L, lateness = "1 minute")
      .writeStream.format("memory").queryName("fmgws_eq").outputMode("append").start()
    input.addData(evs: _*)
    q.processAllAvailable()
    input.addData(Ev(99, Timestamp.valueOf("2024-01-01 06:00:00"), 99, 0.0)) // flush
    q.processAllAvailable()
    q.stop()
    val stateful = spark.table("fmgws_eq")
      .filter(col("user_id") < 90)
      .select(col("user_id"), col("session_start").cast("string"),
        col("n_events"), col("total_value"))
      .as[(Long, String, Long, Double)].collect().toSet
    val native = EventStreamsBatchRef.nativeSessions(
      spark.createDataset(evs).toDF(), "10 minutes")
    assert(stateful == native)
  }

  test("exactly-once lake sink: a replayed batch commits nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xo-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-xo-ckpt").toString
    val target = java.nio.file.Files.createTempDirectory("graft-xo-t").toString + "/t"
    val b0 = Seq(Ev(1, ts(1), 1, 1.0), Ev(2, ts(2), 1, 2.0)).toDF()
    b0.write.mode("append").parquet(dir)
    val q1 = EventStreams.writeToVersionedExactlyOnce(
      spark.readStream.schema(b0.schema).parquet(dir), target, "app-xo", ckpt)
    q1.processAllAvailable()
    q1.stop()
    val vt = graft.lake.VersionedTable(spark, target)
    assert(vt.read().count() == 2)
    assert(vt.lastCommittedBatch("app-xo").contains(0L))

    // Simulate failover at the worst moment: the sink committed batch 0
    // to the lake, but the engine crashed BEFORE recording the batch
    // complete. A restarted driver is a fresh JVM, so clone the
    // checkpoint to a new path (Spark caches metadata logs per path
    // in-JVM) and delete the engine's commit marker there — the restart
    // then re-delivers batch 0 with the SAME batchId.
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-xo-ckpt2").toString
    def copyRec(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(from).forEach { p =>
        val dst = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    copyRec(java.nio.file.Paths.get(ckpt), java.nio.file.Paths.get(ckpt2))
    assert(new java.io.File(new java.io.File(ckpt2, "commits"), "0").delete())
    // also drop Hadoop's checksum shadow — a stale .0.crc makes the
    // re-write of commits/0 fail as if another query owned the log
    new java.io.File(new java.io.File(ckpt2, "commits"), ".0.crc").delete()
    Seq(Ev(3, ts(3), 1, 3.0)).toDF().write.mode("append").parquet(dir)
    val q2 = EventStreams.writeToVersionedExactlyOnce(
      spark.readStream.schema(b0.schema).parquet(dir), target, "app-xo", ckpt2)
    q2.processAllAvailable()
    q2.stop()

    // replayed batch 0 committed NOTHING; batch 1 landed exactly once
    assert(vt.read().select("event_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(vt.versions() == Seq(0, 1))
    assert(vt.lastCommittedBatch("app-xo").contains(1L))
    // the ledger records which batch landed each version
    assert(vt.historyDF().orderBy("version")
      .select("txn_app", "txn_batch").as[(String, Long)].collect().toSeq ==
      Seq(("app-xo", 0L), ("app-xo", 1L)))
  }

  test("restart from checkpoint: the resumed query continues without reprocessing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-restart-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-ckpt").toString
    val target = java.nio.file.Files.createTempDirectory("graft-restart-t").toString + "/t"
    val batch1 = Seq(Ev(1, ts(1), 1, 1.0), Ev(2, ts(2), 1, 2.0)).toDF()
    batch1.write.mode("append").parquet(dir)

    val q1 = EventStreams.writeToVersioned(
      spark.readStream.schema(batch1.schema).parquet(dir),
      target, Seq("event_id"), ckpt)
    q1.processAllAvailable()
    q1.stop()
    val vt = graft.lake.VersionedTable(spark, target)
    val versionsAfterFirst = vt.versions().size

    // new data arrives while the query is DOWN; restart from checkpoint
    Seq(Ev(3, ts(3), 1, 3.0)).toDF().write.mode("append").parquet(dir)
    val q2 = EventStreams.writeToVersioned(
      spark.readStream.schema(batch1.schema).parquet(dir),
      target, Seq("event_id"), ckpt)
    q2.processAllAvailable()
    q2.stop()

    val ids = vt.read().select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L)) // no duplicates, nothing lost
    // the restart processed only the NEW file (plus at most a replayed
    // batch, which the keyed merge absorbs)
    assert(vt.versions().size >= versionsAfterFirst + 1)
  }

  test("versioned streaming sink: one commit per batch, replay-safe, time travel") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val target = java.nio.file.Files.createTempDirectory("graft-vsink").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-vsink-ckpt").toString
    val q = EventStreams.writeToVersioned(input.toDF(), target, Seq("event_id"), ckpt)
    input.addData(Ev(1, ts(1), 1, 1.0), Ev(2, ts(2), 1, 2.0))
    q.processAllAvailable()
    input.addData(Ev(2, ts(2), 1, 2.0), Ev(3, ts(3), 1, 3.0)) // id 2 replayed
    q.processAllAvailable()
    q.stop()
    val vt = graft.lake.VersionedTable(spark, target)
    assert(vt.read().select("event_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(vt.read(Some(0)).count() == 2) // first batch snapshot
    assert(vt.history().map(_._2) == Seq("overwrite", "append"))
  }

  test("batch session islands equal native session_window on real fixtures") {
    val d = "/root/testdata/sf0.001"
    val islands = SparkEntry.queries("q_session_islands")(spark, d)
      .select("user_id", "session_start", "n_events", "total_value")
      .as[(Long, String, Long, Double)].collect().toSet
    val native = SparkEntry.queries("q_session_native")(spark, d)
      .select("user_id", "session_start", "n_events", "total_value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(islands == native)
  }

  test("streaming KMV distinct: exact until saturation, bounded state after") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // group = user_id, key = event_id; k=256 stays unsaturated here
    val q = EventStreams.kmvDistinct(input.toDF(), "user_id", "event_id", k = 256)
      .writeStream.format("memory").queryName("kmv_out").outputMode("update").start()
    input.addData((1L to 10L).map(i => Ev(i, ts(1), 1, 1.0)): _*)
    q.processAllAvailable()
    // second batch overlaps 5..15 — the sketch merge must dedupe
    input.addData((5L to 15L).map(i => Ev(i, ts(2), 1, 1.0)): _*)
    q.processAllAvailable()
    val byBatch = spark.table("kmv_out")
      .select("group", "estimate").as[(String, Long)].collect().toSeq
    q.stop()
    assert(byBatch == Seq(("1", 10L), ("1", 15L))) // exact while |S| < k
  }

  test("streaming KMV distinct saturates to a bounded sketch; estimates replay exactly") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.kmvDistinct(input.toDF(), "user_id", "event_id", k = 64)
      .writeStream.format("memory").queryName("kmv_sat").outputMode("update").start()
    input.addData((1L to 1000L).map(i => Ev(i, ts(1), 2, 1.0)): _*)
    q.processAllAvailable()
    input.addData((1001L to 2000L).map(i => Ev(i, ts(2), 2, 1.0)): _*)
    q.processAllAvailable()
    val rows = spark.table("kmv_sat")
      .select("estimate", "k_used").as[(Long, Int)].collect().toSeq
    q.stop()
    // md5 hashing has no RNG state, so the sketch — and therefore the
    // estimate — is bit-reproducible (values confirmed independently
    // against an offline md5 replay): 1234 for the first 1000 keys
    // (+23%), 2330 after the merge to 2000 (+16%) — within KMV's
    // ~1/√64 error. State stays at exactly k hashes once saturated.
    assert(rows == Seq((1234L, 64), (2330L, 64)))
  }

  test("stream-static enrich joins a broadcast dim per micro-batch, UNKNOWN for misses") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "AUTO"), (2L, "STEEL")).toDF("c_custkey", "c_mktsegment")
    val input = MemoryStream[Ev]
    val q = EventStreams.enrichedSegmentDaily(
        input.toDF().withWatermark("ts", "10 minutes"), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    input.addData(Ev(1, ts(1), 1, 1.5), Ev(2, ts(2), 2, 2.5))
    q.processAllAvailable()
    input.addData(Ev(3, ts(3), 1, 3.0), Ev(4, ts(4), 99, 4.0)) // 99: no dim row
    q.processAllAvailable()
    val rows = spark.table("enrich_out")
      .select("segment", "n_events", "total_value")
      .as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(("AUTO", 2L, 4.5), ("STEEL", 1L, 2.5), ("UNKNOWN", 1L, 4.0)))
    // batch equivalence on the same inputs (what q_stream_enrich checks
    // against DuckDB at fixture scale)
    val batch = Seq(Ev(1, ts(1), 1, 1.5), Ev(2, ts(2), 2, 2.5),
      Ev(3, ts(3), 1, 3.0), Ev(4, ts(4), 99, 4.0)).toDF()
    val b = EventStreams.enrichedSegmentDaily(batch, dim)
      .select("segment", "n_events", "total_value")
      .as[(String, Long, Double)].collect().toSet
    assert(b == rows)
  }
}
