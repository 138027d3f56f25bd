package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement tool (guide §1): decompose the lake commit protocol's
  * per-commit cost — `runMain graft.CommitProbe <sfDir>`.
  *
  * Times, over N tiny commits on a fresh table:
  *  - a bare `df.write.parquet` of the same rows (the staging write's
  *    Spark-job floor, including the Hadoop committer's temp/rename
  *    dance);
  *  - `commitAppend` end to end (staging + footer row counts + renames
  *    + stats sidecar + commit record publish);
  *  - a no-op action on the same plan (`noop` sink) — the pure
  *    plan/schedule floor with no files at all.
  * The deltas attribute the commit overhead: Spark-write floor vs
  * commit-protocol surcharge vs planning floor.
  */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, sfDir).select("event_id", "event_type", "value")
      .filter(pmod(col("event_id"), lit(100)) === 0)
    ev.count() // warm the scan

    def timeN(n: Int)(f: Int => Unit): Double = {
      val t0 = System.nanoTime()
      (0 until n).foreach(f)
      (System.nanoTime() - t0) / 1e9 / n
    }

    val n = 20
    // absolute scheduling floor: a 1-row local-relation count
    val tRange = timeN(n) { _ => spark.range(1).count(); () }
    // same, single input slice (isolates per-task dispatch cost)
    val tRange1 = timeN(n) { _ => spark.range(0L, 1L, 1L, 1).count(); () }
    // a 32-task single-stage job with no shuffle (pure task dispatch)
    val tTasks32 = timeN(n) { _ =>
      spark.range(0L, 32L, 1L, 32).write.format("noop").mode("overwrite").save()
    }
    // AQE off: how much of the floor is adaptive re-planning
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val tRangeNoAqe = timeN(n) { _ => spark.range(1).count(); () }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    println(f"PROBE2 range1slice=${tRange1 * 1000}%.1f ms  " +
      f"tasks32=${tTasks32 * 1000}%.1f ms  rangeNoAqe=${tRangeNoAqe * 1000}%.1f ms")
    // count floor on the same scan (column-pruned)
    val tCount = timeN(n) { _ => ev.count(); () }
    // floor: plan+schedule only
    val tNoop = timeN(n) { _ =>
      ev.write.format("noop").mode("overwrite").save()
    }
    // Spark write incl. Hadoop committer
    val base = graft.lake.Scratch.dir("commit-probe")
    val tWrite = timeN(n) { i =>
      ev.write.parquet(s"$base/plain-$i")
    }
    // full commit protocol
    val t1 = graft.lake.VersionedTable(spark, s"$base/t1")
    val tCommit = timeN(n) { i =>
      if (i == 0) t1.commitOverwrite(ev) else t1.commitAppend(ev)
    }
    // full commit protocol, distributed stats gear (pre-r19)
    spark.conf.set("spark.graft.lake.stats.footerGear", "false")
    val t2 = graft.lake.VersionedTable(spark, s"$base/t2")
    val tCommitDist = timeN(n) { i =>
      if (i == 0) t2.commitOverwrite(ev) else t2.commitAppend(ev)
    }
    spark.conf.unset("spark.graft.lake.stats.footerGear")
    println(f"PROBE range=${tRange * 1000}%.1f ms  count=${tCount * 1000}%.1f ms" +
      f"  noop=${tNoop * 1000}%.1f ms  write=${tWrite * 1000}%.1f ms" +
      f"  commit=${tCommit * 1000}%.1f ms  commitDistStats=${tCommitDist * 1000}%.1f ms")
    spark.stop()
  }
}
