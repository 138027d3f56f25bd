package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the claim behind the bucket-partitioned Gold refresh
  * (graft.lake.Medallion.refreshGoldStats): refresh cost tracks the
  * TOUCHED buckets, not the state size. Two medallions with 10×
  * different Gold state (10× the buckets, same per-bucket size) each
  * absorb an identical small batch touching ONE bucket; the wall times
  * should be ~flat, where the old full-state overwrite scaled ~10×.
  *
  * Run: `sbt "runMain graft.MedallionScale [bucketsSmall] [bucketsLarge] [keysPerBucket] [batchRows]"`
  * (defaults 32 / 320 / 2000 / 1000). Prints one line per size:
  * `state=<groups> seed=<s> refresh_batch=<s> touched=1 rescanned=0`.
  */
object MedallionScale {
  def main(args: Array[String]): Unit = {
    val bSmall = args.lift(0).map(_.toInt).getOrElse(32)
    val bLarge = args.lift(1).map(_.toInt).getOrElse(320)
    val perBucket = args.lift(2).map(_.toInt).getOrElse(2000)
    val batchRows = args.lift(3).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(buckets: Int): Unit = {
      val root = java.nio.file.Files.createTempDirectory("graft-medscale").toString
      val m = new graft.lake.Medallion(spark, root)
      val n = buckets.toLong * perBucket
      val seed = spark.range(n).select(
        col("id").as("event_id"),
        concat(lit("b"), format_string("%06d", pmod(col("id"), lit(buckets))))
          .as("etype"),
        (col("id") % 97).cast("double").as("value"))
      var t0 = System.nanoTime()
      m.ingest(seed)
      m.refreshSilver(df => df, Seq("event_id"))
      m.refreshGold(col("etype"), col("event_id") % 1000, col("value"))
      val seedSec = (System.nanoTime() - t0) / 1e9
      // the measured step: a small batch touching ONE bucket against
      // the full-grown state
      val batch = spark.range(n, n + batchRows).select(
        col("id").as("event_id"), lit("b000000").as("etype"),
        (col("id") % 97).cast("double").as("value"))
      m.ingest(batch)
      m.refreshSilver(df => df, Seq("event_id"))
      t0 = System.nanoTime()
      val r = m.refreshGoldStats(col("etype"), col("event_id") % 1000,
        col("value")).get
      val refreshSec = (System.nanoTime() - t0) / 1e9
      println(f"state_groups=${buckets * 1000}%d buckets=$buckets%d " +
        f"seed=${seedSec}%.2fs refresh_batch=${refreshSec}%.2fs " +
        f"touched=${r.touchedBuckets.size}%d rescanned=${r.rescannedGroups}%d")
    }
    run(bSmall)
    run(bLarge)
    spark.stop()
  }
}
