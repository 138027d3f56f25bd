package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the claim behind the bucket-partitioned Gold refresh
  * (graft.lake.Medallion.refreshGoldStats): refresh cost tracks the
  * TOUCHED buckets' files, not the state size. Two medallions with 10×
  * different Gold state (10× the buckets, same per-bucket size, file
  * count scaled with the buckets per the Medallion sizing contract —
  * files stay constant-sized) each absorb an identical batch touching
  * ONE bucket; the wall times should be ~flat, where the old
  * full-state overwrite scaled ~10×.
  *
  * The Gold key is `hash(event_id) mod keySpace` — decorrelated from
  * the bucket (`event_id mod buckets`) so the group count is real, and
  * the measured batch's keys land ~uniformly over the touched bucket's
  * existing key space (a mix of group updates and new groups, the
  * realistic refresh shape). The actual state group count is printed
  * from the table, not inferred.
  *
  * Run: `sbt "runMain graft.MedallionScale [bucketsSmall] [bucketsLarge] [rowsPerBucket] [batchRows]"`
  * (defaults 32 / 320 / 2000 / 1000).
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
      // file count scales WITH the buckets (constant per-file size) —
      // the documented sizing contract the flatness claim rests on
      val m = new graft.lake.Medallion(spark, root, goldStateFiles = buckets)
      val n = buckets.toLong * perBucket
      val bucketOf = concat(lit("b"),
        format_string("%06d", pmod(col("event_id"), lit(buckets))))
      val keyOf = pmod(hash(col("event_id")), lit(perBucket))
      val seed = spark.range(n).select(
        col("id").as("event_id"),
        (col("id") % 97).cast("double").as("value"))
      var t0 = System.nanoTime()
      m.ingest(seed)
      m.refreshSilver(df => df, Seq("event_id"))
      m.refreshGold(bucketOf, keyOf, col("value"))
      val seedSec = (System.nanoTime() - t0) / 1e9
      val stateGroups = m.gold.read().count()
      // the measured step: a batch whose rows all land in ONE bucket
      // (event_id ≡ 0 mod buckets), keys spread over that bucket's space
      val batch = spark.range(batchRows).select(
        (col("id") * buckets + n).as("event_id"),
        (col("id") % 97).cast("double").as("value"))
      m.ingest(batch)
      m.refreshSilver(df => df, Seq("event_id"))
      t0 = System.nanoTime()
      val r = m.refreshGoldStats(bucketOf, keyOf, col("value")).get
      val refreshSec = (System.nanoTime() - t0) / 1e9
      println(f"buckets=$buckets%d state_groups=$stateGroups%d " +
        f"seed=${seedSec}%.2fs refresh_batch=${refreshSec}%.2fs " +
        f"touched=${r.touchedBuckets.size}%d rescanned=${r.rescannedGroups}%d")
    }
    // two passes: the first warms JIT/codegen caches, the second pair
    // is the comparable measurement
    run(bSmall); run(bLarge)
    println("-- warm pass --")
    run(bSmall); run(bLarge)
    spark.stop()
  }
}
