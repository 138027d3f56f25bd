package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the two claims behind the bucket-partitioned Gold refresh
  * (graft.lake.Medallion.refreshGoldStats):
  *
  *  1. FLATNESS — refresh cost tracks the TOUCHED buckets' files, not
  *     the state size. Two medallions with 10× different Gold state
  *     (10× the buckets, same per-bucket size, file count scaled with
  *     the buckets per the Medallion sizing contract) each absorb an
  *     identical batch touching ONE bucket; the wall times should be
  *     ~flat, where the old full-state overwrite scaled ~10×.
  *  2. CROSSOVER — the round-16 FILE-granular fallback rule: a batch
  *     touching HALF the buckets (~39% of files hit) must stay on the
  *     scoped path and beat the forced full-overwrite wall (< 0.7×),
  *     where the old touched ≥ files/2 rule already degenerated to a
  *     full-state fold. Measured by running the SAME batch through a
  *     default-crossover medallion and a crossover=0 (always-overwrite)
  *     one, both at the large state size.
  *
  * The Gold key is `hash(event_id) mod keySpace` — decorrelated from
  * the bucket (`event_id mod buckets`) so the group count is real, and
  * the measured batch's keys land ~uniformly over the touched buckets'
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

    /** Seed `buckets × perBucket` rows, refresh, then measure one more
      * refresh of a batch touching `touchBuckets` buckets. Returns the
      * measured refresh wall seconds. */
    def run(buckets: Int, touchBuckets: Int, crossover: Double,
            label: String): Double = {
      val root = java.nio.file.Files.createTempDirectory("graft-medscale").toString
      // file count scales WITH the buckets (constant per-file size) —
      // the documented sizing contract the flatness claim rests on
      val m = new graft.lake.Medallion(spark, root,
        goldStateFiles = buckets, goldRefreshCrossover = crossover)
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
      // the measured step: a batch landing in exactly `touchBuckets`
      // buckets (event_id mod buckets ∈ [0, touchBuckets)), keys spread
      // over those buckets' key space, ids disjoint from the seed
      val batch = spark.range(batchRows).select(
        (pmod(col("id"), lit(touchBuckets.toLong)) +
          lit(buckets.toLong) * floor(col("id") / touchBuckets).cast("long")
          + n).cast("long").as("event_id"),
        (col("id") % 97).cast("double").as("value"))
      m.ingest(batch)
      m.refreshSilver(df => df, Seq("event_id"))
      t0 = System.nanoTime()
      val r = m.refreshGoldStats(bucketOf, keyOf, col("value")).get
      val refreshSec = (System.nanoTime() - t0) / 1e9
      val action = m.gold.history().last._2
      println(f"[$label] buckets=$buckets%d state_groups=$stateGroups%d " +
        f"seed=${seedSec}%.2fs refresh_batch=${refreshSec}%.2fs " +
        f"touched=${r.touchedBuckets.size}%d rescanned=${r.rescannedGroups}%d " +
        f"files=${r.hitFiles}%d/${r.totalFiles}%d landed_as=$action")
      refreshSec
    }
    def sweep(tag: String): Unit = {
      // flatness: one-bucket batch at 1× and 10× state
      val f1 = run(bSmall, 1, 0.9, s"$tag flat-1x")
      val f10 = run(bLarge, 1, 0.9, s"$tag flat-10x")
      // crossover: half-the-buckets batch at 10× state, scoped vs
      // forced full overwrite
      val scoped = run(bLarge, bLarge / 2, 0.9, s"$tag half-scoped")
      val full = run(bLarge, bLarge / 2, 0.0, s"$tag half-fullOW")
      println(f"[$tag] flat_ratio_10x=${f10 / f1}%.2f " +
        f"half_scoped_vs_full=${scoped / full}%.2f (want < 0.7)")
    }
    // two passes: the first warms JIT/codegen caches, the second is
    // the comparable measurement
    sweep("warm")
    sweep("measure")
    spark.stop()
  }
}
