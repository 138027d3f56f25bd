package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for merge-on-read vs copy-on-write deletes:
  * `runMain graft.DvScale <sfDir> [selectivityPct]`
  *
  * Builds two identical versioned tables from `lineitem` at `sfDir`
  * (16 data files — the many-large-files layout MoR is designed for),
  * then times the SAME selective delete both ways and a full snapshot
  * read after each, printing one line per leg. This is the measured
  * basis (SCALE.md) for when `deleteMoR` beats `delete`: the CoW cost
  * is affected-file BYTES rewritten, the MoR cost is deleted-row
  * POSITIONS written plus a per-read overlay tax (r17: a scan-local
  * broadcast row-index filter, ~5x cheaper than the old anti-join)
  * until compaction absorbs the vector — at 100 TB with a spread-out
  * predicate (GDPR erasure), CoW rewrites everything and MoR writes
  * kilobytes.
  */
object DvScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val pct = args.lift(1).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"DVSCALE $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // spread-out selective predicate: ~pct% of rows, touching EVERY file
    val cond = pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(100))
      .lt(lit(pct))
    // optional row replication (3rd arg): scan-ratio legs need the data
    // side to dominate the anti-join's fixed cost, as it does at real
    // scale — without an sf1 fixture, replicate sf0.1 k× instead
    val rep = args.lift(2).map(_.toInt).getOrElse(1)
    val base = Tables.lineitem(spark, sfDir)
    val src = (1 to rep).map(i =>
        base.withColumn("l_orderkey", col("l_orderkey") * rep + lit(i)))
      .reduce(_ unionByName _).repartition(16)

    val cowDir = graft.lake.Scratch.dir("dvscale-cow") + "/t"
    val morDir = graft.lake.Scratch.dir("dvscale-mor") + "/t"
    val cow = graft.lake.VersionedTable(spark, cowDir)
    val mor = graft.lake.VersionedTable(spark, morDir)
    cow.commitOverwrite(src)
    mor.commitOverwrite(src)
    val total = cow.read().count()

    val vCow = time("delete (copy-on-write)")(cow.delete(cond))
    val vMor = time("deleteMoR (deletion vector)")(mor.deleteMoR(cond))
    require(vCow.nonEmpty && vMor.nonEmpty, "predicate matched nothing")
    val nCow = time("read after CoW")(cow.read().count())
    val nMor = time("read after MoR")(mor.read().count())
    require(nCow == nMor, s"row drift: CoW $nCow vs MoR $nMor")

    // Scan-bound aggregate legs (r17): plain snapshot (native scan)
    // vs DV overlay (native scan + scan-local DvNotDeleted filter)
    // vs the pre-r17 SQL-door path (V1 row bridge). Each leg runs
    // twice; the second run is reported (the first pays codegen +
    // shuffle warmup both shapes share). NOTE (SCALE.md r17): legs
    // inside one sequential run inherit each other's GC/page-cache
    // pressure — the committed ratios come from an interleaved
    // median-of-5 harness; these lines are directional.
    def agg(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .head().getDouble(0)
    def leg(what: String)(body: => Double): Double = {
      body // warmup
      val t0 = System.nanoTime()
      val r = body
      println(f"DVSCALE $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val aPlain = leg("agg plain (native)")(agg(cow.read()))
    val aMorNative = leg("agg MoR (native DV filter)")(agg(mor.read()))
    // the pre-r17 SQL-door path for DV snapshots: the V1 row bridge
    // (PrunedFilteredScan → RDD[Row] → re-ingest) — this session has no
    // extensions, so the format door still resolves to it
    val aMorBridge = leg("agg MoR (V1 row bridge)")(
      agg(spark.read.format("graft-lake").load(morDir)))
    // RELATIVE tolerance: the two legs sum ~1e9–1e10 of doubles through
    // DIFFERENT plan shapes (broadcast filter vs anti-join), so their
    // summation orders differ and an absolute 1e-4 bound fails
    // spuriously as the replication factor grows
    require(math.abs(aMorNative - aMorBridge) /
        math.max(math.abs(aMorNative), 1.0) < 1e-9,
      s"native vs bridge drift: $aMorNative vs $aMorBridge")

    time("optimize absorbs the vector")(mor.optimize(2000000))
    val nOpt = mor.read().count()
    require(nOpt == nMor, s"optimize drift: $nOpt vs $nMor")
    println(s"DVSCALE rows total=$total live=$nMor " +
      s"deleted=${total - nMor} (${pct}% spread across all 16 files)")
    spark.stop()
  }
}
