package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-layout maintenance for lake tables: multi-dimensional clustering
  * (z-order) and small-file compaction.
  *
  * Why this matters at 100 TB: scan cost is driven by how many files a
  * filter can SKIP. Range-partitioning on a z-value interleaving of the
  * filter columns gives every file a tight min/max envelope on BOTH
  * dimensions, so parquet row-group stats (and any min/max file index)
  * prune on either column — a plain sort clusters only the leading one.
  * Compaction bin-packs the many small files streaming/incremental writes
  * leave behind into target-size files, keeping file-open overhead and
  * scheduler pressure proportional to data volume, not write cadence.
  */
object Compaction {

  /** Z-value (Morton code) of two non-negative integer columns, `bits`
    * low bits each, as a pure codegen'd expression chain — bit i of x
    * lands at position 2i, bit i of y at 2i+1.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Cluster `df` for (x, y) locality: range-partition on the z-value
    * into `numFiles` non-overlapping z-ranges, sort within each. Written
    * as-is, every output file covers a tight (x, y) rectangle.
    */
  def zorderLayout(df: DataFrame, x: Column, y: Column, bits: Int,
                   numFiles: Int): DataFrame = {
    val z = zValue(x, y, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** Bin-pack a directory of (possibly many small) parquet files into
    * ~`targetRowsPerFile` files. Round-robin repartition gives uniform
    * file sizes; the rewrite goes to `outDir` and is atomic at the
    * directory level (write then swap is the caller's policy).
    * Returns (filesBefore, filesAfter, rows).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetRowsPerFile: Long): (Int, Int, Long) = {
    val df = spark.read.parquet(inDir)
    val rows = df.count()
    val before = df.inputFiles.length
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    df.repartition(nFiles).write.mode("overwrite").parquet(outDir)
    val after = spark.read.parquet(outDir).inputFiles.length
    (before, after, rows)
  }
}
