package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9: the reference's layered Delta writes (`guardar_data_delta`,
  * `/root/reference/main.py:391-426`) over a medallion path convention
  * (`Datos_Delta/<Layer>/<Source>/<Table>`, `main.py:599-635`).
  *
  * No Delta jars ship in this environment (SURVEY.md §7.1), so the layer
  * store is plain Parquet with the same observable semantics the reference
  * actually uses: overwrite, append, and single-column partitioned writes.
  * (The reference never uses time travel / updates / deletes / concurrent
  * writers, so nothing user-visible is lost at this layer; tables that DO
  * want Delta's versioned semantics — commit log, time travel, optimize,
  * vacuum, conflict detection — use [[VersionedTable]].)
  *
  * Scale notes: `partitionBy` here is the 100 TB partition-pruning lever —
  * the reference partitions Silver exchanges by `country`
  * (`main.py:623`) but never exploits it on read; Spark's static/dynamic
  * partition pruning exploits it automatically. Writers should aim for
  * 128 MB–1 GB files per partition: callers repartition by the partition
  * column first so each task writes one file per partition instead of
  * `tasks × partitions` small files.
  */
final case class LayerPath(base: String, layer: String, source: String, table: String) {
  def path: String = s"$base/$layer/$source/$table"
}

object LayerWriter {
  sealed trait Mode { def sparkMode: String }
  case object Overwrite extends Mode { val sparkMode = "overwrite" }
  case object Append extends Mode { val sparkMode = "append" }

  /** Write a layer table; optional single-column hash partitioning
    * (matching `partition_by=[col]`, `main.py:418,461`). Repartitions on
    * the partition column to avoid small-file explosion at scale.
    */
  def write(df: DataFrame, target: LayerPath, mode: Mode = Overwrite,
            partitionCol: Option[String] = None): Unit = {
    val writer = partitionCol match {
      case Some(c) => df.repartition(df(c)).write.partitionBy(c)
      case None    => df.write
    }
    writer.mode(mode.sparkMode).parquet(target.path)
  }

  def read(spark: SparkSession, target: LayerPath): DataFrame =
    spark.read.parquet(target.path)

  /** Dynamic partition overwrite (Spark's `partitionOverwriteMode=
    * dynamic`): atomically replace EXACTLY the partitions present in
    * `df`, leaving every other partition's files untouched — the
    * idempotent re-load primitive for a hive-layout table (re-running a
    * day's load replaces that day; the versioned-lake equivalent is
    * [[VersionedTable.replaceWhere]]). At 100 TB this is the difference
    * between re-landing one day and rewriting the table. */
  def replacePartitions(df: DataFrame, target: LayerPath,
                        partitionCol: String): Unit =
    // per-WRITE option, not the session conf: toggling
    // spark.sql.sources.partitionOverwriteMode globally would leak
    // dynamic-overwrite semantics into any concurrent write on the same
    // SparkSession (or, racing restores, turn a dynamic re-load into a
    // full-table overwrite) — the writer option scopes the mode to
    // exactly this write
    df.repartition(df(partitionCol)).write.partitionBy(partitionCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(target.path)

  /** Partition-scoped retention: drop whole partition directories (the
    * hive-layout idiom for "expire data older than X" — an O(1)
    * directory delete per expired partition, no row scan, no rewrite).
    * Returns how many of the requested partitions existed and were
    * dropped. */
  def dropPartitions(spark: SparkSession, target: LayerPath,
                     partitionCol: String, values: Seq[String]): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(target.path)
    val fs = base.getFileSystem(conf)
    values.count { v =>
      val dir = new org.apache.hadoop.fs.Path(base, s"$partitionCol=$v")
      fs.exists(dir) && fs.delete(dir, true)
    }
  }
}
