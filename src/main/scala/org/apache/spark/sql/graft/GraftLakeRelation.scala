package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SparkSession, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.lake.VersionedTable

/** BATCH read of a versioned lake table behind the format string — the
  * front door that makes the lake reachable from plain SQL:
  *
  * {{{
  *   spark.read.format("graft-lake")
  *     .option("versionAsOf", 7)            // or timestampAsOf
  *     .load(tableDir)
  *     .createOrReplaceTempView("t")        // → spark.sql("SELECT ... FROM t")
  *   // or catalog-registered:
  *   spark.sql(s"CREATE TABLE t USING graft-lake OPTIONS (path '$dir')")
  * }}}
  *
  * Deliberately a V1 `BaseRelation` + `PrunedFilteredScan`, the same
  * choice Delta's `DeltaDataSource` makes for its batch path: the
  * relation's scan is built FROM the lake's own reader
  * ([[VersionedTable.readWhere]]), so deletion-vector overlays, column
  * mapping, time travel, and — the scale lever — file-stats data
  * skipping all apply behind the format string. A DataSourceV2
  * `PartitionReader` would have to re-implement parquet + DV + mapping
  * decode outside Catalyst to get the same semantics.
  *
  * Pushdown contract: Catalyst hands the WHERE clause down as
  * `sources.Filter`s; every translatable conjunct becomes a Column
  * predicate for `readWhere`, which drops provably-irrelevant files
  * BEFORE Spark lists the scan (min/max sidecar stats), and the full
  * filter is re-applied on top (V1 filters are advisory), so pruning is
  * pure optimization. Untranslatable shapes simply don't prune. At
  * 100 TB this is what turns `WHERE day = X` through a SQL view into a
  * one-file read instead of a table scan.
  */
class GraftLakeRelation(spark: SparkSession, path: String,
                        version: Option[Int])
    extends BaseRelation with PrunedFilteredScan {
  private val table = VersionedTable(spark, path)

  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = table.read(version).schema

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val pred = filters.flatMap(GraftLakeRelation.translate)
      .reduceOption(_ && _)
    GraftLakeRelation.lastScanFiles.put(path, pred match {
      case Some(p) => table.candidateFiles(p, version).size
      case None    => table.snapshotDataFiles(version).size
    })
    val base = pred match {
      case Some(p) => table.readWhere(p, version)
      case None    => table.read(version)
    }
    val projected =
      if (requiredColumns.isEmpty) base.select()
      else base.select(requiredColumns.map(col).toSeq: _*)
    projected.rdd
  }

  override def toString: String =
    s"GraftLakeRelation[$path${version.map(v => s"@v$v").getOrElse("")}]"
}

object GraftLakeRelation {
  /** Observable for tests and operators: data files the last format-
    * string scan of each table path handed to Spark AFTER stats
    * pruning — the `numFiles`-style proof that a selective SQL
    * predicate reached the lake's skipping layer. */
  val lastScanFiles = new java.util.concurrent.ConcurrentHashMap[String, Int]()

  /** `sources.Filter` → lake predicate. Conservative by construction:
    * an untranslatable node contributes nothing (its containing OR/NOT
    * is dropped whole — a partial disjunction would prune wrongly),
    * while AND keeps whichever sides translate (a conjunct alone
    * selects a superset, always safe). The engine re-applies every
    * filter above the scan regardless. */
  private[graft] def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case StringContains(a, v)     => Some(col(a).contains(v))
    case And(l, r) => (translate(l), translate(r)) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (one, other)       => one.orElse(other)
    }
    case Or(l, r) =>
      for { a <- translate(l); b <- translate(r) } yield a || b
    case Not(c) => translate(c).map(!_)
    case _ => None
  }
}
