package org.apache.spark.sql.graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.{Compaction, VersionedTable}

/** The lake's maintenance surface as SQL stored procedures (Spark 4's
  * `CALL` statement, the Iceberg convention — `system` namespace):
  *
  * {{{
  *   CALL gcat.system.optimize(table => 'events', target_rows => 500000)
  *   CALL gcat.system.vacuum('events', 2, 0)
  *   CALL gcat.system.restore('events', 3)
  *   CALL gcat.system.zorder('events', 'x', 'y', 12, 8)
  *   CALL gcat.system.history('events')
  *   CALL gcat.system.constraint_add('events', 'pos', 'value >= 0')
  *   CALL gcat.system.constraint_drop('events', 'pos')
  * }}}
  *
  * Each call routes to the corresponding [[VersionedTable]] primitive
  * and returns its outcome as a one-row result set (`history` returns
  * the whole commit log), so operational runbooks — compaction cadence,
  * retention sweeps, bad-deploy restores — can live in plain SQL
  * schedulers with zero Scala. Vacuum keeps the lake's safe-by-default
  * posture: `min_age_ms` defaults to the 7-day staged-file retention
  * ([[VersionedTable.DefaultVacuumMinAgeMs]]); passing 0 is the same
  * explicit opt-in the Scala API requires.
  */
object GraftProcedures {
  /** Procedure identifiers under this catalog: `system.<name>` (also
    * accepted bare for convenience). */
  def load(catalog: GraftCatalog, ident: Identifier): UnboundProcedure = {
    val ok = ident.namespace.isEmpty ||
      ident.namespace.toSeq == Seq("system")
    if (!ok) sys.error(s"graft-lake: unknown procedure namespace " +
      s"${ident.namespace.mkString(".")} — procedures live under 'system'")
    defs.getOrElse(ident.name.toLowerCase(java.util.Locale.ROOT), sys.error(
      s"graft-lake: unknown procedure '${ident.name}' — available: " +
        defs.keys.toSeq.sorted.mkString(", "))) match {
      case d => new LakeProcedure(catalog, d)
    }
  }

  def list(): Array[Identifier] =
    defs.keys.toSeq.sorted.map(n => Identifier.of(Array("system"), n)).toArray

  private def in(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private val versionResult =
    new StructType().add("version", IntegerType, nullable = false)

  /** One row, schema `versionResult` — the outcome shape shared by the
    * mutating procedures. */
  private def versionRow(v: Int): Seq[Scan] =
    Seq(localScan(versionResult, Seq(InternalRow(v))))

  private def localScan(schema: StructType, data: Seq[InternalRow]): Scan =
    new LocalScan {
      override def rows(): Array[InternalRow] = data.toArray
      override def readSchema(): StructType = schema
    }

  private[catalog] case class ProcDef(
      name: String, description: String,
      parameters: Seq[ProcedureParameter],
      resultFor: (SparkSession, VersionedTable, InternalRow) => Seq[Scan],
      // the convert procedures target directories that aren't lake
      // tables yet — they skip the exists-as-lake-table resolution check
      requireLakeTable: Boolean = true)

  private val defs: Map[String, ProcDef] = Seq(
    ProcDef("optimize",
      "Compact the table's data files to ~target_rows rows per file " +
        "(a new version; content unchanged; history preserved)",
      Seq(in("table", StringType),
        inDefault("target_rows", LongType, "1000000")),
      (_, t, args) => versionRow(t.optimize(args.getLong(1)))),

    ProcDef("vacuum",
      "Delete data files unreferenced by the retained versions; " +
        "min_age_ms defaults to the 7-day staged-file retention",
      Seq(in("table", StringType),
        inDefault("retain_versions", IntegerType, "2"),
        inDefault("min_age_ms", LongType,
          VersionedTable.DefaultVacuumMinAgeMs.toString)),
      (_, t, args) => Seq(localScan(
        new StructType().add("deleted_files", IntegerType, nullable = false),
        Seq(InternalRow(t.vacuum(args.getInt(1), args.getLong(2))))))),

    ProcDef("restore",
      "Make an older version's content the new head (as a NEW commit " +
        "— nothing is rewritten, history stays intact)",
      Seq(in("table", StringType), in("version", IntegerType)),
      (_, t, args) => versionRow(t.restore(args.getInt(1)))),

    ProcDef("zorder",
      "Rewrite the table clustered by the interleaved bits of (x, y) " +
        "so every file covers a tight rectangle — range scans on " +
        "either column prune by file stats",
      Seq(in("table", StringType), in("x", StringType), in("y", StringType),
        inDefault("bits", IntegerType, "12"),
        inDefault("num_files", IntegerType, "8")),
      (_, t, args) => versionRow(t.commitOverwrite(Compaction.zorderLayout(
        t.read(), col(args.getUTF8String(1).toString),
        col(args.getUTF8String(2).toString),
        args.getInt(3), args.getInt(4))))),

    ProcDef("history",
      "The commit log: version, action, rows, files, timestamp, and " +
        "the streaming-sink txn ledger columns",
      Seq(in("table", StringType)),
      (_, t, args) => {
        val df = t.historyDF()
        Seq(localScan(df.schema,
          df.queryExecution.executedPlan.executeCollect().toSeq))
      }),

    ProcDef("constraint_add",
      "Add a CHECK constraint (validated against current content; " +
        "enforced on every future write)",
      Seq(in("table", StringType), in("name", StringType),
        in("expr", StringType)),
      (_, t, args) => versionRow(t.addConstraint(
        args.getUTF8String(1).toString, args.getUTF8String(2).toString))),

    ProcDef("constraint_drop",
      "Drop a CHECK constraint by name",
      Seq(in("table", StringType), in("name", StringType)),
      (_, t, args) => versionRow(t.dropConstraint(
        args.getUTF8String(1).toString))),

    ProcDef("detail",
      "DESCRIBE DETAIL: one row of table facts — location, head " +
        "version, file count, total bytes (log-recorded), row count, " +
        "partition columns, constraints, and TBLPROPERTIES",
      Seq(in("table", StringType)),
      (_, t, _) => {
        val v = t.latestVersion().getOrElse(
          sys.error(s"no committed versions at ${t.tablePath}"))
        val files = t.snapshotDataFiles(Some(v))
        val meta = t.snapshotFileMeta(Some(v))
        val bytes = files.flatMap(meta.get).map(_.size).sum
        val rows = t.historyDF().filter(
          org.apache.spark.sql.functions.col("version") === v)
          .select("rows").head.getLong(0)
        def kvs(xs: Seq[(String, String)]) =
          xs.map { case (k, e) => s"$k=$e" }.mkString("; ")
        val schema = new StructType()
          .add("location", StringType, nullable = false)
          .add("format", StringType, nullable = false)
          .add("version", IntegerType, nullable = false)
          .add("num_files", IntegerType, nullable = false)
          .add("size_bytes", LongType, nullable = false)
          .add("rows", LongType, nullable = false)
          .add("partition_columns", StringType, nullable = false)
          .add("constraints", StringType, nullable = false)
          .add("properties", StringType, nullable = false)
          .add("not_null", StringType, nullable = false)
        // NOT NULL declarations surface in their own column; the
        // constraints column keeps only user CHECKs
        val userChecks = t.constraints().filterNot(
          _._1.startsWith(VersionedTable.NotNullPrefix))
        Seq(localScan(schema, Seq(InternalRow(
          UTF8String.fromString(t.tablePath),
          UTF8String.fromString("graft-lake"),
          v, files.size, bytes, rows,
          UTF8String.fromString(t.partitionColumns().mkString(", ")),
          UTF8String.fromString(kvs(userChecks)),
          UTF8String.fromString(kvs(t.properties())),
          UTF8String.fromString(t.notNullColumns().mkString(", "))))))
      }),

    ProcDef("partition_stats",
      "Per-partition (values, n_files, rows, bytes) answered from the " +
        "commit log and stats sidecars — zero data files opened on a " +
        "clean snapshot (DV overlays fall back to an exact scan with " +
        "n_files/bytes = -1)",
      Seq(in("table", StringType)),
      (_, t, _) => {
        val df = t.partitionStats()
        Seq(localScan(df.schema,
          df.queryExecution.executedPlan.executeCollect().toSeq))
      }),

    ProcDef("convert",
      "CONVERT TO graft-lake: adopt the identifier's existing FLAT " +
        "parquet directory in place (zero bytes moved) — v0 add " +
        "actions reference the existing files, stats are backfilled; " +
        "idempotent on an already-converted table; hive layouts are " +
        "refused with a pointer to convert_hive",
      Seq(in("table", StringType)),
      (_, t, _) => versionRow(t.convertFromParquet()),
      requireLakeTable = false),

    ProcDef("convert_hive",
      "Import a hive-partitioned parquet tree (k=v dirs) from `source` " +
        "into the identifier's table, recovering partition columns " +
        "from the path layout — a materializing rewrite into the " +
        "lake's native one-value-per-file layout (see scaladoc for " +
        "why hive trees can't be reference-imported); the source tree " +
        "is left untouched",
      Seq(in("table", StringType), in("source", StringType)),
      (_, t, args) => versionRow(
        t.convertFromHiveParquet(args.getUTF8String(1).toString)),
      requireLakeTable = false),

    ProcDef("not_null_set",
      "Declare a column NOT NULL (validated against existing rows; " +
        "every future batch gate-checks it in the same one-pass CHECK " +
        "validation; a violating batch rejects atomically). The SQL " +
        "door for what ALTER COLUMN SET NOT NULL can't reach: Spark's " +
        "own analyzer refuses nullable→non-nullable on generic V2 " +
        "catalogs before any catalog code runs",
      Seq(in("table", StringType), in("column", StringType)),
      (_, t, args) => versionRow(
        t.setNotNull(args.getUTF8String(1).toString))),

    ProcDef("not_null_drop",
      "Drop a column's NOT NULL declaration (metadata-only commit)",
      Seq(in("table", StringType), in("column", StringType)),
      (_, t, args) => versionRow(
        t.dropNotNull(args.getUTF8String(1).toString))),

    ProcDef("replace_partitions",
      "Dynamic partition overwrite from a registered view/table: " +
        "replaces exactly the partitions present in the source, " +
        "leaves every other partition's files untouched by identity",
      Seq(in("table", StringType), in("source", StringType)),
      (s, t, args) => versionRow(t.replacePartitions(
        s.table(args.getUTF8String(1).toString))
        .getOrElse(t.latestVersion().getOrElse(-1))))
  ).map(d => d.name -> d).toMap
}

/** A lake maintenance procedure bound to its catalog: the `table`
  * argument (always parameter 0) is a table identifier WITHIN this
  * catalog (`'cust'`, `'ns1.nt'`), resolved through the same
  * pointer-or-warehouse rule every other statement uses. */
class LakeProcedure(catalog: GraftCatalog,
                    d: GraftProcedures.ProcDef)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = d.name
  override def description(): String = d.description
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = d.parameters.toArray
  override def isDeterministic: Boolean = false

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val tableArg = input.getUTF8String(0).toString
    // the session's multipart-identifier grammar, not a raw dot split
    // (r16 advice): a backquoted name segment may itself contain dots
    val parts = SparkSession.active.sessionState.sqlParser
      .parseMultipartIdentifier(tableArg).toArray
    val ident = Identifier.of(parts.init, parts.last)
    val spark = SparkSession.active
    val dir = if (d.requireLakeTable) catalog.resolveTableDir(ident)
              else catalog.resolveTableDirForConvert(ident)
    val table = VersionedTable(spark, dir)
    d.resultFor(spark, table, input).iterator.asJava
  }
}
