package org.apache.spark.sql.graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, ProcedureCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.VersionedTable

/** A Spark V2 [[TableCatalog]] over versioned lake tables — the SQL
  * catalog front door:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "org.apache.spark.sql.graft.catalog.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/lake")
  *
  *   spark.sql("CREATE TABLE graft.events (id BIGINT, kind STRING)")
  *   spark.sql("INSERT INTO graft.events VALUES (1, 'click')")
  *   spark.sql("SELECT * FROM graft.events VERSION AS OF 0")
  *   spark.sql("DELETE FROM graft.events WHERE kind = 'bot'")
  *   spark.sql("ALTER TABLE graft.events RENAME COLUMN kind TO event_kind")
  * }}}
  *
  * Catalog layout is PATH-DERIVED, the lake's own philosophy (the
  * commit log IS the metadata): identifier `ns1.ns2.t` maps to
  * `<warehouse>/ns1/ns2/t`, a table is any directory holding a
  * `_graft_log`, and `CREATE TABLE ... LOCATION p` registers an
  * EXTERNAL table through a one-line pointer file
  * `<warehouse>/.../t.location` — dropping an external table removes
  * only the pointer; dropping a managed table removes the data. No
  * second metastore to drift from the log.
  *
  * Time travel: `VERSION AS OF v` resolves through
  * `loadTable(ident, version)`; `TIMESTAMP AS OF ts` arrives from
  * Spark in MICROSECONDS and resolves with the lake's skew-tolerant
  * max-version-at-or-before rule ([[VersionedTable.versionAt]]).
  *
  * `SELECT`/`INSERT`/`DELETE`/`TRUNCATE` semantics live on
  * [[GraftTable]]; `UPDATE`/`MERGE INTO`/arbitrary-predicate `DELETE`
  * need the session extensions' DML rules
  * ([[org.apache.spark.sql.graft.GraftDmlRules]]).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(sys.error(
      s"graft catalog '$name' requires spark.sql.catalog.$name.warehouse"))
  }
  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active
  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Identifier → path derivation is CASE-NORMALIZED (lowercased), the
    * Hive-metastore convention Spark SQL resolution assumes: with the
    * default spark.sql.caseSensitive=false, `graft.T1` and `graft.t1`
    * must be the same table — a case-preserving path derivation made
    * SELECT throw NoSuchTableException on the case the user didn't
    * CREATE with (r16 advice). Column names are untouched (the schema
    * lives in the commit log). */
  private def normalize(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)
  private def defaultDir(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq.map(normalize) :+
      normalize(ident.name)).mkString("/")
  private def pointerPath(ident: Identifier): Path =
    new Path(defaultDir(ident) + ".location")

  /** The warehouse path a pre-r16 (case-preserving) build would have
    * derived — the LEGACY location probed on a miss so tables created
    * before the normalization don't strand (r17 advice: `graft.MyTbl`
    * resolving to `warehouse/mytbl` while the data lives at
    * `warehouse/MyTbl` made SELECT report NoSuchTable and a re-CREATE
    * build an empty shadow table beside the orphaned data). */
  private def legacyDir(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")

  /** The table's data directory: the external pointer wins, else the
    * case-normalized warehouse path, else — only when the normalized
    * path holds no table — the legacy case-preserved path if a table
    * actually lives there. New CREATEs always land on the normalized
    * path (the fallback never claims an empty directory). */
  private def tableDir(ident: Identifier): String = {
    val ptr = pointerPath(ident)
    val f = fs(ptr)
    if (f.exists(ptr)) {
      val in = f.open(ptr)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    } else {
      val normalized = defaultDir(ident)
      val legacy = legacyDir(ident)
      if (legacy == normalized || isLakeTable(normalized)) normalized
      else {
        // legacy pointer files predate normalization too
        val legacyPtr = new Path(legacy + ".location")
        if (f.exists(legacyPtr)) {
          val in = f.open(legacyPtr)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        } else if (isLakeTable(legacy)) legacy
        else normalized
      }
    }
  }

  private def isLakeTable(dir: String): Boolean =
    try fs(new Path(dir)).exists(new Path(dir, "_graft_log"))
    catch { case _: Throwable => false }

  override def tableExists(ident: Identifier): Boolean =
    isLakeTable(tableDir(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val f = fs(dir)
    // the DEFAULT namespace always exists (namespaceExists agrees) —
    // a fresh warehouse that no CREATE has touched yet lists empty,
    // it doesn't error SHOW TABLES
    if (!f.exists(dir)) {
      if (namespace.isEmpty) return Array.empty
      throw new NoSuchNamespaceException(namespace)
    }
    f.listStatus(dir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && isLakeTable(st.getPath.toString))
        Some(Identifier.of(namespace, n))
      else if (!st.isDirectory && n.endsWith(".location"))
        Some(Identifier.of(namespace, n.stripSuffix(".location")))
      else None
    }.toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isLakeTable(dir)) throw new NoSuchTableException(ident)
    new GraftTable(spark, dir, None, fullName(ident))
  }

  /** `VERSION AS OF v` — the catalog half of SQL time travel. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isLakeTable(dir)) throw new NoSuchTableException(ident)
    val v = try version.trim.toInt catch {
      case _: NumberFormatException => sys.error(
        s"graft-lake: VERSION AS OF takes an integer commit version, " +
          s"got '$version'")
    }
    new GraftTable(spark, dir, Some(v), fullName(ident))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands MICROSECONDS since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    if (!isLakeTable(dir)) throw new NoSuchTableException(ident)
    val ms = Math.floorDiv(timestampMicros, 1000L)
    val v = VersionedTable(spark, dir).versionAt(ms).getOrElse(sys.error(
      s"graft-lake: no version committed at or before timestamp " +
        s"$ms ms at $dir"))
    new GraftTable(spark, dir, Some(v), fullName(ident))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    // PARTITIONED BY (identity transforms only — Delta's rule): the
    // lake keeps partition columns IN the data files and value-splits
    // the file layout, so partition predicates prune to exactly the
    // partition's files through the stats layer (see
    // VersionedTable.commitOverwritePartitioned)
    val pcols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1 =>
        t.references.head.fieldNames.head
      case other => sys.error(s"graft-lake: unsupported PARTITIONED BY " +
        s"transform $other — only plain column (identity) partitioning")
    }
    pcols.foreach(c => require(schema.fieldNames.contains(c),
      s"PARTITIONED BY column '$c' is not in the table schema"))
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val external = Option(properties.get(TableCatalog.PROP_LOCATION))
    // Validate BEFORE registering the pointer (r16 advice): a LOCATION
    // at a non-lake dir with an empty DDL schema used to fail AFTER the
    // pointer landed, leaving a dangling registration whose next CREATE
    // died on an opaque 'file exists' instead of the real cause.
    external.foreach { loc =>
      if (!isLakeTable(loc))
        require(schema.nonEmpty, s"CREATE TABLE ${fullName(ident)} needs " +
          "a schema (or a LOCATION holding an existing graft-lake table)")
    }
    external.foreach { loc =>
      // register the external location through the pointer file.
      // overwrite = true: tableExists was false above, so any pointer
      // already here is DANGLING (its target holds no lake) — replace
      // it instead of dying on an opaque 'file exists'
      val ptr = pointerPath(ident)
      val f = fs(ptr)
      f.mkdirs(ptr.getParent)
      val out = f.create(ptr, true)
      try out.write(loc.getBytes("UTF-8")) finally out.close()
    }
    val dir = tableDir(ident)
    try {
      val vt = VersionedTable(spark, dir)
      if (vt.latestVersion().isEmpty) {
        // a brand-new table: commit the schema as version 0 (zero rows).
        // Registering an EXISTING lake dir via LOCATION skips this — the
        // log already carries its schema, which wins over the DDL's.
        require(schema.nonEmpty, s"CREATE TABLE ${fullName(ident)} needs " +
          "a schema (or a LOCATION holding an existing graft-lake table)")
        val empty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        if (pcols.nonEmpty) vt.commitOverwritePartitioned(empty, pcols)
        else vt.commitOverwrite(empty)
        // user TBLPROPERTIES ride the commit log (reserved engine keys
        // — location/provider/external/owner — are catalog-level, not
        // table definition)
        val userProps = properties.asScala.toSeq
          .filterNot { case (k, _) => GraftCatalog.ReservedProps(k) }
          .sortBy(_._1)
        if (userProps.nonEmpty) vt.setProperties(userProps)
      } else if (pcols.nonEmpty && vt.partitionColumns() != pcols)
        sys.error(s"graft-lake: the lake at $dir is partitioned by " +
          s"(${vt.partitionColumns().mkString(", ")}) — PARTITIONED BY " +
          s"(${pcols.mkString(", ")}) does not match")
    } catch { case e: Throwable =>
      // failure after registration must not leave a dangling pointer
      if (external.nonEmpty) fs(pointerPath(ident)).delete(pointerPath(ident), false)
      throw e
    }
    new GraftTable(spark, dir, None, fullName(ident))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isLakeTable(dir)) throw new NoSuchTableException(ident)
    val vt = VersionedTable(spark, dir)
    changes.foreach {
      case c: TableChange.RenameColumn =>
        require(c.fieldNames.length == 1,
          "graft-lake: nested column DDL is not supported")
        vt.renameColumn(c.fieldNames.head, c.newName)
      case c: TableChange.DeleteColumn =>
        require(c.fieldNames.length == 1,
          "graft-lake: nested column DDL is not supported")
        vt.dropColumn(c.fieldNames.head)
      case c: TableChange.AddColumn =>
        require(c.fieldNames.length == 1,
          "graft-lake: nested column DDL is not supported")
        require(c.isNullable, "graft-lake: added columns must be " +
          "nullable (existing rows null-backfill)")
        vt.addColumn(c.fieldNames.head, c.dataType)
      case c: TableChange.UpdateColumnNullability =>
        require(c.fieldNames.length == 1,
          "graft-lake: nested column DDL is not supported")
        if (c.nullable) vt.dropNotNull(c.fieldNames.head)
        else vt.setNotNull(c.fieldNames.head)
      case c: TableChange.SetProperty =>
        require(!GraftCatalog.ReservedProps(c.property),
          s"graft-lake: property '${c.property}' is engine-reserved")
        vt.setProperties(Seq(c.property -> c.value))
      case c: TableChange.RemoveProperty =>
        vt.unsetProperties(Seq(c.property))
      case other => sys.error(
        s"graft-lake: unsupported ALTER TABLE change $other — supported: " +
          "ADD COLUMN, RENAME COLUMN, DROP COLUMN, SET/UNSET TBLPROPERTIES")
    }
    new GraftTable(spark, dir, None, fullName(ident))
  }

  override def dropTable(ident: Identifier): Boolean = {
    // the delete's RESULT is the answer (r16 advice): a failed removal
    // (permissions, open handles) must not report DROP TABLE success
    // while the pointer/directory — and thus the table — still exists
    val ptr = pointerPath(ident)
    val f = fs(ptr)
    if (f.exists(ptr)) {
      val ok = f.delete(ptr, false)
      if (!ok) sys.error(s"graft-lake: DROP TABLE ${fullName(ident)} " +
        s"failed — could not delete the location pointer $ptr")
      ok
    } else {
      val dir = new Path(defaultDir(ident))
      if (!isLakeTable(dir.toString)) return false
      val ok = f.delete(dir, true)
      if (!ok) sys.error(s"graft-lake: DROP TABLE ${fullName(ident)} " +
        s"failed — could not delete the table directory $dir")
      ok
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val ptr = pointerPath(oldIdent)
    val f = fs(ptr)
    if (f.exists(ptr)) {
      // external: move the pointer, never the data
      f.mkdirs(pointerPath(newIdent).getParent)
      if (!f.rename(ptr, pointerPath(newIdent)))
        sys.error(s"graft-lake: rename of ${fullName(oldIdent)} failed")
    } else {
      val dst = new Path(defaultDir(newIdent))
      f.mkdirs(dst.getParent)
      if (!f.rename(new Path(defaultDir(oldIdent)), dst))
        sys.error(s"graft-lake: rename of ${fullName(oldIdent)} failed")
    }
  }

  // ---- namespaces = directories under the warehouse ------------------

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    val f = fs(root)
    if (!f.exists(root)) Array.empty
    else f.listStatus(root).toSeq
      .filter(st => st.isDirectory && !isLakeTable(st.getPath.toString))
      .map(st => Array(st.getPath.getName)).toArray
  }
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
      val f = fs(dir)
      if (!f.exists(dir)) throw new NoSuchNamespaceException(namespace)
      f.listStatus(dir).toSeq
        .filter(st => st.isDirectory && !isLakeTable(st.getPath.toString))
        .map(st => namespace :+ st.getPath.getName).toArray
    }
  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
    if (namespace.nonEmpty && !fs(dir).exists(dir))
      throw new NoSuchNamespaceException(namespace)
    Map("location" -> dir.toString).asJava
  }
  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val f = fs(dir)
    if (f.exists(dir)) throw new NamespaceAlreadyExistsException(namespace)
    f.mkdirs(dir)
  }
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    sys.error("graft-lake: ALTER NAMESPACE is not supported")
  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val f = fs(dir)
    if (!f.exists(dir)) return false
    if (!cascade && f.listStatus(dir).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NonEmptyNamespaceException(namespace)
    f.delete(dir, cascade)
  }
  override def namespaceExists(namespace: Array[String]): Boolean = {
    val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
    namespace.isEmpty || fs(dir).exists(dir)
  }

  // ---- maintenance procedures (CALL gcat.system.<proc>) --------------

  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.load(this, ident)
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list()

  /** The procedures' table-argument resolution — same rule as every
    * statement, but the table must exist. */
  private[catalog] def resolveTableDir(ident: Identifier): String = {
    val dir = tableDir(ident)
    if (!isLakeTable(dir))
      throw new NoSuchTableException(ident)
    dir
  }

  /** Same resolution WITHOUT the must-already-be-a-lake-table check —
    * the convert procedures' entry point (their whole job is adopting
    * a directory that isn't a lake table yet; convertFromParquet
    * itself validates what it finds there). */
  private[catalog] def resolveTableDirForConvert(ident: Identifier): String =
    tableDir(ident)

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace.toSeq :+ ident.name).mkString(".")
}

object GraftCatalog {
  /** Property keys the CATALOG owns (surfaced by GraftTable.properties
    * itself) — they never land in the commit log's user-property map. */
  val ReservedProps: Set[String] =
    Set("location", "provider", "external", "owner", "path")
}
