package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import org.apache.spark.sql.graft.GraftLakeRelation

/** The V2 catalog front door (org.apache.spark.sql.graft.catalog.
  * GraftCatalog/GraftTable): CREATE/ALTER/DROP TABLE, INSERT, SELECT
  * with time travel and stats pruning, DELETE/TRUNCATE without
  * extensions — and, with graft.GraftExtensions, full SQL DML
  * (UPDATE / MERGE INTO / arbitrary-predicate DELETE) routed to the
  * lake's file-granular primitives.
  */
class LakeCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.g",
      "org.apache.spark.sql.graft.catalog.GraftCatalog")
    s.conf.set("spark.sql.catalog.g.warehouse", warehouse)
    s
  }
  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft-cat-wh").toString

  /** A dedicated session carrying GraftExtensions (the TestSpark one
    * has none and getOrCreate would reuse it) — the DML statements
    * need the injected resolution rule. */
  private lazy val extSpark: SparkSession = {
    val prev = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions())
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.sql.catalog.g",
      "org.apache.spark.sql.graft.catalog.GraftCatalog")
    s.conf.set("spark.sql.catalog.g.warehouse", warehouse)
    SparkSession.setActiveSession(prev)
    SparkSession.setDefaultSession(prev)
    s
  }

  test("CREATE TABLE / INSERT INTO / SELECT / VERSION AS OF / TIMESTAMP AS OF") {
    spark.sql("CREATE TABLE g.t1 (id BIGINT, kind STRING)")
    val vt = VersionedTable(spark, s"$warehouse/t1")
    assert(vt.read().count() == 0 &&
      vt.read().schema.fieldNames.toSeq == Seq("id", "kind"))
    spark.sql("INSERT INTO g.t1 VALUES (1, 'a'), (2, 'b')")        // v1
    spark.sql("INSERT INTO g.t1 VALUES (3, 'c')")                  // v2
    assert(spark.sql("SELECT count(*) AS n FROM g.t1").head.getLong(0) == 3)
    assert(spark.sql("SELECT id FROM g.t1 VERSION AS OF 1")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // a far-future timestamp resolves to the latest version
    assert(spark.sql(
      "SELECT count(*) AS n FROM g.t1 TIMESTAMP AS OF '2999-01-01'")
      .head.getLong(0) == 3)
    // catalog listing sees the table
    assert(spark.sql("SHOW TABLES IN g").collect()
      .map(_.getString(1)).contains("t1"))
  }

  test("catalog SELECT pushes predicates to the stats-skipping layer") {
    spark.sql("CREATE TABLE g.t2 (id BIGINT, v DOUBLE)")
    val vt = VersionedTable(spark, s"$warehouse/t2")
    import spark.implicits._
    // 4 range-partitioned files with disjoint id ranges
    vt.commitAppend((1L to 1000L).map(i => (i, i * 0.5)).toDF("id", "v")
      .repartitionByRange(4, col("id")))
    val total = vt.snapshotDataFiles().size
    val n = spark.sql("SELECT v FROM g.t2 WHERE id <= 100").count()
    assert(n == 100)
    val scanned = GraftLakeRelation.lastScanFiles.get(s"$warehouse/t2")
    assert(scanned < total,
      s"predicate did not prune: scanned $scanned of $total files")
  }

  test("DELETE FROM (translatable) and TRUNCATE work without extensions") {
    spark.sql("CREATE TABLE g.t3 (id BIGINT, kind STRING)")
    spark.sql("INSERT INTO g.t3 VALUES (1,'a'), (2,'b'), (3,'a')")
    spark.sql("DELETE FROM g.t3 WHERE kind = 'a'")
    assert(spark.sql("SELECT id FROM g.t3").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    spark.sql("TRUNCATE TABLE g.t3")
    assert(spark.sql("SELECT * FROM g.t3").count() == 0)
    // history preserved across the truncate — time travel still works
    assert(spark.sql("SELECT id FROM g.t3 VERSION AS OF 1").count() == 3)
  }

  test("ALTER TABLE ADD/RENAME/DROP COLUMN are metadata-only commits") {
    spark.sql("CREATE TABLE g.t4 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO g.t4 VALUES (1, 'x')")
    val vt = VersionedTable(spark, s"$warehouse/t4")
    val filesBefore = vt.commitFiles(vt.latestVersion().get)
    spark.sql("ALTER TABLE g.t4 ADD COLUMN score DOUBLE")
    spark.sql("ALTER TABLE g.t4 RENAME COLUMN v TO label")
    // existing rows null-backfill the added column; rename is logical
    val row = spark.sql("SELECT id, label, score FROM g.t4").head
    assert(row.getLong(0) == 1L && row.getString(1) == "x" && row.isNullAt(2))
    spark.sql("ALTER TABLE g.t4 DROP COLUMN label")
    assert(spark.sql("SELECT * FROM g.t4").schema.fieldNames.toSeq ==
      Seq("id", "score"))
    // all three were metadata-only: the data files never moved
    assert(vt.commitFiles(vt.latestVersion().get) == filesBefore,
      "ALTER TABLE rewrote data files — must be metadata-only")
    // non-nullable add fails loudly
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE g.t4 ADD COLUMN req INT NOT NULL")
    }
    assert(e.getMessage.contains("nullable"), e.getMessage)
  }

  test("LOCATION registers an existing lake table externally; DROP removes only the pointer") {
    import spark.implicits._
    val ext = java.nio.file.Files.createTempDirectory("graft-cat-ext")
      .toString + "/t"
    VersionedTable(spark, ext).commitOverwrite(
      Seq((1L, "a")).toDF("id", "v"))
    spark.sql(s"CREATE TABLE g.t5 (id BIGINT, v STRING) LOCATION '$ext'")
    assert(spark.sql("SELECT v FROM g.t5").head.getString(0) == "a")
    spark.sql("DROP TABLE g.t5")
    // the data survived the drop; the catalog forgot the name
    assert(VersionedTable(spark, ext).read().count() == 1)
    assert(!spark.catalog.tableExists("g.t5"))
    // managed drop removes data
    spark.sql("CREATE TABLE g.t5m (id BIGINT)")
    spark.sql("DROP TABLE g.t5m")
    assert(VersionedTable(spark, s"$warehouse/t5m").versions().isEmpty)
  }

  test("CTAS and INSERT OVERWRITE") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE g.t6 AS SELECT * FROM ctas_src")
    assert(spark.sql("SELECT count(*) AS n FROM g.t6").head.getLong(0) == 2)
    spark.sql("INSERT OVERWRITE g.t6 SELECT id + 10, v FROM ctas_src")
    assert(spark.sql("SELECT min(id) AS m FROM g.t6").head.getLong(0) == 11)
    val vt = VersionedTable(spark, s"$warehouse/t6")
    assert(vt.history().map(_._2).last == "overwrite")
  }

  test("namespaces map to warehouse directories") {
    spark.sql("CREATE NAMESPACE g.ns1")
    spark.sql("CREATE TABLE g.ns1.nt (id BIGINT)")
    spark.sql("INSERT INTO g.ns1.nt VALUES (7)")
    assert(spark.sql("SELECT id FROM g.ns1.nt").head.getLong(0) == 7L)
    assert(VersionedTable(spark, s"$warehouse/ns1/nt").read().count() == 1)
    assert(spark.sql("SHOW TABLES IN g.ns1").collect()
      .map(_.getString(1)).toSeq == Seq("nt"))
  }

  test("UPDATE via SQL rewrites only files that can hold a match (extensions)") {
    extSpark.sql("CREATE TABLE g.t7 (id BIGINT, status STRING, n BIGINT)")
    val vt = VersionedTable(extSpark, s"$warehouse/t7")
    import extSpark.implicits._
    vt.commitAppend((1L to 400L).map(i => (i, "new", i))
      .toDF("id", "status", "n").repartitionByRange(4, col("id")))
    val before = vt.commitFiles(vt.latestVersion().get).toSet
    extSpark.sql(
      "UPDATE g.t7 SET status = 'done', n = n * 2 WHERE id <= 100")
    val after = vt.commitFiles(vt.latestVersion().get).toSet
    // file-granular: the three untouched range files survive by identity
    assert((before & after).size == 3,
      s"expected 3 untouched files to survive, got ${(before & after).size}")
    val r = extSpark.sql(
      "SELECT status, sum(n) AS s FROM g.t7 GROUP BY status ORDER BY status")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq(
      ("done", 2L * (1L to 100L).sum), ("new", (101L to 400L).sum)))
    // arbitrary-predicate DELETE through the same rule
    extSpark.sql("DELETE FROM g.t7 WHERE length(status) + id % 2 = 5")
    assert(extSpark.sql("SELECT count(*) AS n FROM g.t7 WHERE status = " +
      "'done' AND id % 2 = 1").head.getLong(0) == 0)
  }

  test("MERGE INTO via SQL: full WHEN grammar, key-name bridging, loud non-equi rejection (extensions)") {
    import extSpark.implicits._
    extSpark.sql("CREATE TABLE g.t8 (id BIGINT, v STRING, n BIGINT)")
    extSpark.sql(
      "INSERT INTO g.t8 VALUES (1,'a',10), (2,'b',20), (3,'c',30)")
    Seq((1L, "A", 100L), (3L, "C", 300L), (9L, "I", 900L))
      .toDF("key", "v", "n").createOrReplaceTempView("m_src")
    extSpark.sql("""
      MERGE INTO g.t8 t USING m_src s ON t.id = s.key
      WHEN MATCHED AND s.n >= 300 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v, n = t.n + s.n
      WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.key, s.v, s.n)
      WHEN NOT MATCHED BY SOURCE AND t.id = 2 THEN UPDATE SET v = 'kept'
    """)
    val out = extSpark.sql("SELECT id, v, n FROM g.t8 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "A", 110L),    // matched update: t.n + s.n
      (2L, "kept", 20L),  // by-source update
      (9L, "I", 900L)))   // inserted; id=3 deleted by the first clause
    // non-equi ON fails loudly with the Scala-API pointer
    val e = intercept[Exception] {
      extSpark.sql("""MERGE INTO g.t8 t USING m_src s ON t.id >= s.key
        WHEN MATCHED THEN DELETE""")
    }
    assert(e.getMessage.contains("conjunction of target.key"), e.getMessage)
    // custom insert projections are rejected, not silently misapplied
    val e2 = intercept[Exception] {
      extSpark.sql("""MERGE INTO g.t8 t USING m_src s ON t.id = s.key
        WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.key, 'x', s.n)""")
    }
    assert(e2.getMessage.contains("same-named source column"), e2.getMessage)
  }

  test("MERGE INTO ... UPDATE SET * / INSERT * expand through the star actions (extensions)") {
    import extSpark.implicits._
    extSpark.sql("CREATE TABLE g.t9 (id BIGINT, v STRING)")
    extSpark.sql("INSERT INTO g.t9 VALUES (1,'a'), (2,'b')")
    Seq((2L, "B2"), (5L, "E5")).toDF("id", "v")
      .createOrReplaceTempView("m_src9")
    extSpark.sql("""
      MERGE INTO g.t9 t USING m_src9 s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """)
    assert(extSpark.sql("SELECT id, v FROM g.t9 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B2"), (5L, "E5")))
  }

  test("CALL gcat.system.<proc>: maintenance procedures from SQL") {
    import spark.implicits._
    spark.sql("CREATE TABLE g.tp (id BIGINT, v DOUBLE)")
    val vt = VersionedTable(spark, s"$warehouse/tp")
    // many small appends → fragmented table
    (1 to 5).foreach(i => spark.sql(
      s"INSERT INTO g.tp VALUES ($i, ${i}.0), (${i + 10}, ${i + 10}.0)"))
    val filesBefore = vt.snapshotDataFiles().size
    val opt = spark.sql(
      "CALL g.system.optimize(table => 'tp', target_rows => 1000)").head
    assert(opt.getInt(0) == vt.latestVersion().get)
    assert(vt.snapshotDataFiles().size < filesBefore)
    assert(vt.read().count() == 10)
    // history returns the whole commit log as a result set
    val hist = spark.sql("CALL g.system.history('tp')").collect()
    assert(hist.length == vt.versions().size)
    // restore: pre-optimize content as a NEW version
    val preOpt = vt.latestVersion().get - 1
    val rest = spark.sql(s"CALL g.system.restore('tp', $preOpt)").head
    assert(rest.getInt(0) == vt.latestVersion().get)
    assert(vt.read().count() == 10)
    // constraints round-trip through SQL
    spark.sql("CALL g.system.constraint_add('tp', 'pos', 'v >= 0')")
    val bad = intercept[Exception] {
      spark.sql("INSERT INTO g.tp VALUES (99, -1.0)")
    }
    assert(bad.getMessage.contains("pos"), bad.getMessage)
    spark.sql("CALL g.system.constraint_drop('tp', 'pos')")
    spark.sql("INSERT INTO g.tp VALUES (99, -1.0)")
    // zorder rewrites clustered; content unchanged
    val z = spark.sql(
      "CALL g.system.zorder('tp', 'id', 'v', 8, 2)").head
    assert(z.getInt(0) == vt.latestVersion().get)
    assert(vt.read().count() == 11)
    // vacuum with explicit min_age_ms=0 (the opt-in) prunes history
    val del = spark.sql(
      "CALL g.system.vacuum('tp', 2, 0)").head.getInt(0)
    assert(del > 0, "vacuum should have deleted unreferenced files")
    // unknown procedure fails loudly (Spark wraps the catalog's
    // available-list message in FAILED_TO_LOAD_ROUTINE)
    val e = intercept[Exception] {
      spark.sql("CALL g.system.nope('tp')")
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("with extensions, catalog SELECTs of plain snapshots replan to the native file scan (DML untouched)") {
    extSpark.sql("CREATE TABLE g.tn (id BIGINT, v DOUBLE)")
    extSpark.sql("INSERT INTO g.tn SELECT id, id * 0.5 FROM range(1000)")
    val q = extSpark.sql("SELECT sum(v) AS s FROM g.tn WHERE id < 100")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"),
      s"catalog read did not take the native path under extensions:\n$plan")
    assert(q.head.getDouble(0) == (0 until 100).map(_ * 0.5).sum)
    // time travel rides the same rewrite. A bare count(*) is now
    // answered from METADATA (r18 GraftMetadataAggregates —
    // LocalTableScan, zero files), so probe the scan plan with a
    // non-rewritable aggregate and pin the metadata shape for the count.
    extSpark.sql("INSERT INTO g.tn VALUES (9999, -1.0)")
    val tt = extSpark.sql("SELECT sum(v) AS s FROM g.tn VERSION AS OF 1")
    assert(tt.queryExecution.executedPlan.toString.contains("GraftFileIndex"))
    val ttc = extSpark.sql("SELECT count(*) AS n FROM g.tn VERSION AS OF 1")
    assert(ttc.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "count(*) must answer from the log under extensions")
    assert(ttc.head.getLong(0) == 1000)
    // DML on the same table still routes through the command rules
    extSpark.sql("UPDATE g.tn SET v = 0.0 WHERE id = 9999")
    assert(extSpark.sql("SELECT v FROM g.tn WHERE id = 9999")
      .head.getDouble(0) == 0.0)
    // the V1 format door also replans natively under extensions
    val door = extSpark.read.format("graft-lake").load(s"$warehouse/tn")
    assert(door.queryExecution.executedPlan.toString
      .contains("GraftFileIndex"))
    assert(door.count() == extSpark.sql("SELECT count(*) FROM g.tn")
      .head.getLong(0))
    // the extension-less session keeps the V1 bridge (correct, just
    // not replanned)
    assert(!spark.sql("SELECT sum(v) AS s FROM g.tn WHERE id < 100")
      .queryExecution.executedPlan.toString.contains("GraftFileIndex"))
  }

  test("catalog SELECTs of DV-overlaid snapshots replan to the native scan + anti-join (r17); column-mapped go native too (r18)") {
    extSpark.sql("CREATE TABLE g.tdv (id BIGINT, v DOUBLE)")
    extSpark.sql("INSERT INTO g.tdv SELECT id, id * 1.0 FROM range(1000)")
    val vt = VersionedTable(extSpark, s"$warehouse/tdv")
    vt.deleteMoR(col("id") % 10 === 0L) // DV overlay, files untouched
    val q = extSpark.sql("SELECT count(*) AS n, sum(v) AS s FROM g.tdv WHERE id < 100")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftFileIndex"),
      s"DV catalog read must keep the native data-side scan:\n$plan")
    assert(plan.contains("dv_not_deleted") ||
      plan.toLowerCase.contains("leftanti"),
      s"DV catalog read must overlay the deleted positions:\n$plan")
    val row = q.head
    assert(row.getLong(0) == 90 &&
      row.getDouble(1) == (1 until 100).filter(_ % 10 != 0).map(_.toDouble).sum)
    // time travel to the pre-DV version stays on the plain native path
    // (sum(v) probes the scan — a bare count(*) is metadata-answered
    // since r18)
    val tt = extSpark.sql("SELECT sum(v) AS s FROM g.tdv VERSION AS OF 1")
    assert(tt.queryExecution.executedPlan.toString.contains("GraftFileIndex"))
    assert(tt.head.getDouble(0) == (0 until 1000).map(_.toDouble).sum)
    // r18: a column-mapped snapshot (here DV + rename COMBINED) also
    // replans to the native scan — physical-schema data side through the
    // graft index, DV overlay, logical projection on top. Pre-r18 this
    // fell back to the V1 row bridge (the ~1.4× scan tax, forever after
    // the first rename).
    extSpark.sql("ALTER TABLE g.tdv RENAME COLUMN v TO val")
    val cm = extSpark.sql("SELECT count(*) AS n FROM g.tdv WHERE val >= 0")
    assert(cm.queryExecution.executedPlan.toString.contains("GraftFileIndex"),
      "column-mapped snapshot must scan natively (r18):\n" +
        cm.queryExecution.executedPlan.toString)
    assert(cm.head.getLong(0) == 900)
  }

  test("DML refuses a time-travel target; writes refuse a snapshot") {
    // Spark's grammar already refuses time travel in DML targets (the
    // command guards are defense-in-depth behind it) — the statement
    // must fail, not silently mutate the snapshot
    intercept[Exception] {
      extSpark.sql("DELETE FROM g.t1 VERSION AS OF 0 WHERE id = 1")
    }
    // INSERT into a time-travel read is equally refused
    intercept[Exception] {
      extSpark.sql("INSERT INTO g.t1 VERSION AS OF 0 VALUES (9, 'z')")
    }
    assert(extSpark.sql("SELECT count(*) AS n FROM g.t1 VERSION AS OF 0")
      .head.getLong(0) == 0)
  }

  test("identifier resolution is case-insensitive (metastore parity)") {
    spark.sql("CREATE TABLE g.CaseTbl (id BIGINT)")
    spark.sql("INSERT INTO g.casetbl VALUES (1), (2)")
    // every case form addresses the SAME table (Spark default:
    // spark.sql.caseSensitive = false)
    assert(spark.sql("SELECT count(*) AS n FROM g.CASETBL").head.getLong(0) == 2)
    assert(spark.sql("SELECT count(*) AS n FROM g.CaseTbl").head.getLong(0) == 2)
    spark.sql("DROP TABLE g.cAsEtBl")
    assert(spark.catalog.tableExists("g.CaseTbl") == false)
  }

  test("CREATE ... LOCATION at a non-lake dir without a schema fails BEFORE registering (no dangling pointer)") {
    val bogus = java.nio.file.Files.createTempDirectory("graft-nonlake").toString
    intercept[Exception] {
      spark.sql(s"CREATE TABLE g.dangler USING `graft-lake` LOCATION '$bogus'")
    }
    // the failed CREATE left nothing behind: the SAME statement with a
    // schema now succeeds instead of dying on 'file exists'
    spark.sql(s"CREATE TABLE g.dangler (id BIGINT) USING `graft-lake` LOCATION '$bogus'")
    spark.sql("INSERT INTO g.dangler VALUES (7)")
    assert(spark.sql("SELECT id FROM g.dangler").head.getLong(0) == 7L)
    spark.sql("DROP TABLE g.dangler")
  }

  test("CREATE TABLE ... PARTITIONED BY: exact partition pruning through SQL; INSERT keeps the layout") {
    spark.sql("CREATE TABLE g.pt (day STRING, k STRING, n BIGINT) PARTITIONED BY (day)")
    spark.sql("INSERT INTO g.pt SELECT CASE WHEN id % 3 = 0 THEN 'a' " +
      "WHEN id % 3 = 1 THEN 'b' ELSE 'c' END, CAST(id AS STRING), id " +
      "FROM range(300)")
    val vt = VersionedTable(spark, s"$warehouse/pt")
    assert(vt.partitionColumns() == Seq("day"))
    // partition predicate through plain SQL plans exactly the
    // partition's files (observable through the pruning hook)
    val total = vt.snapshotDataFiles().size
    assert(spark.sql("SELECT count(*) AS n FROM g.pt WHERE day = 'b'")
      .head.getLong(0) == 100)
    val scanned = GraftLakeRelation.lastScanFiles.get(s"$warehouse/pt")
    val exact = vt.snapshotDataFiles().count { f =>
      spark.read.parquet(s"$warehouse/pt/$f")
        .filter(col("day") === "b").limit(1).count() > 0
    }
    assert(scanned == exact && scanned < total,
      s"partition predicate scanned $scanned of $total files (exact = $exact)")
    // the V2 table surfaces the partitioning
    assert(spark.sql("DESCRIBE TABLE EXTENDED g.pt").collect()
      .map(_.getString(0)).exists(_.contains("Part 0")) ||
      spark.sql("SHOW CREATE TABLE g.pt").head.getString(0)
        .contains("PARTITIONED BY"))
    // CALL replace_partitions: swap one partition from a view
    import spark.implicits._
    Seq(("b", "fresh", 1L)).toDF("day", "k", "n")
      .createOrReplaceTempView("pt_src")
    val cFilesBefore = vt.snapshotDataFiles().filter { f =>
      spark.read.parquet(s"$warehouse/pt/$f")
        .filter(col("day") === "c").limit(1).count() > 0
    }.toSet
    spark.sql("CALL g.system.replace_partitions('pt', 'pt_src')")
    assert(spark.sql("SELECT count(*) AS n FROM g.pt WHERE day = 'b'")
      .head.getLong(0) == 1)
    assert(spark.sql("SELECT count(*) AS n FROM g.pt WHERE day = 'c'")
      .head.getLong(0) == 100)
    assert(cFilesBefore.subsetOf(vt.snapshotDataFiles().toSet),
      "untouched partition's files must survive CALL replace_partitions by identity")
  }

  test("INSERT OVERWRITE with partitionOverwriteMode=dynamic replaces only the insert's partitions (extensions)") {
    extSpark.sql("CREATE TABLE g.dynp (day STRING, n BIGINT) PARTITIONED BY (day)")
    extSpark.sql("INSERT INTO g.dynp VALUES ('a', 1), ('a', 2), ('b', 3), ('c', 4)")
    val vt = VersionedTable(extSpark, s"$warehouse/dynp")
    val cFiles = vt.snapshotDataFiles().filter { f =>
      extSpark.read.parquet(s"$warehouse/dynp/$f")
        .filter(col("day") === "c").limit(1).count() > 0
    }.toSet
    val prevMode = extSpark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    extSpark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      extSpark.sql("INSERT OVERWRITE g.dynp VALUES ('a', 9), ('b', 8)")
    } finally prevMode match {
      case Some(m) => extSpark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None => extSpark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // replaced partitions hold exactly the insert's rows; untouched
    // partition c survives with its rows AND its files by identity
    assert(extSpark.sql("SELECT day, count(*) AS n FROM g.dynp GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
    assert(extSpark.sql("SELECT n FROM g.dynp WHERE day = 'c'").head.getLong(0) == 4L)
    assert(cFiles.subsetOf(vt.snapshotDataFiles().toSet),
      "dynamic overwrite must not touch partition c's files")
    // static mode (the default) keeps the truncate semantics
    extSpark.sql("INSERT OVERWRITE g.dynp VALUES ('z', 1)")
    assert(extSpark.sql("SELECT count(*) AS n FROM g.dynp").head.getLong(0) == 1L)
    // without extensions the statement fails LOUDLY (no V1 fallback
    // exists for dynamic overwrite) instead of corrupting anything
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try intercept[Exception] {
      spark.sql("INSERT OVERWRITE g.dynp VALUES ('q', 1)")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("TBLPROPERTIES round-trip: CREATE ... TBLPROPERTIES, SHOW, ALTER SET/UNSET, and CALL detail") {
    spark.sql("CREATE TABLE g.props (id BIGINT) TBLPROPERTIES " +
      "('owner.team' = 'data-eng', 'retention.days' = '30')")
    def props() = spark.sql("SHOW TBLPROPERTIES g.props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props().get("owner.team").contains("data-eng"))
    assert(props().get("retention.days").contains("30"))
    spark.sql("ALTER TABLE g.props SET TBLPROPERTIES ('retention.days' = '7')")
    spark.sql("ALTER TABLE g.props UNSET TBLPROPERTIES ('owner.team')")
    assert(props().get("retention.days").contains("7"))
    assert(!props().contains("owner.team"))
    // properties live in the commit log, not the catalog dir — a fresh
    // handle on the path sees them
    assert(VersionedTable(spark, s"$warehouse/props").properties().toMap ==
      Map("retention.days" -> "7"))
    // DESCRIBE DETAIL surface: one row of table facts with log-recorded
    // size
    spark.sql("INSERT INTO g.props VALUES (1), (2), (3)")
    val vt = VersionedTable(spark, s"$warehouse/props")
    val d = spark.sql("CALL g.system.detail('props')").head
    assert(d.getAs[String]("location").endsWith("/props"))
    assert(d.getAs[Int]("version") == vt.latestVersion().get)
    assert(d.getAs[Int]("num_files") == vt.snapshotDataFiles().size)
    val meta = vt.snapshotFileMeta()
    assert(d.getAs[Long]("size_bytes") ==
      vt.snapshotDataFiles().flatMap(meta.get).map(_.size).sum)
    assert(d.getAs[Long]("rows") == 3L)
    assert(d.getAs[String]("properties").contains("retention.days=7"))
  }

  test("mixed-case tables stranded by a pre-normalization build resolve via the legacy path") {
    // r17 advice: lowercasing the identifier→path derivation silently
    // stranded tables earlier builds created case-preserved — graft.MyTbl
    // resolved to warehouse/mytbl while the data lives at warehouse/MyTbl,
    // so SELECT threw NoSuchTable and a re-CREATE shadowed the data.
    // Simulate the legacy layout: a lake table at the case-preserved path.
    import spark.implicits._
    val vt = VersionedTable(spark, s"$warehouse/LegacyTbl")
    vt.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(spark.sql("SELECT count(*) FROM g.LegacyTbl").head().getLong(0) == 2)
    // DML lands on the legacy directory, not an empty shadow
    spark.sql("INSERT INTO g.LegacyTbl VALUES (3, 'c')")
    assert(vt.read().count() == 3)
    assert(!new java.io.File(s"$warehouse/legacytbl").exists())
    // a NEW mixed-case table still lands on the normalized path
    spark.sql("CREATE TABLE g.FreshTbl (id BIGINT)")
    assert(new java.io.File(s"$warehouse/freshtbl/_graft_log").exists())
    spark.sql("DROP TABLE g.FreshTbl")
  }

  test("dynamic partition pruning fires through the SQL door (extensions splice)") {
    import extSpark.implicits._
    extSpark.sql(
      "CREATE TABLE g.dppfact (day INT, v DOUBLE) PARTITIONED BY (day)")
    extSpark.sql("INSERT INTO g.dppfact " +
      "SELECT CAST(id % 16 AS INT), id * 1.0 FROM range(16000)")
    val dimPath = java.nio.file.Files
      .createTempDirectory("graft-sqldpp-dim").toString + "/dim"
    (0 until 16).map(i => (i, if (i == 3) "keep" else "drop"))
      .toDF("dim_day", "tag").write.parquet(dimPath)
    extSpark.read.parquet(dimPath).createOrReplaceTempView("dpp_dim")
    val q = extSpark.sql(
      "SELECT sum(v) AS s FROM g.dppfact f JOIN dpp_dim d " +
        "ON f.day = d.dim_day WHERE d.tag = 'keep'")
    // force + unwrap AQE's final plan
    val expected = (0L until 16000L).filter(_ % 16 == 3).map(_ * 1.0).sum
    assert(q.head.getDouble(0) == expected)
    val plan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.partitionSchema.fieldNames.contains("day") => s
    }
    assert(scan.nonEmpty, s"fact scan lost partitionSchema:\n$plan")
    assert(scan.exists(_.partitionFilters.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression]))),
      s"no DPP on the SQL-door fact scan:\n${scan.map(_.partitionFilters)}")
    extSpark.sql("DROP TABLE g.dppfact")
  }

  test("CALL g.system.partition_stats answers per-partition facts from metadata") {
    spark.sql("CREATE TABLE g.pstats (day STRING, n BIGINT) PARTITIONED BY (day)")
    spark.sql("INSERT INTO g.pstats VALUES ('a', 1), ('a', 2), ('b', 3)")
    val rows = spark.sql("CALL g.system.partition_stats(table => 'pstats')")
      .orderBy("day").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      Seq(("a", 2L), ("b", 1L)))
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(3) > 0))
    spark.sql("DROP TABLE g.pstats")
  }

  test("CALL procedures accept backquoted dotted table names (multipart grammar)") {
    spark.sql("CREATE TABLE g.`dot.ted` (id BIGINT)")
    spark.sql("INSERT INTO g.`dot.ted` VALUES (1), (2), (3)")
    // a raw split on '.' would mis-resolve `dot.ted` as ns=dot, t=ted
    val hist = spark.sql("CALL g.system.history(table => '`dot.ted`')")
      .select("version").collect().map(_.getInt(0)).toSeq
    assert(hist == Seq(0, 1))
    spark.sql("DROP TABLE g.`dot.ted`")
  }

  test("r19: ALTER TABLE ALTER COLUMN SET/DROP NOT NULL routes to the lake's NOT NULL constraint") {
    spark.sql("CREATE TABLE g.t_nn (id BIGINT, v STRING)")
    spark.sql("INSERT INTO g.t_nn VALUES (1, 'x'), (2, NULL)")
    val vt = VersionedTable(spark, s"$warehouse/t_nn")
    def chain(t: Throwable): String =
      if (t == null) "" else String.valueOf(t.getMessage) + " | " + chain(t.getCause)
    // Spark's own analyzer refuses nullable->non-nullable on generic V2
    // catalogs BEFORE any catalog code runs - the SQL door is the
    // not_null_set procedure (Delta ships its own resolution rule for
    // the same reason)
    val analyzerBlocked = intercept[Exception](
      spark.sql("ALTER TABLE g.t_nn ALTER COLUMN id SET NOT NULL"))
    assert(chain(analyzerBlocked).contains("non-nullable"), chain(analyzerBlocked))
    // a null-holding column refuses the declaration
    val e = intercept[Exception](
      spark.sql("CALL g.system.not_null_set('t_nn', 'v')"))
    assert(chain(e).contains("violated"), chain(e))
    // a clean column accepts; the batch gate then rejects nulls
    spark.sql("CALL g.system.not_null_set('t_nn', 'id')")
    assert(vt.notNullColumns() == Seq("id"))
    val bad = intercept[Exception](
      spark.sql("INSERT INTO g.t_nn VALUES (NULL, 'y')"))
    assert(chain(bad).contains("__notnull__id"), chain(bad))
    assert(spark.sql("SELECT count(*) FROM g.t_nn").head.getLong(0) == 2)
    // DESCRIBE DETAIL surfaces the declaration in its own column
    assert(spark.sql("CALL g.system.detail('t_nn')")
      .select("not_null").head.getString(0) == "id")
    // dropping releases it
    spark.sql("CALL g.system.not_null_drop('t_nn', 'id')")
    assert(vt.notNullColumns().isEmpty)
    spark.sql("INSERT INTO g.t_nn VALUES (NULL, 'y')")
    assert(spark.sql("SELECT count(*) FROM g.t_nn").head.getLong(0) == 3)
  }
}
