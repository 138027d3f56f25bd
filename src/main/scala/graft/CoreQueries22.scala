package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Twenty-second core tranche (round 16): the lake's CATALOG front
  * door — a V2 `TableCatalog` (org.apache.spark.sql.graft.catalog.
  * GraftCatalog) makes versioned tables first-class SQL citizens
  * (`CREATE TABLE g.t`, `INSERT INTO`, `SELECT ... VERSION AS OF`,
  * `DELETE`, `ALTER TABLE`), and the GraftExtensions DML rules route
  * `UPDATE` / `MERGE INTO` / arbitrary-predicate `DELETE` statements
  * to the lake's file-granular primitives — Delta's architecture
  * (catalog + analysis rules), so a plain-SQL user gets the full DML
  * surface with zero Scala.
  */
object CoreQueries22 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  /** Register the graft catalog once per session under `gcat`, rooted
    * at a session-stable scratch warehouse (Spark instantiates the
    * plugin lazily from these confs and caches it per name, so the
    * warehouse must not move between runs in one session — repeat runs
    * instead hygiene through DROP TABLE IF EXISTS). */
  private def ensureCatalog(s: SparkSession): Unit =
    if (!s.conf.getOption("spark.sql.catalog.gcat").exists(_.nonEmpty)) {
      s.conf.set("spark.sql.catalog.gcat",
        "org.apache.spark.sql.graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse",
        graft.lake.Scratch.dir("graft-catalog-wh"))
    }

  private def warehouseOf(s: SparkSession): String =
    s.conf.get("spark.sql.catalog.gcat.warehouse")

  val all: Seq[QueryDef] = Seq(

    // The catalog surface WITHOUT session extensions — everything here
    // works on a vanilla SparkSession the moment the two catalog confs
    // are set: CTAS and INSERT land as versioned commits, DELETE routes
    // through SupportsDelete to the copy-on-write primitive, VERSION AS
    // OF resolves through the catalog's time-travel loadTable, ALTER
    // TABLE ADD COLUMN is a metadata-only commit (asserted by file
    // IDENTITY — a rewrite must fail the proof), and a range predicate
    // typed into plain SQL reaches the stats-skipping layer (asserted:
    // the scan opened exactly candidateFiles(pred), strictly fewer than
    // the table holds). The oracle recomputes the surviving rows from
    // raw customer. At 100 TB the catalog is what lets an analyst's SQL
    // notebook hit a versioned table with file pruning — no Scala, no
    // path strings in queries.
    q("q_lake_catalog_sql",
      """SELECT c_mktsegment AS segment, count(*) AS n,
        |  round(sum(c_acctbal), 2) AS bal
        |FROM customer WHERE c_mktsegment <> 'MACHINERY'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      ensureCatalog(s)
      val cust = customer(s, d).select("c_custkey", "c_mktsegment", "c_acctbal")
      cust.createOrReplaceTempView("cat_cust_src")
      s.sql("DROP TABLE IF EXISTS gcat.cust")
      // CTAS seeds even keys (range-partitioned so key stats are tight
      // per file); INSERT INTO appends the odd half — two commits
      s.sql("""CREATE TABLE gcat.cust AS
              |SELECT /*+ REPARTITION_BY_RANGE(8, c_custkey) */ *
              |FROM cat_cust_src WHERE c_custkey % 2 = 0""".stripMargin)
      s.sql("""INSERT INTO gcat.cust
              |SELECT /*+ REPARTITION_BY_RANGE(8, c_custkey) */ *
              |FROM cat_cust_src WHERE c_custkey % 2 = 1""".stripMargin)
      val dir = s"${warehouseOf(s)}/cust"
      val t = graft.lake.VersionedTable(s, dir)
      // v0 = CREATE's empty schema commit, v1 = CTAS data, v2 = INSERT
      if (t.history().map(_._2) != Seq("overwrite", "append", "append"))
        sys.error(s"q_lake_catalog_sql: CTAS+INSERT did not land as " +
          s"versioned commits: ${t.history().map(_._2)}")
      // catalog DELETE (translatable predicate → SupportsDelete → CoW)
      s.sql("DELETE FROM gcat.cust WHERE c_mktsegment = 'MACHINERY'")
      // time travel through the catalog: pre-delete version is whole
      val v2n = s.sql("SELECT count(*) AS n FROM gcat.cust VERSION AS OF 2")
        .head().getLong(0)
      if (v2n != cust.count())
        sys.error(s"q_lake_catalog_sql: VERSION AS OF 2 shows $v2n rows, " +
          s"want ${cust.count()}")
      // ALTER TABLE ADD COLUMN: metadata-only, proven by file identity
      val filesBefore = t.commitFiles(t.latestVersion().get)
      s.sql("ALTER TABLE gcat.cust ADD COLUMN score DOUBLE")
      if (t.commitFiles(t.latestVersion().get) != filesBefore)
        sys.error("q_lake_catalog_sql: ADD COLUMN rewrote data files — " +
          "must be metadata-only")
      val nullScores = s.sql(
        "SELECT count(*) AS n FROM gcat.cust WHERE score IS NOT NULL")
        .head().getLong(0)
      if (nullScores != 0)
        sys.error("q_lake_catalog_sql: added column must null-backfill")
      // a selective SQL predicate must reach the stats-skipping layer
      val cut = cust.agg(max("c_custkey")).head().getAs[Number](0).longValue / 10
      s.sql(s"SELECT c_acctbal FROM gcat.cust WHERE c_custkey <= $cut")
        .collect()
      val scanned = Option(org.apache.spark.sql.graft.GraftLakeRelation
        .lastScanFiles.get(dir)).map(_.toInt).getOrElse(-1)
      val expect = t.candidateFiles(col("c_custkey") <= cut).size
      val total = t.snapshotDataFiles().size
      if (scanned != expect || scanned >= total)
        sys.error(s"q_lake_catalog_sql: catalog SQL predicate did not " +
          s"prune: scanned $scanned, stats say $expect, table holds $total")
      // maintenance from SQL: CALL optimize compacts the fragmented
      // layout (CTAS half + INSERT half + delete rewrites) into fewer
      // files as a NEW version — content must be unchanged, which the
      // oracle compare below proves
      val optV = s.sql("CALL gcat.system.optimize(table => 'cust')")
        .head().getInt(0)
      if (optV != t.latestVersion().get ||
          t.snapshotDataFiles().size >= total)
        sys.error(s"q_lake_catalog_sql: CALL optimize did not compact: " +
          s"${t.snapshotDataFiles().size} files (was $total), v$optV")
      s.sql("""SELECT c_mktsegment AS segment, count(*) AS n,
              |  round(sum(c_acctbal), 2) AS bal
              |FROM gcat.cust GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // Full SQL DML (round 16): UPDATE, MERGE INTO (all five WHEN
    // shapes), and an arbitrary-predicate DELETE — statements Spark
    // only grants tables implementing SupportsRowLevelOperations (whole
    // -group rewrites) — land on the lake through the GraftExtensions
    // resolution rule as file-granular update/mergeConditional/delete
    // calls: stats-pruned pre-scans rewrite only files that can hold a
    // match. Runs on a dedicated extensions-carrying session sharing
    // the SparkContext (the driver session has no extensions — exactly
    // the "plain session vs SQL session" split Delta deployments have).
    // The oracle replays the whole UPDATE→MERGE→DELETE lifecycle as
    // pure relational algebra over raw orders — equality proves the SQL
    // statements applied the intended mutations exactly once each.
    q("q_lake_sql_dml",
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base),
        |mk AS (SELECT max(o_orderkey) AS m FROM base),
        |matched AS (
        |  SELECT u.o_orderkey, u.o_custkey, u.o_orderstatus,
        |    u.o_totalprice + b.o_totalprice AS o_totalprice
        |  FROM upd u JOIN base b ON u.o_orderkey = b.o_orderkey
        |  WHERE u.o_orderkey % 5 = 0 AND u.o_orderstatus <> 'F'),
        |unmatched AS (SELECT * FROM upd WHERE o_orderkey % 5 <> 0),
        |inserted AS (
        |  SELECT o_orderkey + (SELECT m FROM mk) + 1 AS o_orderkey, o_custkey,
        |    'N' AS o_orderstatus, 1000.0 AS o_totalprice
        |  FROM base WHERE o_orderkey % 97 = 0),
        |final AS (
        |  SELECT * FROM matched UNION ALL SELECT * FROM unmatched
        |  UNION ALL SELECT * FROM inserted)
        |SELECT o_orderstatus AS status, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM final WHERE o_orderkey % 13 <> 1
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val es = GraftSqlSessions.withDml(s)
      ensureCatalog(es)
      val base = orders(es, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      base.createOrReplaceTempView("dml_ord_src")
      es.sql("DROP TABLE IF EXISTS gcat.ord")
      es.sql("""CREATE TABLE gcat.ord AS
               |SELECT /*+ REPARTITION_BY_RANGE(8, o_orderkey) */ *
               |FROM dml_ord_src""".stripMargin)
      val dir = s"${warehouseOf(es)}/ord"
      val t = graft.lake.VersionedTable(es, dir)
      // UPDATE: files without an 'F' row are never rewritten
      es.sql("""UPDATE gcat.ord SET o_totalprice = o_totalprice * 2
               |WHERE o_orderstatus = 'F'""".stripMargin)
      if (t.history().map(_._2).last != "update")
        sys.error(s"q_lake_sql_dml: UPDATE did not land as an update " +
          s"commit: ${t.history().map(_._2)}")
      // MERGE: matched-F deletes, other matches add the source price,
      // beyond-max keys insert (INSERT * identity projection)
      val mx = base.agg(max("o_orderkey")).head().getAs[Number](0).longValue
      es.sql(s"""CREATE OR REPLACE TEMPORARY VIEW dml_merge_src AS
                |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                |FROM dml_ord_src WHERE o_orderkey % 5 = 0
                |UNION ALL
                |SELECT o_orderkey + $mx + 1 AS o_orderkey, o_custkey,
                |  'N' AS o_orderstatus, 1000.0 AS o_totalprice
                |FROM dml_ord_src WHERE o_orderkey % 97 = 0""".stripMargin)
      es.sql("""MERGE INTO gcat.ord t USING dml_merge_src s
               |ON t.o_orderkey = s.o_orderkey
               |WHEN MATCHED AND t.o_orderstatus = 'F' THEN DELETE
               |WHEN MATCHED THEN UPDATE
               |  SET o_totalprice = t.o_totalprice + s.o_totalprice
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      if (t.history().map(_._2).last != "merge")
        sys.error(s"q_lake_sql_dml: MERGE did not land as a merge " +
          s"commit: ${t.history().map(_._2)}")
      // DELETE with an untranslatable predicate — only the injected
      // rule can plan this (no SupportsRowLevelOperations fallback)
      es.sql("DELETE FROM gcat.ord WHERE o_orderkey % 13 = 1")
      es.sql("""SELECT o_orderstatus AS status, count(*) AS n,
               |  round(sum(o_totalprice), 2) AS total
               |FROM gcat.ord GROUP BY 1 ORDER BY 1""".stripMargin)
    }
  )
}

/** One extensions-carrying SparkSession per SparkContext, built lazily
  * the way ExtensionsSpec does (clear the active/default so getOrCreate
  * actually constructs, then restore): SQL DML statements need
  * [[GraftExtensions]]' resolution rule, and the driver's Verify/Bench
  * sessions are built without extensions — exactly the split a shared
  * cluster has between vanilla notebook sessions and the DML-enabled
  * one. Shares the SparkContext, so executors/UI/caches are shared. */
object GraftSqlSessions {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, SparkSession]()

  def withDml(s: SparkSession): SparkSession =
    cache.computeIfAbsent(s.sparkContext, _ => {
      val prevActive = SparkSession.getActiveSession
      val prevDefault = SparkSession.getDefaultSession
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val es = SparkSession.builder()
        .config("spark.sql.shuffle.partitions",
          s.conf.get("spark.sql.shuffle.partitions"))
        .config("spark.sql.session.timeZone",
          s.conf.get("spark.sql.session.timeZone", "UTC"))
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
      es
    })
}
