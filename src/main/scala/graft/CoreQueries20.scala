package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Twentieth core tranche (round 14): the medallion pipeline run
  * INCREMENTALLY — the reference's Bronze→Silver→Gold architecture
  * (`/root/reference/main.py:599→622→635`) where each downstream layer
  * consumes its upstream's CHANGE FEED instead of re-scanning it
  * ([[graft.lake.ChangeFeedReader]] / [[graft.lake.Medallion]]). At
  * 100 TB this is the difference between a daily Gold refresh reading
  * the day's commits (megabytes) and re-aggregating the table; the
  * oracle is the full batch recompute, so equality PROVES the
  * incremental maintenance converges to the same result.
  */
object CoreQueries20 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Incremental medallion through the CORRECTNESS board: events land
    // in Bronze over three append rounds; after each, Silver refreshes
    // by consuming Bronze's change feed (clean + exactly-once append
    // keyed by the consumed version) and Gold folds Silver's changes
    // into algebraic (n, vsum) partials via an idempotent overwrite.
    // The ledger asserts pin the shape: Silver commits exactly one
    // append per batch (never a recompute), Gold one refresh per
    // batch, and both cursors end at their upstream heads. The oracle
    // recomputes Gold from the raw events in one batch aggregation —
    // equality proves incremental == batch after all three rounds.
    q("q_medallion_incremental",
      """WITH e AS (SELECT strftime(date_trunc('day', ts::TIMESTAMP),
        |    '%Y-%m-%d') AS day, event_type, value
        |  FROM events WHERE value IS NOT NULL)
        |SELECT day, event_type, count(*) AS n,
        |  round(sum(value), 2) AS vsum,
        |  round(sum(value) / count(*), 6) AS vavg
        |FROM e GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin) { (s, d) =>
      val root = graft.lake.Scratch.dir("graft-med")
      val m = new graft.lake.Medallion(s, root)
      val ev = events(s, d)
      val clean: DataFrame => DataFrame = df =>
        df.filter(col("value").isNotNull)
          .select(col("event_id"),
            date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
            col("event_type"), col("value"))
      (0 until 3).foreach { i =>
        m.ingest(ev.filter(pmod(col("event_id"), lit(3)) === i))
        m.refreshSilver(clean, Seq("event_id"))
        m.refreshGold(col("day"), col("event_type"), col("value"))
      }
      if (m.silver.history().map(_._2) != Seq("append", "append", "append"))
        sys.error(s"q_medallion_incremental: Silver was not maintained " +
          s"incrementally: ${m.silver.history().map(_._2)}")
      if (m.gold.history().size != 3)
        sys.error(s"q_medallion_incremental: expected 3 Gold refreshes, " +
          s"got ${m.gold.history().size}")
      if (m.silverCursor.lastProcessed() != 2 || m.goldCursor.lastProcessed() != 2)
        sys.error(s"q_medallion_incremental: cursors not at heads: " +
          s"silver=${m.silverCursor.lastProcessed()} gold=${m.goldCursor.lastProcessed()}")
      m.goldView()
        .select(col("bucket").as("day"), col("key").as("event_type"),
          col("n"), round(col("vsum"), 2).as("vsum"),
          round(col("vavg"), 6).as("vavg"))
        .orderBy("day", "event_type")
    },

    // Column mapping through the CORRECTNESS board (round 14): rename
    // and drop are METADATA-ONLY commits — the in-query asserts pin
    // that NEITHER touched a single data file — and the drop's
    // physical name is tombstoned so a later evolution re-adding the
    // same logical name binds fresh storage (the dropped values must
    // NOT resurface: the oracle's NULLs for pre-drop rows are the
    // proof). Appends and reads before/after each DDL resolve through
    // the logical→physical overlay. At 100 TB the alternative to this
    // is rewriting the table to rename a column.
    q("q_lake_rename",
      """WITH orig AS (
        |  SELECT c_custkey, c_mktsegment AS segment,
        |    CAST(NULL AS VARCHAR) AS cname, c_acctbal FROM customer),
        |b2 AS (
        |  SELECT c_custkey + 1000000, c_mktsegment,
        |    CAST(NULL AS VARCHAR), c_acctbal
        |  FROM customer WHERE c_custkey % 100 = 1),
        |b4 AS (
        |  SELECT c_custkey + 2000000, c_mktsegment, 'REBORN', c_acctbal
        |  FROM customer WHERE c_custkey % 100 = 2)
        |SELECT c_custkey, segment, coalesce(cname, '-') AS cname,
        |  round(c_acctbal, 2) AS acctbal
        |FROM (SELECT * FROM orig UNION ALL SELECT * FROM b2
        |      UNION ALL SELECT * FROM b4)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val dir = graft.lake.Scratch.dir("graft-vt-rename") + "/t"
      val t = graft.lake.VersionedTable(s, dir)
      val cust = customer(s, d)
      t.commitOverwrite(cust.repartition(4))                          // v0
      val files0 = t.history().last._4
      t.renameColumn("c_mktsegment", "segment")                       // v1
      if (t.history().last._4 != files0)
        sys.error("q_lake_rename: rename touched data files")
      // append under the NEW logical name (stages under the stable
      // physical one)
      t.commitAppend(cust.filter(col("c_custkey") % 100 === 1)
        .withColumn("c_custkey", col("c_custkey") + 1000000)
        .withColumnRenamed("c_mktsegment", "segment"))                // v2
      val files2 = t.history().last._4
      t.dropColumn("c_name")                                          // v3
      if (t.history().last._4 != files2)
        sys.error("q_lake_rename: drop touched data files")
      // evolution re-adds the dropped logical name — fresh physical id,
      // old values must stay buried
      t.commitAppend(cust.filter(col("c_custkey") % 100 === 2)
        .withColumn("c_custkey", col("c_custkey") + 2000000)
        .withColumnRenamed("c_mktsegment", "segment")
        .withColumn("c_name", lit("REBORN")),
        allowNewColumns = true)                                       // v4
      val actions = t.history().map(_._2)
      if (actions != Seq("overwrite", "rename-column", "append",
          "drop-column", "append"))
        sys.error(s"q_lake_rename: unexpected chain $actions")
      t.read()
        .select(col("c_custkey"), col("segment"),
          coalesce(col("c_name"), lit("-")).as("cname"),
          round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy("c_custkey")
    }
  )
}
