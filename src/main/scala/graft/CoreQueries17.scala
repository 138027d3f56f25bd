package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventeenth core tranche (round 10): the versioned lake's
  * incremental-consumer surface through the oracle board — change data
  * feed and schema evolution — plus the full-outer stream-stream
  * interval join (closing the §2.8 join-shape family) and a join-key
  * skew diagnostic (the pre-join planning profile a 100 TB pipeline
  * runs before choosing salting / broadcast strategy).
  */
object CoreQueries17 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Change data feed through the CORRECTNESS board: a deterministic
    // DML series (load → copy-on-write DELETE → copy-on-write UPDATE →
    // append) read back as row-level changes via
    // VersionedTable.changesBetween — Delta CDF semantics (inserts,
    // deletes; an update surfaces as its delete+insert pair; rows
    // copied through a rewrite unchanged produce NO change rows). The
    // oracle replays each commit's change set from the raw table, so
    // what's proven is the multiset-difference contract itself. Scale
    // shape: per version only the files that changed hands in that
    // commit are read (the incremental log's add/remove lists), so a
    // downstream consumer follows a 100 TB table by reading megabytes
    // per sync — cost ∝ change, never table size.
    q("q_lake_cdc",
      """SELECT 1 AS version, 'delete' AS change_type, count(*) AS n_rows,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 6)
        |    AS balance_sum
        |FROM customer WHERE c_acctbal < 0
        |UNION ALL
        |SELECT 2, 'delete', count(*),
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 6)
        |FROM customer WHERE c_acctbal >= 0 AND c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT 2, 'insert', count(*),
        |  round(CAST(sum(CAST(c_acctbal + 100 AS DECIMAL(28,6))) AS DOUBLE), 6)
        |FROM customer WHERE c_acctbal >= 0 AND c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT 3, 'insert', count(*),
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 6)
        |FROM customer WHERE c_custkey < 100
        |ORDER BY version, change_type""".stripMargin) { (s, d) =>
      val dir = graft.lake.Scratch.dir("graft-vt-cdc") + "/t"
      val t = graft.lake.VersionedTable(s, dir)
      t.commitOverwrite(customer(s, d))
      // same loud fixture-shape guards as q_lake_time_travel: a no-match
      // DML commits nothing and the expected version would not exist
      t.delete(col("c_acctbal") < 0).getOrElse(sys.error(
        "q_lake_cdc: DELETE matched no rows - version 1 would not exist"))
      t.update(col("c_mktsegment") === "BUILDING",
        Map("c_acctbal" -> (col("c_acctbal") + 100))).getOrElse(sys.error(
        "q_lake_cdc: UPDATE matched no rows - version 2 would not exist"))
      t.commitAppend(customer(s, d).filter(col("c_custkey") < 100)
        .withColumn("c_custkey", col("c_custkey") + 10000000L))
      t.changesBetween(0, 3)
        .groupBy(col("_commit_version").as("version"),
          col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n_rows"),
          // money sums accumulate in DECIMAL: exact and order-independent
          // at any scale (the sf1 sweep caught double-sum accumulation
          // drift here), so the full 6-digit discrimination is safe —
          // no tie ambiguity either, since no double sits exactly on a
          // 1e-6 rounding boundary
          round(sum(col("c_acctbal").cast("decimal(28,6)")).cast("double"), 6)
            .as("balance_sum"))
        .orderBy("version", "change_type")
    },

    // Schema evolution through the CORRECTNESS board: an append with a
    // NEW column (allowNewColumns — the Delta mergeSchema write) whose
    // snapshot read backfills the pre-evolution files with nulls. The
    // oracle replays the merged table (base rows carry no tier), so
    // what's proven is the null-backfill read contract across physical
    // files with different schemas — at 100 TB evolution must never
    // rewrite history, and here it provably doesn't: version 0's files
    // are byte-untouched, the new column exists only in version 1's.
    q("q_lake_schema_evolve",
      """WITH merged AS (
        |  SELECT c_acctbal, 'none' AS tier FROM customer
        |  UNION ALL
        |  SELECT c_acctbal,
        |    CASE WHEN c_acctbal >= 5000 THEN 'gold'
        |         WHEN c_acctbal >= 0 THEN 'std' ELSE 'neg' END
        |  FROM customer WHERE c_custkey < 200)
        |SELECT tier, count(*) AS n_rows,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 6)
        |    AS balance_sum
        |FROM merged GROUP BY tier ORDER BY tier""".stripMargin) { (s, d) =>
      val dir = graft.lake.Scratch.dir("graft-vt-evolve") + "/t"
      val t = graft.lake.VersionedTable(s, dir)
      val base = customer(s, d).select("c_custkey", "c_name", "c_acctbal")
      t.commitOverwrite(base)
      val evolved = customer(s, d).filter(col("c_custkey") < 200)
        .select((col("c_custkey") + 10000000L).as("c_custkey"), col("c_name"),
          col("c_acctbal"),
          when(col("c_acctbal") >= 5000, "gold")
            .when(col("c_acctbal") >= 0, "std")
            .otherwise("neg").as("c_tier"))
      t.commitAppend(evolved, allowNewColumns = true)
      t.read()
        .groupBy(coalesce(col("c_tier"), lit("none")).as("tier"))
        .agg(count(lit(1)).as("n_rows"),
          // DECIMAL accumulation: exact at any scale (see q_lake_cdc)
          round(sum(col("c_acctbal").cast("decimal(28,6)")).cast("double"), 6)
            .as("balance_sum"))
        .orderBy("tier")
    },

    // Batch-equivalence oracle row for the STREAMING full-outer
    // interval join (EventStreams.clickPurchaseFullOuter) — the last
    // stream-stream join shape after inner and left-outer: unmatched
    // purchases AND unmatched clicks both emit with nulls, each side's
    // null emission driven by the other side's watermark eviction. The
    // query calls the SAME function the stream runs (withWatermark is a
    // no-op on batch); StreamingSpec separately proves both
    // watermark-driven null emissions on an actual stream. Plan: equi
    // on user_id + interval residual, one keyed shuffle.
    q("q_interval_join_full",
      """WITH c AS (SELECT user_id, event_id AS click_id, ts::TIMESTAMP AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts::TIMESTAMP AS purchase_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT coalesce(p.user_id, c.user_id) AS user_id,
        |  p.purchase_id, p.purchase_ts, c.click_id, c.click_ts
        |FROM p FULL JOIN c ON c.user_id = p.user_id
        |  AND c.click_ts <= p.purchase_ts
        |  AND c.click_ts >= p.purchase_ts - INTERVAL 30 MINUTE
        |ORDER BY user_id, purchase_id, click_id""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      graft.streaming.EventStreams.clickPurchaseFullOuter(
          ev.filter(col("event_type") === "click")
            .select("user_id", "event_id", "ts"),
          ev.filter(col("event_type") === "purchase")
            .select("user_id", "event_id", "ts"))
        .orderBy("user_id", "purchase_id", "click_id")
    },

    // Stream-static enrichment (§2.8's remaining standard shape): the
    // event stream joined to a STATIC broadcast dimension — the dim
    // never enters streaming state — then rolled up per (day, segment);
    // unmatched users aggregate under 'UNKNOWN' (enrich never drops
    // facts). Batch-equivalence row: this query runs the SAME
    // EventStreams.enrichedSegmentDaily the stream runs; StreamingSpec
    // proves the streaming path on a live MemoryStream. Plan: broadcast
    // hash join (no shuffle for the join) + one keyed day/segment agg.
    q("q_stream_enrich",
      """SELECT strftime(time_bucket(INTERVAL '1 day', e.ts::TIMESTAMP),
        |    '%Y-%m-%d %H:%M:%S') AS day,
        |  coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
        |  count(*) AS n_events, round(sum(e.value), 2) AS total_value
        |FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      graft.streaming.EventStreams
        .enrichedSegmentDaily(events(s, d), customer(s, d))
        .orderBy("day", "segment")
    },

    // Join-key skew diagnostic: the heavy-hitter profile a pipeline
    // computes BEFORE a big join to decide between plain shuffle,
    // broadcast, and salting (ops.Skew) — top-5 hottest keys with their
    // share of the fact table and skew-vs-mean factor. Shape: one keyed
    // count (map-side partials), a TakeOrdered top-5 (never a global
    // window), and a 1-row totals broadcast; at any scale the output is
    // 5 rows and the only shuffle is the keyed count.
    q("q_skew_diagnostic",
      """WITH k AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1),
        |tot AS (SELECT sum(cnt)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys
        |  FROM k),
        |top AS (SELECT o_custkey, cnt FROM k ORDER BY cnt DESC, o_custkey LIMIT 5)
        |SELECT top.o_custkey, top.cnt,
        |  round(top.cnt * 1.0 / tot.n_rows, 6) AS share,
        |  round(top.cnt * tot.n_keys * 1.0 / tot.n_rows, 6) AS skew_vs_mean
        |FROM top CROSS JOIN tot
        |ORDER BY top.cnt DESC, top.o_custkey""".stripMargin) { (s, d) =>
      val k = orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      val tot = k.agg(sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"))
      k.orderBy(col("cnt").desc, col("o_custkey")).limit(5)
        .crossJoin(broadcast(tot))
        .select(col("o_custkey"), col("cnt"),
          round(col("cnt") * lit(1.0) / col("n_rows"), 6).as("share"),
          round(col("cnt") * col("n_keys") * lit(1.0) / col("n_rows"), 6)
            .as("skew_vs_mean"))
        .orderBy(col("cnt").desc, col("o_custkey"))
    }
  )
}
