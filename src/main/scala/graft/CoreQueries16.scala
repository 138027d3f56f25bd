package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Sixteenth core tranche (round 9, extended round 10): relative-rank
  * window functions, the longest-duplicated-span analysis built on the
  * positional rolling-hash windows, and the batch-equivalence oracle
  * row for the streaming left-outer interval join.
  */
object CoreQueries16 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // SCD2 temporal join — the payoff of the historized dimension
    // (q_scd2_intervals): each fact row joins the dimension VERSION
    // valid at its event time ([valid_from, valid_to)), the classic
    // "state as of the transaction" warehouse query. Plan shape: the
    // join is EQUI on user_id with the interval bounds as residual
    // filter — one keyed shuffle, never a nested-loop range scan; the
    // dimension is orders of magnitude smaller than the fact stream
    // (change rows only), so at scale it broadcasts. Aggregated to
    // (user, state) so the output compare stays compact at any sf.
    q("q_scd2_join",
      """WITH e AS (SELECT user_id, event_type, ts, event_id, value FROM events
        |  WHERE user_id < 100),
        |c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev FROM e),
        |v AS (SELECT user_id, event_type, ts, event_id FROM c
        |  WHERE prev IS NULL OR prev <> event_type),
        |dim AS (SELECT user_id, event_type AS state, ts AS vfrom,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vto
        |  FROM v)
        |SELECT e.user_id, dim.state, count(*) AS n_events,
        |  round(sum(e.value), 2) AS total_value
        |FROM e JOIN dim ON e.user_id = dim.user_id
        |  AND e.ts >= dim.vfrom AND (dim.vto IS NULL OR e.ts < dim.vto)
        |GROUP BY e.user_id, dim.state
        |ORDER BY e.user_id, dim.state""".stripMargin) { (s, d) =>
      val wU = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val e = events(s, d).filter(col("user_id") < 100)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"), col("value"))
      val dim = e.withColumn("prev", lag("event_type", 1).over(wU))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("vto", lead("ts", 1).over(wU))
        .select(col("user_id").as("d_user_id"), col("event_type").as("state"),
          col("ts").as("vfrom"), col("vto"))
      e.join(dim,
          col("user_id") === col("d_user_id") &&
            col("ts") >= col("vfrom") &&
            (col("vto").isNull || col("ts") < col("vto")))
        .groupBy(col("user_id"), col("state"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"))
        .orderBy("user_id", "state")
    },

    // Time travel through the CORRECTNESS board: three versions of a
    // lake table (initial load → copy-on-write DELETE → copy-on-write
    // numeric UPDATE) read back BY VERSION NUMBER, each snapshot's
    // row count and balance sum compared against the oracle's replay
    // of the same three states from the raw table. What's proven: the
    // versioned log reconstructs every historical snapshot exactly —
    // not just the latest — through real commit I/O. Snapshot reads
    // resolve O(1) via the _last_checkpoint pointer + version probe.
    q("q_lake_time_travel",
      """SELECT 0 AS version, count(*) AS n_rows,
        |  round(sum(c_acctbal), 2) AS balance_sum FROM customer
        |UNION ALL
        |SELECT 1, count(*), round(sum(c_acctbal), 2)
        |FROM customer WHERE c_acctbal >= 0
        |UNION ALL
        |SELECT 2, count(*),
        |  round(sum(CASE WHEN c_mktsegment = 'BUILDING'
        |    THEN c_acctbal + 100 ELSE c_acctbal END), 2)
        |FROM customer WHERE c_acctbal >= 0
        |ORDER BY version""".stripMargin) { (s, d) =>
      val dir = graft.lake.Scratch.dir("graft-vt-tt") + "/t"
      val t = graft.lake.VersionedTable(s, dir)
      t.commitOverwrite(customer(s, d))
      // delete/update return None (and commit NOTHING) when no row
      // matches — a fixture regeneration with no negative balances or
      // no BUILDING segment would otherwise surface later as a cryptic
      // missing-version read instead of failing here, at the cause
      t.delete(col("c_acctbal") < 0).getOrElse(sys.error(
        "q_lake_time_travel: DELETE matched no rows (fixture has no " +
          "negative c_acctbal) - version 1 would not exist"))
      t.update(col("c_mktsegment") === "BUILDING",
        Map("c_acctbal" -> (col("c_acctbal") + 100))).getOrElse(sys.error(
        "q_lake_time_travel: UPDATE matched no rows (fixture has no " +
          "BUILDING segment) - version 2 would not exist"))
      (0 to 2).map { v =>
        t.read(Some(v)).agg(count(lit(1)).as("n_rows"),
            round(sum("c_acctbal"), 2).as("balance_sum"))
          .select(lit(v).as("version"), col("n_rows"), col("balance_sum"))
      }.reduce(_.unionByName(_)).orderBy("version")
    },

    // Relative-rank windows: percent_rank + cume_dist per group under a
    // deterministic total order (unique-key tiebreak, so tie handling
    // can never diverge cross-engine, and rank == row_number). The
    // oracle states it as the window function; the Spark plan does NOT
    // run a window over partitionBy(l_returnflag) — that key has
    // cardinality 3, so the whole fact table would funnel into 3
    // single-task sorts at scale. Instead: the standing bucketed
    // two-pass prefix-sum (q_gini pattern). $100 price buckets are
    // monotone in the leading sort key, so (flag, bucket) concatenation
    // IS the global order: pass 1 ranks within (flag, bucket) — ~1000
    // buckets per flag, parallel, each a small sort; pass 2 prefix-sums
    // the per-bucket counts over the tiny bucket LIST only. Global
    // rank i = carry + local rank; percent_rank = (i-1)/(n-1),
    // cume_dist = i/n are arithmetic from there (division of identical
    // integer operands → bit-identical doubles cross-engine).
    q("q_percent_rank",
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val li = lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .withColumn("bkt", floor(col("l_extendedprice") / 100.0).cast("long"))
      // pass 1: rank within (flag, price-bucket) — parallel small sorts
      val wIn = Window.partitionBy("l_returnflag", "bkt")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
      val ranked = li.withColumn("lr", row_number().over(wIn).cast("long"))
      // pass 2: ordered carry over the bucket list only (≤ ~1k rows/flag)
      val wB = Window.partitionBy("l_returnflag").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val bkt = ranked.groupBy("l_returnflag", "bkt")
        .agg(count(lit(1)).as("bc"))
      val carries = bkt
        .withColumn("carry", coalesce(sum("bc").over(wB), lit(0L)))
        .select(col("l_returnflag"), col("bkt"), col("carry"))
      val totals = bkt.groupBy("l_returnflag").agg(sum("bc").as("n"))
      ranked
        .join(broadcast(carries), Seq("l_returnflag", "bkt"))
        .join(broadcast(totals), Seq("l_returnflag"))
        .withColumn("i", col("carry") + col("lr"))
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          round(when(col("n") > 1,
            (col("i") - 1).cast("double") / (col("n") - 1).cast("double"))
            .otherwise(lit(0.0)), 6).as("pr"),
          round(col("i").cast("double") / col("n").cast("double"), 6).as("cd"))
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    },

    // Longest duplicated span per document (the memorization-risk deep
    // cut on top of q_exact_substr's coverage mass): duplicated 8-token
    // windows merge into maximal spans whenever they overlap or touch
    // (gap ≤ wlen under a per-doc sort — a running-sum island pass, no
    // interval materialization), and the doc reports its span count and
    // longest span in tokens. Same replayable hash family end to end.
    q("q_longest_dup_span",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |h AS (SELECT doc_id, len(tok) AS n,
        |  [('0x' || substr(md5(x), 1, 8))::BIGINT % 1000000007 for x in tok] AS th
        |  FROM t),
        |w AS (SELECT doc_id, n,
        |  CASE WHEN n >= 8
        |    THEN [list_reduce(th[i+1:i+8], (acc, x) -> (acc*131 + x) % 1000000007)
        |          for i in range(0, n - 7)]
        |    ELSE [list_reduce(th, (acc, x) -> (acc*131 + x) % 1000000007)]
        |  END AS wh,
        |  CASE WHEN n >= 8 THEN 8 ELSE n END AS wlen FROM h),
        |e AS MATERIALIZED (SELECT doc_id, wlen, i AS pos, wh[i+1] AS fp
        |  FROM w, unnest(range(0, len(wh))) AS u(i)),
        |occ AS (SELECT fp, count(*) AS occ FROM e GROUP BY 1),
        |dup AS (SELECT e.doc_id, e.pos, e.wlen
        |  FROM e JOIN occ USING (fp) WHERE occ.occ >= 2),
        |d2 AS (SELECT doc_id, pos, wlen,
        |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > wlen
        |       THEN 1 ELSE 0 END AS brk FROM dup),
        |isl AS (SELECT doc_id, pos, wlen,
        |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS UNBOUNDED PRECEDING) AS grp FROM d2),
        |sp AS (SELECT doc_id, grp,
        |  max(pos) - min(pos) + max(wlen) AS span FROM isl GROUP BY 1, 2),
        |agg AS (SELECT doc_id, count(*)::BIGINT AS n_spans,
        |  max(span)::BIGINT AS longest_span FROM sp GROUP BY 1)
        |SELECT t.doc_id, coalesce(agg.n_spans, 0)::BIGINT AS n_spans,
        |  coalesce(agg.longest_span, 0)::BIGINT AS longest_span
        |FROM t LEFT JOIN agg ON agg.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      val rows = TextAnalysis.windowHashPositions(documents(s, d), 8)
      val occ = rows.groupBy("fp").agg(count(lit(1)).as("occ"))
      val dup = rows.join(occ, "fp").filter(col("occ") >= 2)
        .select("doc_id", "pos", "wlen")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val brk = when(col("pos") - lag(col("pos"), 1).over(w) > col("wlen"), 1L)
        .otherwise(0L)
      val islands = dup.withColumn("brk", brk)
        .withColumn("grp", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("doc_id", "grp")
        .agg((max("pos") - min("pos") + max("wlen")).as("span"))
      val agg = islands.groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"), max("span").as("longest_span"))
      documents(s, d).select("doc_id")
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("longest_span"), lit(0L)).as("longest_span"))
        .orderBy("doc_id")
    },

    // Batch-equivalence oracle row for the STREAMING left-outer
    // interval join (EventStreams.purchasesWithOptionalClick): every
    // purchase emits with each preceding click in the 30-minute
    // horizon, or a null click when none exists. The query calls the
    // SAME function the stream runs — withWatermark is a no-op on a
    // batch Dataset, so this is the identical join code path, not a
    // re-implementation; StreamingSpec separately proves the
    // watermark-driven null emission on an actual stream. Plan shape:
    // equi-join on user_id with the interval bounds as residual filter
    // (one keyed shuffle, broadcast when one side is small) — never a
    // time-range nested loop.
    q("q_interval_join_outer",
      """WITH c AS (SELECT user_id, event_id AS click_id, ts::TIMESTAMP AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts::TIMESTAMP AS purchase_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id, c.click_ts
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |  AND c.click_ts <= p.purchase_ts
        |  AND c.click_ts >= p.purchase_ts - INTERVAL 30 MINUTE
        |ORDER BY p.user_id, p.purchase_id, c.click_id""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      graft.streaming.EventStreams.purchasesWithOptionalClick(
          ev.filter(col("event_type") === "click")
            .select("user_id", "event_id", "ts"),
          ev.filter(col("event_type") === "purchase")
            .select("user_id", "event_id", "ts"))
        .orderBy("user_id", "purchase_id", "click_id")
    }
  )
}
