package graft

import graft.CheckpointStrategy.Ops._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eighth core tranche: behavioral / graph analytics over the event and
  * document tables — ordered funnels, cohort retention, exponentially
  * weighted smoothing, an iterative PageRank over the nation-trade graph,
  * and KMV set-intersection estimation (the pairwise sibling of
  * [[CoreQueries7]]'s union merge).
  *
  * The scale property shared by the tranche: every query's cross-cluster
  * state is either keyed by a high-cardinality column (user_id, doc
  * source) so it shuffle-partitions evenly, or bounded by a model-sized
  * table (25 nations, k-sized sketches, 190 source pairs) that broadcasts.
  */
object CoreQueries8 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  // KMV intersection sketch size + the (k-1)·2^32 estimator scale over
  // the md5-int hash range (same family as CoreQueries7's union merge).
  private val IK = 128
  private val IScale = (IK - 1) * 4294967296.0

  // EWMA: alpha = 1/2 so every weight is an exact power of two — the
  // weighted sum is then bit-identical across engines (no rounding slack
  // needed in the accumulation itself). Depth 8: weights below 2^-7
  // contribute < 1% and a FIXED lag depth is what keeps the operator a
  // codegen'd window expression instead of an order-dependent recursion
  // (a true infinite-horizon EWMA is a sequential scan — at corpus scale
  // the bounded-window form is the one that parallelizes).
  private val EwmaLags = 8
  private def ewmaWeight(i: Int): java.math.BigDecimal =
    new java.math.BigDecimal(0.5).pow(i) // exact: powers of two are finite decimals

  // PageRank constants. 25 nations is fixed by the TPC-H spec; the
  // damping split (0.15/N teleport + 0.85 inflow) is written as the SAME
  // arithmetic expression on both engines so the doubles agree bitwise.
  private val PrNodes = 25
  private val PrIters = 10

  val all: Seq[QueryDef] = Seq(

    // Ordered conversion funnel view → click → purchase: each stage is
    // min(ts) of the stage event STRICTLY AFTER the user's previous-stage
    // timestamp. Three aggregations + two joins, all keyed on user_id —
    // at 100 TB every shuffle in the chain partitions by the same key, so
    // AQE coalesces them onto one exchange layout; the final 3-row stage
    // table crosses with the 1-row stage-1 count (broadcast, PlanLint-
    // allowlisted) for the conversion ratio.
    q("q_funnel",
      """WITH v AS (SELECT user_id, min(ts::TIMESTAMP) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts::TIMESTAMP) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts::TIMESTAMP > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts::TIMESTAMP) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP > c.t2 GROUP BY e.user_id),
        |n AS (SELECT '1_view' AS stage, count(*) AS users FROM v
        |  UNION ALL SELECT '2_click', count(*) FROM c
        |  UNION ALL SELECT '3_purchase', count(*) FROM p),
        |f AS (SELECT count(*) AS first_users FROM v)
        |SELECT stage, users, round(users * 1.0 / first_users, 6) AS pct_of_first
        |FROM n, f ORDER BY stage""".stripMargin) { (s, d) =>
      val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      def nextStage(evType: String, prev: DataFrame, prevT: String, outT: String) =
        ev.filter(col("event_type") === evType)
          .join(prev, Seq("user_id"))
          .filter(col("ts") > col(prevT))
          .groupBy("user_id").agg(min("ts").as(outT))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = nextStage("click", v, "t1", "t2")
      val p = nextStage("purchase", c, "t2", "t3")
      val stages = v.agg(count(lit(1)).as("users")).withColumn("stage", lit("1_view"))
        .unionByName(c.agg(count(lit(1)).as("users")).withColumn("stage", lit("2_click")))
        .unionByName(p.agg(count(lit(1)).as("users")).withColumn("stage", lit("3_purchase")))
      stages.crossJoin(v.agg(count(lit(1)).as("first_users")))
        .select(col("stage"), col("users"),
          round(col("users") * lit(1.0) / col("first_users"), 6).as("pct_of_first"))
        .orderBy("stage")
    },

    // Weekly cohort retention: users cohorted by first-seen week (indexed
    // from a fixed anchor so both engines derive the same integer), then
    // the classic (cohort, week-offset) → active-users matrix with the
    // retention ratio against cohort size. Two shuffles on user_id
    // (first-seen agg + the activity join co-partition), one on the
    // (cohort_week, week_offset) matrix key; cohort sizes join back on
    // cohort_week — a broadcast at any scale (weeks are bounded).
    q("q_cohort_retention",
      """WITH firstd AS (SELECT user_id, min(ts::TIMESTAMP)::DATE AS d0
        |  FROM events GROUP BY user_id),
        |cw AS (SELECT user_id, d0,
        |  CAST(floor(date_diff('day', DATE '2024-01-01', d0) / 7) AS BIGINT) AS cohort_week
        |  FROM firstd),
        |sizes AS (SELECT cohort_week, count(*) AS cohort_users FROM cw GROUP BY cohort_week),
        |act AS (SELECT c.cohort_week,
        |    CAST(floor(date_diff('day', DATE '2024-01-01', e.ts::TIMESTAMP::DATE) / 7) AS BIGINT)
        |      - c.cohort_week AS week_offset,
        |    count(DISTINCT e.user_id) AS active_users
        |  FROM events e JOIN cw c ON e.user_id = c.user_id
        |  GROUP BY 1, 2)
        |SELECT a.cohort_week, a.week_offset, a.active_users, s.cohort_users,
        |  round(a.active_users * 1.0 / s.cohort_users, 6) AS retention
        |FROM act a JOIN sizes s ON a.cohort_week = s.cohort_week
        |ORDER BY a.cohort_week, a.week_offset""".stripMargin) { (s, d) =>
      val anchor = to_date(lit("2024-01-01"))
      def weekIdx(day: Column): Column =
        floor(datediff(day, anchor) / lit(7)).cast("long")
      val ev = events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
      val cw = ev.groupBy("user_id").agg(min("day").as("d0"))
        .withColumn("cohort_week", weekIdx(col("d0")))
      val sizes = cw.groupBy("cohort_week").agg(count(lit(1)).as("cohort_users"))
      val act = ev.join(cw, "user_id")
        .withColumn("week_offset", weekIdx(col("day")) - col("cohort_week"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("active_users"))
      act.join(sizes, "cohort_week")
        .select(col("cohort_week"), col("week_offset"), col("active_users"),
          col("cohort_users"),
          round(col("active_users") * lit(1.0) / col("cohort_users"), 6).as("retention"))
        .orderBy("cohort_week", "week_offset")
    },

    // Exponentially weighted moving average of per-user daily totals:
    // fixed-depth lag form (see EwmaLags above), normalized over the
    // weights actually present so the series starts unbiased. Everything
    // after the daily rollup is a user-partitioned window over codegen'd
    // lag()s — one shuffle, no recursion, and the alpha=1/2 weights make
    // the arithmetic bit-identical across engines.
    q("q_ewma_smooth", {
      val num = (0 until EwmaLags).map { i =>
        val w = ewmaWeight(i).toPlainString
        if (i == 0) s"v * $w" else s"coalesce(lag(v, $i) OVER wu * $w, 0)"
      }.mkString(" + ")
      val den = (0 until EwmaLags).map { i =>
        val w = ewmaWeight(i).toPlainString
        if (i == 0) s"$w" else s"CASE WHEN lag(v, $i) OVER wu IS NOT NULL THEN $w ELSE 0 END"
      }.mkString(" + ")
      s"""WITH daily AS (SELECT user_id, strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day,
         |  round(sum(value), 2) AS v FROM events GROUP BY 1, 2)
         |SELECT user_id, day, v, round(($num) / ($den), 6) AS ewma
         |FROM daily
         |WINDOW wu AS (PARTITION BY user_id ORDER BY day)
         |ORDER BY user_id, day""".stripMargin
    }) { (s, d) =>
      val daily = events(s, d)
        .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(round(sum("value"), 2).as("v"))
      val wu = Window.partitionBy("user_id").orderBy("day")
      val num = (0 until EwmaLags).map { i =>
        val w = lit(ewmaWeight(i)).cast("double")
        if (i == 0) col("v") * w else coalesce(lag(col("v"), i).over(wu) * w, lit(0.0))
      }.reduce(_ + _)
      val den = (0 until EwmaLags).map { i =>
        val w = lit(ewmaWeight(i)).cast("double")
        if (i == 0) w
        else when(lag(col("v"), i).over(wu).isNotNull, w).otherwise(lit(0.0))
      }.reduce(_ + _)
      daily.select(col("user_id"), col("day"), col("v"),
          round(num / den, 6).as("ewma"))
        .orderBy("user_id", "day")
    },

    // PageRank over the nation-trade graph (supplier nation → customer
    // nation, edge weight = lineitem count). The graph build is the TPC-H
    // Q7 join shape; the iteration is the textbook distributed form —
    // ranks join edges on src, partial-aggregate inflow by dst, damp —
    // repeated a fixed PrIters times. Edges are nation²-bounded (≤625
    // rows) so they localCheckpoint once and broadcast into every
    // iteration; at web scale the same loop shuffle-partitions edges by
    // src and ranks by node, which is exactly what the join+groupBy pair
    // declares. Integer edge weights keep p = cnt/out bit-identical
    // across engines; rank sums round to 6.
    q("q_pagerank", {
      val iters = (1 to PrIters).map { k =>
        s"""r$k AS (SELECT n0.node,
           |  0.15 / $PrNodes + 0.85 * coalesce(sum(r${k - 1}.pr * e.p), 0) AS pr
           |  FROM n0 LEFT JOIN e ON e.dst = n0.node
           |  LEFT JOIN r${k - 1} ON r${k - 1}.node = e.src
           |  GROUP BY n0.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS cnt
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  GROUP BY 1, 2),
         |e AS (SELECT src, dst, cnt * 1.0 / (sum(cnt) OVER (PARTITION BY src)) AS p FROM e0),
         |n0 AS (SELECT n_nationkey AS node FROM nation),
         |r0 AS (SELECT node, 1.0 / $PrNodes AS pr FROM n0),
         |$iters
         |SELECT n.n_nationkey AS nation_key, n.n_name AS nation,
         |  round(r$PrIters.pr, 6) AS pagerank
         |FROM nation n JOIN r$PrIters ON r$PrIters.node = n.n_nationkey
         |ORDER BY nation_key""".stripMargin
    }) { (s, d) =>
      val edges0 = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d).select(col("c_custkey"), col("c_nationkey").as("dst")),
          col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d).select(col("s_suppkey"), col("s_nationkey").as("src")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
      val edges = edges0
        .withColumn("p", col("cnt") * lit(1.0) / sum("cnt").over(Window.partitionBy("src")))
        .select("src", "dst", "p")
        .cut() // corpus scan runs once, not once per iteration
      val nodes = nation(s, d).select(col("n_nationkey").as("node"), col("n_name"))
      var ranks = nodes.select(col("node"), (lit(1.0) / lit(PrNodes)).as("pr"))
      for (_ <- 1 to PrIters) {
        val inflow = edges.join(ranks, edges("src") === ranks("node"))
          .groupBy(col("dst")).agg(sum(col("pr") * col("p")).as("inflow"))
        ranks = nodes.select(col("node"))
          .join(inflow, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(0.15) / lit(PrNodes) +
              lit(0.85) * coalesce(col("inflow"), lit(0.0))).as("pr"))
      }
      nodes.join(ranks, "node")
        .select(col("node").as("nation_key"), col("n_name").as("nation"),
          round(col("pr"), 6).as("pagerank"))
        .orderBy("nation_key")
    },

    // KMV set-INTERSECTION estimation between document sources: per-source
    // k-minimum-values sketches over the vocabulary (same replayable
    // md5-int family as q_kmv_union), then for every source pair the
    // union sketch's k-th minimum gives tau, the in-both count inside the
    // k-set gives Jaccard m/k, and intersection ≈ J · union-estimate —
    // all integer/exact-rational math, so the oracle replays it exactly.
    // Scale: only k·|sources| sketch rows ever leave the corpus scan
    // (localCheckpoint'd, read by both pair sides); the pair expansion is
    // sketch×pairs, never corpus×corpus. The source-pair generator is an
    // inequality self-join of the ≤|sources|-row list (PlanLint-
    // allowlisted bounded NLJ).
    q("q_kmv_intersect",
      s"""WITH tok AS (SELECT DISTINCT source,
         |    ('0x' || substr(md5(w), 1, 8))::BIGINT AS hv
         |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)),
         |r AS (SELECT source, hv,
         |    row_number() OVER (PARTITION BY source ORDER BY hv) AS rk FROM tok),
         |sk AS (SELECT source, hv FROM r WHERE rk <= $IK),
         |srcs AS (SELECT DISTINCT source FROM sk),
         |pairs AS (SELECT a.source AS s1, b.source AS s2
         |  FROM srcs a JOIN srcs b ON a.source < b.source),
         |u0 AS (SELECT s1, s2, hv, max(ina) AS ina, max(inb) AS inb FROM (
         |    SELECT p.s1, p.s2, k.hv, 1 AS ina, 0 AS inb
         |      FROM pairs p JOIN sk k ON k.source = p.s1
         |    UNION ALL
         |    SELECT p.s1, p.s2, k.hv, 0 AS ina, 1 AS inb
         |      FROM pairs p JOIN sk k ON k.source = p.s2)
         |  GROUP BY s1, s2, hv),
         |u AS (SELECT *, row_number() OVER (PARTITION BY s1, s2 ORDER BY hv) AS rk FROM u0),
         |agg AS (SELECT s1, s2, count(*) AS k_used, max(hv) AS tau,
         |    (sum(ina * inb))::BIGINT AS m
         |  FROM u WHERE rk <= $IK GROUP BY s1, s2),
         |est AS (SELECT s1, s2, k_used, m,
         |    CASE WHEN k_used < $IK THEN k_used
         |         ELSE CAST(floor($IScale / tau) AS BIGINT) END AS union_est
         |  FROM agg)
         |SELECT s1, s2, k_used, m, union_est,
         |  CAST(floor(m * union_est / k_used) AS BIGINT) AS inter_est,
         |  round(m * 1.0 / k_used, 6) AS jaccard
         |FROM est ORDER BY s1, s2""".stripMargin) { (s, d) =>
      val sk = documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .select(col("source"), graft.llm.Dedup.md5Int(col("w")).as("hv"))
        .distinct()
        .withColumn("rk", row_number().over(Window.partitionBy("source").orderBy("hv")))
        .filter(col("rk") <= IK).select("source", "hv")
        .cut() // bounded k·|sources| rows; both pair sides read it
      val srcs = sk.select("source").distinct()
      val pairs = srcs.as("a").join(srcs.as("b"), col("a.source") < col("b.source"))
        .select(col("a.source").as("s1"), col("b.source").as("s2"))
      val ua = sk.join(pairs, sk("source") === pairs("s1"))
        .select(col("s1"), col("s2"), col("hv"), lit(1).as("ina"), lit(0).as("inb"))
      val ub = sk.join(pairs, sk("source") === pairs("s2"))
        .select(col("s1"), col("s2"), col("hv"), lit(0).as("ina"), lit(1).as("inb"))
      val u = ua.unionByName(ub)
        .groupBy("s1", "s2", "hv")
        .agg(max("ina").as("ina"), max("inb").as("inb"))
        .withColumn("rk", row_number().over(Window.partitionBy("s1", "s2").orderBy("hv")))
        .filter(col("rk") <= IK)
      u.groupBy("s1", "s2").agg(
          count(lit(1)).as("k_used"),
          max("hv").as("tau"),
          sum(col("ina") * col("inb")).as("m"))
        .withColumn("union_est",
          when(col("k_used") < IK, col("k_used"))
            .otherwise(floor(lit(IScale) / col("tau")).cast("long")))
        .select(col("s1"), col("s2"), col("k_used"), col("m"), col("union_est"),
          floor(col("m") * col("union_est") / col("k_used")).cast("long").as("inter_est"),
          round(col("m") * lit(1.0) / col("k_used"), 6).as("jaccard"))
        .orderBy("s1", "s2")
    },

    // Stats-based data skipping through the versioned lake: lineitem is
    // committed range-clustered on l_orderkey (the layout a real table
    // gets from partitioning/z-ordering), then a selective range read
    // goes through readWhere, which consults the per-file min/max
    // sidecars and hands Spark ONLY the files whose ranges admit the
    // predicate — on a 100 TB table that is the difference between a
    // metadata lookup + a few files and a full scan. The oracle replays
    // the same filter+aggregate relationally on the base table, proving
    // pruning never changes results (DataSkippingSpec separately asserts
    // that files really are dropped).
    q("q_lake_skipping",
      """SELECT l_returnflag, count(*) AS n_rows,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val dir = graft.lake.Scratch.dir("graft-vt-skip") + "/t"
      val t = graft.lake.VersionedTable(s, dir)
      t.commitOverwrite(lineitem(s, d).repartitionByRange(8, col("l_orderkey")))
      t.readWhere(col("l_orderkey").between(1000L, 2000L))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("l_returnflag")
    }
  )
}
