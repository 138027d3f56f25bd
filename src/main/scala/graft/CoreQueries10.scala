package graft

import graft.CheckpointStrategy.Ops._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tenth core tranche: event-analytics shapes that stress-test the
  * engine's distributed-prefix-sum and co-occurrence machinery —
  * sweep-line max concurrency, market-basket association (lift), and
  * CUSUM-style changepoint scoring.
  *
  * Scale property shared by the tranche: no unpartitioned window ever
  * sees raw-row cardinality. The sweep line runs the bucketed two-pass
  * prefix sum (q_pack_sequences' pattern); basket pairs expand per
  * order-sized adjacency (never all-pairs over the catalog); CUSUM is
  * per-user windows keyed by a high-cardinality column.
  */
object CoreQueries10 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Max concurrent active events per type (each event active for 10
    // minutes): the classic sweep line — +1/-1 boundaries, running sum,
    // max — made distributed. Concurrency is evaluated per distinct
    // boundary instant (net delta per (type, t)), so tied starts/ends
    // collapse into one deterministic row; the running sum then runs as
    // the bucketed two-pass prefix sum: hour-bucket partials in a fully
    // parallel aggregation, ordered cumsum over the BUCKET list per
    // type, carry + fine cumsum inside each bucket independently. The
    // boundary-instant frame is checkpointed because both the max and
    // the argmax join-back read it.
    q("q_max_concurrency",
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts::TIMESTAMP) AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT event_type, epoch_us(ts::TIMESTAMP) + 600000000 AS t, -1 FROM events),
        |net AS (SELECT event_type, t, CAST(floor(t / 3600000000) AS BIGINT) AS bkt,
        |    sum(delta)::BIGINT AS net FROM b GROUP BY 1,2,3),
        |part AS (SELECT event_type, bkt, sum(net)::BIGINT AS bnet FROM net GROUP BY 1,2),
        |cumb AS (SELECT event_type, bkt,
        |    (sum(bnet) OVER (PARTITION BY event_type ORDER BY bkt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bnet)::BIGINT AS carry
        |  FROM part),
        |conc AS (SELECT n.event_type AS event_type, n.t AS t,
        |    (c.carry + sum(n.net) OVER (PARTITION BY n.event_type, n.bkt ORDER BY n.t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS active
        |  FROM net n JOIN cumb c ON c.event_type = n.event_type AND c.bkt = n.bkt),
        |mx AS (SELECT event_type, max(active) AS max_concurrent FROM conc GROUP BY 1)
        |SELECT m.event_type AS event_type, m.max_concurrent AS max_concurrent,
        |  strftime(make_timestamp(min(c.t)), '%Y-%m-%d %H:%M:%S') AS first_peak
        |FROM mx m JOIN conc c ON c.event_type = m.event_type
        |  AND c.active = m.max_concurrent
        |GROUP BY 1,2 ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = events(s, d).select(col("event_type"), unix_micros(col("ts")).as("t0"))
      val b = ev.select(col("event_type"), col("t0").as("t"), lit(1L).as("delta"))
        .union(ev.select(col("event_type"), (col("t0") + 600000000L).as("t"),
          lit(-1L).as("delta")))
      val net = b.groupBy("event_type", "t").agg(sum("delta").as("net"))
        .withColumn("bkt", floor(col("t") / 3600000000L).cast("long"))
      val part = net.groupBy("event_type", "bkt").agg(sum("net").as("bnet"))
      val wB = Window.partitionBy("event_type").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cumb = part
        .withColumn("carry", sum("bnet").over(wB) - col("bnet"))
        .select(col("event_type").as("cet"), col("bkt").as("cbkt"), col("carry"))
      val wF = Window.partitionBy("event_type", "bkt").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // r19 fusion: max + argmax-with-min-t collapse into ONE aggregate
      // over an orderable struct — max(struct(active, -t)) is (max
      // active, then min t among its ties). Replaces the former cut()
      // materialization + max pass + join-back (3 jobs, one 20 MB
      // checkpoint) with a single pass; all-integer math, so results
      // are bit-identical. cumb (one row per populated (type, hour)
      // bucket) broadcasts instead of shuffling net a second time.
      net
        .join(broadcast(cumb),
          col("event_type") === col("cet") && col("bkt") === col("cbkt"))
        .withColumn("active", col("carry") + sum("net").over(wF))
        .groupBy("event_type")
        .agg(max(struct(col("active"), (-col("t")).as("negt"))).as("pk"))
        .select(col("event_type"), col("pk.active").as("max_concurrent"),
          date_format(timestamp_micros(-col("pk.negt")), "yyyy-MM-dd HH:mm:ss")
            .as("first_peak"))
        .orderBy("event_type")
    },

    // Market-basket association at brand granularity: support /
    // confidence / lift for co-purchased brand pairs. The pair generator
    // is the within-order self-join (adjacency-driven, O(Σ basket²) —
    // never catalog²); per-brand counts and the order total broadcast
    // (the total is a 1-row product — PlanLint-allowlisted). All counts
    // integer; the three ratios are single rounded divisions.
    q("q_basket_lift",
      """WITH ob AS (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |n AS (SELECT count(DISTINCT okey) AS n_orders FROM ob),
        |bc AS (SELECT brand, count(*) AS n_brand FROM ob GROUP BY 1),
        |pairs AS (SELECT a.brand AS b1, b.brand AS b2, count(*) AS n_both
        |  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand GROUP BY 1,2)
        |SELECT b1, b2, n_both,
        |  round(n_both * 1.0 / n.n_orders, 6) AS support,
        |  round(n_both * 1.0 / c1.n_brand, 6) AS confidence,
        |  round(n_both * 1.0 * n.n_orders / (c1.n_brand * c2.n_brand), 6) AS lift
        |FROM pairs JOIN bc c1 ON c1.brand = pairs.b1
        |JOIN bc c2 ON c2.brand = pairs.b2
        |CROSS JOIN n WHERE n_both >= 3 ORDER BY b1, b2""".stripMargin) { (s, d) =>
      // r19 (guide §2.4): one groupBy(okey) with collect_set replaces
      // the former distinct + okey-keyed SELF-JOIN — the basket set is
      // per-order tiny (TPC-H ≤7 lines), so pairs expand in-row from
      // the sorted brand array exactly like the minhash bucketPairs
      // idiom. Plan: 4 exchanges + join → 2 exchanges, and the order
      // key never carries brand pairs through a shuffle. sort_array
      // uses UTF8 binary order = the old `b1 < b2` join predicate, so
      // the emitted pair multiset is identical.
      val baskets = lineitem(s, d)
        .select(col("l_orderkey").as("okey"), col("l_partkey"))
        .join(part(s, d).select(col("p_partkey"), col("p_brand").as("brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("okey").agg(sort_array(collect_set(col("brand"))).as("bs"))
        .cut() // feeds total, per-brand counts, and the pair expansion
      val n = baskets.agg(count(lit(1)).as("n_orders"))
      val bc = baskets.select(explode(col("bs")).as("brand"))
        .groupBy("brand").agg(count(lit(1)).as("n_brand"))
      // r20: native codegen'd combination expansion (the HOF transform/
      // slice formulation evaluated interpreted — 1.97 s of task time
      // in ProfileQuery; OrderedPairsExpr emits the identical pair list
      // from one tight loop inside codegen)
      baskets
        .select(explode(org.apache.spark.sql.GraftColumnBridge.column(
          org.apache.spark.sql.graft.OrderedPairsExpr(
            org.apache.spark.sql.GraftColumnBridge.expression(col("bs"))))).as("p"))
        .select(col("p.b1").as("b1"), col("p.b2").as("b2"))
        .groupBy("b1", "b2").agg(count(lit(1)).as("n_both"))
        .filter(col("n_both") >= 3)
        .join(bc.select(col("brand").as("br1"), col("n_brand").as("n1")),
          col("b1") === col("br1"))
        .join(bc.select(col("brand").as("br2"), col("n_brand").as("n2")),
          col("b2") === col("br2"))
        .crossJoin(broadcast(n))
        .select(col("b1"), col("b2"), col("n_both"),
          round(col("n_both") * lit(1.0) / col("n_orders"), 6).as("support"),
          round(col("n_both") * lit(1.0) / col("n1"), 6).as("confidence"),
          round(col("n_both") * lit(1.0) * col("n_orders") / (col("n1") * col("n2")), 6)
            .as("lift"))
        .orderBy("b1", "b2")
    },

    // CUSUM-style changepoint scoring: per user, the max |cumulative
    // deviation from the user mean| over the time-ordered value stream —
    // the mean-shift statistic. The window partitions by user_id (high
    // cardinality — even shuffle distribution at corpus scale); the
    // cumsum is order-identical on both engines so only the parallel
    // mean's accumulation order needs the round-6 contract. Global
    // top-20 is sort+limit (TakeOrderedAndProject), not a window.
    q("q_cusum",
      """WITH x AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS t, event_id, value
        |  FROM events),
        |m AS (SELECT user_id AS mid, avg(value) AS mu, count(*) AS n
        |  FROM x GROUP BY 1 HAVING count(*) >= 20),
        |c AS (SELECT x.user_id AS user_id, m.n AS n,
        |    sum(x.value - m.mu) OVER (PARTITION BY x.user_id ORDER BY x.t, x.event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dev
        |  FROM x JOIN m ON m.mid = x.user_id),
        |sc AS (SELECT user_id, round(max(abs(dev)), 6) AS cusum_score,
        |    max(n) AS n_events FROM c GROUP BY 1)
        |SELECT user_id, cusum_score, n_events FROM sc
        |ORDER BY cusum_score DESC, user_id LIMIT 20""".stripMargin) { (s, d) =>
      val x = events(s, d).select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("value"))
      val m = x.groupBy(col("user_id").as("mid"))
        .agg(avg("value").as("mu"), count(lit(1)).as("n"))
        .filter(col("n") >= 20)
      val wC = Window.partitionBy("user_id").orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      x.join(m, col("user_id") === col("mid"))
        .withColumn("dev", sum(col("value") - col("mu")).over(wC))
        .groupBy("user_id")
        .agg(round(max(abs(col("dev"))), 6).as("cusum_score"),
          max("n").as("n_events"))
        .orderBy(col("cusum_score").desc, col("user_id"))
        .limit(20)
    },

    // Year-over-year growth: monthly revenue with a 12-row lag over the
    // month-aggregated frame. The window is unpartitioned BY DESIGN and
    // allowlisted: it runs over the calendar-bounded aggregate (~dozens
    // of rows however large `orders` is), never raw rows — the raw-row
    // work is one keyed aggregation.
    q("q_yoy_growth",
      """WITH m AS (SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |    round(sum(o_totalprice),2) AS revenue FROM orders GROUP BY 1)
        |SELECT month, revenue,
        |  round(revenue - lag(revenue, 12) OVER (ORDER BY month), 2) AS yoy_delta,
        |  round((revenue / lag(revenue, 12) OVER (ORDER BY month) - 1) * 100, 4) AS yoy_pct
        |FROM m ORDER BY month""".stripMargin) { (s, d) =>
      val m = orders(s, d)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(round(sum("o_totalprice"), 2).as("revenue"))
      val w = Window.orderBy("month")
      m.select(col("month"), col("revenue"),
          round(col("revenue") - lag("revenue", 12).over(w), 2).as("yoy_delta"),
          round((col("revenue") / lag("revenue", 12).over(w) - 1) * 100, 4).as("yoy_pct"))
        .orderBy("month")
    },

    // Table profiling — per-column row/null/distinct counts and
    // formatted min/max — computed in ONE aggregation pass (4 metrics ×
    // 5 columns in a single agg row, exploded to long format), not one
    // scan per column: the difference between 1 and |columns| corpus
    // passes when profiling a wide table. Numeric min/max are printf-
    // formatted identically on both engines so the long format stays a
    // single string column.
    q("q_profile_table",
      """SELECT 'c_acctbal' AS col_name, count(*) AS n_rows,
        |  (count(*) - count(c_acctbal))::BIGINT AS n_null,
        |  count(DISTINCT c_acctbal) AS n_distinct,
        |  printf('%.2f', min(c_acctbal)) AS min_val,
        |  printf('%.2f', max(c_acctbal)) AS max_val FROM customer
        |UNION ALL
        |SELECT 'c_custkey', count(*), (count(*) - count(c_custkey))::BIGINT,
        |  count(DISTINCT c_custkey), printf('%d', min(c_custkey)),
        |  printf('%d', max(c_custkey)) FROM customer
        |UNION ALL
        |SELECT 'c_mktsegment', count(*), (count(*) - count(c_mktsegment))::BIGINT,
        |  count(DISTINCT c_mktsegment), min(c_mktsegment), max(c_mktsegment)
        |FROM customer
        |UNION ALL
        |SELECT 'c_name', count(*), (count(*) - count(c_name))::BIGINT,
        |  count(DISTINCT c_name), min(c_name), max(c_name) FROM customer
        |UNION ALL
        |SELECT 'c_nationkey', count(*), (count(*) - count(c_nationkey))::BIGINT,
        |  count(DISTINCT c_nationkey), printf('%d', min(c_nationkey)),
        |  printf('%d', max(c_nationkey)) FROM customer
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      val c = customer(s, d)
      val one = c.agg(
        count(lit(1)).as("n"),
        count(col("c_acctbal")).as("nn_bal"), count_distinct(col("c_acctbal")).as("nd_bal"),
        min("c_acctbal").as("mn_bal"), max("c_acctbal").as("mx_bal"),
        count(col("c_custkey")).as("nn_key"), count_distinct(col("c_custkey")).as("nd_key"),
        min("c_custkey").as("mn_key"), max("c_custkey").as("mx_key"),
        count(col("c_mktsegment")).as("nn_seg"),
        count_distinct(col("c_mktsegment")).as("nd_seg"),
        min("c_mktsegment").as("mn_seg"), max("c_mktsegment").as("mx_seg"),
        count(col("c_name")).as("nn_nam"), count_distinct(col("c_name")).as("nd_nam"),
        min("c_name").as("mn_nam"), max("c_name").as("mx_nam"),
        count(col("c_nationkey")).as("nn_nat"),
        count_distinct(col("c_nationkey")).as("nd_nat"),
        min("c_nationkey").as("mn_nat"), max("c_nationkey").as("mx_nat"))
      def row(name: String, nn: String, nd: String, mn: Column, mx: Column) =
        struct(lit(name).as("col_name"), col("n").as("n_rows"),
          (col("n") - col(nn)).as("n_null"), col(nd).as("n_distinct"),
          mn.as("min_val"), mx.as("max_val"))
      one.select(explode(array(
          row("c_acctbal", "nn_bal", "nd_bal",
            format_string("%.2f", col("mn_bal")), format_string("%.2f", col("mx_bal"))),
          row("c_custkey", "nn_key", "nd_key",
            format_string("%d", col("mn_key")), format_string("%d", col("mx_key"))),
          row("c_mktsegment", "nn_seg", "nd_seg", col("mn_seg"), col("mx_seg")),
          row("c_name", "nn_nam", "nd_nam", col("mn_nam"), col("mx_nam")),
          row("c_nationkey", "nn_nat", "nd_nat",
            format_string("%d", col("mn_nat")), format_string("%d", col("mx_nat")))
        )).as("p"))
        .select(col("p.*"))
        .orderBy("col_name")
    },

    // Cumulative distinct users per event type by day — the "running
    // uniques" dashboard query, computed WITHOUT a running distinct
    // state: each (type, user) contributes its FIRST day (a keyed
    // aggregation over high-cardinality keys), daily new-user counts
    // aggregate that, and the cumulative sum runs over the calendar-
    // bounded daily frame per type. Raw rows are touched exactly once;
    // the window sees |types|×|days| rows at any corpus size.
    q("q_cumulative_uniques",
      """WITH fs AS (SELECT event_type, user_id,
        |    strftime(min(ts::TIMESTAMP), '%Y-%m-%d') AS first_day
        |  FROM events GROUP BY 1,2),
        |daily AS (SELECT event_type, first_day AS day, count(*) AS new_users
        |  FROM fs GROUP BY 1,2)
        |SELECT event_type, day, new_users,
        |  sum(new_users) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_users
        |FROM daily ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val fs = events(s, d)
        .groupBy("event_type", "user_id")
        .agg(date_format(min(col("ts")), "yyyy-MM-dd").as("first_day"))
      val daily = fs.groupBy(col("event_type"), col("first_day").as("day"))
        .agg(count(lit(1)).as("new_users"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(col("event_type"), col("day"), col("new_users"),
          sum("new_users").over(w).as("cum_users"))
        .orderBy("event_type", "day")
    },

    // Merge overlapping activity intervals per user into maximal
    // spans — the islands pattern generalized to EXPLICIT interval ends:
    // a new span starts when this interval's start clears the running
    // max of all prior ends (an O(1)-state window expression, NOT a
    // buffered partition), the span id is the running sum of those
    // breaks, and span bounds aggregate per id. All epoch-microsecond
    // integer math; windows partition on user_id (high cardinality).
    q("q_interval_merge",
      """WITH iv AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS s,
        |    epoch_us(ts::TIMESTAMP)+600000000 AS e FROM events),
        |o AS (SELECT user_id, s, e,
        |  CASE WHEN s > coalesce(max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS brk
        |  FROM iv),
        |g AS (SELECT user_id, s, e, sum(brk) OVER (PARTITION BY user_id ORDER BY s, e
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM o),
        |m AS (SELECT user_id, grp, min(s) AS s0, max(e) AS e1 FROM g GROUP BY 1,2)
        |SELECT user_id, count(*)::BIGINT AS n_intervals, sum(e1-s0)::BIGINT AS covered_us
        |FROM m GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      val iv = events(s, d).select(col("user_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + 600000000L).as("e"))
      val wPrev = Window.partitionBy("user_id").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy("user_id").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      iv.withColumn("brk",
          when(col("s") > coalesce(max("e").over(wPrev), lit(-1L)), 1L).otherwise(0L))
        .withColumn("grp", sum("brk").over(wRun))
        .groupBy("user_id", "grp")
        .agg(min("s").as("s0"), max("e").as("e1"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"), sum(col("e1") - col("s0")).as("covered_us"))
        .orderBy("user_id")
    },

    // Geometric and harmonic means per group — the log-domain and
    // reciprocal-domain aggregations ratio metrics need (multiplicative
    // growth, rates). Both are one-pass codegen'd aggregates; libm
    // ulp-level divergence between engines is absorbed by the rounding
    // contract (geo 4 dp on a ~10^4 value, harmonic 6 dp).
    q("q_mean_variants",
      """SELECT l_returnflag AS flag,
        |  round(exp(avg(ln(l_extendedprice))), 4) AS geo_mean_price,
        |  round(count(*) / sum(1.0 / l_quantity), 6) AS harm_mean_qty,
        |  count(*) AS n
        |FROM lineitem WHERE l_extendedprice > 0 AND l_quantity > 0
        |GROUP BY 1 ORDER BY flag""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_extendedprice") > 0 && col("l_quantity") > 0)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(round(exp(avg(log(col("l_extendedprice")))), 4).as("geo_mean_price"),
          round(count(lit(1)) / sum(lit(1.0) / col("l_quantity")), 6).as("harm_mean_qty"),
          count(lit(1)).as("n"))
        .orderBy("flag")
    }
  )
}
