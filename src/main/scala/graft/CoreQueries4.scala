package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth query tranche: array-predicate higher-order functions, explicit
  * null ordering, exact decimal aggregation, unix-time round trips, date
  * arithmetic, and the remaining string surface. Oracle conventions per
  * QueryDef.scala.
  */
object CoreQueries4 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Array predicate HOFs: filter-count / exists / forall per vector.
    // (Breadth surface — the scoring hot paths use the native codegen'd
    // expressions instead; HOF lambdas evaluate interpreted.)
    q("q_array_predicates",
      """SELECT vec_id,
        |  len(list_filter(embedding, x -> x > 0))::BIGINT AS n_pos,
        |  list_bool_or(list_transform(embedding, x -> x > 2.0)) AS any_gt2,
        |  list_bool_and(list_transform(embedding, x -> x > -4.0)) AS all_gt_neg4
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      embeddings(s, d).select(col("vec_id"),
          size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"),
          exists(col("embedding"), x => x > 2.0f).as("any_gt2"),
          forall(col("embedding"), x => x > -4.0f).as("all_gt_neg4"))
        .orderBy("vec_id")
    },

    // Explicit null ordering made value-observable: rank under
    // ASC NULLS LAST (engines' DEFAULT null order differs — Spark sorts
    // nulls first ascending, DuckDB last — so portable SQL must say it).
    q("q_null_ordering",
      """SELECT c_custkey, nullif(c_nationkey % 7, 0) AS k,
        |  row_number() OVER (ORDER BY nullif(c_nationkey % 7, 0) ASC NULLS LAST,
        |    c_custkey) AS rn
        |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val k = expr("nullif(c_nationkey % 7, 0)")
      customer(s, d).filter(col("c_custkey") < 200)
        .select(col("c_custkey"), k.as("k"),
          row_number().over(Window.orderBy(k.asc_nulls_last, col("c_custkey")))
            .as("rn"))
        .orderBy("c_custkey")
    },

    // Exact decimal aggregation: money sums with NO float rounding —
    // the correct type for a ledger at any scale (sum order never
    // matters; both engines agree digit-for-digit). Emitted as strings:
    // the compare harness coerces decimal columns inconsistently
    // (int-truncation vs float), and the string IS the exactness claim.
    q("q_decimal_agg",
      """SELECT l_returnflag,
        |  sum(l_extendedprice::DECIMAL(18,2))::VARCHAR AS sum_price,
        |  sum((l_extendedprice::DECIMAL(18,2)) * (l_discount::DECIMAL(18,2)))::VARCHAR
        |    AS sum_discounted,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      lineitem(s, d).groupBy("l_returnflag")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("string").as("sum_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)"))
            .cast("string").as("sum_discounted"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // Unix-time round trip: epoch seconds (truncated) and back to a
    // formatted wall-clock string (UTC sessions both sides).
    q("q_unixtime_roundtrip",
      """SELECT event_id,
        |  floor(epoch(ts))::BIGINT AS epoch_s,
        |  strftime(to_timestamp(floor(epoch(ts))::BIGINT), '%Y-%m-%d %H:%M:%S')
        |    AS wallclock
        |FROM events WHERE user_id < 20 ORDER BY event_id""".stripMargin) { (s, d) =>
      events(s, d).filter(col("user_id") < 20)
        .select(col("event_id"),
          unix_timestamp(col("ts")).as("epoch_s"),
          from_unixtime(unix_timestamp(col("ts"))).as("wallclock"))
        .orderBy("event_id")
    },

    // Date arithmetic: day deltas, interval shifts, calendar parts.
    q("q_date_arith",
      """SELECT o_orderkey,
        |  date_diff('day', TIMESTAMP '2024-01-01', o_orderdate)::BIGINT AS days_since,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
        |  extract(year FROM o_orderdate)::BIGINT AS y,
        |  extract(month FROM o_orderdate)::BIGINT AS m,
        |  extract(day FROM o_orderdate)::BIGINT AS dom
        |FROM orders WHERE o_orderkey < 3000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      orders(s, d).filter(col("o_orderkey") < 3000)
        .select(col("o_orderkey"),
          datediff(col("o_orderdate"), lit("2024-01-01").cast("timestamp"))
            .cast("long").as("days_since"),
          date_format(col("o_orderdate") + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd")
            .as("due_date"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"))
        .orderBy("o_orderkey")
    },

    // String surface, second helping: translate / pads / repeat / instr
    // / trim family.
    q("q_string_funcs2",
      """SELECT p_partkey,
        |  translate(p_name, 'aeiou', 'AEIOU') AS shouty_vowels,
        |  lpad(p_partkey::VARCHAR, 8, '0') AS padded_key,
        |  rpad(p_brand, 12, '.') AS brand_dotted,
        |  repeat(p_type || '|', 2) AS type_twice,
        |  instr(p_name, ' ')::BIGINT AS space_at,
        |  trim('  ' || p_name || '  ') AS trimmed
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      part(s, d).select(col("p_partkey"),
          translate(col("p_name"), "aeiou", "AEIOU").as("shouty_vowels"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("padded_key"),
          rpad(col("p_brand"), 12, ".").as("brand_dotted"),
          repeat(concat(col("p_type"), lit("|")), 2).as("type_twice"),
          instr(col("p_name"), " ").cast("long").as("space_at"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"))
        .orderBy("p_partkey")
    },

    // Grouped standardization / anomaly flag: per-group mean/stddev,
    // z-score per row, |z| > 2.5 flagged. The oracle states the stats
    // as a window; the Spark plan must NOT — PARTITION BY event_type
    // (fixed ~5-value domain) would funnel the whole corpus-growing
    // events table into 5 single-task sorts (the PlanLintSpec
    // low-cardinality-window shape). Instead the stats collapse to a
    // |event types|-row aggregate (map-side partial combine) that
    // broadcasts back onto the scan — two cheap pruned scans beat one
    // 5-task shuffle at any real scale.
    q("q_zscore_anomaly",
      """WITH s AS (SELECT event_id, event_type, value,
        |    avg(value) OVER (PARTITION BY event_type) AS mu,
        |    stddev_samp(value) OVER (PARTITION BY event_type) AS sigma
        |  FROM events)
        |SELECT event_id, event_type,
        |  round((value - mu) / sigma, 6) AS z,
        |  abs((value - mu) / sigma) > 2.5 AS is_anomaly
        |FROM s ORDER BY event_id""".stripMargin) { (s, d) =>
      val stats = events(s, d).groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"))
        .withColumnRenamed("event_type", "s_event_type")
      // null-safe key: the oracle's PARTITION BY keeps a null-keyed
      // partition (with its own stats), so a plain inner join would
      // silently drop null event_types if a fixture ever grew them
      events(s, d).select("event_id", "event_type", "value")
        .join(broadcast(stats), col("event_type") <=> col("s_event_type"))
        .select(col("event_id"), col("event_type"),
          round((col("value") - col("mu")) / col("sigma"), 6).as("z"),
          (abs((col("value") - col("mu")) / col("sigma")) > 2.5).as("is_anomaly"))
        .orderBy("event_id")
    },

    // Explicit cartesian product (bounded): dim × dim enumeration — the
    // one join shape that SHOULD be a nested loop.
    q("q_cross_join",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      region(s, d).crossJoin(nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy("r_name", "n_name")
    },

    // LIKE / ILIKE / NOT LIKE / escaped-wildcard patterns.
    q("q_like_patterns",
      """SELECT p_partkey,
        |  p_name LIKE '%re%' AS has_re,
        |  p_type ILIKE 'econ%' AS is_economy_ci,
        |  p_name NOT LIKE 'small%' AS not_small,
        |  p_brand LIKE 'B#_%' ESCAPE '#' AS underscore_after_b
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      part(s, d).select(col("p_partkey"),
          col("p_name").like("%re%").as("has_re"),
          col("p_type").ilike("econ%").as("is_economy_ci"),
          (!col("p_name").like("small%")).as("not_small"),
          expr("p_brand LIKE 'B#_%' ESCAPE '#'").as("underscore_after_b"))
        .orderBy("p_partkey")
    },

    // Scalar conditionals: greatest/least across columns, coalesce
    // chains, inline if.
    q("q_scalar_conditionals",
      """SELECT s_suppkey,
        |  greatest(s_acctbal, 0.0) AS bal_floor,
        |  least(s_acctbal, 5000.0) AS bal_cap,
        |  coalesce(nullif(s_name, ''), 'unknown') AS name_or_default,
        |  CASE WHEN s_acctbal >= 0 THEN 'credit' ELSE 'debit' END AS side
        |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      supplier(s, d).select(col("s_suppkey"),
          greatest(col("s_acctbal"), lit(0.0)).as("bal_floor"),
          least(col("s_acctbal"), lit(5000.0)).as("bal_cap"),
          coalesce(expr("nullif(s_name, '')"), lit("unknown")).as("name_or_default"),
          when(col("s_acctbal") >= 0, "credit").otherwise("debit").as("side"))
        .orderBy("s_suppkey")
    },

    // TPC-H Q10 shape: returned-item revenue per customer — selective
    // fact filter, 3-way join, revenue aggregate, top 20.
    q("q10_returned_revenue",
      """SELECT c_custkey, c_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  n_name
        |FROM customer
        | JOIN orders ON o_custkey = c_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        | JOIN nation ON n_nationkey = c_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      customer(s, d)
        .join(orders(s, d), col("o_custkey") === col("c_custkey"))
        .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(nation(s, d), col("n_nationkey") === col("c_nationkey"))
        .filter(col("l_returnflag") === "R")
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    },

    // Boolean aggregates: universally/existentially quantified group
    // predicates in one pass.
    q("q_bool_agg",
      """SELECT o_orderpriority,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_orderstatus = 'P') AS any_pending,
        |  bool_and(o_custkey IS NOT NULL) AS all_keyed,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      orders(s, d).groupBy("o_orderpriority")
        .agg(bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bool_or(col("o_orderstatus") === "P").as("any_pending"),
          bool_and(col("o_custkey").isNotNull).as("all_keyed"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // Higher-moment aggregates: population skewness and excess kurtosis.
    // The oracle replays Spark's population formulas from raw moments
    // (DuckDB's own skewness/kurtosis are sample-corrected — different
    // statistics, not a bug on either side).
    q("q_higher_moments",
      """SELECT l_returnflag,
        |  round((avg(l_quantity*l_quantity*l_quantity)
        |     - 3*avg(l_quantity)*avg(l_quantity*l_quantity) + 2*avg(l_quantity)^3)
        |    / (avg(l_quantity*l_quantity) - avg(l_quantity)^2)^1.5, 6) AS skew_q,
        |  round((avg(l_quantity*l_quantity*l_quantity*l_quantity)
        |     - 4*avg(l_quantity)*avg(l_quantity*l_quantity*l_quantity)
        |     + 6*avg(l_quantity)^2*avg(l_quantity*l_quantity)
        |     - 3*avg(l_quantity)^4)
        |    / (avg(l_quantity*l_quantity) - avg(l_quantity)^2)^2 - 3, 6) AS kurt_q,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      lineitem(s, d).groupBy("l_returnflag")
        .agg(round(skewness("l_quantity"), 6).as("skew_q"),
          round(kurtosis("l_quantity"), 6).as("kurt_q"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // Backreference rewriting + delimiter field extraction. (Backref
    // SYNTAX differs — Spark/Java `$1` vs DuckDB/RE2 `\1` — same
    // semantics; each side uses its own dialect.)
    q("q_string_funcs3",
      """SELECT c_custkey,
        |  regexp_replace(c_name, '([A-Za-z]+)#0*([0-9]+)', '\2-\1') AS flipped,
        |  split_part(c_name, '#', 1) AS name_part,
        |  split_part(c_name, '#', -1) AS num_part
        |FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""".stripMargin) { (s, d) =>
      customer(s, d).filter(col("c_custkey") < 500)
        .select(col("c_custkey"),
          regexp_replace(col("c_name"), "([A-Za-z]+)#0*([0-9]+)", "$2-$1")
            .as("flipped"),
          split_part(col("c_name"), lit("#"), lit(1)).as("name_part"),
          split_part(col("c_name"), lit("#"), lit(-1)).as("num_part"))
        .orderBy("c_custkey")
    },

    // Regex capture groups: split a structured id into its parts.
    q("q_regex_groups",
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([A-Za-z]+)#([0-9]+)', 1) AS name_prefix,
        |  regexp_extract(c_name, '([A-Za-z]+)#([0-9]+)', 2) AS name_digits,
        |  CAST(regexp_extract(c_name, '#0*([0-9]+)$', 1) AS BIGINT) AS name_num
        |FROM customer WHERE c_custkey < 1000 ORDER BY c_custkey""".stripMargin) { (s, d) =>
      customer(s, d).filter(col("c_custkey") < 1000)
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "([A-Za-z]+)#([0-9]+)", 1).as("name_prefix"),
          regexp_extract(col("c_name"), "([A-Za-z]+)#([0-9]+)", 2).as("name_digits"),
          regexp_extract(col("c_name"), "#0*([0-9]+)$", 1).cast("long").as("name_num"))
        .orderBy("c_custkey")
    },

    // TPC-H Q18 shape (large-volume orders): HAVING-filtered fact
    // aggregate feeding an IN-subquery semi join back onto the same
    // fact, then the customer/orders/lineitem join and re-aggregation.
    // Scale shape: the big-orders list is aggregated BEFORE any join
    // (map-side partial agg, one shuffle on l_orderkey), the semi join
    // carries only o_orderkey, AQE brokers the (usually tiny) build
    // side, and the final top-k is TakeOrdered — no global sort.
    q("q18_large_orders",
      """WITH big AS (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  o.o_totalprice, round(sum(l.l_quantity), 2) AS sum_qty
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
        |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  o.o_totalprice
        |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      val big = lineitem(s, d)
        .groupBy("l_orderkey").agg(sum("l_quantity").as("sum_qty_all"))
        .filter(col("sum_qty_all") > 300)
        .select("l_orderkey")
      orders(s, d).as("o")
        .join(big, col("o.o_orderkey") === big("l_orderkey"), "left_semi")
        .join(customer(s, d).as("c"), col("o.o_custkey") === col("c.c_custkey"))
        .join(lineitem(s, d).as("l"), col("l.l_orderkey") === col("o.o_orderkey"))
        .groupBy(col("c.c_name").as("c_name"), col("c.c_custkey").as("c_custkey"),
          col("o.o_orderkey").as("o_orderkey"), col("o.o_orderdate").as("o_orderdate"),
          col("o.o_totalprice").as("o_totalprice"))
        .agg(round(sum("l.l_quantity"), 2).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }
  )
}
