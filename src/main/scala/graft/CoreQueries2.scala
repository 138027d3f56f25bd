package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TemporalJoins

/** Harness breadth, batch 2: statistical aggregates, string/math scalar
  * coverage, subqueries via the SQL front door, outer/self joins,
  * lead/ntile/range-frame windows, and the temporal joins (AS-OF, banded
  * range) from [[graft.ops.TemporalJoins]].
  */
object CoreQueries2 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Statistical aggregates (sample stddev/variance — both engines use
    // numerically stable merge formulas; round(6) absorbs ulp drift).
    q("q_stats_agg",
      """SELECT l_returnflag,
        | round(avg(l_extendedprice),6) AS avg_price,
        | round(stddev_samp(l_extendedprice),6) AS sd_price,
        | round(var_samp(l_quantity),6) AS var_qty,
        | round(min(l_extendedprice),2) AS min_price,
        | round(max(l_extendedprice),2) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      lineitem(s, d).groupBy("l_returnflag")
        .agg(round(avg("l_extendedprice"), 6).as("avg_price"),
          round(stddev_samp("l_extendedprice"), 6).as("sd_price"),
          round(var_samp("l_quantity"), 6).as("var_qty"),
          round(min("l_extendedprice"), 2).as("min_price"),
          round(max("l_extendedprice"), 2).as("max_price"))
        .orderBy("l_returnflag")
    },

    // String scalar coverage (F13/F14 family + harness breadth).
    q("q_string_funcs",
      """SELECT p_partkey,
        | upper(p_name) AS name_upper,
        | lpad(p_brand, 10, '*') AS brand_pad,
        | substr(p_name, 1, 5) AS name_prefix,
        | reverse(p_type) AS type_rev,
        | strpos(p_name, 'e') AS e_pos,
        | concat_ws('-', p_brand, p_type) AS brand_type,
        | length(p_name) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      part(s, d).select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lpad(col("p_brand"), 10, "*").as("brand_pad"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        reverse(col("p_type")).as("type_rev"),
        instr(col("p_name"), "e").cast("long").as("e_pos"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"))
        .orderBy("p_partkey")
    },

    // Math scalar coverage.
    q("q_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        | round(ln(l_extendedprice),6) AS ln_price,
        | round(sqrt(l_quantity),6) AS sqrt_qty,
        | ceil(l_discount*100)::BIGINT AS disc_pct_ceil,
        | floor(l_tax*100)::BIGINT AS tax_pct_floor,
        | l_orderkey % 7 AS key_mod,
        | abs(l_quantity - 25) AS qty_dev
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      lineitem(s, d).filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
          ceil(col("l_discount") * 100).as("disc_pct_ceil"),
          floor(col("l_tax") * 100).as("tax_pct_floor"),
          (col("l_orderkey") % 7).as("key_mod"),
          abs(col("l_quantity") - 25).as("qty_dev"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Scalar subquery through the SQL front door (Catalyst rewrites it
    // to a broadcast of the single-row aggregate — no per-row re-eval).
    q("q_scalar_subquery",
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      customer(s, d).createOrReplaceTempView("customer")
      s.sql("""SELECT c_custkey, c_acctbal FROM customer
              |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
              |ORDER BY c_custkey""".stripMargin)
    },

    // HAVING over a fact join.
    q("q_having",
      """SELECT o_orderkey, count(*) AS n_items FROM orders
        | JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey HAVING count(*) >= 5
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      orders(s, d).join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_items"))
        .filter(col("n_items") >= 5)
        .orderBy("o_orderkey")
    },

    // Full outer join (null-extended on both sides).
    q("q_full_outer",
      """SELECT coalesce(c_custkey, o_custkey) AS k, c_name, o_orderkey
        |FROM customer FULL JOIN orders ON o_custkey = c_custkey
        |ORDER BY k, o_orderkey NULLS FIRST""".stripMargin) { (s, d) =>
      customer(s, d).join(orders(s, d), col("o_custkey") === col("c_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("k"),
          col("c_name"), col("o_orderkey"))
        .orderBy(col("k"), asc_nulls_first("o_orderkey"))
    },

    // Self join: nation pairs within a region (broadcast both sides).
    q("q_self_join",
      """SELECT n1.n_name AS nation_a, n2.n_name AS nation_b
        |FROM nation n1 JOIN nation n2
        |  ON n1.n_regionkey = n2.n_regionkey AND n1.n_name < n2.n_name
        |ORDER BY nation_a, nation_b""".stripMargin) { (s, d) =>
      val n1 = nation(s, d).as("n1")
      val n2 = nation(s, d).as("n2")
      n1.join(n2, col("n1.n_regionkey") === col("n2.n_regionkey") &&
          col("n1.n_name") < col("n2.n_name"))
        .select(col("n1.n_name").as("nation_a"), col("n2.n_name").as("nation_b"))
        .orderBy("nation_a", "nation_b")
    },

    // lead + global ntile in one pass (two window specs, one shuffle
    // each — Spark plans them as consecutive Window operators).
    // Scale note: the GLOBAL ntile window is deliberately unpartitioned —
    // a single-task sort. Fine for a dimension-sized table like orders;
    // at fact scale the equivalent is approx percentile bucketing
    // (q_percentiles) or a range-partitioned rank, never a global window.
    q("q_lead_ntile",
      """SELECT o_orderkey,
        | lead(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS next_price,
        | ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS price_tile
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val wc = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      val wg = Window.orderBy(desc("o_totalprice"), col("o_orderkey"))
      orders(s, d).select(col("o_orderkey"),
        lead(col("o_totalprice"), 1).over(wc).as("next_price"),
        ntile(4).over(wg).cast("long").as("price_tile"))
        .orderBy("o_orderkey")
    },

    // RANGE frame: rolling 30-minute sum per user (value-based frame —
    // the batch shape of a sliding stream aggregate).
    q("q_range_frame",
      """SELECT event_id,
        | round(sum(value) OVER (PARTITION BY user_id
        |   ORDER BY epoch_us(ts::TIMESTAMP)
        |   RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW),2) AS rolling_30m
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
        .rangeBetween(-1800000000L, Window.currentRow)
      events(s, d).select(col("event_id"),
        round(sum("value").over(w), 2).as("rolling_30m"))
        .orderBy("event_id")
    },

    // Typed Dataset[T] surface: Column-expression filter first (so
    // pushdown still reaches the scan), then a typed projection through
    // case-class encoders — the documented typed/untyped boundary.
    q("q_typed_filter",
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice * (1 - l_discount), 2) AS net
        |FROM lineitem WHERE l_quantity >= 49
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      import s.implicits._
      graft.typed.TypedTables.lineitems(s, d)
        .filter(col("l_quantity") >= 49)
        .map(li => (li.l_orderkey, li.l_linenumber,
          // DuckDB round(x, 2) is std::round(x*100)/100 — replicate it
          // exactly (BigDecimal decimal rounding disagrees on the ~0.1%
          // of raw products whose double sits at the .xx5 window)
          math.round(li.l_extendedprice * (1 - li.l_discount) * 100.0) / 100.0))
        .toDF("l_orderkey", "l_linenumber", "net")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Array function coverage over the embedding column.
    q("q_array_funcs",
      """SELECT vec_id,
        | round(list_max(embedding::DOUBLE[]), 6) AS emb_max,
        | round(list_min(embedding::DOUBLE[]), 6) AS emb_min,
        | len(embedding) AS emb_len,
        | round(list_sum(list_transform(embedding::DOUBLE[], x -> abs(x))), 6) AS l1_norm
        |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin) { (s, d) =>
      embeddings(s, d).filter(col("vec_id") < 100)
        .select(col("vec_id"),
          round(array_max(col("embedding")).cast("double"), 6).as("emb_max"),
          round(array_min(col("embedding")).cast("double"), 6).as("emb_min"),
          size(col("embedding")).cast("long").as("emb_len"),
          round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + abs(x.cast("double"))), 6).as("l1_norm"))
        .orderBy("vec_id")
    },

    // Explicit GROUPING SETS (beyond rollup/cube) via the SQL front door.
    q("q_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      orders(s, d).createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },

    // argmax/argmin aggregates; ordering value made unique so ties
    // break identically in both engines.
    q("q_argmax",
      """SELECT o_custkey,
        | max_by(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS best_order,
        | min_by(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS worst_order
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val rank = col("o_totalprice") * 1000000 + col("o_orderkey")
      orders(s, d).groupBy("o_custkey")
        .agg(max_by(col("o_orderkey"), rank).as("best_order"),
          min_by(col("o_orderkey"), rank).as("worst_order"))
        .orderBy("o_custkey")
    },

    // Salted two-level aggregation: identical result to a direct
    // groupBy (the oracle IS the direct groupBy) with the hot key's
    // volume spread across 16 reducers — the aggregation-skew lever.
    q("q_salted_agg",
      """SELECT event_type, round(sum(value),2) AS sum_value, count(*) AS n_rows
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      graft.ops.Skew.saltedAgg(events(s, d), "event_type", salts = 16,
          sumCol = "value", saltFrom = col("event_id"))
        .select(col("event_type"), round(col("sum_value"), 2).as("sum_value"),
          col("n_rows"))
        .orderBy("event_type")
    },

    // AS-OF join: each event picks up the user's most recent STRICTLY
    // prior purchase — one shuffle via union-tag + window
    // (TemporalJoins.asofJoin), never a theta join.
    q("q_asof_join",
      """SELECT event_id, user_id,
        | last_value(CASE WHEN event_type='purchase' THEN event_id END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_id
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      TemporalJoins.asofJoin(ev, purchases, Seq("user_id"), "ts", "ts",
          payload = Seq("event_id"), strict = true)
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("prev_purchase_id"))
        .orderBy("event_id")
    },

    // Non-strict AS-OF: the latest purchase AT-OR-BEFORE each event —
    // purchase events match themselves (the `<=` tie semantics the
    // strict variant above excludes).
    q("q_asof_nonstrict",
      """SELECT event_id, user_id,
        | last_value(CASE WHEN event_type='purchase' THEN event_id END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_id
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      TemporalJoins.asofJoin(ev, purchases, Seq("user_id"), "ts", "ts",
          payload = Seq("event_id"), strict = false)
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("last_purchase_id"))
        .orderBy("event_id")
    },

    // Banded range join: event pairs within 5 minutes per user — join
    // on (user, time-bucket±1) then exact predicate; candidates stay
    // linear in corpus density, never |E|² (TemporalJoins.rangeJoin).
    q("q_range_join",
      """SELECT a.user_id AS user_id, a.event_id AS id1, b.event_id AS id2
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(a.ts::TIMESTAMP) - epoch_us(b.ts::TIMESTAMP)) <= 300000000
        |ORDER BY user_id, id1, id2""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val a = ev.select(col("user_id"), col("event_id").as("id1"), col("ts").as("ts1"))
      val b = ev.select(col("user_id"), col("event_id").as("id2"), col("ts").as("ts2"))
      TemporalJoins.rangeJoin(a, b, Seq("user_id"), "ts1", "ts2", 300000000L)
        .filter(col("id1") < col("id2"))
        .select("user_id", "id1", "id2")
        .orderBy("user_id", "id1", "id2")
    }
  )
}
