package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third query tranche: semi-structured (JSON) extraction, conditional /
  * statistical / bitwise aggregates, null-safe joins, window value
  * functions, calendar scaffolds, deterministic sampling, multi-agg
  * pivot, correlated EXISTS, and the z-order clustering key. Every query
  * here is oracle-checked (QueryDef.scala conventions).
  */
object CoreQueries3 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  /** DuckDB rendering of [[graft.lake.Compaction.zValue]] — generated
    * from the same (bits) loop so the two sides can't drift.
    */
  private def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  val all: Seq[QueryDef] = Seq(

    // JSON property extraction: both the per-path accessor
    // (get_json_object) and the schema'd parse (from_json) — at scale the
    // schema'd parse is one pass over the string, not one per path.
    q("q_json_extract",
      """SELECT event_type,
        |  sum(CAST(props->>'$.k' AS BIGINT))::BIGINT AS sum_k,
        |  round(avg(CAST(props->>'$.k' AS BIGINT)), 6) AS avg_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      events(s, d).select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k1"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").cast("long").as("k2"))
        .groupBy("event_type")
        .agg(sum("k1").as("sum_k"), round(avg("k2"), 6).as("avg_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // Null-safe equality join (<=>): null keys match each other — the
    // semantics dimension tables with "unknown" keys need.
    q("q_nullsafe_join",
      """SELECT c_custkey, s_suppkey, nullif(c_nationkey % 5, 0) AS match_key
        |FROM customer JOIN supplier
        |  ON nullif(c_nationkey % 5, 0) IS NOT DISTINCT FROM nullif(s_nationkey % 5, 0)
        |WHERE c_custkey < 500
        |ORDER BY c_custkey, s_suppkey""".stripMargin) { (s, d) =>
      val c = customer(s, d).filter(col("c_custkey") < 500)
        .select(col("c_custkey"), expr("nullif(c_nationkey % 5, 0)").as("match_key"))
      val sp = supplier(s, d)
        .select(col("s_suppkey"), expr("nullif(s_nationkey % 5, 0)").as("sk"))
      c.join(sp, col("match_key") <=> col("sk"))
        .select(col("c_custkey"), col("s_suppkey"), col("match_key"))
        .orderBy("c_custkey", "s_suppkey")
    },

    // Conditional aggregation: count_if + filtered sum/avg via CASE — the
    // one-pass replacement for N filtered subqueries.
    q("q_conditional_agg",
      """SELECT o_orderpriority,
        |  count_if(o_totalprice > 150000)::BIGINT AS n_big,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS sum_f,
        |  round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 6) AS avg_open,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      orders(s, d).groupBy("o_orderpriority")
        .agg(count_if(col("o_totalprice") > 150000).as("n_big"),
          round(sum(when(col("o_orderstatus") === "F", col("o_totalprice"))
            .otherwise(0)), 2).as("sum_f"),
          round(avg(when(col("o_orderstatus") === "O", col("o_totalprice"))), 6)
            .as("avg_open"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // Statistical aggregates: correlation, sample covariance, stddev,
    // population variance per group.
    q("q_corr_covar",
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_discount, l_tax), 9) AS cov_dt,
        |  round(stddev_samp(l_quantity), 6) AS sd_q,
        |  round(var_pop(l_quantity), 6) AS var_q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      lineitem(s, d).groupBy("l_returnflag")
        .agg(round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qp"),
          round(covar_samp("l_discount", "l_tax"), 9).as("cov_dt"),
          round(stddev_samp("l_quantity"), 6).as("sd_q"),
          round(var_pop("l_quantity"), 6).as("var_q"))
        .orderBy("l_returnflag")
    },

    // min_by/max_by: argmin/argmax as first-class aggregates (the
    // deterministic ordering value is the unique o_orderkey).
    q("q_minby_maxby",
      """SELECT o_custkey,
        |  max_by(o_orderpriority, o_orderkey) AS latest_priority,
        |  min_by(o_orderpriority, o_orderkey) AS first_priority,
        |  max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
      orders(s, d).groupBy("o_custkey")
        .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("latest_priority"),
          min_by(col("o_orderpriority"), col("o_orderkey")).as("first_priority"),
          max("o_totalprice").as("max_price"))
        .orderBy("o_custkey")
    },

    // Ordered set collection: collect_set → array_sort → join — the
    // deterministic way to emit a grouped value list.
    q("q_collect_sorted",
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      orders(s, d).groupBy("o_orderpriority")
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // Window value functions: first/last over the full frame,
    // percent_rank / cume_dist over the default frame.
    q("q_window_firstlast",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      orders(s, d).filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          first("o_orderkey").over(wFull).as("first_key"),
          last("o_orderkey").over(wFull).as("last_key"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Running min/max/count — monotone state over an expanding frame
    // (exact value picks: no float accumulation to round).
    q("q_running_minmax",
      """SELECT user_id, event_id,
        |  min(value) OVER w AS run_min,
        |  max(value) OVER w AS run_max,
        |  count(*) OVER w AS run_n
        |FROM events WHERE user_id < 50
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d).filter(col("user_id") < 50)
        .select(col("user_id"), col("event_id"),
          min("value").over(w).as("run_min"),
          max("value").over(w).as("run_max"),
          count(lit(1)).over(w).as("run_n"))
        .orderBy("user_id", "event_id")
    },

    // Calendar scaffold: sequence() over the min..max day range, exploded
    // and left-joined so empty days appear with zeros — the gap-filling
    // shape every time-series report needs.
    q("q_date_scaffold",
      """WITH bounds AS (
        |  SELECT date_trunc('day', min(o_orderdate)) AS d0,
        |         date_trunc('day', max(o_orderdate)) AS d1 FROM orders),
        |days AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds),
        |daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n_orders,
        |         round(sum(o_totalprice), 2) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT strftime(days.day, '%Y-%m-%d') AS day,
        |  coalesce(daily.n_orders, 0)::BIGINT AS n_orders,
        |  coalesce(daily.revenue, 0) AS revenue
        |FROM days LEFT JOIN daily ON days.day = daily.day
        |ORDER BY day""".stripMargin) { (s, d) =>
      val o = orders(s, d)
      val bounds = o.agg(date_trunc("day", min("o_orderdate")).as("d0"),
        date_trunc("day", max("o_orderdate")).as("d1"))
      val days = bounds
        .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val daily = o.groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      days.join(daily, Seq("day"), "left")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"))
        .orderBy("day")
    },

    // Deterministic stratified sampling: md5-prefix Bernoulli (~1/16 per
    // stratum) — reproducible across engines and runs, unlike rand();
    // the per-stratum rate is the auditable output.
    q("q_sample_stratified",
      """SELECT source, count(*) AS n_total,
        |  count_if(substr(md5(concat('s1:', doc_id::VARCHAR)), 1, 1) = '0')::BIGINT
        |    AS n_sampled,
        |  round(count_if(substr(md5(concat('s1:', doc_id::VARCHAR)), 1, 1) = '0')
        |    * 1.0 / count(*), 6) AS rate
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val sampled = substring(
        md5(concat(lit("s1:"), col("doc_id").cast("string")).cast("binary")), 1, 1) === "0"
      documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_total"), count_if(sampled).as("n_sampled"))
        .withColumn("rate", round(col("n_sampled") * lit(1.0) / col("n_total"), 6))
        .orderBy("source")
    },

    // Equi-width histogram via floor division (min/max are exact picks —
    // no cross-engine rounding needed).
    q("q_histogram",
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      orders(s, d)
        .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), min("o_totalprice").as("lo"),
          max("o_totalprice").as("hi"))
        .orderBy("bucket")
    },

    // Pivot with MULTIPLE aggregates per cell (count + avg). Absent
    // cells are NULL in a pivot (no input rows), so the oracle's
    // conditional aggregation nullif's its zero counts to match.
    q("q_pivot_multi",
      """SELECT o_orderpriority,
        |  nullif(count_if(o_orderstatus = 'F'), 0)::BIGINT AS F_cnt,
        |  round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 6) AS F_avg_price,
        |  nullif(count_if(o_orderstatus = 'O'), 0)::BIGINT AS O_cnt,
        |  round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 6) AS O_avg_price,
        |  nullif(count_if(o_orderstatus = 'P'), 0)::BIGINT AS P_cnt,
        |  round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 6) AS P_avg_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      orders(s, d).groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("cnt"), round(avg("o_totalprice"), 6).as("avg_price"))
        .orderBy("o_orderpriority")
    },

    // Correlated EXISTS through the SQL front door (plans as a semi
    // join — no per-row subquery execution).
    q("q_exists_subquery",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      customer(s, d).createOrReplaceTempView("customer")
      orders(s, d).createOrReplaceTempView("orders")
      s.sql("""SELECT c_custkey, c_name FROM customer c
              |WHERE EXISTS (SELECT 1 FROM orders o
              |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
              |ORDER BY c_custkey""".stripMargin)
    },

    // ANSI-safe arithmetic: try_divide returns NULL where strict ANSI
    // division would raise (zero denominators from l_linenumber-1).
    q("q_try_divide",
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_linenumber - 1 = 0 THEN NULL
        |       ELSE round(l_quantity / (l_linenumber - 1), 6) END AS qty_per_extra
        |FROM lineitem WHERE l_orderkey < 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      lineitem(s, d).filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(expr("try_divide(l_quantity, l_linenumber - 1)"), 6)
            .as("qty_per_extra"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Bitwise aggregates (AND/OR/XOR) — commutative, so deterministic
    // under any partitioning.
    q("q_bitwise_agg",
      """SELECT event_type,
        |  bit_and(user_id) AS band, bit_or(user_id) AS bor,
        |  bit_xor(user_id) AS bxor, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      events(s, d).groupBy("event_type")
        .agg(bit_and(col("user_id")).as("band"), bit_or(col("user_id")).as("bor"),
          bit_xor(col("user_id")).as("bxor"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // unionByName with allowMissingColumns: schema evolution across
    // branches — reordered columns align by NAME, absent ones null-fill.
    q("q_union_by_name",
      """SELECT o_orderkey, o_orderstatus, o_orderpriority AS extra
        |FROM orders WHERE o_orderstatus = 'F' AND o_orderkey < 5000
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, NULL AS extra
        |FROM orders WHERE o_orderstatus = 'O' AND o_orderkey < 5000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val a = orders(s, d)
        .filter(col("o_orderstatus") === "F" && col("o_orderkey") < 5000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority").as("extra"))
      val b = orders(s, d)
        .filter(col("o_orderstatus") === "O" && col("o_orderkey") < 5000)
        .select(col("o_orderstatus"), col("o_orderkey")) // reordered, no `extra`
      a.unionByName(b, allowMissingColumns = true).orderBy("o_orderkey")
    },

    // Skew-replicated join (ops/Skew.saltedJoin): results identical to
    // the plain join — the oracle IS the unsalted formulation.
    q("q_salted_join",
      """SELECT s_nationkey, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, d) =>
      val fact = lineitem(s, d).select(col("l_suppkey").as("suppkey"),
        col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val dim = supplier(s, d).select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      graft.ops.Skew.saltedJoin(fact, dim, "suppkey", salts = 8,
          saltFrom = col("l_orderkey") * 8 + col("l_linenumber"))
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("s_nationkey")
    },

    // Z-order clustering key (see graft.lake.Compaction): the Morton
    // interleave both engines compute with identical bit arithmetic.
    q("q_zorder_key",
      s"""SELECT l_orderkey, l_linenumber,
         |  ${zValueSql("(l_partkey % 256)", "(l_suppkey % 256)", 8)} AS zkey
         |FROM lineitem WHERE l_orderkey < 2000
         |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      lineitem(s, d).filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.lake.Compaction.zValue(col("l_partkey") % 256, col("l_suppkey") % 256, 8)
            .as("zkey"))
        .orderBy("l_orderkey", "l_linenumber")
    }
  )
}
