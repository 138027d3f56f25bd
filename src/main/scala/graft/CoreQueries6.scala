package graft

import graft.CheckpointStrategy.Ops._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixth query tranche: the remaining TPC-H query shapes (Q2, Q4, Q6,
  * Q8, Q9, Q12, Q14, Q20), adapted to the fixture schema — with these
  * the registry exercises all 22 TPC-H shapes. Adaptations (the fixture
  * has no partsupp table and no commit/receipt dates or ship modes on
  * lineitem): the distinct (partkey, suppkey) pairs actually shipped
  * stand in for partsupp; "late" lines are shipped ≥60 days after the
  * order date; l_linestatus stands in for l_shipmode; Q9's supply cost
  * is a fixed 50% of p_retailprice. Join topology, correlation
  * structure, and aggregate shapes are each original query's exactly.
  * Oracle conventions per QueryDef.scala.
  */
object CoreQueries6 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  private val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))

  val all: Seq[QueryDef] = Seq(

    // TPC-H Q2 shape (min-cost supplier per part): correlated scalar MIN
    // subquery whose correlation spans a join (the part's supplier set),
    // decorrelated to a per-part min + equality join — the same
    // rewrite every planner applies. The supplier↔part pair set (the
    // fixture's partsupp) aggregates from lineitem ONCE and feeds both
    // the min and the output join off the same subplan; dimension
    // lookups broadcast. Equality on s_acctbal compares stored values
    // (no arithmetic), so cross-engine selection is exact.
    q("q2_min_cost_supplier",
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 5)),
        |costed AS (SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal,
        |    n.n_name
        |  FROM part p JOIN ps ON ps.l_partkey = p.p_partkey
        |  JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  WHERE p.p_size = 5)
        |SELECT c.p_partkey, c.s_name, c.s_acctbal, c.n_name
        |FROM costed c
        |WHERE c.s_acctbal = (SELECT min(c2.s_acctbal) FROM costed c2
        |                     WHERE c2.p_partkey = c.p_partkey)
        |ORDER BY c.p_partkey, c.s_name""".stripMargin) { (s, d) =>
      // The part-slice semi join sits BELOW the distinct: the expensive
      // pair-dedup shuffle then runs over only the qualifying parts'
      // lines (~1/50th of lineitem) instead of the whole fact table —
      // the selective-dimension-first rule Q2's planner applies.
      val sizedParts = part(s, d).filter(col("p_size") === 5).select("p_partkey")
      val ps = lineitem(s, d).select("l_partkey", "l_suppkey")
        .join(broadcast(sizedParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .distinct()
      val costed = sizedParts
        .join(ps, col("p_partkey") === col("l_partkey"))
        .join(broadcast(supplier(s, d)
            .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("p_partkey", "s_name", "s_acctbal", "n_name")
        // costed feeds both the per-part min and the output join —
        // materialize the (small) slice once instead of running the
        // distinct+join pipeline twice.
        .cut()
      val mins = costed.groupBy(col("p_partkey").as("mk"))
        .agg(min("s_acctbal").as("min_bal"))
      costed.join(mins, col("p_partkey") === col("mk") &&
          col("s_acctbal") === col("min_bal"))
        .select("p_partkey", "s_name", "s_acctbal", "n_name")
        .orderBy("p_partkey", "s_name")
    },

    // TPC-H Q4 shape (order-priority checking): EXISTS against the fact
    // → left semi join on the order key, then a tiny priority
    // histogram. The semi join build side prunes to the single join
    // column before shuffling.
    q("q4_priority_check",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") &&
          col("o_orderdate") < lit("1996-07-01 00:00:00"))
        .join(lineitem(s, d).filter(col("l_returnflag") === "R")
            .select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q6 shape (forecast revenue): the pushdown showcase — a
    // single-table range-filter aggregate. All three predicates reach
    // the parquet scan (PushedFilters) and the scan reads 4 of 11
    // columns; zero joins, one 1-row aggregate. Decimal sum for the
    // same .xx5-boundary reason as q9 (a single global sum has the
    // largest accumulation-order exposure).
    q("q6_forecast_revenue",
      """SELECT round(sum(CAST(l_extendedprice * l_discount
        |  AS DECIMAL(20,6))), 2)::DOUBLE AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum((col("l_extendedprice") * col("l_discount"))
            .cast("decimal(20,6)")), 2).cast("double")
          .as("revenue"))
    },

    // TPC-H Q8 shape (national market share): a supplier nation's share
    // of a region's customer-market revenue per year — conditional
    // numerator over the same rows as the denominator, so ONE aggregate
    // pass computes both. Region/nation dimensions broadcast into the
    // customer/supplier sides before the fact joins.
    q("q8_market_share",
      """SELECT year(o_orderdate) AS o_year,
        |  round(sum(CASE WHEN n2.n_name = 'NATION_1'
        |                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |    / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        |FROM lineitem
        |JOIN orders   ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON n1.n_nationkey = c_nationkey
        |JOIN region   ON r_regionkey = n1.n_regionkey AND r_name = 'EUROPE'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation n2 ON n2.n_nationkey = s_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val custRegion = customer(s, d).select("c_custkey", "c_nationkey")
        .join(broadcast(nation(s, d)
            .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey").as("cnk"))),
          col("c_nationkey") === col("cnk"))
        .select("c_custkey")
      val suppNation = supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(broadcast(nation(s, d)
            .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
        .select("s_suppkey", "supp_nation")
      lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(custRegion, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_1", revenue).otherwise(0)) /
            sum(revenue), 6).as("mkt_share"))
        .orderBy("o_year")
    },

    // TPC-H Q9 shape (product-line profit by nation and year): a
    // name-pattern part filter drives the fact join; profit is an
    // arithmetic combination of fact and dimension columns (supply cost
    // = 50% of retail price, standing in for partsupp's ps_supplycost).
    // Two-level agg: nothing aggregates until all joins finish, then one
    // shuffle on the (nation, year) pair. The per-row profit double is
    // bit-identical across engines (same IEEE ops, same tree), but its
    // SUM is accumulation-order-sensitive — at sf0.01 one group landed
    // on a .xx5 rounding boundary and the engines rounded apart — so
    // the sum runs in DECIMAL (exact, order-independent) and converts
    // to double only at output.
    q("q9_product_profit",
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  round(sum(CAST(l_extendedprice * (1 - l_discount)
        |            - 0.5 * p_retailprice * l_quantity AS DECIMAL(20,6))), 2)::DOUBLE
        |    AS sum_profit
        |FROM lineitem
        |JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%gear%'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation   ON n_nationkey = s_nationkey
        |JOIN orders   ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
        .join(broadcast(part(s, d).filter(col("p_name").like("%gear%"))
            .select("p_partkey", "p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .join(orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(round(sum((revenue -
            lit(0.5) * col("p_retailprice") * col("l_quantity"))
            .cast("decimal(20,6)")), 2).cast("double")
          .as("sum_profit"))
        .orderBy("nation", "o_year")
    },

    // TPC-H Q12 shape (late-line priority split): a cross-table
    // comparison filter (shipped ≥60 days after order date — the
    // fixture's stand-in for commit/receipt lateness), then a two-way
    // conditional count by line status (stand-in for ship mode). The
    // CASE pair shares one pass; the filter can't push below the join
    // (it references both tables) but runs pre-aggregation.
    q("q12_late_lines",
      """SELECT l_linestatus,
        |  sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
        |      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
        |      THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      val isHigh = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(lineitem(s, d).select("l_orderkey", "l_shipdate", "l_linestatus"),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAY"))
        .groupBy("l_linestatus")
        .agg(sum(when(isHigh, 1).otherwise(0)).as("high_line_count"),
          sum(when(!isHigh, 1).otherwise(0)).as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // TPC-H Q14 shape (promotion revenue share): conditional revenue
    // fraction over one month — numerator and denominator from the same
    // single aggregate pass; the part type lookup broadcasts.
    q("q14_promo_revenue",
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-09-01 00:00:00") &&
          col("l_shipdate") < lit("1996-10-01 00:00:00"))
        .join(broadcast(part(s, d).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", revenue).otherwise(0)) /
            sum(revenue), 6).as("promo_revenue"))
    },

    // TPC-H Q20 shape (heavy-shipper suppliers): IN over a GROUPED
    // HAVING subquery — the aggregate-then-semi-join decorrelation. The
    // per-(supplier, part) quantity totals aggregate first (one shuffle
    // on the composite key), the HAVING filters, and only distinct
    // supplier keys flow into the semi join against the dimension.
    q("q20_heavy_shippers",
      """SELECT s.s_suppkey, s.s_name, s.s_acctbal
        |FROM supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 50)
        |ORDER BY s.s_suppkey""".stripMargin) { (s, d) =>
      val heavy = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00"))
        .select("l_suppkey", "l_partkey", "l_quantity")
        .join(broadcast(part(s, d).filter(col("p_name").like("red%"))
            .select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum("l_quantity").as("qty"))
        .filter(col("qty") > 50)
        .select("l_suppkey")
      supplier(s, d)
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    },

    // Approximate percentile under the same tolerance contract as
    // q_approx_distinct: the sketch (Greenwald-Khanna at accuracy
    // 10000) can never hash-match another engine, so Spark emits the
    // EXACT interpolated median plus a boolean asserting the sketch
    // landed within 1% of it, and the oracle emits the exact median
    // plus TRUE — the row hash-matches iff the sketch held tolerance.
    // (GK guarantees RANK error n/accuracy; on this price distribution
    // that is ≤0.1% in value at every fixture scale.)
    q("q_approx_percentile",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_median,
        |  TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      lineitem(s, d).groupBy("l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("exact"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx"))
        .select(col("l_returnflag"),
          round(col("exact"), 6).as("exact_median"),
          (abs(col("approx") - col("exact")) <= col("exact") * lit(0.01))
            .as("within_tol"))
        .orderBy("l_returnflag")
    }
  )
}
