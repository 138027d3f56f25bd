package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifth query tranche: the remaining classic analytic join/subquery
  * shapes (TPC-H Q7/Q13/Q16/Q17/Q19 adapted to the fixture schema) plus
  * the oracle-checked exact-dedup-survivors pipeline. Oracle conventions
  * per QueryDef.scala.
  */
object CoreQueries5 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // TPC-H Q7 shape (volume shipping between two nations): the
    // dimension filters are applied BEFORE the fact joins — supplier and
    // customer are pre-joined to the two-nation slice (broadcast), so the
    // big lineitem⋈orders join only carries rows that can qualify; the
    // (A,B)|(B,A) pair disjunction collapses to supp≠cust post-join.
    q("q7_nation_volume",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        |WHERE n1.n_name IN ('NATION_1','NATION_2')
        |  AND n2.n_name IN ('NATION_1','NATION_2')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      def natSlice(key: String, out: String) =
        nation(s, d).filter(col("n_name").isin("NATION_1", "NATION_2"))
          .select(col("n_nationkey").as(key), col("n_name").as(out))
      val sup = supplier(s, d)
        .join(broadcast(natSlice("n1k", "supp_nation")),
          col("s_nationkey") === col("n1k"))
        .select("s_suppkey", "supp_nation")
      val cust = customer(s, d)
        .join(broadcast(natSlice("n2k", "cust_nation")),
          col("c_nationkey") === col("n2k"))
        .select("c_custkey", "cust_nation")
      lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q13 shape (customer order distribution): LEFT OUTER with an
    // extra predicate in the join condition (not a post-filter — that
    // would drop no-order customers), then a second aggregation OVER the
    // first one's result. Both aggs shuffle on their own key; the outer
    // histogram is tiny.
    q("q13_order_distribution",
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |      FROM customer c LEFT JOIN orders o
        |        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
        |      GROUP BY c.c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      customer(s, d).select("c_custkey")
        .join(orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
            .select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(count("o_orderkey").as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q16 shape (supplier diversity per part group): NOT-IN
    // subquery (→ left anti; supplier keys are non-null so semantics
    // coincide) + COUNT DISTINCT over the join of fact and a filtered
    // dimension. The excluded-supplier list is tiny → broadcast anti.
    q("q16_supplier_cnt",
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, d) =>
      val excluded = supplier(s, d).filter(col("s_acctbal") < 0).select("s_suppkey")
      val parts = part(s, d)
        .filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      lineitem(s, d).select("l_partkey", "l_suppkey")
        .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // TPC-H Q17 shape (small-quantity revenue): correlated scalar
    // subquery — avg quantity per part — written de-correlated, the plan
    // every engine rewrites it to. Since p_partkey determines p_brand,
    // the per-part averages are computed over the brand-filtered slice
    // only (identical values, ~25× less aggregated).
    q("q17_small_qty",
      """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#3'
        |  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin) { (s, d) =>
      val brandParts = part(s, d).filter(col("p_brand") === "Brand#3").select("p_partkey")
      val li = lineitem(s, d).select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .drop("p_partkey")
      val thresholds = li.groupBy("l_partkey")
        .agg((avg("l_quantity") * 0.5).as("qty_threshold"))
      li.join(thresholds, Seq("l_partkey"))
        .filter(col("l_quantity") < col("qty_threshold"))
        .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
    },

    // TPC-H Q19 shape (disjunctive mixed-table predicate): three
    // brand/size/quantity conjunctions OR'd together. Catalyst extracts
    // the per-side unions (p_brand IN..., quantity range hull) below the
    // join and keeps the full disjunction as the join filter.
    q("q19_disjunctive_pushdown",
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 20 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
      val li = lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val p = part(s, d).select("p_partkey", "p_brand", "p_size")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#24" && col("p_size").between(20, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
    },

    // Exact-dedup survivors, fully oracle-checked: word-Jaccard pairs on
    // the bounded doc window (same slice as q_dedup_jaccard) → connected
    // components → keep each cluster's min-id member plus all unpaired
    // docs. The oracle replays the clustering with a WITH RECURSIVE
    // transitive closure (min reachable id per node) — the sketch-based
    // q_dedup_survivors keeps its rows-only check, this pins the CC +
    // survivor semantics against DuckDB end-to-end.
    q("q_dedup_survivors_exact",
      """WITH RECURSIVE words AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE doc_id < 200
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM words GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS overlap
        |  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |), pairs AS (
        |  SELECT id1, id2 FROM inter
        |   JOIN sizes s1 ON s1.doc_id = id1
        |   JOIN sizes s2 ON s2.doc_id = id2
        |  WHERE overlap * 1.0 / (s1.sz + s2.sz - overlap) >= 0.9
        |), edges AS (
        |  SELECT id1 AS src, id2 AS dst FROM pairs
        |  UNION SELECT id2, id1 FROM pairs
        |), reach(id, comp) AS (
        |  SELECT src, src FROM (SELECT DISTINCT src FROM edges) t
        |  UNION
        |  SELECT e.src, r.comp FROM edges e JOIN reach r ON r.id = e.dst
        |), cc AS (
        |  SELECT id, min(comp) AS component FROM reach GROUP BY id
        |)
        |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
        |WHERE d.doc_id < 200
        |  AND d.doc_id NOT IN (SELECT id FROM cc WHERE id <> component)
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = documents(s, d).filter(col("doc_id") < 200)
      graft.llm.Dedup.dedupSurvivors(
          docs.select("doc_id", "lang", "n_chars"),
          graft.llm.Dedup.wordJaccardPairs(docs, 0.9))
        .orderBy("doc_id")
    },

    // TPC-H Q22 shape (inactive above-average customers): uncorrelated
    // scalar subquery (global average, broadcast 1-row join) + NOT
    // EXISTS anti join against a filtered fact, then a dimension
    // rollup. The anti-join build side carries only o_custkey.
    q("q22_inactive_customers",
      """SELECT c_mktsegment, count(*) AS numcust,
        |  round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val avgBal = customer(s, d).filter(col("c_acctbal") > 0)
        .agg(avg("c_acctbal").as("avg_bal"))
      val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey")
      customer(s, d)
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
        .orderBy("c_mktsegment")
    },

    // TPC-H Q11 shape (important part values): group aggregate filtered
    // against a fraction of the GLOBAL aggregate — the scalar-subquery-
    // over-the-same-fact pattern. Both aggregations share one scan-side
    // partial-agg shape; the global total is a broadcast 1-row join.
    q("q11_top_value_parts",
      """SELECT l_partkey, round(sum(l_extendedprice), 2) AS part_value
        |FROM lineitem GROUP BY l_partkey
        |HAVING sum(l_extendedprice) >
        |  (SELECT sum(l_extendedprice) * 0.00055 FROM lineitem)
        |ORDER BY part_value DESC, l_partkey""".stripMargin) { (s, d) =>
      val total = lineitem(s, d)
        .agg((sum("l_extendedprice") * 0.00055).as("threshold"))
      lineitem(s, d).groupBy("l_partkey")
        .agg(sum("l_extendedprice").as("pv"))
        .crossJoin(broadcast(total))
        .filter(col("pv") > col("threshold"))
        .select(col("l_partkey"), round(col("pv"), 2).as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },

    // KMV (k-minimum-values) distinct sketch: unlike HLL
    // (q_approx_distinct, engine-internal → rows-only forever), KMV on
    // the replayable md5 hash is a fully oracle-checkable approximate
    // count-distinct: estimate = (k-1) · 2³² / kth-min-hash. One
    // distinct shuffle + one per-group top-k window — at scale the
    // distinct pre-aggregates map-side and only k hashes per group
    // matter.
    q("q_kmv_distinct",
      """WITH h AS (SELECT DISTINCT l_returnflag,
        |  ('0x' || substr(md5(l_partkey::VARCHAR), 1, 8))::BIGINT AS hv
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, hv,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rk FROM h)
        |SELECT l_returnflag,
        |  CAST(floor((256 - 1) * 4294967296.0 / max(hv)) AS BIGINT) AS kmv_estimate,
        |  count(*) AS k_used
        |FROM r WHERE rk <= 256 GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_returnflag").orderBy("hv")
      lineitem(s, d)
        .select(col("l_returnflag"),
          graft.llm.Dedup.md5Int(col("l_partkey").cast("string")).as("hv"))
        .distinct()
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 256)
        .groupBy("l_returnflag")
        .agg(floor(lit((256 - 1) * 4294967296.0) / max("hv")).cast("long")
            .as("kmv_estimate"),
          count(lit(1)).as("k_used"))
        .orderBy("l_returnflag")
    },

    // Fuzzy string matching: edit-distance near-dup pairs over a
    // bounded dimension slice — the Levenshtein ground-truth baseline
    // for name/title-level dedup (both engines implement standard edit
    // distance, so the oracle is exact). Bounded all-pairs by design;
    // the scale path for fuzzy text dedup is the banded minhash family.
    q("q_fuzzy_match",
      """SELECT a.p_partkey AS id1, b.p_partkey AS id2,
        |  levenshtein(a.p_name, b.p_name) AS edit_dist
        |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        |WHERE a.p_partkey < 300 AND b.p_partkey < 300
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      val p = part(s, d).filter(col("p_partkey") < 300)
        .select(col("p_partkey"), col("p_name"))
      p.as("a").join(p.as("b"), col("a.p_partkey") < col("b.p_partkey"))
        .withColumn("edit_dist", levenshtein(col("a.p_name"), col("b.p_name")))
        .filter(col("edit_dist") <= 2)
        .select(col("a.p_partkey").as("id1"), col("b.p_partkey").as("id2"),
          col("edit_dist"))
        .orderBy("id1", "id2")
    },

    // nth_value over the full-partition frame (the remaining analytic
    // window function): 2nd/3rd element of each customer's order
    // history — positional window lookups, frame-exact in both engines.
    q("q_nth_value",
      """SELECT o_orderkey, o_custkey,
        |  nth_value(o_totalprice, 2) OVER w AS second_price,
        |  nth_value(o_orderkey, 3) OVER w AS third_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
          nth_value(col("o_orderkey"), 3).over(w).as("third_key"))
        .orderBy("o_orderkey")
    },

    // TPC-H Q21 shape (suppliers who alone failed a multi-supplier
    // order): the double-correlated quantifier pair — EXISTS (another
    // supplier on the same order) AND NOT EXISTS (another supplier who
    // ALSO failed it) — the hardest decorrelation shape. The fixture has
    // no receipt/commit dates, so "failed" = returned line
    // (l_returnflag='R') on a finished ('F') order; the join topology is
    // Q21's exactly. Decorrelated form: both quantifiers become one
    // semi and one anti join on (orderkey, suppkey≠suppkey) — equi on
    // the order key with the inequality as a join residual, so both
    // shuffle hash-partitioned on l_orderkey with NO nested loop; the
    // supplier name lookup broadcasts.
    q("q21_waiting_supplier",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin) { (s, d) =>
      val li = lineitem(s, d).select("l_orderkey", "l_suppkey", "l_returnflag")
      val l1 = li.filter(col("l_returnflag") === "R")
        .join(orders(s, d).filter(col("o_orderstatus") === "F")
            .select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_suppkey")
      val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      l1.join(l2, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3"),
          "left_anti")
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },

    // TPC-H Q15 shape (top supplier by windowed revenue): a named
    // aggregate view consumed twice — once as the join input, once under
    // a global MAX scalar subquery — completing Q11's fraction-of-total
    // pattern with its equality-to-global-extreme sibling. The revenue
    // aggregation runs ONCE per consumer off the same scan-side partial
    // agg; the 1-row max broadcasts. Revenue is compared UNROUNDED (both
    // engines pick the same argmax; sums differing by float accumulation
    // order sit ~1e-10 apart vs ~1e3 gaps between suppliers) and only
    // rounded for output.
    q("q15_top_supplier",
      """WITH revenue0 AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
        |FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val revenue = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val top = revenue.agg(max("total_revenue").as("max_revenue"))
      revenue.crossJoin(broadcast(top))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_name")),
          col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("total_revenue"), 2).as("total_revenue"))
        .orderBy("s_suppkey")
    }
  )
}
