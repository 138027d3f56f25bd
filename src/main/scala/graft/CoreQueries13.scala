package graft

import graft.CheckpointStrategy.Ops._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirteenth core tranche: multi-objective and distributional analytics
  * — a 2-D Pareto skyline, the Gini concentration coefficient, Markov
  * event-transition probabilities, Welch two-sample t-tests, graph
  * degree assortativity and local clustering coefficients, deterministic
  * per-group mode, and a Deequ-style data-quality expectation suite.
  *
  * Scale shapes: the skyline collapses to the value-domain-bounded
  * per-size aggregate before its (allowlisted, ≤|size domain| row)
  * suffix-min window; Gini runs the standing bucketed two-pass prefix
  * sum with exact integer cents so the rank-weighted sum is
  * bit-identical across engines; transitions are one partitioned window
  * over per-user streams plus bounded-matrix normalization; the t-test
  * and assortativity reduce to segment/node aggregates before any
  * pairwise step; the DQ suite is a union of independent single-pass
  * aggregate checks (the referential check rides a keyed left join, not
  * a second scan).
  */
object CoreQueries13 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // 2-D Pareto skyline over parts (minimize price, maximize size).
    // Dominance against the full table is NOT an all-pairs problem in
    // two dimensions: a part is on the skyline iff it is the cheapest at
    // its size AND strictly cheaper than every larger size's cheapest
    // (sizes below cannot dominate). So the corpus collapses to the
    // per-size minimum first — a keyed aggregation — and the only
    // sequential step is a suffix-min over the size domain (bounded,
    // ≤50 rows in TPC-H; PlanLint-allowlisted). Equal (price, size)
    // pairs don't dominate each other (no strict coordinate), so ties
    // all surface. Raw parquet doubles pass through unrounded — no
    // arithmetic, no float hazard.
    q("q_skyline",
      """WITH s AS (SELECT p_size, min(p_retailprice) AS minp FROM part GROUP BY 1),
        |k AS (SELECT p_size, minp, min(minp) OVER (ORDER BY p_size DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sufmin FROM s)
        |SELECT p.p_partkey, p.p_retailprice AS price, p.p_size
        |FROM part p JOIN k ON k.p_size = p.p_size
        |WHERE p.p_retailprice = k.minp
        |  AND (k.sufmin IS NULL OR p.p_retailprice < k.sufmin)
        |ORDER BY p.p_partkey""".stripMargin) { (s, d) =>
      val p = part(s, d)
      val wSuf = Window.orderBy(col("p_size").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val k = p.groupBy("p_size").agg(min("p_retailprice").as("minp"))
        .withColumn("sufmin", min("minp").over(wSuf))
      p.join(k, "p_size")
        .filter(col("p_retailprice") === col("minp") &&
          (col("sufmin").isNull || col("p_retailprice") < col("sufmin")))
        .select(col("p_partkey"), col("p_retailprice").as("price"), col("p_size"))
        .orderBy("p_partkey")
    },

    // Gini coefficient of customer spend per market segment — the
    // standard concentration measure (0 = egalitarian, →1 = one whale).
    // The rank-weighted sum Σ i·xᵢ is a corpus-crossing running total,
    // so it runs as the standing bucketed two-pass prefix sum: $1000
    // spend buckets give per-(segment, bucket) partials; the ordered
    // pass runs over the bucket list, and in-bucket ranks come from a
    // window partitioned by (segment, bucket). Spend is fixed to exact
    // integer cents first (round-to-2 then ×100 — the registry's
    // exact-safe contract), so S and T are exact integers on both
    // engines (DECIMAL(38,0) / HUGEINT — Σ i·xᵢ overflows int64 around
    // sf1) and the final division is bit-identical. Equal-cents ties
    // contribute identically under any rank permutation, so tie order
    // cannot skew S.
    q("q_gini",
      """WITH sp AS (SELECT c.c_mktsegment AS seg, c.c_custkey,
        |    CAST(round(round(sum(o.o_totalprice), 2) * 100) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT seg, cents,
        |    row_number() OVER (PARTITION BY seg ORDER BY cents, c_custkey) AS i
        |  FROM sp),
        |a AS (SELECT seg, count(*) AS n, sum(cents::HUGEINT) AS t,
        |    sum(i::HUGEINT * cents) AS s FROM r GROUP BY seg)
        |SELECT seg, n AS n_customers, round(t::DOUBLE / 100, 2) AS total_spend,
        |  round((2 * s::DOUBLE - (n + 1) * t::DOUBLE) / (n * t::DOUBLE), 6) AS gini
        |FROM a ORDER BY seg""".stripMargin) { (s, d) =>
      val sp = orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
        .agg(round(round(sum("o_totalprice"), 2) * 100).cast("long").as("cents"))
        .withColumn("bkt", floor(col("cents") / 100000L))
      // pass 1: per-bucket partials (count, Σx, and in-bucket Σ lr·x)
      val wIn = Window.partitionBy("seg", "bkt").orderBy("cents", "c_custkey")
      val bkt = sp.withColumn("lr", row_number().over(wIn))
        .groupBy("seg", "bkt")
        .agg(count(lit(1)).as("bc"),
          sum(col("cents").cast("decimal(38,0)")).as("bx"),
          sum((col("lr") * col("cents")).cast("decimal(38,0)")).as("binner"))
      // pass 2: ordered carry over the bucket LIST only; global rank of
      // an in-bucket row = carried count + local rank, so
      // Σ i·x = Σ_b (carry_b·Σx_b + Σ_in_b lr·x)
      val wB = Window.partitionBy("seg").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val agg = bkt
        .withColumn("carry", coalesce(sum("bc").over(wB), lit(0L)))
        .groupBy("seg")
        .agg(sum("bc").as("n"), sum("bx").as("t"),
          sum(col("carry").cast("decimal(38,0)") * col("bx") + col("binner")).as("s"))
      agg.select(col("seg"), col("n").as("n_customers"),
          round(col("t").cast("double") / 100, 2).as("total_spend"),
          round((lit(2) * col("s").cast("double") -
            (col("n") + 1) * col("t").cast("double")) /
            (col("n") * col("t").cast("double")), 6).as("gini"))
        .orderBy("seg")
    },

    // First-order Markov transition matrix over per-user event streams:
    // P(next event type | current). One lead() window partitioned by
    // user (high-cardinality — parallel at any scale), then the
    // transition counts collapse to the |event types|²-bounded matrix
    // before normalization. prob = exact-integer ratio → IEEE division
    // of identical operands is bit-identical; rounding is convention.
    q("q_markov_transitions",
      """WITH t AS (SELECT event_type AS src, lead(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM events),
        |c AS (SELECT src, dst, count(*) AS n_trans FROM t
        |  WHERE dst IS NOT NULL GROUP BY 1, 2)
        |SELECT src, dst, n_trans,
        |  round(n_trans * 1.0 / sum(n_trans) OVER (PARTITION BY src), 6) AS prob
        |FROM c ORDER BY src, dst""".stripMargin) { (s, d) =>
      val wU = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val c = events(s, d)
        .select(col("event_type").as("src"),
          lead("event_type", 1).over(wU).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("n_trans"))
      c.withColumn("prob",
          round(col("n_trans") * lit(1.0) /
            sum("n_trans").over(Window.partitionBy("src")), 6))
        .orderBy("src", "dst")
    },

    // Welch's unequal-variance t-test between every market-segment pair
    // on account balance — the A/B-test staple. The corpus collapses to
    // per-segment (n, mean, s²) in ONE codegen'd aggregate pass; the
    // pairwise step is an inequality self-join of the |segments|-row
    // aggregate (bounded; PlanLint-allowlisted). dof via
    // Welch–Satterthwaite. Moment ratios round to 6 like every
    // cross-engine float aggregate.
    q("q_welch_ttest",
      """WITH g AS (SELECT c_mktsegment AS seg, count(*) AS n,
        |    avg(c_acctbal) AS m, var_samp(c_acctbal) AS v
        |  FROM customer GROUP BY 1)
        |SELECT a.seg AS seg1, b.seg AS seg2, a.n AS n1, b.n AS n2,
        |  round(a.m - b.m, 6) AS mean_diff,
        |  round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS t_stat,
        |  round(pow(a.v / a.n + b.v / b.n, 2) /
        |    (pow(a.v / a.n, 2) / (a.n - 1) + pow(b.v / b.n, 2) / (b.n - 1)), 6) AS dof
        |FROM g a JOIN g b ON a.seg < b.seg ORDER BY seg1, seg2""".stripMargin) { (s, d) =>
      val g = customer(s, d).groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"), avg("c_acctbal").as("m"),
          var_samp("c_acctbal").as("v"))
      val a = g.select(col("seg").as("seg1"), col("n").as("n1"),
        col("m").as("m1"), col("v").as("v1"))
      val b = g.select(col("seg").as("seg2"), col("n").as("n2"),
        col("m").as("m2"), col("v").as("v2"))
      val se1 = col("v1") / col("n1")
      val se2 = col("v2") / col("n2")
      a.join(b, col("seg1") < col("seg2"))
        .select(col("seg1"), col("seg2"), col("n1"), col("n2"),
          round(col("m1") - col("m2"), 6).as("mean_diff"),
          round((col("m1") - col("m2")) / sqrt(se1 + se2), 6).as("t_stat"),
          round(pow(se1 + se2, 2) /
            (pow(se1, 2) / (col("n1") - 1) + pow(se2, 2) / (col("n2") - 1)), 6)
            .as("dof"))
        .orderBy("seg1", "seg2")
    },

    // Degree assortativity of the nation-trade graph: Pearson correlation
    // between endpoint degrees over all directed edges (each undirected
    // edge counted both ways, which makes the measure symmetric —
    // Newman 2002). Degrees come from one keyed aggregation over the
    // (materialized) sparsified edge list; the correlation is a single
    // codegen'd co-moment pass. Positive = hub-to-hub trading; negative
    // = hub-and-spoke.
    q("q_assortativity",
      s"""WITH ${CoreQueries9.edgeCtes},
        |deg AS (SELECT node, count(*) AS d FROM
        |  (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
        |s AS (SELECT a AS x, b AS y FROM e0 UNION ALL SELECT b, a FROM e0)
        |SELECT count(*)::BIGINT AS n_dir_edges,
        |  round(avg(da.d), 6) AS mean_src_degree,
        |  round(corr(da.d, db.d), 6) AS assortativity
        |FROM s JOIN deg da ON da.node = s.x JOIN deg db ON db.node = s.y""".stripMargin) { (s, d) =>
      val e0 = CoreQueries9.tradeEdges(s, d).cut()
      val deg = e0.select(col("a").as("node")).union(e0.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val sym = e0.select(col("a").as("x"), col("b").as("y"))
        .union(e0.select(col("b").as("x"), col("a").as("y")))
      sym
        .join(deg.select(col("node").as("nx"), col("deg").as("dx")), col("x") === col("nx"))
        .join(deg.select(col("node").as("ny"), col("deg").as("dy")), col("y") === col("ny"))
        .agg(count(lit(1)).as("n_dir_edges"),
          round(avg(col("dx")), 6).as("mean_src_degree"),
          round(corr(col("dx"), col("dy")), 6).as("assortativity"))
    },

    // Local clustering coefficient per node: 2·Δ(v) / (d(v)·(d(v)−1)) —
    // how close each node's neighborhood is to a clique (Watts–Strogatz).
    // Triangle corners come from the same degree-oriented enumeration as
    // q_triangle_count (each triangle counted once, wedge join driven by
    // low-degree sources); zero-triangle and degree-1 nodes surface via
    // the left join with coefficient 0. Exact-integer ratio → identical
    // IEEE division on both engines.
    q("q_clustering_coeff",
      s"""WITH ${CoreQueries9.edgeCtes},
        |deg AS (SELECT node, count(*) AS d FROM
        |  (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
        |o AS MATERIALIZED (SELECT
        |    CASE WHEN (da.d, e0.a) < (db.d, e0.b) THEN e0.a ELSE e0.b END AS src,
        |    CASE WHEN (da.d, e0.a) < (db.d, e0.b) THEN e0.b ELSE e0.a END AS dst
        |  FROM e0 JOIN deg da ON da.node = e0.a JOIN deg db ON db.node = e0.b),
        |tri AS (SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
        |  FROM o e1 JOIN o e2 ON e1.dst = e2.src
        |  JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        |tc AS (SELECT node, count(*)::BIGINT AS n_triangles FROM
        |  (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        |   UNION ALL SELECT z FROM tri) GROUP BY 1)
        |SELECT deg.node, deg.d::BIGINT AS degree,
        |  coalesce(tc.n_triangles, 0) AS n_triangles,
        |  round(CASE WHEN deg.d >= 2
        |    THEN 2.0 * coalesce(tc.n_triangles, 0) / (deg.d * (deg.d - 1))
        |    ELSE 0 END, 6) AS clustering_coeff
        |FROM deg LEFT JOIN tc ON tc.node = deg.node
        |ORDER BY deg.node""".stripMargin) { (s, d) =>
      val e0 = CoreQueries9.tradeEdges(s, d)
      val deg = e0.select(col("a").as("node")).union(e0.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val oriented = e0
        .join(deg.select(col("node").as("na"), col("d").as("da")), col("a") === col("na"))
        .join(deg.select(col("node").as("nb"), col("d").as("db")), col("b") === col("nb"))
        .select(
          when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
            .otherwise(col("b")).as("src"),
          when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
            .otherwise(col("a")).as("dst"))
        .cut() // feeds all three wedge-join sides once
      val e1 = oriented.select(col("src").as("x"), col("dst").as("y"))
      val e2 = oriented.select(col("src").as("y2"), col("dst").as("z"))
      val e3 = oriented.select(col("src").as("x3"), col("dst").as("z3"))
      val tri = e1.join(e2, col("y") === col("y2"))
        .join(e3, col("x") === col("x3") && col("z") === col("z3"))
        .select("x", "y", "z")
      val tc = tri.select(col("x").as("tnode"))
        .union(tri.select(col("y").as("tnode")))
        .union(tri.select(col("z").as("tnode")))
        .groupBy("tnode").agg(count(lit(1)).as("n_tri"))
      deg.join(tc, col("node") === col("tnode"), "left")
        .select(col("node"), col("d").as("degree"),
          coalesce(col("n_tri"), lit(0L)).as("n_triangles"),
          round(when(col("d") >= 2,
            lit(2.0) * coalesce(col("n_tri"), lit(0L)) / (col("d") * (col("d") - 1)))
            .otherwise(lit(0.0)), 6).as("clustering_coeff"))
        .orderBy("node")
    },

    // Deterministic per-group mode: the most frequent order priority per
    // status, ties broken lexicographically (Spark's native mode() keeps
    // an arbitrary tie survivor — useless under a hash-compare gate).
    // Counts collapse to the |status|×|priority|-bounded matrix first;
    // the argmax window runs over that matrix, not raw rows.
    q("q_mode_category",
      """WITH c AS (SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |    count(*) AS n FROM orders GROUP BY 1, 2),
        |t AS (SELECT status, sum(n)::BIGINT AS tot FROM c GROUP BY 1),
        |r AS (SELECT status, priority, n, row_number() OVER (
        |    PARTITION BY status ORDER BY n DESC, priority) AS rk FROM c)
        |SELECT r.status, r.priority AS mode_priority, r.n AS mode_n,
        |  round(r.n * 1.0 / t.tot, 6) AS mode_share
        |FROM r JOIN t ON t.status = r.status WHERE rk = 1
        |ORDER BY r.status""".stripMargin) { (s, d) =>
      val c = orders(s, d)
        .groupBy(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))
      val t = c.groupBy(col("status").as("tstatus")).agg(sum("n").as("tot"))
      val wR = Window.partitionBy("status").orderBy(col("n").desc, col("priority"))
      c.withColumn("rk", row_number().over(wR)).filter(col("rk") === 1)
        .join(t, col("status") === col("tstatus"))
        .select(col("status"), col("priority").as("mode_priority"),
          col("n").as("mode_n"),
          round(col("n") * lit(1.0) / col("tot"), 6).as("mode_share"))
        .orderBy("status")
    },

    // Data-quality expectation suite (the Deequ/Great-Expectations
    // shape): one row per declared constraint with checked/failed counts
    // and the verdict. Uniqueness and range/completeness checks are
    // single-pass aggregates; referential integrity rides one keyed left
    // join against the (unique-key) dimension — every check is
    // independent and the union is metadata-sized.
    q("q_dq_expectations",
      """SELECT * FROM (
        |  SELECT 'customer.custkey_unique' AS check_name, count(*) AS n_checked,
        |    (count(*) - count(DISTINCT c_custkey))::BIGINT AS n_failed,
        |    count(*) = count(DISTINCT c_custkey) AS pass FROM customer
        |  UNION ALL
        |  SELECT 'customer.mktsegment_complete', count(*),
        |    sum(CASE WHEN c_mktsegment IS NULL OR c_mktsegment = '' THEN 1 ELSE 0 END)::BIGINT,
        |    sum(CASE WHEN c_mktsegment IS NULL OR c_mktsegment = '' THEN 1 ELSE 0 END) = 0
        |  FROM customer
        |  UNION ALL
        |  SELECT 'lineitem.quantity_in_1_50', count(*),
        |    sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
        |      THEN 1 ELSE 0 END)::BIGINT,
        |    sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
        |      THEN 1 ELSE 0 END) = 0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders.custkey_in_customer', count(*),
        |    sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) = 0
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT 'orders.orderdate_in_range', count(*),
        |    sum(CASE WHEN o_orderdate IS NULL
        |      OR o_orderdate < TIMESTAMP '1992-01-01'
        |      OR o_orderdate >= TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END)::BIGINT,
        |    sum(CASE WHEN o_orderdate IS NULL
        |      OR o_orderdate < TIMESTAMP '1992-01-01'
        |      OR o_orderdate >= TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END) = 0
        |  FROM orders
        |) ORDER BY check_name""".stripMargin) { (s, d) =>
      def check(name: String, df: DataFrame, failed: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).as("n_checked"),
            sum(when(failed, 1L).otherwise(0L)).as("n_failed"))
          .select(lit(name).as("check_name"), col("n_checked"), col("n_failed"),
            (col("n_failed") === 0).as("pass"))
      val cust = customer(s, d)
      val uniq = cust
        .agg(count(lit(1)).as("n_checked"),
          (count(lit(1)) - countDistinct(col("c_custkey"))).as("n_failed"))
        .select(lit("customer.custkey_unique").as("check_name"),
          col("n_checked"), col("n_failed"), (col("n_failed") === 0).as("pass"))
      val refs = orders(s, d).join(cust.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left")
      uniq
        .union(check("customer.mktsegment_complete", cust,
          col("c_mktsegment").isNull || col("c_mktsegment") === ""))
        .union(check("lineitem.quantity_in_1_50", lineitem(s, d),
          col("l_quantity").isNull || col("l_quantity") < 1 || col("l_quantity") > 50))
        .union(check("orders.custkey_in_customer", refs, col("c_custkey").isNull))
        .union(check("orders.orderdate_in_range", orders(s, d),
          col("o_orderdate").isNull ||
            col("o_orderdate") < lit("1992-01-01").cast("timestamp") ||
            col("o_orderdate") >= lit("1999-01-01").cast("timestamp")))
        .orderBy("check_name")
    }
  )
}
