package graft

import graft.CheckpointStrategy.Ops._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourteenth core tranche: warehouse-temporal and inference analytics —
  * SCD Type-2 dimension building, population-stability (PSI) drift
  * monitoring, frequent event paths, HITS hub/authority scoring, and a
  * chi-square independence test.
  *
  * Scale shapes: SCD2 and path mining are per-user partitioned windows
  * (high-cardinality keys — parallel at any corpus size) that collapse
  * to change rows / the |event types|³-bounded path matrix; PSI and the
  * chi-square test reduce to bucket/cell contingency tables before any
  * ratio math (1-row total broadcasts, PlanLint-allowlisted); HITS keeps
  * every unrolled round in exact integers (unweighted adjacency sums)
  * and divides only once at the end, so both engines emit bit-identical
  * scores.
  */
object CoreQueries14 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // SCD Type-2 dimension build from a change stream: collapse each
    // user's event-type runs into versioned validity intervals
    // (valid_from inclusive, valid_to = next change, NULL = current) —
    // the classic warehouse dimension historization. One lag to detect
    // change rows, one lead over the change rows to close intervals;
    // both windows partition by user. The user_id < 100 slice bounds the
    // emitted dimension and pushes to the scan.
    q("q_scd2_intervals",
      """WITH e AS (SELECT user_id, event_type, ts, event_id FROM events
        |  WHERE user_id < 100),
        |c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev FROM e),
        |v AS (SELECT user_id, event_type, ts, event_id FROM c
        |  WHERE prev IS NULL OR prev <> event_type),
        |w AS (SELECT user_id, event_type, ts AS vfrom, lead(ts) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS vto FROM v)
        |SELECT user_id, event_type,
        |  strftime(vfrom::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  coalesce(strftime(vto::TIMESTAMP, '%Y-%m-%d %H:%M:%S'), 'current')
        |    AS valid_to,
        |  vto IS NULL AS is_current
        |FROM w ORDER BY user_id, vfrom""".stripMargin) { (s, d) =>
      val wU = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val v = events(s, d).filter(col("user_id") < 100)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag("event_type", 1).over(wU))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      v.withColumn("vto", lead("ts", 1).over(wU))
        .select(col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          coalesce(date_format(col("vto"), "yyyy-MM-dd HH:mm:ss"), lit("current"))
            .as("valid_to"),
          col("vto").isNull.as("is_current"))
        .orderBy("user_id", "valid_from")
    },

    // Population stability index between 1995 and 1996 order-total
    // distributions — the standard model-monitoring drift score. Both
    // periods collapse to fixed $20k-bucket histograms (keyed
    // aggregation; date filters push to the scan); shares are clamped at
    // 1e-6 (the conventional PSI smoothing for empty cells) so the log
    // ratio is total. Integer-ratio shares → identical IEEE division;
    // round(6) absorbs libm ln ulp skew.
    q("q_psi_drift",
      """WITH a AS (SELECT CAST(floor(o_totalprice / 20000) AS BIGINT) AS bkt,
        |    count(*) AS ca FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1),
        |b AS (SELECT CAST(floor(o_totalprice / 20000) AS BIGINT) AS bkt,
        |    count(*) AS cb FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1),
        |ta AS (SELECT sum(ca)::BIGINT AS na FROM a),
        |tb AS (SELECT sum(cb)::BIGINT AS nb FROM b),
        |j AS (SELECT coalesce(a.bkt, b.bkt) AS bkt,
        |    greatest(coalesce(ca, 0) * 1.0 / na, 0.000001) AS pa,
        |    greatest(coalesce(cb, 0) * 1.0 / nb, 0.000001) AS pb,
        |    coalesce(ca, 0) AS n_a, coalesce(cb, 0) AS n_b
        |  FROM a FULL OUTER JOIN b ON a.bkt = b.bkt CROSS JOIN ta CROSS JOIN tb)
        |SELECT bkt, n_a, n_b, round(pa, 6) AS share_a, round(pb, 6) AS share_b,
        |  round((pa - pb) * ln(pa / pb), 6) AS psi_contrib
        |FROM j ORDER BY bkt""".stripMargin) { (s, d) =>
      def hist(lo: String, hi: String, cname: String) = orders(s, d)
        .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
          col("o_orderdate") < lit(hi).cast("timestamp"))
        .groupBy(floor(col("o_totalprice") / 20000).cast("long").as(s"bkt_$cname"))
        .agg(count(lit(1)).as(cname))
      val a = hist("1995-01-01", "1996-01-01", "ca")
      val b = hist("1996-01-01", "1997-01-01", "cb")
      val ta = a.agg(sum("ca").as("na"))
      val tb = b.agg(sum("cb").as("nb"))
      val pa = greatest(coalesce(col("ca"), lit(0)) * lit(1.0) / col("na"), lit(0.000001))
      val pb = greatest(coalesce(col("cb"), lit(0)) * lit(1.0) / col("nb"), lit(0.000001))
      a.join(b, col("bkt_ca") === col("bkt_cb"), "full_outer")
        .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
        .select(coalesce(col("bkt_ca"), col("bkt_cb")).as("bkt"),
          coalesce(col("ca"), lit(0L)).as("n_a"),
          coalesce(col("cb"), lit(0L)).as("n_b"),
          round(pa, 6).as("share_a"), round(pb, 6).as("share_b"),
          round((pa - pb) * log(pa / pb), 6).as("psi_contrib"))
        .orderBy("bkt")
    },

    // Top-20 three-step event paths (clickstream sequence mining, the
    // n-gram extension of q_markov_transitions' one-step matrix). Two
    // leads over one per-user window; the global count collapses to the
    // |event types|³-bounded path table before the deterministic
    // rounded... integer-count top-k cut (count desc, then path).
    q("q_event_paths",
      """WITH p AS (SELECT event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3, count(*) AS n_paths FROM p WHERE e3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n_paths DESC, e1, e2, e3 LIMIT 20""".stripMargin) { (s, d) =>
      val wU = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(col("event_type").as("e1"),
          lead("event_type", 1).over(wU).as("e2"),
          lead("event_type", 2).over(wU).as("e3"))
        .filter(col("e3").isNotNull)
        .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n_paths"))
        .orderBy(col("n_paths").desc, col("e1"), col("e2"), col("e3"))
        .limit(20)
    },

    // HITS hub/authority scores on the DIRECTED supplier→customer nation
    // graph (Kleinberg): two unrolled mutual-reinforcement rounds. Every
    // round is an equi-join + keyed sum over EXACT integers (unweighted
    // adjacency, so round-k scores are path counts); normalization
    // happens exactly once at the end against 1-row L1 totals — the
    // only float step, identical operands on both engines. Sparsified
    // edge list is materialized once (localCheckpoint / MATERIALIZED).
    q("q_hits",
      """WITH ed AS MATERIALIZED (SELECT s.s_nationkey::INT AS src,
        |    c.c_nationkey::INT AS dst, count(*) AS cnt
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_nationkey <> c.c_nationkey GROUP BY 1, 2),
        |e AS MATERIALIZED (SELECT src, dst FROM ed
        |  WHERE cnt > (SELECT avg(cnt) FROM ed)),
        |a1 AS (SELECT dst AS node, count(*)::BIGINT AS a FROM e GROUP BY 1),
        |h1 AS (SELECT e.src AS node, sum(a1.a)::BIGINT AS h
        |  FROM e JOIN a1 ON a1.node = e.dst GROUP BY 1),
        |a2 AS (SELECT e.dst AS node, sum(h1.h)::BIGINT AS a
        |  FROM e JOIN h1 ON h1.node = e.src GROUP BY 1),
        |h2 AS (SELECT e.src AS node, sum(a2.a)::BIGINT AS h
        |  FROM e JOIN a2 ON a2.node = e.dst GROUP BY 1)
        |SELECT coalesce(h2.node, a2.node) AS node,
        |  round(coalesce(h2.h, 0) * 1.0 / (SELECT sum(h) FROM h2), 6) AS hub,
        |  round(coalesce(a2.a, 0) * 1.0 / (SELECT sum(a) FROM a2), 6) AS authority
        |FROM h2 FULL OUTER JOIN a2 ON a2.node = h2.node
        |ORDER BY node""".stripMargin) { (s, d) =>
      val ed = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d).select(col("c_custkey"), col("c_nationkey").as("cn")),
          col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d).select(col("s_suppkey"), col("s_nationkey").as("sn")),
          col("l_suppkey") === col("s_suppkey"))
        .filter(col("sn") =!= col("cn"))
        .groupBy(col("sn").cast("int").as("src"), col("cn").cast("int").as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .cut()
      val e = ed.crossJoin(broadcast(ed.agg(avg("cnt").as("avgc"))))
        .filter(col("cnt") > col("avgc")).select("src", "dst")
        .cut()
      val a1 = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("a"))
      val h1 = e.join(a1, col("dst") === col("node"))
        .groupBy(col("src").as("node2")).agg(sum("a").as("h"))
      val a2 = e.join(h1, col("src") === col("node2"))
        .groupBy(col("dst").as("node3")).agg(sum("h").as("a3"))
      val h2 = e.join(a2, col("dst") === col("node3"))
        .groupBy(col("src").as("node4")).agg(sum("a3").as("h4"))
      h2.join(a2, col("node4") === col("node3"), "full_outer")
        .crossJoin(broadcast(h2.agg(sum("h4").as("hsum"))))
        .crossJoin(broadcast(a2.agg(sum("a3").as("asum"))))
        .select(coalesce(col("node4"), col("node3")).as("node"),
          round(coalesce(col("h4"), lit(0L)) * lit(1.0) / col("hsum"), 6).as("hub"),
          round(coalesce(col("a3"), lit(0L)) * lit(1.0) / col("asum"), 6).as("authority"))
        .orderBy("node")
    },

    // Chi-square test of independence between market segment and
    // urgent-order conversion: the full observed/expected contingency
    // table with per-cell χ² contributions. One keyed pass flags each
    // customer (left join keeps non-buyers as non-converted), the table
    // collapses to |segments|×2 cells, and expecteds come from bounded
    // row/column marginals plus a 1-row total.
    q("q_chisq_conversion",
      """WITH f AS (SELECT c.c_mktsegment AS seg, c.c_custkey,
        |    max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS conv
        |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |o AS (SELECT seg, conv, count(*) AS observed FROM f GROUP BY 1, 2),
        |rt AS (SELECT seg, sum(observed)::BIGINT AS rtot FROM o GROUP BY 1),
        |ct AS (SELECT conv, sum(observed)::BIGINT AS ctot FROM o GROUP BY 1),
        |n AS (SELECT sum(observed)::BIGINT AS n FROM o)
        |SELECT o.seg, o.conv, o.observed,
        |  round(rt.rtot * ct.ctot * 1.0 / n.n, 6) AS expected,
        |  round(pow(o.observed - rt.rtot * ct.ctot * 1.0 / n.n, 2)
        |    / (rt.rtot * ct.ctot * 1.0 / n.n), 6) AS chi2_contrib
        |FROM o JOIN rt ON rt.seg = o.seg JOIN ct ON ct.conv = o.conv CROSS JOIN n
        |ORDER BY o.seg, o.conv""".stripMargin) { (s, d) =>
      val f = customer(s, d)
        .join(orders(s, d), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
        .agg(max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("conv"))
      val o = f.groupBy("seg", "conv").agg(count(lit(1)).as("observed"))
      val rt = o.groupBy(col("seg").as("rseg")).agg(sum("observed").as("rtot"))
      val ct = o.groupBy(col("conv").as("cconv")).agg(sum("observed").as("ctot"))
      val n = o.agg(sum("observed").as("n"))
      val exp = col("rtot") * col("ctot") * lit(1.0) / col("n")
      o.join(broadcast(rt), col("seg") === col("rseg"))
        .join(broadcast(ct), col("conv") === col("cconv"))
        .crossJoin(broadcast(n))
        .select(col("seg"), col("conv"), col("observed"),
          round(exp, 6).as("expected"),
          round(pow(col("observed") - exp, 2) / exp, 6).as("chi2_contrib"))
        .orderBy("seg", "conv")
    }
  )
}
