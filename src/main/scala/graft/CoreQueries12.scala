package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StringSimilarity
import graft.llm.Dedup

/** Twelfth core tranche: record linkage and robust/diagnostic statistics
  * — blocked Jaro–Winkler entity matching, autocorrelation of the daily
  * revenue series, median/MAD robust outlier gating, weighted sampling
  * without replacement (Efraimidis–Spirakis), and Benford first-digit
  * profiling.
  *
  * Scale shapes: the linkage pair set comes from an equi-join on a
  * blocking key (constant block size ⇒ pair count linear in the data,
  * keyed shuffle — never all-pairs); the ACF and Benford scaffolds are
  * calendar/digit-bounded 1-row or few-row broadcasts over aggregates;
  * MAD's two median passes broadcast the month×flag-bounded group table
  * back against the facts; weighted sampling is a rank-filtered window
  * whose per-partition limit Spark pushes map-side (WindowGroupLimit),
  * with a deterministic md5-derived uniform so both engines replay it.
  */
object CoreQueries12 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Blocked record linkage with the native Jaro–Winkler expression
    // (JaroWinklerExpr — Spark ships only levenshtein/soundex): pairs are
    // generated per consecutive-id block of 100 (the classic census
    // blocking setup: candidate pairs share a cheap key; JW then scores
    // digit-level typos/transpositions). Per block: pair count, strong
    // matches, and the argmax pair via a block-keyed row_number — one
    // window pass over the pair set, no re-read. The 0.985 threshold
    // sits mid-gap between the fixture's discrete similarity levels
    // (0.9889 / 0.9778), so the cut is float-robust on both engines.
    q("q_jaro_linkage",
      """WITH c AS (SELECT c_custkey, c_name, c_custkey // 100 AS blk FROM customer),
        |p AS (SELECT a.blk AS blk, a.c_custkey AS id1, b.c_custkey AS id2,
        |    jaro_winkler_similarity(a.c_name, b.c_name) AS jw
        |  FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey),
        |r AS (SELECT blk, id1, id2, jw, row_number() OVER (PARTITION BY blk
        |    ORDER BY round(jw, 6) DESC, id1, id2) AS rk FROM p)
        |SELECT blk, count(*) AS n_pairs,
        |  sum(CASE WHEN jw >= 0.985 THEN 1 ELSE 0 END)::BIGINT AS n_strong,
        |  round(max(jw), 6) AS best_jw,
        |  max(CASE WHEN rk = 1 THEN id1 END) AS best_id1,
        |  max(CASE WHEN rk = 1 THEN id2 END) AS best_id2
        |FROM r GROUP BY blk ORDER BY blk""".stripMargin) { (s, d) =>
      val c = customer(s, d).select(col("c_custkey"), col("c_name"),
        expr("CAST(c_custkey DIV 100 AS BIGINT)").as("blk"))
      val pairs = c.as("a").join(c.as("b"),
          col("a.blk") === col("b.blk") && col("a.c_custkey") < col("b.c_custkey"))
        .select(col("a.blk").as("blk"), col("a.c_custkey").as("id1"),
          col("b.c_custkey").as("id2"),
          StringSimilarity.jaroWinkler(col("a.c_name"), col("b.c_name")).as("jw"))
      val w = Window.partitionBy("blk")
        .orderBy(round(col("jw"), 6).desc, col("id1"), col("id2"))
      pairs.withColumn("rk", row_number().over(w))
        .groupBy("blk")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("jw") >= 0.985, 1L).otherwise(0L)).as("n_strong"),
          round(max(col("jw")), 6).as("best_jw"),
          max(when(col("rk") === 1, col("id1"))).as("best_id1"),
          max(when(col("rk") === 1, col("id2"))).as("best_id2"))
        .orderBy("blk")
    },

    // Autocorrelation of the daily revenue series at lags 1/2/3/7: the
    // seasonality diagnostic behind every forecasting pipeline. The
    // corpus collapses to the calendar-bounded daily aggregate FIRST;
    // the lag scaffold is a 4-row broadcast over that aggregate and the
    // shifted join is an equi-join on the lagged day — no window over
    // raw rows, no unpartitioned sort. Daily sums of 2-decimal prices
    // round to 2 (exact-safe); corr rounds to 6 per the registry's
    // accumulation-order convention.
    q("q_autocorr",
      """WITH daily AS (SELECT o_orderdate::DATE AS day,
        |    round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1),
        |lags AS (SELECT unnest([1, 2, 3, 7]) AS lag),
        |pairs AS (SELECT l.lag AS lag, a.rev AS x, b.rev AS y
        |  FROM lags l JOIN daily a ON true JOIN daily b ON b.day = a.day + l.lag)
        |SELECT lag, count(*) AS n_pairs, round(corr(x, y), 6) AS acf
        |FROM pairs GROUP BY lag ORDER BY lag""".stripMargin) { (s, d) =>
      import s.implicits._
      val daily = orders(s, d).groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(round(sum("o_totalprice"), 2).as("rev"))
      val lags = Seq(1, 2, 3, 7).toDF("lag")
      val shifted = daily.crossJoin(broadcast(lags))
        .select(col("lag"), date_add(col("day"), col("lag")).as("day2"),
          col("rev").as("x"))
      shifted.join(daily.select(col("day").as("day2"), col("rev").as("y")), "day2")
        .groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"), round(corr("x", "y"), 6).as("acf"))
        .orderBy("lag")
    },

    // Robust outlier gating: per (ship month × return flag), median and
    // MAD of l_quantity, plus the count beyond 1.5·MAD. Two median
    // passes (group medians, then medians of absolute deviations) with
    // the month×flag-bounded group tables broadcast back against the
    // facts — keyed aggregation only, no windows. l_quantity is
    // integer-valued, so medians land on k or k+.5, deviations and the
    // 1.5·MAD threshold are exact doubles, and the outlier comparison is
    // bit-deterministic on both engines (no rounding epsilon anywhere).
    q("q_mad_robust",
      """WITH g AS (SELECT date_trunc('month', l_shipdate) AS mon,
        |    l_returnflag AS rf, l_quantity AS qty FROM lineitem),
        |med AS (SELECT mon, rf, quantile_cont(qty, 0.5) AS med FROM g GROUP BY 1, 2),
        |dev AS MATERIALIZED (SELECT g.mon, g.rf, m.med,
        |    abs(g.qty - m.med) AS ad
        |  FROM g JOIN med m ON g.mon = m.mon AND g.rf = m.rf),
        |mad AS (SELECT mon, rf, quantile_cont(ad, 0.5) AS mad
        |  FROM dev GROUP BY 1, 2)
        |SELECT strftime(d.mon, '%Y-%m-%d') AS mon, d.rf AS l_returnflag,
        |  count(*) AS n, min(d.med) AS med_qty, min(m.mad) AS mad_qty,
        |  sum(CASE WHEN d.ad > 1.5 * m.mad THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM dev d JOIN mad m ON d.mon = m.mon AND d.rf = m.rf
        |GROUP BY d.mon, d.rf ORDER BY mon, l_returnflag""".stripMargin) { (s, d) =>
      // r19 tried Tables.widen by (mon, rf) here; the driver's cold-JVM
      // PERF measured it 0.77× (1.17→1.51 s) even though a warm
      // same-order A/B said keep — shuffling the raw projection costs
      // more than the parallelism returns (the same mechanism that
      // killed the shingle widens). REVERTED r20; do not re-try blind.
      val g = lineitem(s, d).select(trunc(col("l_shipdate"), "month").as("mon"),
        col("l_returnflag").as("rf"), col("l_quantity").as("qty"))
      val med = g.groupBy("mon", "rf").agg(expr("percentile(qty, 0.5D)").as("med"))
      val dev = g.join(broadcast(med), Seq("mon", "rf"))
        .withColumn("ad", abs(col("qty") - col("med")))
      val mad = dev.groupBy("mon", "rf").agg(expr("percentile(ad, 0.5D)").as("mad"))
      dev.join(broadcast(mad), Seq("mon", "rf"))
        .groupBy("mon", "rf")
        .agg(count(lit(1)).as("n"), min("med").as("med_qty"),
          min("mad").as("mad_qty"),
          sum(when(col("ad") > lit(1.5) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .select(date_format(col("mon"), "yyyy-MM-dd").as("mon"),
          col("rf").as("l_returnflag"), col("n"), col("med_qty"),
          col("mad_qty"), col("n_outliers"))
        .orderBy("mon", "l_returnflag")
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // top-10 docs per source by key u^(1/w), w = n_chars, u a
    // deterministic md5-derived uniform in (0, 1] — the standard way to
    // draw a length-weighted training subset reproducibly (rand() would
    // diverge across engines AND across retries of a failed task). The
    // rank filter lets Spark push a per-partition WindowGroupLimit, so
    // each input partition forwards ≤10 rows per source to the shuffle.
    // Key gaps between distinct docs (≥2⁻³²·(1/w)) dwarf pow's 1-ulp
    // libm divergence, so ranking is stable across engines.
    q("q_sample_weighted",
      """WITH k AS (SELECT doc_id, source, n_chars,
        |    pow((('0x' || substr(md5('ws:' || doc_id::VARCHAR), 1, 8))::BIGINT + 1)
        |        / 4294967296.0, 1.0 / n_chars) AS key
        |  FROM documents),
        |r AS (SELECT doc_id, source, n_chars, key, row_number() OVER (
        |    PARTITION BY source ORDER BY key DESC, doc_id) AS rk FROM k)
        |SELECT source, rk, doc_id, n_chars, round(key, 9) AS key
        |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin) { (s, d) =>
      val u = (Dedup.md5Int(concat(lit("ws:"), col("doc_id").cast("string"))) + 1) /
        lit(4294967296.0)
      val w = Window.partitionBy("source").orderBy(col("key").desc, col("doc_id"))
      documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          pow(u, lit(1.0) / col("n_chars")).as("key"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("source"), col("rk"), col("doc_id"), col("n_chars"),
          round(col("key"), 9).as("key"))
        .orderBy("source", "rk")
    },

    // Benford first-significant-digit profile of order totals — the
    // fraud/data-quality screen. The leading digit comes from the
    // engines' shared shortest-roundtrip double formatting (every
    // o_totalprice is ≥ 1, so the first character is always a digit —
    // no log10/pow floor at exact powers of ten, which is the classic
    // cross-libm trap). Digit-bounded aggregate + 1-row total broadcast.
    q("q_benford",
      """WITH c AS (SELECT CAST(substr(o_totalprice::VARCHAR, 1, 1) AS INT) AS digit,
        |    count(*) AS n FROM orders GROUP BY 1),
        |tot AS (SELECT sum(n)::BIGINT AS total FROM c)
        |SELECT digit, n, round(n * 1.0 / total, 6) AS pct,
        |  round(log10(1 + 1.0 / digit), 6) AS benford_pct,
        |  round(abs(n * 1.0 / total - log10(1 + 1.0 / digit)), 6) AS abs_dev
        |FROM c CROSS JOIN tot ORDER BY digit""".stripMargin) { (s, d) =>
      val c = orders(s, d)
        .groupBy(substring(col("o_totalprice").cast("string"), 1, 1).cast("int")
          .as("digit"))
        .agg(count(lit(1)).as("n"))
      c.crossJoin(broadcast(c.agg(sum("n").as("total"))))
        .select(col("digit"), col("n"),
          round(col("n") * lit(1.0) / col("total"), 6).as("pct"),
          round(log10(lit(1) + lit(1.0) / col("digit")), 6).as("benford_pct"),
          round(abs(col("n") * lit(1.0) / col("total") -
            log10(lit(1) + lit(1.0) / col("digit"))), 6).as("abs_dev"))
        .orderBy("digit")
    }
  )
}
