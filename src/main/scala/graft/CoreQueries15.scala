package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Fifteenth core tranche: resampling and survival statistics — a
  * deterministic bootstrap confidence interval and the Kaplan–Meier
  * survival estimator.
  *
  * Scale shapes: the bootstrap runs all B=50 replicates in ONE
  * aggregation pass as conditional partial sums (membership is a pure
  * md5 projection — no 50× row blowup, no RNG state, map-side combine
  * all the way); Kaplan–Meier collapses the corpus to per-customer
  * durations (one keyed pass) and then to the calendar-day-bounded risk
  * table, where the at-risk suffix counts and the cumulative log-survival
  * product run as (allowlisted, ≤ a-few-thousand-row) ordered windows.
  */
object CoreQueries15 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  private val B = 50

  val all: Seq[QueryDef] = Seq(

    // Bootstrap CI for mean order value via 50 deterministic half-sample
    // replicates: replicate b keeps orders where md5(orderkey:b) is
    // even — reproducible across engines, machines, and reruns, unlike
    // RNG resampling. All 50 replicate sums/counts are conditional
    // aggregates in ONE corpus pass; the CI is the 3rd/48th order
    // statistic of the 50 rounded replicate means (≈ p5/p95), ranked by
    // (rounded mean, replicate id) so the cut is deterministic.
    q("q_bootstrap_ci", {
      val member = "('0x' || substr(md5(o.o_orderkey::VARCHAR || ':' || " +
        "u.b::VARCHAR), 1, 8))::BIGINT % 2 = 0"
      s"""WITH r AS (SELECT u.b AS b, round(sum(o.o_totalprice) / count(*), 6) AS m
         |  FROM orders o CROSS JOIN unnest(range(0, $B)) AS u(b)
         |  WHERE $member GROUP BY 1),
         |rk AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM r),
         |pe AS (SELECT round(sum(o_totalprice) / count(*), 6) AS point_est
         |  FROM orders)
         |SELECT pe.point_est,
         |  (SELECT m FROM rk WHERE rn = 3) AS ci_lo,
         |  (SELECT m FROM rk WHERE rn = ${B - 2}) AS ci_hi,
         |  $B::BIGINT AS n_replicates
         |FROM pe""".stripMargin
    }) { (s, d) =>
      def member(b: Int) = pmod(Dedup.md5Int(
        concat(col("o_orderkey").cast("string"), lit(s":$b"))), lit(2)) === 0
      // r19: the B per-replicate md5 memberships are the CPU floor —
      // widen the one-split scan so they run on every core, and
      // accumulate the money sums in DECIMAL so the result is exact and
      // partitioning-independent (the q_lake_cdc contract); the final
      // cast back to double keeps the declared schema.
      val price = col("o_totalprice").cast("decimal(28,6)")
      val aggs =
        Seq(sum(price).as("st"), count(lit(1)).as("ct")) ++
          (0 until B).flatMap { b =>
            Seq(sum(when(member(b), price)).as(s"s$b"),
              count(when(member(b), true)).as(s"c$b"))
          }
      val means = array((0 until B).map(b =>
        round(col(s"s$b").cast("double") / col(s"c$b"), 6)): _*)
      val w = Window.orderBy(col("m"), col("b"))
      Tables.widen(orders(s, d)).agg(aggs.head, aggs.tail: _*)
        .select(round(col("st").cast("double") / col("ct"), 6).as("point_est"),
          posexplode(means).as(Seq("b", "m")))
        .withColumn("rn", row_number().over(w))
        .groupBy()
        .agg(max("point_est").as("point_est"),
          min(when(col("rn") === 3, col("m"))).as("ci_lo"),
          min(when(col("rn") === B - 2, col("m"))).as("ci_hi"),
          lit(B.toLong).as("n_replicates"))
    },

    // Kaplan–Meier survival: time from a customer's first order to
    // their first URGENT order, right-censored at their last observed
    // order. One keyed pass builds per-customer (duration, event); the
    // risk table is calendar-day-bounded, so the at-risk suffix counts
    // and the cumulative Π(1 − d/n) — computed as exp of a running
    // ln-sum, clamped at 1e-12 so a fully-converting final risk set
    // can't hit ln(0) (Spark log → null, DuckDB → -inf) — are ordered
    // windows over a few thousand rows. Integer d/n ratios divide
    // identically; the sequential ln-sum matches order across engines;
    // round(6) absorbs libm ulps.
    q("q_kaplan_meier",
      """WITH per AS (SELECT o_custkey, min(o_orderdate) AS t0,
        |    min(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderdate END) AS tu,
        |    max(o_orderdate) AS tl
        |  FROM orders GROUP BY 1),
        |dur AS (SELECT CASE WHEN tu IS NOT NULL
        |      THEN date_diff('day', t0, tu) ELSE date_diff('day', t0, tl)
        |    END AS t, (tu IS NOT NULL)::INT AS ev FROM per),
        |byt AS (SELECT t, sum(ev)::BIGINT AS d, count(*) AS atall FROM dur GROUP BY 1),
        |r AS (SELECT t, d, atall,
        |    (sum(atall) OVER () - coalesce(sum(atall) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n_risk
        |  FROM byt),
        |s AS (SELECT t, d, n_risk, exp(sum(
        |      CASE WHEN d > 0 THEN ln(greatest(1 - d * 1.0 / n_risk, 0.000000000001))
        |           ELSE 0.0 END)
        |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |    AS surv FROM r)
        |SELECT t AS t_days, n_risk, d AS n_events, round(surv, 6) AS survival
        |FROM s WHERE d > 0 ORDER BY t_days""".stripMargin) { (s, d) =>
      val per = orders(s, d).groupBy("o_custkey")
        .agg(min("o_orderdate").as("t0"),
          min(when(col("o_orderpriority") === "1-URGENT", col("o_orderdate"))).as("tu"),
          max("o_orderdate").as("tl"))
      val dur = per.select(
        when(col("tu").isNotNull, datediff(col("tu"), col("t0")))
          .otherwise(datediff(col("tl"), col("t0"))).as("t"),
        col("tu").isNotNull.cast("int").as("ev"))
      val byt = dur.groupBy("t")
        .agg(sum("ev").as("d"), count(lit(1)).as("atall"))
      val wAll = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wBelow = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byt
        .withColumn("n_risk",
          sum("atall").over(wAll) - coalesce(sum("atall").over(wBelow), lit(0L)))
        .withColumn("surv", exp(sum(
          when(col("d") > 0,
            log(greatest(lit(1) - col("d") * lit(1.0) / col("n_risk"),
              lit(0.000000000001)))).otherwise(lit(0.0))).over(wCum)))
        .filter(col("d") > 0)
        .select(col("t").as("t_days"), col("n_risk"), col("d").as("n_events"),
          round(col("surv"), 6).as("survival"))
        .orderBy("t_days")
    }
  )
}
