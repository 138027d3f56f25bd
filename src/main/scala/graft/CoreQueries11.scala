package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eleventh core tranche: marketing-attribution credit assignment —
  * first-touch, last-touch, and linear models over the `events` stream
  * (reference scope: the per-user event analytics of `main.py`'s events
  * table, extended to the credit-assignment shapes every growth /
  * campaign pipeline runs).
  *
  * Shared shape: conversions (purchases) join their candidate touches
  * (click/view/signup within a 7-day lookback) per user. The join is an
  * equi-join on `user_id` with a bounded time-range residual — per-user
  * event counts are bounded in any real event stream, so the keyed
  * shuffle dominates and no pair blowup exists. Credit picking is a
  * `row_number` window PARTITIONed BY the high-cardinality conversion id
  * (first/last) or a conv-keyed count window (linear) — never an
  * unpartitioned window. All three models aggregate to (conversion day,
  * channel), so the output is stable and the oracle compare is exact.
  */
object CoreQueries11 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  /** 7 days in microseconds. */
  private val LookbackUs = 604800000000L

  /** Candidate (conversion, touch) pairs: every click/view/signup by the
    * converting user in the 7 days up to and including the purchase.
    * Conversions with no in-window touch drop out (standard attribution
    * semantics: unattributable conversions get no credit row).
    */
  private def touchCandidates(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"),
        unix_micros(col("ts")).as("conv_t"))
    val touch = ev.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("event_id").as("touch_id"), col("user_id").as("touch_uid"),
        col("event_type").as("channel"), unix_micros(col("ts")).as("touch_t"))
    conv.join(touch,
        col("touch_uid") === col("user_id") &&
          col("touch_t") <= col("conv_t") &&
          col("touch_t") > col("conv_t") - LookbackUs)
      .select("conv_id", "conv_t", "channel", "touch_t", "touch_id")
  }

  /** The same candidate set as DuckDB CTEs (`cand`), shared by all three
    * oracles. MATERIALIZED where referenced more than once downstream —
    * DuckDB inlines plain CTEs per reference. */
  private val candCtes: String =
    s"""conv AS (SELECT event_id AS conv_id, user_id, epoch_us(ts::TIMESTAMP) AS conv_t
       |  FROM events WHERE event_type = 'purchase'),
       |touch AS (SELECT event_id AS touch_id, user_id, event_type AS channel,
       |    epoch_us(ts::TIMESTAMP) AS touch_t
       |  FROM events WHERE event_type IN ('click','view','signup')),
       |cand AS MATERIALIZED (SELECT c.conv_id, c.conv_t, t.channel, t.touch_t, t.touch_id
       |  FROM conv c JOIN touch t ON t.user_id = c.user_id
       |   AND t.touch_t <= c.conv_t AND t.touch_t > c.conv_t - $LookbackUs)""".stripMargin

  /** First/last-touch share one plan: rank the candidate touches per
    * conversion and credit the rank-1 channel. `descending` flips the
    * rank order for last-touch. Ties on timestamp break by touch id so
    * both engines pick the same row. */
  private def touchRank(s: SparkSession, d: String, descending: Boolean): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy(
      (if (descending) Seq(col("touch_t").desc, col("touch_id").desc)
       else Seq(col("touch_t").asc, col("touch_id").asc)): _*)
    touchCandidates(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(date_format(timestamp_micros(col("conv_t")), "yyyy-MM-dd").as("conv_day"),
        col("channel"))
      .agg(count(lit(1)).as("conversions"))
      .orderBy("conv_day", "channel")
  }

  private def rankOracle(order: String): String =
    s"""WITH $candCtes,
       |r AS (SELECT conv_id, conv_t, channel,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY $order) AS rn
       |  FROM cand)
       |SELECT strftime(make_timestamp(conv_t), '%Y-%m-%d') AS conv_day, channel,
       |  count(*)::BIGINT AS conversions
       |FROM r WHERE rn = 1 GROUP BY 1, 2 ORDER BY conv_day, channel""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // First-touch: the earliest in-window touch gets the whole credit.
    q("q_attrib_first", rankOracle("touch_t, touch_id")) { (s, d) =>
      touchRank(s, d, descending = false)
    },

    // Last-touch: the latest touch at-or-before the conversion wins.
    q("q_attrib_last", rankOracle("touch_t DESC, touch_id DESC")) { (s, d) =>
      touchRank(s, d, descending = true)
    },

    // Linear: every in-window touch shares the conversion equally
    // (1/n each). The per-conversion touch count is a count window over
    // the conv key — one keyed shuffle, no self-join — and the fractional
    // credits aggregate per (day, channel). round(6) absorbs the
    // engines' double-accumulation order.
    q("q_attrib_linear",
      s"""WITH $candCtes,
         |n AS (SELECT conv_id, count(*) AS n FROM cand GROUP BY conv_id)
         |SELECT strftime(make_timestamp(c.conv_t), '%Y-%m-%d') AS conv_day,
         |  c.channel,
         |  round(sum(1.0 / n.n), 6) AS credit,
         |  count(*)::BIGINT AS touches
         |FROM cand c JOIN n ON n.conv_id = c.conv_id
         |GROUP BY 1, 2 ORDER BY conv_day, channel""".stripMargin) { (s, d) =>
      val wN = Window.partitionBy("conv_id")
      touchCandidates(s, d)
        .withColumn("n", count(lit(1)).over(wN))
        .groupBy(date_format(timestamp_micros(col("conv_t")), "yyyy-MM-dd").as("conv_day"),
          col("channel"))
        .agg(round(sum(lit(1.0) / col("n")), 6).as("credit"),
          count(lit(1)).as("touches"))
        .orderBy("conv_day", "channel")
    },
  )
}
