package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Sixteenth core tranche (round 9): relative-rank window functions and
  * the longest-duplicated-span analysis built on the positional
  * rolling-hash windows.
  */
object CoreQueries16 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Relative-rank windows: percent_rank + cume_dist per group under a
    // deterministic total order (unique-key tiebreak, so tie handling
    // can never diverge cross-engine). Partitioned on a real key —
    // scales as one keyed sort, no global window.
    q("q_percent_rank",
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
      lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    },

    // Longest duplicated span per document (the memorization-risk deep
    // cut on top of q_exact_substr's coverage mass): duplicated 8-token
    // windows merge into maximal spans whenever they overlap or touch
    // (gap ≤ wlen under a per-doc sort — a running-sum island pass, no
    // interval materialization), and the doc reports its span count and
    // longest span in tokens. Same replayable hash family end to end.
    q("q_longest_dup_span",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |h AS (SELECT doc_id, len(tok) AS n,
        |  [('0x' || substr(md5(x), 1, 8))::BIGINT % 1000000007 for x in tok] AS th
        |  FROM t),
        |w AS (SELECT doc_id, n,
        |  CASE WHEN n >= 8
        |    THEN [list_reduce(th[i+1:i+8], (acc, x) -> (acc*131 + x) % 1000000007)
        |          for i in range(0, n - 7)]
        |    ELSE [list_reduce(th, (acc, x) -> (acc*131 + x) % 1000000007)]
        |  END AS wh,
        |  CASE WHEN n >= 8 THEN 8 ELSE n END AS wlen FROM h),
        |e AS MATERIALIZED (SELECT doc_id, wlen, i AS pos, wh[i+1] AS fp
        |  FROM w, unnest(range(0, len(wh))) AS u(i)),
        |occ AS (SELECT fp, count(*) AS occ FROM e GROUP BY 1),
        |dup AS (SELECT e.doc_id, e.pos, e.wlen
        |  FROM e JOIN occ USING (fp) WHERE occ.occ >= 2),
        |d2 AS (SELECT doc_id, pos, wlen,
        |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > wlen
        |       THEN 1 ELSE 0 END AS brk FROM dup),
        |isl AS (SELECT doc_id, pos, wlen,
        |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS UNBOUNDED PRECEDING) AS grp FROM d2),
        |sp AS (SELECT doc_id, grp,
        |  max(pos) - min(pos) + max(wlen) AS span FROM isl GROUP BY 1, 2),
        |agg AS (SELECT doc_id, count(*)::BIGINT AS n_spans,
        |  max(span)::BIGINT AS longest_span FROM sp GROUP BY 1)
        |SELECT t.doc_id, coalesce(agg.n_spans, 0)::BIGINT AS n_spans,
        |  coalesce(agg.longest_span, 0)::BIGINT AS longest_span
        |FROM t LEFT JOIN agg ON agg.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      val rows = TextAnalysis.windowHashPositions(documents(s, d), 8)
      val occ = rows.groupBy("fp").agg(count(lit(1)).as("occ"))
      val dup = rows.join(occ, "fp").filter(col("occ") >= 2)
        .select("doc_id", "pos", "wlen")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val brk = when(col("pos") - lag(col("pos"), 1).over(w) > col("wlen"), 1L)
        .otherwise(0L)
      val islands = dup.withColumn("brk", brk)
        .withColumn("grp", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("doc_id", "grp")
        .agg((max("pos") - min("pos") + max("wlen")).as("span"))
      val agg = islands.groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"), max("span").as("longest_span"))
      documents(s, d).select("doc_id")
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("longest_span"), lit(0L)).as("longest_span"))
        .orderBy("doc_id")
    }
  )
}
