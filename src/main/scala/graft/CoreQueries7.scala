package graft

import graft.CheckpointStrategy.Ops._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventh core tranche: distributed sketch ALGEBRA — the property that
  * makes approximate aggregation scale is not the estimate but the MERGE:
  * bounded per-partition/per-group state that composes associatively, so
  * a 1000-executor job ships k-sized sketches instead of raw keys.
  * Two variants: KMV (merge = re-min of unioned hash sets — deterministic
  * integer math the oracle replays exactly) and HLL (Spark's datasketches
  * registers — merge checked under the tolerance-boolean contract).
  */
object CoreQueries7 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  private val K = 256
  private val Scale = (K - 1) * 4294967296.0 // (k-1)·2^32 over the md5-int range

  val all: Seq[QueryDef] = Seq(

    // KMV sketch merge: per-group k-minimum-values sketches over the
    // replayable md5-int hash, then a GLOBAL estimate computed from the
    // group sketches ALONE (k·groups rows — never the raw keys). The
    // union of k-min sets re-minned is exactly the k-min of the union,
    // so the merged estimate is the estimate of the merged stream: the
    // associativity that lets sketches flow up a 1000-executor tree.
    // The global top-k is sort+limit (TakeOrderedAndProject), not an
    // unpartitioned window.
    q("q_kmv_union",
      s"""WITH h AS (SELECT DISTINCT l_returnflag,
         |  ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 8))::BIGINT AS hv
         |  FROM lineitem),
         |r AS (SELECT l_returnflag, hv,
         |  row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rk FROM h),
         |sk AS (SELECT l_returnflag, hv FROM r WHERE rk <= $K),
         |per AS (SELECT l_returnflag AS scope,
         |    CAST(floor($Scale / max(hv)) AS BIGINT) AS kmv_estimate,
         |    count(*) AS k_used
         |  FROM sk GROUP BY l_returnflag),
         |merged AS (SELECT DISTINCT hv FROM sk ORDER BY hv LIMIT $K)
         |SELECT scope, kmv_estimate, k_used FROM per
         |UNION ALL
         |SELECT 'ALL', CAST(floor($Scale / max(hv)) AS BIGINT), count(*)
         |FROM merged ORDER BY scope""".stripMargin) { (s, d) =>
      val h = lineitem(s, d)
        .select(col("l_returnflag"),
          graft.llm.Dedup.md5Int(col("l_orderkey").cast("string")).as("hv"))
        .distinct()
      val w = Window.partitionBy("l_returnflag").orderBy("hv")
      // The per-group sketches: k·|groups| rows — everything downstream
      // (including the merge) reads ONLY this bounded set. Materialized
      // once: without it the union's two branches would each re-run the
      // corpus scan; with it the raw keys are read exactly once.
      val sk = h.withColumn("rk", row_number().over(w)).filter(col("rk") <= K)
        .select("l_returnflag", "hv")
        .cut()
      def estimate(df: DataFrame) =
        df.agg(floor(lit(Scale) / max("hv")).cast("long").as("kmv_estimate"),
          count(lit(1)).as("k_used"))
      val per = sk.groupBy(col("l_returnflag").as("scope"))
        .agg(floor(lit(Scale) / max("hv")).cast("long").as("kmv_estimate"),
          count(lit(1)).as("k_used"))
      val merged = estimate(sk.select("hv").distinct().orderBy("hv").limit(K))
        .select(lit("ALL").as("scope"), col("kmv_estimate"), col("k_used"))
      per.union(merged).orderBy("scope")
    },

    // HLL sketch merge via Spark's datasketches registers: per-group
    // sketches unioned into a corpus estimate. HLL internals can't
    // hash-match another engine, so this rides the tolerance-boolean
    // contract (q_approx_distinct's): Spark emits the EXACT count and
    // whether each estimate — including the merged one — lands within
    // 5%; the oracle emits exact and TRUE.
    q("q_hll_union",
      """SELECT l_returnflag AS scope,
        |  count(DISTINCT l_partkey) AS exact_cnt, TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL
        |SELECT 'ALL', count(DISTINCT l_partkey), TRUE FROM lineitem
        |ORDER BY scope""".stripMargin) { (s, d) =>
      val li = lineitem(s, d)
      val sk = li.groupBy("l_returnflag")
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"),
          count_distinct(col("l_partkey")).as("exact_cnt"))
      def tol(est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
        (abs(est - exact) / exact <= 0.05).as("within_tol")
      val per = sk.select(col("l_returnflag").as("scope"), col("exact_cnt"),
        tol(hll_sketch_estimate(col("sk")), col("exact_cnt")))
      val merged = sk.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .crossJoin(broadcast(li.agg(count_distinct(col("l_partkey")).as("exact_cnt"))))
        .select(lit("ALL").as("scope"), col("exact_cnt"),
          tol(col("est"), col("exact_cnt")))
      per.union(merged).orderBy("scope")
    },

    // Versioned-lake DML through the CORRECTNESS board: DELETE + UPDATE
    // run through the copy-on-write commit protocol (only files
    // containing hits rewrite — file pruning via _metadata.file_path),
    // then the final snapshot is compared relationally against the
    // oracle's CASE/WHERE equivalent. The timed cost is the honest DML
    // path: stage → log commit → prune → rewrite → snapshot read.
    q("q_lake_dml",
      """SELECT c_custkey,
        |  CASE WHEN c_mktsegment = 'BUILDING' AND c_acctbal > 5000
        |       THEN 'PROMOTED' ELSE c_mktsegment END AS segment,
        |  c_nationkey
        |FROM customer WHERE c_acctbal >= 0
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val dir = graft.lake.Scratch.dir("graft-vt-dml") + "/t"
      val t = graft.lake.VersionedTable(s, dir)
      t.commitOverwrite(customer(s, d))
      t.delete(col("c_acctbal") < 0)
      t.update(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 5000,
        Map("c_mktsegment" -> lit("PROMOTED")))
      t.read()
        .select(col("c_custkey"), col("c_mktsegment").as("segment"),
          col("c_nationkey"))
        .orderBy("c_custkey")
    },

    // Incrementally-maintained aggregate through the CORRECTNESS board:
    // three disjoint event slices fold into the versioned state table
    // ([[graft.lake.IncrementalAgg]] — algebraic sum/count/min/max
    // partials, avg finalized at read), then the final snapshot is
    // compared against the oracle's one-shot aggregate over the full
    // table. What's proven: fold(b1)∘fold(b2)∘fold(b3) ≡ agg(b1∪b2∪b3)
    // CROSS-ENGINE, through real commit I/O — the monoid property that
    // makes a 100 TB fact stream summarizable without recomputing
    // history. Slices split on pmod(event_id, 3) so every row lands in
    // exactly one batch regardless of value distribution.
    q("q_lake_incr_agg",
      """SELECT strftime(date_trunc('day', ts::TIMESTAMP), '%Y-%m-%d') AS day,
        |  event_type, count(*) AS n, round(sum(value), 6) AS vsum,
        |  round(min(value), 6) AS vmin, round(max(value), 6) AS vmax,
        |  round(sum(value) / count(*), 6) AS vavg
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val dir = graft.lake.Scratch.dir("graft-incr-agg") + "/t"
      val ev = events(s, d).select(col("event_id"),
        date_trunc("day", col("ts")).as("day"),
        col("event_type"), col("value"))
      (0 until 3).foreach { i =>
        graft.lake.IncrementalAgg.update(s, dir,
          ev.filter(pmod(col("event_id"), lit(3)) === i),
          col("day"), col("event_type"), col("value"))
      }
      graft.lake.IncrementalAgg
        .finalize(graft.lake.VersionedTable(s, dir).read())
        .select(date_format(col("bucket"), "yyyy-MM-dd").as("day"),
          col("key").as("event_type"), col("n"),
          round(col("vsum"), 6).as("vsum"), round(col("vmin"), 6).as("vmin"),
          round(col("vmax"), 6).as("vmax"), round(col("vavg"), 6).as("vavg"))
        .orderBy("day", "event_type")
    }
  )
}
