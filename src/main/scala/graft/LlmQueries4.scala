package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextAnalysis}

/** Fourth LLM-curation tranche: span-level exact-substring coverage
  * (Lee et al. 2021 dedup mass), deterministic epoch-rebalanced
  * upsampling (the materialization step after mixing weights are
  * chosen), and a hashed-feature linear quality scorer (the fastText-
  * shaped model pass, with deterministic pseudo-weights so both engines
  * replay it exactly).
  *
  * All three ride the round-5 replayable hash family (md5-int base
  * hash), so every query is oracle-checked end to end — no rows-only
  * escapes.
  */
object LlmQueries4 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Exact-substring duplication coverage (Lee et al. 2021): per doc,
    // the token mass covered by 8-token windows whose rolling hash
    // occurs >= 2 times corpus-wide. Differs from q_fingerprint_overlap
    // (pair detection) in producing the REMOVAL signal: how much of
    // each doc is duplicated text, at token granularity. Coverage of
    // the interval union telescopes to sum(min(w, pos - prev_pos))
    // under a per-doc sort because all windows share one length — a
    // single doc-keyed window pass, no interval sweep.
    q("q_exact_substr",
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
        |covrows AS (SELECT doc_id, coalesce(least(wlen, pos - lag(pos)
        |    OVER (PARTITION BY doc_id ORDER BY pos)), wlen) AS inc FROM dup),
        |cov AS (SELECT doc_id, sum(inc)::BIGINT AS dup_tok
        |  FROM covrows GROUP BY doc_id)
        |SELECT t.doc_id, len(t.tok)::BIGINT AS n_tokens,
        |  coalesce(cov.dup_tok, 0)::BIGINT AS n_dup_tokens,
        |  round(coalesce(cov.dup_tok, 0) * 1.0 / len(t.tok), 6) AS dup_coverage
        |FROM t LEFT JOIN cov ON cov.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.exactSubstrCoverage(documents(s, d), 8).orderBy("doc_id")
    },

    // Deterministic epoch-rebalanced upsampling: materialize the copy
    // count per document that rebalances every source toward the
    // largest one, capped at 4 epochs (the "repeat small high-quality
    // sources, never more than a few epochs" rule from public data-mix
    // recipes). Integer copies = floor(max_n/n_s); the fractional epoch
    // becomes a per-doc hash Bernoulli — and the acceptance test
    // (hash/1e6 < rem/n_s) cross-multiplies to pure integer arithmetic,
    // so the sampled copy set is bit-identical on any engine. The
    // corpus never shuffles: the |sources|-row epoch table broadcasts
    // onto a scan-local projection.
    q("q_mix_epochs",
      """WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |m AS (SELECT max(n_docs) AS max_n FROM s),
        |e AS (SELECT source, n_docs, max_n,
        |    least(max_n // n_docs, 4) AS base,
        |    CASE WHEN max_n // n_docs >= 4 THEN 0 ELSE max_n % n_docs END AS rem
        |  FROM s CROSS JOIN m)
        |SELECT d.doc_id, d.source,
        |  (e.base + CASE WHEN (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
        |      % 1000000) * e.n_docs < e.rem * 1000000 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_copies,
        |  round(least(e.max_n * 1.0 / e.n_docs, 4.0), 6) AS target_epochs
        |FROM documents d JOIN e USING (source)
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val src = documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
      val m = src.agg(max("n_docs").as("max_n"))
      val e = src.crossJoin(broadcast(m))
        .withColumn("fullep", floor(col("max_n") / col("n_docs")).cast("long"))
        .withColumn("base", least(col("fullep"), lit(4L)))
        .withColumn("rem", when(col("fullep") >= 4, lit(0L))
          .otherwise(col("max_n") % col("n_docs")))
      val hash6 = pmod(Dedup.md5Int(col("doc_id").cast("string")), lit(1000000L))
      documents(s, d).join(broadcast(e), "source")
        .select(col("doc_id"), col("source"),
          (col("base") + when(hash6 * col("n_docs") < col("rem") * 1000000L, 1L)
            .otherwise(0L)).as("n_copies"),
          round(least(col("max_n") * lit(1.0) / col("n_docs"), lit(4.0)), 6)
            .as("target_epochs"))
        .orderBy("doc_id")
    },

    // Hashed-feature linear quality model (the fastText-shaped scoring
    // pass of a curation pipeline): tokens hash into 64 buckets, each
    // bucket carries a deterministic pseudo-weight in [-1000, 1000]
    // derived from the same md5-int family, and the doc score is the
    // weight sum — EXACT integer arithmetic, so the keep decision
    // (score > 0) can never diverge across engines; only the sigmoid
    // display value needs round(6). One narrow explode + one doc-keyed
    // aggregation; the "model" (64 weights) is arithmetic in the hash,
    // so nothing is broadcast at all.
    q("q_quality_model",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |tw AS (SELECT doc_id, len(tok)::BIGINT AS n_tokens,
        |  list_sum([
        |    (('0x' || substr(md5('w' ||
        |        ((('0x' || substr(md5(x), 1, 8))::BIGINT) % 64)::VARCHAR
        |      ), 1, 8))::BIGINT % 2001) - 1000
        |    for x in tok])::BIGINT AS score_num
        |  FROM t)
        |SELECT doc_id, n_tokens, score_num,
        |  round(1.0 / (1.0 + exp(-(score_num / (1000.0 * n_tokens)))), 6) AS quality,
        |  score_num > 0 AS keep
        |FROM tw ORDER BY doc_id""".stripMargin) { (s, d) =>
      val bucket = pmod(Dedup.md5Int(col("tk")), lit(64L))
      val wt = pmod(Dedup.md5Int(concat(lit("w"), bucket.cast("string"))),
        lit(2001L)) - 1000L
      documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
        .select(col("doc_id"), wt.as("wt"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum("wt").as("score_num"))
        .select(col("doc_id"), col("n_tokens"), col("score_num"),
          round(lit(1.0) / (lit(1.0) +
            exp(-(col("score_num") / (lit(1000.0) * col("n_tokens"))))), 6)
            .as("quality"),
          (col("score_num") > 0).as("keep"))
        .orderBy("doc_id")
    }
  )
}
