package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Sixth LLM-curation tranche (round 10): self-evaluation and tuning
  * surfaces for the dedup suite — banding recall audited against exact
  * Jaccard ground truth on a fixed sample (the dedup sibling of
  * q_ann_recall), the threshold operating curve a pipeline sweeps
  * before committing to a Jaccard cutoff — plus Heaps-law vocabulary
  * growth, the corpus-scaling profile that predicts vocab size at 10×
  * the data.
  */
object LlmQueries6 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Dedup self-evaluation: recall of the MinHash-LSH banding pipeline
    // against EXACT shingle-Jaccard ground truth on a deterministic doc
    // sample (doc_id % 2 = 0 here; the modulus is the audit-fraction
    // knob — at corpus scale it is set so the sample is ~10⁴ docs, and
    // truth cost shrinks with the SQUARE of the fraction since both
    // pair endpoints must sample in). Ground truth is the exact
    // construction banding exists to avoid — an inverted shingle index
    // within the sample (shingle-keyed equi-join; hot shingles are
    // quadratic, which is precisely why it only ever runs on the audit
    // sample). The candidate side is the production minhashPairs
    // pipeline itself, so misses measure exactly what banding (8 bands
    // × 4 rows) plus the hot-bucket cap give up. The same exact-Jaccard
    // definition (distinct 3-gram shingles) on both sides makes
    // found ⊆ truth, so recall = hits / truth.
    q("q_dedup_recall", {
      s"""WITH ${LlmQueries.minhashPairsCtes("documents")},
         |swords AS (SELECT doc_id, unnest(shingles) AS s
         |  FROM sh WHERE doc_id % 2 = 0),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM swords GROUP BY 1),
         |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS ov
         |  FROM swords a JOIN swords b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truth AS (SELECT id1, id2 FROM inter
         |  JOIN sizes s1 ON s1.doc_id = inter.id1
         |  JOIN sizes s2 ON s2.doc_id = inter.id2
         |  WHERE ov * 1.0 / (s1.sz + s2.sz - ov) >= 0.7),
         |fnd AS (SELECT id1, id2 FROM pairs
         |  WHERE id1 % 2 = 0 AND id2 % 2 = 0),
         |hh AS (SELECT count(*)::BIGINT AS n_hits
         |  FROM truth JOIN fnd USING (id1, id2)),
         |tr AS (SELECT count(*)::BIGINT AS n_truth FROM truth)
         |SELECT tr.n_truth, hh.n_hits, (tr.n_truth - hh.n_hits) AS n_missed,
         |  round(hh.n_hits * 1.0 / greatest(tr.n_truth, 1), 6) AS recall
         |FROM tr CROSS JOIN hh""".stripMargin
    }) { (s, d) =>
      import graft.CheckpointStrategy.Ops._
      val sample = documents(s, d).filter(col("doc_id") % 2 === 0)
      // r20: the exploded shingle set feeds THREE subplan executions
      // (sizes + both sides of the inverted-index self-join) — without
      // the cut each re-ran the scan + shingle explode
      val sw = sample
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("s"))
        .cut()
      val sizes = sw.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = sw.select(col("doc_id").as("id1"), col("s"))
        .join(sw.select(col("doc_id").as("id2"), col("s")),
          Seq("s"))
        .filter(col("id1") < col("id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("ov"))
      val truth = inter
        .join(sizes.select(col("doc_id").as("id1"), col("sz").as("sz1")), "id1")
        .join(sizes.select(col("doc_id").as("id2"), col("sz").as("sz2")), "id2")
        .filter(col("ov") * lit(1.0) /
          (col("sz1") + col("sz2") - col("ov")) >= 0.7)
        .select("id1", "id2")
      val found = Dedup.minhashPairs(documents(s, d), threshold = 0.7)
        .filter(col("id1") % 2 === 0 && col("id2") % 2 === 0)
        .select("id1", "id2")
      // r20: n_truth and n_hits in ONE pass — a left join marks hits
      // (found pairs are distinct, so no fan-out) and one aggregate
      // counts both, where the former hits-join + truth-count pair
      // executed the quadratic truth subtree twice
      truth.join(found.withColumn("_hit", lit(1)), Seq("id1", "id2"), "left_outer")
        .agg(count(lit(1)).as("n_truth"), count(col("_hit")).as("n_hits"))
        .select(col("n_truth"), col("n_hits"),
          (col("n_truth") - col("n_hits")).as("n_missed"),
          round(col("n_hits") * lit(1.0) / greatest(col("n_truth"), lit(1L)), 6)
            .as("recall"))
    },

    // Audit-cost scaling proof: the claim "truth cost shrinks with the
    // SQUARE of the audit fraction" (q_dedup_recall's scale story)
    // MEASURED instead of asserted — the exact-truth shingle join runs
    // at two nested sample moduli (doc_id % 2 and % 4) in one query,
    // and the output puts the measured pair-count ratio next to the
    // ratio the square law predicts from the sample sizes. One row:
    // per-modulus doc/pair/truth counts + measured vs predicted cost
    // ratio. The % 4 sample nests inside % 2, so both engines derive
    // the small side by filtering the larger pair set (the measurement
    // is pair COUNTS, which that sharing doesn't change). At corpus
    // scale this is the dial an audit budget is set by: halve the
    // fraction, quarter the quadratic truth work.
    q("q_dedup_cost_scaling", {
      s"""WITH ${LlmQueries.shingleCtes("documents")},
         |sw AS (SELECT doc_id, unnest(shingles) AS s FROM sh
         |  WHERE doc_id % 2 = 0),
         |sz AS (SELECT doc_id, count(*) AS sz FROM sw GROUP BY 1),
         |i2 AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS ov
         |  FROM sw a JOIN sw b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j2 AS (SELECT id1, id2,
         |    (ov * 1.0 / (z1.sz + z2.sz - ov) >= 0.7)::BIGINT AS is_truth
         |  FROM i2 JOIN sz z1 ON z1.doc_id = i2.id1
         |    JOIN sz z2 ON z2.doc_id = i2.id2),
         |s2 AS (SELECT count(*)::BIGINT AS n_pairs_m2,
         |  coalesce(sum(is_truth), 0)::BIGINT AS n_truth_m2 FROM j2),
         |s4 AS (SELECT count(*)::BIGINT AS n_pairs_m4,
         |  coalesce(sum(is_truth), 0)::BIGINT AS n_truth_m4 FROM j2
         |  WHERE id1 % 4 = 0 AND id2 % 4 = 0),
         |d2 AS (SELECT count(*)::BIGINT AS n_docs_m2 FROM documents
         |  WHERE doc_id % 2 = 0),
         |d4 AS (SELECT count(*)::BIGINT AS n_docs_m4 FROM documents
         |  WHERE doc_id % 4 = 0)
         |SELECT n_docs_m2, n_pairs_m2, n_truth_m2,
         |  n_docs_m4, n_pairs_m4, n_truth_m4,
         |  round(n_pairs_m2 * 1.0 / greatest(n_pairs_m4, 1), 6)
         |    AS measured_cost_ratio,
         |  round((n_docs_m2 * 1.0 / n_docs_m4) * (n_docs_m2 * 1.0 / n_docs_m4), 6)
         |    AS predicted_cost_ratio
         |FROM d2, d4, s2, s4""".stripMargin
    }) { (s, d) =>
      import graft.CheckpointStrategy.Ops._
      // r20: shingles materialized once (three subplan consumers, as in
      // q_dedup_recall)
      val sw = documents(s, d).filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("s"))
        .cut()
      val sizes = sw.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val judged = sw.select(col("doc_id").as("id1"), col("s"))
        .join(sw.select(col("doc_id").as("id2"), col("s")), Seq("s"))
        .filter(col("id1") < col("id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("ov"))
        .join(sizes.select(col("doc_id").as("id1"), col("sz").as("sz1")), "id1")
        .join(sizes.select(col("doc_id").as("id2"), col("sz").as("sz2")), "id2")
        .withColumn("is_truth",
          (col("ov") * lit(1.0) /
            (col("sz1") + col("sz2") - col("ov")) >= 0.7).cast("long"))
      // r20: both moduli's pair/truth counts from ONE aggregation pass
      // (the nested %4 sample is a conditional sum over the same rows);
      // the former s2/s4 pair executed the quadratic truth chain twice
      val in4 = col("id1") % 4 === 0 && col("id2") % 4 === 0
      val s24 = judged.agg(count(lit(1)).as("n_pairs_m2"),
        coalesce(sum("is_truth"), lit(0L)).as("n_truth_m2"),
        coalesce(sum(when(in4, 1L).otherwise(0L)), lit(0L)).as("n_pairs_m4"),
        coalesce(sum(when(in4, col("is_truth")).otherwise(0L)), lit(0L))
          .as("n_truth_m4"))
      // r20: both doc counts from one scan (conditional sums)
      val dd = documents(s, d).agg(
        coalesce(sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)), lit(0L))
          .as("n_docs_m2"),
        coalesce(sum(when(col("doc_id") % 4 === 0, 1L).otherwise(0L)), lit(0L))
          .as("n_docs_m4"))
      // 1-row × 1-row broadcast combine — never data-sized
      dd.crossJoin(broadcast(s24))
        .select(col("n_docs_m2"), col("n_pairs_m2"), col("n_truth_m2"),
          col("n_docs_m4"), col("n_pairs_m4"), col("n_truth_m4"),
          round(col("n_pairs_m2") * lit(1.0) /
            greatest(col("n_pairs_m4"), lit(1L)), 6).as("measured_cost_ratio"),
          round((col("n_docs_m2") * lit(1.0) / col("n_docs_m4")) *
            (col("n_docs_m2") * lit(1.0) / col("n_docs_m4")), 6)
            .as("predicted_cost_ratio"))
    },

    // Threshold operating curve: pair volume and affected-doc volume at
    // each candidate Jaccard cutoff, from ONE banding+verify pass at
    // the loosest threshold (0.5) — how a pipeline picks its dedup τ
    // without re-running the expensive candidate generation per value.
    // The sweep re-aggregates the verified pair set (linear in pairs,
    // 5-row threshold table broadcast); comparisons use the rounded
    // jaccard column both engines already hash-match in q_dedup_minhash.
    q("q_dedup_threshold_sweep", {
      s"""WITH ${LlmQueries.minhashPairsCtes("documents", threshold = 0.5)}
         |SELECT th AS threshold,
         |  (SELECT count(*)::BIGINT FROM pairs WHERE jaccard >= th) AS n_pairs,
         |  (SELECT count(DISTINCT x)::BIGINT FROM
         |    (SELECT unnest([id1, id2]) AS x FROM pairs WHERE jaccard >= th))
         |    AS n_docs
         |FROM unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS t(th)
         |ORDER BY threshold""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      // (r20 measured: cutting `pairs` here LOSES 0.26→1.2 s — the two
      // sweep aggregates share the whole banding+verify pipeline via
      // ReusedExchange within the single final action; an eager cut
      // splits it into three actions and forfeits the reuse.)
      val pairs = Dedup.minhashPairs(documents(s, d), threshold = 0.5)
        .select(col("id1"), col("id2"), col("jaccard"))
      val th = Seq(0.5, 0.6, 0.7, 0.8, 0.9).toDF("threshold")
      // 5-row broadcast against the (already tiny, ~linear-in-dups)
      // verified pair set: the inequality join is 5 × |pairs|, never
      // corpus-sized
      val nPairs = pairs.join(broadcast(th), col("jaccard") >= col("threshold"))
        .groupBy("threshold").agg(count(lit(1)).as("n_pairs"))
      val nDocs = pairs
        .select(col("jaccard"), explode(array(col("id1"), col("id2"))).as("x"))
        .join(broadcast(th), col("jaccard") >= col("threshold"))
        .groupBy("threshold").agg(countDistinct("x").as("n_docs"))
      th.join(nPairs, Seq("threshold"), "left")
        .join(nDocs, Seq("threshold"), "left")
        .select(col("threshold"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"))
        .orderBy("threshold")
    },

    // Heaps-law vocabulary growth: new word types and cumulative vocab
    // per doc_id decile — the corpus-scaling profile that says whether
    // vocabulary (and so tokenizer/embedding-table sizing) saturates or
    // keeps growing at 10× the data. Shape: a token-keyed
    // first-occurrence aggregate (the only corpus-sized shuffle), decile
    // bucketing against a 1-row max broadcast, then a 10-row prefix sum
    // — the window input is the decile list, bounded at any corpus size.
    q("q_vocab_growth",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |mx AS (SELECT max(doc_id) + 1 AS n FROM documents),
        |occ AS (SELECT w, min(doc_id) AS first_doc FROM tok GROUP BY 1),
        |newt AS (SELECT (first_doc * 10) // mx.n AS decile,
        |    count(*) AS n_new_types
        |  FROM occ CROSS JOIN mx GROUP BY 1),
        |vol AS (SELECT (doc_id * 10) // mx.n AS decile, count(*) AS n_tokens
        |  FROM tok CROSS JOIN mx GROUP BY 1)
        |SELECT vol.decile,
        |  coalesce(newt.n_new_types, 0)::BIGINT AS n_new_types,
        |  sum(coalesce(newt.n_new_types, 0))
        |    OVER (ORDER BY vol.decile)::BIGINT AS cum_types,
        |  vol.n_tokens::BIGINT AS n_tokens,
        |  sum(vol.n_tokens) OVER (ORDER BY vol.decile)::BIGINT AS cum_tokens
        |FROM vol LEFT JOIN newt ON newt.decile = vol.decile
        |ORDER BY vol.decile""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tok = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val mx = documents(s, d).agg((max("doc_id") + 1).as("n"))
      val newt = tok.groupBy("w").agg(min("doc_id").as("first_doc"))
        .crossJoin(broadcast(mx))
        .groupBy(floor(col("first_doc") * 10 / col("n")).as("decile"))
        .agg(count(lit(1)).as("n_new_types"))
      val vol = tok.crossJoin(broadcast(mx))
        .groupBy(floor(col("doc_id") * 10 / col("n")).as("decile"))
        .agg(count(lit(1)).as("n_tokens"))
      val w = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      vol.join(newt, Seq("decile"), "left")
        .withColumn("n_new_types", coalesce(col("n_new_types"), lit(0L)))
        .select(col("decile"), col("n_new_types"),
          sum("n_new_types").over(w).as("cum_types"),
          col("n_tokens"), sum("n_tokens").over(w).as("cum_tokens"))
        .orderBy("decile")
    }
  )
}
