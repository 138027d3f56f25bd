package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ninth LLM-curation tranche (round 12): the back end of the pipeline —
  * what happens after curation decides what to keep. Three ops a
  * production training-data stack runs on every export:
  *
  *  - a deterministic shard manifest (the audit artifact that makes a
  *    100-TB export verifiable: per-shard counts, token/byte totals and
  *    an order-independent content checksum);
  *  - a k-anonymity audit over quasi-identifiers (the privacy
  *    release-gate companion to ops/Pii's scrubbing — scrubbing removes
  *    direct identifiers, this measures re-identification risk from the
  *    columns that remain);
  *  - a rerank stage over ANN candidates (the cross-encoder slot in a
  *    retrieval stack, with a deterministic relevance×quality blend
  *    standing in for the model — the plumbing is the contract: bounded
  *    candidate set, feature join, window re-rank).
  *
  * All three follow the registry determinism conventions (QueryDef.scala)
  * and the md5Int cross-engine hash family (llm/Dedup.scala:97).
  */
object LlmQueries9 {
  import Tables._
  import graft.llm.{Dedup, Similarity, TextAnalysis, Tokenize}

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Export-shard manifest: docs deterministically sharded by an
    // independent hash (md5 bytes [4,8) — disjoint from q_split_assign's
    // split bytes, so shard and split assignments are uncorrelated), one
    // manifest row per shard with doc/token/byte totals and a content
    // checksum (SUM of per-doc md5Int — commutative, so any partition
    // order and any re-run produce the identical value; a reader
    // re-hashing a shard catches truncation or corruption without
    // re-reading the rest of the export). Plan: one projection + one
    // keyed groupBy with map-side combine → O(shards) rows. At 100 TB
    // the same plan holds with shard count scaled to target file sizes.
    q("q_export_shards",
      """WITH t AS (SELECT
        |    ('0x' || substr(md5(doc_id::VARCHAR), 9, 8))::BIGINT % 16 AS shard_id,
        |    len(string_split(text, ' '))::BIGINT AS n_tokens,
        |    strlen(text)::BIGINT AS n_bytes,
        |    ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        |  FROM documents)
        |SELECT shard_id, count(*) AS n_docs,
        |  sum(n_tokens)::BIGINT AS n_tokens,
        |  sum(n_bytes)::BIGINT AS n_bytes,
        |  sum(h)::BIGINT AS checksum
        |FROM t GROUP BY shard_id ORDER BY shard_id""".stripMargin) { (s, d) =>
      val shard = pmod(Dedup.md5Int(col("doc_id").cast("string"), 4), lit(16L))
      documents(s, d)
        .select(shard.as("shard_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          // UTF-8 octets (Spark octet_length ≡ DuckDB strlen), not
          // chars — a reader verifies downloaded shard sizes against
          // this, and bytes ≠ chars on any non-ASCII doc
          octet_length(col("text")).cast("long").as("n_bytes"),
          Dedup.md5Int(col("text")).as("h"))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
          sum("n_bytes").as("n_bytes"), sum("h").as("checksum"))
        .orderBy("shard_id")
    },

    // k-anonymity audit: equivalence classes over the quasi-identifier
    // tuple (nation, market segment, account-balance band), summarized
    // as the class-size histogram — n_classes and n_rows per size, with
    // sizes below k=5 flagged. The histogram IS the release decision
    // input: min class size = the dataset's k; `below_k` rows = the
    // re-identifiable population. Two keyed aggregations (QI tuple,
    // then class size), both map-side combinable; output is bounded by
    // the largest class size, never by the corpus.
    q("q_k_anonymity",
      """WITH qi AS (SELECT c_nationkey, c_mktsegment,
        |    floor(c_acctbal / 1000)::BIGINT AS bal_band FROM customer),
        |cls AS (SELECT count(*)::BIGINT AS class_size FROM qi
        |  GROUP BY c_nationkey, c_mktsegment, bal_band)
        |SELECT class_size, count(*) AS n_classes,
        |  sum(class_size)::BIGINT AS n_rows,
        |  CASE WHEN class_size < 5 THEN 1 ELSE 0 END AS below_k
        |FROM cls GROUP BY class_size ORDER BY class_size""".stripMargin) { (s, d) =>
      customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("class_size"))
        .groupBy("class_size")
        .agg(count(lit(1)).as("n_classes"), sum("class_size").as("n_rows"))
        .withColumn("below_k", when(col("class_size") < 5, 1).otherwise(0))
        .orderBy("class_size")
    },

    // Distributed BPE tokenizer training, 3 merge rounds through the
    // Tokenize.trainMerges LOOP (round 13: the unrolled form became the
    // general train API; this query pins the loop against the unchanged
    // unrolled oracle). Each round is ONE corpus job: an adjacent-pair
    // count (explode + keyed map-side-combinable shuffle) whose single
    // aggregation row carries the argmax rule (count DESC, pair ASC via
    // min_by over (-cnt, pa, pb)) AND the total adjacency count — the
    // current token total is then exact arithmetic (Σ pairs + n_docs),
    // so the separate per-round nTokens corpus scan of the r12 unrolled
    // version is gone. The merge applies as a scan-local literal string
    // pass over the double-space-joined form ('  '-separated, '  '
    // sentinels): plain non-regex replace of ' a  b ' with ' ab '
    // consumes one boundary space per side, so adjacent merge sites
    // keep their separators and left-to-right non-overlapping
    // replacement IS greedy BPE ("a a a" under (a,a) → ["aa","a"]) —
    // identical semantics in both engines with no regex escaping of
    // data-dependent tokens. The per-round rule is a 1-row driver value
    // (distributed Lloyd's argmax shape, O(1)/round driver traffic);
    // lineage cuts every checkpointEvery rounds. Cost: rounds × (scan +
    // pair shuffle) — vocabulary-scale training runs the SAME loop with
    // more rounds (see TokenizeSpec's convergence round-trip and
    // SCALE.md's 12-round sf1 measurement).
    q("q_bpe_train", {
      def pairs(src: String, dst: String) =
        s"""$dst AS (SELECT u.pa AS pa, u.pb AS pb, count(*) AS cnt FROM (
           |    SELECT unnest([{'pa': t[i], 'pb': t[i+1]}
           |        for i in range(1, len(t))]) AS u
           |    FROM (SELECT string_split(trim(s), '  ') AS t FROM $src))
           |  GROUP BY 1, 2)""".stripMargin
      def rule(src: String, dst: String) =
        s"$dst AS (SELECT pa, pb, cnt FROM $src ORDER BY cnt DESC, pa, pb LIMIT 1)"
      def merge(src: String, r: String, dst: String) =
        s"""$dst AS (SELECT doc_id,
           |  replace(s, ' '||$r.pa||'  '||$r.pb||' ', ' '||$r.pa||$r.pb||' ') AS s
           |  FROM $src, $r)""".stripMargin
      def ntok(src: String, dst: String) =
        s"""$dst AS (SELECT sum(len(string_split(trim(s), '  ')))::BIGINT
           |  AS n_tokens_after FROM $src)""".stripMargin
      def outRow(i: Int) =
        s"""SELECT $i AS round, r$i.pa AS tok_a, r$i.pb AS tok_b,
           |  r$i.cnt AS pair_count, n${i + 1}.n_tokens_after
           |FROM r$i, n${i + 1}""".stripMargin
      s"""WITH d0 AS (SELECT doc_id,
         |    '  ' || replace(text, ' ', '  ') || '  ' AS s FROM documents),
         |${pairs("d0", "p0")}, ${rule("p0", "r0")},
         |${merge("d0", "r0", "d1")}, ${ntok("d1", "n1")},
         |${pairs("d1", "p1")}, ${rule("p1", "r1")},
         |${merge("d1", "r1", "d2")}, ${ntok("d2", "n2")},
         |${pairs("d2", "p2")}, ${rule("p2", "r2")},
         |${merge("d2", "r2", "d3")}, ${ntok("d3", "n3")}
         |${outRow(0)} UNION ALL ${outRow(1)} UNION ALL ${outRow(2)}
         |ORDER BY round""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      val d0 = documents(s, d)
        .select(col("doc_id"), Tokenize.encode(col("text")).as("s"))
      // minCount=1 mirrors the oracle's unconditional 3 unrolled rounds
      val trained = Tokenize.trainMerges(d0, maxMerges = 3, minCount = 1L)
      trained.merges
        .map(m => (m.round, m.pa, m.pb, m.cnt, m.nTokensAfter))
        .toDF("round", "tok_a", "tok_b", "pair_count", "n_tokens_after")
        .orderBy("round")
    },

    // Hard-negative mining for embedding-model training: per query
    // vector, the top-5 CLOSE-BUT-NOT-DUPLICATE neighbors — cosine
    // ranking with an exclusion band (cosine ≥ 0.95 is a near-dup, not
    // a negative; self excluded). These are the pairs contrastive
    // training actually needs: similar enough to be informative, far
    // enough to be true negatives. The exclusion must apply BEFORE the
    // rank window (a near-dup must not consume a slot), which is why
    // this is its own query and not a filter over q_sim_topk's output.
    // Plan: the documented brute baseline scores (corpus × 10 broadcast
    // queries, scan-local), one per-query top-k window — at corpus
    // scale the candidate generator swaps to the LSH/IVF pass, same
    // exclusion-then-rank shape over bounded candidates.
    q("q_hard_negatives",
      """WITH qv AS (SELECT vec_id AS query_id, embedding AS qe
        |    FROM embeddings WHERE vec_id < 10),
        |scored AS (SELECT qv.query_id, e.vec_id AS doc_id,
        |    round(list_cosine_similarity(e.embedding::DOUBLE[],
        |      qv.qe::DOUBLE[]), 6) AS cosine
        |  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> qv.query_id)
        |SELECT query_id, doc_id, cosine, hn_rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, doc_id) AS hn_rank
        |  FROM scored WHERE cosine < 0.95) t
        |WHERE hn_rank <= 5 ORDER BY query_id, hn_rank""".stripMargin) { (s, d) =>
      val emb = embeddings(s, d)
        .withColumn("csq", Similarity.sumSq(col("embedding")))
      val q10 = embeddings(s, d).filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        .withColumn("qsq", Similarity.sumSq(col("qe")))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("doc_id"))
      emb.crossJoin(broadcast(q10))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("doc_id"),
          round(Similarity.dot(col("embedding"), col("qe")) /
            sqrt(col("csq") * col("qsq")), 6).as("cosine"))
        .filter(col("cosine") < 0.95)
        .withColumn("hn_rank", row_number().over(w))
        .filter(col("hn_rank") <= 5)
        .select("query_id", "doc_id", "cosine", "hn_rank")
        .orderBy("query_id", "hn_rank")
    },

    // Rerank stage: the exact-cosine top-20 candidates per query
    // (q_sim_topk's ranking, queries = vec_id < 10) re-scored by a
    // deterministic relevance×quality blend — 0.8·cosine +
    // 0.2·quality, where quality is q_quality_score's documented
    // composite (length saturation + content-word ratio + alphabetic
    // density). The blend stands in for a cross-encoder; the contract
    // is the plumbing: the candidate set is bounded (queries×20) and
    // broadcast, the feature join streams the corpus past it keyed on
    // doc_id, and the re-rank window runs over ≤20 rows per query.
    // Swapping the blend for a real model score changes one projection,
    // not the plan. Both cosine and quality are rounded to 6 before the
    // blend, so both engines blend identical doubles.
    q("q_rerank",
      s"""WITH $rerankCtes
        |SELECT query_id, doc_id, ann_rank, cosine, score, rerank_rank
        |FROM top10 ORDER BY query_id, rerank_rank""".stripMargin) { (s, d) =>
      rerankedTop10(s, d).orderBy("query_id", "rerank_rank")
    },

    // Ranking-quality eval of the rerank stage: nDCG@10 and MRR of the
    // reranked list against relevance graded by the BASE cosine rank
    // (rel 3 for ann_rank ≤ 2, 2 for ≤ 5, 1 for ≤ 10, 0 beyond) — the
    // standard rerank ablation: how much does the quality blend perturb
    // pure-relevance order, per query? (Absolute cosine thresholds
    // would be degenerate here — fixture max cosines are ~0.35–0.49 —
    // so grades come from ranks, which also makes the eval scale-free.)
    // Gains 2^rel−1 ∈ {0,1,3,7} are exact integers; log2 discounts are
    // ln(r+1)/ln(2) with identical shapes on both engines; DCG and
    // IDCG are 10-element sums rounded after the divide. IDCG's ideal
    // order ties break by rerank_rank — the denominator is
    // tie-invariant, the assignment deterministic. MRR counts the
    // first rel ≥ 2 item; a list with none scores 0. Plan: the rerank
    // pipeline (bounded) + two windows and one agg over ≤10 rows per
    // query — eval cost is O(queries), never corpus-scale.
    q("q_rank_eval",
      s"""WITH $rerankCtes,
        |ev AS (SELECT query_id, rerank_rank,
        |    CASE WHEN ann_rank <= 2 THEN 3 WHEN ann_rank <= 5 THEN 2
        |         WHEN ann_rank <= 10 THEN 1 ELSE 0 END AS rel
        |  FROM top10),
        |g AS (SELECT query_id, rerank_rank, rel,
        |    (CASE rel WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1
        |      ELSE 0 END)::DOUBLE AS gain,
        |    row_number() OVER (PARTITION BY query_id ORDER BY
        |      CASE rel WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1
        |        ELSE 0 END DESC, rerank_rank) AS ideal_rank
        |  FROM ev)
        |SELECT query_id,
        |  round(sum(gain / (ln(rerank_rank + 1) / ln(2)))
        |    / nullif(sum(gain / (ln(ideal_rank + 1) / ln(2))), 0), 6)
        |    AS ndcg10,
        |  round(coalesce(1.0 / min(CASE WHEN rel >= 2
        |    THEN rerank_rank END), 0), 6) AS mrr
        |FROM g GROUP BY query_id ORDER BY query_id""".stripMargin) { (s, d) =>
      val rel = when(col("ann_rank") <= 2, 3)
        .when(col("ann_rank") <= 5, 2)
        .when(col("ann_rank") <= 10, 1).otherwise(0)
      val gain = when(col("rel") === 3, 7.0).when(col("rel") === 2, 3.0)
        .when(col("rel") === 1, 1.0).otherwise(0.0)
      val wIdeal = Window.partitionBy("query_id")
        .orderBy(col("gain").desc, col("rerank_rank"))
      def disc(rank: org.apache.spark.sql.Column) =
        log(rank + 1) / log(lit(2.0))
      rerankedTop10(s, d)
        .withColumn("rel", rel).withColumn("gain", gain)
        .withColumn("ideal_rank", row_number().over(wIdeal))
        .groupBy("query_id")
        .agg(sum(col("gain") / disc(col("rerank_rank"))).as("dcg"),
          sum(col("gain") / disc(col("ideal_rank"))).as("idcg"),
          min(when(col("rel") >= 2, col("rerank_rank"))).as("first_hit"))
        .select(col("query_id"),
          round(col("dcg") / when(col("idcg") =!= 0, col("idcg")), 6)
            .as("ndcg10"),
          round(coalesce(lit(1.0) / col("first_hit"), lit(0.0)), 6).as("mrr"))
        .orderBy("query_id")
    }
  )

  /** Shared rerank pipeline CTEs (qv → cand → ql → r → top10) — ONE
    * definition used by both q_rerank's and q_rank_eval's oracles, so
    * the candidate generation, blend, and tie-breaks cannot drift
    * between the stage and its eval.
    */
  private lazy val rerankCtes: String =
    s"""qv AS (SELECT vec_id AS query_id, embedding AS qe
       |    FROM embeddings WHERE vec_id < 10),
       |cand AS (SELECT query_id, neighbor_id AS doc_id, cosine,
       |    rn AS ann_rank FROM (
       |  SELECT qv.query_id, e.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(e.embedding::DOUBLE[],
       |      qv.qe::DOUBLE[]), 6) AS cosine,
       |    row_number() OVER (PARTITION BY qv.query_id ORDER BY
       |      round(list_cosine_similarity(e.embedding::DOUBLE[],
       |        qv.qe::DOUBLE[]), 6) DESC, e.vec_id) AS rn
       |  FROM embeddings e CROSS JOIN qv
       |  WHERE e.vec_id <> qv.query_id) t WHERE rn <= 20),
       |ql AS (SELECT doc_id, ${TextAnalysis.qualityScoreSql("text")}
       |    AS quality FROM documents),
       |r AS (SELECT c.query_id, c.doc_id, c.ann_rank, c.cosine,
       |    round(0.8 * c.cosine + 0.2 * ql.quality, 6) AS score
       |  FROM cand c JOIN ql ON ql.doc_id = c.doc_id),
       |top10 AS (SELECT query_id, doc_id, ann_rank, cosine, score,
       |    rerank_rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS rerank_rank FROM r) t
       |  WHERE rerank_rank <= 10)""".stripMargin

  /** The Spark side of the shared pipeline: top-10 reranked rows per
    * query (unordered — callers add their own final sort). */
  private def rerankedTop10(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cands = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
        k = 20)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("cosine"), col("rn").as("ann_rank"))
    val quality = documents(s, d).select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    quality.join(broadcast(cands), "doc_id")
      .select(col("query_id"), col("doc_id"), col("ann_rank"), col("cosine"),
        round(lit(0.8) * col("cosine") + lit(0.2) * col("quality"), 6)
          .as("score"))
      .withColumn("rerank_rank", row_number().over(w))
      .filter(col("rerank_rank") <= 10)
      .select("query_id", "doc_id", "ann_rank", "cosine", "score", "rerank_rank")
  }
}
