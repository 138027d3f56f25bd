package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.{Clustering, Dedup, Multimodal, Similarity, TextAnalysis}

/** Large-scale training-data pipeline operators over the `documents` and
  * `embeddings` fixtures: dedup (exact / MinHash-LSH / SimHash / n-gram
  * Jaccard), similarity search (brute-force + LSH-bucketed ANN), text
  * analysis (language-ID, quality, tokens, fingerprints), multimodal
  * column pattern. 100 TB design notes live on each op in `graft.llm`.
  */
object LlmQueries {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  /** Shared DuckDB shingle CTEs over a (doc_id, text) source: the exact
    * replay of ShinglesExpr — distinct 3-gram word shingles, whole text
    * when shorter. */
  private[graft] def shingleCtes(src: String): String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM $src),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(tok) >= 3
       |    THEN list_distinct([array_to_string(tok[i:i+2], ' ')
       |                       for i in range(1, len(tok) - 1)])
       |    ELSE [array_to_string(tok, ' ')] END AS shingles FROM t)""".stripMargin

  /** Shared DuckDB in-bucket candidate CTEs over a `banded(doc_id, band,
    * bucket)` CTE: sorted bucket membership, 2..1000 size cap, distinct
    * ordered pairs — the replay of Dedup.bucketPairs. */
  private val bucketCandCtes: String =
    """buckets AS (SELECT band, bucket, list_sort(list(doc_id)) AS ids
      |  FROM banded GROUP BY band, bucket
      |  HAVING count(*) BETWEEN 2 AND 1000),
      |cand AS (SELECT DISTINCT a.id1, b.id2 FROM
      |    (SELECT band, bucket, unnest(ids) AS id1 FROM buckets) a
      |  JOIN (SELECT band, bucket, unnest(ids) AS id2 FROM buckets) b
      |    USING (band, bucket)
      |  WHERE a.id1 < b.id2)""".stripMargin

  /** The 16×64 hyperplane matrix as a DuckDB list literal — the SAME
    * fixed-seed [[Similarity.hyperplanes]] values the Spark side bakes
    * into its signature expressions (floats widened to double, emitted
    * with Double.toString's round-trip guarantee). */
  private def planesLiteral: String = Similarity.hyperplanes(16, 64)
    .map(p => p.map(v => v.toFloat.toDouble.toString).mkString("[", ", ", "]"))
    .mkString("[", ",\n  ", "]")

  /** Sign-bit band bucket over the plane literal: replay of
    * Similarity.bandedSignature for a 16-plane signature in `bands`
    * bands (bit i of band b = sign of plane b·perBand+i). */
  private def bucketExpr(vecCol: String, bands: Int): String = {
    val perBand = 16 / bands
    (0 until perBand).map { i =>
      s"""(CASE WHEN list_dot_product($vecCol::DOUBLE[],
         |    pl.P[b*$perBand + ${i + 1}]) >= 0 THEN ${1 << i} ELSE 0 END)""".stripMargin
    }.mkString(" + ")
  }

  /** Σx² in double over a float vector — the SumSqF replay. */
  private def sumSqSql(vecCol: String): String =
    s"list_sum(list_transform($vecCol::DOUBLE[], x -> x * x))"

  /** Full DuckDB replay of the hyperplane-LSH near-dup pipeline:
    * 16 planes → 4 sign-bit bands → in-bucket pairs (2..1000 cap) →
    * exact cosine verify at 0.3 (dot / sqrt(Σa²·Σb²), the same operation
    * order as the native DotProductF/SumSqF expressions). */
  private val embeddingLshOracle: String = {
    val cos = "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / " +
      s"sqrt(${sumSqSql("a.embedding")} * ${sumSqSql("b.embedding")})"
    s"""WITH pl AS (SELECT $planesLiteral AS P),
       |banded AS (SELECT vec_id AS doc_id, b AS band,
       |  ${bucketExpr("embedding", 4)} AS bucket
       |  FROM embeddings, pl, unnest(range(0, 4)) AS u(b)),
       |$bucketCandCtes
       |SELECT id1, id2, round($cos, 6) AS cosine
       |FROM cand
       | JOIN embeddings a ON a.vec_id = cand.id1
       | JOIN embeddings b ON b.vec_id = cand.id2
       |WHERE $cos >= 0.3
       |ORDER BY id1, id2""".stripMargin
  }

  /** Full DuckDB replay of the LSH ANN top-k: 2 bands × 8 sign bits,
    * query↔corpus band collisions, exact re-rank (cosine rounded to 6
    * BEFORE ranking so ties break identically), top-10 per query. */
  private val annLshOracle: String = {
    val cos = "list_dot_product(c.embedding::DOUBLE[], q.qe::DOUBLE[]) / " +
      s"sqrt(${sumSqSql("c.embedding")} * ${sumSqSql("q.qe")})"
    s"""WITH pl AS (SELECT $planesLiteral AS P),
       |cb AS (SELECT vec_id, b AS band, ${bucketExpr("embedding", 2)} AS bucket
       |  FROM embeddings, pl, unnest(range(0, 2)) AS u(b)),
       |qb AS (SELECT vec_id AS query_id, b AS band,
       |  ${bucketExpr("embedding", 2)} AS bucket
       |  FROM embeddings, pl, unnest(range(0, 2)) AS u(b) WHERE vec_id < 10),
       |cand AS (SELECT DISTINCT query_id, cb.vec_id AS neighbor_id
       |  FROM cb JOIN qb USING (band, bucket) WHERE cb.vec_id <> qb.query_id),
       |scored AS (SELECT query_id, neighbor_id, round($cos, 6) AS cosine
       |  FROM cand
       |   JOIN embeddings c ON c.vec_id = cand.neighbor_id
       |   JOIN (SELECT vec_id AS qid, embedding AS qe FROM embeddings) q
       |     ON q.qid = cand.query_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS rn FROM scored)
       |SELECT query_id, neighbor_id, cosine, rn FROM ranked
       |WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin
  }

  /** Shared DuckDB replay of the TRAINED IVF coarse quantizer
    * ([[Similarity.ivfCentroids]]): k-means with nlist = ⌊√N⌋,
    * k-smallest-vec_id init, one Lloyd update with FLOAT-QUANTIZED means
    * (the [[Clustering]] determinism contract — both engines' ~1e-15
    * avg() skew collapses to identical 24-bit values). Ends in
    * `cents(centroid_id, ce, cesq)` plus the prepped corpus
    * `v(vec_id, e, vsq)`. */
  private[graft] def ivfCentroidCtes: String =
    s"""v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS e,
       |    list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) AS vsq
       |  FROM embeddings),
       |ivfnl AS (SELECT greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)) AS k
       |  FROM embeddings),
       |ivfc0 AS (SELECT vec_id AS cluster, e AS ce, vsq AS cesq FROM (
       |    SELECT v.*, row_number() OVER (ORDER BY vec_id) AS rn FROM v) t
       |  WHERE rn <= (SELECT k FROM ivfnl)),
       |ivfr1 AS (SELECT v.vec_id, v.e, c0.cluster,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      v.vsq - 2.0 * list_dot_product(v.e, c0.ce) + c0.cesq,
       |      c0.cluster) AS rn
       |  FROM v CROSS JOIN ivfc0 c0),
       |ivfa1 AS (SELECT vec_id, e, cluster FROM ivfr1 WHERE rn = 1),
       |ivfm1 AS (SELECT cluster, j, CAST(CAST(avg(e[j]) AS FLOAT) AS DOUBLE) AS m
       |  FROM ivfa1, unnest(range(1, 65)) AS u(j) GROUP BY 1, 2),
       |ivfc1 AS (SELECT cluster, array_agg(m ORDER BY j) AS ce FROM ivfm1 GROUP BY 1),
       |cents AS MATERIALIZED (SELECT cluster AS centroid_id, ce,
       |    list_sum(list_transform(ce, x -> x * x)) AS cesq FROM ivfc1)""".stripMargin

  /** L2² distance to a centroid row `c` — the k-means training metric,
    * operand order mirroring Clustering.d2 / Similarity.ivfScoredWith. */
  private[graft] def ivfD2(vec: String, vsq: String): String =
    s"$vsq - 2.0 * list_dot_product($vec, c.ce) + c.cesq"

  /** Full DuckDB replay of the IVF ANN top-k over the TRAINED quantizer:
    * argmin-L2² assignment (tie → lower centroid_id), nProbe=2 L2²
    * probes per query, exact cosine re-rank within probed cells. */
  private val ivfOracle: String = {
    val cos = "list_dot_product(a.e, q.qe) / sqrt(a.vsq * q.qsq)"
    s"""WITH $ivfCentroidCtes,
       |assigned AS (SELECT vec_id, e, vsq, centroid_id FROM (
       |  SELECT v.vec_id, v.e, v.vsq, c.centroid_id,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${ivfD2("v.e", "v.vsq")}, c.centroid_id) AS rn
       |  FROM v CROSS JOIN cents c) t WHERE rn = 1),
       |probes AS (SELECT query_id, qe, qsq, centroid_id FROM (
       |  SELECT v.vec_id AS query_id, v.e AS qe, v.vsq AS qsq, c.centroid_id,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${ivfD2("v.e", "v.vsq")}, c.centroid_id) AS rn
       |  FROM v CROSS JOIN cents c WHERE v.vec_id < 10) t WHERE rn <= 2),
       |scored AS (SELECT q.query_id, a.vec_id AS neighbor_id,
       |    round($cos, 6) AS cosine
       |  FROM assigned a JOIN probes q USING (centroid_id)
       |  WHERE a.vec_id <> q.query_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS rn FROM scored)
       |SELECT query_id, neighbor_id, cosine, rn FROM ranked
       |WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin
  }

  /** Full DuckDB replay of the PQ-ADC top-k: √N-strided sample
    * codebooks per 16-dim subspace, L2² nearest-code assignment (tie →
    * lower code), ADC = the four per-subspace LUT partials added in
    * fixed order — the same operand order as the Spark side, so raw
    * doubles are bit-comparable before the round. */
  private val pqOracle: String = {
    def l2sq(v: String) =
      s"list_sum(list_transform($v::DOUBLE[], x -> x * x)) " +
        s"- 2.0 * list_dot_product($v::DOUBLE[], c.csub::DOUBLE[]) + c.csq"
    s"""WITH n AS (SELECT greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)) AS stride
       |  FROM embeddings),
       |cb AS MATERIALIZED (SELECT e.vec_id AS code, j,
       |    e.embedding[j*16+1 : j*16+16] AS csub,
       |    ${sumSqSql("e.embedding[j*16+1 : j*16+16]")} AS csq
       |  FROM embeddings e, n, unnest(range(0, 4)) AS u(j)
       |  WHERE e.vec_id % n.stride = 0),
       |vs AS (SELECT vec_id, j, embedding[j*16+1 : j*16+16] AS vsub
       |  FROM embeddings, unnest(range(0, 4)) AS u(j)),
       |assigned AS (SELECT vec_id, j, code FROM (
       |  SELECT v.vec_id, v.j, c.code,
       |    row_number() OVER (PARTITION BY v.vec_id, v.j
       |      ORDER BY ${l2sq("v.vsub")}, c.code) AS rn
       |  FROM vs v JOIN cb c USING (j)) WHERE rn = 1),
       |lut AS (SELECT q.vec_id AS query_id, q.j, c.code, ${l2sq("q.qsub")} AS pd
       |  FROM (SELECT vec_id, j, embedding[j*16+1 : j*16+16] AS qsub
       |        FROM embeddings, unnest(range(0, 4)) AS u(j) WHERE vec_id < 10) q
       |  JOIN cb c USING (j)),
       |adc AS (SELECT l.query_id, a.vec_id AS neighbor_id,
       |    round(sum(CASE WHEN a.j = 0 THEN pd END)
       |        + sum(CASE WHEN a.j = 1 THEN pd END)
       |        + sum(CASE WHEN a.j = 2 THEN pd END)
       |        + sum(CASE WHEN a.j = 3 THEN pd END), 6) AS adc
       |  FROM assigned a JOIN lut l ON l.j = a.j AND l.code = a.code
       |  WHERE a.vec_id <> l.query_id GROUP BY 1, 2)
       |SELECT query_id, neighbor_id, adc, rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc, neighbor_id) AS rn FROM adc) t
       |WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin
  }

  /** Full DuckDB replay of IVF-PQ (IVFADC): the trained-quantizer cell
    * restriction composed with the PQ codebook/LUT chains — candidates
    * are probed-cell members only, scored purely from codes. CTE names
    * prefixed pq* so the block composes with [[ivfCentroidCtes]]
    * without collisions. */
  private val ivfPqOracle: String = {
    def l2sq(v: String) =
      s"list_sum(list_transform($v::DOUBLE[], x -> x * x)) " +
        s"- 2.0 * list_dot_product($v::DOUBLE[], c.csub::DOUBLE[]) + c.csq"
    s"""WITH $ivfCentroidCtes,
       |cells AS (SELECT vec_id, centroid_id FROM (
       |  SELECT v.vec_id, c.centroid_id,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${ivfD2("v.e", "v.vsq")}, c.centroid_id) AS rn
       |  FROM v CROSS JOIN cents c) t WHERE rn = 1),
       |probes AS (SELECT query_id, centroid_id FROM (
       |  SELECT v.vec_id AS query_id, c.centroid_id,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${ivfD2("v.e", "v.vsq")}, c.centroid_id) AS rn
       |  FROM v CROSS JOIN cents c WHERE v.vec_id < 10) t WHERE rn <= 2),
       |cand AS (SELECT p.query_id, cl.vec_id
       |  FROM cells cl JOIN probes p USING (centroid_id)
       |  WHERE cl.vec_id <> p.query_id),
       |pqn AS (SELECT greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)) AS stride
       |  FROM embeddings),
       |pqcb AS MATERIALIZED (SELECT e.vec_id AS code, j,
       |    e.embedding[j*16+1 : j*16+16] AS csub,
       |    ${sumSqSql("e.embedding[j*16+1 : j*16+16]")} AS csq
       |  FROM embeddings e, pqn, unnest(range(0, 4)) AS u(j)
       |  WHERE e.vec_id % pqn.stride = 0),
       |pqvs AS (SELECT vec_id, j, embedding[j*16+1 : j*16+16] AS vsub
       |  FROM embeddings, unnest(range(0, 4)) AS u(j)),
       |pqcodes AS MATERIALIZED (SELECT vec_id, j, code FROM (
       |  SELECT vv.vec_id, vv.j, c.code,
       |    row_number() OVER (PARTITION BY vv.vec_id, vv.j
       |      ORDER BY ${l2sq("vv.vsub")}, c.code) AS rn
       |  FROM pqvs vv JOIN pqcb c USING (j)) t WHERE rn = 1),
       |pqlut AS (SELECT q.vec_id AS query_id, q.j, c.code, ${l2sq("q.qsub")} AS pd
       |  FROM (SELECT vec_id, j, embedding[j*16+1 : j*16+16] AS qsub
       |        FROM embeddings, unnest(range(0, 4)) AS u(j) WHERE vec_id < 10) q
       |  JOIN pqcb c USING (j)),
       |adc AS (SELECT cd.query_id, a.vec_id AS neighbor_id,
       |    round(sum(CASE WHEN a.j = 0 THEN pd END)
       |        + sum(CASE WHEN a.j = 1 THEN pd END)
       |        + sum(CASE WHEN a.j = 2 THEN pd END)
       |        + sum(CASE WHEN a.j = 3 THEN pd END), 6) AS adc
       |  FROM cand cd JOIN pqcodes a ON a.vec_id = cd.vec_id
       |  JOIN pqlut l ON l.query_id = cd.query_id AND l.j = a.j
       |    AND l.code = a.code
       |  GROUP BY 1, 2)
       |SELECT query_id, neighbor_id, adc, rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc, neighbor_id) AS rn FROM adc) t
       |WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin
  }

  /** Recall@10 of every ANN family against the brute-force ground
    * truth — the self-evaluation number a 100-TB pipeline tunes
    * bands/nProbe/m by. Because all four families are deterministic
    * and replayable, the ENTIRE comparison is oracle-expressible: the
    * three family replays run as subqueries against a brute-force
    * truth CTE. Recall stats stay integer hit-counts until one final
    * division, so both engines emit bit-identical doubles. */
  private val annRecallOracle: String =
    s"""WITH truth AS (
       |  SELECT query_id, neighbor_id FROM (
       |    WITH queries AS (SELECT vec_id AS query_id, embedding AS qe
       |        FROM embeddings WHERE vec_id < 10),
       |    scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
       |      round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS cosine
       |      FROM embeddings e CROSS JOIN queries q
       |      WHERE e.vec_id <> q.query_id)
       |    SELECT query_id, neighbor_id FROM (
       |      SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, neighbor_id) AS rn FROM scored) t
       |    WHERE rn <= 10) t),
       |lshk AS (SELECT query_id, neighbor_id FROM ($annLshOracle) t),
       |ivfk AS (SELECT query_id, neighbor_id FROM ($ivfOracle) t),
       |pqk AS (SELECT query_id, neighbor_id FROM ($pqOracle) t),
       |fams AS (SELECT 'lsh' AS family, query_id, neighbor_id FROM lshk
       |  UNION ALL SELECT 'ivf', query_id, neighbor_id FROM ivfk
       |  UNION ALL SELECT 'pq', query_id, neighbor_id FROM pqk),
       |hits AS (SELECT f.family, t.query_id, count(*) AS n_hits
       |  FROM truth t JOIN fams f ON f.query_id = t.query_id
       |    AND f.neighbor_id = t.neighbor_id
       |  GROUP BY 1, 2),
       |grid AS (SELECT family, query_id
       |  FROM (VALUES ('lsh'), ('ivf'), ('pq')) v(family)
       |  CROSS JOIN (SELECT DISTINCT query_id FROM truth) q),
       |r AS (SELECT g.family, g.query_id, coalesce(h.n_hits, 0) AS n_hits
       |  FROM grid g LEFT JOIN hits h ON h.family = g.family
       |    AND h.query_id = g.query_id)
       |SELECT family, count(*) AS n_queries,
       |  round(sum(n_hits) * 1.0 / (count(*) * 10), 6) AS avg_recall,
       |  round(min(n_hits) / 10.0, 6) AS min_recall
       |FROM r GROUP BY family ORDER BY family""".stripMargin

  /** Operating-curve replay: recall@10 AND candidate-set cost for LSH
    * bands ∈ {4,8,16} and IVF nProbe ∈ {1,2,4} — the sweep that turns
    * [[annRecallOracle]]'s single point into the curve bands/nProbe are
    * actually chosen from. Truth, band buckets, cells, and cosine
    * ranking replay the exact Spark chain (same plane literal, same
    * round-6-then-rank contract); recall and candidate counts stay
    * integers until one final division. */
  private val annSweepOracle: String = {
    val cos = "list_dot_product(c.embedding::DOUBLE[], q.qe::DOUBLE[]) / " +
      s"sqrt(${sumSqSql("c.embedding")} * ${sumSqSql("q.qe")})"
    def lshCand(nb: Int) =
      s"""cand_lsh_$nb AS (SELECT DISTINCT qb.query_id, cb.vec_id AS neighbor_id
         |  FROM (SELECT vec_id, b AS band, ${bucketExpr("embedding", nb)} AS bucket
         |     FROM embeddings, pl, unnest(range(0, $nb)) AS u(b)) cb
         |  JOIN (SELECT vec_id AS query_id, b AS band,
         |        ${bucketExpr("embedding", nb)} AS bucket
         |     FROM embeddings, pl, unnest(range(0, $nb)) AS u(b)
         |     WHERE vec_id < 10) qb
         |  USING (band, bucket) WHERE cb.vec_id <> qb.query_id)""".stripMargin
    def ivfCand(p: Int) =
      s"""cand_ivf_$p AS (SELECT q.query_id, a.vec_id AS neighbor_id
         |  FROM assigned a JOIN (SELECT query_id, centroid_id FROM probed
         |    WHERE rn <= $p) q USING (centroid_id)
         |  WHERE a.vec_id <> q.query_id)""".stripMargin
    def cfg(family: String, param: Int) = {
      val cand = s"cand_${family}_$param"
      s"""topk_${family}_$param AS (SELECT query_id, neighbor_id FROM (
         |  SELECT cd.query_id, cd.neighbor_id,
         |    row_number() OVER (PARTITION BY cd.query_id
         |      ORDER BY round($cos, 6) DESC, cd.neighbor_id) AS rn
         |  FROM $cand cd
         |   JOIN embeddings c ON c.vec_id = cd.neighbor_id
         |   JOIN qv q ON q.query_id = cd.query_id) t WHERE rn <= 10),
         |row_${family}_$param AS (
         |  SELECT '$family' AS family, $param AS param,
         |    count(*) AS n_queries,
         |    round(sum(n_hits) * 1.0 / (count(*) * 10), 6) AS avg_recall,
         |    round(min(n_hits) / 10.0, 6) AS min_recall,
         |    round(sum(n_cand) * 1.0 / count(*), 6) AS avg_candidates,
         |    round(sum(n_cand) * 1.0 /
         |      (count(*) * (SELECT count(*) - 1 FROM embeddings)), 6) AS scan_frac
         |  FROM (SELECT qv.query_id, coalesce(h.n_hits, 0) AS n_hits,
         |      coalesce(cc.n_cand, 0) AS n_cand
         |    FROM qv
         |    LEFT JOIN (SELECT t.query_id, count(*) AS n_hits FROM truth t
         |      JOIN topk_${family}_$param k
         |        ON k.query_id = t.query_id AND k.neighbor_id = t.neighbor_id
         |      GROUP BY 1) h ON h.query_id = qv.query_id
         |    LEFT JOIN (SELECT query_id, count(*) AS n_cand FROM $cand
         |      GROUP BY 1) cc ON cc.query_id = qv.query_id) t)""".stripMargin
    }
    val configs = Seq("lsh" -> 4, "lsh" -> 8, "lsh" -> 16,
      "ivf" -> 1, "ivf" -> 2, "ivf" -> 4)
    s"""WITH pl AS (SELECT $planesLiteral AS P),
       |qv AS (SELECT vec_id AS query_id, embedding AS qe
       |  FROM embeddings WHERE vec_id < 10),
       |truth AS (SELECT query_id, neighbor_id FROM (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.query_id ORDER BY
       |      round(list_cosine_similarity(e.embedding::DOUBLE[],
       |        q.qe::DOUBLE[]), 6) DESC, e.vec_id) AS rn
       |  FROM embeddings e CROSS JOIN qv q WHERE e.vec_id <> q.query_id) t
       |  WHERE rn <= 10),
       |$ivfCentroidCtes,
       |assigned AS (SELECT vec_id, centroid_id FROM (
       |  SELECT v.vec_id, c.centroid_id,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${ivfD2("v.e", "v.vsq")}, c.centroid_id) AS rn
       |  FROM v CROSS JOIN cents c) t WHERE rn = 1),
       |probed AS (SELECT query_id, centroid_id, rn FROM (
       |  SELECT v.vec_id AS query_id, c.centroid_id,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${ivfD2("v.e", "v.vsq")}, c.centroid_id) AS rn
       |  FROM v CROSS JOIN cents c WHERE v.vec_id < 10) t),
       |${Seq(4, 8, 16).map(lshCand).mkString(",\n")},
       |${Seq(1, 2, 4).map(ivfCand).mkString(",\n")},
       |${configs.map { case (f, p) => cfg(f, p) }.mkString(",\n")}
       |${configs.map { case (f, p) => s"SELECT * FROM row_${f}_$p" }
          .mkString("\nUNION ALL ")}
       |ORDER BY family, param""".stripMargin
  }

  /** Full DuckDB replay of the MinHash+LSH pipeline: 3-gram shingles →
    * md5-int hashes → 32 linear-permutation minhashes → 8 Horner band
    * buckets → in-bucket pairs (2..1000 cap) → exact Jaccard verify.
    * The permutation constants are interpolated from the SAME
    * [[graft.llm.Dedup.permConstants]] the Spark side uses, so the two
    * engines share one hash family by construction.
    */
  /** CTE chain computing the verified minhash pair set as `pairs(id1,
    * id2, jaccard)` — shared by the minhash query oracle and the
    * survivors oracle (which clusters these pairs). */
  private[graft] def minhashPairsCtes(src: String,
                                      threshold: Double = 0.7): String = {
    val P = Dedup.HashP
    val params = (0 until 32).map { i =>
      val (a, b) = Dedup.permConstants(i); s"[$a,$b]"
    }.mkString("[", ",", "]")
    s"""${shingleCtes(src)},
       |hx AS (SELECT doc_id, shingles,
       |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in shingles] AS xs FROM sh),
       |sig AS (SELECT doc_id,
       |  [list_min([(p[1] * x + p[2]) % $P for x in xs]) for p in $params] AS mh
       |  FROM hx),
       |banded AS (SELECT doc_id, b AS band,
       |  list_reduce(mh[b*4+1 : b*4+4], (acc, x) -> (acc * 131 + x) % $P) AS bucket
       |  FROM sig, unnest(range(0, 8)) AS u(b)),
       |$bucketCandCtes,
       |pairs AS (SELECT id1, id2,
       |  round(len(list_intersect(s1.shingles, s2.shingles)) * 1.0 /
       |        len(list_distinct(list_concat(s1.shingles, s2.shingles))), 6) AS jaccard
       |FROM cand
       | JOIN hx s1 ON s1.doc_id = cand.id1
       | JOIN hx s2 ON s2.doc_id = cand.id2
       |WHERE len(list_intersect(s1.shingles, s2.shingles)) * 1.0 /
       |      len(list_distinct(list_concat(s1.shingles, s2.shingles))) >= $threshold)""".stripMargin
  }

  private val minhashOracle: String =
    s"""WITH ${minhashPairsCtes("documents")}
       |SELECT id1, id2, jaccard FROM pairs ORDER BY id1, id2""".stripMargin

  /** Survivors over the minhash pair set: WITH RECURSIVE transitive
    * closure (min reachable id = component), keep each cluster's min-id
    * member plus every unpaired doc — the replay of
    * Dedup.connectedComponents + dedupSurvivors on sketch pairs. */
  private val survivorsOracle: String =
    s"""WITH RECURSIVE ${minhashPairsCtes("documents")},
       |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
       |  UNION SELECT id2, id1 FROM pairs),
       |reach(id, comp) AS (
       |  SELECT src, src FROM (SELECT DISTINCT src FROM edges) t
       |  UNION
       |  SELECT e.src, r.comp FROM edges e JOIN reach r ON r.id = e.dst),
       |cc AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
       |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
       |WHERE d.doc_id NOT IN (SELECT id FROM cc WHERE id <> component)
       |ORDER BY d.doc_id""".stripMargin

  /** Full DuckDB replay of the END-TO-END curation pipeline
    * (CurationPipeline.run with default Config): non-empty-text
    * expectation → Gopher quality keep → minhash-survivor dedup ON THE
    * KEPT SET → 64/48 sliding-window chunking with provenance. Composes
    * the gopher, minhash-pair, recursive-clustering, and chunking
    * replays over a chained source. */
  private val curationOracle: String =
    s"""WITH RECURSIVE src AS (
       |  SELECT doc_id, text FROM documents WHERE length(text) > 0),
       |f AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM src),
       |wc AS (SELECT doc_id, w, count(*) AS cnt FROM f GROUP BY doc_id, w),
       |m AS (SELECT doc_id, max(cnt) AS max_tok FROM wc GROUP BY doc_id),
       |gop AS (SELECT s.doc_id,
       |  len(string_split(s.text, ' '))::BIGINT AS n_tokens,
       |  round(m.max_tok * 1.0 / len(string_split(s.text, ' ')), 6) AS rep_ratio,
       |  round(length(regexp_replace(s.text, '[^a-z]', '', 'g')) * 1.0
       |    / length(s.text), 6) AS alpha_ratio,
       |  (len(string_split(s.text, ' ')) >= 30
       |    AND m.max_tok * 1.0 / len(string_split(s.text, ' ')) <= 0.12
       |    AND length(regexp_replace(s.text, '[^a-z]', '', 'g')) * 1.0
       |      / length(s.text) >= 0.81) AS keep
       |  FROM src s JOIN m ON m.doc_id = s.doc_id),
       |kept AS (SELECT s.doc_id, s.text, g.n_tokens, g.rep_ratio, g.alpha_ratio
       |  FROM src s JOIN gop g ON g.doc_id = s.doc_id WHERE g.keep),
       |${minhashPairsCtes("kept")},
       |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
       |  UNION SELECT id2, id1 FROM pairs),
       |reach(id, comp) AS (
       |  SELECT src, src FROM (SELECT DISTINCT src FROM edges) e0
       |  UNION
       |  SELECT e.src, r.comp FROM edges e JOIN reach r ON r.id = e.dst),
       |cc AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
       |survivors AS (SELECT k.* FROM kept k
       |  WHERE k.doc_id NOT IN (SELECT id FROM cc WHERE id <> component)),
       |ch AS (SELECT doc_id, string_split(text, ' ') AS ctok,
       |    n_tokens, rep_ratio, alpha_ratio,
       |  unnest(range(0, greatest(1,
       |    1 + CAST(ceil((len(string_split(text, ' ')) - 64) / 48.0) AS BIGINT))))
       |    AS chunk_idx
       |  FROM survivors)
       |SELECT doc_id, chunk_idx,
       |  len(ctok[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS n_chunk_tokens,
       |  md5(array_to_string(ctok[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' '))
       |    AS chunk_md5,
       |  n_tokens, rep_ratio, alpha_ratio
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  /** Full DuckDB replay of the SimHash pipeline: per-shingle 64 feature
    * bits from two md5 halves → per-bit majority counts → four 16-bit
    * signature parts → part-equality banding → Hamming ≤ 6 verify.
    * The 64 bit-sum and 16×4 part expressions are generated from the
    * same loop structure as Dedup.simhashParts.
    */
  private val simhashOracle: String = {
    val sums = (0 until 64).map { i =>
      val src = if (i < 32) s"(h1 >> $i)" else s"(h2 >> ${i - 32})"
      s"sum($src & 1) AS c$i"
    }.mkString(", ")
    val parts = (0 until 4).map { p =>
      val bits = (0 until 16).map { b =>
        s"(CASE WHEN c${p * 16 + b} * 2 > n THEN ${1 << b} ELSE 0 END)"
      }.mkString(" + ")
      s"($bits) AS part$p"
    }.mkString(", ")
    val hamming = (0 until 4).map { p =>
      s"bit_count(xor(p1.part$p, p2.part$p))"
    }.mkString(" + ")
    s"""WITH ${shingleCtes("documents")},
       |g AS (SELECT doc_id,
       |  ('0x' || substr(m, 1, 8))::BIGINT AS h1,
       |  ('0x' || substr(m, 9, 8))::BIGINT AS h2
       |  FROM (SELECT doc_id, unnest([md5(s) for s in shingles]) AS m FROM sh)),
       |c AS (SELECT doc_id, count(*) AS n, $sums FROM g GROUP BY doc_id),
       |parts AS (SELECT doc_id, $parts FROM c),
       |banded AS (SELECT doc_id, b AS band,
       |  [part0, part1, part2, part3][b + 1] AS bucket
       |  FROM parts, unnest(range(0, 4)) AS u(b)),
       |$bucketCandCtes
       |SELECT id1, id2, $hamming AS hamming
       |FROM cand
       | JOIN parts p1 ON p1.doc_id = cand.id1
       | JOIN parts p2 ON p2.doc_id = cand.id2
       |WHERE $hamming <= 6
       |ORDER BY id1, id2""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    // ---- deduplication -------------------------------------------------
    // Exact dedup: group on content (at 100 TB: group on a 256-bit content
    // hash so the shuffle carries 32 bytes/row, not the document).
    q("q_dedup_exact",
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d).groupBy(md5(col("text")))
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    },

    // Word-level Jaccard near-dup, exact, via explode+self-join on token —
    // the oracle-checkable baseline for the sketch-based variants below.
    // Bounded to a doc_id window to keep candidate pairs quadratic-safe.
    q("q_dedup_jaccard",
      """WITH words AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE doc_id < 200
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM words GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS overlap
        |  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id1, id2,
        |  round(overlap * 1.0 / (s1.sz + s2.sz - overlap), 6) AS jaccard
        |FROM inter
        | JOIN sizes s1 ON s1.doc_id = id1
        | JOIN sizes s2 ON s2.doc_id = id2
        |WHERE overlap * 1.0 / (s1.sz + s2.sz - overlap) >= 0.9
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      Dedup.wordJaccardPairs(documents(s, d).filter(col("doc_id") < 200), 0.9)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1", "id2")
    },

    // MinHash+LSH near-dup: shingle → 32 minhashes → 8 bands × 4 rows →
    // band-bucket join (candidates ~linear, never all-pairs) → exact
    // 3-gram Jaccard verify ≥ 0.7. The hash family is replayable integer
    // math, so the ENTIRE sketch pipeline is oracle-checked (see
    // minhashOracle above), not rows-only.
    q("q_dedup_minhash", minhashOracle) { (s, d) =>
      Dedup.minhashPairs(documents(s, d), threshold = 0.7)
        .orderBy("id1", "id2")
    },

    // SimHash near-dup: 64-bit signature, 4×16-bit band bucketing,
    // Hamming distance ≤ 6 verify — replayable md5-half feature bits, so
    // the signature/banding/verify pipeline is oracle-checked end to end.
    q("q_dedup_simhash", simhashOracle) { (s, d) =>
      Dedup.simhashPairs(documents(s, d), maxHamming = 6)
        .orderBy("id1", "id2")
    },

    // Embedding-cosine near-dup, exact ground truth (bounded all-pairs
    // with the native dot expression; see embeddingCosinePairsLsh for
    // the scale path).
    q("q_dedup_embedding_exact",
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        | round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 300 AND b.vec_id < 300
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      Dedup.embeddingCosinePairsExact(
          embeddings(s, d).filter(col("vec_id") < 300), threshold = 0.35)
        .orderBy("id1", "id2")
    },

    // Embedding-cosine near-dup via hyperplane LSH buckets (recall-tuned
    // banding + exact verify). The hyperplanes are a fixed-seed constant
    // matrix interpolated into the oracle, so the candidate generation
    // AND the verify replay exactly — full oracle check.
    q("q_dedup_embedding", embeddingLshOracle) { (s, d) =>
      Dedup.embeddingCosinePairsLsh(embeddings(s, d), threshold = 0.3)
        .orderBy("id1", "id2")
    },

    // End-to-end dedup: minhash pairs → connected components → canonical
    // survivor per cluster + all unpaired docs. With the replayable
    // minhash family, the oracle replays the WHOLE chain — sketch,
    // verify, recursive-CTE clustering, survivor selection.
    q("q_dedup_survivors", survivorsOracle) { (s, d) =>
      Dedup.dedupSurvivors(
          documents(s, d).select("doc_id", "lang", "n_chars"),
          Dedup.minhashPairs(documents(s, d), threshold = 0.7))
        .orderBy("doc_id")
    },

    // End-to-end curation pipeline (expectations → Gopher quality →
    // minhash-survivor dedup → sliding-window chunking, with
    // provenance): the full training-data flow, oracle-replayed as one
    // composed CTE chain. chunk_text hashed to md5 on both sides to
    // keep the compare payload small.
    q("q_curation_pipeline", curationOracle) { (s, d) =>
      graft.pipelines.CurationPipeline.run(documents(s, d)).chunks
        .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
          md5(col("chunk_text").cast("binary")).as("chunk_md5"),
          col("n_tokens"), col("rep_ratio"), col("alpha_ratio"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ---- similarity search --------------------------------------------
    // Brute-force cosine top-k: K query vectors broadcast against the
    // corpus — the exact baseline every ANN variant is measured against.
    q("q_sim_topk",
      """WITH queries AS (
        |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10
        |), scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS cosine
        |  FROM embeddings e CROSS JOIN queries q
        |  WHERE e.vec_id <> q.query_id)
        |SELECT query_id, neighbor_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rn FROM scored) t
        |WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin) { (s, d) =>
      Similarity.bruteForceTopK(
          embeddings(s, d),
          embeddings(s, d).filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
          k = 10)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .orderBy(col("query_id"), col("cosine").desc, col("neighbor_id"))
        .select("query_id", "neighbor_id", "cosine")
    },

    // LSH-bucketed ANN: deterministic random-hyperplane signatures,
    // multi-probe band join — the scale path. Fully oracle-checked via
    // the interpolated plane matrix; recall vs brute force additionally
    // asserted in SimilaritySpec.
    q("q_sim_ann_lsh", annLshOracle) { (s, d) =>
      Similarity.lshTopK(
          embeddings(s, d),
          embeddings(s, d).filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
          k = 10)
        .orderBy("query_id", "rn")
    },

    // IVF-style ANN: TRAINED coarse quantizer (k-means, nlist = ⌊√N⌋,
    // float-quantized Lloyd update — round 13, replacing the r9-12
    // deterministic sample) + argmin-L2² cells + nProbe probing. The
    // Clustering determinism contract makes the whole
    // train/assign/probe/rerank pipeline oracle-replayable; cosine
    // consistency vs brute force additionally asserted in LlmSpec.
    q("q_sim_ivf", ivfOracle) { (s, d) =>
      Similarity.ivfTopK(
          embeddings(s, d),
          embeddings(s, d).filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
          k = 10)
        .orderBy("query_id", "rn")
    },

    // Product-quantization ANN (ADC): subspace codes + per-query lookup
    // tables — the memory-scale ANN path (codes instead of raw vectors
    // in the scan). Deterministic sample codebooks make the whole
    // assign/LUT/ADC pipeline oracle-replayable; ordering invariants
    // additionally asserted in LlmSpec.
    // Distributed k-means (2 Lloyd rounds, k=4, deterministic first-k
    // init): assignment = the IVF argmin window over a k-row centroid
    // broadcast; update = one (cluster, dim)-keyed aggregation whose
    // means are FLOAT-QUANTIZED on both engines, collapsing the two
    // engines' ~1e-15 avg() accumulation skew to identical 24-bit
    // values — every subsequent distance is bit-identical again. See
    // llm/Clustering.scala for the full determinism contract.
    q("q_kmeans",
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
        |    list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) AS vsq
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cluster, e AS ce, vsq AS cesq
        |  FROM (SELECT * FROM v ORDER BY vec_id LIMIT 4)),
        |r1 AS (SELECT v.vec_id, v.e, c0.cluster,
        |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |      v.vsq - 2.0 * list_dot_product(v.e, c0.ce) + c0.cesq,
        |      c0.cluster) AS rn
        |  FROM v CROSS JOIN c0),
        |a1 AS (SELECT vec_id, e, cluster FROM r1 WHERE rn = 1),
        |m1 AS (SELECT cluster, j, CAST(CAST(avg(e[j]) AS FLOAT) AS DOUBLE) AS m
        |  FROM a1, unnest(range(1, 65)) AS u(j) GROUP BY 1, 2),
        |c1 AS (SELECT cluster, array_agg(m ORDER BY j) AS ce FROM m1 GROUP BY 1),
        |c1s AS (SELECT cluster, ce,
        |    list_sum(list_transform(ce, x -> x * x)) AS cesq FROM c1),
        |r2 AS (SELECT v.vec_id, c1s.cluster,
        |    v.vsq - 2.0 * list_dot_product(v.e, c1s.ce) + c1s.cesq AS dist2,
        |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |      v.vsq - 2.0 * list_dot_product(v.e, c1s.ce) + c1s.cesq,
        |      c1s.cluster) AS rn
        |  FROM v CROSS JOIN c1s)
        |SELECT cluster, count(*) AS n_members, round(sum(dist2), 2) AS inertia,
        |  round(avg(dist2), 6) AS mean_d2
        |FROM r2 WHERE rn = 1 GROUP BY cluster ORDER BY cluster""".stripMargin) { (s, d) =>
      Clustering.kmeans(embeddings(s, d), k = 4, rounds = 2)
    },

    // SemDedup (Abbas et al. 2023): k-means assignment + within-cluster
    // cosine threshold, keep-min-id survivors — semantic near-dup
    // pruning whose pair set is bounded per cluster, never all-pairs
    // (k grows ∝ N at scale; see Dedup.semDedup). The oracle replays
    // the full chain: both Lloyd-quantized assignment rounds, the
    // within-cluster pair scan, and the min-id dup rule. Raw (unrounded)
    // cosine threshold compare on both engines — the dot/norm pipeline
    // is bit-identical by the Clustering determinism contract, and the
    // nearest fixture cosine sits ~4e-4 from the 0.4 cut.
    q("q_semdedup",
      """WITH v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS e,
        |    list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) AS vsq
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cluster, e AS ce, vsq AS cesq
        |  FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)),
        |r1 AS (SELECT v.vec_id, v.e, c0.cluster,
        |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |      v.vsq - 2.0 * list_dot_product(v.e, c0.ce) + c0.cesq,
        |      c0.cluster) AS rn
        |  FROM v CROSS JOIN c0),
        |a1 AS (SELECT vec_id, e, cluster FROM r1 WHERE rn = 1),
        |m1 AS (SELECT cluster, j, CAST(CAST(avg(e[j]) AS FLOAT) AS DOUBLE) AS m
        |  FROM a1, unnest(range(1, 65)) AS u(j) GROUP BY 1, 2),
        |c1 AS (SELECT cluster, array_agg(m ORDER BY j) AS ce FROM m1 GROUP BY 1),
        |c1s AS (SELECT cluster, ce,
        |    list_sum(list_transform(ce, x -> x * x)) AS cesq FROM c1),
        |r2 AS (SELECT v.vec_id, c1s.cluster,
        |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |      v.vsq - 2.0 * list_dot_product(v.e, c1s.ce) + c1s.cesq,
        |      c1s.cluster) AS rn
        |  FROM v CROSS JOIN c1s),
        |a2 AS MATERIALIZED (SELECT vec_id, cluster FROM r2 WHERE rn = 1),
        |dup AS (SELECT DISTINCT b.vec_id
        |  FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  JOIN v va ON va.vec_id = a.vec_id
        |  JOIN v vb ON vb.vec_id = b.vec_id
        |  WHERE list_dot_product(va.e, vb.e) / sqrt(va.vsq * vb.vsq) >= 0.4)
        |SELECT a2.vec_id AS vec_id, a2.cluster AS cluster,
        |  (a2.vec_id IN (SELECT vec_id FROM dup)) AS is_dup
        |FROM a2 ORDER BY vec_id""".stripMargin) { (s, d) =>
      Dedup.semDedup(embeddings(s, d), k = 8, rounds = 2, threshold = 0.4)
        .orderBy("vec_id")
    },

    // Token-window semantic near-dup: chunk-level boilerplate detection
    // across documents (32-token windows, stride 24 — the fixture has no
    // sentence delimiters, so fixed token windows stand in for
    // paragraphs). Candidates = chunks sharing a winnowing
    // min-fingerprint (capped equality buckets, never chunk×chunk);
    // verify = sparse hashing-trick cosine on candidates only. Every
    // step is the replayable md5-int integer family, so the oracle
    // re-runs the entire chain: chunking, per-chunk fingerprints,
    // bucket pairs, and the sparse-cosine verify.
    q("q_chunk_semdedup",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |c AS (SELECT doc_id, tok,
        |  unnest(range(0, greatest(1,
        |    1 + CAST(ceil((len(tok) - 32) / 24.0) AS BIGINT)))) AS chunk_idx
        |  FROM t),
        |ch AS MATERIALIZED (SELECT doc_id * 10000 + chunk_idx AS cid, doc_id,
        |  chunk_idx, tok[chunk_idx * 24 + 1 : chunk_idx * 24 + 32] AS ctok FROM c),
        |h AS (SELECT cid, ctok,
        |  [('0x' || substr(md5(x), 1, 8))::BIGINT % 1000000007 for x in ctok] AS th
        |  FROM ch),
        |w AS (SELECT cid, len(ctok) AS n, th,
        |  [list_reduce(th[i+1:i+8], (acc, x) -> (acc*131 + x) % 1000000007)
        |   for i in range(0, greatest(len(ctok) - 7, 0))] AS wh FROM h),
        |fp AS MATERIALIZED (SELECT cid,
        |  CASE WHEN n >= 8 THEN list_min(wh)
        |       ELSE list_reduce(th, (acc, x) -> (acc*131 + x) % 1000000007)
        |  END AS fingerprint FROM w),
        |buckets AS (SELECT fingerprint, list_sort(list(cid)) AS ids FROM fp
        |  GROUP BY fingerprint HAVING count(*) BETWEEN 2 AND 1000),
        |cand AS (SELECT DISTINCT a.ca, b.cb FROM
        |    (SELECT fingerprint, unnest(ids) AS ca FROM buckets) a
        |  JOIN (SELECT fingerprint, unnest(ids) AS cb FROM buckets) b
        |    ON a.fingerprint = b.fingerprint AND a.ca < b.cb),
        |bk AS MATERIALIZED (SELECT cid,
        |  ('0x' || substr(md5(t), 1, 8))::BIGINT % 32 AS b, count(*) AS cnt
        |  FROM (SELECT cid, unnest(ctok) AS t FROM ch) GROUP BY 1, 2),
        |nm AS (SELECT cid, sum(cnt * cnt) AS n2 FROM bk GROUP BY 1),
        |cd AS MATERIALIZED (SELECT cand.ca, cand.cb, ma.doc_id AS doc_a,
        |    ma.chunk_idx AS chunk_a, mb.doc_id AS doc_b, mb.chunk_idx AS chunk_b
        |  FROM cand JOIN ch ma ON ma.cid = cand.ca
        |  JOIN ch mb ON mb.cid = cand.cb
        |  WHERE ma.doc_id <> mb.doc_id),
        |dots AS (SELECT cd.ca, cd.cb, sum(ba.cnt * bb.cnt) AS dp
        |  FROM cd JOIN bk ba ON ba.cid = cd.ca
        |  JOIN bk bb ON bb.cid = cd.cb AND bb.b = ba.b
        |  GROUP BY 1, 2)
        |SELECT doc_a, chunk_a, doc_b, chunk_b,
        |  round(dp / sqrt(na.n2 * nb.n2), 6) AS cosine
        |FROM cd JOIN dots ON dots.ca = cd.ca AND dots.cb = cd.cb
        |JOIN nm na ON na.cid = cd.ca JOIN nm nb ON nb.cid = cd.cb
        |WHERE dp / sqrt(na.n2 * nb.n2) >= 0.8
        |ORDER BY doc_a, chunk_a, doc_b, chunk_b""".stripMargin) { (s, d) =>
      Dedup.chunkSemanticPairs(documents(s, d))
        .orderBy("doc_a", "chunk_a", "doc_b", "chunk_b")
    },

    // Batch parity of the STREAMING content-dedup gate
    // (EventStreams.dedupByContentSignature): the same per-row folded
    // minhash signature, keep-min-doc_id survivor — what the streaming
    // dropDuplicates state converges to when arrival order follows
    // doc_id. The oracle replays the whole signature family (md5-int
    // shingle hashes, 8 linear permutations, Horner fold).
    q("q_dedup_content_sig", {
      val P = Dedup.HashP
      val params = (0 until 8).map { i =>
        val (a, b) = Dedup.permConstants(i); s"[$a,$b]"
      }.mkString("[", ",", "]")
      s"""WITH ${shingleCtes("documents")},
         |hx AS (SELECT doc_id,
         |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in shingles] AS xs FROM sh),
         |sig AS (SELECT doc_id,
         |  list_reduce(
         |    [list_min([(p[1] * x + p[2]) % $P for x in xs]) for p in $params],
         |    (acc, x) -> (acc * 131 + x) % $P) AS content_sig FROM hx)
         |SELECT doc_id, content_sig,
         |  (doc_id = min(doc_id) OVER (PARTITION BY content_sig)) AS kept
         |FROM sig ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val w = Window.partitionBy("content_sig")
      documents(s, d)
        .select(col("doc_id"),
          Dedup.contentSignature(col("text")).as("content_sig"))
        .withColumn("kept", col("doc_id") === min("doc_id").over(w))
        .orderBy("doc_id")
    },

    q("q_sim_pq", pqOracle) { (s, d) =>
      Similarity.pqTopK(
          embeddings(s, d),
          embeddings(s, d).filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
          k = 10)
        .orderBy("query_id", "rn")
    },

    // IVF-PQ (IVFADC, round 13): the composition the component
    // families exist for — the TRAINED coarse quantizer restricts
    // candidates to each query's nProbe cells, PQ-ADC scores ONLY
    // those candidates from their m subspace codes. At scale the two
    // savings multiply: scan_frac of the corpus touched (IVF) × codes
    // instead of raw vectors read (PQ) — the standard billion-vector
    // operating point. Fully oracle-replayed (training chain + cells +
    // codebooks + LUT + candidate-restricted ADC); ADC equality with
    // the flat-scan q_sim_pq on shared candidates is asserted in
    // LlmSpec.
    q("q_sim_ivfpq", ivfPqOracle) { (s, d) =>
      Similarity.ivfPqTopK(
          embeddings(s, d),
          embeddings(s, d).filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
          k = 10)
        .orderBy("query_id", "rn")
    },

    // ANN self-evaluation: recall@10 of LSH buckets, IVF cells, and
    // PQ-ADC codes against the exact brute-force neighbors — the number
    // that decides bands/nProbe/m at production scale. PQ ranks by L2²
    // ADC while truth ranks by cosine (vectors aren't normalized), so
    // its recall is expected to trail the cosine-space families; that
    // gap is itself the measurement. Hit counts stay integers until one
    // final division (bit-identical doubles cross-engine).
    q("q_ann_recall", annRecallOracle) { (s, d) =>
      import s.implicits._
      val emb = embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val truth = Similarity.bruteForceTopK(emb, qs, 10)
        .select("query_id", "neighbor_id")
      def fam(name: String, df: DataFrame) =
        df.select(col("query_id"), col("neighbor_id"))
          .withColumn("family", lit(name))
      val fams = fam("lsh", Similarity.lshTopK(emb, qs, 10))
        .unionByName(fam("ivf", Similarity.ivfTopK(emb, qs, 10)))
        .unionByName(fam("pq", Similarity.pqTopK(emb, qs, 10)))
      val hits = truth.join(fams, Seq("query_id", "neighbor_id"))
        .groupBy("family", "query_id").agg(count(lit(1)).as("n_hits"))
      val grid = qs.select("query_id")
        .crossJoin(broadcast(Seq("lsh", "ivf", "pq").toDF("family")))
      grid.join(hits, Seq("family", "query_id"), "left")
        .select(col("family"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .groupBy("family")
        .agg(count(lit(1)).as("n_queries"),
          round(sum("n_hits") * lit(1.0) / (count(lit(1)) * 10), 6)
            .as("avg_recall"),
          round(min("n_hits") / lit(10.0), 6).as("min_recall"))
        .orderBy("family")
    },

    // ANN operating curve: the bands/nProbe decision table. One row per
    // (family, param) — LSH bands ∈ {4,8,16}, IVF nProbe ∈ {1,2,4} —
    // with recall@10 against brute-force truth AND the candidate-set
    // cost that recall was bought with (avg candidates per query +
    // fraction of the corpus scanned). This is the curve q_ann_recall's
    // single point gets chosen from: at production scale scan_frac IS
    // the query-time read cost, so the operating point is the cheapest
    // param whose recall clears the application's floor. All six
    // configs share one truth pass and (for IVF) one assignment pass;
    // candidate/hit counts stay integers until one final division, so
    // both engines emit bit-identical doubles.
    q("q_ann_sweep", annSweepOracle) { (s, d) =>
      val emb = embeddings(s, d)
      val n = emb.count()
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val truth = Similarity.bruteForceTopK(emb, qs, 10)
        .select("query_id", "neighbor_id")
      val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
      def stats(family: String, param: Int, scored: DataFrame): DataFrame = {
        val topk = scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10).select("query_id", "neighbor_id")
        val perQuery = qs.select("query_id")
          .join(truth.join(topk, Seq("query_id", "neighbor_id"))
            .groupBy("query_id").agg(count(lit(1)).as("n_hits")),
            Seq("query_id"), "left")
          .join(scored.groupBy("query_id").agg(count(lit(1)).as("n_cand")),
            Seq("query_id"), "left")
          .select(coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            coalesce(col("n_cand"), lit(0L)).as("n_cand"))
        perQuery.agg(count(lit(1)).as("n_queries"),
          round(sum("n_hits") * lit(1.0) / (count(lit(1)) * 10), 6)
            .as("avg_recall"),
          round(min("n_hits") / lit(10.0), 6).as("min_recall"),
          round(sum("n_cand") * lit(1.0) / count(lit(1)), 6)
            .as("avg_candidates"),
          round(sum("n_cand") * lit(1.0) / (count(lit(1)) * (n - 1)), 6)
            .as("scan_frac"))
          .select(lit(family).as("family"), lit(param).as("param"),
            col("n_queries"), col("avg_recall"), col("min_recall"),
            col("avg_candidates"), col("scan_frac"))
      }
      // ONE quantizer training shared by every nProbe config (the cut
      // inside ivfCentroids) — the sweep varies the probe count, not
      // the codebook, exactly like a production parameter sweep
      val cents = Similarity.ivfCentroids(emb, n)
      val rows =
        Seq(4, 8, 16).map(b =>
          stats("lsh", b, Similarity.lshScored(emb, qs, 16, b))) ++
        Seq(1, 2, 4).map(p =>
          stats("ivf", p, Similarity.ivfScoredWith(emb, qs, cents, p)))
      rows.reduce(_ unionByName _).orderBy("family", "param")
    },

    // Embedding stats: norm per vector, aggregated per label.
    q("q_embed_stats",
      """SELECT label, count(*) AS n_vecs,
        | round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))), 6) AS avg_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
      embeddings(s, d)
        .select(col("label"), Similarity.l2Norm(col("embedding")).as("norm"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"), round(avg("norm"), 6).as("avg_norm"))
        .orderBy("label")
    },

    // ---- text analysis -------------------------------------------------
    q("q_text_stats",
      """SELECT doc_id,
        | length(text) AS n_chars_computed,
        | len(string_split(text, ' ')) AS n_tokens,
        | len(regexp_extract_all(text, '[a-z0-9]+')) AS n_word_tokens,
        | len(list_filter(string_split(text, ' '), x -> x IN ('the','a'))) AS n_stopwords,
        | round(len(list_filter(string_split(text, ' '), x -> x IN ('the','a'))) * 1.0
        |   / len(string_split(text, ' ')), 6) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.textStats(documents(s, d)).orderBy("doc_id")
    },

    q("q_lang_quality",
      """SELECT lang, count(*) AS n_docs,
        | round(avg(n_chars), 6) AS avg_chars,
        | round(avg(len(string_split(text, ' '))), 6) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("n_chars"), 6).as("avg_chars"),
          round(avg(size(split(col("text"), " "))), 6).as("avg_tokens"))
        .orderBy("lang")
    },

    // Composite quality score: length saturation + content-word ratio +
    // alphabetic density — the filter signal a curation pipeline
    // thresholds on (weights are illustrative; the contract is the
    // pure-projection scoring shape).
    q("q_quality_score",
      s"""SELECT doc_id, ${TextAnalysis.qualityScoreSql("text")} AS quality
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },

    // BPE-ish tokenizer: alpha runs, digit runs, and single punctuation
    // as separate tokens (ASCII regex — identical RE2/Java semantics).
    q("q_token_bpe",
      """SELECT doc_id,
        | len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d).select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .cast("long").as("n_bpe_tokens"))
        .orderBy("doc_id")
    },

    // Content fingerprint: md5 (cross-engine) — the dedup/lineage key.
    q("q_fingerprint",
      """SELECT doc_id, md5(lower(trim(text))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d)
        .select(col("doc_id"), md5(lower(trim(col("text")))).as("fingerprint"))
        .orderBy("doc_id")
    },

    // Marker-token language-ID heuristic: per-language hit counts, argmax
    // with (hits DESC, lang DESC) tie-break — fully relational, so the
    // oracle replays it as a UNION ALL + window argmax.
    q("q_langid",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |s AS (
        |  SELECT doc_id, len(tok) AS n, 'en' AS lang,
        |    len(list_filter(tok, x -> x IN ('the','a','of','and','is'))) AS hits FROM t
        |  UNION ALL SELECT doc_id, len(tok), 'es',
        |    len(list_filter(tok, x -> x IN ('el','la','de','que','y'))) FROM t
        |  UNION ALL SELECT doc_id, len(tok), 'de',
        |    len(list_filter(tok, x -> x IN ('der','die','das','und','ist'))) FROM t
        |  UNION ALL SELECT doc_id, len(tok), 'fr',
        |    len(list_filter(tok, x -> x IN ('le','la','les','et','est'))) FROM t
        |  UNION ALL SELECT doc_id, len(tok), 'zh',
        |    len(list_filter(tok, x -> x IN ('的','是','了','在','我'))) FROM t),
        |best AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY hits DESC, lang DESC) AS rn FROM s)
        |SELECT doc_id,
        |  CASE WHEN hits > 0 THEN lang ELSE 'und' END AS predicted_lang,
        |  hits AS score, round(hits * 1.0 / n, 6) AS confidence
        |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.languageId(documents(s, d)).orderBy("doc_id")
    },

    // Winnowing rolling-hash fingerprint: deterministic integer math
    // (md5-derived token hash, Horner base-131 mod 1e9+7, min over 8-token
    // windows) — the oracle replays it with list comprehensions.
    q("q_fingerprint_rolling",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |h AS (SELECT doc_id, tok,
        |  [('0x' || substr(md5(x), 1, 8))::BIGINT % 1000000007 for x in tok] AS th
        |  FROM t),
        |w AS (SELECT doc_id, len(tok) AS n, th,
        |  [list_reduce(th[i+1:i+8], (acc, x) -> (acc*131 + x) % 1000000007)
        |   for i in range(0, greatest(len(tok) - 7, 0))] AS wh
        |  FROM h)
        |SELECT doc_id,
        |  CASE WHEN n >= 8 THEN list_min(wh)
        |       ELSE list_reduce(th, (acc, x) -> (acc*131 + x) % 1000000007)
        |  END AS fingerprint,
        |  greatest(n - 7, 1) AS n_windows
        |FROM w ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.rollingFingerprint(documents(s, d)).orderBy("doc_id")
    },

    // ---- multimodal ----------------------------------------------------
    // Typed multimodal row: text + embedding joined into one record.
    // The binary decode path (images/audio) lives in graft.llm.Multimodal,
    // backed by real PNG/JPEG/WAV decoders (graft.llm.MediaCodecs) with a
    // deterministic byte-fold fallback only for unrecognized payloads.
    q("q_multimodal_join",
      """SELECT d.doc_id, d.lang, d.n_chars, e.label,
        | len(e.embedding) AS emb_dim
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      documents(s, d).as("d")
        .join(embeddings(s, d).as("e"), col("e.vec_id") === col("d.doc_id"))
        .select(col("d.doc_id").as("doc_id"), col("d.lang").as("lang"),
          col("d.n_chars").as("n_chars"), col("e.label").as("label"),
          size(col("e.embedding")).cast("long").as("emb_dim"))
        .orderBy("doc_id")
    },

    // Binary payload → batched partition-local feature extraction via
    // graft.llm.Multimodal. Real PNG/JPEG/WAV decoders exist in
    // MediaCodecs (MediaCodecsSpec exercises them); this query feeds
    // text/plain payloads, so the deterministic byte-fold fallback runs:
    // it accumulates per-position byte sums in double and quantizes to
    // float once, so the oracle reproduces the exact floats with a
    // ::REAL::DOUBLE round-trip on its own position sums.
    q("q_multimodal_features",
      """WITH pos AS (
        |  SELECT doc_id, (i - 1) % 8 AS p,
        |    (sum(ord(substr(text, i, 1)) / 255.0)::REAL)::DOUBLE AS s
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        |        FROM documents)
        |  GROUP BY doc_id, (i - 1) % 8)
        |SELECT d.doc_id, 'text/plain' AS mime,
        |  length(d.text)::BIGINT AS n_bytes, 8::BIGINT AS feature_dim,
        |  round(sum(p.s), 6) AS feature_sum
        |FROM documents d JOIN pos p ON p.doc_id = d.doc_id
        |GROUP BY d.doc_id, d.text ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      Multimodal.featureSummary(documents(s, d)).orderBy("doc_id")
    },

    // resize → frame-sample composition over binary payloads — each doc
    // yields a bounded nested array of fixed-size frames. On text/plain
    // payloads the transform is deterministic byte sampling (the real
    // image codecs in MediaCodecs handle PNG/JPEG), so the oracle
    // rebuilds the resized payload with the same floor(i·len/128) index
    // math and replays the stride-2 window count.
    q("q_multimodal_frames",
      """WITH r AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) <= 128 THEN text
        |         ELSE list_aggregate(list_transform(range(0, 128),
        |                i -> substr(text,
        |                  (floor(i * (length(text) / 128.0)))::INT + 1, 1)),
        |              'string_agg', '')
        |    END AS rz
        |  FROM documents)
        |SELECT doc_id,
        |  least(8, (CAST(ceil(length(rz) / 32.0) AS BIGINT) + 1) // 2) AS n_frames,
        |  md5(substr(rz, 1, 32)) AS first_frame_md5
        |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      Multimodal.sampleFrames(
          Multimodal.resize(Multimodal.asMediaRecords(documents(s, d)), targetBytes = 128),
          frameBytes = 32, stride = 2)
        .toDF()
        .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
          md5(element_at(col("frames"), 1)).as("first_frame_md5"))
        .orderBy("doc_id")
    }
  )
}
