package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.CheckpointStrategy.Ops._
import graft.llm.{Clustering, Dedup}
import graft.ops.Pii

/** Seventh LLM-curation tranche (round 10): the operational ingestion
  * surfaces — incremental dedup of an arriving batch against a deduped
  * corpus (cost ∝ batch, never corpus²), multi-class PII redaction with
  * cross-engine-verified scrub output, and padding-efficiency profiling
  * of length-bucketed batching (the serving/training-batch sizing
  * decision).
  */
object LlmQueries7 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Incremental MinHash-LSH dedup: docs with doc_id % 4 = 0 arrive as
    // the NEW batch against the already-ingested corpus (the other 3/4).
    // Candidates are generated ONLY for pairs with ≥1 batch endpoint —
    // a bucket of c corpus + n batch docs expands n·(c+n) pairs, never
    // c². Banding is per-doc, and the bucket cap counts both sides, so
    // the result is provably the full-pipeline pair set filtered to
    // batch-touching pairs — which is exactly how the oracle replays it
    // (full minhashPairsCtes + endpoint filter; the oracle pays the
    // corpus×corpus cost the Spark plan exists to avoid). Output: one
    // row per duplicate batch doc with its match count and best match
    // (highest verified Jaccard, min doc_id tiebreak) and whether that
    // best match is a corpus doc (drop it) or an earlier batch doc
    // (intra-batch dup).
    q("q_dedup_incremental", {
      s"""WITH ${LlmQueries.minhashPairsCtes("documents")},
         |inc AS (SELECT id1, id2, jaccard FROM pairs
         |  WHERE id1 % 4 = 0 OR id2 % 4 = 0),
         |m AS (SELECT id1 AS doc_id, id2 AS other, jaccard FROM inc
         |  UNION ALL SELECT id2, id1, jaccard FROM inc),
         |mb AS (SELECT doc_id, other, jaccard,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY jaccard DESC, other) AS rn,
         |    count(*) OVER (PARTITION BY doc_id) AS n_matches
         |  FROM m WHERE doc_id % 4 = 0)
         |SELECT doc_id, n_matches::BIGINT AS n_matches,
         |  other AS best_match_id, jaccard AS best_jaccard,
         |  (other % 4 <> 0) AS matched_corpus
         |FROM mb WHERE rn = 1 ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val docs = documents(s, d)
      val corpus = docs.filter(col("doc_id") % 4 =!= 0)
      val batch = docs.filter(col("doc_id") % 4 === 0)
      val pairs = Dedup.minhashPairsIncremental(corpus, batch, threshold = 0.7)
      val m = pairs.select(col("id1").as("doc_id"), col("id2").as("other"), col("jaccard"))
        .unionByName(
          pairs.select(col("id2").as("doc_id"), col("id1").as("other"), col("jaccard")))
        .filter(col("doc_id") % 4 === 0)
      // doc_id is the corpus primary key — the window partitions on a
      // high-cardinality key over the (tiny, ~linear-in-dups) pair set
      val w = Window.partitionBy("doc_id")
      m.withColumn("rn",
          row_number().over(w.orderBy(col("jaccard").desc, col("other"))))
        .withColumn("n_matches", count(lit(1)).over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("n_matches"),
          col("other").as("best_match_id"), col("jaccard").as("best_jaccard"),
          (col("other") % 4 =!= 0).as("matched_corpus"))
        .orderBy("doc_id")
    },

    // Multi-class PII scrub: emails, phone numbers, IPv4 addresses
    // redacted from a free-text contact blob, with per-class audit
    // counts and the md5 of the scrubbed text hash-compared across
    // engines — the redaction itself is verified, not just the counts.
    // The blob is synthesized deterministically from customer keys
    // (the fixtures carry no raw PII — by design), with per-row
    // variability (0–2 emails, 0–1 phones/IPs) so the counts exercise
    // real branches. Pure codegen'd projection: zero shuffle at any
    // scale; patterns are RE2-safe so Java regex and DuckDB RE2 agree
    // by construction (see Pii.scrubText).
    q("q_pii_scrub", {
      val em = Pii.EmailPattern
      val ph = Pii.PhonePattern
      val ip = Pii.Ipv4Pattern
      s"""WITH blob AS (SELECT c_custkey,
         |  'Customer ' || c_name || ' contact ' ||
         |  substr(sha256(c_custkey::VARCHAR || 'graft'), 1, 12) || '@example.com' ||
         |  CASE WHEN c_custkey % 3 <> 0 THEN ' tel ' ||
         |    printf('%02d-%03d-%03d-%04d', 10 + c_custkey % 90, c_custkey % 1000,
         |           (c_custkey * 7) % 1000, (c_custkey * 13) % 10000) ELSE '' END ||
         |  CASE WHEN c_custkey % 5 = 0 THEN ' cc ' ||
         |    substr(sha256(c_custkey::VARCHAR || 'alt'), 1, 12) || '@example.org' ELSE '' END ||
         |  CASE WHEN c_custkey % 2 = 0 THEN ' ip 10.' || (c_custkey % 256) || '.' ||
         |    ((c_custkey * 3) % 256) || '.' || (1 + c_custkey % 100) ELSE '' END ||
         |  ' segment ' || c_mktsegment AS t
         |FROM customer)
         |SELECT c_custkey,
         |  len(regexp_extract_all(t, '$em'))::BIGINT AS n_emails,
         |  len(regexp_extract_all(
         |    regexp_replace(t, '$em', '[EMAIL]', 'g'), '$ph'))::BIGINT AS n_phones,
         |  len(regexp_extract_all(regexp_replace(
         |    regexp_replace(t, '$em', '[EMAIL]', 'g'),
         |    '$ph', '[PHONE]', 'g'), '$ip'))::BIGINT AS n_ips,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |    '$em', '[EMAIL]', 'g'), '$ph', '[PHONE]', 'g'), '$ip', '[IP]', 'g'))
         |    AS scrub_md5,
         |  (length(t) - length(regexp_replace(regexp_replace(regexp_replace(t,
         |    '$em', '[EMAIL]', 'g'), '$ph', '[PHONE]', 'g'), '$ip', '[IP]', 'g')))::BIGINT
         |    AS n_chars_redacted
         |FROM blob ORDER BY c_custkey""".stripMargin
    }) { (s, d) =>
      val k = col("c_custkey")
      val blob = concat(
        lit("Customer "), col("c_name"), lit(" contact "),
        substring(sha2(concat(k.cast("string"), lit("graft")), 256), 1, 12),
        lit("@example.com"),
        when(k % 3 =!= 0, concat(lit(" tel "),
          format_string("%02d-%03d-%03d-%04d",
            (lit(10) + k % 90).cast("int"), (k % 1000).cast("int"),
            ((k * 7) % 1000).cast("int"), ((k * 13) % 10000).cast("int"))))
          .otherwise(""),
        when(k % 5 === 0, concat(lit(" cc "),
          substring(sha2(concat(k.cast("string"), lit("alt")), 256), 1, 12),
          lit("@example.org"))).otherwise(""),
        when(k % 2 === 0, concat(lit(" ip 10."),
          (k % 256).cast("string"), lit("."),
          ((k * 3) % 256).cast("string"), lit("."),
          (lit(1) + k % 100).cast("string"))).otherwise(""),
        lit(" segment "), col("c_mktsegment"))
      customer(s, d)
        .select(k, blob.as("t"))
        .select(k +: (Pii.piiCounts(col("t")) ++ Seq(
          md5(Pii.scrubText(col("t"))).as("scrub_md5"),
          (length(col("t")) - length(Pii.scrubText(col("t"))))
            .cast("long").as("n_chars_redacted"))): _*)
        .orderBy("c_custkey")
    },

    // Padding-efficiency profile of length-bucketed batching: docs are
    // assigned to next-power-of-two token-count buckets (min 16) — the
    // bucketing an inference/training batcher uses so batch tensors pad
    // to the bucket cap instead of the global max. Per bucket: volume,
    // token range, and the padding fraction wasted at that cap; every
    // row also carries the global-max padding fraction, so the output
    // IS the bucketing-vs-no-bucketing decision. Integer-only bucket
    // math (bin-string length, no float log2 — exact at powers of two
    // on both engines); one keyed agg over the corpus, ~log(range)
    // groups, 1-row global broadcast.
    q("q_length_buckets",
      """WITH tok AS (SELECT doc_id,
        |    len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents),
        |b AS (SELECT doc_id, n_tokens,
        |    greatest(16, power(2, length(bin(n_tokens - 1)))::BIGINT) AS bucket_cap
        |  FROM tok),
        |g AS (SELECT max(n_tokens) AS gmax, count(*) AS gdocs,
        |    sum(n_tokens) AS gtokens FROM b)
        |SELECT bucket_cap, count(*)::BIGINT AS n_docs,
        |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
        |  sum(n_tokens)::BIGINT AS sum_tokens,
        |  round(1.0 - sum(n_tokens) * 1.0 / (bucket_cap * count(*)), 6)
        |    AS waste_frac,
        |  round(1.0 - g.gtokens * 1.0 / (g.gmax * g.gdocs), 6)
        |    AS global_waste_frac
        |FROM b CROSS JOIN g
        |GROUP BY bucket_cap, g.gtokens, g.gmax, g.gdocs
        |ORDER BY bucket_cap""".stripMargin) { (s, d) =>
      val tok = documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val b = tok.withColumn("bucket_cap",
        greatest(lit(16L),
          pow(lit(2), length(bin((col("n_tokens") - 1).cast("bigint")))).cast("long")))
      val g = b.agg(max("n_tokens").as("gmax"), count(lit(1)).as("gdocs"),
        sum("n_tokens").as("gtokens"))
      b.crossJoin(broadcast(g))
        .groupBy("bucket_cap", "gtokens", "gmax", "gdocs")
        .agg(count(lit(1)).as("n_docs"),
          min("n_tokens").as("min_tokens"), max("n_tokens").as("max_tokens"),
          sum("n_tokens").as("sum_tokens"))
        .select(col("bucket_cap"), col("n_docs"), col("min_tokens"),
          col("max_tokens"), col("sum_tokens"),
          round(lit(1.0) - col("sum_tokens") * lit(1.0) /
            (col("bucket_cap") * col("n_docs")), 6).as("waste_frac"),
          round(lit(1.0) - col("gtokens") * lit(1.0) /
            (col("gmax") * col("gdocs")), 6).as("global_waste_frac"))
        .orderBy("bucket_cap")
    },

    // Incremental clustering maintenance — the third incremental index
    // family next to the lake's incr-agg/CDC and q_dedup_incremental:
    // centroids are TRAINED ONCE on the ingested corpus (vec_id % 4 ≠ 0;
    // k-smallest-id init, 1 Lloyd update — the persistable k-row store),
    // then the arriving batch is ASSIGNED to the stored centroids with a
    // k-row broadcast (cost ∝ batch; the corpus never reruns). The
    // output is the re-cluster decision row: per-cluster corpus vs batch
    // occupancy shares, mean L2² fit, and the share drift that says when
    // the stored codebook has gone stale. Oracle: full Lloyd replay on
    // the corpus split (same float-quantized determinism contract as
    // q_kmeans) + batch assignment + the share comparison.
    q("q_cluster_incremental", {
      val dist = "v.vsq - 2.0 * list_dot_product(v.e, c1s.ce) + c1s.cesq"
      def assignCte(src: String) =
        s"""SELECT vec_id, cluster, dist2 FROM (
           |  SELECT v.vec_id, c1s.cluster, $dist AS dist2,
           |    row_number() OVER (PARTITION BY v.vec_id
           |      ORDER BY $dist, c1s.cluster) AS rn
           |  FROM $src v CROSS JOIN c1s) t WHERE rn = 1""".stripMargin
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
         |    list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) AS vsq
         |  FROM embeddings WHERE vec_id % 4 <> 0),
         |vb AS (SELECT vec_id, embedding::DOUBLE[] AS e,
         |    list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) AS vsq
         |  FROM embeddings WHERE vec_id % 4 = 0),
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
         |ac AS (${assignCte("v")}),
         |ab AS (${assignCte("vb")}),
         |pc AS (SELECT cluster, count(*) AS n_corpus, avg(dist2) AS cmean
         |  FROM ac GROUP BY 1),
         |pb AS (SELECT cluster, count(*) AS n_batch, avg(dist2) AS bmean
         |  FROM ab GROUP BY 1),
         |tc AS (SELECT count(*) AS nc FROM ac),
         |tb AS (SELECT count(*) AS nb FROM ab)
         |SELECT pc.cluster, pc.n_corpus::BIGINT AS n_corpus,
         |  round(pc.n_corpus * 1.0 / tc.nc, 6) AS corpus_share,
         |  round(pc.cmean, 6) AS corpus_mean_d2,
         |  coalesce(pb.n_batch, 0)::BIGINT AS n_batch,
         |  round(coalesce(pb.n_batch, 0) * 1.0 / nullif(tb.nb, 0), 6) AS batch_share,
         |  round(pb.bmean, 6) AS batch_mean_d2,
         |  round(coalesce(pb.n_batch, 0) * 1.0 / nullif(tb.nb, 0)
         |    - pc.n_corpus * 1.0 / tc.nc, 6) AS share_drift
         |FROM pc LEFT JOIN pb USING (cluster)
         |CROSS JOIN tc CROSS JOIN tb
         |ORDER BY pc.cluster""".stripMargin
    }) { (s, d) =>
      val emb = embeddings(s, d)
      val corpus = emb.filter(col("vec_id") % 4 =!= 0)
      val batch = emb.filter(col("vec_id") % 4 === 0)
      // k-row store, lineage-cut: both assignment passes reuse it
      // without re-running the Lloyd training subtree
      val cents = Clustering.kmeansCentroids(corpus, k = 4, rounds = 2).cut()
      val corpusA = Clustering.assignTo(corpus, cents)
      val batchA = Clustering.assignTo(batch, cents)
      val pc = corpusA.groupBy("cluster")
        .agg(count(lit(1)).as("n_corpus"), avg("dist2").as("cmean"))
      val pb = batchA.groupBy("cluster")
        .agg(count(lit(1)).as("n_batch"), avg("dist2").as("bmean"))
      val tc = corpusA.agg(count(lit(1)).as("nc"))
      val tb = batchA.agg(count(lit(1)).as("nb"))
      pc.join(pb, Seq("cluster"), "left")
        .crossJoin(broadcast(tc)).crossJoin(broadcast(tb))
        .select(col("cluster"), col("n_corpus"),
          round(col("n_corpus") * lit(1.0) / col("nc"), 6).as("corpus_share"),
          round(col("cmean"), 6).as("corpus_mean_d2"),
          coalesce(col("n_batch"), lit(0L)).as("n_batch"),
          // nullif guard: an EMPTY batch (nb = 0, the shape incremental
          // maintenance invites) yields null shares on both engines
          // instead of engine-divergent divide-by-zero behavior
          round(coalesce(col("n_batch"), lit(0L)) * lit(1.0)
            / nullif(col("nb"), lit(0L)), 6).as("batch_share"),
          round(col("bmean"), 6).as("batch_mean_d2"),
          round(coalesce(col("n_batch"), lit(0L)) * lit(1.0)
              / nullif(col("nb"), lit(0L))
            - col("n_corpus") * lit(1.0) / col("nc"), 6).as("share_drift"))
        .orderBy("cluster")
    }
  )
}
