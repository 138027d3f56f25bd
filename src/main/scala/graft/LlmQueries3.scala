package graft

import graft.CheckpointStrategy.Ops._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Similarity}

/** Third LLM-curation tranche: the sketch/sampling operators that sit
  * between corpus statistics and the training mix — count-min frequency
  * estimation, Bloom-filter broadcast prefiltering, deterministic
  * hash-bucket splits, n-gram diversity, domain-mixture reweighting,
  * PMI co-occurrence, and int8 embedding-quantization fidelity.
  *
  * Sketches reuse the round-5 replayable hash family (md5-int base hash +
  * (a·h+b) mod P linear permutations, constants from
  * [[Dedup.permConstants]] interpolated into the oracle SQL from the SAME
  * Scala values), so DuckDB replays every pipeline bit-identically.
  */
object LlmQueries3 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  private val P = Dedup.HashP
  private def pa(i: Int): Long = Dedup.permConstants(i)._1
  private def pb(i: Int): Long = Dedup.permConstants(i)._2

  /** (a·h + b) mod P mod width — one row/bit of a sketch. Long-safe:
    * a < P ≈ 2^30, h < 2^32 ⇒ a·h < 2^62 (DuckDB's checked arithmetic
    * computes the identical values).
    */
  private def sketchBucket(h: Column, i: Int, width: Int): Column =
    ((lit(pa(i)) * h + lit(pb(i))) % P) % width

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))

  // Count-min sketch: depth(4) rows × width(256) buckets; CMS perm
  // constants start at family index 64 (minhash owns 0..31).
  private val CmsDepth = 4
  private val CmsWidth = 256
  private def cmsIdx(j: Int) = 64 + j

  // Bloom filter: 2048 bits, 3 hash functions, family index 70..72.
  private val BloomBits = 2048
  private def bloomIdx(i: Int) = 70 + i

  /** One branch of the oracle-side sketch UNION: `(a·h+b)%P%width`. */
  private def sqlBucket(i: Int, width: Int, h: String = "h"): String =
    s"((${pa(i)} * $h + ${pb(i)}) % $P) % $width"

  val all: Seq[QueryDef] = Seq(

    // Count-min sketch frequency estimation: the bounded-memory
    // frequency oracle for heavy-hitter discovery. The sketch is
    // depth×width ≤ 1024 cells REGARDLESS of corpus size — it builds
    // with one map-side-combining groupBy and broadcasts to estimate;
    // at 100 TB the sketch is the only state that moves. Estimates are
    // min-over-rows, so est ≥ exact always (overcount ≥ 0 is the CMS
    // guarantee, asserted in LlmSketchSpec).
    q("q_cms_freq",
      s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |h AS (SELECT ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM tk),
         |ent AS (
         |  SELECT 0 AS r, ${sqlBucket(cmsIdx(0), CmsWidth)} AS bkt FROM h
         |  UNION ALL SELECT 1, ${sqlBucket(cmsIdx(1), CmsWidth)} FROM h
         |  UNION ALL SELECT 2, ${sqlBucket(cmsIdx(2), CmsWidth)} FROM h
         |  UNION ALL SELECT 3, ${sqlBucket(cmsIdx(3), CmsWidth)} FROM h),
         |sk AS (SELECT r, bkt, count(*) AS cnt FROM ent GROUP BY r, bkt),
         |ex AS (SELECT w, count(*) AS exact_cnt FROM tk GROUP BY w
         |       ORDER BY exact_cnt DESC, w LIMIT 20),
         |ch AS (SELECT w, exact_cnt,
         |       ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM ex),
         |ce AS (
         |  SELECT w, exact_cnt, 0 AS r, ${sqlBucket(cmsIdx(0), CmsWidth)} AS bkt FROM ch
         |  UNION ALL SELECT w, exact_cnt, 1, ${sqlBucket(cmsIdx(1), CmsWidth)} FROM ch
         |  UNION ALL SELECT w, exact_cnt, 2, ${sqlBucket(cmsIdx(2), CmsWidth)} FROM ch
         |  UNION ALL SELECT w, exact_cnt, 3, ${sqlBucket(cmsIdx(3), CmsWidth)} FROM ch),
         |est AS (SELECT w, exact_cnt, min(sk.cnt) AS cms_est
         |  FROM ce JOIN sk ON sk.r = ce.r AND sk.bkt = ce.bkt
         |  GROUP BY w, exact_cnt)
         |SELECT w AS token, exact_cnt, cms_est, cms_est - exact_cnt AS overcount
         |FROM est ORDER BY exact_cnt DESC, token""".stripMargin) { (s, d) =>
      val tk = tokens(documents(s, d))
      val rows = (j: Int, h: Column) =>
        struct(lit(j).as("r"), sketchBucket(h, cmsIdx(j), CmsWidth).as("bkt"))
      val sketch = tk.select(Dedup.md5Int(col("w")).as("h"))
        .select(explode(array((0 until CmsDepth).map(j => rows(j, col("h"))): _*)).as("e"))
        .groupBy(col("e.r").as("r"), col("e.bkt").as("bkt"))
        .agg(count(lit(1)).as("cnt"))
      val top = tk.groupBy("w").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("w")).limit(20)
      top.withColumn("h", Dedup.md5Int(col("w")))
        .select(col("w"), col("exact_cnt"),
          explode(array((0 until CmsDepth).map(j => rows(j, col("h"))): _*)).as("e"))
        .select(col("w"), col("exact_cnt"), col("e.r").as("r"), col("e.bkt").as("bkt"))
        .join(broadcast(sketch), Seq("r", "bkt"))
        .groupBy("w", "exact_cnt").agg(min(col("cnt")).as("cms_est"))
        .select(col("w").as("token"), col("exact_cnt"), col("cms_est"),
          (col("cms_est") - col("exact_cnt")).as("overcount"))
        .orderBy(col("exact_cnt").desc, col("token"))
    },

    // Bloom-filter broadcast prefilter: membership of every corpus token
    // against a denylist (here: the vocabulary of an eval-benchmark
    // sample, doc_id ≡ 0 mod 97) tested through a 2048-bit/3-hash Bloom
    // filter. The filter is a ≤2048-row bit set broadcast to every
    // executor — the scale pattern that replaces a corpus-wide shuffle
    // semi-join with a map-side test (false positives then re-checked
    // exactly, here counted against ground truth).
    q("q_bloom_prefilter",
      s"""WITH dd AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
         |  FROM documents WHERE doc_id % 97 = 0),
         |dh AS (SELECT ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM dd),
         |bits AS (SELECT DISTINCT bit FROM (
         |  SELECT ${sqlBucket(bloomIdx(0), BloomBits)} AS bit FROM dh
         |  UNION ALL SELECT ${sqlBucket(bloomIdx(1), BloomBits)} FROM dh
         |  UNION ALL SELECT ${sqlBucket(bloomIdx(2), BloomBits)} FROM dh)),
         |v AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents),
         |vh AS (SELECT w, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM v),
         |t AS (SELECT w,
         |  ${sqlBucket(bloomIdx(0), BloomBits)} IN (SELECT bit FROM bits) AND
         |  ${sqlBucket(bloomIdx(1), BloomBits)} IN (SELECT bit FROM bits) AND
         |  ${sqlBucket(bloomIdx(2), BloomBits)} IN (SELECT bit FROM bits) AS bloom_hit,
         |  w IN (SELECT w FROM dd) AS exact_hit FROM vh)
         |SELECT count(*) AS n_vocab,
         |  count_if(bloom_hit)::BIGINT AS n_bloom_hits,
         |  count_if(exact_hit)::BIGINT AS n_exact_hits,
         |  count_if(bloom_hit AND NOT exact_hit)::BIGINT AS n_false_pos
         |FROM t""".stripMargin) { (s, d) =>
      val docs = documents(s, d)
      val deny = tokens(docs.filter(col("doc_id") % 97 === 0)).distinct()
      val denyBits = deny.select(Dedup.md5Int(col("w")).as("h"))
        .select(explode(array((0 until 3).map(i =>
          sketchBucket(col("h"), bloomIdx(i), BloomBits)): _*)).as("bit"))
        .distinct()
      def withFlag(df: DataFrame, bcol: String, flag: String): DataFrame =
        df.join(broadcast(denyBits.withColumnRenamed("bit", bcol)
          .withColumn(flag, lit(1))), Seq(bcol), "left")
      val vocab = tokens(docs).distinct()
        .withColumn("h", Dedup.md5Int(col("w")))
        .withColumn("b0", sketchBucket(col("h"), bloomIdx(0), BloomBits))
        .withColumn("b1", sketchBucket(col("h"), bloomIdx(1), BloomBits))
        .withColumn("b2", sketchBucket(col("h"), bloomIdx(2), BloomBits))
      withFlag(withFlag(withFlag(vocab, "b0", "f0"), "b1", "f1"), "b2", "f2")
        .withColumn("bloom_hit",
          col("f0").isNotNull && col("f1").isNotNull && col("f2").isNotNull)
        .join(broadcast(deny.withColumn("in_deny", lit(1))), Seq("w"), "left")
        .withColumn("exact_hit", col("in_deny").isNotNull)
        .agg(count(lit(1)).as("n_vocab"),
          count_if(col("bloom_hit")).as("n_bloom_hits"),
          count_if(col("exact_hit")).as("n_exact_hits"),
          count_if(col("bloom_hit") && !col("exact_hit")).as("n_false_pos"))
    },

    // Deterministic train/val/test split: md5(doc_id) mod 100 buckets,
    // 80/10/10. Pure projection — no shuffle until the audit rollup, no
    // RNG state: any executor recomputes the same assignment, which is
    // what makes the split reproducible across reruns AND machines.
    q("q_split_assign",
      """WITH t AS (SELECT source,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket,
        |    len(string_split(text, ' '))::BIGINT AS n_tokens
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, sum(n_tokens)::BIGINT AS n_tokens
        |FROM t GROUP BY source, split ORDER BY source, split""".stripMargin) { (s, d) =>
      val bucket = pmod(Dedup.md5Int(col("doc_id").cast("string")), lit(100))
      documents(s, d)
        .select(col("source"), bucket.as("bucket"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
        .orderBy("source", "split")
    },

    // N-gram diversity: type-token ratio + distinct-bigram ratio — the
    // repetition/templated-text signals a quality filter reads. One
    // narrow per-document pass, zero shuffles before the final sort.
    q("q_ngram_diversity",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |b AS (SELECT doc_id, tok,
        |  [tok[i] || ' ' || tok[i+1] for i in range(1, len(tok))] AS bg FROM t)
        |SELECT doc_id, len(tok)::BIGINT AS n_tokens,
        |  round(len(list_distinct(tok)) * 1.0 / len(tok), 6) AS ttr,
        |  round(len(list_distinct(bg)) * 1.0 / greatest(len(bg), 1), 6)
        |    AS bigram_ttr
        |FROM b ORDER BY doc_id""".stripMargin) { (s, d) =>
      val tok = col("tok")
      val bigrams = zip_with(
        slice(tok, lit(1), size(tok) - 1), slice(tok, lit(2), size(tok) - 1),
        (x, y) => concat_ws(" ", x, y))
      documents(s, d).select(col("doc_id"), split(col("text"), " ").as("tok"))
        .select(col("doc_id"), size(tok).cast("long").as("n_tokens"),
          round(size(array_distinct(tok)) * lit(1.0) / size(tok), 6).as("ttr"),
          round(size(array_distinct(bigrams)) * lit(1.0) /
            greatest(size(bigrams), lit(1)), 6).as("bigram_ttr"))
        .orderBy("doc_id")
    },

    // Domain-mixture reweighting (DoReMi-lite): per-language sampling
    // weight = target share / actual token share. Two tiny aggregations —
    // the per-domain stats table is domains-bounded, so at 100 TB this is
    // one corpus pass plus driver-free broadcast arithmetic.
    q("q_domain_mix",
      """WITH t AS (SELECT lang, count(*) AS n_docs,
        |    sum(len(string_split(text, ' ')))::BIGINT AS tokens
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT sum(tokens)::BIGINT AS total FROM t)
        |SELECT lang, n_docs, tokens,
        |  round(tokens * 1.0 / total, 6) AS actual_share,
        |  (CASE lang WHEN 'en' THEN 0.40 WHEN 'zh' THEN 0.18
        |    WHEN 'es' THEN 0.16 WHEN 'de' THEN 0.14 ELSE 0.12 END)::DOUBLE
        |    AS target_share,
        |  round((CASE lang WHEN 'en' THEN 0.40 WHEN 'zh' THEN 0.18
        |    WHEN 'es' THEN 0.16 WHEN 'de' THEN 0.14 ELSE 0.12 END)::DOUBLE
        |    * total / tokens, 6) AS weight
        |FROM t CROSS JOIN tot ORDER BY lang""".stripMargin) { (s, d) =>
      val target = when(col("lang") === "en", 0.40).when(col("lang") === "zh", 0.18)
        .when(col("lang") === "es", 0.16).when(col("lang") === "de", 0.14)
        .otherwise(0.12)
      val t = documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      t.crossJoin(broadcast(t.agg(sum("tokens").as("total"))))
        .select(col("lang"), col("n_docs"), col("tokens"),
          round(col("tokens") * lit(1.0) / col("total"), 6).as("actual_share"),
          target.as("target_share"),
          round(target * col("total") / col("tokens"), 6).as("weight"))
        .orderBy("lang")
    },

    // PMI co-occurrence over the top-20 vocabulary: which frequent terms
    // attract each other within documents. The broadcast top-k filter
    // BOUNDS the pair space (≤ k²/2 keys however big the corpus), making
    // the presence self-join an equi-join on doc_id over ≤k rows per doc
    // — the collocation-mining shape that survives scale-up. ln() can
    // differ by 1 ulp across engines → pmi rounds to 6.
    q("q_pmi_cooccur",
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |top AS (SELECT w, count(*) AS cnt FROM tk GROUP BY w
        |  ORDER BY cnt DESC, w LIMIT 20),
        |pres AS (SELECT DISTINCT doc_id, w FROM tk
        |  WHERE w IN (SELECT w FROM top)),
        |dc AS (SELECT w, count(*) AS dw FROM pres GROUP BY w),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |co AS (SELECT a.w AS w1, b.w AS w2, count(*) AS co
        |  FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.w < b.w
        |  GROUP BY a.w, b.w)
        |SELECT w1, w2, co,
        |  round(ln(co * 1.0 * n_docs / (x.dw * y.dw)), 6) AS pmi
        |FROM co JOIN dc x ON x.w = w1 JOIN dc y ON y.w = w2 CROSS JOIN n
        |WHERE co >= 5 ORDER BY w1, w2""".stripMargin) { (s, d) =>
      val tk = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val top = tk.groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(20).select("w")
      // Presence set feeds three consumers (both self-join sides + the
      // per-term doc counts) — materialize once, as in q_source_overlap.
      val pres = tk.join(broadcast(top), Seq("w"), "leftsemi")
        .distinct().cut()
      val dc = pres.groupBy("w").agg(count(lit(1)).as("dw"))
      val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
      val co = pres.as("a")
        .join(pres.as("b"), col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
        .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
        .agg(count(lit(1)).as("co"))
        .filter(col("co") >= 5)
      co.join(broadcast(dc.select(col("w").as("w1"), col("dw").as("dw1"))), "w1")
        .join(broadcast(dc.select(col("w").as("w2"), col("dw").as("dw2"))), "w2")
        .crossJoin(broadcast(nDocs))
        .select(col("w1"), col("w2"), col("co"),
          round(log(col("co") * lit(1.0) * col("n_docs") /
            (col("dw1") * col("dw2"))), 6).as("pmi"))
        .orderBy("w1", "w2")
    },

    // Int8 embedding quantization fidelity: per-vector min/max scalar
    // quantization (the memory-4× ANN compression), scored by cosine
    // drift against the exact vector on a fixed query. Oracle contract
    // mirrors q_approx_distinct: Spark emits (exact metric, within_tol);
    // the oracle emits (exact metric, TRUE) — the hash matches iff every
    // quantized cosine is within 0.02 of exact.
    q("q_embed_quantize",
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6)
        |    AS cos_exact,
        |  TRUE AS within_tol
        |FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
        |ORDER BY e.vec_id""".stripMargin) { (s, d) =>
      val qv = embeddings(s, d).filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
      val v = col("embedding")
      val mn = array_min(v).cast("double")
      val mx = array_max(v).cast("double")
      val scale = (mx - mn) / lit(255.0)
      // Dequantized reconstruction: round((x-mn)/scale) ∈ [0,255] back to
      // mn + q·scale. HOF lambdas are interpreted — acceptable here: the
      // quantized side exists only to measure drift Spark-side (the
      // oracle never replays it), and the native-expr path computes the
      // exact cosine.
      val deq = transform(v, x => mn + round((x.cast("double") - mn) / scale, 0) * scale)
      val qed = transform(col("qe"), x => x.cast("double"))
      def hofDot(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, p) => acc + p)
      val exactRaw = Similarity.cosine(v, col("qe"))
      val cosQ = when(mx === mn, exactRaw)
        .otherwise(hofDot(deq, qed) / sqrt(hofDot(deq, deq) * hofDot(qed, qed)))
      embeddings(s, d).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), round(exactRaw, 6).as("cos_exact"),
          (abs(cosQ - exactRaw) <= 0.02).as("within_tol"))
        .orderBy("vec_id")
    },

    // Cross-corpus decontamination: which TRAIN documents contain any
    // 8-gram that also appears in the held-out TEST split (the
    // eval-leakage scan run before every training mix). The eval n-gram
    // set is the broadcast side — real eval corpora are tiny next to the
    // training corpus, so the 100 TB side streams map-side through the
    // membership join and never shuffles. Split and hashes reuse the
    // deterministic md5 family, so the oracle replays everything.
    q("q_decontaminate",
      """WITH b AS (SELECT doc_id, text,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents),
        |t AS (SELECT doc_id, bucket, string_split(text, ' ') AS tok FROM b),
        |sh AS (SELECT doc_id, bucket, CASE WHEN len(tok) >= 8
        |    THEN list_distinct([array_to_string(tok[i:i+7], ' ')
        |                        for i in range(1, len(tok) - 6)])
        |    ELSE [array_to_string(tok, ' ')] END AS shingles FROM t),
        |hx AS (SELECT doc_id, bucket,
        |  [('0x' || substr(md5(s), 1, 8))::BIGINT for s in shingles] AS xs FROM sh),
        |ev AS (SELECT DISTINCT unnest(xs) AS h FROM hx WHERE bucket >= 90),
        |tr AS (SELECT doc_id, unnest(xs) AS h FROM hx WHERE bucket < 90)
        |SELECT doc_id, count(*) AS n_shared FROM tr
        |WHERE h IN (SELECT h FROM ev)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val grams = documents(s, d)
        .withColumn("bucket",
          pmod(Dedup.md5Int(col("doc_id").cast("string")), lit(100)))
        .select(col("doc_id"), col("bucket"),
          explode(Dedup.shingles(col("text"), 8)).as("sgl"))
        .select(col("doc_id"), col("bucket"), Dedup.md5Int(col("sgl")).as("h"))
      val ev = grams.filter(col("bucket") >= 90).select("h").distinct()
      grams.filter(col("bucket") < 90)
        .join(broadcast(ev), Seq("h"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    },

    // Cross-document fingerprint overlap: pairs sharing ≥2 rolling
    // 8-token window hashes — the plagiarism/near-copy detector built on
    // the fingerprinting family (q_fingerprint_rolling keeps each doc's
    // min; this joins the full sets). The pair join is an EQUI join on
    // the window hash — at scale a production winnowing pass would
    // sparsify each doc's set (per-stride minima) first; the join shape
    // is identical.
    q("q_fingerprint_overlap",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |h AS (SELECT doc_id, tok,
        |  [('0x' || substr(md5(x), 1, 8))::BIGINT % 1000000007 for x in tok] AS th
        |  FROM t),
        |w AS (SELECT doc_id, len(tok) AS n, th,
        |  [list_reduce(th[i+1:i+8], (acc, x) -> (acc*131 + x) % 1000000007)
        |   for i in range(0, greatest(len(tok) - 7, 0))] AS wh
        |  FROM h),
        |e AS (SELECT DISTINCT doc_id,
        |  unnest(CASE WHEN n >= 8 THEN wh
        |    ELSE [list_reduce(th, (acc, x) -> (acc*131 + x) % 1000000007)] END) AS fp
        |  FROM w)
        |SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared
        |FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY id1, id2 HAVING count(*) >= 2
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      // The fingerprint set feeds both join sides — materialize once
      // (q_source_overlap pattern).
      val e = graft.llm.TextAnalysis.rollingWindowHashes(documents(s, d), 8)
        .cut()
      e.as("a")
        .join(e.as("b"), col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .orderBy("id1", "id2")
    },

    // Duplicate-shingle mass per document — the Gopher/Falcon-style
    // "fraction of n-grams appearing in other documents" quality signal
    // that gates a doc BEFORE pairwise dedup ever runs. Two keyed
    // aggregations over the exploded shingle set (corpus-wide counts,
    // then per-doc rollup via an equi-join on the hash) — the same
    // shuffle shape at any corpus size; no pair expansion anywhere.
    // Same native shingle generator + md5-int hash as the minhash
    // family, so DuckDB replays it bit-identically.
    q("q_dup_shingle_fraction",
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tok FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(tok) >= 5
        |    THEN list_distinct([array_to_string(tok[i:i+4], ' ')
        |                        for i in range(1, len(tok)-3)])
        |    ELSE [array_to_string(tok, ' ')] END AS shingles FROM t),
        |dh AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
        |cnt AS (SELECT h, count(*) AS nd FROM dh GROUP BY 1)
        |SELECT doc_id, count(*) AS n_shingles,
        |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup,
        |  round(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
        |    AS dup_fraction
        |FROM dh JOIN cnt USING (h)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val dh = documents(s, d)
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 5)).as("sgl"))
        .select(col("doc_id"), Dedup.md5Int(col("sgl")).as("h"))
      // r20: corpus-wide shingle counts as a WINDOW over the hash
      // instead of a groupBy + join-back — the shingle+md5 pass ran
      // twice (once under the aggregate feeding the broadcast, once on
      // the probe side); the window computes nd in the same shuffle
      // that pass already needed, one execution, no join
      dh.withColumn("nd", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("h")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup"))
        .withColumn("dup_fraction",
          round(col("n_dup") * lit(1.0) / col("n_shingles"), 6))
        .orderBy("doc_id")
    },

    // Top-n-gram repetition gate — the third Gopher repetition family
    // alongside n-gram diversity (q_ngram_diversity) and duplicate-
    // shingle mass (q_dup_shingle_fraction): the fraction of a doc's
    // tokens covered by its single most frequent 2-gram / 3-gram, which
    // catches boilerplate/templated text that diversity ratios miss.
    // Shape: a per-document metric stays per-row — the native
    // TopNgramCountExpr counts grams inside the scan pass (zero
    // shuffles before the final sort; the exploded groupBy(doc, gram)
    // formulation it replaced measured 8 s at the sf1 rehearsal, this
    // runs ~0.3 s). The flag thresholds (Gopher's 0.20 / 0.18) compare
    // single-division doubles computed from identical integers on both
    // engines, so the cut is bit-deterministic.
    q("q_top_ngram_fraction",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |b AS (SELECT doc_id, len(tok)::BIGINT AS n_tokens,
        |  [tok[i] || ' ' || tok[i+1] for i in range(1, len(tok))] AS bg,
        |  [tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]
        |    for i in range(1, len(tok)-1)] AS tg FROM t),
        |c2 AS (SELECT doc_id, max(c) AS top2_cnt FROM (
        |  SELECT doc_id, g, count(*) AS c FROM
        |    (SELECT doc_id, unnest(bg) AS g FROM b) GROUP BY 1, 2)
        |  GROUP BY 1),
        |c3 AS (SELECT doc_id, max(c) AS top3_cnt FROM (
        |  SELECT doc_id, g, count(*) AS c FROM
        |    (SELECT doc_id, unnest(tg) AS g FROM b) GROUP BY 1, 2)
        |  GROUP BY 1)
        |, j AS (
        |  -- LEFT JOIN + coalesce(_, 1): docs with < 2 (bigram) or < 3
        |  -- (trigram) tokens have no gram rows here, but the Spark side's
        |  -- TopNgramCountExpr counts the whole text as one gram (count 1)
        |  -- — an inner join would silently drop such docs from the oracle.
        |  SELECT b.doc_id AS doc_id, n_tokens,
        |    coalesce(top2_cnt, 1)::BIGINT AS top2_cnt,
        |    coalesce(top3_cnt, 1)::BIGINT AS top3_cnt
        |  FROM b LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id))
        |SELECT doc_id, n_tokens, top2_cnt, top3_cnt,
        |  round(top2_cnt * 2.0 / n_tokens, 6) AS top2_frac,
        |  round(top3_cnt * 3.0 / n_tokens, 6) AS top3_frac,
        |  (top2_cnt * 2.0 / n_tokens > 0.20 OR top3_cnt * 3.0 / n_tokens > 0.18)
        |    AS flagged
        |FROM j
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          graft.functions.TextExpressions.topNgramCount(col("text"), 2)
            .as("top2_cnt"),
          graft.functions.TextExpressions.topNgramCount(col("text"), 3)
            .as("top3_cnt"))
        .select(col("doc_id"), col("n_tokens"), col("top2_cnt"), col("top3_cnt"),
          round(col("top2_cnt") * lit(2.0) / col("n_tokens"), 6).as("top2_frac"),
          round(col("top3_cnt") * lit(3.0) / col("n_tokens"), 6).as("top3_frac"),
          (col("top2_cnt") * lit(2.0) / col("n_tokens") > 0.20 ||
            col("top3_cnt") * lit(3.0) / col("n_tokens") > 0.18).as("flagged"))
        .orderBy("doc_id")
    },

    // Community detection by synchronous label propagation over the
    // THRESHOLDED minhash similarity graph (the near-dup pairs of
    // q_dedup_minhash) — communities are real there, unlike the fully
    // connected trade graph. Votes include the node's own label
    // (self-vote), which kills the classic 2-cycle oscillation of
    // synchronous LPA; ties break (count DESC, label ASC) so both
    // engines pick identical winners. Four rounds cover the tiny
    // diameter of near-dup clusters, and a FIFTH round is computed
    // solely to measure stability: `n_unstable` counts members whose
    // label still moved in round 5 — non-convergence is VISIBLE in the
    // oracle-checked output instead of silently truncated (expect 0).
    // Scale shape: the edge list is the banded-LSH pair set (bounded,
    // never all-pairs), checkpointed once; execution is adaptive like
    // connectedComponents — one-task simulation when the edge list fits
    // a task (≤1M directed edges), else per-round keyed join + keyed
    // agg + id-keyed row_number, lineage cut per round — no
    // unpartitioned state on either path (llm/Communities.scala).
    q("q_label_prop", {
      val rounds = (1 to 5).map { k =>
        s"""v$k AS (SELECT e.src AS id, l.label FROM edges e
           |  JOIN l${k - 1} l ON l.id = e.dst
           |  UNION ALL SELECT id, label FROM l${k - 1}),
           |c$k AS (SELECT id, label, count(*) AS cnt FROM v$k GROUP BY 1, 2),
           |l$k AS MATERIALIZED (SELECT id, label FROM (
           |  SELECT id, label,
           |    row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label) AS rn
           |  FROM c$k) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${LlmQueries.minhashPairsCtes("documents")},
         |mpairs AS MATERIALIZED (SELECT id1, id2 FROM pairs),
         |edges AS MATERIALIZED (SELECT id1 AS src, id2 AS dst FROM mpairs
         |  UNION ALL SELECT id2, id1 FROM mpairs),
         |l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM edges),
         |$rounds
         |SELECT l4.label AS community, count(*)::BIGINT AS n_members,
         |  min(l4.id) AS min_member, max(l4.id) AS max_member,
         |  sum(CASE WHEN l4.label <> l5.label THEN 1 ELSE 0 END)::BIGINT
         |    AS n_unstable
         |FROM l4 JOIN l5 ON l5.id = l4.id
         |GROUP BY 1 ORDER BY community""".stripMargin
    }) { (s, d) =>
      val pairs = Dedup.minhashPairs(documents(s, d), threshold = 0.7)
        .select("id1", "id2")
      graft.llm.Communities.labelPropagation(pairs, rounds = 4)
        .groupBy(col("label").as("community"))
        .agg(count(lit(1)).as("n_members"),
          min("id").as("min_member"), max("id").as("max_member"),
          sum(when(col("label") =!= col("label_next"), 1L).otherwise(0L))
            .as("n_unstable"))
        .orderBy("community")
    },

    // BM25 document ranking for a fixed query-term set (Robertson k1=1.2,
    // b=0.75) — the retrieval scorer behind every lexical-search /
    // RAG-hybrid pipeline. Per-doc term frequencies and document length
    // come from higher-order functions over the split token list — a
    // pure PROJECTION, no explode and no (doc, term) shuffle; corpus
    // stats (N, Σdl, per-term df) collapse to one 1-row broadcast. The
    // only shuffles are that scalar aggregate and the global top-20
    // (TakeOrdered). Per-term contributions are added in fixed order so
    // both engines sum identically; the rank boundary orders by the
    // ROUNDED score then doc_id, so the LIMIT cut is deterministic.
    q("q_bm25", {
      def tf(t: String) = s"len(list_filter(string_split(text, ' '), x -> x = '$t'))"
      def idf(dfCol: String) = s"ln((st.n_docs - st.$dfCol + 0.5) / (st.$dfCol + 0.5) + 1)"
      def contrib(tfCol: String, dfCol: String) =
        s"${idf(dfCol)} * (d.$tfCol * 2.2) / (d.$tfCol + 0.3 + 0.9 * d.dl * st.n_docs / st.sum_dl)"
      s"""WITH d AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl,
         |    ${tf("join")}::BIGINT AS tf0, ${tf("vector")}::BIGINT AS tf1,
         |    ${tf("merge")}::BIGINT AS tf2 FROM documents),
         |st AS (SELECT count(*) AS n_docs, sum(dl)::BIGINT AS sum_dl,
         |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::BIGINT AS df0,
         |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::BIGINT AS df1,
         |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::BIGINT AS df2 FROM d)
         |SELECT doc_id, round(${contrib("tf0", "df0")}
         |  + ${contrib("tf1", "df1")}
         |  + ${contrib("tf2", "df2")}, 6) AS bm25
         |FROM d CROSS JOIN st WHERE tf0 + tf1 + tf2 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
    }) { (s, d) =>
      val terms = Seq("join", "vector", "merge")
      val toks = split(col("text"), " ")
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        size(filter(toks, x => x === t)).cast("long").as(s"tf$i")
      }
      val docs = documents(s, d).select(
        col("doc_id") +: size(toks).cast("long").as("dl") +: tfCols: _*)
      val st = docs.agg(
        count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"),
        sum(when(col("tf0") > 0, 1L).otherwise(0L)).as("df0"),
        sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
        sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2"))
      def contrib(i: Int) = {
        val tf = col(s"tf$i"); val df = col(s"df$i")
        log((col("n_docs") - df + 0.5) / (df + 0.5) + 1) *
          (tf * 2.2) / (tf + 0.3 + lit(0.9) * col("dl") * col("n_docs") / col("sum_dl"))
      }
      docs.crossJoin(broadcast(st))
        .filter(col("tf0") + col("tf1") + col("tf2") > 0)
        .select(col("doc_id"),
          round(contrib(0) + contrib(1) + contrib(2), 6).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(20)
    },

    // Temperature-scaled domain mixing weights (the multilingual/domain
    // rebalancing rule: wᵢ ∝ pᵢ^α with α = 0.7, p = token share) — how
    // a training pipeline decides how much to sample from each source.
    // The corpus collapses to the |sources|-bounded token histogram in
    // one pass (token counts are a length projection, no explode); the
    // power/normalize steps run over that bounded table with two 1-row
    // broadcasts. Shares are exact-integer ratios; round(6) absorbs libm
    // pow ulp skew.
    q("q_mix_temperature",
      """WITH t AS (SELECT source, count(*) AS n_docs,
        |    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY 1),
        |s AS (SELECT sum(n_tokens)::BIGINT AS tot FROM t),
        |w AS (SELECT source, n_docs, n_tokens,
        |    n_tokens * 1.0 / s.tot AS p,
        |    pow(n_tokens * 1.0 / s.tot, 0.7) AS pw
        |  FROM t CROSS JOIN s),
        |z AS (SELECT sum(pw) AS zsum FROM w)
        |SELECT source, n_docs, n_tokens, round(p, 6) AS token_share,
        |  round(pw / z.zsum, 6) AS mix_weight,
        |  round(pw / z.zsum / p, 6) AS upsample_factor
        |FROM w CROSS JOIN z ORDER BY source""".stripMargin) { (s, d) =>
      val t = documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      val tot = t.agg(sum("n_tokens").as("tot"))
      val w = t.crossJoin(broadcast(tot))
        .withColumn("p", col("n_tokens") * lit(1.0) / col("tot"))
        .withColumn("pw", pow(col("p"), 0.7))
      val z = w.agg(sum("pw").as("zsum"))
      w.crossJoin(broadcast(z))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("p"), 6).as("token_share"),
          round(col("pw") / col("zsum"), 6).as("mix_weight"),
          round(col("pw") / col("zsum") / col("p"), 6).as("upsample_factor"))
        .orderBy("source")
    }
  )
}
