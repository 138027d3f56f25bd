package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}

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
  private def qNoOracle(name: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, None)

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
    // 3-gram Jaccard verify ≥ 0.7. Sketch-based → rows-only check.
    qNoOracle("q_dedup_minhash") { (s, d) =>
      Dedup.minhashPairs(documents(s, d), threshold = 0.7)
        .orderBy("id1", "id2")
    },

    // SimHash near-dup: 64-bit signature, 4×16-bit band bucketing,
    // Hamming distance ≤ 6 verify. Rows-only check.
    qNoOracle("q_dedup_simhash") { (s, d) =>
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
    // banding + exact verify — approximate candidate set → rows-only).
    qNoOracle("q_dedup_embedding") { (s, d) =>
      Dedup.embeddingCosinePairsLsh(embeddings(s, d), threshold = 0.3)
        .orderBy("id1", "id2")
    },

    // End-to-end dedup: minhash pairs → connected components → canonical
    // survivor per cluster + all unpaired docs (iterative CC → rows-only;
    // cluster semantics asserted in LlmSpec).
    qNoOracle("q_dedup_survivors") { (s, d) =>
      Dedup.dedupSurvivors(
          documents(s, d).select("doc_id", "lang", "n_chars"),
          Dedup.minhashPairs(documents(s, d), threshold = 0.7))
        .orderBy("doc_id")
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
    // multi-probe band join — the scale path. Rows-only check; recall vs
    // brute force asserted in SimilaritySpec.
    qNoOracle("q_sim_ann_lsh") { (s, d) =>
      Similarity.lshTopK(
          embeddings(s, d),
          embeddings(s, d).filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
          k = 10)
        .orderBy("query_id", "rn")
    },

    // IVF-style ANN: coarse quantizer cells + nProbe probing (rows-only;
    // cosine consistency vs brute force asserted in LlmSpec).
    qNoOracle("q_sim_ivf") { (s, d) =>
      Similarity.ivfTopK(
          embeddings(s, d),
          embeddings(s, d).filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
          k = 10)
        .orderBy("query_id", "rn")
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
      """SELECT doc_id, round(
        |   least(1.0, length(text) / 500.0) * 0.5
        | + (1.0 - len(list_filter(string_split(text,' '), x -> x IN ('the','a'))) * 1.0
        |       / len(string_split(text,' '))) * 0.3
        | + (length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text)) * 0.2
        | , 6) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val tok = split(col("text"), " ")
      val stops = filter(tok, x => x === "the" || x === "a")
      documents(s, d).select(col("doc_id"), round(
          least(lit(1.0), length(col("text")) / 500.0) * 0.5 +
          (lit(1.0) - size(stops) * lit(1.0) / size(tok)) * 0.3 +
          (length(regexp_replace(col("text"), "[^a-z]", "")) * lit(1.0) /
            length(col("text"))) * 0.2, 6).as("quality"))
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
    // The binary decode path (images/audio) is the mapPartitions stub in
    // graft.llm.Multimodal — plumbing real, decoder stubbed.
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

    // Binary payload → batched partition-local feature extraction
    // (decode stubbed; plumbing real — see graft.llm.Multimodal). The
    // stub accumulates per-position byte sums in double and quantizes to
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

    // resize → frame-sample composition over binary payloads (stub
    // codecs; real batching/schema/partitioning) — each doc yields a
    // bounded nested array of fixed-size frames. The stub transforms are
    // deterministic byte sampling, so the oracle rebuilds the resized
    // payload with the same floor(i·len/128) index math and replays the
    // stride-2 window count.
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
