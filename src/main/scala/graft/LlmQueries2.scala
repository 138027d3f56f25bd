package graft

import graft.CheckpointStrategy.Ops._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second LLM-curation tranche: the corpus-preparation operators a
  * training-data pipeline runs between raw crawl and tokenizer —
  * sliding-window chunking, vocabulary statistics, benchmark
  * decontamination, Gopher-style composite quality rules, and embedding
  * introspection. All pure DataFrame expressions, all oracle-checked.
  */
object LlmQueries2 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Sliding-window chunking with overlap (64-token windows, stride 48):
    // the context-window packer. Chunk count = 1 + ceil((n-64)/48)
    // (min 1); chunk i covers tokens [i·48+1, i·48+64]. Explode keeps the
    // whole thing one narrow pass — no shuffle at all.
    q("q_chunk_docs",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |c AS (SELECT doc_id, tok,
        |  unnest(range(0, greatest(1,
        |    1 + CAST(ceil((len(tok) - 64) / 48.0) AS BIGINT)))) AS chunk_idx
        |  FROM t)
        |SELECT doc_id, chunk_idx,
        |  len(tok[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS n_chunk_tokens,
        |  md5(array_to_string(tok[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' '))
        |    AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      graft.llm.TextAnalysis.chunk(documents(s, d), window = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
          md5(col("chunk_text").cast("binary")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Corpus vocabulary: token frequency top-50 (stopword discovery /
    // tokenizer seeding). One explode + one shuffle; ties broken by token
    // so the LIMIT boundary is deterministic.
    q("q_token_freq",
      """SELECT w AS token, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY w ORDER BY cnt DESC, token LIMIT 50""".stripMargin) { (s, d) =>
      documents(s, d).select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(50)
    },

    // Benchmark decontamination scan: corpus-level counts of documents
    // containing any of a known-contaminant phrase set (substring match —
    // the exact-overlap first pass before n-gram contamination checks).
    q("q_contamination",
      """SELECT
        |  count_if(contains(text, 'fast merge batch'))::BIGINT AS hit_p0,
        |  count_if(contains(text, 'window spark order'))::BIGINT AS hit_p1,
        |  count_if(contains(text, 'value table part'))::BIGINT AS hit_p2,
        |  count_if(contains(text, 'fast merge batch')
        |    OR contains(text, 'window spark order')
        |    OR contains(text, 'value table part'))::BIGINT AS hit_any,
        |  count(*) AS n_docs
        |FROM documents""".stripMargin) { (s, d) =>
      val phrases = Seq("fast merge batch", "window spark order", "value table part")
      val hits = phrases.map(p => col("text").contains(p))
      documents(s, d).agg(
        count_if(hits(0)).as("hit_p0"), count_if(hits(1)).as("hit_p1"),
        count_if(hits(2)).as("hit_p2"),
        count_if(hits.reduce(_ || _)).as("hit_any"),
        count(lit(1)).as("n_docs"))
    },

    // Gopher-style composite quality rules: token count, repetition
    // ratio (top token frequency / tokens), alphabetic density — each
    // flagged, plus the final keep decision. The repetition signal needs
    // one explode + two aggregations; everything else is projection.
    q("q_gopher_filter",
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tok FROM documents),
        |f AS (SELECT doc_id, unnest(tok) AS w FROM t),
        |c AS (SELECT doc_id, w, count(*) AS cnt FROM f GROUP BY doc_id, w),
        |m AS (SELECT doc_id, max(cnt) AS max_tok FROM c GROUP BY doc_id)
        |SELECT t.doc_id, len(tok)::BIGINT AS n_tokens,
        |  round(m.max_tok * 1.0 / len(tok), 6) AS rep_ratio,
        |  round(length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0
        |    / length(text), 6) AS alpha_ratio,
        |  len(tok) < 30 AS too_short,
        |  m.max_tok * 1.0 / len(tok) > 0.12 AS too_repetitive,
        |  length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0
        |    / length(text) < 0.81 AS low_alpha,
        |  (len(tok) >= 30 AND m.max_tok * 1.0 / len(tok) <= 0.12
        |    AND length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0
        |      / length(text) >= 0.81) AS keep
        |FROM t JOIN m ON m.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      graft.llm.TextAnalysis.gopherFilter(documents(s, d),
          minTokens = 30, maxRepRatio = 0.12, minAlphaRatio = 0.81)
        .orderBy("doc_id")
    },

    // Per-language token-budget quota sampling (data mixing): rank docs
    // by quality within each language, admit in order until the
    // language's token budget fills. One window pass — the shape that
    // builds a trillion-token mix from per-source quality ranks.
    q("q_token_budget",
      """WITH t AS (SELECT doc_id, lang,
        |    len(string_split(text, ' '))::BIGINT AS n_tokens,
        |    length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text)
        |      AS alpha
        |  FROM documents),
        |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang
        |    ORDER BY alpha DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        |SELECT lang, count(*) AS n_docs, sum(n_tokens)::BIGINT AS tokens_used
        |FROM c WHERE cum <= 3000 GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val t = documents(s, d).select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        (length(regexp_replace(col("text"), "[^a-z]", "")) * lit(1.0) /
          length(col("text"))).as("alpha"))
      val w = Window.partitionBy("lang").orderBy(col("alpha").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.withColumn("cum", sum("n_tokens").over(w))
        .filter(col("cum") <= 3000)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens_used"))
        .orderBy("lang")
    },

    // Cross-source vocabulary overlap (contamination/diversity audit):
    // pairwise Jaccard of per-source token vocabularies — the corpus-mix
    // diagnostic run before weighting sources.
    q("q_source_overlap",
      """WITH v AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE source IN ('src0','src1','src2','src3','src4')),
        |sz AS (SELECT source, count(*) AS n FROM v GROUP BY source),
        |ix AS (SELECT a.source AS s1, b.source AS s2, count(*) AS inter
        |  FROM v a JOIN v b ON a.w = b.w AND a.source < b.source GROUP BY 1, 2)
        |SELECT s1, s2, inter,
        |  round(inter * 1.0 / (x.n + y.n - inter), 6) AS vocab_jaccard
        |FROM ix JOIN sz x ON x.source = s1 JOIN sz y ON y.source = s2
        |ORDER BY s1, s2""".stripMargin) { (s, d) =>
      // The (source, word) vocabulary is tiny but its plan explodes every
      // token; it feeds THREE consumers (sizes + both join sides) —
      // materialize once so the explode+distinct doesn't run 3×.
      val v = documents(s, d)
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .distinct()
        .cut()
      val sz = v.groupBy("source").agg(count(lit(1)).as("n"))
      val ix = v.as("a")
        .join(v.as("b"), col("a.w") === col("b.w") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("inter"))
      ix.join(sz.select(col("source").as("s1"), col("n").as("n1")), "s1")
        .join(sz.select(col("source").as("s2"), col("n").as("n2")), "s2")
        .select(col("s1"), col("s2"), col("inter"),
          round(col("inter") * lit(1.0) / (col("n1") + col("n2") - col("inter")), 6)
            .as("vocab_jaccard"))
        .orderBy("s1", "s2")
    },

    // BPE merge-pair statistics: adjacent-token pair frequencies — the
    // count a byte-pair/word-pair tokenizer maximizes per merge step.
    // zip_with over two shifted slices: no shuffle until the count.
    q("q_bpe_pairs",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |p AS (SELECT tok[i] AS w1, tok[i+1] AS w2
        |  FROM t, unnest(range(1, len(tok))) AS u(i))
        |SELECT w1, w2, count(*) AS cnt FROM p GROUP BY w1, w2
        |ORDER BY cnt DESC, w1, w2 LIMIT 50""".stripMargin) { (s, d) =>
      val tok = col("tok")
      val pairs = zip_with(
        slice(tok, lit(1), size(tok) - 1), slice(tok, lit(2), size(tok) - 1),
        (x, y) => struct(x.as("w1"), y.as("w2")))
      documents(s, d).select(split(col("text"), " ").as("tok"))
        .select(explode(pairs).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(50)
    },

    // Sequence packing: assign chunks to fixed-budget training
    // sequences (1024 tokens) by running-total division — the
    // boundary-splitting approximation every packer starts from. The
    // running total is a two-pass distributed prefix sum (llm.Packing):
    // no unpartitioned window, unlike the oracle's single OVER clause.
    q("q_pack_sequences",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |c AS (SELECT doc_id, tok,
        |  unnest(range(0, greatest(1,
        |    1 + CAST(ceil((len(tok) - 64) / 48.0) AS BIGINT)))) AS chunk_idx
        |  FROM t),
        |sized AS (SELECT doc_id, chunk_idx,
        |  len(tok[chunk_idx * 48 + 1 : chunk_idx * 48 + 64])::BIGINT AS n FROM c),
        |packed AS (SELECT doc_id, chunk_idx, n,
        |  (((sum(n) OVER (ORDER BY doc_id, chunk_idx
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n) // 1024))::BIGINT
        |    AS pack_id
        |  FROM sized)
        |SELECT pack_id, count(*) AS n_chunks, sum(n)::BIGINT AS n_tokens,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM packed GROUP BY pack_id ORDER BY pack_id""".stripMargin) { (s, d) =>
      val docs = documents(s, d)
      val sized = graft.llm.TextAnalysis.chunk(docs, window = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens").as("n"))
      // Bucketing bounds from the pre-explode table: a doc_id-only scan
      // (parquet column stats), not a re-run of the chunk pipeline.
      val b = docs.agg(min(col("doc_id")).cast("double"),
        max(col("doc_id")).cast("double")).head()
      graft.llm.Packing.packSequences(sized, budget = 1024,
        docBounds = Some((b.getDouble(0), b.getDouble(1))))
    },

    // Bigram language-model scoring (CCNet-style perplexity filter): an
    // MLE bigram model trained on the corpus itself — p(w2|w1) =
    // c(w1,w2)/c(w1,·) — scores each document by its mean log
    // probability; low scorers are the gibberish/boilerplate candidates.
    // Two corpus passes, no materialized intermediate: the model (bg)
    // aggregates from pass 1, the unigram denominators aggregate from
    // the MODEL (not a third corpus pass), and pass 2 re-extracts pairs
    // and joins the model — at 100 TB the model table is vocab²-bounded
    // (≪ corpus) so both joins shuffle only token-pair keys. ln() can
    // differ by 1 ulp across engines → the per-doc mean rounds to 6.
    q("q_bigram_lm_score",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |p AS (SELECT doc_id, tok[i] AS w1, tok[i+1] AS w2
        |  FROM t, unnest(range(1, len(tok))) AS u(i)),
        |bg AS (SELECT w1, w2, count(*) AS c2 FROM p GROUP BY w1, w2),
        |ug AS (SELECT w1, sum(c2) AS c1 FROM bg GROUP BY w1)
        |SELECT p.doc_id, count(*) AS n_bigrams,
        |  round(avg(ln(bg.c2 * 1.0 / ug.c1)), 6) AS avg_logprob
        |FROM p JOIN bg ON p.w1 = bg.w1 AND p.w2 = bg.w2
        |JOIN ug ON p.w1 = ug.w1
        |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin) { (s, d) =>
      def pairs = {
        val tok = col("tok")
        val z = zip_with(
          slice(tok, lit(1), size(tok) - 1), slice(tok, lit(2), size(tok) - 1),
          (x, y) => struct(x.as("w1"), y.as("w2")))
        documents(s, d).select(col("doc_id"), split(col("text"), " ").as("tok"))
          .select(col("doc_id"), explode(z).as("p"))
          .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      }
      val bg = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val ug = bg.groupBy(col("w1").as("u1")).agg(sum("c2").as("c1"))
      pairs
        .join(bg, Seq("w1", "w2"))
        .join(ug, col("w1") === col("u1"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(log(col("c2") * lit(1.0) / col("c1"))), 6).as("avg_logprob"))
        .orderBy("doc_id")
    },

    // TF-IDF keyword extraction: top-3 terms per document by
    // tf · ln(N/df). Scores round to 6 BEFORE ranking (same
    // round-then-rank contract as q_sim_topk) with the term as
    // tiebreak, so the cross-engine top-k is identical. The term-freq
    // table feeds both the scorer and the document-frequency aggregate —
    // materialized once (it is vocab-per-doc-sized, far smaller than
    // the exploded corpus).
    q("q_tfidf_topterms",
      """WITH tf AS (SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents) w
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (SELECT tf.doc_id, tf.term,
        |    round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS rk FROM scored)
        |SELECT doc_id, term, tfidf, rk FROM ranked
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
      val tf = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .cut()
      val df = tf.groupBy(col("term").as("t2")).agg(count(lit(1)).as("df"))
      val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
      tf.join(df, col("term") === col("t2"))
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("term"),
          round(col("tf") * log(col("n_docs") * lit(1.0) / col("df")), 6)
            .as("tfidf"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy("doc_id", "rk")
    },

    // Embedding introspection: dominant dimension per vector (first
    // index of the max — identical 1-based semantics in both engines).
    q("q_embed_argmax",
      """SELECT vec_id, label,
        |  list_position(embedding, list_max(embedding)) AS best_dim,
        |  list_max(embedding) AS best_val
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      embeddings(s, d).select(col("vec_id"), col("label"),
          array_position(col("embedding"), array_max(col("embedding"))).as("best_dim"),
          array_max(col("embedding")).as("best_val"))
        .orderBy("vec_id")
    }
  )
}
