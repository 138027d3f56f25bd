package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eighth LLM-curation tranche (round 10): web-ingest normalization —
  * the two ops that sit at the very front of a crawl-curation pipeline,
  * before any quality/dedup stage sees a byte: HTML → text extraction
  * and URL canonicalization. Both are pure codegen'd projections (zero
  * shuffle at any corpus size; the scan is the cost), and both are
  * verified byte-exactly cross-engine (md5 of the extracted text /
  * the canonical URL string itself), not just via counts. All regex
  * literals are RE2-safe so Java regex (Spark) and RE2 (DuckDB) agree
  * by construction (same contract as ops/Pii).
  */
object LlmQueries8 {
  import Tables._
  import graft.llm.Similarity

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  /** Strip script/style blocks, then all tags, decode the core entities
    * (&lt;/&gt;/&quot; before &amp; — the standard order so "&amp;lt;"
    * doesn't double-decode), collapse whitespace. Fixture text contains
    * no '<' or '&', so extraction is exactly invertible on the planted
    * payload — the md5 compare proves the whole chain byte-for-byte.
    * Block patterns carry `(?s)` (DOTALL, same inline flag in Java and
    * RE2): real crawl HTML has multi-line script/style bodies, and
    * without it a script body containing a newline survives stripping
    * and leaks JS into the "extracted" text. The fixture embeds a
    * newline inside the script body to pin this. */
  private def extractText(html: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " "),
                  "(?s)<style[^>]*>.*?</style>", " "),
                "<[^>]+>", " "),
              "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&amp;", "&"),
      "\\s+", " "))

  val all: Seq[QueryDef] = Seq(

    // HTML → text extraction (trafilatura-lite): script/style blocks
    // removed wholesale, tags stripped, entities decoded, whitespace
    // collapsed. The HTML is synthesized deterministically around each
    // fixture document (title/h1 chrome, optional script and nav-div
    // chrome by doc_id residue) so the op exercises all branches; the
    // extracted text's md5 is hash-compared cross-engine — the
    // extraction itself is verified, not a proxy metric.
    q("q_html_extract", {
      val mk =
        """'<html><head><title>Doc ' || doc_id || '</title>' ||
          |  '<style>p{color:red}</style></head><body>' ||
          |  CASE WHEN doc_id % 3 = 0
          |    THEN '<script>var x=1;' || chr(10) || 'var y=2;</script>' ELSE '' END ||
          |  '<h1>' || source || '</h1><p>' || substr(text, 1, 120) || '</p>' ||
          |  CASE WHEN doc_id % 2 = 0
          |    THEN '<div class="nav">home about contact</div>' ELSE '' END ||
          |  '<p>tail &amp; done &lt;eof&gt;</p></body></html>'""".stripMargin
      s"""WITH h AS (SELECT doc_id, $mk AS html FROM documents),
         |x AS (SELECT doc_id, html,
         |  trim(regexp_replace(
         |    regexp_replace(
         |      regexp_replace(
         |        regexp_replace(
         |          regexp_replace(
         |            regexp_replace(
         |              regexp_replace(
         |                regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
         |                '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
         |              '<[^>]+>', ' ', 'g'),
         |            '&lt;', '<', 'g'),
         |          '&gt;', '>', 'g'),
         |        '&quot;', '"', 'g'),
         |      '&amp;', '&', 'g'),
         |    '\\s+', ' ', 'g')) AS extracted
         |  FROM h)
         |SELECT doc_id,
         |  len(regexp_extract_all(html, '<[^>]+>'))::BIGINT AS n_tags,
         |  (doc_id % 3 = 0) AS had_script,
         |  length(extracted)::BIGINT AS n_chars_extracted,
         |  md5(extracted) AS extract_md5
         |FROM x ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>p{color:red}</style></head><body>"),
        when(col("doc_id") % 3 === 0, "<script>var x=1;\nvar y=2;</script>").otherwise(""),
        lit("<h1>"), col("source"), lit("</h1><p>"),
        substring(col("text"), 1, 120), lit("</p>"),
        when(col("doc_id") % 2 === 0, "<div class=\"nav\">home about contact</div>")
          .otherwise(""),
        lit("<p>tail &amp; done &lt;eof&gt;</p></body></html>"))
      documents(s, d)
        .select(col("doc_id"), html.as("html"))
        .withColumn("extracted", extractText(col("html")))
        .select(col("doc_id"),
          regexp_count(col("html"), lit("<[^>]+>")).as("n_tags"),
          (col("doc_id") % 3 === 0).as("had_script"),
          length(col("extracted")).cast("long").as("n_chars_extracted"),
          md5(col("extracted")).as("extract_md5"))
        .orderBy("doc_id")
    },

    // URL canonicalization — the crawl-frontier dedup key: lowercase
    // scheme+host, strip userinfo (user:pw@ never distinguishes a page
    // for frontier purposes), strip leading www., drop default ports
    // (https:443 / http:80 — non-default ports survive), keep path
    // case-sensitive ('' → '/') but uppercase the hex digits of every
    // %-escape (%2f → %2F — RFC 3986 §6.2.2.1 case normalization),
    // drop fragments, drop utm_* tracking params and SORT the survivors
    // (param order never distinguishes URLs). URLs are synthesized
    // deterministically from customer keys with mixed case/scheme/
    // userinfo/port/%-escape/query/fragment branches; the canonical
    // string itself is hash-compared, and n_same_canonical (count over
    // the canonical key) shows the frontier-dedup power — at crawl
    // scale this projection is what keeps the frontier set linear in
    // REAL pages, not in URL spellings.
    q("q_url_canonicalize", {
      val mk =
        """(CASE WHEN c_custkey % 2 = 0 THEN 'HTTPS' ELSE 'http' END) ||
          |  '://' ||
          |  (CASE WHEN c_custkey % 11 = 0 THEN 'u:Pw@' ELSE '' END) ||
          |  (CASE WHEN c_custkey % 6 < 3 THEN 'WWW.' ELSE '' END) ||
          |  'Example' || (c_custkey % 20) || '.COM' ||
          |  (CASE WHEN c_custkey % 4 = 0 THEN ':443'
          |        WHEN c_custkey % 7 = 0 THEN ':8443'
          |        WHEN c_custkey % 10 = 1 THEN ':80' ELSE '' END) ||
          |  '/Path' || (c_custkey % 9) || '/item' ||
          |  (CASE WHEN c_custkey % 8 = 3 THEN '/a%2fb%3dc' ELSE '' END) ||
          |  (CASE WHEN c_custkey % 3 = 0
          |     THEN '?utm_source=news&id=' || (c_custkey % 50) ||
          |          '&utm_campaign=c' || (c_custkey % 5)
          |        WHEN c_custkey % 3 = 1
          |     THEN '?id=' || (c_custkey % 50) || '&ref=abc' ELSE '' END) ||
          |  (CASE WHEN c_custkey % 5 = 0 THEN '#frag' || c_custkey ELSE '' END)""".stripMargin
      s"""WITH u AS (SELECT c_custkey, $mk AS url FROM customer),
         |p AS (SELECT c_custkey, url,
         |  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
         |  regexp_replace(
         |    lower(regexp_extract(url, '^[A-Za-z]+://(?:[^/?#@]*@)?([^/:?#@]+)', 1)),
         |    '^www\\.', '') AS host,
         |  regexp_extract(url, '^[A-Za-z]+://(?:[^/?#@]*@)?[^/:?#]*:([0-9]+)', 1) AS port,
         |  string_split(regexp_extract(url, '^[A-Za-z]+://[^/?#]*(/[^?#]*)', 1), '%') AS pp,
         |  coalesce(array_to_string(list_sort(list_filter(
         |    string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
         |    x -> NOT starts_with(x, 'utm_') AND x <> '')), '&'), '') AS qs
         |  FROM u),
         |p2 AS (SELECT c_custkey, scheme, host, port, qs,
         |  pp[1] || coalesce(array_to_string(list_transform(pp[2:],
         |    x -> '%' || CASE WHEN regexp_matches(x, '^[0-9a-fA-F]{2}')
         |                THEN upper(x[1:2]) || x[3:] ELSE x END), ''), '') AS path
         |  FROM p),
         |c AS (SELECT c_custkey,
         |  scheme || '://' || host ||
         |  (CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
         |          OR (scheme = 'http' AND port = '80')
         |     THEN '' ELSE ':' || port END) ||
         |  (CASE WHEN path = '' THEN '/' ELSE path END) ||
         |  (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS canonical
         |  FROM p2)
         |SELECT c_custkey, canonical,
         |  count(*) OVER (PARTITION BY canonical)::BIGINT AS n_same_canonical
         |FROM c ORDER BY c_custkey""".stripMargin
    }) { (s, d) =>
      val k = col("c_custkey")
      val url = concat(
        when(k % 2 === 0, "HTTPS").otherwise("http"), lit("://"),
        when(k % 11 === 0, "u:Pw@").otherwise(""),
        when(k % 6 < 3, "WWW.").otherwise(""),
        lit("Example"), (k % 20).cast("string"), lit(".COM"),
        when(k % 4 === 0, ":443").when(k % 7 === 0, ":8443")
          .when(k % 10 === 1, ":80").otherwise(""),
        lit("/Path"), (k % 9).cast("string"), lit("/item"),
        when(k % 8 === 3, "/a%2fb%3dc").otherwise(""),
        when(k % 3 === 0, concat(lit("?utm_source=news&id="),
            (k % 50).cast("string"), lit("&utm_campaign=c"), (k % 5).cast("string")))
          .when(k % 3 === 1, concat(lit("?id="), (k % 50).cast("string"), lit("&ref=abc")))
          .otherwise(""),
        when(k % 5 === 0, concat(lit("#frag"), k.cast("string"))).otherwise(""))
      val scheme = lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1))
      val host = regexp_replace(
        lower(regexp_extract(col("url"), "^[A-Za-z]+://(?:[^/?#@]*@)?([^/:?#@]+)", 1)),
        "^www\\.", "")
      val port = regexp_extract(col("url"),
        "^[A-Za-z]+://(?:[^/?#@]*@)?[^/:?#]*:([0-9]+)", 1)
      // userinfo never contains '/', so the path regex's [^/?#]* swallows
      // userinfo+host+port unchanged; %-escape hex digits are uppercased
      // per-fragment after splitting the raw path on '%'
      val rawPath = regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]*(/[^?#]*)", 1)
      val pp = split(col("rawpath"), "%")
      val path = concat(element_at(pp, 1),
        array_join(transform(slice(pp, lit(2), size(pp) - 1),
          x => when(x.rlike("^[0-9a-fA-F]{2}"),
            concat(lit("%"), upper(substring(x, 1, 2)), substring(x, 3, 1000000)))
            .otherwise(concat(lit("%"), x))), ""))
      val qs = array_join(array_sort(filter(
        split(regexp_extract(col("url"), "\\?([^#]*)", 1), "&"),
        x => !startswith(x, lit("utm_")) && x =!= "")), "&")
      val canonical = concat(
        col("scheme"), lit("://"), col("host"),
        when(col("port") === "" ||
            (col("scheme") === "https" && col("port") === "443") ||
            (col("scheme") === "http" && col("port") === "80"), "")
          .otherwise(concat(lit(":"), col("port"))),
        when(col("path") === "", "/").otherwise(col("path")),
        when(col("qs") === "", "").otherwise(concat(lit("?"), col("qs"))))
      customer(s, d)
        .select(k, url.as("url"))
        .withColumn("scheme", scheme).withColumn("host", host)
        .withColumn("port", port).withColumn("rawpath", rawPath)
        .withColumn("path", path).withColumn("qs", qs)
        .select(k, canonical.as("canonical"))
        // canonical-key window: cardinality ∝ distinct real pages — the
        // key this op exists to make high-cardinality
        .withColumn("n_same_canonical",
          count(lit(1)).over(Window.partitionBy("canonical")))
        .orderBy("c_custkey")
    },

    // Hybrid retrieval with reciprocal-rank fusion — the RAG/search-stack
    // composition of the engine's two ranking families: per query doc
    // (doc_id < 10), a LEXICAL top-20 (BM25 k1=1.2 b=0.75 over the
    // query's first 3 tokens — the q_bm25 scorer generalized from fixed
    // terms to per-query terms) and a SEMANTIC top-20 (exact cosine over
    // the embedding table, the q_sim_topk ranking) fuse as
    // rrf = Σ 1/(60 + rank) (Cormack et al. 2009), top-10 per query.
    // Missing-side ranks emit -1 (never null — keeps the cross-engine
    // hash compare on integer columns). Plan shape: the lexical side is
    // the INVERTED-INDEX formulation — one exploded-token corpus scan
    // probed against the ≤30 distinct query terms (broadcast hash semi
    // before the shuffle), so only matching postings ever shuffle; tf,
    // per-term df, and the per-query BM25 stats all derive from that
    // one postings projection plus a scalar corpus aggregate. Cost is
    // O(corpus tokens + matched postings), independent of the query
    // count — the production shape when the query batch grows (the
    // earlier query-at-a-time cross-join re-filtered the whole corpus
    // per query). The semantic side is the documented brute baseline
    // (its scale path is the LSH/IVF candidate ranking — at corpus
    // scale RRF fuses the ANN lists, same fusion arithmetic over
    // bounded inputs). All ranks integer; rrf is a fixed-order sum of
    // two rationals, so both engines emit bit-identical doubles before
    // the round. The oracle keeps the direct per-pair formulation —
    // the hash compare is the proof the two formulations coincide.
    q("q_hybrid_retrieval", {
      def contrib(i: Int) =
        s"ln((st.n_docs - st.df$i + 0.5) / (st.df$i + 0.5) + 1) * " +
          s"(p.tf$i * 2.2) / (p.tf$i + 0.3 + 0.9 * p.dl * st.n_docs / st.sum_dl)"
      s"""WITH q AS (SELECT doc_id AS query_id,
         |    coalesce(string_split(text,' ')[1],'') AS t0,
         |    coalesce(string_split(text,' ')[2],'') AS t1,
         |    coalesce(string_split(text,' ')[3],'') AS t2
         |  FROM documents WHERE doc_id < 10),
         |d AS (SELECT doc_id, string_split(text,' ') AS tok FROM documents),
         |pair AS (SELECT q.query_id, d.doc_id,
         |    len(d.tok)::BIGINT AS dl,
         |    len(list_filter(d.tok, x -> x = q.t0))::BIGINT AS tf0,
         |    len(list_filter(d.tok, x -> x = q.t1))::BIGINT AS tf1,
         |    len(list_filter(d.tok, x -> x = q.t2))::BIGINT AS tf2
         |  FROM d CROSS JOIN q WHERE d.doc_id <> q.query_id),
         |st AS (SELECT query_id, count(*) AS n_docs, sum(dl)::BIGINT AS sum_dl,
         |    sum(CASE WHEN tf0>0 THEN 1 ELSE 0 END)::BIGINT AS df0,
         |    sum(CASE WHEN tf1>0 THEN 1 ELSE 0 END)::BIGINT AS df1,
         |    sum(CASE WHEN tf2>0 THEN 1 ELSE 0 END)::BIGINT AS df2
         |  FROM pair GROUP BY 1),
         |lex AS (SELECT query_id, doc_id, lex_rank FROM (
         |  SELECT p.query_id, p.doc_id,
         |    row_number() OVER (PARTITION BY p.query_id
         |      ORDER BY round(${contrib(0)} + ${contrib(1)} + ${contrib(2)}, 6)
         |        DESC, p.doc_id) AS lex_rank
         |  FROM pair p JOIN st ON st.query_id = p.query_id
         |  WHERE p.tf0 + p.tf1 + p.tf2 > 0) t WHERE lex_rank <= 20),
         |sem AS (SELECT query_id, neighbor_id AS doc_id, rn AS sem_rank FROM (
         |  SELECT qv.query_id, e.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY qv.query_id ORDER BY
         |      round(list_cosine_similarity(e.embedding::DOUBLE[],
         |        qv.qe::DOUBLE[]), 6) DESC, e.vec_id) AS rn
         |  FROM embeddings e CROSS JOIN (SELECT vec_id AS query_id,
         |      embedding AS qe FROM embeddings WHERE vec_id < 10) qv
         |  WHERE e.vec_id <> qv.query_id) t WHERE rn <= 20),
         |fused AS (SELECT coalesce(l.query_id, s.query_id) AS query_id,
         |    coalesce(l.doc_id, s.doc_id) AS doc_id,
         |    coalesce(l.lex_rank, -1) AS lex_rank,
         |    coalesce(s.sem_rank, -1) AS sem_rank,
         |    round(coalesce(1.0/(60 + l.lex_rank), 0)
         |        + coalesce(1.0/(60 + s.sem_rank), 0), 6) AS rrf
         |  FROM lex l FULL JOIN sem s
         |    ON s.query_id = l.query_id AND s.doc_id = l.doc_id)
         |SELECT query_id, doc_id, lex_rank, sem_rank, rrf FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf DESC, doc_id) AS rn FROM fused) t
         |WHERE rn <= 10 ORDER BY query_id, rrf DESC, doc_id""".stripMargin
    }) { (s, d) =>
      import graft.llm.Similarity
      val toks = split(col("text"), " ")
      def qt(i: Int) = coalesce(element_at(toks, i + 1), lit(""))
      // q10 has ~5 readers but is deliberately NOT cut: each re-read is
      // a row-group-pruned 10-row scan, and a cut's synchronous
      // write+read job barrier measured ~0.4 s SLOWER at both sf0.1
      // (2.71→2.94) and sf1 (8.7→9.3)
      val q10 = (documents(s, d).filter(col("doc_id") < 10)
        .select(Seq(col("doc_id").as("query_id"),
          size(toks).cast("long").as("q_dl")) ++
          (0 to 2).map(i => qt(i).as(s"t$i")) ++
          // the query doc's own term membership, read off its token
          // array here — saves the global df correction a third pass
          // over the postings index
          (0 to 2).map(i =>
            array_contains(toks, qt(i)).cast("long").as(s"has$i")): _*))
      // ≤30 distinct probe terms — the broadcast side of the postings
      // semi-join; the explode never shuffles a non-matching token
      val qterms = q10
        .select(explode(array(col("t0"), col("t1"), col("t2"))).as("term"))
        .distinct()
      // the inverted index, restricted to probe terms: one corpus scan,
      // shuffle keyed on (doc_id, term) over matched postings only.
      // cut: postings feed both the tf assembly and the global df —
      // one materialization, two cheap readers
      val postings = graft.CheckpointStrategy.cut(
        // widen (r19): the token explode + postings filter is the CPU
        // floor; on a one-split fixture scan it ran single-task. The
        // doc_id repartition is reused by the groupBy's clustering
        // (doc_id ⊆ {doc_id, term}) — no extra exchange.
        Tables.widen(documents(s, d), col("doc_id"))
          .select(col("doc_id"), size(toks).cast("long").as("dl"),
            explode(toks).as("term"))
          .join(broadcast(qterms), "term")
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"), first("dl").as("dl")))
      // scalar corpus stats (one streaming agg): pair-formulation
      // equivalents are n_docs = N-1 and sum_dl = total - the query
      // doc's own length (the cross join excluded only the self pair)
      val tot = documents(s, d).agg(
        count(lit(1)).as("n_total"),
        sum(size(toks).cast("long")).as("dl_total"))
      // per-term global document frequency from the postings index;
      // the self-correction subtracts the query doc's own membership
      val dfGlobal = postings.groupBy("term")
        .agg(count(lit(1)).as("df_g"))
      val slots = (0 to 2).map(i =>
          q10.select(col("query_id"), col(s"t$i").as("term"),
            lit(i).as("slot"), col(s"has$i").as("self_has")))
        .reduce(_ unionAll _)
      val st = slots
        .join(dfGlobal, Seq("term"), "left")
        .select(col("query_id"), col("slot"),
          (coalesce(col("df_g"), lit(0L)) - col("self_has")).as("df"))
        .groupBy("query_id")
        .agg(sum(when(col("slot") === 0, col("df"))).as("df0"),
          sum(when(col("slot") === 1, col("df"))).as("df1"),
          sum(when(col("slot") === 2, col("df"))).as("df2"))
        .join(q10.select(col("query_id"), col("q_dl")), "query_id")
        .crossJoin(broadcast(tot))
        .select(col("query_id"),
          (col("n_total") - 1L).as("n_docs"),
          (col("dl_total") - col("q_dl")).as("sum_dl"),
          col("df0"), col("df1"), col("df2"))
      // per-(query, doc) tf assembly: postings × 30 slot rows, pivoted
      // to the tf0/tf1/tf2 shape the scorer shares with the oracle
      val tfs = postings
        .join(broadcast(slots), "term")
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(first("dl").as("dl"),
          (0 to 2).map(i =>
            coalesce(sum(when(col("slot") === i, col("tf"))), lit(0L))
              .as(s"tf$i")): _*)
      def contrib(i: Int) = {
        val tf = col(s"tf$i"); val df = col(s"df$i")
        log((col("n_docs") - df + 0.5) / (df + 0.5) + 1) *
          (tf * 2.2) / (tf + 0.3 + lit(0.9) * col("dl") * col("n_docs") / col("sum_dl"))
      }
      val wLex = Window.partitionBy("query_id")
        .orderBy(col("bm25").desc, col("doc_id"))
      val lex = tfs.join(broadcast(st), "query_id")
        .select(col("query_id"), col("doc_id"),
          round(contrib(0) + contrib(1) + contrib(2), 6).as("bm25"))
        .withColumn("lex_rank", row_number().over(wLex))
        .filter(col("lex_rank") <= 20)
        .select("query_id", "doc_id", "lex_rank")
      val emb = embeddings(s, d)
      val sem = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
          k = 20)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rn").as("sem_rank"))
      val wFuse = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
      lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          coalesce(col("lex_rank"), lit(-1)).as("lex_rank"),
          coalesce(col("sem_rank"), lit(-1)).as("sem_rank"),
          round(coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("sem_rank")), lit(0.0)), 6)
            .as("rrf"))
        .withColumn("rn", row_number().over(wFuse)).filter(col("rn") <= 10)
        .select("query_id", "doc_id", "lex_rank", "sem_rank", "rrf")
        .orderBy(col("query_id"), col("rrf").desc, col("doc_id"))
    },

    // Johnson–Lindenstrauss random projection 64 → 16 dims with a
    // measured distortion profile: each vector is projected through a
    // fixed-seed gaussian plane matrix (a literal in both engines — the
    // LSH-planes pattern with its own seed), and deterministic probe
    // pairs (vec_id, vec_id+1 for vec_id % 5 = 0) compare full-space vs
    // projected cosine. The per-pair |Δcos| IS the decision row for
    // running ANN/dedup in the cheap space (16/64 = 4× less vector I/O
    // and flops). Plan: the projection is a scan-local codegen'd
    // expression chain (zero shuffle); the probe join is keyed on
    // vec_id. Determinism: DotProductF/SumSqF left-to-right double
    // accumulation matches DuckDB's list kernels bit for bit (the
    // established LSH/IVF contract), and cosines round to 6 before the
    // Δ so both engines agree exactly.
    q("q_embed_project", {
      val planes = Similarity.hyperplanes(16, 64, seed = 7L)
        .map(p => p.map(v => v.toFloat.toDouble.toString).mkString("[", ", ", "]"))
        .mkString("[", ",\n  ", "]")
      val sq = (c: String) => s"list_sum(list_transform($c, x -> x * x))"
      s"""WITH pl AS (SELECT $planes AS P),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  ${sq("embedding::DOUBLE[]")} AS vsq FROM embeddings),
         |p AS (SELECT vec_id, v, vsq,
         |  [list_dot_product(v, pl.P[i]) for i in range(1, 17)] AS y
         |  FROM e, pl),
         |pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
         |  round(list_dot_product(a.v, b.v) / sqrt(a.vsq * b.vsq), 6) AS cos_full,
         |  round(list_dot_product(a.y, b.y) /
         |    sqrt(${sq("a.y")} * ${sq("b.y")}), 6) AS cos_proj
         |  FROM p a JOIN p b ON b.vec_id = a.vec_id + 1
         |  WHERE a.vec_id % 5 = 0)
         |SELECT id1, id2, cos_full, cos_proj,
         |  round(abs(cos_full - cos_proj), 6) AS abs_err
         |FROM pairs ORDER BY id1""".stripMargin
    }) { (s, d) =>
      val planes = Similarity.hyperplanes(16, 64, seed = 7L)
      def side(prefix: String): DataFrame =
        embeddings(s, d).select(
          (col("vec_id").as(s"${prefix}id") +:
            col("embedding").as(s"${prefix}v") +:
            Similarity.sumSq(col("embedding")).as(s"${prefix}vsq") +:
            (0 until 16).map(i =>
              Similarity.dot(col("embedding"),
                typedLit(planes(i).map(_.toFloat))).as(s"${prefix}y$i"))): _*)
      val a = side("a_")
      val b = side("b_")
      def dotY = (0 until 16).map(i => col(s"a_y$i") * col(s"b_y$i")).reduce(_ + _)
      def sqY(p: String) = (0 until 16).map(i => col(s"${p}y$i") * col(s"${p}y$i")).reduce(_ + _)
      a.filter(col("a_id") % 5 === 0)
        .join(b, col("b_id") === col("a_id") + 1)
        .select(col("a_id").as("id1"), col("b_id").as("id2"),
          round(Similarity.dot(col("a_v"), col("b_v")) /
            sqrt(col("a_vsq") * col("b_vsq")), 6).as("cos_full"),
          round(dotY / sqrt(sqY("a_") * sqY("b_")), 6).as("cos_proj"))
        .withColumn("abs_err", round(abs(col("cos_full") - col("cos_proj")), 6))
        .orderBy("id1")
    }
  )
}
