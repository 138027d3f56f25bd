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
