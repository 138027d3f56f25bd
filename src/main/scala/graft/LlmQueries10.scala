package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tenth LLM-curation tranche (round 13): two standard crawl-curation
  * ops the registry did not yet cover —
  *
  *  - **boilerplate stripping**: remove text segments that repeat
  *    across many distinct documents (navbars, cookie banners, footer
  *    chrome) and reconstruct the cleaned documents. This is the
  *    C4/Dolma "repeated line/paragraph removal" pass; the fixture's
  *    texts carry no newlines, so the segmentation unit is a fixed
  *    4-word window (the delimiter is a fixture adaptation — the plan
  *    shape is identical for newline-delimited paragraphs). Distinct
  *    from the q_exact_substr/q_dup_shingle_fraction family, which
  *    MEASURES overlap; this op removes it and proves the cleaned
  *    bytes cross-engine (md5 of the reconstructed text).
  *  - **DSIR importance weighting** (Xie et al. 2023, hashed-ngram
  *    importance resampling): per-document log-likelihood ratio
  *    between a target-domain unigram LM and the raw-corpus unigram
  *    LM, Laplace-smoothed — the data-selection score that upsamples
  *    target-like documents. Target domain = `lang = 'en'` docs; the
  *    published form hashes features into buckets, which for the
  *    fixture vocabulary is the identity bucketing (vocab ≪ buckets),
  *    so words are used directly and the whole chain stays
  *    oracle-replayable.
  *
  * Conventions as per QueryDef.scala: every column aliased identically
  * on both sides, deterministic ORDER BY, floats rounded in-query, the
  * md5Int hash family (llm/Dedup.scala:97) for byte-exactness proofs.
  */
object LlmQueries10 {
  import Tables._
  import graft.llm.Dedup

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  private val SegWords = 4
  private val BoilerK  = 3 // a segment in >= K distinct docs is boilerplate

  val all: Seq[QueryDef] = Seq(

    // Boilerplate strip: segment every doc into fixed 4-word windows
    // (scan-local — the segment list is built by slicing the split
    // array, no shuffle), count DISTINCT docs per segment (one keyed
    // shuffle; the distinct-agg plans as two-phase partial aggregation,
    // so at 100 TB each executor ships (seg, doc) partials, never raw
    // rows), and broadcast the >=K boilerplate set back (bounded by
    // construction: segments repeated across K+ docs are
    // vocabulary-like, not corpus-like). Reconstruction is one
    // doc-keyed aggregation ordering kept segments by position. The
    // segmentation pass is deliberately re-run for the count and the
    // join sides rather than checkpointed: it is map-only, and the
    // measured CheckpointStrategy rule (protocol memory) is that a cut
    // only pays when consumers would redo a SHUFFLE over corpus-sized
    // data. The md5 of each cleaned text is hash-compared, so the
    // reconstruction is proven byte-exact, not proxied by counts.
    q("q_boilerplate_strip",
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
        |    FROM documents WHERE strlen(text) > 0),
        |  segs AS (SELECT doc_id, i AS seg_idx,
        |      array_to_string(ws[i*$SegWords+1 : i*$SegWords+$SegWords], ' ') AS seg
        |    FROM d, unnest(range(0, (len(ws)+${SegWords - 1})//$SegWords)) AS r(i)),
        |  boiler AS (SELECT seg FROM (
        |      SELECT seg, count(DISTINCT doc_id) AS nd FROM segs GROUP BY seg)
        |    WHERE nd >= $BoilerK),
        |  flags AS (SELECT s.doc_id, s.seg_idx, s.seg,
        |      (b.seg IS NOT NULL) AS is_b
        |    FROM segs s LEFT JOIN boiler b USING (seg)),
        |  rebuilt AS (SELECT doc_id,
        |      count(*)::BIGINT AS n_segs,
        |      sum(CASE WHEN is_b THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
        |      coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
        |        FILTER (WHERE NOT is_b), '') AS clean
        |    FROM flags GROUP BY doc_id)
        |SELECT doc_id, n_segs, n_dropped,
        |  strlen(clean)::BIGINT AS n_bytes_clean,
        |  ('0x' || substr(md5(clean), 1, 8))::BIGINT AS h_clean
        |FROM rebuilt ORDER BY doc_id""".stripMargin) { (s, d) =>
      val ws = split(col("text"), " ")
      val nSegs = ((size(ws) + lit(SegWords - 1)) / lit(SegWords)).cast("int")
      val segList = transform(sequence(lit(0), nSegs - 1),
        i => array_join(slice(ws, i * SegWords + 1, lit(SegWords)), " "))
      def segs = documents(s, d).filter(length(col("text")) > 0)
        .select(col("doc_id"), posexplode(segList).as(Seq("seg_idx", "seg")))
      val boiler = segs.groupBy("seg")
        .agg(count_distinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= BoilerK)
        .select(col("seg"), lit(true).as("is_b"))
      segs.join(broadcast(boiler), Seq("seg"), "left")
        .withColumn("is_b", coalesce(col("is_b"), lit(false)))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_segs"),
          sum(when(col("is_b"), 1L).otherwise(0L)).as("n_dropped"),
          array_join(
            transform(
              array_sort(collect_list(
                when(!col("is_b"), struct(col("seg_idx"), col("seg"))))),
              x => x.getField("seg")),
            " ").as("clean"))
        .select(col("doc_id"), col("n_segs"), col("n_dropped"),
          octet_length(col("clean")).cast("long").as("n_bytes_clean"),
          Dedup.md5Int(col("clean")).as("h_clean"))
        .orderBy("doc_id")
    },

    // DSIR importance weights: one corpus pass builds the shared
    // unigram model (raw count + target count per word in a SINGLE
    // keyed aggregation — the target is a filtered sum, not a second
    // scan); totals and vocabulary size collapse to a 1-row broadcast
    // (PlanLint-allowlisted); the scoring pass re-explodes tokens and
    // broadcast-joins the model, so the only corpus-sized shuffle is
    // the final doc-keyed average. This is the bigram-LM plan shape
    // (PLANS.md) with a broadcast model join: the model is
    // vocabulary-bounded (the published op HASHES features into a
    // fixed bucket space precisely so the model stays broadcastable at
    // any corpus size). `sel` cuts on the ROUNDED weight so the
    // boundary decision is identical cross-engine; weight > 0 =
    // more target-like than raw = the DSIR upsample set.
    q("q_dsir_weights",
      """WITH toks AS (SELECT doc_id, lang, u.tok FROM (
        |    SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents) d,
        |    unnest(d.ws) AS u(tok)),
        |  vocab AS (SELECT tok, count(*)::BIGINT AS cr,
        |      sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ct
        |    FROM toks GROUP BY tok),
        |  tot AS (SELECT sum(cr)::BIGINT AS tr, sum(ct)::BIGINT AS tt,
        |      count(*)::BIGINT AS v FROM vocab),
        |  scored AS (SELECT t.doc_id,
        |      ln((vb.ct + 1)::DOUBLE / (tot.tt + tot.v)::DOUBLE)
        |        - ln((vb.cr + 1)::DOUBLE / (tot.tr + tot.v)::DOUBLE) AS llr
        |    FROM toks t JOIN vocab vb USING (tok) CROSS JOIN tot)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  round(avg(llr), 6) AS dsir_w,
        |  CASE WHEN round(avg(llr), 6) > 0 THEN 1 ELSE 0 END AS sel
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
      val vocab = toks.groupBy("tok")
        .agg(count(lit(1)).as("cr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
      val tot = vocab.agg(sum("cr").as("tr"), sum("ct").as("tt"),
        count(lit(1)).as("v"))
      val llr =
        log((col("ct") + 1).cast("double") / (col("tt") + col("v")).cast("double")) -
        log((col("cr") + 1).cast("double") / (col("tr") + col("v")).cast("double"))
      toks.join(broadcast(vocab), "tok")
        .crossJoin(broadcast(tot))
        .withColumn("llr", llr)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), round(avg(col("llr")), 6).as("dsir_w"))
        .withColumn("sel", when(col("dsir_w") > 0, 1).otherwise(0))
        .select("doc_id", "n_tokens", "dsir_w", "sel")
        .orderBy("doc_id")
    }
  )
}
