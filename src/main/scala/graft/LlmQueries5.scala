package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Fifth LLM-curation tranche: winnowing-sparsified overlap detection
  * (the production-scale form of the fingerprint overlap join) and
  * CCNet-style text normalization.
  */
object LlmQueries5 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Winnowing-sparsified cross-document overlap (Schleimer et al.
    // 2003's guarantee, stride-bucket form): instead of joining EVERY
    // rolling window hash (q_fingerprint_overlap's shape), each doc
    // keeps one representative per stride of 16 positions — the bucket
    // minimum — shrinking the join input ~16× while still detecting
    // any shared run long enough to span a stride boundary. This is
    // the sparsification the overlap join runs with at corpus scale;
    // the dense variant stays as ground truth. Same replayable hash
    // family, so the oracle re-runs selection AND join bit-identically.
    q("q_winnow_overlap",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |h AS (SELECT doc_id, len(tok) AS n,
        |  [('0x' || substr(md5(x), 1, 8))::BIGINT % 1000000007 for x in tok] AS th
        |  FROM t),
        |w AS (SELECT doc_id, n,
        |  CASE WHEN n >= 8
        |    THEN [list_reduce(th[i+1:i+8], (acc, x) -> (acc*131 + x) % 1000000007)
        |          for i in range(0, n - 7)]
        |    ELSE [list_reduce(th, (acc, x) -> (acc*131 + x) % 1000000007)]
        |  END AS wh FROM h),
        |e AS (SELECT doc_id, i // 16 AS stride, wh[i+1] AS fp
        |  FROM w, unnest(range(0, len(wh))) AS u(i)),
        |sparse AS (SELECT DISTINCT doc_id, min(fp) AS fp
        |  FROM e GROUP BY doc_id, stride)
        |SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared
        |FROM sparse a JOIN sparse b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY id1, id2
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      val sparse = TextAnalysis.windowHashPositions(documents(s, d), 8)
        .groupBy(col("doc_id"), (col("pos") / 16).cast("long").as("stride"))
        .agg(min("fp").as("fp"))
        .select("doc_id", "fp").distinct()
        .localCheckpoint() // feeds both join sides
      sparse.as("a")
        .join(sparse.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("shared"))
        .orderBy("id1", "id2")
    },

    // CCNet-style text normalization: lowercase, strip non-alphanumeric
    // characters, collapse whitespace — the canonical form exact dedup
    // and fingerprinting run on in public curation pipelines (CCNet's
    // normalization step before paragraph hashing). Pure per-row
    // projection (zero shuffle); emits before/after sizes so the
    // normalization loss is observable, plus the md5-int hash of the
    // normalized form — the dedup key downstream stages would use.
    q("q_text_normalize",
      """SELECT doc_id,
        |  length(text)::BIGINT AS n_chars_raw,
        |  length(norm)::BIGINT AS n_chars_norm,
        |  len(string_split(norm, ' '))::BIGINT AS n_tokens_norm,
        |  ('0x' || substr(md5(norm), 1, 8))::BIGINT AS norm_hash
        |FROM (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |       ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      documents(s, d)
        .withColumn("norm", norm)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_raw"),
          length(col("norm")).cast("long").as("n_chars_norm"),
          size(split(col("norm"), " ")).cast("long").as("n_tokens_norm"),
          graft.llm.Dedup.md5Int(col("norm")).as("norm_hash"))
        .orderBy("doc_id")
    }
  )
}
