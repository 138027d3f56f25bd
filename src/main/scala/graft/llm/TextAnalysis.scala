package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token statistics, quality
  * signals, language-ID heuristic, document fingerprints. Everything is a
  * pure per-row projection (no shuffle at all — scales embarrassingly),
  * all codegen'd expressions, no UDFs.
  */
object TextAnalysis {

  private val tokens = (c: Column) => split(c, " ")

  /** Whitespace token count + a BPE-ish regex token count + stopword
    * signals — the quality-scoring feature row.
    */
  def textStats(docs: DataFrame): DataFrame = {
    val tok = tokens(col("text"))
    val stops = filter(tok, x => x === "the" || x === "a")
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_computed"),
      size(tok).cast("long").as("n_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).cast("long").as("n_word_tokens"),
      size(stops).cast("long").as("n_stopwords"),
      round(size(stops) * lit(1.0) / size(tok), 6).as("stopword_ratio"))
  }

  /** Marker-token sets per language for the n-gram language-ID heuristic.
    * Deliberately tiny: real pipelines plug a model here; the engine
    * contract is the scoring/argmax plumbing, which is what scales.
    */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Language-ID: score = marker hits per language, argmax via sorted
    * struct array (ties break on language code — deterministic). Output:
    * (doc_id, predicted_lang, score, confidence).
    */
  def languageId(docs: DataFrame): DataFrame = {
    val tok = tokens(col("text"))
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(tok, x => markers.map(x === _).reduce(_ || _))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = sort_array(array(scored: _*), asc = false).getItem(0)
    docs.select(col("doc_id"),
      when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
        .as("predicted_lang"),
      best.getField("hits").as("score"),
      round(best.getField("hits") * lit(1.0) / size(tok), 6).as("confidence"))
  }

  /** Winnowing-style rolling fingerprint: hash every w-token window,
    * keep the minimum — stable under small edits anywhere outside the
    * minimal window (the property DedupSpec asserts).
    */
  def rollingFingerprint(docs: DataFrame, window: Int = 8): DataFrame = {
    val tok = tokens(col("text"))
    val windows = transform(sequence(lit(0), size(tok) - window),
      i => xxhash64(array_join(slice(tok, i + 1, lit(window)), " ")))
    docs.select(col("doc_id"),
      when(size(tok) >= window, array_min(windows))
        .otherwise(xxhash64(col("text"))).as("fingerprint"),
      greatest(size(tok) - window + 1, lit(1)).as("n_windows"))
  }
}
