package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training primitives (used by q_bpe_train;
  * see the registry entry in LlmQueries9 for the full cross-engine
  * contract and TokenizeSpec for the pinned edge semantics).
  *
  * The working representation is the DOUBLE-SPACE-JOINED form: tokens
  * separated by exactly two spaces, with two-space sentinels at both
  * ends. Under that encoding, plain non-regex substring replacement of
  * `" a  b "` with `" ab "` consumes one boundary space from each side,
  * so adjacent merge sites keep their separators and left-to-right
  * non-overlapping replacement IS greedy BPE application — with
  * identical semantics in Spark and DuckDB and no regex escaping of
  * data-dependent tokens.
  *
  * Per training round the plan shape is: one adjacent-pair count
  * (explode + a single keyed map-side-combinable shuffle), a 1-row
  * argmax TakeOrdered broadcast, and a scan-local string pass applying
  * the merge. Vocabulary-scale training runs more rounds of the same
  * per-round plan.
  */
object Tokenize {

  /** `text` (single-space joined) → the double-space working form. */
  def encode(text: Column): Column =
    concat(lit("  "), replace(text, lit(" "), lit("  ")), lit("  "))

  /** Tokens of the double-space form (empty input yields `[""]`, the
    * same 1-token convention as `split(text, " ")` on empty text). */
  def tokensOf(s: Column): Column = split(trim(s), "  ")

  /** Adjacent-pair counts over column `s` of `df`: one explode + one
    * keyed shuffle → (pa, pb, cnt). */
  def pairCounts(df: DataFrame): DataFrame = {
    val t = tokensOf(col("s"))
    val prs = zip_with(slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1),
      (x, y) => struct(x.as("pa"), y.as("pb")))
    df.select(explode(prs).as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The argmax merge rule (count DESC, pair ASC — the deterministic
    * BPE tie-break), cut because both the merge application and the
    * caller's output row read it and must not redo the pair shuffle. */
  def topRule(pairs: DataFrame): DataFrame =
    graft.CheckpointStrategy.cut(
      pairs.orderBy(col("cnt").desc, col("pa"), col("pb")).limit(1))

  /** Apply the 1-row merge rule `r` to the double-space corpus:
    * greedy left-to-right, scan-local. Cut only when the merged corpus
    * has two readers (the next round's pair count + the token total);
    * pass `last = true` for the final round, whose corpus is read
    * once. */
  def applyMerge(df: DataFrame, r: DataFrame, last: Boolean = false): DataFrame = {
    val merged = df.crossJoin(broadcast(r))
      .select(col("doc_id"), replace(col("s"),
        concat(lit(" "), col("pa"), lit("  "), col("pb"), lit(" ")),
        concat(lit(" "), col("pa"), col("pb"), lit(" "))).as("s"))
    if (last) merged else graft.CheckpointStrategy.cut(merged)
  }

  /** 1-row corpus token total of the working form. */
  def nTokens(df: DataFrame): DataFrame =
    df.agg(sum(size(tokensOf(col("s")))).cast("long").as("n_tokens_after"))
}
