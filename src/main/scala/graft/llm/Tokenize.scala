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

  /** [[applyMerge]] with a driver-known rule — the training-loop form:
    * the rule is a literal, so no broadcast join is planned at all and
    * the merge is a pure scan-local projection. Lineage is NOT cut here;
    * [[train]] owns the checkpoint cadence. */
  def applyMergeLit(df: DataFrame, pa: String, pb: String): DataFrame =
    df.select(col("doc_id"), replace(col("s"),
      lit(s" $pa  $pb "), lit(s" $pa$pb ")).as("s"))

  /** One accepted merge: the rule, its adjacency count when chosen, and
    * the corpus token total AFTER applying it. */
  final case class BpeMerge(round: Int, pa: String, pb: String,
                            cnt: Long, nTokensAfter: Long)

  /** Result of a training run: the ordered merges table (the trained
    * tokenizer — re-apply with [[applyMergesTo]]), the final working-form
    * corpus, the base vocabulary size, and whether the run stopped on
    * convergence (no pair ≥ `minCount` left) rather than on the target. */
  final case class BpeTrainResult(merges: Seq[BpeMerge], corpus: DataFrame,
                                  baseVocabSize: Long, converged: Boolean)

  /** Vocabulary-target BPE training: runs [[trainMerges]] for
    * `vocabSize - baseVocab` rounds, where baseVocab is the corpus's
    * distinct whitespace-token count (each accepted merge adds one vocab
    * entry — the standard BPE accounting). One extra distinct-count job
    * up front; everything else is [[trainMerges]]'s per-round plan. */
  def train(corpus: DataFrame, vocabSize: Int, minCount: Long = 2L,
            checkpointEvery: Int = 4): BpeTrainResult = {
    val base = corpus.select(explode(tokensOf(col("s"))).as("t"))
      .agg(count_distinct(col("t"))).head().getLong(0)
    val target = math.max(0L, vocabSize - base).toInt
    trainMerges(corpus, target, minCount, checkpointEvery, base)
  }

  /** The distributed BPE training loop (the q_bpe_train shape, iterated):
    * per round exactly ONE corpus job — an adjacent-pair count (explode +
    * keyed map-side-combinable shuffle) whose single aggregation row
    * carries BOTH the argmax merge rule (min_by over (-cnt, pa, pb) —
    * the canonical count-DESC, pair-ASC tie-break; keys are distinct so
    * the struct ordering is total) AND the total adjacency count, from
    * which the CURRENT token total is exact arithmetic
    * (Σ pairs + n_docs, since a doc of t tokens has t-1 adjacencies and
    * the empty doc is 1 token, 0 adjacencies). The rule is a 1-row
    * driver value (the same O(1)/round driver traffic as distributed
    * Lloyd's argmax — not a data collect), applied as a scan-local
    * literal string pass.
    *
    * Stop rules: `maxMerges` reached, or no pair with count ≥ `minCount`
    * remains (converged — merging a pair that occurs once shrinks
    * nothing). Every `checkpointEvery` accepted merges the corpus
    * lineage is cut ([[graft.CheckpointStrategy]]), bounding both plan
    * depth and the re-applied replace chain to O(checkpointEvery) —
    * measured cadence notes in SCALE.md.
    *
    * Cost model: rounds × (corpus scan + one keyed pair shuffle) + a
    * materialization every `checkpointEvery` rounds — the real
    * distributed-BPE cost at any corpus size; nothing in the loop is
    * proportional to vocab × corpus. */
  def trainMerges(corpus: DataFrame, maxMerges: Int, minCount: Long = 2L,
                  checkpointEvery: Int = 4,
                  baseVocabSize: Long = -1L): BpeTrainResult = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val nDocs = corpus.count()
    var cur = corpus
    val merges = Seq.newBuilder[BpeMerge]
    var prevPending: Option[(Int, String, String, Long)] = None // awaiting nTokensAfter
    var converged = false
    var round = 0
    while (round < maxMerges && !converged) {
      val agg = pairCounts(cur).agg(
        min_by(struct(col("pa"), col("pb"), col("cnt")),
          struct((-col("cnt")).as("nc"), col("pa"), col("pb"))).as("top"),
        coalesce(sum(col("cnt")), lit(0L)).as("total_pairs")).head()
      val totalPairs = agg.getLong(1)
      val nTokensNow = totalPairs + nDocs
      prevPending.foreach { case (r, pa, pb, cnt) =>
        merges += BpeMerge(r, pa, pb, cnt, nTokensNow)
      }
      prevPending = None
      val top = agg.getStruct(0)
      if (top == null || top.getLong(2) < minCount) converged = true
      else {
        val (pa, pb, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
        cur = applyMergeLit(cur, pa, pb)
        if ((round + 1) % checkpointEvery == 0) cur = graft.CheckpointStrategy.cut(cur)
        prevPending = Some((round, pa, pb, cnt))
        round += 1
      }
    }
    // the last accepted merge never saw a following round's pair job —
    // one final O(pairs) count settles its nTokensAfter
    prevPending.foreach { case (r, pa, pb, cnt) =>
      merges += BpeMerge(r, pa, pb, cnt, nTokens(cur).head().getLong(0))
    }
    BpeTrainResult(merges.result(), cur, baseVocabSize, converged)
  }

  /** Re-apply a trained merges table to a (doc_id, s) working-form
    * corpus, in training order — tokenizing new text with the trained
    * tokenizer. One scan-local literal replace per merge (chained in a
    * single projection pipeline); cut every `checkpointEvery` merges to
    * bound plan depth exactly like training. */
  def applyMergesTo(corpus: DataFrame, merges: Seq[BpeMerge],
                    checkpointEvery: Int = 16): DataFrame =
    merges.zipWithIndex.foldLeft(corpus) { case (df, (m, i)) =>
      val next = applyMergeLit(df, m.pa, m.pb)
      if ((i + 1) % checkpointEvery == 0 && i + 1 < merges.size)
        graft.CheckpointStrategy.cut(next)
      else next
    }
}
