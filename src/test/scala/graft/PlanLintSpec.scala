package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Scale lint over the whole query registry: an unpartitioned Window
  * funnels every row through ONE task ("WindowExec: No Partition
  * Defined"), which is correct on test data and fatal at corpus scale.
  * Guards the q_pack_sequences two-pass prefix-sum rewrite (llm.Packing)
  * against regressing back to the single OVER-clause formulation.
  */
class PlanLintSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Documented exceptions — each has an explicit scale note at its
    * definition site and a dimension-bounded input (hundreds of rows).
    */
  private val allow = Set("q_lead_ntile", "q_null_ordering",
    "q_yoy_growth",    // 12-row lag over the calendar-bounded monthly aggregate
    "q_skyline",       // suffix-min over the ≤|size domain| per-size aggregate
    "q_bootstrap_ci",  // rank over the 50-row replicate-mean frame
    "q_kaplan_meier",  // suffix/cumulative windows over the calendar-day-bounded risk table
    "q_vocab_growth",  // 10-row prefix sum over the decile list (bounded at any corpus size)
    "q_range_export",  // prefix sum over the LENGTH histogram (cardinality ≤ max doc length, never corpus rows)
    "q_stream_lake_sink") // lag over the 3-row commit ledger (historyDF: one row per micro-batch, never corpus rows)

  test("no registered query plans an unpartitioned Window outside the allowlist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if !allow(name) &&
        fn(spark, sf).queryExecution.optimizedPlan.collectFirst {
          case w: LogicalWindow if w.partitionSpec.isEmpty => w
        }.nonEmpty => name
    }
    assert(offenders.isEmpty,
      s"unpartitioned (single-task) Window in: ${offenders.mkString(", ")}")
  }

  /** Low-cardinality window-key lint (round-10, from the q_percent_rank
    * post-mortem): a Window partitioned on a key with < ~100 distinct
    * values funnels a corpus-proportional input into that many tasks —
    * correct at test scale, a single-task multi-billion-row sort at
    * 100×. A single-scale check can't tell a genuinely fixed key
    * (l_returnflag: 3 values forever) from a key that merely LOOKS
    * small at tiny sf (user_id: 15 at sf0.001, 10× more per 10× data),
    * nor a corpus-proportional input from a bounded one (calendar
    * scaffolds, price-bucket lists — they saturate). So the check is
    * DIFFERENTIAL: each Window's child subplan is evaluated at BOTH
    * sf0.001 and sf0.01 (via PlanProbe.ofRows — sees through aliases
    * and derived keys), and a window is flagged only when its input
    * grows with the corpus (>= 5000 rows at sf0.01 and > 3× the
    * sf0.001 count) while its partition-key cardinality does not
    * (< 100 distinct at sf0.01 and < 1.5× the sf0.001 count). That is
    * exactly the shape that dies at 100×.
    */
  private val allowLowCard = Set[String]()

  test("no corpus-growing Window is partitioned on a fixed low-cardinality key") {
    import org.apache.spark.sql.graft.PlanProbe
    import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Distinct, Project}
    val sfBig = "/root/testdata/sf0.01"
    def windowsOf(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
                  dir: String): Seq[LogicalWindow] =
      fn(spark, dir).queryExecution.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.nonEmpty => w
      }
    def measure(w: LogicalWindow): (Long, Long) = {
      val n = PlanProbe.ofRows(spark, w.child).count()
      val keys: Seq[NamedExpression] = w.partitionSpec.zipWithIndex.map {
        case (ne: NamedExpression, _) => ne
        case (e, i) => Alias(e, s"k$i")()
      }
      val d = PlanProbe.ofRows(spark, Distinct(Project(keys, w.child))).count()
      (n, d)
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !allowLowCard(name) =>
        val (small, big) = (windowsOf(fn, sf), windowsOf(fn, sfBig))
        // Windows pair up positionally ONLY if the plan shape is
        // scale-invariant; count-gated adaptive queries (localBfs vs
        // distributed-relax branches) can legitimately differ between
        // scales — zip would then silently truncate or mispair, so a
        // mismatch must fail loudly and earn an explicit allowlisting.
        assert(small.length == big.length,
          s"$name: window count differs across scales (${small.length} at " +
            s"sf0.001 vs ${big.length} at sf0.01) — plan shape is " +
            "scale-dependent; lint cannot pair windows positionally")
        small.zip(big).flatMap { case (wS, wB) =>
          val (nB, dB) = measure(wB)
          if (nB < 5000 || dB >= 100) None
          else {
            val (nS, dS) = measure(wS)
            val inputGrows = nB > 3 * nS
            val keyGrows = dB >= 1.5 * dS
            if (inputGrows && !keyGrows)
              Some(s"$name (input $nS->$nB rows, partitions $dS->$dB)")
            else None
          }
        }.headOption
      case _ => None
    }
    assert(offenders.isEmpty,
      s"corpus-growing window on fixed low-cardinality key in: ${offenders.mkString("; ")}")
  }

  /** Queries allowed to plan a nested-loop/cartesian join (whether they
    * do can depend on fixture scale): an explicit bounded cross product,
    * a broadcast of a 1-row scalar aggregate, or a documented
    * exact-baseline all-pairs op whose scale sibling is the banded
    * variant. Everything else planning an NLJ is a lost join condition —
    * the classic silent scale-killer this lint exists to catch. */
  private val allowNlj = Set(
    "q_cross_join",            // the explicit bounded dim×dim product
    "q_sim_topk",              // brute-force baseline: corpus × 10 queries
    "q_sim_ivf",               // broadcast centroid assignment
    "q_sim_ivfpq",             // broadcast centroid/codebook assignment (√N-row builds)
    "q_ann_filtered",          // q_sim_ivf's broadcast centroid assignment + 10-row query-label broadcast
    "q_dedup_embedding_exact", // bounded all-pairs ground truth (id1<id2)
    "q_dedup_jaccard",         // bounded ground truth (inequality self-join)
    "q_fuzzy_match",           // bounded edit-distance ground truth (inequality self-join)
    "q_dedup_survivors_exact", // same bounded Jaccard pair generation
    "q11_top_value_parts",     // 1-row global-total broadcast
    "q22_inactive_customers",  // 1-row global-average broadcast
    "q_scalar_subquery",       // scalar subquery broadcast
    "q_tfidf_topterms",        // 1-row corpus-size (N) broadcast for the idf
    "q_dsir_weights",          // 1-row model-totals (tr/tt/V) broadcast
    "q_range_export",          // 1-row corpus-total (N) broadcast for the shard-boundary map
    "q_source_overlap",        // vocab self-join has an equi key; pairs filter is < (kept below)
    "q_domain_mix",            // 1-row corpus-total broadcast
    "q_pmi_cooccur",           // 1-row corpus-size broadcast (pair join itself is equi on doc_id)
    "q_embed_quantize",        // 1-row query-vector broadcast
    "q_hll_union",             // 1-row merged-sketch × 1-row global-exact broadcast
    "q_funnel",                // 1-row first-stage-count broadcast for the conversion ratio
    "q_kmv_intersect",         // bounded source-pair generator (inequality self-join of the ≤|sources|-row list)
    "q_gap_fill",              // bounded |priorities|×|days| calendar scaffold
    "q_triangle_count",        // 1-row mean-edge-weight broadcast for sparsification
    "q_shortest_path",         // same 1-row mean-edge-weight broadcast (shared tradeEdges)
    "q_harmonic_centrality",   // same 1-row mean-edge-weight broadcast (shared tradeEdges)
    "q_link_jaccard",          // same 1-row mean-edge-weight broadcast (shared tradeEdges)
    "q_kcore",                 // same 1-row mean-edge-weight broadcast (shared tradeEdges)
    "q_basket_lift",           // 1-row order-total broadcast for support/lift denominators
    "q_autocorr",              // bounded |lags|×|days| scaffold over the daily aggregate
    "q_benford",               // 1-row digit-total broadcast
    "q_assortativity",         // same 1-row mean-edge-weight broadcast (shared tradeEdges)
    "q_clustering_coeff",      // same 1-row mean-edge-weight broadcast (shared tradeEdges)
    "q_welch_ttest",           // |segments|-row aggregate inequality self-join (bounded pair table)
    "q_bm25",                  // 1-row corpus-stats broadcast (N, Σdl, per-term df)
    "q_psi_drift",             // two 1-row period-total broadcasts
    "q_hits",                  // 1-row mean-edge-weight + L1-total broadcasts
    "q_chisq_conversion",      // 1-row grand-total broadcast (marginals are bounded equi-joins)
    "q_mix_temperature",       // 1-row token-total + normalizer broadcasts
    "q_kmeans",                // k-row centroid broadcast per Lloyd round
    "q_semdedup",              // same k-row centroid broadcast (pair scan itself is equi on cluster)
    "q_mix_epochs",            // 1-row max-source-count broadcast onto the |sources|-row epoch table
    "q_kl_source",             // 1-row corpus-token-total broadcast onto the vocab-bounded term table
    "q_winnow_overlap",        // 1-row dropped-bucket-count broadcast (the cap-visibility column)
    "q_ann_recall",            // composes q_sim_topk/ivf's allowlisted broadcasts + a 3-row family grid
    "q_skew_diagnostic",       // 1-row (n_rows, n_keys) totals broadcast onto the top-5 list
    "q_dedup_recall",          // 1-row hit-count × 1-row truth-count broadcast (audit scalars)
    "q_dedup_threshold_sweep", // 5-row threshold-grid broadcast onto the verified pair set
    "q_vocab_growth",          // 1-row max-doc-id broadcast for decile bucketing
    "q_length_buckets",        // 1-row global (max, count, sum) broadcast for the no-bucketing baseline
    "q_cluster_incremental",   // k-row centroid broadcast (as q_kmeans) + two 1-row total broadcasts
    "q_ann_sweep",             // composes q_ann_recall's allowlisted broadcasts; 6 1-row config stats cross-combined
    "q_dedup_cost_scaling",    // four 1-row audit-scalar broadcasts (docs/pairs per modulus) cross-combined
    "q_hybrid_retrieval",      // 1-row corpus-stats broadcast (inverted-index BM25 stats) + the q_sim_topk brute baseline
    "q_rerank",                // the q_sim_topk brute candidate pass (corpus × 10 queries); the feature join itself is equi on doc_id
    "q_bpe_train",             // 3 unrolled 1-row merge-rule broadcasts + 3 1-row token-total broadcasts (the per-round BPE argmax)
    "q_hard_negatives",        // the q_sim_topk brute scoring pass (corpus × 10 broadcast queries) with the near-dup exclusion band
    "q_rank_eval",             // composes q_rerank's allowlisted brute candidate pass; the eval itself is O(queries)
  )

  test("no registered query plans an accidental nested-loop join outside the allowlist") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if !allowNlj(name) &&
        fn(spark, sf).queryExecution.sparkPlan.collectFirst {
          case j: BroadcastNestedLoopJoinExec => j
          case j: CartesianProductExec => j
        }.nonEmpty => name
    }
    assert(offenders.isEmpty,
      s"nested-loop/cartesian join in: ${offenders.mkString(", ")}")
  }
}
