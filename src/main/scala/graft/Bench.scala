package graft
import java.nio.file.{Files, Paths}
import java.util.Locale
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE compact JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * The driver keeps only the tail of stdout (~2000 chars) and parses the
  * JSON line inside that window (BENCH_r01..r03 all came back parsed:null
  * — r1/r2 from sbt log wrappers, r3 because the 112-query line was ~4 KB
  * and overflowed the window). So the stdout line carries a HEADLINE
  * subset — one or two queries per operator family — while the FULL
  * per-query timings for every registered query are written to
  * `BENCH_FULL_r{N}.json` in the repo each run (the committed record the
  * stdout window can't fit).
  *
  * Timing protocol (`warm+release+min2+headline2-v4`, the `protocol`
  * field in both JSON outputs — bump the epoch whenever the methodology
  * changes so a protocol change can't masquerade as a code regression):
  * every query runs once UNTIMED first (codegen + JIT warm — r4 showed
  * 35-query cold runs drifting 1.26× on identical code), then TWO
  * independent timed sweeps in sorted name order, then (v4) TWO more
  * timed sweeps over ONLY the headline subset; each query reports its
  * minimum across every sweep it ran in. Min-of-2 exists because round
  * 5's record showed a contiguous 4-query window of the single timed
  * sweep inflated 1.4–6.2× by a transient machine stall that a re-run
  * reproduced none of — a one-off spike now has to hit the same query
  * in both sweeps to survive into the record. The headline re-sweeps
  * exist because rounds 11–12 showed the driver's one-JVM 249-query
  * battery drifting the headline up ~1.07×/round as the registry grew
  * (JIT/codeheap pressure — touched and untouched queries drifted by
  * the same ratio) while same-code headline-subset runs stayed at the
  * r10 level: by the time the headline re-sweeps run, the JVM is in
  * JIT steady state for the whole plan set, so the headline number
  * measures the data path, not registry size. The `jit` field records
  * codeheap/heap occupancy at each phase boundary so JIT pressure is
  * adjudicable from the JSON alone. A query that throws is recorded in
  * `errors` (stderr + both JSON outputs) and excluded from timings, so
  * a regression can't masquerade as a fast run.
  */
object Bench {
  /** One per family: TPC-H-shaped, joins (broadcast/semi/as-of/range/
    * salted), windows/sessions, reshape, lake ops, scalar funcs, and the
    * LLM-pipeline ops (dedup exact/minhash/jaccard, similarity brute/LSH/
    * IVF, text analysis, multimodal, packing, decontamination). */
  private val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_revenue", "q5_region_revenue",
    "q10_returned_revenue", "q18_large_orders", "q7_nation_volume",
    "q_join_dims", "q_semi_join", "q_asof_join", "q_range_join",
    "q_salted_join",
    "q_gold_window", "q_silver_clean", "q_rank_topn", "q_topk_global",
    "q_session_islands", "q_window_sliding", "q_cube",
    "q_unpivot", "q_pivot_sum",
    "q_merge_insert_only", "q_watermark_daily",
    "q_string_funcs", "q_date_ops",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_jaccard",
    "q_sim_topk", "q_sim_ann_lsh", "q_sim_ivf",
    "q_langid", "q_quality_score", "q_token_bpe",
    "q_multimodal_features", "q_contamination", "q_pack_sequences",
    "q_source_overlap",
    // round-7 sketch/sampling families
    "q_cms_freq", "q_bloom_prefilter", "q_kmv_union", "q_decontaminate",
    // round-7 behavioral/graph analytics families
    "q_funnel", "q_cohort_retention", "q_pagerank", "q_kmv_intersect",
    // round-8 time-series/graph/order-statistics families
    "q_gap_fill", "q_triangle_count", "q_weighted_median",
    "q_max_concurrency", "q_basket_lift", "q_dup_shingle_fraction",
    // slowest registry families — tracked so a lake/pipeline regression
    // shows up in the driver record, not just the full-timings file
    "q_curation_pipeline", "q_lake_skipping", "q_lake_dml",
    // round-9 attribution + graph-community families
    "q_attrib_linear", "q_label_prop",
    // round-9 linkage + robust-stats families
    "q_jaro_linkage", "q_mad_robust",
    // semantic-dedup tranche (SemDedup + token-window near-dup)
    "q_semdedup", "q_chunk_semdedup",
    // round-9 span-coverage / mixing / model-scoring / incremental-agg
    "q_exact_substr", "q_mix_epochs", "q_quality_model", "q_lake_incr_agg",
    "q_percent_rank", "q_longest_dup_span",
    "q_winnow_overlap", "q_text_normalize", "q_scd2_join",
    "q_lake_time_travel", "q_kl_source", "q_oov_rate",
    // round-10 ANN-evaluation + stream-parity families (cross-round
    // comparisons use the common subset — see PLANS.md battery note)
    "q_ann_recall", "q_interval_join_outer",
    // round-10 lake CDC/evolution, dedup self-evaluation, skew + vocab
    // profiling families
    "q_lake_cdc", "q_lake_schema_evolve", "q_interval_join_full",
    "q_skew_diagnostic", "q_dedup_recall", "q_dedup_threshold_sweep",
    "q_vocab_growth", "q_dedup_incremental", "q_pii_scrub", "q_length_buckets",
    "q_cluster_incremental", "q_stream_enrich", "q_html_extract",
    "q_url_canonicalize", "q_embed_project",
  )

  /** Machine-epoch calibration canary. Round 8's driver bench ran on a
    * loaded machine and recorded per-query spikes up to 7.2× that a
    * quiescent re-run on identical code reproduced none of — and nothing
    * in the record flagged the bad epoch. The canary makes machine drift
    * visible IN the record: a fixed pure-CPU xorshift loop (min-of-3, so
    * a one-off scheduler blip doesn't false-positive, while sustained
    * contention still shows) timed before sweep 1 and again after sweep
    * 2, plus /proc/loadavg at both points. The quiet-machine reference
    * is PER-HOST, resolved through [[BenchCalibration]] (committed
    * calibration file → quiet-run self-measure → built-in fallback);
    * a pre/post reading >1.3× it gets a loud stderr warning, the
    * record's `calibration.clean` flips false, and `ref_source` tells
    * readers which kind of baseline judged it. */
  private def canarySec(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < 150000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      if (x == 42) System.err.println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    Seq(once(), once(), once()).min
  }
  /** Width-dependent CPU canary (round 13): the same xorshift work as
    * [[canarySec]] run on EVERY core at once; reported as the ratio of
    * the slowest thread's wall to the single-thread canary. On truly
    * dedicated vCPUs this sits near 1.0; on a host with invisible
    * oversubscription it rises — and a 32-thread Spark battery inflates
    * by roughly that factor UNIFORMLY while the single-thread canary
    * stays flat. Measured during round-13's drift investigation: four
    * same-code clean-canary runs drifted 38.0→45.0 s (headline) with
    * single-thread canaries flat at ~0.32 and a 1.21× wide-canary
    * ratio captured at the drifted end — the r12 driver-vs-builder
    * "uniform ~1.13× across touched and untouched queries" signature,
    * finally attributable from inside the record. */
  private def canaryWideSec(): Double = {
    val n = Runtime.getRuntime.availableProcessors()
    def once(): Double = {
      val threads = (0 until n).map { _ =>
        new Thread(() => {
          var x = 0x9E3779B97F4A7C15L
          var i = 0
          while (i < 150000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
          if (x == 42) System.err.println("")
        })
      }
      val t0 = System.nanoTime()
      threads.foreach(_.start()); threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  /** Disk-side canary (round 13): min-of-3 of a fixed
    * 24×256KB write+fsync+read+delete cycle in the same filesystem the
    * lake queries' scratch lives in. Motivation: three same-code r13
    * runs had FLAT CPU canaries (0.319/0.339/0.332 vs ref ~0.32) while
    * their file-I/O-heavy queries (lake_*, dedup stores) drifted
    * 8-13% — storage-side ambient variance the pure-CPU canary cannot
    * see. No clean-flag coupling yet (no per-host I/O reference
    * exists); the record carries `io_pre`/`io_post` so a reader can
    * adjudicate an I/O-flavored drift from the JSON alone, exactly as
    * `jit` adjudicates code-cache pressure. */
  private def ioCanarySec(): Double = {
    def once(): Double = {
      val dir = Files.createTempDirectory("graft-iocanary")
      val buf = new Array[Byte](256 * 1024)
      java.util.Arrays.fill(buf, 7.toByte)
      val t0 = System.nanoTime()
      (0 until 24).foreach { i =>
        val p = dir.resolve(s"f$i")
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try { ch.write(java.nio.ByteBuffer.wrap(buf)); ch.force(true) }
        finally ch.close()
        Files.readAllBytes(p)
        Files.delete(p)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      Files.delete(dir)
      dt
    }
    Seq(once(), once(), once()).min
  }

  private def loadavg(): String =
    try Files.readString(Paths.get("/proc/loadavg")).trim.split(" ").take(3).mkString(" ")
    catch { case _: Throwable => "" }

  /** Round number for the full-timings filename, inferred from the
    * driver's artifacts: a CORRECTNESS_r{N} without a matching BENCH_r{N}
    * means round N is in flight (verify ran first); otherwise the next
    * round after the last complete pair. */
  private def currentRound(repo: String): Int = {
    def maxRound(prefix: String): Int = {
      val pat = (prefix + "_r(\\d+)\\.json").r
      Option(new java.io.File(repo).list()).getOrElse(Array.empty[String])
        .collect { case pat(n) => n.toInt }.maxOption.getOrElse(0)
    }
    val c = maxRound("CORRECTNESS")
    val b = maxRound("BENCH")
    if (c > b) c else math.max(c, b) + 1
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Measurement-only knobs (unset in driver runs → default behavior):
    // SPARK_GRAFT_BENCH_SUBSET = comma-separated query names restricts
    // the battery (memory-pressure rehearsals on the heavy tail);
    // SPARK_GRAFT_MEM_FRACTION overrides spark.memory.fraction (0.6
    // default) to force the spill paths a 100-TB executor lives in.
    val subset = sys.env.get("SPARK_GRAFT_BENCH_SUBSET")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val memFraction = sys.env.get("SPARK_GRAFT_MEM_FRACTION")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // INT64-micros timestamps (r19): footer-statable (INT96 carries no
      // usable stats) and 8 bytes instead of 12; value-identical reads
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
    memFraction.foreach(f => builder.config("spark.memory.fraction", f))
    val spark = builder.getOrCreate()
    // Spill accounting for memory-pressure rehearsals: totals printed at
    // the end prove the constrained run actually exercised the spill
    // paths (completion alone can't distinguish "spilled gracefully"
    // from "fit after all").
    val spillBytes = new java.util.concurrent.atomic.AtomicLong()
    val spillDiskBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            spillBytes.addAndGet(m.memoryBytesSpilled)
            spillDiskBytes.addAndGet(m.diskBytesSpilled): Unit
          }
        }
      })
    spark.sparkContext.setLogLevel("WARN")
    val all = SparkEntry.queries
    // A headline name missing from the registry (rename, drop) must be
    // loud: silently shrinking the benchmark would flatter the numbers.
    val missing = headline.filterNot(all.contains)
    if (missing.nonEmpty)
      System.err.println(s"[bench] MISSING headline queries: ${missing.mkString(",")}")
    // Untimed warm pass over EVERY query (plus the raw table reads):
    // parquet footers, codegen, and JIT all land here, so the timed pass
    // measures the data path and per-query deltas are comparable across
    // rounds (r4's cold 35-query run drifted 1.26× on identical code).
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
        Tables.table(spark, sfDir, t).count()
      }
      Tables.events(spark, sfDir).count()
    } catch { case _: Throwable => () }
    // Drop blocks left behind by localCheckpoint-based pipelines
    // (source_overlap, dedup CC, ...): 2×113 executions otherwise
    // accumulate enough storage to evict/GC-churn later queries —
    // measured as q_dedup_minhash 11.4s in-bench vs 1.5s isolated.
    def releaseCaches(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    val names = subset match {
      case Some(ss) =>
        // unknown subset names FAIL the run — a typo or renamed query
        // would otherwise shrink a rehearsal silently, and a stderr line
        // buried in a long bench log measures the wrong thing with exit 0
        val unknown = ss.filterNot(all.contains)
        if (unknown.nonEmpty)
          sys.error(
            s"unknown SPARK_GRAFT_BENCH_SUBSET queries: ${unknown.toSeq.sorted.mkString(",")}")
        all.keys.toSeq.filter(ss).sorted
      case None => all.keys.toSeq.sorted
    }
    names.foreach { name =>
      try all(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
      releaseCaches()
    }
    System.gc()
    // Timed pass, deterministic (sorted) order.
    val debug = sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")
    def jitStats(): String = {
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      val cc = pools.filter(_.getName.toLowerCase.contains("codeheap"))
        .map(p => f"${p.getName.replace("CodeHeap '", "").replace("'", "")}=${p.getUsage.getUsed / 1e6}%.0fM")
      val heap = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
      (cc :+ f"heap=${heap.getUsed / 1e9}%.1fG").mkString(" ")
    }
    // Structured codeheap/heap snapshot for the record: JIT pressure —
    // the mechanism behind rounds 11-12's registry-growth drift — must
    // be adjudicable from the JSON alone, not from a lost stderr line.
    def jitJson(): String = {
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      val cc = pools.filter(_.getName.toLowerCase.contains("codeheap")).map { p =>
        val key = p.getName.replace("CodeHeap '", "").replace("'", "")
          .trim.replace(' ', '_').replace('-', '_')
        s""""$key":${p.getUsage.getUsed / (1 << 20)}"""
      }
      val heap = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
      (cc :+ s""""heap_mb":${heap.getUsed / (1 << 20)}""").mkString("{", ",", "}")
    }
    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    // name → max bytes spilled (memory+disk) in any single sweep
    val querySpill = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val repoForCal = sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo")
    val load1 = try loadavg().split(" ").head.toDouble catch { case _: Throwable => 0.0 }
    val cal = BenchCalibration.resolve(repoForCal, () => canarySec(),
      load1, Runtime.getRuntime.availableProcessors())
    val canaryRefSec = cal.refSec
    val (canaryPre, loadPre) = (canarySec(), loadavg())
    val ioPre = ioCanarySec()
    val widePre = canaryWideSec()
    BenchCalibration.warning("pre-sweep", canaryPre, canaryRefSec, loadPre)
      .foreach(System.err.println)
    val jitPostWarm = jitJson()
    def sweep(pass: String, list: Seq[String]): Map[String, Double] = list.flatMap { name =>
      releaseCaches()
      // drain the async listener bus so the spill counters start (and
      // below, end) at a true query boundary — onTaskEnd events can lag
      // the action's return and would otherwise smear one query's spill
      // into its neighbor's delta
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      val t0 = System.nanoTime()
      val spill0 = spillBytes.get + spillDiskBytes.get
      try {
        all(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // Per-query spill attribution for memory-pressure rehearsals:
        // queries run strictly sequentially, so the listener-counter
        // delta over the query's window is its spill (max across
        // sweeps — the worst pressure observed). The drain happens
        // OUTSIDE the timed window (before t0 of the next query).
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
        val dSpill = spillBytes.get + spillDiskBytes.get - spill0
        if (dSpill > 0) { querySpill.merge(name, dSpill, (a, b) => math.max(a, b)); () }
        if (debug) System.err.println(f"[bench] p$pass%-3s $name%-28s ${dt}%6.2fs  ${jitStats()}")
        Some(name -> dt)
      } catch {
        case e: Throwable =>
          errors += name
          System.err.println(s"[bench] FAILED $name: ${e.getMessage}")
          None
      }
    }.toMap
    val (s1, s2) = (sweep("1", names), sweep("2", names))
    val jitPostFull = jitJson()
    // Headline re-sweeps (v4): by now the JVM has JIT-compiled the whole
    // registry's plan set, so these two passes measure the headline
    // subset at steady state — the number that is comparable across
    // rounds regardless of how many queries the registry grew.
    val headlineNames =
      if (subset.isEmpty) names.filter(headline.contains) else Seq.empty
    System.gc()
    val (h1, h2) =
      (sweep("h1", headlineNames), sweep("h2", headlineNames))
    val jitPostHeadline = jitJson()
    val (canaryPost, loadPost) = (canarySec(), loadavg())
    val ioPost = ioCanarySec()
    val widePost = canaryWideSec()
    BenchCalibration.warning("post-sweep", canaryPost, canaryRefSec, loadPost)
      .foreach(System.err.println)
    val results = names.flatMap { n =>
      val runs = Seq(s1.get(n), s2.get(n), h1.get(n), h2.get(n)).flatten
      if (runs.isEmpty) None else Some(n -> runs.min)
    }
    def fmt(v: Double): String = "%.3f".formatLocal(Locale.ROOT, v)
    val errJson = errors.toSeq.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Subset rehearsals skip the headline re-sweeps — their records must
    // say so: a reader comparing "min of 4 steady-state passes" numbers
    // against a min-of-2 run would be misled by a shared label.
    val protocol =
      if (subset.isEmpty) "warm+release+min2+headline2-v4"
      else "warm+release+min2-v4-subset"
    val jitField =
      s"""{"post_warm":$jitPostWarm,"post_full":$jitPostFull,""" +
        s""""post_headline":$jitPostHeadline}"""
    val clean = canaryPre <= canaryRefSec * BenchCalibration.warnFactor &&
      canaryPost <= canaryRefSec * BenchCalibration.warnFactor
    val calJson =
      s"""{"ref":${fmt(canaryRefSec)},"ref_source":"${cal.source}",""" +
        s""""pre":${fmt(canaryPre)},"post":${fmt(canaryPost)},""" +
        s""""io_pre":${fmt(ioPre)},"io_post":${fmt(ioPost)},""" +
        s""""wide_pre":${fmt(widePre)},"wide_post":${fmt(widePost)},""" +
        s""""wide_ratio_pre":${fmt(widePre / canaryPre)},""" +
        s""""wide_ratio_post":${fmt(widePost / canaryPost)},""" +
        s""""loadavg_pre":"$loadPre","loadavg_post":"$loadPost","clean":$clean}"""
    // Full per-query record: every registered query, committed in-repo.
    val repo = repoForCal
    val round = currentRound(repo)
    val fullJson = {
      val m = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      // per-query spill lands in the record only when a memory-pressure
      // rehearsal is running (it's the rehearsal's deliverable; default
      // runs rarely spill and the totals print on stderr regardless)
      val spillJson =
        if (memFraction.isEmpty) ""
        else {
          import scala.jdk.CollectionConverters._
          val entries = querySpill.asScala.toSeq.sortBy(-_._2)
            .map { case (k, v) => "\"" + k + "\":" + (v / (1 << 20)) }
          s""""spill_mb":${entries.mkString("{", ",", "}")},"""
        }
      s"""{"round":$round,"sf":"$sfDir","unit":"sec","protocol":"$protocol",""" +
        s""""calibration":$calJson,"jit":$jitField,$spillJson""" +
        s""""timed":${results.length},"total":${fmt(results.map(_._2).sum)},""" +
        s""""errors":$errJson,"queries":$m}"""
    }
    // A subset or non-default-memory run is a rehearsal, never the
    // committed record — write it under a name the round record can't
    // collide with.
    val fullName =
      if (subset.isEmpty && memFraction.isEmpty) f"BENCH_FULL_r$round%02d.json"
      else f"BENCH_REHEARSAL_r$round%02d.json"
    try Files.writeString(Paths.get(repo, fullName), fullJson)
    catch { case e: Throwable =>
      System.err.println(s"[bench] full-timings write failed: ${e.getMessage}")
    }
    // Headline stdout line for the driver's parse window. `value` is
    // recomputed from the queries actually reported, so the line stays
    // internally consistent even if the length guard drops entries
    // (`timed` vs `reported` makes any truncation visible).
    val headlineTimes = results.filter { case (k, _) => headline.contains(k) }
    def line(qs: Seq[(String, Double)]): String = {
      val m = qs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(qs.map(_._2).sum)},"unit":"sec",""" +
        s""""protocol":"$protocol","calibration":$calJson,""" +
        s""""timed":${headlineTimes.length},""" +
        s""""reported":${qs.length},"errors":$errJson,"queries":$m,"sf":"$sfDir"}"""
    }
    var keep = headlineTimes
    var out = line(keep)
    while (out.length > 1800 && keep.nonEmpty) {
      keep = keep.dropRight(1); out = line(keep)
    }
    println(out)
    System.err.println(
      s"[bench] spill totals: memory=${spillBytes.get / (1 << 20)} MiB " +
        s"disk=${spillDiskBytes.get / (1 << 20)} MiB")
    spark.stop()
  }
}
