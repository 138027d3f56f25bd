package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale measurement for the intra-doc repetition strip's keep-first
  * pass: `runMain graft.SelfRepScale [wordsPerDoc] [nDocs] [mode]`
  *
  * Two quadratic formulations were replaced in round 14
  * (LlmQueries11 q_selfrep_strip):
  *  1. the keep-first `aggregate` HOF with an `array_contains(acc,
  *     seg)` probe — O(L²) comparisons per document;
  *  2. the word-split embedded INSIDE the segment-building lambda —
  *     interpreted HOF evaluation re-splits the whole document per
  *     segment, O(L²/SegWords) hidden in a "linear" build.
  * The production shape materializes each stage as its own projection
  * column (lambdas then reference attributes, O(1) per element) and
  * keeps first occurrences via two array_sorts, O(L log L).
  *
  * This tool builds synthetic long documents (~half the segments
  * duplicated), materializes the SAME staged segment column for both
  * formulations — isolating the keep-first algorithm — and times
  * sort-based vs fold. `mode = "sort"` skips the fold legs: at ≥50k
  * words/doc the quadratic baseline does not terminate in useful time
  * (>40 min at 100k words before being killed), which is the finding.
  */
object SelfRepScale {
  def main(args: Array[String]): Unit = {
    val wordsPerDoc = args.lift(0).map(_.toInt).getOrElse(100000)
    val nDocs = args.lift(1).map(_.toInt).getOrElse(8)
    val mode = args.lift(2).getOrElse("both")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SELFREP $what%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // Deterministic synthetic corpus: word i of doc d = `w<hash mod V>`
    // with V = wordsPerDoc/2 — roughly half the 4-word segments end up
    // duplicated.
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(wordsPerDoc - 1)),
        i => concat(lit("w"),
          pmod(i * lit(2654435761L) + col("id"), lit(wordsPerDoc / 2)))),
        " ").as("text"))
      .repartition(nDocs).cache()
    docs.count()

    val SegWords = 4
    val nSegs = ((size(col("_ws")) + lit(SegWords - 1)) / lit(SegWords))
      .cast("int")
    // shared staged segment column — both formulations start here
    val stagedDocs = docs
      .withColumn("_ws", split(col("text"), " "))
      .withColumn("_segs", transform(sequence(lit(0), nSegs - 1),
        i => array_join(slice(col("_ws"), i * SegWords + 1, lit(SegWords)), " ")))

    // r14 production shape: sort → adjacent-dedup → re-sort
    val sortDf = stagedDocs
      .withColumn("_by_seg", array_sort(transform(col("_segs"),
        (s0, i) => struct(s0.as("seg"), i.as("idx")))))
      .withColumn("_kept", transform(
        array_sort(transform(
          filter(col("_by_seg"), (x, i) =>
            when(i === 0, lit(true))
              .otherwise(element_at(col("_by_seg"), i).getField("seg") =!=
                x.getField("seg"))),
          x => struct(x.getField("idx").as("idx"),
            x.getField("seg").as("seg")))),
        x => x.getField("seg")))

    // r13 baseline: quadratic fold (kept ONLY as the measured baseline)
    val foldDf = stagedDocs.withColumn("_kept",
      aggregate(col("_segs"), array().cast("array<string>"),
        (acc, seg) => when(array_contains(acc, seg), acc)
          .otherwise(concat(acc, array(seg)))))

    def run(df: DataFrame): Seq[(Long, Long, Long)] =
      df.select(col("doc_id"),
          size(col("_segs")).cast("long").as("n_segs"),
          size(col("_kept")).cast("long").as("n_kept"),
          graft.llm.Dedup.md5Int(array_join(col("_kept"), " ")).as("h"))
        .orderBy("doc_id")
        .select("n_segs", "n_kept", "h")
        .as[(Long, Long, Long)].collect().toSeq

    println(s"SELFREP corpus: $nDocs docs x $wordsPerDoc words " +
      s"(~${wordsPerDoc / SegWords} segments/doc)")
    val a = time("sort-based keep-first (r14)")(run(sortDf))
    val a2 = time("sort-based, warm")(run(sortDf))
    require(a == a2, "sort formulation not deterministic")
    if (mode == "both") {
      val b = time("aggregate-HOF fold (r13)")(run(foldDf))
      require(a == b, "formulations diverged — keep-first semantics broken")
      println(s"SELFREP outputs identical across formulations " +
        s"(${a.map(_._2).sum} kept segments total)")
    }
    spark.stop()
  }
}
