package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the intra-doc repetition strip's keep-first
  * pass: `runMain graft.SelfRepScale [wordsPerDoc] [nDocs]`
  *
  * The r13 formulation folded segments through an `aggregate` HOF with
  * an `array_contains(acc, seg)` membership probe — O(L²) comparisons
  * per document, bounded by document length but a straggler task the
  * moment one long document shows up (a 1M-word doc ≈ 10¹⁰
  * comparisons). Round 14 replaced it with two `array_sort`s (index →
  * sort by (seg, idx) → adjacent-dedup → re-sort by idx): O(L log L),
  * same scan-local zero-shuffle shape, byte-identical output (the
  * q_selfrep_strip oracle pins it). This tool times BOTH formulations
  * on synthetic long documents with ~half the segments duplicated (the
  * fold's accumulator still grows near-linearly, its worst regime) and
  * prints one line per leg plus the output-equality check.
  */
object SelfRepScale {
  def main(args: Array[String]): Unit = {
    val wordsPerDoc = args.lift(0).map(_.toInt).getOrElse(100000)
    val nDocs = args.lift(1).map(_.toInt).getOrElse(8)
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

    // Deterministic synthetic corpus: each doc = wordsPerDoc words, word
    // i of doc d is `w<(i*2654435761 + d) % V>` with V = wordsPerDoc/2 —
    // roughly half the 4-word segments end up duplicated, the worst mix
    // for keep-first (accumulator grows near-linearly in the old fold).
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(wordsPerDoc - 1)),
        i => concat(lit("w"),
          pmod(i * lit(2654435761L) + col("id"), lit(wordsPerDoc / 2)))),
        " ").as("text"))
      .repartition(nDocs).cache()
    docs.count()

    val SegWords = 4
    val ws = split(col("text"), " ")
    val nSegs = ((size(ws) + lit(SegWords - 1)) / lit(SegWords)).cast("int")
    val segList = transform(sequence(lit(0), nSegs - 1),
      i => array_join(slice(ws, i * SegWords + 1, lit(SegWords)), " "))

    // r13: quadratic fold (kept here as the measured baseline only)
    val keptFold = aggregate(segList,
      array().cast("array<string>"),
      (acc, seg) => when(array_contains(acc, seg), acc)
        .otherwise(concat(acc, array(seg))))

    // r14: sort-based keep-first (the production formulation)
    val bySeg = array_sort(transform(segList,
      (s, i) => struct(s.as("seg"), i.as("idx"))))
    val firsts = filter(bySeg, (x, i) =>
      when(i === 0, lit(true))
        .otherwise(element_at(bySeg, i).getField("seg") =!= x.getField("seg")))
    val keptSort = transform(
      array_sort(transform(firsts,
        x => struct(x.getField("idx").as("idx"), x.getField("seg").as("seg")))),
      x => x.getField("seg"))

    def run(kept: org.apache.spark.sql.Column): Seq[(Long, Long, Long)] =
      docs.select(col("doc_id"),
          size(segList).cast("long").as("n_segs"),
          size(kept).cast("long").as("n_kept"),
          graft.llm.Dedup.md5Int(array_join(kept, " ")).as("h"))
        .orderBy("doc_id")
        .select("n_segs", "n_kept", "h")
        .as[(Long, Long, Long)].collect().toSeq

    println(s"SELFREP corpus: $nDocs docs x $wordsPerDoc words " +
      s"(~${wordsPerDoc / SegWords} segments/doc)")
    val a = time("sort-based keep-first (r14)")(run(keptSort))
    val b = time("aggregate-HOF fold (r13)")(run(keptFold))
    // warm second passes (JIT/codegen settled)
    val a2 = time("sort-based, warm")(run(keptSort))
    val b2 = time("fold, warm")(run(keptFold))
    require(a == b && a2 == b2 && a == a2,
      "formulations diverged — keep-first semantics broken")
    println(s"SELFREP outputs identical across formulations " +
      s"(${a.map(_._2).sum} kept segments total)")
    spark.stop()
  }
}
