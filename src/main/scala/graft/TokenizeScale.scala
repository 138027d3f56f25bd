package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the BPE training LOOP (llm/Tokenize.trainMerges):
  * `runMain graft.TokenizeScale <sfDir> <rounds> [cadence1,cadence2,...]`
  *
  * Trains `rounds` merges over the documents corpus at `sfDir`, once per
  * checkpoint cadence, and prints one line per config: wall seconds,
  * merges accepted, final corpus token total, convergence flag. This is
  * the measured basis (SCALE.md) for the `checkpointEvery` default —
  * per the project protocol, cut() cadences are MEASURED, not reasoned:
  * a cut bounds the re-applied replace chain to O(cadence) but pays a
  * synchronous materialization; which side wins depends on corpus size
  * and round count.
  */
object TokenizeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = args(1).toInt
    val cadences = args.lift(2)
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(4))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Tokenize
    val d0 = Tables.documents(spark, sfDir)
      .select(col("doc_id"), Tokenize.encode(col("text")).as("s"))
    d0.count() // warm the scan (footers, codegen)
    cadences.foreach { k =>
      val t0 = System.nanoTime()
      val res = Tokenize.trainMerges(d0, maxMerges = rounds, minCount = 1L,
        checkpointEvery = k)
      val dt = (System.nanoTime() - t0) / 1e9
      val lastTok = res.merges.lastOption.map(_.nTokensAfter).getOrElse(-1L)
      println(f"BPE_TRAIN sf=$sfDir rounds=$rounds cadence=$k " +
        f"wall=$dt%.2fs merges=${res.merges.size} final_tokens=$lastTok " +
        s"converged=${res.converged}")
    }
    spark.stop()
  }
}
