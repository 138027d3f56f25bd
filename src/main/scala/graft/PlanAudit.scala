package graft

import org.apache.spark.sql.SparkSession

/** Plan/timing audit utility: `runMain graft.PlanAudit <sfDir> <q1,q2,...>`
  * prints each query's formatted physical plan and cold vs warm count()
  * timings (separating codegen/planning overhead from data-path cost) —
  * the iterate-until-the-plan-is-right loop the build guide demands.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"\n========== $name ==========")
      val df = fn(spark, sfDir)
      if (args.length > 1) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      def time(): Double = {
        val t0 = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
      }
      val cold = time(); val warm = time()
      println(f"$name%s cold=$cold%.2fs warm=$warm%.2fs")
    }
    spark.stop()
  }
}
