package graft

import org.apache.spark.sql.SparkSession

/** Isolated per-query timing: `runMain graft.TimeQuery <sfDir> <q1,q2,...>`
  * — the Bench protocol (warm pass, then min of 2 timed passes, cache
  * release between runs) applied to a subset, for chasing individual
  * regressions without a full-registry sweep.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // INT64-micros timestamps (r19): footer-statable (INT96 carries no
      // usable stats) and 8 bytes instead of 12; value-identical reads
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
    // measurement-only: SPARK_GRAFT_CONF="k=v,k=v" for A/B conf flips
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = SparkEntry.queries
    def releaseCaches(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    names.foreach { n =>
      require(all.contains(n), s"unknown query $n")
      all(n)(spark, sfDir).count() // warm
      releaseCaches()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        all(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        releaseCaches()
        dt
      }
      println(f"TIME $n%-30s ${ts.min}%8.3f s")
    }
    spark.stop()
  }
}
