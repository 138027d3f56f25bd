package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (mirrors the driver's Verify
  * config: 4 threads, 4 shuffle partitions, UTC).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // mirror Bench/Verify (r19): INT64-micros timestamps so the suites
      // exercise the same footer-stats gear the driver runs with
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
