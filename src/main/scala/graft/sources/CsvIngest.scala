package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, StringType}

/** Robust delimited-file ingestion: schema-on-read CSV with corrupt-row
  * QUARANTINE instead of silent drops or job aborts.
  *
  * Reads in PERMISSIVE mode with a `_corrupt_record` capture column,
  * then splits the scan into (clean rows, quarantined raw lines). At
  * 100 TB this is the only sane posture: FAILFAST kills a day-long job
  * on one bad line, DROPMALFORMED silently loses data — quarantine
  * keeps the pipeline running AND auditable (the bad lines land where
  * expectations/alerts can count them; see `ops/Expectations`).
  */
object CsvIngest {

  final case class Ingested(clean: DataFrame, quarantine: DataFrame,
                            private val shared: DataFrame) {
    /** Release the shared scan cache once both sides are consumed. */
    def unpersist(): Unit = { shared.unpersist(); () }
  }

  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true, delimiter: String = ","): Ingested = {
    val corrupt = "_corrupt_record"
    val withCapture = StructType(schema.fields :+
      StructField(corrupt, StringType, nullable = true))
    val raw = spark.read
      .option("header", header)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .schema(withCapture)
      .csv(path)
      // Spark requires referencing the corrupt column through a
      // materialization boundary when filtering on it alone.
      .cache()
    val clean = raw.filter(col(corrupt).isNull).drop(corrupt)
    val quarantine = raw.filter(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw_line"))
    Ingested(clean, quarantine, raw)
  }
}
