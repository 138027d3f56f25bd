package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate table: the warehouse pattern that
  * makes a 100 TB fact stream summarizable without ever recomputing
  * history. The state table holds ALGEBRAIC partials per
  * (bucket, key) — sum and count (avg = sum/count at read time, min/max
  * merge by min/max) — so merging a new batch is:
  *
  *   partials(batch) ∪ state → groupBy(bucket, key) → combine → commit
  *
  * Only buckets PRESENT in the batch are touched: the union reads the
  * state filtered to the batch's bucket range (partition pruning on a
  * bucket-partitioned state table), and the rewrite is an insert-or-
  * replace of those buckets through [[VersionedTable]] — each refresh
  * is an auditable version.
  *
  * Correctness invariant (IncrementalAggSpec): folding batches in any
  * split equals aggregating the concatenation — guaranteed because
  * sum/count/min/max form a commutative monoid over the partials.
  */
object IncrementalAgg {

  /** Partial aggregates of one batch: (bucketCol, keyCol) →
    * n / sum / min / max over `valueCol`.
    */
  def partials(batch: DataFrame, bucket: Column, key: Column,
               value: Column): DataFrame =
    batch.groupBy(bucket.as("bucket"), key.as("key"))
      .agg(count(lit(1)).as("n"), sum(value).as("vsum"),
        min(value).as("vmin"), max(value).as("vmax"))

  /** Merge two partial tables (same schema) by combining partials. */
  def combine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket", "key")
      .agg(sum("n").as("n"), sum("vsum").as("vsum"),
        min("vmin").as("vmin"), max("vmax").as("vmax"))

  /** Fold a new batch into the versioned aggregate state table.
    * Touches only the buckets the batch contains: untouched buckets are
    * carried through unchanged (their rows are read and rewritten here
    * for simplicity; with a bucket-partitioned state table this becomes
    * a partition-level replace). Returns the committed version.
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
             bucket: Column, key: Column, value: Column): Int = {
    val vt = VersionedTable(spark, statePath)
    val newPartials = partials(batch, bucket, key, value)
    val merged = vt.latestVersion() match {
      case None    => newPartials
      case Some(_) => combine(vt.read(), newPartials)
    }
    vt.commitOverwrite(merged)
  }

  /** Read-time finalization: avg from the algebraic partials. */
  def finalize(state: DataFrame): DataFrame =
    state.select(col("bucket"), col("key"), col("n"), col("vsum"),
      col("vmin"), col("vmax"),
      (col("vsum") / col("n")).as("vavg"))
}
