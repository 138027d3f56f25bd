package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign chunks to fixed-budget training sequences by
  * global running-token-total division (reference: the packer every
  * context-window pipeline starts from).
  *
  * The naive formulation is `sum(n) OVER (ORDER BY key)` — a single
  * unpartitioned WindowExec that funnels the whole corpus through one
  * task. This implementation is the scale-safe equivalent: a two-pass
  * distributed prefix sum over order-aligned buckets.
  *
  *  Bucketing: rows are assigned to k contiguous key ranges with
  *    `width_bucket` on the leading order column (min/max from one cheap
  *    narrow agg). Buckets are pure DATA functions — deterministic under
  *    recomputation, so no checkpoint/cache pinning is needed (the first
  *    cut of this used repartitionByRange + spark_partition_id, which
  *    forced a localCheckpoint of every row; bucketing by value avoids
  *    materializing anything).
  *  Pass 1: per-bucket subtotals — k rows of partition METADATA — are
  *    collected and scan-summed into exclusive offsets on the driver
  *    (the canonical parallel-scan step; ~KBs even at 10k buckets).
  *  Pass 2: broadcast the offsets back and add a bucket-LOCAL running
  *    sum (Window.partitionBy(bucket)), so no task ever sees more than
  *    one bucket's rows.
  */
object Packing {

  /** Adds `running` = inclusive running total of `valueCol` in
    * lexicographic `orderCols` order. Distributed: no unpartitioned
    * window anywhere in the plan. The leading order column must be
    * numeric and non-null (it seeds the range bucketing).
    *
    * `boundsHint`: (min, max) of the leading order column, when the
    * caller knows them from a cheaper source (e.g. parquet column stats
    * of the pre-explode table) — any superset range bucketing on the
    * same column is correct, it only shifts bucket occupancy. Without a
    * hint one extra narrow min/max pass over `df` runs.
    */
  def runningTotal(df: DataFrame, valueCol: String, orderCols: Seq[String],
                   buckets: Int = 0,
                   boundsHint: Option[(Double, Double)] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val k = if (buckets > 0) buckets
      else spark.sessionState.conf.numShufflePartitions
    val lead = col(orderCols.head).cast("double")
    val bounds = boundsHint match {
      case Some((lo, hi)) => org.apache.spark.sql.Row(lo, hi)
      case None => df.agg(min(lead), max(lead)).head()
    }
    val bucket: Column =
      if (bounds.isNullAt(0) || bounds.getDouble(0) == bounds.getDouble(1)) lit(1L)
      else width_bucket(lead, lit(bounds.getDouble(0)), lit(bounds.getDouble(1)), lit(k))
    val keyed = df.withColumn("__bkt", bucket)
    // Per-bucket subtotals: the only driver-side step, O(k) rows.
    val subs = keyed.groupBy("__bkt").agg(sum(valueCol).as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = subs.map(_._1)
      .zip(subs.map(_._2).scanLeft(0L)(_ + _).init)
      .toSeq
    val w = Window.partitionBy("__bkt").orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .join(broadcast(offsets.toDF("__bkt", "__offset")), Seq("__bkt"))
      .withColumn("running", sum(valueCol).over(w) + col("__offset"))
      .drop("__bkt", "__offset")
  }

  /** Pack (doc_id, chunk_idx, n)-shaped chunk rows into fixed-budget
    * sequences: pack_id = exclusive-running-total(n) div budget, in
    * global (doc_id, chunk_idx) order. Returns per-pack occupancy stats.
    * `docBounds` = (min, max) doc_id of the source table when known —
    * saves the bounds pass re-running the chunk explode (every doc
    * yields ≥1 chunk, so source-table bounds equal chunk bounds).
    */
  def packSequences(sized: DataFrame, budget: Int,
                    docBounds: Option[(Double, Double)] = None): DataFrame = {
    runningTotal(sized, "n", Seq("doc_id", "chunk_idx"), boundsHint = docBounds)
      .withColumn("pack_id",
        floor((col("running") - col("n")) / budget).cast("long"))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n").as("n_tokens"),
        countDistinct("doc_id").as("n_docs"))
      .orderBy("pack_id")
  }
}
