package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd iterations) over an embedding column —
  * the canonical "train a clustering at corpus scale" op (topic
  * bucketing, IVF codebook training, dataset cartography).
  *
  * Determinism contract (the oracle gate replays every step in DuckDB):
  *  - init: the first k vec_ids' vectors — no RNG;
  *  - assignment: argmin L2² with ties to the lower cluster id, exactly
  *    the IVF/PQ family's window pattern; distances come from the
  *    codegen'd float-array expressions whose left-to-right double
  *    accumulation matches DuckDB's list kernels bit for bit;
  *  - update: per-dimension means are QUANTIZED TO FLOAT on both
  *    engines before the next assignment pass. avg() partial-sum order
  *    differs across engines at ~1e-15 relative; the float cast
  *    collapses both to the same 24-bit mantissa value (a boundary flip
  *    needs the true mean within ~1e-15 of a float midpoint), so the
  *    next iteration's inputs — and every distance after it — are
  *    bit-identical again.
  *
  * Scale shape: centroids are a k-row broadcast (the corpus never
  * shuffles for assignment); the update is one keyed aggregation over
  * (cluster, dim) — k·dim cells; iterations are a fixed unroll. The
  * only per-row state is the current assignment, recomputed per round
  * exactly like the distributed Lloyd step on any cluster size.
  */
object Clustering {
  import Similarity.{dot, sumSq}

  private def d2(vsq: Column): Column =
    vsq - lit(2.0) * dot(col("e"), col("ce")) + col("cesq")

  /** Nearest-centroid assignment: returns (vec_id, e, vsq, cluster, d2). */
  private def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("dist2"), col("cluster"))
    corpus.crossJoin(broadcast(centroids))
      .withColumn("dist2", d2(col("vsq")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("e"), col("vsq"), col("cluster"), col("dist2"))
  }

  /** Mean of each cluster's members per dimension, float-quantized;
    * clusters emptied by the previous assignment drop out (standard
    * Lloyd behavior for deterministic init). */
  private def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cluster"), posexplode(col("e")).as(Seq("j", "x")))
      .groupBy("cluster", "j").agg(avg("x").as("m"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("m")))),
        s => s.getField("m").cast("float")).as("ce"))
      .withColumn("cesq", sumSq(col("ce")))

  /** Runs `rounds` assignment rounds from the first-k-ids init — i.e.
    * `rounds - 1` Lloyd centroid updates, then the final assignment that
    * is profiled (so `rounds = 1` scores the init centroids untouched) —
    * and returns the per-cluster profile: member count and L2² inertia. */
  def kmeans(embeddings: DataFrame, k: Int = 4, rounds: Int = 2): DataFrame =
    kmeansAssignments(embeddings, k, rounds)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        round(sum("dist2"), 2).as("inertia"),
        round(avg("dist2"), 6).as("mean_d2"))
      .orderBy("cluster")

  private def prep(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("vsq", sumSq(col("e")))

  /** Trained centroids (cluster, ce, cesq) after `rounds - 1` Lloyd
    * updates from the k-smallest-vec_id init (identical to the historic
    * `vec_id < k` rule on a dense-from-0 id space, but also well-defined
    * on any id subset — e.g. the corpus side of an incremental split).
    * This is the persistable "clustering store": assignment of later
    * batches needs only these k rows, never the training corpus. */
  def kmeansCentroids(embeddings: DataFrame, k: Int = 4,
                      rounds: Int = 2): DataFrame = {
    val corpus = prep(embeddings)
    val init = corpus.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cluster"), col("e").as("ce"),
        col("vsq").as("cesq"))
    (1 until rounds).foldLeft(init) { (c, _) =>
      update(assign(corpus, c))
    }
  }

  /** Nearest-centroid assignment of `embeddings` against an existing
    * centroid set (k-row broadcast; the vectors never shuffle). Columns:
    * (vec_id, e, vsq, cluster, dist2). */
  def assignTo(embeddings: DataFrame, centroids: DataFrame): DataFrame =
    assign(prep(embeddings), centroids)

  /** Per-vector nearest-centroid assignment after `rounds` rounds (same
    * determinism contract and physical shape as [[kmeans]] — this IS its
    * final assignment pass, exposed for consumers that need the members,
    * not the profile: SemDedup, topic bucketing, cartography). Columns:
    * (vec_id, e, vsq, cluster, dist2). */
  def kmeansAssignments(embeddings: DataFrame, k: Int = 4,
                        rounds: Int = 2): DataFrame =
    assignTo(embeddings, kmeansCentroids(embeddings, k, rounds))
}
