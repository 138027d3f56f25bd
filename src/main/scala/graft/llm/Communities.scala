package graft.llm

import graft.CheckpointStrategy.Ops._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation over a near-duplicate pair graph.
  *
  * Vote rules (shared by both execution paths and the oracle's unrolled
  * SQL replay): each round a node collects its neighbors' labels plus
  * its OWN current label (the self-vote kills the classic 2-cycle
  * oscillation of synchronous LPA), then adopts the most frequent label,
  * ties broken by the smallest label. Initial label = node id.
  *
  * Adaptive like [[Dedup.connectedComponents]]: the edge list (candidate
  * near-dup pairs) is orders of magnitude smaller than the corpus, so
  * when it fits one task (≤ `localThreshold` directed edges) a
  * partition-local simulation runs all rounds in one narrow pass — two
  * jobs total instead of ~4 per round (join, agg, window, checkpoint).
  * Above the threshold the distributed loop runs: per round one keyed
  * join + keyed agg + id-keyed row_number, lineage cut per round with
  * localCheckpoint. Both paths produce identical labels.
  */
object Communities {

  /** Runs `rounds + 1` synchronous LPA rounds over the undirected pair
    * graph and returns one row per node: (id, label, label_next) with
    * `label` the assignment after `rounds` rounds and `label_next` after
    * one more — callers surface `label != label_next` as the
    * non-convergence count instead of silently truncating the fixpoint.
    */
  def labelPropagation(pairs: DataFrame, rounds: Int,
                       localThreshold: Long = 1000000L): DataFrame = {
    // Materialize the (symmetrized) edge list once: pairs is usually a
    // whole sketch pipeline, and every round touches the edges.
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .cut()
    if (edges.count() <= localThreshold) return localPropagate(edges, rounds)

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var prev: DataFrame = labels
    val w = Window.partitionBy("id").orderBy(col("cnt").desc, col("label").asc)
    (1 to rounds + 1).foreach { _ =>
      prev = labels
      val votes = edges
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .select(col("src").as("id"), col("label"))
        .unionByName(labels)
      labels = votes.groupBy("id", "label").agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("id", "label")
        .cut() // per-round lineage cut (k-core discipline)
    }
    prev.join(labels.select(col("id"), col("label").as("label_next")), "id")
  }

  /** Small-graph path: all rounds simulated in one task over the
    * already-materialized edge list, same vote/tie-break semantics.
    */
  private def localPropagate(edges: DataFrame, rounds: Int): DataFrame = {
    val spark: SparkSession = edges.sparkSession
    import spark.implicits._
    edges.as[(Long, Long)].coalesce(1).mapPartitions { it =>
      val adj = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
      it.foreach { case (s, d) =>
        adj.getOrElseUpdate(s, scala.collection.mutable.ArrayBuffer.empty) += d
      }
      var labels: Map[Long, Long] = adj.keysIterator.map(id => id -> id).toMap
      var prev = labels
      def step(cur: Map[Long, Long]): Map[Long, Long] =
        cur.map { case (id, own) =>
          val cnt = scala.collection.mutable.HashMap.empty[Long, Long]
          adj(id).foreach { d => val l = cur(d); cnt(l) = cnt.getOrElse(l, 0L) + 1 }
          cnt(own) = cnt.getOrElse(own, 0L) + 1 // self-vote
          // max count, tie -> smallest label
          id -> cnt.foldLeft((Long.MaxValue, 0L)) { case ((bl, bc), (l, c)) =>
            if (c > bc || (c == bc && l < bl)) (l, c) else (bl, bc)
          }._1
        }
      (1 to rounds + 1).foreach { _ => prev = labels; labels = step(labels) }
      prev.iterator.map { case (id, l) => (id, l, labels(id)) }
    }.toDF("id", "label", "label_next")
  }
}
