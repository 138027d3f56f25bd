package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S10: the reference's insert-only MERGE (`guardar_nueva_data`,
  * `/root/reference/main.py:429-475`): delta-rs
  * `merge(predicate).when_not_matched_insert_all()` — source rows with no
  * key match in the target are inserted; matched rows are untouched.
  *
  * Without Delta jars the identical observable semantics are a LEFT ANTI
  * join (existence test) followed by an append, under a single-writer
  * assumption (the reference is single-writer too). For the delta-rs
  * features beyond that — versioned commits, conflict detection, time
  * travel — see [[VersionedTable.insertOnlyMerge]], which runs this same
  * anti-join core through the transaction log.
  *
  * Scale notes: the anti join shuffles both sides on the merge key unless
  * the *target key set* is small enough to broadcast. For an append-mostly
  * 100 TB table the right physical shape is: scan only the target's key
  * column (column pruning keeps this cheap), partition-prune the target to
  * the key range of the batch if the key correlates with partitioning, and
  * let AQE pick broadcast vs shuffle from the pruned size. Keys projection
  * happens here; pruning is the caller's filter.
  */
object Merge {

  /** The rows an insert-only merge would add: `source ▷ target` on
    * equi-keys (anti join). Pure, testable core of the merge.
    */
  def insertCandidates(source: DataFrame, target: DataFrame,
                       keys: Seq[String]): DataFrame = {
    // Project the target to its key columns before the join: the anti
    // join only needs key existence, so never shuffle non-key bytes.
    source.join(target.select(keys.map(target.col): _*), keys, "left_anti")
  }

  /** Full upsert relational core (Delta MERGE with
    * `when_matched_update_all + when_not_matched_insert_all`): target
    * rows whose keys match the source are REPLACED by the source row,
    * unmatched target rows survive, unmatched source rows insert —
    * i.e. `target ▷ source ∪ source`. The anti join carries the full
    * target row (it must survive), so unlike [[insertCandidates]] only
    * the SOURCE side prunes to keys. [[VersionedTable.merge]] runs this
    * on the affected-file slice only (copy-on-write).
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val srcKeys = source.select(keys.map(source.col): _*).distinct()
    target.join(srcKeys, keys, "left_anti")
      .unionByName(source.select(target.columns.map(source.col): _*))
  }

  /** Insert-only merge into a Parquet path: append the anti-join rows.
    * Matched rows are untouched (never rewritten). If the target path
    * doesn't exist yet, the whole source is written (the reference's
    * path-existence check, `main.py:445-446`).
    */
  def insertOnlyMerge(spark: SparkSession, source: DataFrame, targetPath: String,
                      keys: Seq[String],
                      partitionCol: Option[String] = None): Unit = {
    val exists = try {
      spark.read.parquet(targetPath).schema; true
    } catch { case _: Throwable => false }
    val toInsert =
      if (!exists) source
      else insertCandidates(source, spark.read.parquet(targetPath), keys)
    val writer = partitionCol match {
      case Some(c) => toInsert.repartition(toInsert(c)).write.partitionBy(c)
      case None    => toInsert.write
    }
    writer.mode("append").parquet(targetPath)
  }
}
