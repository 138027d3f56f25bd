package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, when}

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

  // ---- conditional MERGE clauses (Delta's full WHEN grammar) -----------
  //
  // Evaluation frames — the API contract that keeps mixed-side
  // conditions unambiguous without a DSL:
  //  * matched clauses (condition AND update assignments) evaluate over
  //    the target⋈source row with the target aliased `t` and the source
  //    aliased `s` — write `col("t.x")` / `col("s.x")`; an unqualified
  //    shared name is ambiguous and errors, exactly Spark's own rule;
  //  * not-matched (insert) conditions see only the source row, aliased
  //    `s` (plain names also resolve);
  //  * not-matched-BY-SOURCE clauses see only the target row, aliased
  //    `t` (plain names also resolve).
  // Within each group the FIRST clause whose condition holds applies
  // (Delta's clause-order semantics); a row no clause claims carries
  // through unchanged (matched / by-source) or is dropped (insert).

  sealed trait MergeClause { def condition: Option[Column] }
  /** WHEN MATCHED [AND cond] THEN UPDATE: `set = None` = UPDATE ALL
    * (the target row is replaced by its source row); `Some(m)` assigns
    * only `m`'s columns, the rest carry through from the target. */
  final case class MatchedUpdate(condition: Option[Column],
                                 set: Option[Map[String, Column]]) extends MergeClause
  /** WHEN MATCHED [AND cond] THEN DELETE. */
  final case class MatchedDelete(condition: Option[Column]) extends MergeClause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT ALL. */
  final case class NotMatchedInsert(condition: Option[Column]) extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE. */
  final case class NotMatchedBySourceDelete(condition: Option[Column]) extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET. */
  final case class NotMatchedBySourceUpdate(condition: Option[Column],
                                            set: Map[String, Column]) extends MergeClause

  /** Index of the first clause whose condition holds, -1 when none does
    * — first-match-wins, built right-to-left so clause 0 tests first. */
  private def firstMatch(clauses: Seq[MergeClause]): Column =
    clauses.zipWithIndex.foldRight(lit(-1)) { case ((cl, i), acc) =>
      when(cl.condition.getOrElse(lit(true)), lit(i)).otherwise(acc)
    }

  /** Resolve the matched half of a conditional merge over one
    * target-slice ⋈ source join: rows claimed by a delete clause drop,
    * update clauses produce their new image, unclaimed rows carry
    * through. `columns` is the target schema's column order. Pure —
    * [[VersionedTable.mergeConditional]] drives it under the commit
    * protocol; MergeClauseSpec pins the semantics standalone. */
  def applyMatched(targetSlice: DataFrame, source: DataFrame, keys: Seq[String],
                   clauses: Seq[MergeClause], columns: Seq[String]): DataFrame = {
    require(clauses.forall(c => c.isInstanceOf[MatchedUpdate] ||
      c.isInstanceOf[MatchedDelete]), "applyMatched takes matched clauses only")
    val joined = targetSlice.as("t").join(source.as("s"),
      keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _), "inner")
      .withColumn("_g_act", firstMatch(clauses))
    val deleteIdxs = clauses.zipWithIndex.collect {
      case (_: MatchedDelete, i) => i }
    val kept = if (deleteIdxs.isEmpty) joined
      else joined.filter(!col("_g_act").isin(deleteIdxs: _*))
    val out = columns.map { n =>
      clauses.zipWithIndex.foldRight(col(s"t.$n")) { case ((cl, i), acc) =>
        cl match {
          case MatchedUpdate(_, None) =>
            when(col("_g_act") === i, col(s"s.$n")).otherwise(acc)
          case MatchedUpdate(_, Some(set)) =>
            when(col("_g_act") === i,
              set.getOrElse(n, col(s"t.$n"))).otherwise(acc)
          case _ => acc // delete rows already filtered
        }
      }.as(n)
    }
    kept.select(out: _*)
  }

  /** Resolve the not-matched-by-source half over the unmatched target
    * rows (aliased `t`): by-source deletes drop, by-source updates
    * assign, unclaimed rows carry through. */
  def applyBySource(unmatched: DataFrame, clauses: Seq[MergeClause],
                    columns: Seq[String]): DataFrame = {
    require(clauses.forall(c => c.isInstanceOf[NotMatchedBySourceDelete] ||
      c.isInstanceOf[NotMatchedBySourceUpdate]),
      "applyBySource takes by-source clauses only")
    if (clauses.isEmpty) return unmatched.select(columns.map(col): _*)
    val acted = unmatched.as("t").withColumn("_g_act", firstMatch(clauses))
    val deleteIdxs = clauses.zipWithIndex.collect {
      case (_: NotMatchedBySourceDelete, i) => i }
    val kept = if (deleteIdxs.isEmpty) acted
      else acted.filter(!col("_g_act").isin(deleteIdxs: _*))
    val out = columns.map { n =>
      clauses.zipWithIndex.foldRight(col(s"t.$n")) { case ((cl, i), acc) =>
        cl match {
          case NotMatchedBySourceUpdate(_, set) =>
            when(col("_g_act") === i,
              set.getOrElse(n, col(s"t.$n"))).otherwise(acc)
          case _ => acc
        }
      }.as(n)
    }
    kept.select(out: _*)
  }

  /** Source rows a NOT MATCHED insert clause claims (aliased `s`),
    * projected to the target column order. `targetKeys` must be the
    * FULL snapshot's key set — a source row matching a key in an
    * unaffected file must not insert. */
  def applyInserts(source: DataFrame, targetKeys: DataFrame, keys: Seq[String],
                   clauses: Seq[MergeClause], columns: Seq[String]): DataFrame = {
    require(clauses.forall(_.isInstanceOf[NotMatchedInsert]),
      "applyInserts takes not-matched insert clauses only")
    val unmatched = source.join(targetKeys, keys, "left_anti").as("s")
    if (clauses.isEmpty) unmatched.select(columns.map(col): _*).limit(0)
    else unmatched.withColumn("_g_act", firstMatch(clauses))
      .filter(col("_g_act") >= 0)
      .select(columns.map(col): _*)
  }
}
