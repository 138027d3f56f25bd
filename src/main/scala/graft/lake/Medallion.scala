package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's Bronze→Silver→Gold medallion
  * (`/root/reference/main.py:599→622→635`) run INCREMENTALLY: each
  * downstream layer consumes its upstream's change feed
  * ([[ChangeFeedReader]]) instead of re-scanning it — at 100 TB the
  * daily Silver/Gold refresh reads only the commits since its cursor,
  * megabytes instead of the table.
  *
  * Exactly-once end to end, by composing two idempotence mechanisms
  * with the at-least-once cursor:
  *  - Silver refresh applies upstream DELETES first (a conditional
  *    merge keyed on the change rows — a replay finds the keys already
  *    gone and commits nothing), then appends the cleaned INSERTS via
  *    [[VersionedTable.commitAppendIdempotent]] tagged
  *    (`"silver"`, consumed Bronze version) — a replayed batch no-ops
  *    on the txn marker;
  *  - Gold folds SIGNED algebraic partials (insert = +1, delete = −1 —
  *    count/sum form a GROUP, so DV deletes and rewrites maintain
  *    exactly, not just monoid appends) into its state table via
  *    [[VersionedTable.commitOverwriteIdempotent]] tagged
  *    (`"gold"`, consumed Silver version).
  * A crash between any apply and its cursor advance re-delivers the
  * version range; both appliers commit nothing on the replay
  * (MedallionSpec drives exactly that interleaving).
  *
  * Aggregates maintained: n / vsum (avg = vsum/n at read). min/max are
  * NOT delete-maintainable (removal can expose a new extremum only a
  * rescan finds) and are deliberately absent — the same restriction
  * every incremental-view engine documents.
  */
final class Medallion(spark: SparkSession, root: String) {
  val bronze = VersionedTable(spark, s"$root/bronze")
  val silver = VersionedTable(spark, s"$root/silver")
  val gold   = VersionedTable(spark, s"$root/gold")
  val silverCursor = new ChangeFeedReader(bronze, s"$root/_silver_cursor.json")
  val goldCursor   = new ChangeFeedReader(silver, s"$root/_gold_cursor.json")

  /** Bronze ingest: a plain versioned append (the reference's
    * `mode="append"` Bronze write, now with commit history). */
  def ingest(df: DataFrame): Int =
    bronze.latestVersion() match {
      case None    => bronze.commitOverwrite(df)
      case Some(_) => bronze.commitAppend(df)
    }

  /** Incrementally refresh Silver: consume Bronze changes since the
    * cursor; `clean` maps raw change rows to the Silver schema (it
    * must preserve `keys`, Silver's identity columns). Returns the
    * consumed Bronze version, None when already caught up. */
  def refreshSilver(clean: DataFrame => DataFrame,
                    keys: Seq[String]): Option[Int] =
    silverCursor.poll().map { case (changes, head) =>
      val dels = clean(changes.filter(col("_change_type") === "delete")
          .drop("_commit_version", "_change_type"))
        .select(keys.map(col): _*).distinct()
      if (silver.latestVersion().nonEmpty && !dels.isEmpty)
        silver.mergeConditional(dels, keys, Seq(Merge.MatchedDelete(None)))
      val ins = clean(changes.filter(col("_change_type") === "insert")
        .drop("_commit_version", "_change_type"))
      if (!ins.isEmpty)
        silver.commitAppendIdempotent(ins, "silver", head.toLong)
      silverCursor.advance(head)
      head
    }

  /** Incrementally refresh Gold: fold Silver's changes since the
    * cursor into the (bucket, key) → (n, vsum) state as signed
    * partials. Only one state overwrite per refresh; groups whose net
    * count reaches zero drop out. Returns the consumed Silver version,
    * None when already caught up. */
  def refreshGold(bucket: Column, key: Column, value: Column): Option[Int] =
    goldCursor.poll().map { case (changes, head) =>
      val sign = when(col("_change_type") === "delete", lit(-1L))
        .otherwise(lit(1L))
      val parts = changes
        .groupBy(bucket.as("bucket"), key.as("key"))
        .agg(sum(sign).as("n"), sum(value * sign).as("vsum"))
      val merged = gold.latestVersion() match {
        case None    => parts.filter(col("n") > 0)
        case Some(_) => gold.read().unionByName(parts)
          .groupBy("bucket", "key")
          .agg(sum("n").as("n"), sum("vsum").as("vsum"))
          .filter(col("n") > 0)
      }
      gold.commitOverwriteIdempotent(merged, "gold", head.toLong)
      goldCursor.advance(head)
      head
    }

  /** Read-time finalization of the Gold state (avg from partials). */
  def goldView(): DataFrame =
    gold.read().select(col("bucket"), col("key"), col("n"), col("vsum"),
      (col("vsum") / col("n")).as("vavg"))
}
