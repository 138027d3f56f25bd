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
    * must preserve `keys`, Silver's identity columns, which must also
    * exist on the raw Bronze rows). Returns the consumed Bronze
    * version, None when already caught up.
    *
    * The polled range is NETTED to a final state per key before
    * applying (a key inserted at v1 and deleted at v3 within one range
    * produces nothing; an update's delete+insert pair produces exactly
    * the newest image, never a duplicate row): rank each key's change
    * rows by (version desc, insert-over-delete) and keep the top one.
    * Application order is crash-safe at every point:
    *  1. if Silver's txn ledger already records this range's marker,
    *     the whole batch landed before a crash — skip straight to the
    *     cursor advance (a replayed delete leg must never touch the
    *     rows its own insert leg added);
    *  2. delete leg: every key that appears with a delete ANYWHERE in
    *     the range (tombstones AND the old images of updates) goes
    *     through a conditional-merge delete — replays find the keys
    *     already gone and commit nothing;
    *  3. insert leg: the netted final images append exactly-once via
    *     the (appId="silver", batchId=consumed version) marker.
    */
  def refreshSilver(clean: DataFrame => DataFrame,
                    keys: Seq[String]): Option[Int] =
    silverCursor.poll().map { case (changes0, head) =>
      val alreadyLanded =
        silver.lastCommittedBatch("silver").exists(_ >= head.toLong)
      if (!alreadyLanded) {
        val changes = changes0.cache()
        try {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keys.map(col): _*)
            .orderBy(desc("_commit_version"),
              when(col("_change_type") === "insert", 1).otherwise(0).desc)
          val finals = changes.withColumn("_g_rk", row_number().over(w))
            .filter(col("_g_rk") === 1).drop("_g_rk")
          val delKeys = clean(changes.filter(col("_change_type") === "delete")
              .drop("_commit_version", "_change_type"))
            .select(keys.map(col): _*).distinct()
          if (silver.latestVersion().nonEmpty && !delKeys.isEmpty)
            silver.mergeConditional(delKeys, keys, Seq(Merge.MatchedDelete(None)))
          val ins = clean(finals.filter(col("_change_type") === "insert")
            .drop("_commit_version", "_change_type"))
          if (!ins.isEmpty)
            silver.commitAppendIdempotent(ins, "silver", head.toLong)
        } finally changes.unpersist()
      }
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
