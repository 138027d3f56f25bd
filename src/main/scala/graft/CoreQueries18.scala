package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eighteenth core tranche (round 12): the streaming → versioned-lake
  * exactly-once integration through the CORRECTNESS board — a REAL
  * Structured Streaming query drives micro-batches into a
  * [[graft.lake.VersionedTable]] via batch-id-keyed idempotent commits
  * (Delta's txn action), then the query itself re-delivers two batches
  * and proves they commit nothing. This is the production medallion
  * Bronze loop (reference analogue: the append-mode bronze ingest,
  * main.py:599) with exactly-once instead of duplicating appends.
  */
object CoreQueries18 {
  import Tables._

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  val all: Seq[QueryDef] = Seq(

    // Streaming lake sink, exactly-once by batch id: events split into 3
    // deterministic slices (event_id % 3) land as 3 file-source
    // micro-batches through EventStreams.writeToVersionedExactlyOnce;
    // each batch is one lake commit tagged (appId, batchId) atomically
    // inside the commit record. After the stream stops, batches 2 and 1
    // are DELIBERATELY re-delivered through the same idempotent-commit
    // path (what a foreachBatch replay does on restart/failover) — both
    // must no-op, or the query fails loudly before emitting rows. The
    // output is read from the table's own commit ledger (historyDF's
    // txn_batch + cumulative row counts), so what's hash-compared is the
    // delivery ledger itself: batch ids 0..2, per-batch row counts, and
    // cumulative totals exactly equal to the raw per-slice counts —
    // zero duplicates, zero losses. Scale shape: each commit is a blind
    // append (no snapshot read, no key merge), so the per-batch cost is
    // O(batch) at any table size — the property that keeps a Bronze
    // ingest viable at 100 TB where a keyed merge would re-read the
    // snapshot every trigger.
    q("q_stream_lake_sink",
      """WITH s AS (SELECT event_id % 3 AS batch_id, count(*) AS n_rows
        |  FROM events GROUP BY 1)
        |SELECT batch_id, n_rows,
        |  sum(n_rows) OVER (ORDER BY batch_id)::BIGINT AS n_total
        |FROM s ORDER BY batch_id""".stripMargin) { (s, d) =>
      val base = graft.lake.Scratch.dir("graft-xo-sink")
      val src = base + "/src"
      val target = base + "/t"
      val ckpt = base + "/ckpt"
      val appId = "graft-bronze"
      val ev = events(s, d).select("event_id", "user_id", "value")
      def slice(i: Int): DataFrame = ev.filter(col("event_id") % 3 === i)
      // Each slice lands as ONE file: the running stream triggers on its
      // own whenever the directory listing changes, so a multi-file
      // append can become visible mid-write and split one slice into
      // two micro-batches (observed once at sf1: 4 commits for 3
      // slices). A single file appears atomically (task-commit rename),
      // so a trigger sees the whole slice or nothing — exactly one
      // batch per slice by construction.
      def drop(i: Int): Unit = {
        val out = slice(i).coalesce(1).cache()
        // an empty slice would still commit a ledger row (n_rows=0) that
        // the oracle's GROUP BY never emits — fail HERE with a clear
        // message instead of surfacing as a confusing hash mismatch on
        // some sparse future fixture
        if (out.isEmpty)
          sys.error(s"q_stream_lake_sink: fixture slice $i (event_id % 3) is empty")
        out.write.mode("append").parquet(src)
        out.unpersist()
      }
      // slice 0 is on disk before the stream starts → batch 0; each
      // subsequent drop + processAllAvailable is exactly one micro-batch
      drop(0)
      val query = graft.streaming.EventStreams.writeToVersionedExactlyOnce(
        s.readStream.schema(ev.schema).parquet(src), target, appId, ckpt)
      try {
        query.processAllAvailable()
        drop(1)
        query.processAllAvailable()
        drop(2)
        query.processAllAvailable()
      } finally query.stop()
      val vt = graft.lake.VersionedTable(s, target)
      // failover replay: re-deliver the last and an older batch — the
      // batch-id ledger must swallow both without a commit
      if (vt.commitAppendIdempotent(slice(2), appId, 2L).nonEmpty)
        sys.error("q_stream_lake_sink: replayed batch 2 re-committed")
      if (vt.commitAppendIdempotent(slice(1), appId, 1L).nonEmpty)
        sys.error("q_stream_lake_sink: replayed batch 1 re-committed")
      if (vt.versions().size != 3)
        sys.error(s"q_stream_lake_sink: expected 3 commits, got ${vt.versions()}")
      // the commit ledger IS the result: 3 rows, driver-local window
      val w = Window.orderBy("version")
      vt.historyDF()
        .select(col("version"), col("txn_batch").as("batch_id"),
          (col("rows") - coalesce(lag("rows", 1).over(w), lit(0L))).as("n_rows"),
          col("rows").as("n_total"))
        .select("batch_id", "n_rows", "n_total")
        .orderBy("batch_id")
    }
  )
}
