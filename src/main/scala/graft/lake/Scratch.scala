package graft.lake

import java.nio.file.{Files, Path}

/** Per-JVM scratch space for queries that exercise the versioned-lake
  * commit protocol (q_lake_dml / q_lake_skipping / q_lake_time_travel /
  * q_lake_incr_agg). Each invocation still gets a FRESH directory (the
  * queries are self-contained and re-runnable within one sweep), but
  * all of them live under one per-JVM root that a shutdown hook removes
  * recursively — without this, every Verify/Bench sweep leaked
  * copy-on-write parquet snapshots of customer/events under /tmp and
  * repeated full-registry runs accumulated unbounded disk.
  */
object Scratch {
  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(r.toFile)))
    r
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }

  /** A fresh directory under the per-JVM root, removed at JVM exit. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString
}
