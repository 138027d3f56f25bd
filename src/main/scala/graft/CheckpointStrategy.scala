package graft

import org.apache.spark.sql.DataFrame

/** One switch for every lineage-cut / reuse-materialization point in
  * the engine (the r9 verdict's cluster-durability item).
  *
  * The engine cuts lineage wherever a mid-query result feeds multiple
  * downstream consumers (both sides of a self-join, per-iteration
  * graph state, corpus stats reused across stages). On `local[n]` the
  * right tool is `localCheckpoint()`: executor-local blocks, no I/O to
  * a reliable store, and the whole JVM is a single failure domain
  * anyway. On a REAL cluster the truncated lineage makes those blocks
  * unrecoverable — lose one executor mid-query and the query dies with
  * no way to recompute. The scale-ready form is a reliable checkpoint
  * into a durable directory (HDFS/object store, typically under the
  * warehouse root).
  *
  * Strategy resolution (once per call, so a test can flip it):
  *  - `graft.checkpoint.dir` system property, or `GRAFT_CHECKPOINT_DIR`
  *    env var, set to a path → RELIABLE: `SparkContext.setCheckpointDir`
  *    there and `df.checkpoint()` (eager, like localCheckpoint).
  *  - unset (the default, and what Bench/Verify run with) → LOCAL:
  *    `df.localCheckpoint()` — bench parity with rounds 1-9.
  *
  * Every former `.localCheckpoint()` reuse point in query code now
  * routes through [[cut]], so a cluster deployment flips ONE setting
  * rather than auditing 35 call sites.
  */
object CheckpointStrategy {
  /** Reliable-checkpoint directory, if configured. */
  def reliableDir: Option[String] =
    sys.props.get("graft.checkpoint.dir")
      .orElse(sys.env.get("GRAFT_CHECKPOINT_DIR"))
      .filter(_.nonEmpty)

  // setCheckpointDir stores a qualified path + per-call random UUID
  // subdirectory, so sc.getCheckpointDir never equals the raw configured
  // string — remember what we configured per SparkContext ourselves, or
  // every cut() in an iterative query would mint a fresh UUID directory
  // (per-cut metadata RPCs + unbounded sprawl on an object store).
  private val configured =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, String]()

  /** Materialize `df` for multi-consumer reuse and cut its lineage,
    * via the configured strategy. Eager in both modes. */
  def cut(df: DataFrame): DataFrame = reliableDir match {
    case Some(dir) =>
      val sc = df.sparkSession.sparkContext
      // compute() runs setCheckpointDir INSIDE the per-key lock, so a
      // concurrent first cut() can never observe the map entry before
      // the dir is actually set (put-before-set race), and a changed
      // configuration re-applies exactly once.
      configured.compute(sc, (_, prev) => {
        if (prev != dir) sc.setCheckpointDir(dir)
        dir
      })
      df.checkpoint()
    case None => df.localCheckpoint()
  }

  /** `df.cut()` sugar so call sites read like the old
    * `.localCheckpoint()` chain. Import `CheckpointStrategy.Ops._`
    * (package-external callers) — files in package `graft` and its
    * subpackages import it explicitly. */
  object Ops {
    implicit final class CutOps(private val df: DataFrame) extends AnyVal {
      def cut(): DataFrame = CheckpointStrategy.cut(df)
    }
  }
}
