package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-durability switch: the same checkpointed query must
  * produce identical results whether lineage cuts go through
  * localCheckpoint (default, bench parity) or a reliable checkpoint
  * directory (the 100-TB deployment form). q_kl_source is the probe —
  * its term table is cut() and read by three downstream consumers.
  */
class CheckpointStrategySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("reliable-dir strategy produces the same result as local, and actually checkpoints") {
    val fn = SparkEntry.queries("q_kl_source")
    val local = fn(spark, sf).collect().map(_.toSeq)

    val dir = Files.createTempDirectory("graft-reliable-ckpt").toString
    System.setProperty("graft.checkpoint.dir", dir)
    try {
      assert(CheckpointStrategy.reliableDir.contains(dir))
      val reliable = fn(spark, sf).collect().map(_.toSeq)
      assert(reliable.toSeq == local.toSeq)
      // the reliable path must have written real checkpoint state
      def fileCount(d: java.io.File): Int =
        if (d.isDirectory) d.listFiles().map(fileCount).sum else 1
      assert(fileCount(new java.io.File(dir)) > 0,
        "reliable strategy left no files in the checkpoint dir")
    } finally {
      System.clearProperty("graft.checkpoint.dir")
    }
    // back on default: local mode again, no property leakage
    assert(CheckpointStrategy.reliableDir.isEmpty)
    val again = fn(spark, sf).collect().map(_.toSeq)
    assert(again.toSeq == local.toSeq)
  }
}
