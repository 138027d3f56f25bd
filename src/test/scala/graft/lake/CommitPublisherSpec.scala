package graft.lake

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** A FilterFileSystem over the local FS registered under its own
  * `mockobj:` scheme — stands in for an object store WITHOUT atomic
  * rename-if-absent (it is neither `file:` nor RawLocalFileSystem-backed
  * in the dispatch's eyes, and its scheme isn't HDFS-like). Top-level:
  * Hadoop instantiates by reflection. */
class MockInnerLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockobj:///")
  override def checkPath(path: Path): Unit = () // accept mockobj: paths
}

class MockObjectStoreFs
    extends org.apache.hadoop.fs.FilterFileSystem(new MockInnerLocalFs) {
  override def getUri: java.net.URI = java.net.URI.create("mockobj:///")
}

/** A publish arbiter that records every call — the external-arbiter plug
  * point (Delta's LogStore shape). Delegates to rename-if-absent, which
  * IS safe here (the test runs on a local disk); a real S3 publisher
  * would arbitrate through a conditional put. */
class RecordingPublisher extends VersionedTable.CommitPublisher {
  override def publishIfAbsent(fs: FileSystem, tmp: Path, dst: Path): Boolean = {
    RecordingPublisher.calls.incrementAndGet()
    !fs.exists(dst) && fs.rename(tmp, dst)
  }
}
object RecordingPublisher {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** r18: the commit protocol NAMES its storage contract. Local FS keeps
  * the hard-link/claim protocol; HDFS-like schemes ride their atomic
  * rename-refuses-existing contract; anything else must either plug a
  * [[VersionedTable.CommitPublisher]] or explicitly accept single-writer
  * mode — silently running the optimistic protocol on a store that
  * can't arbitrate it is how two writers both "win" a version. */
class CommitPublisherSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.sparkContext.hadoopConfiguration
      .set("fs.mockobj.impl", classOf[MockObjectStoreFs].getName)
    s
  }
  import spark.implicits._

  private def mockPath(): String =
    "mockobj://" + Files.createTempDirectory("graft-pub").toString + "/t"

  test("a scheme without atomic rename-if-absent fails LOUDLY at the first commit") {
    val t = VersionedTable(spark, mockPath())
    val e = intercept[RuntimeException](
      t.commitOverwrite(Seq((1L, "a")).toDF("id", "v")))
    assert(e.getMessage.contains("commitPublisher"), e.getMessage)
    assert(e.getMessage.contains("mockobj"), e.getMessage)
  }

  test("unsafeSingleWriterPublish opts a single-writer deployment back in") {
    spark.conf.set("spark.graft.lake.unsafeSingleWriterPublish", "true")
    try {
      val t = VersionedTable(spark, mockPath())
      t.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      t.commitAppend(Seq((3L, "c")).toDF("id", "v"))
      assert(t.read().count() == 3)
      assert(t.versions() == Seq(0, 1))
    } finally spark.conf.unset("spark.graft.lake.unsafeSingleWriterPublish")
  }

  test("a configured CommitPublisher arbitrates every commit record publish") {
    spark.conf.set("spark.graft.lake.commitPublisher",
      classOf[RecordingPublisher].getName)
    try {
      val t = VersionedTable(spark, mockPath())
      RecordingPublisher.calls.set(0)
      t.commitOverwrite(Seq((1L, "a")).toDF("id", "v"))
      t.commitAppend(Seq((2L, "b")).toDF("id", "v"))
      assert(t.read().count() == 2)
      assert(RecordingPublisher.calls.get() >= 2,
        s"expected the publisher to arbitrate both commits, " +
          s"saw ${RecordingPublisher.calls.get()} calls")
      // conflict semantics hold THROUGH the publisher: racing the same
      // version loses cleanly (returns false, nothing published)
      val reopened = VersionedTable(spark, t.tablePath)
      assert(reopened.versions() == Seq(0, 1))
    } finally spark.conf.unset("spark.graft.lake.commitPublisher")
  }

  test("local filesystems never require configuration (hard-link protocol)") {
    val t = VersionedTable(spark,
      Files.createTempDirectory("graft-pub-local").toString + "/t")
    t.commitOverwrite(Seq((1L, "a")).toDF("id", "v"))
    assert(t.read().count() == 1)
  }
}
