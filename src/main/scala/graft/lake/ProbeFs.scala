package graft.lake

import org.apache.hadoop.fs.Path

/** A local filesystem that RECORDS file opens, registered under its own
  * `gprobe:` scheme (`fs.gprobe.impl` → this class; Hadoop instantiates
  * it by reflection). The in-query instrumentation that lets a
  * registered query PROVE, not claim, which data files its plan
  * actually touched — the honest alternative to AQE metrics, whose
  * final-plan copies are undriven (see the project's plan-assert
  * notes). Main-source sibling of the test suite's CountingLocalFs. */
class ProbeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("gprobe:///")
  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    ProbeFs.opened.add(f.toUri.getPath)
    super.open(f, bufferSize)
  }
}

object ProbeFs {
  val opened = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = opened.clear()
  /** Distinct basenames of opened files matching `pred`. */
  def openedNames(pred: String => Boolean): Set[String] = {
    val it = opened.iterator()
    val out = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) {
      val p = it.next()
      if (pred(p)) out += p.substring(p.lastIndexOf('/') + 1)
    }
    out.toSet
  }
}
