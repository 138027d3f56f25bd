package graft

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-PROCESS writer stress for the versioned lake's commit
  * protocol. Every concurrency spec in the repo races threads inside
  * one JVM — but the protocol's central claim (optimistic concurrency
  * arbitrated solely through the filesystem: staged-nonce data files +
  * an exclusive commit-record publish + rebase validation) is about
  * SEPARATE processes that share nothing but the table directory.
  * This harness spawns N genuinely separate JVMs, each with its own
  * SparkSession, hammering the SAME table with appends while one of
  * them also injects a CHECK-constraint change (the no-rebase commit
  * class) and a vacuum mid-run. The parent then asserts ledger
  * linearizability:
  *
  *  - versions are exactly 0..V, no gaps, no forks (every writer's
  *    accepted commit got a unique version);
  *  - ZERO lost rows: every (writer, seq) pair a child reported
  *    committed is present exactly once — a lost update would mean a
  *    writer's rebase silently dropped a racing commit's files;
  *  - the commit records' row accounting replays exactly (each
  *    append's delta is its staged row count — additive rebase held);
  *  - the constraint landed and every post-constraint row satisfies it.
  *
  * Children RETRY on `concurrent commit conflict` beyond the built-in
  * metadata rebase (the client-visible contract: stage-once retries are
  * internal, a genuine loss of the version race surfaces as an error
  * the caller re-runs) and count their conflicts, so the parent also
  * reports how contended the run actually was — a run with zero
  * observed conflicts proves nothing.
  *
  * Run: `sbt "runMain graft.LakeStress /tmp/graft-stress 3 20"`
  * (writers, appends-per-writer). Committed output: STRESS.md.
  */
object LakeStress {

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("--writer") =>
      writer(args(1), args(2).toInt, args(3).toInt)
    case _ =>
      val workDir = args.lift(0).getOrElse(
        Files.createTempDirectory("graft-stress").toString)
      parent(workDir, args.lift(1).map(_.toInt).getOrElse(3),
        args.lift(2).map(_.toInt).getOrElse(20))
  }

  /** `GRAFT_STRESS_MOS=1` runs the whole stress on the mock OBJECT
    * STORE scheme (`mos:` — no rename-if-absent) arbitrated by the
    * r19 [[graft.lake.ConditionalPutCommitPublisher]]: same writers,
    * same asserts, the conditional-put protocol under 6-way
    * multi-process contention (env inherits to the child JVMs). */
  private def mosMode: Boolean = sys.env.get("GRAFT_STRESS_MOS").contains("1")

  private def session(threads: Int): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (mosMode) b.config("spark.graft.lake.commitPublisher",
      classOf[graft.lake.ConditionalPutCommitPublisher].getName)
    val s = b.getOrCreate()
    if (mosMode) s.sparkContext.hadoopConfiguration
      .set("fs.mos.impl", classOf[graft.lake.MockS3Fs].getName)
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  // ---- child role ------------------------------------------------------

  /** One writer process: `n` single-row appends of (writer, seq, payload)
    * with an outer conflict-retry loop; writer 0 additionally lands a
    * CHECK constraint after its 3rd append and a vacuum after its 6th.
    * Prints `DONE writer=<id> conflicts=<k>` and exits 0 only if every
    * append was durably accepted. */
  private def writer(table: String, id: Int, n: Int): Unit = {
    val spark = session(2)
    import spark.implicits._
    val t = graft.lake.VersionedTable(spark, table)
    var conflicts = 0
    def retrying[A](what: String)(body: => A): A = {
      var attempt = 0
      while (true) {
        try return body
        catch {
          case e: RuntimeException if e.getMessage != null &&
              (e.getMessage.contains("concurrent commit conflict") ||
               e.getMessage.contains("conflict")) && attempt < 200 =>
            conflicts += 1; attempt += 1
            Thread.sleep(10L + scala.util.Random.nextInt(40))
        }
      }
      sys.error(s"unreachable: $what")
    }
    (0 until n).foreach { seq =>
      retrying(s"append $id/$seq") {
        t.commitAppend(Seq((id, seq, s"w$id-s$seq")).toDF("writer", "seq", "payload"))
      }
      if (id == 0 && seq == 3)
        retrying("constraint")(t.addConstraint("seq_nonneg", "seq >= 0"))
      if (id == 0 && seq == 6)
        // DEFAULT retention (7 days): a concurrent vacuum must never
        // touch another process's in-flight staged files — running it
        // with minAgeMs=0 here reproducibly kills a racing writer by
        // deleting its not-yet-committed stage (the exact hazard the
        // default window exists for; VersionedTableSpec pins the
        // single-process version of this)
        t.vacuum(retainVersions = 5)
      if (id == 1 && (seq == 5 || seq == 12))
        // OPTIMIZE mid-hammer: the read-set-validated rewrite class.
        // Racing appends REBASE under it (disjoint files); a racing DV
        // commit or rewrite overlaps its whole-snapshot read-set and
        // must abort loudly — which surfaces here as a client retry,
        // never a fork. The rewritten snapshot must carry every
        // committed row through (the parent's zero-lost-rows assert).
        retrying("optimize")(t.optimize(targetRowsPerFile = 50))
      if (id == 2 && seq == n - 1 && n >= 10)
        // MoR DELETE racing appends and optimize: row-level DV
        // concurrency (disjoint-row deletes land, overlapping rewrites
        // abort-and-retry). Deletes this writer's own first 5 rows —
        // committed sequentially above, so the end state is
        // deterministic for the parent's accounting.
        retrying("deleteMoR") {
          if (t.deleteMoR(col("writer") === 2 && col("seq") < 5).isEmpty)
            sys.error("deleteMoR found no rows to mark — writer 2's own " +
              "committed rows must be visible")
        }
    }
    println(s"DONE writer=$id conflicts=$conflicts")
    spark.stop()
  }

  // ---- parent role -----------------------------------------------------

  private def parent(workDir: String, nWriters: Int, perWriter: Int): Unit = {
    Files.createDirectories(Paths.get(workDir))
    val table = (if (mosMode) "mos://" else "") + s"$workDir/t"
    val spark = session(4)
    import spark.implicits._
    val t = graft.lake.VersionedTable(spark, table)
    // seed v0 so children race appends, not table creation
    t.commitOverwrite(Seq((-1, 0, "seed")).toDF("writer", "seq", "payload"))

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    // forward the JDK17 add-opens this JVM was launched with (build.sbt)
    val jvmOpts = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .filter(a => a.contains("add-opens") || a.startsWith("--add-opens") ||
        a.startsWith("java.base/"))
      .toSeq
    val t0 = System.nanoTime()
    val procs = (0 until nWriters).map { id =>
      val cmd = Seq(javaBin) ++ jvmOpts ++ Seq("-Xmx2g", "-cp", cp,
        "graft.LakeStress", "--writer", table, id.toString, perWriter.toString)
      val log = new java.io.File(s"$workDir/writer-$id.log")
      new ProcessBuilder(cmd.asJava)
        .redirectOutput(log).redirectErrorStream(true).start()
    }
    val exits = procs.map(_.waitFor())
    val wallSec = (System.nanoTime() - t0) / 1e9
    val logs = (0 until nWriters).map(id =>
      new String(Files.readAllBytes(Paths.get(s"$workDir/writer-$id.log")), "UTF-8"))
    exits.zipWithIndex.foreach { case (code, id) =>
      if (code != 0) sys.error(s"writer $id exited $code:\n${logs(id).takeRight(2000)}")
    }
    val conflictTotal = logs.flatMap(
      "conflicts=(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toInt)).sum

    // ---- linearizability asserts over the shared table ----
    val versions = t.versions()
    require(versions == (0 to versions.max).toSeq,
      s"version chain has gaps/forks: $versions")
    // writer 2 MoR-deleted its own first 5 rows at the end of its run
    // (deterministic: they were committed sequentially before the
    // delete); everything else must survive the optimize/vacuum/DV mix
    val deleted: Set[(Int, Int)] =
      if (nWriters >= 3 && perWriter >= 10) (0 until 5).map((2, _)).toSet
      else Set.empty
    val rows = t.read().filter(col("writer") >= 0)
      .select("writer", "seq").as[(Int, Int)].collect().toSeq
    val dup = rows.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    require(dup.isEmpty, s"DUPLICATED rows (double-applied commits): $dup")
    val expected = (for (w <- 0 until nWriters; s <- 0 until perWriter)
      yield (w, s)).toSet -- deleted
    val lost = expected -- rows.toSet
    require(lost.isEmpty, s"LOST rows (dropped by a racing rebase): $lost")
    val resurrected = rows.toSet.intersect(deleted)
    require(resurrected.isEmpty,
      s"DELETED rows resurfaced (a rewrite dropped the DV overlay): $resurrected")
    require(rows.size == expected.size,
      s"row count ${rows.size} != ${expected.size}")
    // row accounting integrity: each commit's recorded total replays —
    // appends +1, optimize content-neutral, the MoR delete exactly -5
    val hist = t.history()
    hist.sliding(2).foreach {
      case Seq((_, _, r0, _), (v1, a1, r1, _)) =>
        if (a1 == "append") require(r1 == r0 + 1,
          s"v$v1 append accounting broke: $r0 -> $r1")
        else if (a1 == "optimize") require(r1 == r0,
          s"v$v1 optimize changed the row count: $r0 -> $r1")
        else if (a1 == "delete-dv") require(r1 == r0 - 5,
          s"v$v1 MoR delete accounting broke: $r0 -> $r1")
      case _ => ()
    }
    require(t.constraints().exists(_._1 == "seq_nonneg"),
      "constraint change was lost in the race")
    val nAppends = hist.count(_._2 == "append")
    require(nAppends == nWriters * perWriter,
      s"append commits $nAppends != ${nWriters * perWriter}")
    val nOptimize = hist.count(_._2 == "optimize")
    // writer 1 optimizes at seq 5 and 12 — only reachable when the
    // per-writer append count gets there
    if (nWriters >= 2 && perWriter >= 6) require(nOptimize >= 1,
      s"optimize commits $nOptimize — the rewrite class never landed")
    if (deleted.nonEmpty) require(hist.count(_._2 == "delete-dv") == 1,
      "the MoR delete must land exactly once")
    println(f"STRESS OK: writers=$nWriters appends=${nWriters * perWriter} " +
      f"versions=${versions.size} optimizes=$nOptimize " +
      f"morDeletes=${hist.count(_._2 == "delete-dv")} " +
      f"conflicts_retried=$conflictTotal " +
      f"constraint=landed vacuum=ran wall=${wallSec}%.1fs")
    spark.stop()
  }
}
