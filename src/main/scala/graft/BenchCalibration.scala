package graft

import java.nio.file.{Files, Path, Paths}

/** Per-host canary calibration for [[Bench]].
  *
  * Round 9 shipped the machine-epoch canary with a reference constant
  * hardcoded for one host (`0.32` — quiet min-of-3 on the build
  * machine). On any other hardware that constant either cries wolf on
  * every run (slower CPU) or under-warns (faster CPU), which defeats
  * the canary's purpose: making a load-contaminated record visibly
  * untrustworthy. The reference therefore now lives in a COMMITTED
  * per-host file, `bench_calibration.json` in the repo root
  * (`{"<host>-c<cpus>": ref_sec, ...}` — flat, one entry per host),
  * resolved in this order:
  *
  *  1. host has a committed entry → use it (`ref_source:
  *     "calibration-file"`);
  *  2. no entry and the machine is quiet (1-min loadavg < cpus/4) →
  *     self-measure min-of-3 now, persist it for future runs
  *     (`"self-measured"` — the bootstrap run is trivially `clean`,
  *     by construction);
  *  3. no entry and the machine is NOT quiet → fall back to the
  *     built-in default and do NOT persist a contaminated reference
  *     (`"builtin-default-loaded-host"`).
  *
  * Every BENCH record carries `ref_source`, so a reader always knows
  * whether `clean` was judged against a real per-host baseline.
  */
object BenchCalibration {
  val builtinRefSec = 0.32
  val warnFactor = 1.3

  final case class Resolved(refSec: Double, source: String)

  def hostId(): String = {
    val host =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Throwable => "unknown" }
    s"$host-c${Runtime.getRuntime.availableProcessors()}"
  }

  def path(repo: String): Path = Paths.get(repo, "bench_calibration.json")

  /** Flat `{"host": num}` parse — no JSON library in scope, and the
    * format is builder-controlled, so a pair-regex is exact enough. */
  def readFile(p: Path): Map[String, Double] =
    if (!Files.exists(p)) Map.empty
    else {
      val pair = "\"([^\"]+)\"\\s*:\\s*([0-9.]+)".r
      pair.findAllMatchIn(Files.readString(p))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }

  /** Atomic temp+move (the Watermark pattern): a crash mid-write can
    * never truncate the committed file. Concurrency caveat: this is
    * read-merge-write with last-rename-wins, so an entry committed by
    * ANOTHER writer between our read and our move is dropped — either
    * host's entry can lose, not just ours. Acceptable for a
    * builder-run tool: a dropped entry just re-self-measures on that
    * host's next quiet run; nothing downstream depends on the file
    * being complete. */
  def writeFile(p: Path, m: Map[String, Double]): Unit = {
    val body = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": ${"%.3f".formatLocal(java.util.Locale.ROOT, v)}""" }
      .mkString("{\n  ", ",\n  ", "\n}\n")
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    Files.writeString(tmp, body)
    Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def resolve(repo: String, measure: () => Double,
              loadavg1: Double, cpus: Int): Resolved = {
    val p = path(repo)
    val known = readFile(p)
    known.get(hostId()) match {
      case Some(ref) => Resolved(ref, "calibration-file")
      case None if loadavg1 < cpus / 4.0 =>
        val ref = measure()
        // re-read at write time so a concurrent bootstrap's entry that
        // landed since our first read survives the merge
        try writeFile(p, readFile(p) + (hostId() -> ref))
        catch { case e: Throwable =>
          System.err.println(s"[bench] calibration write failed: ${e.getMessage}")
        }
        Resolved(ref, "self-measured")
      case None => Resolved(builtinRefSec, "builtin-default-loaded-host")
    }
  }

  /** The warning decision, factored out so the loaded-machine path is
    * testable without a loaded machine. */
  def warning(label: String, canary: Double, refSec: Double,
              loadavg: String): Option[String] =
    if (canary > refSec * warnFactor)
      Some(f"[bench] WARNING: $label canary $canary%.3fs > ${warnFactor}x ref $refSec%.3fs (loadavg $loadavg) — machine is loaded; timings in this record are NOT comparable across rounds")
    else None
}
