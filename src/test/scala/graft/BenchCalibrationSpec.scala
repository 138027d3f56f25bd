package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class BenchCalibrationSpec extends AnyFunSuite {

  test("warning fires on a canary above 1.3x ref and stays quiet below") {
    // synthetic loaded-machine reading: 1.0s against a 0.32s reference
    val loud = BenchCalibration.warning("pre-sweep", 1.0, 0.32, "9.9 9.9 9.9")
    assert(loud.exists(_.contains("NOT comparable")))
    assert(loud.exists(_.contains("pre-sweep")))
    // boundary: exactly at the factor is NOT a warning (> is strict)
    assert(BenchCalibration.warning("post-sweep", 0.32 * 1.3, 0.32, "").isEmpty)
    assert(BenchCalibration.warning("post-sweep", 0.31, 0.32, "").isEmpty)
  }

  test("resolve self-measures on a quiet unknown host, then reuses the committed value") {
    val repo = Files.createTempDirectory("graft-cal").toString
    var measured = 0
    val first = BenchCalibration.resolve(repo, () => { measured += 1; 0.456 },
      loadavg1 = 0.1, cpus = 32)
    assert(first.source == "self-measured" && first.refSec == 0.456 && measured == 1)
    // the bootstrap persisted this host's entry
    val onDisk = BenchCalibration.readFile(BenchCalibration.path(repo))
    assert(onDisk.get(BenchCalibration.hostId()).contains(0.456))
    // second run must read the file, not re-measure
    val second = BenchCalibration.resolve(repo, () => { measured += 1; 9.999 },
      loadavg1 = 0.1, cpus = 32)
    assert(second.source == "calibration-file" && second.refSec == 0.456 && measured == 1)
  }

  test("resolve refuses to bake in a reference measured on a loaded host") {
    val repo = Files.createTempDirectory("graft-cal").toString
    val r = BenchCalibration.resolve(repo, () => fail("must not measure"),
      loadavg1 = 31.0, cpus = 32)
    assert(r.source == "builtin-default-loaded-host")
    assert(r.refSec == BenchCalibration.builtinRefSec)
    assert(!Files.exists(BenchCalibration.path(repo)))
  }

  test("calibration file round-trips multiple hosts") {
    val p = Files.createTempDirectory("graft-cal").resolve("bench_calibration.json")
    val m = Map("hostA-c32" -> 0.32, "hostB-c8" -> 1.234)
    BenchCalibration.writeFile(p, m)
    assert(BenchCalibration.readFile(p) == m)
  }
}
