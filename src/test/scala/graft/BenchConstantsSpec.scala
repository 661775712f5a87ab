package graft

import org.scalatest.funsuite.AnyFunSuite

import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the bench's committed host-profile constants to the values
  * BASELINE.md NAMES (VERDICT r17 #2): the probe reference, band top and
  * record ratio are calibration numbers whose provenance lives in prose —
  * without this pin a code-side edit (or a BASELINE.md rewrite) could
  * silently desynchronize the two, and a reader auditing a bench artifact
  * against BASELINE.md would audit against stale constants. The doc block
  * this spec parses sits under "Committed self-labeling constants" and uses
  * `key = value` lines precisely so drift fails HERE by name.
  */
class BenchConstantsSpec extends AnyFunSuite {

  private lazy val baseline = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("BASELINE.md")), "UTF-8")

  private def named(key: String): Double = {
    val re = (java.util.regex.Pattern.quote(key) + """ = ([0-9][0-9.]*)""").r
    re.findFirstMatchIn(baseline).map(_.group(1).toDouble)
      .getOrElse(fail(s"BASELINE.md names no `$key = <value>` constant"))
  }

  test("BASELINE.md names exactly the committed probe constants") {
    assert(named("probe_iters") == Bench.ProbeIters.toDouble)
    assert(named("probe_ref_sec") == Bench.ProbeRefSecDefault)
    assert(named("probe_hot_ratio") == Bench.ProbeHotRatio)
  }

  test("BASELINE.md names exactly the committed band top and record ratio") {
    assert(Bench.BandTopSec.keySet == Set("sf0.1"),
      "a new per-SF band top needs its own named BASELINE.md constant")
    assert(named("band_top_sec sf0.1") == Bench.BandTopSec("sf0.1"))
    assert(named("record_ratio") == Bench.RecordRatio)
  }

  test("ProbeCalibrate runs the committed protocol end-to-end (1 sample)") {
    // the one-command recalibration main must emit a single parseable JSON
    // line whose floor/threshold arithmetic matches the committed protocol;
    // 1 sample keeps the test ~1.5 s (2 warm-up + 1 timed kernel run)
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      ProbeCalibrate.main(Array("1"))
    }
    val lines = buf.toString("UTF-8").linesIterator.filter(_.startsWith("{")).toSeq
    assert(lines.size == 1, s"expected one JSON line, got: $lines")
    val node = new ObjectMapper().readTree(lines.head)
    assert(node.get("metric").asText() == "probe_floor")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("samples").asInt() == 1)
    assert(node.get("probe_iters").asLong() == Bench.ProbeIters)
    assert(node.get("committed_ref").asDouble() == Bench.ProbeRefSecDefault)
    val floor = node.get("value").asDouble()
    assert(floor > 0.0 && floor < 60.0)
    // the published floor is rounded to 3 decimals while the threshold is
    // computed from the raw floor, so compare with a rounding-wide tolerance
    assert(math.abs(node.get("would_be_hot_threshold").asDouble()
      - floor * Bench.ProbeHotRatio) < 0.01)
    assert(node.get("readings").size() == 1)
    assert(node.get("band").get(0).asDouble() == floor)
  }
}
