package graft

import org.scalatest.funsuite.AnyFunSuite

import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the harness-facing bench headline line's contract (VERDICT r14 #6):
  * r14 was the FIRST round in 14 where the harness machine-parsed a bench
  * headline (`BENCH_r14.parsed` non-null), because the final stdout line
  * finally fit the 2000-char tail capture whole. A Bench refactor that
  * regresses that — an overlong line, invalid JSON, a lost discriminator —
  * must fail here by name, not resurface as another string of
  * `parsed: null` rounds.
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def line(total: Double = 217.71, best: Double = 193.7,
      contended: Boolean = true, qcN: Int = 36, qN: Int = 169,
      errN: Int = 0, full: String = "tools/bench_full_sf0.1.json",
      sf: String = "sf0.1"): String =
    Bench.headlineLine(total, best, contended, qcN, qN, errN, full, sf)

  test("headline line fits the 2000-char tail capture with margin") {
    // representative round shape, plus an adversarially wide one (huge
    // totals, every query errored and contended, a long SF dir name) —
    // the line has no per-query map, so nothing in it scales with the
    // surface and even the wide shape stays far under the window.
    assert(line().length < 500)
    val wide = line(total = 999999.99, best = 999999.99, qcN = 999999,
      qN = 999999, errN = 999999,
      full = "tools/bench_full_" + "x" * 100 + ".json", sf = "x" * 100)
    assert(wide.length < 2000)
  }

  test("headline line is one valid JSON object with the driver-contract keys") {
    val node = mapper.readTree(line())
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("value").asDouble() == 217.71)
    assert(node.get("value_min").asDouble() == 193.7)
    assert(node.get("contended").asBoolean())
    assert(node.get("queries_n").asInt() == 169)
    assert(node.get("full").asText() == "tools/bench_full_sf0.1.json")
    assert(node.get("sf").asText() == "sf0.1")
    // intentionally-empty map: a reader must go to `full` for per-query data
    assert(node.get("queries").isObject && node.get("queries").isEmpty)
    assert(!node.has("errors_n"), "errors_n must be absent on a clean run")
    assert(mapper.readTree(line(errN = 3)).get("errors_n").asInt() == 3)
  }

  test("headline discriminator selects the line structurally (ADVICE r14)") {
    // Both printed lines share metric/value/unit; `line` is the field a
    // parser uses instead of tail position or a '"queries"' substring
    // (which also matches the verbose line's '"queries_min"').
    assert(mapper.readTree(line()).get("line").asText() == "headline")
  }

  test("pass replacement flags the r14 poisoned-pass scenario (VERDICT r14 #1)") {
    // The motivating incident: driver pass totals 486.2/201.1/193.7 s — one
    // hammered pass dragged 36 medians and the headline ~25% over the
    // same-HEAD clean record. The flags select it for replacement and
    // exclude it from the stats; after one clean replacement the stat set
    // is the three clean passes.
    assert(Bench.hotFlags(Seq(486.2, 201.1, 193.7)) == Seq(true, false, false))
    assert(Bench.hotFlags(Seq(486.2, 201.1, 193.7, 190.4)) ==
      Seq(true, false, false, false))
    // a replacement can itself run hot — both stay excluded, min stays clean
    assert(Bench.hotFlags(Seq(486.2, 201.1, 193.7, 400.0)) ==
      Seq(true, false, false, true))
    // quiet run: nothing flagged, nothing replaced
    assert(Bench.hotFlags(Seq(167.8, 165.3, 195.3)) == Seq(false, false, false))
    // boundary is strict: exactly ratio× the best pass is KEPT
    assert(Bench.hotFlags(Seq(150.0, 100.0, 120.0)) == Seq(false, false, false))
    assert(Bench.hotFlags(Seq(150.1, 100.0, 120.0)) == Seq(true, false, false))
  }

  test("median averages the two middle values on even sizes (ADVICE r15)") {
    // odd sizes: the classic middle pick, unchanged
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(5.0)) == 5.0)
    // even sizes: pass replacement can leave 4 clean of 5 passes — the old
    // upper-middle pick booked 0.60 here, biasing the headline high in
    // exactly the replacement runs; the averaged median books 0.55
    assert(Bench.median(Seq(0.7, 0.5, 0.6, 0.4)) == 0.55)
    assert(Bench.median(Seq(2.0, 1.0)) == 1.5)
    // unsorted input is sorted internally
    assert(Bench.median(Seq(10.0, 1.0, 9.0, 2.0)) == 5.5)
  }

  test("produce-once inventory names only declared queries (VERDICT r15 #3)") {
    // every produce-once entry must be a real declared query, or Bench's
    // producer step silently books nothing and the contention flag returns
    assert(SparkEntry.ProduceOnce.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.ProduceOnce.contains("bucketed_join_orders"))
  }

  test("fmt is locale-stable and keeps integer zeros") {
    assert(Bench.fmt(217.705, 2) == "217.71" || Bench.fmt(217.705, 2) == "217.7")
    assert(Bench.fmt(200.0, 2) == "200")
    assert(Bench.fmt(0.5, 2) == "0.5")
    assert(Bench.fmt(1.009, 2) == "1.01")
  }
}
