package graft

import org.scalatest.funsuite.AnyFunSuite

/** The probe ledger's pure decision/emission rules (r10 verdict #2 and
  * #6): the noise floor suppresses ratio reporting and ratio-gating,
  * the invalid flag survives into the artifact JSON, and
  * output-quadratic contract rows never trip the ratio gate. */
class BenchLedgerSpec extends AnyFunSuite {
  private val Floor = 0.3

  test("below-floor base: ratio is null, below_floor tagged, ratio " +
    "gate never fires") {
    assert(ProbeLedger.ratioOf(0.05, 0.4, Floor).isEmpty)
    assert(!ProbeLedger.overRatioGate(0.05, 0.4, gate = 2.0,
      floorSec = Floor, outputQuadratic = false),
      "an 8x flip on a 50 ms base is noise, not a gate trip")
    val j = ProbeLedger.json(
      ProbeReading(0.05, 0.4, 1.0, 1.0, 0, false, false), Floor)
    assert(j.contains("\"ratio\":null"))
    assert(j.contains("\"below_floor\":true"))
    assert(!j.contains("\"invalid\""))
  }

  test("at-floor base: ratio reported and gates normally") {
    assert(ProbeLedger.ratioOf(0.5, 1.5, Floor).contains(3.0))
    assert(ProbeLedger.overRatioGate(0.5, 5.0, gate = 6.0,
      floorSec = Floor, outputQuadratic = false) === true)
    assert(!ProbeLedger.overRatioGate(0.5, 2.5, gate = 6.0,
      floorSec = Floor, outputQuadratic = false))
    val j = ProbeLedger.json(
      ProbeReading(0.5, 1.5, 1.0, 1.0, 1, false, false), Floor)
    assert(j.contains("\"ratio\":3.0"))
    assert(!j.contains("below_floor"))
  }

  test("output-quadratic contract rows are exempt from the ratio gate " +
    "but not the load gate") {
    assert(!ProbeLedger.overRatioGate(1.0, 40.0, gate = 6.0,
      floorSec = Floor, outputQuadratic = true))
    assert(ProbeLedger.overLoadGate(2.0, 11.5, gate = 8.0))
    assert(!ProbeLedger.overLoadGate(2.0, 7.9, gate = 8.0))
  }

  test("rows-adjusted gate (r13 verdict #1): output growth absorbs " +
    "the wall ratio; compute growth beyond it still trips") {
    // the r13 driver reading: wall 16x with the documented ~86x pair
    // growth — linear compute per output row, no trip at gate 6
    assert(!ProbeLedger.overRowsAdjustedGate(0.39, 6.27, gate = 6.0,
      floorSec = Floor, rowsBase = 100L, rowsX = 8600L))
    // same 16x wall with FLAT output: that IS a compute regression
    assert(ProbeLedger.overRowsAdjustedGate(0.39, 6.27, gate = 6.0,
      floorSec = Floor, rowsBase = 100L, rowsX = 100L))
    // wall growth an order past even the output growth trips too
    assert(ProbeLedger.overRowsAdjustedGate(0.5, 300.0, gate = 6.0,
      floorSec = Floor, rowsBase = 100L, rowsX = 8600L))
    // sampling failed (-1): fall back to the old exemption — the -1
    // rows fields in the artifact say why the gate could not fire
    assert(!ProbeLedger.overRowsAdjustedGate(0.39, 6.27, gate = 6.0,
      floorSec = Floor, rowsBase = -1L, rowsX = -1L))
    assert(!ProbeLedger.overRowsAdjustedGate(0.39, 6.27, gate = 6.0,
      floorSec = Floor, rowsBase = 100L, rowsX = -1L))
    // below the noise floor: no ratio signal, no trip, as everywhere
    assert(!ProbeLedger.overRowsAdjustedGate(0.05, 4.0, gate = 6.0,
      floorSec = Floor, rowsBase = 100L, rowsX = 100L))
    // shrinking output never LOWERS the gate below the plain ratio
    // gate (max(1, rows ratio) clamps at 1)
    assert(!ProbeLedger.overRowsAdjustedGate(1.0, 5.0, gate = 6.0,
      floorSec = Floor, rowsBase = 100L, rowsX = 10L))
    // a legitimately ZERO-output base leg is a successful sample, not
    // a sampling failure (r14 advice #1): plain ratio gate applies
    // (rows ratio clamped to 1) instead of the blanket exemption
    assert(ProbeLedger.overRowsAdjustedGate(0.39, 6.27, gate = 6.0,
      floorSec = Floor, rowsBase = 0L, rowsX = 0L),
      "16x wall on zero-output legs must still be adjudicated")
    assert(!ProbeLedger.overRowsAdjustedGate(1.0, 5.0, gate = 6.0,
      floorSec = Floor, rowsBase = 0L, rowsX = 50L))
    // zero base rows with a FAILED x-count still falls back to the
    // old exemption (rowsX = -1 is a sampling failure)
    assert(!ProbeLedger.overRowsAdjustedGate(0.39, 6.27, gate = 6.0,
      floorSec = Floor, rowsBase = 0L, rowsX = -1L))
    // and the artifact marks the clamped case distinctly
    val jc = ProbeLedger.json(
      ProbeReading(0.39, 6.27, 1.0, 1.0, 0, false, true,
        rowsBase = 0L, rowsX = 0L), Floor, rowsSampled = true)
    assert(jc.contains("\"rows_clamped\":true") &&
      jc.contains("\"rows_ratio\":null"))
    val jok = ProbeLedger.json(
      ProbeReading(0.39, 6.27, 1.0, 1.0, 0, false, false,
        rowsBase = 100L, rowsX = 8600L), Floor, rowsSampled = true)
    assert(!jok.contains("rows_clamped"))
  }

  test("per-query stdout lines are individually parseable (r14 " +
    "verdict #1: the tail capture must be able to read per-row " +
    "seconds no matter where it cuts in)") {
    val l = BenchEmit.queryLine("dedup_video_clusters", 0.130756971)
    val v = org.json4s.jackson.JsonMethods.parse(l)
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    assert((v \ "metric").extract[String] === "query")
    assert((v \ "name").extract[String] === "dedup_video_clusters")
    assert((v \ "sec").extract[Double] === 0.130756971)
    assert(l.length < 200, "each line must fit a tail window whole")
    // a failed row (-1) still parses — the driver sees the failure
    val lf = BenchEmit.queryLine("q1_agg", -1.0)
    assert((org.json4s.jackson.JsonMethods.parse(lf) \ "sec")
      .extract[Double] === -1.0)
  }

  test("deferred and invalid flags reach the artifact JSON") {
    val j = ProbeLedger.json(
      ProbeReading(1.0, 7.0, 11.5, 19.4, 3, deferred = true,
        invalid = true), Floor)
    assert(j.contains("\"deferred\":true"))
    assert(j.contains("\"invalid\":true"))
    assert(j.contains("\"retries\":3"))
    assert(j.contains("\"ratio\":7.0"))
  }

  test("x100 tier is opt-IN: default env leaves it OFF (r11 verdict " +
    "#1a — the tier cost the driver its whole r11 artifact)") {
    assert(!BenchEmit.x100Enabled(Map.empty[String, String]))
    assert(!BenchEmit.x100Enabled(Map("SPARK_GRAFT_X100" -> "0")))
    assert(!BenchEmit.x100Enabled(Map("SPARK_GRAFT_X100" -> "")))
    assert(BenchEmit.x100Enabled(Map("SPARK_GRAFT_X100" -> "1")))
  }

  test("early-emit headline (phase=catalog, empty probe maps) is a " +
    "complete parseable metrics line on its own (r11 verdict #1b)") {
    val line = BenchEmit.line("catalog", 144.3,
      """{"q1_agg":1.04,"wc_mr":0.51}""", "/root/testdata/sf0.1",
      0.3, "{}", "{}", "{}", "{}", "{}",
      """{"start":1.2,"after_catalog":7.5}""")
    // must survive a real JSON parse — the driver's whole check
    val v = org.json4s.jackson.JsonMethods.parse(line)
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    assert((v \ "metric").extract[String] === "total")
    assert((v \ "value").extract[Double] === 144.3)
    assert((v \ "unit").extract[String] === "sec")
    assert((v \ "phase").extract[String] === "catalog")
    assert((v \ "queries" \ "q1_agg").extract[Double] === 1.04)
    // the compact tail line parses too (the ~2 KB tail window)
    val sum = BenchEmit.summary("catalog", 144.3, 176, 176,
      "/root/testdata/sf0.1", "bench_out.json")
    val sv = org.json4s.jackson.JsonMethods.parse(sum)
    assert((sv \ "n").extract[Int] === 176)
    assert(sum.length < 200, "summary must fit the tail window whole")
  }

  test("x100 retry keeps a WHOLE pair — never a base leg from one " +
    "pair with the blown leg from the other (r11 advice)") {
    val gate = 120.0
    def over(p: ProbeReading): Boolean =
      ProbeLedger.overRatioGate(p.base, p.x, gate, Floor,
        outputQuadratic = false) ||
        ProbeLedger.overLoadGate(p.baseLoad, p.xLoad, 8.0)
    def pair(b: Double, x: Double, lb: Double, lx: Double) =
      ProbeReading(b, x, lb, lx, 0, deferred = false, invalid = false)
    def legs(p: ProbeReading) = (p.base, p.x, p.baseLoad, p.xLoad)
    // retry passes its gates → retry kept whole, one retry recorded
    val first = pair(2.0, 500.0, 9.0, 3.0) // load-gated AND over ratio
    val retryOk = pair(2.2, 90.0, 3.0, 3.1)
    val k1 = ProbeLedger.pickPair(first, retryOk, over, Floor)
    assert(legs(k1) === legs(retryOk) && k1.retries === 1 && !k1.invalid)
    // retry ALSO fails → the lower-ratio whole pair, flagged invalid
    val retryBad = pair(1.0, 400.0, 9.5, 3.0)
    val k2 = ProbeLedger.pickPair(first, retryBad, over, Floor)
    assert(legs(k2) === legs(first) || legs(k2) === legs(retryBad),
      "mixed legs across pairs")
    assert(legs(k2) === legs(first), // 250x < 400x
      "must keep the lower-ratio pair")
    assert(k2.invalid && k2.retries === 1)
    // per-leg minima would have produced (1.0 base, 400 x) here —
    // a 400x ratio neither pair measured; the whole-pair rule cannot
    assert(!(k2.base === 1.0 && k2.x === 500.0) &&
      !(k2.base === 2.0 && k2.x === 400.0))
  }

  test("x100 tier list is env-gated both ways; the catalog headline " +
    "is tier-independent (r12 verdict #5)") {
    // default env (the driver's run): EMPTY tier — zero x100 legs,
    // the bench exits after the 10x probes with rc 0
    assert(BenchEmit.x100Tier(Map.empty[String, String], None,
      probesEnabled = true).isEmpty)
    // opted in (the committed builder runs): the full row list
    val on = BenchEmit.x100Tier(Map("SPARK_GRAFT_X100" -> "1"), None,
      probesEnabled = true)
    assert(on === BenchEmit.X100Rows && on.contains("pagerank"))
    // SPARK_GRAFT_PROBE=0 (whole-catalog scale record) wins even when
    // the tier is opted in; subset filters intersect
    assert(BenchEmit.x100Tier(Map("SPARK_GRAFT_X100" -> "1"), None,
      probesEnabled = false).isEmpty)
    assert(BenchEmit.x100Tier(Map("SPARK_GRAFT_X100" -> "1"),
      Some(Set("pagerank")), probesEnabled = true) === Seq("pagerank"))
    // the headline takes no env: identical inputs ⇒ identical line
    // regardless of the tier (Bench emits it BEFORE consulting the
    // tier list — the r11 rc-124 lesson)
    val mk = () => BenchEmit.line("catalog", 10.0, """{"q":1.0}""",
      "/sf", 0.3, "{}", "{}", "{}", "{}", "{}", "{}")
    assert(mk() === mk())
  }

  test("x100 ledger rows carry output-row counts + rows_ratio; " +
    "unsampled rows (x10 tier) omit them (r12 verdict #4)") {
    val j = ProbeLedger.json(
      ProbeReading(1.0, 50.0, 1.0, 1.0, 0, false, false,
        rowsBase = 31L, rowsX = 3100L), Floor, xKey = "x100")
    assert(j.contains("\"rows_base\":31"))
    assert(j.contains("\"rows_x100\":3100"))
    assert(j.contains("\"rows_ratio\":100.0"),
      "rows grown ~100x is the linearity witness the wall ratio lacks")
    // a failed count leg keeps the base sample and nulls the ratio
    val jf = ProbeLedger.json(
      ProbeReading(1.0, 50.0, 1.0, 1.0, 0, false, false,
        rowsBase = 31L, rowsX = -1L), Floor, xKey = "x100")
    assert(jf.contains("\"rows_base\":31") &&
      jf.contains("\"rows_ratio\":null"))
    // the default (-1, -1) — an x10-tier row outside the
    // outputQuadratic set never samples rows — emits no rows fields
    // at all, keeping that ledger's schema unchanged
    val j10 = ProbeLedger.json(
      ProbeReading(1.0, 5.0, 1.0, 1.0, 0, false, false), Floor)
    assert(!j10.contains("rows_"))
    // but a tier that SAMPLED and had both count legs fail must stay
    // distinguishable from never-sampled: rowsSampled forces -1 fields
    val jboth = ProbeLedger.json(
      ProbeReading(1.0, 50.0, 1.0, 1.0, 0, false, false), Floor,
      xKey = "x100", rowsSampled = true)
    assert(jboth.contains("\"rows_base\":-1") &&
      jboth.contains("\"rows_x100\":-1") &&
      jboth.contains("\"rows_ratio\":null"),
      "a failed sample must not masquerade as not-applicable")
  }

  test("paths with quotes/backslashes still emit parseable artifact " +
    "lines (r12 advice: sf/file are env-supplied)") {
    val line = BenchEmit.line("catalog", 1.0, """{"q":1.0}""",
      """/odd "dir"/sf\0.1""", 0.3, "{}", "{}", "{}", "{}", "{}", "{}")
    val v = org.json4s.jackson.JsonMethods.parse(line)
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    assert((v \ "sf").extract[String] === """/odd "dir"/sf\0.1""")
    val sum = BenchEmit.summary("final", 1.0, 1, 1,
      """/odd "dir"/sf\0.1""", """out"file.json""")
    val sv = org.json4s.jackson.JsonMethods.parse(sum)
    assert((sv \ "file").extract[String] === """out"file.json""")
    // control characters are artifact-breaking too: a newline/tab in
    // an env path must come out \u-escaped, not raw
    val ctl = BenchEmit.summary("final", 1.0, 1, 1,
      "/dir\nwith\tctl", "out.json")
    assert(!ctl.exists(_ < ' '), "raw control chars break the one-line artifact")
    val cv = org.json4s.jackson.JsonMethods.parse(ctl)
    assert((cv \ "sf").extract[String] === "/dir\nwith\tctl")
  }

  test("failed legs emit -1 values with null ratio and null loads " +
    "stay null") {
    val j = ProbeLedger.json(
      ProbeReading(-1.0, -1.0, -1.0, 2.0, 2, false, false), Floor,
      xKey = "x100")
    assert(j.contains("\"base\":-1.0"))
    assert(j.contains("\"x100\":-1.0"))
    assert(j.contains("\"base_load\":null"))
    assert(j.contains("\"ratio\":null"))
    assert(!j.contains("below_floor"),
      "a FAILED base (-1) is not a below-floor reading")
  }
}
