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

  test("deferred and invalid flags reach the artifact JSON") {
    val j = ProbeLedger.json(
      ProbeReading(1.0, 7.0, 11.5, 19.4, 3, deferred = true,
        invalid = true), Floor)
    assert(j.contains("\"deferred\":true"))
    assert(j.contains("\"invalid\":true"))
    assert(j.contains("\"retries\":3"))
    assert(j.contains("\"ratio\":7.0"))
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
