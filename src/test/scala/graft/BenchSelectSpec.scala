package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the bench's clean-pair selection — the arithmetic
  * that decides whether a scaling number may be called clean. Pinned
  * against the failure modes observed across rounds 1-3:
  * grandfathered early storms, capacity-limited windows that pass
  * every relative detector, and flattering-pair selection.
  */
class BenchSelectSpec extends AnyFunSuite {

  private val R = 4.0 // highCpus / lowCpus

  test("an early stormy pair is un-cleaned by the final near-best recompute") {
    // pair1 measured first, nothing better known yet, base detectors
    // passed; pair2 lands in a calm window at ~60% of pair1's cost
    val pairs = Seq((141.66, 57.74, true), (76.4, 21.1, true))
    val (clean, _) = Bench.selectCleanPairs(pairs, R, floorLow = 76.4, floorHigh = 21.1)
    assert(clean == Seq((76.4, 21.1)), s"stormy pair grandfathered: $clean")
  }

  test("capacity-limited window: base-clean pairs 1.5x above floor are rejected and flagged") {
    // every relative detector read clean (observed: 91.35/33.60 with
    // zero steal, agreeing highs, 7.6 effective cores) but the window
    // ran far above the recorded best
    val pairs = Seq((91.35, 33.60, true), (95.95, 33.0, true))
    val (clean, floorRejected) =
      Bench.selectCleanPairs(pairs, R, floorLow = 74.12, floorHigh = 21.11)
    assert(clean.isEmpty, s"capacity-degraded pairs sold as clean: $clean")
    assert(floorRejected, "the capacity-degraded-window flag must fire")
  }

  test("base-detector-failed pairs never set the floor-rejected flag") {
    val pairs = Seq((141.66, 57.74, false))
    val (clean, floorRejected) = Bench.selectCleanPairs(pairs, R, 74.12, 21.11)
    assert(clean.isEmpty && !floorRejected)
  }

  test("headline is the least-contended clean pair, not the most flattering") {
    // 0.943 pair (inflated low) vs 0.785 pair (cheapest sandwich):
    // the cheap pair wins even though it reads lower
    val clean = Seq((95.95, 25.42), (74.12, 23.60))
    val eff = Bench.pairedEfficiency(clean, R).get
    assert(math.abs(eff - (74.12 / 23.60 / 4)) < 1e-9, s"got $eff")
  }

  test("within-floor variance stays clean; empty input is empty") {
    val pairs = Seq((76.4, 21.1, true), (83.3, 24.6, true))
    val (clean, floorRejected) = Bench.selectCleanPairs(pairs, R, 76.4, 21.1)
    assert(clean.length == 2 && !floorRejected)
    assert(Bench.selectCleanPairs(Nil, R, 1, 1) == ((Nil, false)))
    assert(Bench.pairedEfficiency(Nil, R).isEmpty)
  }
}
