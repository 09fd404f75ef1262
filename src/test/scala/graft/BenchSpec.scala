package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Unit tests for Bench's contention-aware outlier re-time policy
 * (the "forced-contention smoke": under a loud canary a 2× outlier
 * must be re-timed even though it sits under the quiet 3× gate).
 */
class BenchSpec extends AnyFunSuite {

  test("retime factor tightens to 1.5x when the contention canary is loud") {
    assert(Bench.effectiveRetimeFactor(drift = 1.0) == 3.0)
    assert(Bench.effectiveRetimeFactor(drift = 1.99) == 3.0)
    assert(Bench.effectiveRetimeFactor(drift = 2.01) == 1.5)
    assert(Bench.effectiveRetimeFactor(drift = 5.31) == 1.5)
    // an explicitly tighter quiet factor is honored even when loud
    assert(Bench.effectiveRetimeFactor(drift = 5.0, quietFactor = 1.2) == 1.2)
    // an explicitly looser quiet factor still tightens when loud
    assert(Bench.effectiveRetimeFactor(drift = 5.0, quietFactor = 10.0) == 1.5)
  }

  test("a 2x outlier is re-timed on a contended run but not a quiet one") {
    // round-9 regression shape: g13 read 4.265 s vs 1.976 s committed
    // (2.16×) on a drift-5.31 run — the flat 3× gate let it through
    val prev = Map("g13_weighted_pr" -> 1.976, "g01_pagerank" -> 1.692)
    val results = Seq("g13_weighted_pr" -> 4.265, "g01_pagerank" -> 1.8)
    val quiet = Bench.findOutliers(results, prev,
      Bench.effectiveRetimeFactor(drift = 1.0))
    assert(quiet.isEmpty)
    val loud = Bench.findOutliers(results, prev,
      Bench.effectiveRetimeFactor(drift = 5.31))
    assert(loud == Seq("g13_weighted_pr"))
  }

  test("failed readings and missing/garbage priors are never candidates") {
    val prev = Map("a" -> 1.0, "b" -> 0.0, "c" -> -2.0)
    val results = Seq("a" -> -1.0, "b" -> 99.0, "c" -> 99.0, "d" -> 99.0)
    assert(Bench.findOutliers(results, prev, 1.5).isEmpty)
    assert(Bench.findOutliers(Seq("a" -> 10.0), prev, 1.5) == Seq("a"))
  }
}
