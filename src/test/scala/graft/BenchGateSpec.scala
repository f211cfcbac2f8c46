package graft

import org.scalatest.funsuite.AnyFunSuite

/** The index-phase warn estimator (r17 — the r16 verdict's #2 ask, with
  * the r15/r16 DRIVER artifacts as fixtures): the gate must scale by a
  * robust calib statistic so one cold first sentinel sample cannot
  * silently raise the warn ceiling. The r16 driver run recorded first
  * sample 1.276 against run median 0.478 — under the old head-scaled
  * gate the expectation inflated to 66.3 s and a literally-doubled phase
  * would have passed silently.
  */
class BenchGateSpec extends AnyFunSuite {

  // Verbatim calib sample arrays from the committed driver bench_full.json
  // of rounds 15 (commit 959ff95) and 16 (commit db1c076).
  private val r16Calib = Seq(1.276, 0.453, 0.622, 0.611, 0.464, 0.584,
    0.465, 0.428, 0.511, 0.546, 0.462, 0.53, 0.473, 0.437, 0.48, 0.441,
    0.441, 0.567, 0.478, 0.339, 0.437, 0.522, 0.529, 0.469, 0.486, 0.522,
    0.461, 0.453, 0.475, 0.546)
  private val r15Calib = Seq(0.31, 0.446, 0.458, 0.504, 0.435, 0.464,
    0.349, 0.509, 0.491, 0.506, 0.576, 0.511, 0.539, 0.593, 0.554, 0.499,
    0.532, 0.494, 0.546, 0.479, 0.426, 0.491, 0.438, 0.527, 0.505, 0.406,
    0.509, 0.486)
  private val budget = 26.0

  test("r16 driver phase (31.2 s, cold first sample) does not warn — genuine") {
    // run-wide median 0.478 → expected ≈ 24.9 s; 31.2 < 2× — no flag.
    assert(!Bench.idxWarnGate(31.176, budget, r16Calib))
    assert(Bench.idxExpected(budget, r16Calib) < 30.0,
      "the cold 1.276 first sample must not inflate the expectation")
  }

  test("r15 driver phase (22.8 s) does not warn — genuine") {
    assert(!Bench.idxWarnGate(22.802, budget, r15Calib))
  }

  test("a doubled phase flags under the r16 calib timeline — the old gate's blind spot") {
    // Old gate: expected = 26 × (1.276/0.5) = 66.3 s → a 60 s phase
    // (nearly double the real 31.2) sat silently under 2×66.3. New gate:
    // expected ≈ 24.9 s → 60 ≥ 1.3×24.9 flags.
    assert(Bench.idxWarnGate(60.0, budget, r16Calib))
  }

  test("a synthetic 1.3x phase at flat calib 0.5 flags — and 1.25x stays quiet") {
    val flat = Seq.fill(12)(0.5)
    assert(Bench.idxExpected(budget, flat) === budget)
    assert(Bench.idxWarnGate(Bench.idxWarnFactor * budget, budget, flat))
    assert(!Bench.idxWarnGate(1.25 * budget, budget, flat))
  }

  // r19 (the r18 verdict's #2 ask): the 2× ceiling was decorative — the
  // r18 driver phase ran 27.79 s against a calib-scaled expectation of
  // 21.20 (31 % over, ratio 1.311) and passed `warn:false`. The gate now
  // fires at 1.3×: just above the worst GENUINE committed driver artifact
  // (r16's ratio 1.254 under its era budget) and below the r18 overrun.
  private val r18Budget = 20.0
  // Verbatim calib sample array from the committed r18 driver
  // bench_full.json (median 0.530 — run START contended: first three
  // samples 1.906/2.714/2.241 land on the index phase window).
  private val r18Calib = Seq(1.906, 2.714, 2.241, 0.376, 0.891, 0.667,
    0.448, 3.39, 0.5, 0.532, 0.621, 0.471, 0.416, 0.439, 0.432, 0.435,
    0.489, 0.545, 0.547, 0.574, 0.546, 0.459, 0.558, 0.518, 0.66, 0.439,
    0.431, 0.414, 0.442, 0.594, 0.429, 0.53, 0.545, 0.493)

  test("r18 driver phase (27.8 s vs expected 21.2) FLAGS under the honest gate") {
    assert(math.abs(Bench.idxExpected(r18Budget, r18Calib) - 21.195) < 0.1,
      "fixture must reproduce the committed expectation")
    assert(Bench.idxWarnGate(27.789, r18Budget, r18Calib))
  }

  test("r17 driver phase (22.5 s vs expected 26.6) stays quiet — genuine") {
    // The r17 driver run's run-wide calib median was 0.512 (BENCH_r17
    // tail; the gate reads only the median, so a flat stand-in at the
    // committed median is the artifact's exact expectation).
    val r17Med = Seq.fill(11)(0.512)
    assert(math.abs(Bench.idxExpected(budget, r17Med) - 26.624) < 0.01)
    assert(!Bench.idxWarnGate(22.487, budget, r17Med))
  }

  test("r16 genuine artifact sits at ratio 1.254 — the gate clears it with ~4% margin") {
    val expected = Bench.idxExpected(budget, r16Calib)
    assert(31.176 / expected < Bench.idxWarnFactor)
  }

  test("three early samples: a cold head is outvoted by the median") {
    // the gate's provisional form sees only the first three samples —
    // the r16 shape (cold, normal, normal) must already read ~normal
    val early = Seq(1.276, 0.453, 0.622)
    assert(Bench.idxExpected(budget, early) < 35.0)
    assert(!Bench.idxWarnGate(31.176, budget, early))
  }
}
