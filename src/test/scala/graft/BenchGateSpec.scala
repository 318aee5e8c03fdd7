package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate ([[Bench.isRegression]]): heavy queries
  * (stable baseline ≥ 2 s) trip at 1.3×, light ones at 1.5×, with a
  * 0.3 s absolute floor — so the expensive tail can't drift under the
  * gate via sub-1.5× creep (round 10's q126 sat at 1.47× unflagged). */
class BenchGateSpec extends AnyFunSuite {

  test("a planted 1.4x slowdown on a heavy query trips the gate") {
    // 5 s baseline → 7 s adjudicated: 1.4×, over the heavy 1.3× trigger
    assert(Bench.isRegression(7.0, 5.0))
    // round 10's exact escape: q126 at 4.0 → 5.88 (1.47×) must now trip
    assert(Bench.isRegression(5.88, 4.0))
  }

  test("a 1.4x slowdown on a light query is jitter, not a regression") {
    assert(!Bench.isRegression(1.4, 1.0))
    assert(Bench.isRegression(1.6, 1.0)) // over 1.5× AND over the floor
  }

  test("the absolute floor keeps fast-query scheduling jitter out") {
    // 0.1 s → 0.25 s is 2.5× but only +0.15 s: noise on a shared box
    assert(!Bench.isRegression(0.25, 0.1))
    // 0.1 → 0.5: +0.4 s over the floor and far over 1.5× — real
    assert(Bench.isRegression(0.5, 0.1))
  }

  test("boundary behavior: exactly at the trigger is NOT a regression") {
    assert(!Bench.isRegression(2.6, 2.0))   // exactly 1.3× on heavy
    assert(Bench.isRegression(2.61, 2.0))
    assert(!Bench.isRegression(1.5, 1.0))   // exactly 1.5× on light
  }

  test("a contended stable pass suppresses verdicts (regressions={}, contended=true)") {
    // round 11's exact failure shape: q128 "stable" 6.84 vs baseline
    // 1.20 on a degraded box — with the probe 1.5× over its committed
    // time, the verdict set must come back EMPTY and marked contended
    val adj = Map("q128_triangles" -> 6.84, "q144_kcore" -> 3.87)
    val base = Map("q128_triangles" -> 1.20, "q144_kcore" -> 0.33)
    val (regs, contended) = Bench.calibratedRegressions(adj, base, Some(1.5))
    assert(contended && regs.isEmpty)
    // ...but the candidates stay visible for an idle-machine re-check
    assert(Bench.rawRegressions(adj, base).map(_._1) ==
      Seq("q128_triangles", "q144_kcore"))
  }

  test("a genuine regression still trips on a calibrated (idle) run") {
    val adj = Map("q126_setsim" -> 7.0)
    val base = Map("q126_setsim" -> 4.0)
    val (regs, contended) = Bench.calibratedRegressions(adj, base, Some(1.05))
    assert(!contended && regs == Seq(("q126_setsim", 7.0, 4.0)))
    // exactly at the probe factor is still calibrated (strict >)
    assert(!Bench.calibratedRegressions(adj, base,
      Some(Bench.ProbeContendedFactor))._2)
    // no probe baseline (first round / renamed probe): gate unchanged
    val (r2, c2) = Bench.calibratedRegressions(adj, base, None)
    assert(!c2 && r2.nonEmpty)
  }

  test("sub-threshold degradation normalizes: a box-speed artifact is not a regression") {
    // the exact shape this round's second sweep produced: the box runs
    // 1.24x slow (probe under the 1.3 suppression bar), an untouched
    // heavy query lands at 1.32x of baseline — 1.06x in box-speed
    // terms, no flag; a GENUINE 2x slowdown still trips after dividing
    val base = Map("q126" -> 4.02)
    val (r1, c1) = Bench.calibratedRegressions(
      Map("q126" -> 5.29), base, Some(1.244))
    assert(!c1 && r1.isEmpty,
      "1.32x on a 1.24x-slow box is the box, not the code")
    val (r2, _) = Bench.calibratedRegressions(
      Map("q126" -> 8.0), base, Some(1.244))
    assert(r2.map(_._1) == Seq("q126"),
      "2x of baseline trips even after probe normalization")
    assert(r2.head._2 == 8.0, "the reported time stays RAW, only the " +
      "verdict normalizes")
  }

  test("two probes disagreeing: the round stays LIVE (one clean probe " +
    "proves the box is not uniformly slow)") {
    // shuffle probe 1.5x but join probe 1.02x: NOT box-wide contention —
    // either shuffle-path contention or the shuffle probe's own
    // regression. Verdicts must stay live, and normalization must use
    // the CLEAN probe (scale 1.02), so a genuinely regressed query
    // still trips instead of being divided away by the troubled probe.
    val adj = Map("q126_setsim" -> 7.0)
    val base = Map("q126_setsim" -> 4.0)
    val (regs, contended) =
      Bench.calibratedRegressions(adj, base, Seq(1.02, 1.5))
    assert(!contended, "one clean probe must block suppression")
    assert(regs.map(_._1) == Seq("q126_setsim"),
      "the regression verdict survives the elevated second probe")
    // the same query on a run where BOTH probes are elevated: suppressed
    val (r2, c2) = Bench.calibratedRegressions(adj, base, Seq(1.45, 1.5))
    assert(c2 && r2.isEmpty, "every probe elevated = box-wide contention")
  }

  test("tighten merge: never raises, fills missing, leaves probes alone") {
    val old = Map("q1" -> 1.0, "q2" -> 2.0, "q13_probe" -> 0.7,
      "q_gone" -> 3.0)
    val fresh = Map("q1" -> 0.8,        // faster → tightens
      "q2" -> 2.9,                       // slower → old entry stands
      "q13_probe" -> 0.5,                // probe → NEVER ratchets down
      "q_new" -> 4.2)                    // no entry → fills (biased-high ok)
    val merged = Bench.tightenedBaseline(old, fresh, Set("q13_probe"))
    assert(merged("q1") == 0.8, "a faster window tightens the entry")
    assert(merged("q2") == 2.0, "a slower window can NEVER inflate")
    assert(merged("q13_probe") == 0.7,
      "probe floors are the refresh bar's denominator — one fast " +
        "window must not ratchet the bar unreachable")
    assert(merged("q_new") == 4.2, "new queries gate from their first sweep")
    assert(merged("q_gone") == 3.0, "dropped queries keep their entry")
    // a probe with NO committed entry still gets a first one
    val first = Bench.tightenedBaseline(Map.empty,
      Map("q13_probe" -> 0.9), Set("q13_probe"))
    assert(first("q13_probe") == 0.9)
  }

  test("tighten ratchet is bounded: one anomalous window lowers at most 2x, repeated windows converge") {
    // one anomalously fast window (warm cache, partial work from a
    // transient bug) must not set a permanent floor no healthy run
    // attains — the same failure mode the probe exclusion guards, slower
    val m1 = Bench.tightenedBaseline(
      Map("q1" -> 4.0), Map("q1" -> 0.3), Set.empty)
    assert(m1("q1") == 2.0, s"one window shrinks at most 2x: ${m1("q1")}")
    // a genuine large improvement still converges across clean windows
    val m2 = Bench.tightenedBaseline(m1, Map("q1" -> 0.3), Set.empty)
    val m3 = Bench.tightenedBaseline(m2, Map("q1" -> 0.3), Set.empty)
    assert(m2("q1") == 1.0 && m3("q1") == 0.5,
      s"each window halves the gap: ${m2("q1")}, ${m3("q1")}")
    // within the bound the fresh value lands exactly (no distortion)
    val m4 = Bench.tightenedBaseline(
      Map("q1" -> 4.0), Map("q1" -> 2.5), Set.empty)
    assert(m4("q1") == 2.5)
  }

  test("normalization scale is the SMALLEST probe ratio above 1.0") {
    assert(Bench.probeScale(Seq(1.2, 1.5)) == 1.2)
    assert(Bench.probeScale(Seq(0.97, 1.5)) == 1.0,
      "a clean probe (≤1.0) pins the scale at 1.0 — the box is not slow")
    assert(Bench.probeScale(Seq.empty) == 1.0)
    // a sub-threshold shared slowdown still normalizes: both probes at
    // ~1.25 → scale 1.24, a 1.32x heavy query passes as box speed
    val base = Map("q126" -> 4.02)
    val (r1, c1) = Bench.calibratedRegressions(
      Map("q126" -> 5.29), base, Seq(1.244, 1.27))
    assert(!c1 && r1.isEmpty)
  }
}
