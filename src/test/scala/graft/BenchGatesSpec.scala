package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench auto-isolation trigger (Bench.isolationOutliers): it
  * must fire exactly on the contended-outlier shape the r13 graded run
  * showed (q_kmv_intersect 2.54× while the median was 1.10×), and must
  * stay quiet on a flat run where one genuinely regressed query is the
  * creep gates' business, not a contention artifact.
  */
class BenchGatesSpec extends AnyFunSuite {

  private def run(names: (String, Double)*) = names.toSeq
  private def snap(names: (String, Double)*) = names.toMap

  test("fires on a >1.4x outlier when the suite median drifted") {
    // Median ratio 1.2 (> 1.05), one 2.5x outlier with a big base.
    val prev = snap("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "kmv" -> 5.0)
    val cur = run("a" -> 1.2, "b" -> 1.2, "c" -> 1.2, "kmv" -> 12.5)
    val out = Bench.isolationOutliers(cur, prev, contended = false)
    assert(out.map(_._1) == Seq("kmv"))
  }

  test("the r14 gap: a 1.5x mid-band query is isolated too, not just " +
    "the >2x worst") {
    val prev = snap("a" -> 1.0, "b" -> 1.0, "c" -> 1.0,
      "mid" -> 2.0, "kmv" -> 5.0)
    val cur = run("a" -> 1.2, "b" -> 1.2, "c" -> 1.2,
      "mid" -> 3.0, "kmv" -> 12.5)
    val out = Bench.isolationOutliers(cur, prev, contended = false)
    assert(out.map(_._1) == Seq("kmv", "mid"))
  }

  test("fires under recorded host contention even at a flat median") {
    val prev = snap("a" -> 1.0, "b" -> 1.0, "kmv" -> 5.0)
    val cur = run("a" -> 1.0, "b" -> 1.0, "kmv" -> 11.0)
    assert(Bench.isolationOutliers(cur, prev, contended = true)
      .map(_._1) == Seq("kmv"))
  }

  test("quiet on a flat run: a lone slow query is a regression, not contention") {
    val prev = snap("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "kmv" -> 5.0)
    val cur = run("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "kmv" -> 12.5)
    assert(Bench.isolationOutliers(cur, prev, contended = false).isEmpty)
  }

  test("the r15 gap: a front-loaded burst isolates exactly the queries " +
    "that ran under it, at a flat median and quiet suite triggers") {
    // The graded-r15 shape: co-tenant load landed on the first block
    // (window loads ~4.5 decaying), the rest of the run quiet at
    // self-load ~2.0; suite median flat, loadavg far below the worker
    // count — both suite-wide triggers blind. Only the early inflated
    // queries must isolate; the late slow one ran in a QUIET window and
    // stays the creep gates' business.
    val prev = snap("a" -> 2.0, "b" -> 2.0, "c" -> 1.0, "d" -> 1.0,
      "e" -> 1.0, "f" -> 1.0, "g" -> 1.0, "h" -> 1.0, "late" -> 1.0)
    val cur = run("a" -> 6.0, "b" -> 4.0, "c" -> 1.0, "d" -> 1.0,
      "e" -> 1.0, "f" -> 1.0, "g" -> 1.0, "h" -> 1.0, "late" -> 2.0)
    val loads = Map("a" -> 4.5, "b" -> 3.8, "c" -> 2.2, "d" -> 2.1,
      "e" -> 2.0, "f" -> 2.0, "g" -> 2.1, "h" -> 2.0, "late" -> 2.0)
    val out = Bench.isolationOutliers(cur, prev, contended = false, loads)
    assert(out.map(_._1) == Seq("a", "b"), out)
  }

  test("self-load is not contention: the floor tracks the run's own " +
    "sustained load, so a slow query in a typical window stays quiet") {
    // All windows at the bench's own steady-state ~2.0-2.4 (the
    // committed clean run ends there): floor ~2.0 → cut 3.0, and a
    // regressed query whose window load is just self-load must NOT be
    // attributed to a co-tenant.
    val prev = snap("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "kmv" -> 5.0)
    val cur = run("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "kmv" -> 12.5)
    val loads = Map("a" -> 2.0, "b" -> 2.1, "c" -> 2.3, "kmv" -> 2.4)
    assert(Bench.isolationOutliers(cur, prev, contended = false, loads)
      .isEmpty)
  }

  test("host drift is not contention: a uniformly-2x-slower host " +
    "normalizes out, while a real outlier under load still isolates") {
    val prev = snap("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "kmv" -> 5.0)
    // Identical code on a half-speed host (canary doubled): without the
    // denominator the 2.0 median fires the suite-wide trigger and every
    // query isolates; with it, nothing does.
    val cur = run("a" -> 2.0, "b" -> 2.0, "c" -> 2.0, "kmv" -> 10.0)
    assert(Bench.isolationOutliers(cur, prev, contended = false).nonEmpty)
    assert(Bench.isolationOutliers(cur, prev, contended = false,
      loads = Map.empty, hostRatio = 2.0).isEmpty)
    // A genuinely inflated query in a hot window on the same slow host
    // still isolates — normalization must not blind the gate.
    val cur2 = run("a" -> 2.0, "b" -> 2.0, "c" -> 2.0, "kmv" -> 25.0)
    val loads = Map("a" -> 2.0, "b" -> 2.0, "c" -> 2.1, "kmv" -> 5.0)
    assert(Bench.isolationOutliers(cur2, prev, contended = false,
      loads, hostRatio = 2.0).map(_._1) == Seq("kmv"))
    // Clamped, and absent history means no normalization.
    assert(Bench.hostRatio(0.9, Some(0.3)) == 2.0)
    assert(Bench.hostRatio(0.1, Some(0.4)) == 0.5)
    assert(Bench.hostRatio(0.4, None) == 1.0)
    assert(Bench.hostRatio(0.0, Some(0.4)) == 1.0)
  }

  test("no load samples means the per-query trigger cannot fire " +
    "(suite-wide triggers still govern)") {
    val prev = snap("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "kmv" -> 5.0)
    val cur = run("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "kmv" -> 12.5)
    assert(Bench.isolationOutliers(cur, prev, contended = false).isEmpty)
    assert(Bench.isolationOutliers(cur, prev, contended = true)
      .map(_._1) == Seq("kmv"))
  }

  test("small bases never isolate; runaway cap, worst-first") {
    val n = Bench.isolationCap + 7
    val prev = snap((1 to n).map(i => s"q$i" -> 1.0) :+ ("tiny" -> 0.1): _*)
    val cur = run((1 to n).map(i => s"q$i" -> (2.0 + i * 0.5)) :+
      ("tiny" -> 5.0): _*)
    val out = Bench.isolationOutliers(cur, prev, contended = true)
    assert(out.size == Bench.isolationCap)
    assert(out.head._1 == s"q$n") // worst-first
    assert(!out.exists(_._1 == "tiny"))
  }

  test("no snapshot history means nothing to isolate") {
    assert(Bench.isolationOutliers(run("a" -> 9.0), Map.empty,
      contended = true).isEmpty)
  }

  test("the r16 gap: two consecutive degraded runs — prev equally " +
    "inflated, ratios vs prev ≈ 1.0 — still isolate against the " +
    "quiet-window floor") {
    // The r16 graded shape: 133/276 windows above load 4 yet ONE
    // isolated row, because the rotating prev snapshot was taken in an
    // equally bad window. With the floor (best quiet-window time, in
    // current-host units) as the second baseline, the contended block
    // isolates even though prev explains nothing.
    val prev = snap("a" -> 5.8, "b" -> 3.9, "c" -> 1.0, "d" -> 1.0,
      "e" -> 1.0, "f" -> 1.0)
    val cur = run("a" -> 6.0, "b" -> 4.0, "c" -> 1.0, "d" -> 1.0,
      "e" -> 1.0, "f" -> 1.0)
    val floor = Map("a" -> 2.0, "b" -> 2.0, "c" -> 0.9, "d" -> 0.9,
      "e" -> 0.9, "f" -> 0.9)
    val loads = Map("a" -> 4.5, "b" -> 4.2, "c" -> 2.0, "d" -> 2.0,
      "e" -> 2.1, "f" -> 2.0)
    // Without the floor the gate is blind (the r16 failure)…
    assert(Bench.isolationOutliers(cur, prev, contended = false, loads)
      .isEmpty)
    // …with it, exactly the contended block isolates; the quiet rows
    // stay out even though they too sit above their floor ratio-wise
    // only when > 1.4x (c..f are 1.11x — in-band).
    val out = Bench.isolationOutliers(cur, prev, contended = false, loads,
      hostRatio = 1.0, floorTimes = floor)
    assert(out.map(_._1) == Seq("a", "b"), out)
  }

  test("a sub-0.3s floor never UN-gates a query whose prev baseline " +
    "is eligible: size eligibility applies per candidate, not to the min") {
    // floor 0.28 < 0.3 (ineligible candidate) but prev 0.5 is fine:
    // 1.2s is 2.4x prev under contention — must isolate, exactly as it
    // did before the floor existed.
    val out = Bench.isolationOutliers(run("a" -> 1.2), snap("a" -> 0.5),
      contended = true, Map.empty, hostRatio = 1.0,
      floorTimes = Map("a" -> 0.28))
    assert(out.map(_._1) == Seq("a"), out)
  }

  test("mergeFloor: min against quiet measurements, 5% upward decay " +
    "for unconfirmed entries (the poisoned-floor heal path), pruning") {
    val stored = Map("a" -> 1.0, "b" -> 1.0, "gone" -> 1.0)
    val quiet = Map("a" -> 0.8, "c" -> 2.0)
    val merged = Bench.mergeFloor(stored, quiet, Set("a", "b", "c"))
    assert(merged("a") == 0.8)            // quiet min wins
    assert(math.abs(merged("b") - 1.05) < 1e-9) // unconfirmed: relaxes up
    assert(merged("c") == 2.0)            // new entry
    assert(!merged.contains("gone"))      // renamed query pruned
    // A quiet re-confirmation pins the entry against the relaxation.
    assert(Bench.mergeFloor(stored, Map("b" -> 1.0), Set("b"))("b") == 1.0)
  }

  test("the floor never raises the baseline: a floor above prev is " +
    "ignored in favor of the smaller prev") {
    val prev = snap("a" -> 1.0)
    val floor = Map("a" -> 3.0)
    // 1.5 is 1.5x prev but 0.5x floor — min(prev, floor) = prev governs,
    // and under recorded contention the 1.5x fires.
    val out = Bench.isolationOutliers(run("a" -> 1.5), prev,
      contended = true, Map.empty, hostRatio = 1.0, floorTimes = floor)
    assert(out.map(_._1) == Seq("a"))
  }
}
