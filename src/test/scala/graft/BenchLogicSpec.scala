package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-adjudication selection rule — pure logic, pinned
  * without a Spark session: which queries earn an end-of-run isolated
  * re-measure, and how a failed re-measure must flow (visible in
  * `adjudicated`, excluded from the headline sum). */
class BenchLogicSpec extends AnyFunSuite {

  private def select(medians: Seq[(String, Double)],
      baseline: Map[String, Double],
      measured: Map[String, Double] = Map.empty) =
    Bench.selectOutliers(medians, baseline,
      n => Some(measured.getOrElse(n, 1.0)))

  test("re-measures only queries over BOTH the 2.5x and 0.5s thresholds") {
    val medians = Seq(
      "hot" -> 7.6,      // 7.3x its 1.04 min AND +6.5s — the r8 case
      "small_spike" -> 0.4, // 4x its 0.1 min but only +0.3s absolute
      "normal" -> 1.1,   // within 2.5x of 1.0
      "exactly25x" -> 2.5, // not STRICTLY over 2.5x of 1.0
      // the r9 escape this rule exists for: q_text_stats median 1.34
      // vs own min 0.468 (2.9x, +0.87s) shipped unadjudicated under
      // the old 3x-of-cold rule (cold 0.616 set the bar at 1.85)
      "r9_escape" -> 1.34)
    val base = Map("hot" -> 1.04, "small_spike" -> 0.1,
      "normal" -> 1.0, "exactly25x" -> 1.0, "r9_escape" -> 0.468)
    assert(select(medians, base).map(_._1) === Seq("hot", "r9_escape"))
  }

  test("failed queries and missing baselines never adjudicate") {
    val medians = Seq("failed" -> -1.0, "nobase" -> 9.0, "badbase" -> 9.0)
    assert(select(medians, Map("badbase" -> -1.0)).isEmpty)
  }

  test("a failed re-measure ships as -1 and stays out of the total") {
    val medians = Seq("hot" -> 7.6, "ok" -> 1.0)
    val base = Map("hot" -> 1.0, "ok" -> 1.0)
    val adjudicated = select(medians, base, measured = Map("hot" -> -1.0))
    assert(adjudicated === Seq("hot" -> -1.0))
    // the main loop's fallback: only non-negative adjudications replace
    // the raw median in the headline sum
    val adjMap = adjudicated.toMap.filter(_._2 >= 0)
    val totalAdj = medians
      .collect { case (n, v) if v >= 0 => adjMap.getOrElse(n, v) }.sum
    assert(totalAdj === 8.6) // raw medians retained, no -1 poisoning
  }

  test("a successful re-measure replaces the raw median in the total") {
    val medians = Seq("hot" -> 7.6, "ok" -> 1.0)
    val base = Map("hot" -> 1.0, "ok" -> 1.0)
    val adjMap = select(medians, base, measured = Map("hot" -> 1.2))
      .toMap.filter(_._2 >= 0)
    val totalAdj = medians
      .collect { case (n, v) if v >= 0 => adjMap.getOrElse(n, v) }.sum
    assert(math.abs(totalAdj - 2.2) < 1e-9)
  }

  // --- the r12 sustained-contention screen (BENCH_r11: q_events_anomaly
  // median 14.0s / min 9.2s — ALL reps poisoned, so the min-base rule
  // above could never fire; isolated it reads 0.985s) ---

  private def sustained(medians: Seq[(String, Double)],
      already: Set[String],
      confirms: Map[String, Double],
      measured: Map[String, Double] = Map.empty) =
    Bench.selectSustained(medians, already, 2.0, 0.6,
      n => confirms.get(n),
      n => Some(measured.getOrElse(n, 0.9)))

  test("sustained: a heavy median whose confirmation rep collapses is re-measured") {
    val medians = Seq(
      "phantom" -> 14.0,  // confirms at 1.0 (< 0.6×14) — the r11 case
      "genuine" -> 7.8,   // confirms at 7.5 — really that heavy
      "light" -> 1.9)     // under the 2s threshold, never confirmed
    val out = sustained(medians, Set.empty,
      confirms = Map("phantom" -> 1.0, "genuine" -> 7.5, "light" -> 0.1),
      measured = Map("phantom" -> 0.985))
    assert(out === Seq("phantom" -> 0.985))
  }

  test("sustained: min-base-adjudicated queries are not re-measured twice") {
    val medians = Seq("spiked" -> 14.0)
    assert(sustained(medians, Set("spiked"),
      confirms = Map("spiked" -> 1.0)).isEmpty)
  }

  test("sustained: a failed or missing confirmation rep never triggers") {
    val medians = Seq("a" -> 14.0, "b" -> 14.0)
    assert(sustained(medians, Set.empty,
      confirms = Map("a" -> -1.0)).isEmpty)
  }

  test("sustained: boundary — exactly ratio×median does not trigger") {
    val medians = Seq("edge" -> 10.0)
    assert(sustained(medians, Set.empty,
      confirms = Map("edge" -> 6.0)).isEmpty) // 6.0 == 0.6×10, not below
  }

  test("tiering: every deep-tier and fresh-extras name is a registered extra") {
    // timeSetMedian silently skips unknown names, so a typo here would
    // quietly drop a query from the record instead of failing loudly
    val ex = Bench.extras.toSet
    val missing = (Bench.deepTier ++ Bench.freshExtras).filterNot(ex)
    assert(missing.isEmpty,
      s"deep-tier/fresh names not in extras: ${missing.mkString(", ")}")
    assert(Bench.deepTier.distinct.size == Bench.deepTier.size)
  }

  test("host calibration reference is pinned and positive") {
    assert(Bench.CalibRefSec > 0.0)
  }

  test("band_suspect: quiet run false, each tell fires alone, boundaries hold") {
    // the r13 committed quiet-host record — must read false
    assert(!Bench.bandSuspect(3.15, 3.16, 0.289, 0.334, 0))
    // the r13 DRIVER record — scan 0.282→0.667 (2.4×) + 21 adjudications
    assert(Bench.bandSuspect(2.5, 3.15, 0.282, 0.667, 21))
    // each dimension fires alone
    assert(Bench.bandSuspect(3.0, 5.0, 0.3, 0.3, 0))   // CPU divergence
    assert(Bench.bandSuspect(3.0, 3.0, 0.282, 0.667, 0)) // IO divergence
    assert(Bench.bandSuspect(3.0, 3.0, 0.3, 0.3, 6))   // adjudication count
    // boundaries: not STRICTLY over never fires
    assert(!Bench.bandSuspect(3.0, 4.5, 0.3, 0.3, 0))  // exactly 1.5×
    assert(!Bench.bandSuspect(3.0, 3.0, 0.3, 0.3, 5))  // exactly 5
    assert(!Bench.bandSuspect(3.0, 4.4, 0.3, 0.3, 0))  // 1.47× under ratio
    // a failed calibration is its own loud signal, never a divergence
    assert(!Bench.bandSuspect(-1.0, 3.0, 0.3, 0.3, 0))
    assert(!Bench.bandSuspect(3.0, 3.0, -1.0, 0.9, 0))
  }
}
