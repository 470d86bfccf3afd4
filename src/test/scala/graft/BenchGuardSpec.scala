package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench32 contention outlier guard ([[Bench.contentionReruns]]
  * + [[Bench.rerunAdjusted]]) through an injected timer, so the
  * `contention_rerun` / `ratio_rerun_adjusted` artifact fields are
  * known-good BEFORE the next genuinely contended driver window needs
  * them — the path had never fired in a committed artifact. No Spark
  * session needed: the guard is pure sample algebra around the timer
  * seam. */
class BenchGuardSpec extends AnyFunSuite {

  private val best128 = Map("q_fast" -> 1.0, "q_slow" -> 1.0,
    "q_fail" -> 1.0, "q_zero" -> 0.0)

  test("only queries whose bench32 best exceeds 5x their bench128 " +
    "best are re-run; the re-run sample is recorded as-is") {
    val timed = scala.collection.mutable.ListBuffer.empty[String]
    val (reruns, errs) = Bench.contentionReruns(
      Seq("q_fast" -> Seq(4.9, 6.0),       // best 4.9 <= 5x — no re-run
        "q_slow" -> Seq(39.0, 41.0, 40.0), // best 39 > 5x — re-run
        "q_missing" -> Seq(100.0),         // no bench128 twin — skip
        "q_zero" -> Seq(100.0)),           // t128 = 0 guard — skip
      best128,
      n => { timed += n; (2.5, None) })
    assert(timed.toList == List("q_slow"))
    assert(reruns == Seq("q_slow" -> 2.5))
    assert(errs.isEmpty)
  }

  test("a FAILED re-run is recorded as an error and excluded — it must " +
    "never become a valid small sample that lowers the adjusted total") {
    val (reruns, errs) = Bench.contentionReruns(
      Seq("q_slow" -> Seq(39.0), "q_fail" -> Seq(50.0)),
      best128,
      {
        case "q_fail" => (0.01, Some("q_fail: OOM: boom"))
        case _        => (2.5, None)
      })
    assert(reruns == Seq("q_slow" -> 2.5))
    assert(errs == Seq("contention_rerun failed: q_fail: OOM: boom"))
    // the adjusted total keeps q_fail's ORIGINAL best (50), takes the
    // re-run for q_slow (2.5), and leaves untouched queries alone
    val adj = Bench.rerunAdjusted(
      Seq("q_slow" -> 39.0, "q_fail" -> 50.0, "q_fast" -> 4.9),
      reruns.toMap)
    assert(adj == 2.5 + 50.0 + 4.9)
  }

  test("a re-run SLOWER than the original best never raises the " +
    "adjusted total (min per query)") {
    val adj = Bench.rerunAdjusted(Seq("q" -> 10.0), Map("q" -> 12.0))
    assert(adj == 10.0)
  }

  test("no re-runs → adjusted total is the original total") {
    val best = Seq("a" -> 1.5, "b" -> 2.5)
    assert(Bench.rerunAdjusted(best, Map.empty) == 4.0)
  }
}
