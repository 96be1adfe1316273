package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's environment-adjudication policy, tested as pure
  * functions (VERDICT r14 #3): steal tainting and fresh-row healing —
  * a starved fresh run burns exactly ONE labeled replacement and both
  * measurements survive into the artifact. */
class BenchPolicySpec extends AnyFunSuite {

  private def meas(wall: Double, steal: Double, ok: Boolean = true) =
    Bench.Meas(wall, ok, gcMs = 0, cpuSec = wall, stealSec = steal,
      iowaitSec = 0.0, load = 1.0)

  test("steal taint threshold is share of wall x cores") {
    // 10 s on 32 cores: budget 320 core-s, 20% threshold = 64
    assert(!Bench.stealTainted(meas(10.0, 64.0), 32))
    assert(Bench.stealTainted(meas(10.0, 64.1), 32))
    // unreadable /proc/stat (-1) never taints
    assert(!Bench.stealTainted(meas(10.0, -1.0), 32))
  }

  test("clean fresh run: no replacement burned, nothing recorded") {
    var reruns = 0
    val first = meas(5.0, 0.0)
    val (fresh, bad) = Bench.healFresh(first, 32, () => { reruns += 1; meas(4.0, 0.0) })
    assert(fresh == first && bad.isEmpty && reruns == 0)
  }

  test("tainted fresh run: one labeled replacement, BOTH kept") {
    var reruns = 0
    val first = meas(50.0, 500.0) // 500 of 1600 core-s stolen
    val repl = meas(6.0, 1.0)
    val (fresh, bad) = Bench.healFresh(first, 32, () => { reruns += 1; repl })
    assert(reruns == 1)
    assert(fresh == repl, "replacement becomes the canonical fresh")
    assert(bad.contains(first), "the tainted original must stay in the artifact")
  }

  test("still-starved replacement is kept AS the fresh number, visibly tainted") {
    // exactly one replacement — the policy must not retry until the
    // number looks good; the replacement's own steal_sec is the record
    val first = meas(50.0, 500.0)
    val repl = meas(40.0, 400.0)
    val (fresh, bad) = Bench.healFresh(first, 32, () => repl)
    assert(fresh == repl && bad.contains(first))
    assert(Bench.stealTainted(fresh, 32), "ratio tool marks this row from steal_sec")
  }

  test("failed runs never heal and a failed replacement never masks a measurement") {
    var reruns = 0
    val failed = meas(50.0, 500.0, ok = false)
    val (f1, b1) = Bench.healFresh(failed, 32, () => { reruns += 1; meas(1.0, 0.0) })
    assert(f1 == failed && b1.isEmpty && reruns == 0,
      "a failure is a failure, not a steal artifact")
    val first = meas(50.0, 500.0)
    val (f2, b2) = Bench.healFresh(first, 32, () => meas(1.0, 0.0, ok = false))
    assert(f2 == first && b2.isEmpty,
      "failed replacement: keep the measured (tainted) original")
  }
}
