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

  test("r16 taints close the r15 blind band: steal-vs-own-cpu and sys-dominance") {
    // the exact inflated r15 board rows (VERDICT r15 #4): steal share
    // under 20% of wall x cores, but steal ≫ the process's own cpu
    val asof = Bench.Meas(2.474, true, 0, cpuSec = 2.24, stealSec = 8.22,
      iowaitSec = 0, load = 1, cpuUserSec = 1.73, cpuSysSec = 0.51)
    assert(!Bench.stealTainted(asof, 32), "old share gate missed it")
    assert(Bench.stealVsWorkTainted(asof), "steal 8.22 vs cpu 2.24")
    assert(Bench.envTainted(asof, 32))
    // sys-dominated class (pl_quality_classifier's inflated row)
    val clf = Bench.Meas(6.581, true, 0, cpuSec = 37.12, stealSec = 12.0,
      iowaitSec = 0, load = 1, cpuUserSec = 16.64, cpuSysSec = 20.48)
    assert(!Bench.stealTainted(clf, 32) && !Bench.stealVsWorkTainted(clf))
    assert(Bench.sysTainted(clf), "sys 20.48 > user 16.64")
    assert(Bench.envTainted(clf, 32))
    // healthy rows stay clean under all three rules
    val healthy = Bench.Meas(0.45, true, 0, cpuSec = 0.5, stealSec = 0.06,
      iowaitSec = 0, load = 1, cpuUserSec = 0.46, cpuSysSec = 0.04)
    assert(!Bench.envTainted(healthy, 32))
    // floors: sub-second noise cannot trip (2 core-s steal / 3 sys)
    val tiny = Bench.Meas(0.2, true, 0, cpuSec = 0.3, stealSec = 0.5,
      iowaitSec = 0, load = 1, cpuUserSec = 0.1, cpuSysSec = 2.9)
    assert(!Bench.envTainted(tiny, 32))
    // a build predating the cpu-split fields (-1 sentinels) never
    // sys-taints; steal-vs-work still applies off cpu_sec
    val old = Bench.Meas(5.0, true, 0, cpuSec = 5.0, stealSec = 0.0,
      iowaitSec = 0, load = 1)
    assert(!Bench.sysTainted(old) && !Bench.envTainted(old, 32))
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

  test("r17 compact summary line fits the driver's 2000-char tail capture") {
    // VERDICT r16 #1: BENCH_r01..r16 all record tail_len=2000 and
    // parsed:null — the full 226-query line never survived the window.
    // The compact line must stay well under it at suite scale, with
    // realistic long query names, and must be valid JSON carrying the
    // contract fields and the SLOWEST rows.
    val fresh = (1 to 226).map(i =>
      f"pl_some_quite_long_query_name_$i%03d" -> i * 0.037).toMap
    val line = Bench.compactSummaryLine(37.2, fresh, "[]",
      "bench_out/bench.json", "/root/testdata/sf0.1")
    assert(line.length < 1500, s"line too long for tail capture: ${line.length}")
    assert(!line.contains("\n"))
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    assert((parsed \ "metric").extract[String] == "total")
    assert((parsed \ "unit").extract[String] == "sec")
    assert(math.abs((parsed \ "value").extract[Double] - 37.2) < 1e-9)
    assert((parsed \ "n").extract[Int] == 226)
    assert((parsed \ "sf").extract[String] == "/root/testdata/sf0.1")
    val qs = (parsed \ "queries").extract[Map[String, Double]]
    assert(qs.nonEmpty && qs.size == (parsed \ "n_in_line").extract[Int])
    // the slowest rows are the ones in the line
    val slowest = fresh.toSeq.sortBy(-_._2).take(qs.size).map(_._1).toSet
    assert(qs.keySet == slowest)
    // an empty board still emits a parseable line
    val empty = Bench.compactSummaryLine(0.0, Map.empty[String, Double], "[]",
      "o", "s")
    assert(org.json4s.jackson.JsonMethods.parse(empty) \ "metric" != org.json4s.JNothing)
  }
}
