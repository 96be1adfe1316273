package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Output contract. The driver captures only the TAIL of the build log,
  * so stdout is NOT durable (rounds 8 and 9 each lost ~30% of fresh
  * timings to tail truncation). The source of truth is therefore a
  * FILE committed into the repo:
  *   - `bench_out/bench.json` (override: SPARK_GRAFT_BENCH_OUT): the
  *     full run — per-query fresh seconds, warm_min + individual warm
  *     reps, per-query GC-time delta (ms, summed over all collector
  *     beans) and post-query storage-memory sample (MB), the failed
  *     list, and the JVM heap ceiling. Written incrementally after
  *     EVERY query so even a killed run leaves durable evidence.
  *   - stdout keeps the per-query `BENCHQ <name> <fresh_secs>
  *     gc=<ms>ms storage=<MB>MB` lines (plus `BENCHQ <name> warm_min
  *     <secs>` for heavy queries) and the final one-line JSON for the
  *     driver's structured capture — a convenience view, not the
  *     record.
  *
  * Why gc/storage per line: round 9's single warm outlier
  * (pl_curate_pipeline2, 19.2 s in-suite vs 2.8-3.9 s dedicated-JVM)
  * needed a judge-side rerun to adjudicate as memory pressure. With a
  * per-query GC share the pressure-vs-plan call is readable directly
  * off the line.
  *
  * Failure encoding: a failed query appears in the top-level "failed"
  * array and is ABSENT from the timing maps — a -1 sentinel inside the
  * timings (the r9 shape) reads as a negative timing to a numeric
  * differ. Warm reps: fresh-JVM numbers on this host vary 1.5-3x
  * (codegen + JIT + cache pressure), so for heavy queries (fresh >
  * 2 s) warm_min over same-JVM reps with `Dedup.releaseAll()` between
  * is the round-over-round comparable number.
  *
  * warm_mode (r13, after the r12 VERDICT's comparability note): the
  * json self-describes warm semantics as "reexec-releaseAll" — every
  * warm rep is an honest RE-EXECUTION (retained caches released
  * between reps). r11-and-earlier warm numbers partially measured
  * cache reads; cross-round warm comparisons are only meaningful
  * against files carrying the same warm_mode.
  *
  * Environment self-adjudication (r14, after the BENCH_r13 substring
  * anomaly): this host is a VM, and the r13 root-cause investigation
  * (graft.ProbeSubstringMode + bench_out/SUBSTRING_MODE_r14.md)
  * attributed the 49/289/234 s warm reps of a 4 s query to a
  * hypervisor CPU-steal burst — guest threads parked, zero GC, not
  * reproducible under suite-replay or deliberate in-guest contention,
  * and /proc/stat's cumulative steal covers the whole anomaly. So
  * every measurement now records what the MACHINE did during it:
  *   - per query and per warm rep: process-CPU seconds (cpu_sec — a
  *     slow rep with cpu≈fresh-cpu WAITED; one with cpu≈N×fresh-cpu
  *     recomputed), loadavg, and /proc/stat deltas for steal and
  *     iowait seconds (core-seconds the hypervisor withheld / the
  *     guest spent blocked on IO).
  *   - a warm rep whose steal share exceeds 20% of wall×cores is
  *     TAINTED: it is recorded (warm_tainted) but excluded from
  *     warm_min, and one replacement rep is burned (at most 2 per
  *     query) — a hypervisor burst can no longer poison the round's
  *     canonical warm numbers.
  *   - FRESH runs heal the same way (r15, VERDICT r14 #3): a tainted
  *     fresh run burns exactly ONE labeled replacement and the json
  *     records BOTH (fresh_tainted_* + the replacement as fresh_sec),
  *     self-described by fresh_taint_policy — see [[healFresh]] for
  *     the comparability-vs-unfalsifiability tradeoff.
  *   - fixed-point sentinels: a pure in-memory agg and a shuffle sort
  *     over spark.range (no files, constant size) run 3x at suite
  *     start and 3x at suite end ("sentinel_*" fields). Cross-round
  *     fresh-time comparisons normalize against the sentinel medians
  *     (scripts/scale_ratio_report.py) — a +14% broad drift with
  *     matching sentinel drift is machine speed, not a regression.
  */
object Bench {
  /** One measurement: wall + everything needed to adjudicate it later
    * (cpu: this process's CPU-seconds — a slow rep with cpu ≈ the
    * fresh run's WAITED, one with cpu ≈ N× fresh-cpu recomputed;
    * steal/iowait: machine-level core-seconds from /proc/stat
    * deltas). Object-level so the taint/heal policy is spec-testable
    * without driving a full bench run. */
  final case class Meas(wall: Double, ok: Boolean, gcMs: Long,
      cpuSec: Double, stealSec: Double, iowaitSec: Double, load: Double,
      cpuUserSec: Double = -1.0, cpuSysSec: Double = -1.0)

  /** This process's cumulative (utime, stime) in seconds from
    * /proc/self/stat — the r15 probe lesson: cpu_sec alone cannot
    * distinguish engine work from kernel/virtualization overhead. A
    * measurement whose SYS component dominates USER (measured 2-7×
    * on this host's bad windows, vs ~0.1× healthy) is the
    * hypervisor-contention class — adjudicate wall mysteries against
    * cpu_user_sec, which stayed within 2.1-3.5k core-s across runs
    * whose cpu_sec swung 11.8k-24.3k (bench_out/SCALE_r15.md §1).
    * (-1, -1) when /proc is unreadable. */
  def procSelfCpuSplit(): (Double, Double) = try {
    val raw = scala.io.Source.fromFile("/proc/self/stat").mkString
    val rest = raw.substring(raw.lastIndexOf(')') + 2).split("\\s+")
    (rest(11).toDouble / 100.0, rest(12).toDouble / 100.0)
  } catch { case _: Throwable => (-1.0, -1.0) }

  /** A measurement the hypervisor starved: steal share over
    * `share` of wall×cores. Recorded but never canonical. */
  def stealTainted(m: Meas, cores: Int, share: Double = 0.20): Boolean =
    m.stealSec > share * m.wall * cores

  /** The r15 board's blind spots (VERDICT r15 #4): ~12 rows read 2-5×
    * their dedicated-JVM cost with steal share only 8-10% — under the
    * 20% gate, so no healing fired. Two additional per-row
    * discriminators close the band:
    *
    * 1. Steal relative to the process's OWN cpu, not to wall×cores:
    *    a mostly-single-stage 2 s query uses ~2 core-s while the
    *    32-core capacity denominator is 79 — 8 stolen core-s is 10%
    *    of capacity but 4× the work actually done (every inflated r15
    *    row fits this: ql_asof_join wall 2.47 cpu 2.24 steal 8.22;
    *    healthy rows measure steal ≈ 0.03× cpu).
    * 2. Steal-INVISIBLE kernel sys time dominating user time: healthy
    *    runs measure sys ≈ 0.1× user, the contention windows 1.2-7×
    *    (SCALE_r15.md §1 live capture: user stable 1.6-3.5k core-s,
    *    sys swinging 5.7-18.5k; pl_quality_classifier's inflated
    *    board row read user 16.6 / sys 20.5).
    *
    * Absolute floors keep sub-second rows from tripping on noise. */
  def sysTainted(m: Meas): Boolean =
    m.cpuUserSec >= 0 && m.cpuSysSec > math.max(1.0 * m.cpuUserSec, 3.0)
  def stealVsWorkTainted(m: Meas): Boolean =
    m.stealSec > math.max(1.0 * m.cpuSec, 2.0)

  /** Any environmental class — the one taint predicate fresh healing
    * and warm-rep exclusion both adjudicate on. */
  def envTainted(m: Meas, cores: Int, share: Double = 0.20): Boolean =
    stealTainted(m, cores, share) || sysTainted(m) || stealVsWorkTainted(m)

  /** The driver-parseable final stdout line (r17, VERDICT r16 #1): the
    * driver stores only the LAST 2000 chars of stdout — BENCH_r01..r16
    * all carry tail_len=2000 and parsed:null, because the full
    * per-query line is ~10 KB at 226 queries and never survived the
    * window. The full maps live in the preceding stdout line and,
    * durably, in the bench_out json; THIS line keeps the contract
    * fields (metric/value/unit/queries/sf) with the queries map holding
    * the slowest fresh rows up to `budget` map-chars, so the whole line
    * stays well under the capture window (sbt's trailing "[success] …"
    * line shares it). Object-level so the byte bound is spec-testable. */
  def compactSummaryLine(total: Double, fresh: collection.Map[String, Double],
      failedArr: String, outPath: String, sfDir: String,
      budget: Int = 1100): String = {
    def fmt3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val slowest = fresh.toSeq.sortBy(-_._2)
    val qsb = new StringBuilder
    var nInLine = 0
    for ((n, v) <- slowest) {
      val entry = (if (nInLine == 0) "" else ",") + "\"" + n + "\":" + fmt3(v)
      if (qsb.length + entry.length <= budget) { qsb ++= entry; nInLine += 1 }
    }
    s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","n":${fresh.size},"n_in_line":$nInLine,"queries":{$qsb},"failed":$failedArr,"out":"$outPath","sf":"$sfDir"}"""
  }

  /** Fresh-row steal healing (r15, VERDICT r14 #3 — the warm-rep
    * policy mirrored onto fresh runs): a fresh run the hypervisor
    * starved burns ONE labeled replacement and records BOTH — the
    * replacement becomes the canonical fresh number, the tainted run
    * stays in the artifact (`fresh_tainted_*` fields) so the healing
    * is falsifiable rather than silent. Exactly one replacement: if
    * the machine is still being starved, the replacement's own
    * steal_sec says so in-artifact (the ratio tool marks it) instead
    * of the bench retrying until the number looks good.
    *
    * Caveat the fields make visible: the replacement is not JIT/page-
    * cache-cold — the tainted run already executed the plan — so a
    * healed fresh number sits between true-fresh and warm. That bias
    * is bounded and inspectable (both runs recorded); an unhealed
    * steal burst is neither.
    *
    * Returns (canonical fresh, Some(tainted original) when healed). */
  def healFresh(first: Meas, cores: Int, rerun: () => Meas,
      share: Double = 0.20): (Meas, Option[Meas]) =
    if (!first.ok || !envTainted(first, cores, share)) (first, None)
    else {
      val replacement = rerun()
      if (replacement.ok) (replacement, Some(first))
      else (first, None) // a failed replacement must not mask a measured run
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmThresholdSec = sys.env.getOrElse("SPARK_GRAFT_WARM_THRESHOLD", "2.0").toDouble
    val warmReps = sys.env.getOrElse("SPARK_GRAFT_WARM_REPS", "2").toInt
    // warm reps exist to separate JIT/cache noise from plan cost; on a
    // multi-hundred-second query that distinction is already obvious
    // from the fresh number, and 2 extra re-executions of a 400 s
    // query burn the whole scale-run budget. Queries whose FRESH time
    // exceeds the cap skip the warm loop (fields simply absent, same
    // as under-threshold rows); the json self-describes via
    // warm_cap_sec. Default: no cap (sf0.1 driver runs unchanged).
    val warmCapSec = sys.env.getOrElse("SPARK_GRAFT_WARM_CAP", "1e18").toDouble
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out/bench.json")
    val spark = graft.plans.SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      // Experiment knob for the sf1 bimodal-warm-rep investigation:
      // when a GC lands mid-query the (blocking) ContextCleaner drains
      // thousands of accumulated shuffle/broadcast refs serially and
      // stalls executor threads — identical re-executions then measure
      // 6 s or 56 s depending on GC timing. "false" trades cleanup
      // (shuffle files live until exit; fine for a bounded bench run)
      // for measurement stability. Default keeps Spark's default.
      .config("spark.cleaner.referenceTracking",
        sys.env.getOrElse("SPARK_GRAFT_REFTRACK", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: pay session/codegen/file-listing startup outside the timings
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => }
    // 3-decimal fixed notation: a 108-query line at full Double precision
    // (~3.2 KB) overflows the driver's tail buffer — the round-4 bench
    // came back unparseable. Locale.ROOT: the default-locale `f`
    // interpolator emits a comma decimal separator under e.g. de_DE,
    // which is invalid JSON.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long =
      ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).filter(_ > 0).sum
    // machine-noise self-diagnosis (the r11 lesson: a busy host
    // inflated every fresh time ~3-4× uniformly and the artifact had
    // no way to show it). loadavg is sampled at start/end and per
    // query; a run whose START load exceeds the threshold is flagged
    // in the json (flag, not refuse: an unattended driver run must
    // still leave evidence) — read `load_flag` before trusting any
    // round-over-round comparison.
    def loadAvg(): Double =
      ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val osBean = ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    // /proc/stat aggregate line: (steal, iowait) jiffies (USER_HZ=100).
    // Steal is CORE-seconds the hypervisor withheld from the whole
    // guest — the r13 anomaly's mechanism; -1 when unreadable.
    def procStatJiffies(): (Long, Long) = try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val p = src.getLines().next().trim.split("\\s+")
        (p(8).toLong, p(5).toLong)
      } finally src.close()
    } catch { case _: Throwable => (-1L, -1L) }
    val nCores = Runtime.getRuntime.availableProcessors()
    val maxStartLoad = sys.env.getOrElse("SPARK_GRAFT_MAX_START_LOAD", "8.0").toDouble
    val startLoad = loadAvg()
    val loadFlag = startLoad > maxStartLoad
    if (loadFlag) System.err.println(
      f"[bench] WARNING: start loadavg $startLoad%.1f exceeds $maxStartLoad%.1f — timings will carry machine noise (load_flag=true)")
    // post-query storage sample via the public executor-memory status
    // (local mode: one block manager; used = max - remaining)
    def storageUsedMb(): Long = {
      val st = spark.sparkContext.getExecutorMemoryStatus
      st.values.map { case (max, remaining) => (max - remaining) / (1024L * 1024L) }.sum
    }
    val heapMaxMb = Runtime.getRuntime.maxMemory() / (1024L * 1024L)

    // Meas lives at object scope (spec-testable heal/taint policy)
    final case class QRes(
        m: Meas, storageMb: Long, freshTainted: Option[Meas] = None,
        var warmMin: Option[Double] = None, var warmReps: List[Meas] = Nil,
        var warmTainted: List[Meas] = Nil)
    // a failure must never masquerade as a slow measurement — no warm
    // reps are burned re-running it
    def timeOnce(body: => Unit): Meas = {
      val gc0 = gcMillis(); val c0 = osBean.getProcessCpuTime
      val (st0, io0) = procStatJiffies()
      val (u0, s0) = procSelfCpuSplit()
      val t0 = System.nanoTime()
      val ok = try { body; true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] query failed: ${e.getMessage}")
          false
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val (st1, io1) = procStatJiffies()
      val (u1, s1) = procSelfCpuSplit()
      Meas(wall, ok, gcMillis() - gc0,
        (osBean.getProcessCpuTime - c0) / 1e9,
        if (st0 >= 0 && st1 >= 0) (st1 - st0) / 100.0 else -1.0,
        if (io0 >= 0 && io1 >= 0) (io1 - io0) / 100.0 else -1.0,
        loadAvg(),
        if (u0 >= 0 && u1 >= 0) u1 - u0 else -1.0,
        if (s0 >= 0 && s1 >= 0) s1 - s0 else -1.0)
    }
    def timeQuery(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Meas =
      timeOnce { fn(spark, sfDir).count(); () }
    // a warm rep the hypervisor starved is recorded but must not poison
    // warm_min or trigger the disagreement logic as if it were plan cost
    // (r16: BOTH classes — steal share AND steal-invisible sys time)
    def tainted(m: Meas): Boolean = envTainted(m, nCores)

    // Fixed-point sentinels (r14): constant-size in-memory work, no
    // files — a machine-speed reference recorded at suite start and
    // end. Cross-round fresh deltas normalize against the sentinel
    // medians; a broad drift WITH sentinel drift is the machine, one
    // WITHOUT it is the engine.
    def sentinelAgg(): Double = timeOnce {
      spark.range(0L, 20000000L, 1L, 32)
        .selectExpr("(id * 2654435761) % 97 as k", "id")
        .groupBy("k").sum("id").count(); ()
    }.wall
    def sentinelShuffle(): Double = timeOnce {
      spark.range(0L, 5000000L, 1L, 32)
        .selectExpr("(id * 1103515245 + 12345) % 1000000 as k")
        .groupBy("k").count().filter("count > 1").count(); ()
    }.wall
    def sentinels(): (List[Double], List[Double]) =
      ((1 to 3).map(_ => sentinelAgg()).toList,
       (1 to 3).map(_ => sentinelShuffle()).toList)

    val results = scala.collection.mutable.LinkedHashMap[String, QRes]()
    val startedAtMs = System.currentTimeMillis()
    var sentinelStart: (List[Double], List[Double]) = (Nil, Nil)
    var sentinelEnd: (List[Double], List[Double]) = (Nil, Nil)
    def arr(xs: List[Double]): String = xs.map(fmt).mkString("[", ",", "]")
    def measPart(m: Meas): String =
      s""""gc_ms":${m.gcMs},"cpu_sec":${fmt(m.cpuSec)},"cpu_user_sec":${fmt(m.cpuUserSec)},"cpu_sys_sec":${fmt(m.cpuSysSec)},"steal_sec":${fmt(m.stealSec)},"iowait_sec":${fmt(m.iowaitSec)},"load":${fmt(m.load)}"""
    def writeFile(): Unit = {
      val out = new java.io.File(outPath)
      Option(out.getParentFile).foreach(_.mkdirs())
      val failed = results.collect { case (n, r) if !r.m.ok => "\"" + n + "\"" }.mkString("[", ",", "]")
      val qs = results.collect { case (n, r) if r.m.ok =>
        // warm reps carry their own gc/cpu/steal/load: a warm outlier
        // must be waiting-vs-recomputing-vs-starved readable without a
        // dedicated-JVM rerun (the r13 lesson: 289 s with no load
        // sample and no cpu took a full round to adjudicate)
        val warmPart = r.warmMin.map(w =>
          s""","warm_min_sec":${fmt(w)},"warm_reps_sec":${arr(r.warmReps.map(_.wall))},"warm_gc_ms":${r.warmReps.map(_.gcMs).mkString("[", ",", "]")},"warm_cpu_sec":${arr(r.warmReps.map(_.cpuSec))},"warm_cpu_user_sec":${arr(r.warmReps.map(_.cpuUserSec))},"warm_cpu_sys_sec":${arr(r.warmReps.map(_.cpuSysSec))},"warm_steal_sec":${arr(r.warmReps.map(_.stealSec))},"warm_load":${arr(r.warmReps.map(_.load))}""" +
          (if (r.warmTainted.isEmpty) ""
           else s""","warm_tainted_sec":${arr(r.warmTainted.map(_.wall))},"warm_tainted_steal_sec":${arr(r.warmTainted.map(_.stealSec))}""")).getOrElse("")
        val freshTaintPart = r.freshTainted.map(b =>
          s""","fresh_tainted_sec":${fmt(b.wall)},"fresh_tainted_steal_sec":${fmt(b.stealSec)},"fresh_tainted_cpu_sec":${fmt(b.cpuSec)},"fresh_tainted_cpu_user_sec":${fmt(b.cpuUserSec)},"fresh_tainted_cpu_sys_sec":${fmt(b.cpuSysSec)},"fresh_tainted_gc_ms":${b.gcMs}""").getOrElse("")
        s""""$n":{"fresh_sec":${fmt(r.m.wall)},${measPart(r.m)},"storage_mb":${r.storageMb}$freshTaintPart$warmPart}"""
      }.mkString("{\n  ", ",\n  ", "\n}")
      val total = results.values.collect { case r if r.m.ok => r.m.wall }.sum
      val json =
        s"""{
           |"sf":"$sfDir","cpus":"$cpus","heap_max_mb":$heapMaxMb,"host_cores":$nCores,
           |"started_at_ms":$startedAtMs,"warm_threshold_sec":${fmt(warmThresholdSec)},"warm_reps":$warmReps,"warm_cap_sec":${fmt(warmCapSec)},
           |"warm_mode":"reexec-releaseAll","steal_taint_share":0.20,"sys_taint_rule":"cpu_sys>max(1.0*cpu_user,3.0)","steal_vs_work_rule":"steal>max(1.0*cpu,2.0)","fresh_taint_policy":"replace-once-labeled",
           |"sentinel_start_agg_sec":${arr(sentinelStart._1)},"sentinel_start_shuffle_sec":${arr(sentinelStart._2)},
           |"sentinel_end_agg_sec":${arr(sentinelEnd._1)},"sentinel_end_shuffle_sec":${arr(sentinelEnd._2)},
           |"start_load":${fmt(startLoad)},"current_load":${fmt(loadAvg())},"max_start_load":${fmt(maxStartLoad)},"load_flag":$loadFlag,
           |"total_fresh_sec":${fmt(total)},
           |"failed":$failed,
           |"queries":$qs
           |}""".stripMargin
      // tmp + atomic rename: a kill mid-rewrite must not truncate the
      // one file whose whole purpose is surviving killed runs
      val tmp = new java.io.File(outPath + ".tmp")
      val w = new java.io.PrintWriter(tmp, "UTF-8")
      try w.println(json) finally w.close()
      try java.nio.file.Files.move(tmp.toPath, out.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
        java.nio.file.Files.move(tmp.toPath, out.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING) }
    }

    sentinelStart = sentinels()
    // optional subset (comma-separated names): the sf10 heaviest-N run
    // and ad-hoc A/Bs reuse the same harness + json contract
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      val mF0 = timeQuery(fn)
      // fresh-row steal healing (r15): a starved fresh run burns ONE
      // labeled replacement; both land in the artifact (see healFresh)
      val (mF, freshBad) = healFresh(mF0, nCores, () => {
        System.err.println(f"[bench] $name FRESH run TAINTED: wall=${mF0.wall}%.1f s steal=${mF0.stealSec}%.1f core-s user=${mF0.cpuUserSec}%.1f sys=${mF0.cpuSysSec}%.1f — hypervisor class, burning one labeled replacement")
        graft.operators.Dedup.releaseAll()
        timeQuery(fn)
      })
      val stMb = storageUsedMb()
      results(name) = QRes(mF, stMb, freshTainted = freshBad)
      println(s"BENCHQ $name ${if (mF.ok) fmt(mF.wall) else s"failed ${fmt(mF.wall)}"} gc=${mF.gcMs}ms cpu=${fmt(mF.cpuSec)}s steal=${fmt(mF.stealSec)}s storage=${stMb}MB" +
        freshBad.map(b => s" (healed; tainted fresh was ${fmt(b.wall)}s steal=${fmt(b.stealSec)})").getOrElse(""))
      writeFile() // fresh timing durable BEFORE the warm loop: a kill
      // during a heavy query's ~40 s of warm reps must not lose it
      graft.operators.Dedup.releaseAll() // no retained-cache carry-over between queries
      if (mF.ok && mF.wall > warmThresholdSec && mF.wall <= warmCapSec) {
        val clean = collection.mutable.ListBuffer[Meas]()
        val bad = collection.mutable.ListBuffer[Meas]()
        var replacements = 0 // at most 2 extra reps vs hypervisor bursts
        def rep(): Unit = {
          val m = timeOnce { fn(spark, sfDir).count(); () }
          graft.operators.Dedup.releaseAll()
          if (!m.ok) ()
          else if (tainted(m)) {
            bad += m
            System.err.println(f"[bench] $name warm rep TAINTED: wall=${m.wall}%.1f s steal=${m.stealSec}%.1f core-s user=${m.cpuUserSec}%.1f sys=${m.cpuSysSec}%.1f — hypervisor class, excluded from warm_min")
            if (replacements < 2) { replacements += 1; rep() }
          } else clean += m
        }
        (1 to warmReps).foreach(_ => rep())
        // self-adjudicating outliers: when warm reps disagree by >2x
        // (r9's 19.2 s and r10's 36.9 s phantoms both needed a
        // judge-side dedicated-JVM rerun), burn ONE extra rep so the
        // record itself shows whether the spike repeats (plan problem)
        // or was a one-off environment artifact
        // (2×, was 3× through r12 — pl_curate_pipeline3's 5.3/9.7
        // spread went unadjudicated under the old trigger)
        if (clean.size >= 2 && clean.map(_.wall).max > 2 * clean.map(_.wall).min) {
          val extra = timeOnce { fn(spark, sfDir).count(); () }
          graft.operators.Dedup.releaseAll()
          if (extra.ok && !tainted(extra)) clean += extra
          else if (extra.ok) bad += extra
        }
        if (clean.nonEmpty || bad.nonEmpty) {
          val r = results(name)
          if (clean.nonEmpty) r.warmMin = Some(clean.map(_.wall).min)
          r.warmReps = clean.toList
          r.warmTainted = bad.toList
          r.warmMin.foreach(w => println(s"BENCHQ $name warm_min ${fmt(w)}"))
        }
        writeFile()
      }
      Console.out.flush()
    }
    sentinelEnd = sentinels()
    writeFile()
    def jsonMap(m: collection.Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val freshOk = results.collect { case (n, r) if r.m.ok => n -> r.m.wall }
    val warmOk = results.collect { case (n, r) if r.warmMin.isDefined => n -> r.warmMin.get }
    val failedArr = results.collect { case (n, r) if !r.m.ok => "\"" + n + "\"" }.mkString("[", ",", "]")
    val total = freshOk.values.sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jsonMap(freshOk)},"warm":${jsonMap(warmOk)},"failed":$failedArr,"out":"$outPath","sf":"$sfDir"}""")
    // final line: the compact driver-parseable summary (VERDICT r16
    // #1) — see [[compactSummaryLine]] for the tail-capture story
    println(compactSummaryLine(total, freshOk, failedArr, outPath, sfDir))
    spark.stop()
  }
}
