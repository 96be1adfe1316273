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
  */
object Bench {
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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
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

    final case class QRes(
        fresh: Double, ok: Boolean, gcMs: Long, storageMb: Long,
        load: Double,
        var warmMin: Option[Double] = None, var warmRepsSec: List[Double] = Nil,
        var warmGcMs: List[Long] = Nil)
    // (elapsed, succeeded, gcDeltaMs): a failure must never masquerade
    // as a slow measurement — no warm reps are burned re-running it
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean, Long) = {
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] query failed: ${e.getMessage}")
          false
      }
      ((System.nanoTime() - t0) / 1e9, ok, gcMillis() - gc0)
    }

    val results = scala.collection.mutable.LinkedHashMap[String, QRes]()
    val startedAtMs = System.currentTimeMillis()
    def writeFile(): Unit = {
      val out = new java.io.File(outPath)
      Option(out.getParentFile).foreach(_.mkdirs())
      val failed = results.collect { case (n, r) if !r.ok => "\"" + n + "\"" }.mkString("[", ",", "]")
      val qs = results.collect { case (n, r) if r.ok =>
        // warm reps carry their own gc deltas: a warm outlier must be
        // pressure-vs-plan-readable without a dedicated-JVM rerun (the
        // fresh gc_ms alone cannot explain a spike in rep 2)
        val warmPart = r.warmMin.map(w =>
          s""","warm_min_sec":${fmt(w)},"warm_reps_sec":${r.warmRepsSec.map(fmt).mkString("[", ",", "]")},"warm_gc_ms":${r.warmGcMs.mkString("[", ",", "]")}""").getOrElse("")
        s""""$n":{"fresh_sec":${fmt(r.fresh)},"gc_ms":${r.gcMs},"storage_mb":${r.storageMb},"load":${fmt(r.load)}$warmPart}"""
      }.mkString("{\n  ", ",\n  ", "\n}")
      val total = results.values.collect { case r if r.ok => r.fresh }.sum
      val json =
        s"""{
           |"sf":"$sfDir","cpus":"$cpus","heap_max_mb":$heapMaxMb,
           |"started_at_ms":$startedAtMs,"warm_threshold_sec":${fmt(warmThresholdSec)},"warm_reps":$warmReps,"warm_cap_sec":${fmt(warmCapSec)},
           |"warm_mode":"reexec-releaseAll",
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

    // optional subset (comma-separated names): the sf10 heaviest-N run
    // and ad-hoc A/Bs reuse the same harness + json contract
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      val (tF, ok, gcMs) = timeOnce(fn)
      val stMb = storageUsedMb()
      results(name) = QRes(tF, ok, gcMs, stMb, loadAvg())
      println(s"BENCHQ $name ${if (ok) fmt(tF) else s"failed ${fmt(tF)}"} gc=${gcMs}ms storage=${stMb}MB")
      writeFile() // fresh timing durable BEFORE the warm loop: a kill
      // during a heavy query's ~40 s of warm reps must not lose it
      graft.operators.Dedup.releaseAll() // no retained-cache carry-over between queries
      if (ok && tF > warmThresholdSec && tF <= warmCapSec) {
        var reps = (1 to warmReps).map { _ =>
          val t = timeOnce(fn)
          graft.operators.Dedup.releaseAll()
          t
        }.collect { case (t, true, g) => (t, g) }
        // self-adjudicating outliers: when warm reps disagree by >3x
        // (r9's 19.2 s and r10's 36.9 s phantoms both needed a
        // judge-side dedicated-JVM rerun), burn ONE extra rep so the
        // record itself shows whether the spike repeats (plan problem)
        // or was a one-off environment artifact
        // (2×, was 3× through r12 — pl_curate_pipeline3's 5.3/9.7
        // spread went unadjudicated under the old trigger)
        if (reps.size >= 2 && reps.map(_._1).max > 2 * reps.map(_._1).min) {
          val extra = timeOnce(fn)
          graft.operators.Dedup.releaseAll()
          if (extra._2) reps = reps :+ ((extra._1, extra._3))
        }
        if (reps.nonEmpty) {
          results(name).warmMin = Some(reps.map(_._1).min)
          results(name).warmRepsSec = reps.map(_._1).toList
          results(name).warmGcMs = reps.map(_._2).toList
          println(s"BENCHQ $name warm_min ${fmt(reps.map(_._1).min)}")
        }
        writeFile()
      }
      Console.out.flush()
    }
    def jsonMap(m: collection.Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val freshOk = results.collect { case (n, r) if r.ok => n -> r.fresh }
    val warmOk = results.collect { case (n, r) if r.warmMin.isDefined => n -> r.warmMin.get }
    val failedArr = results.collect { case (n, r) if !r.ok => "\"" + n + "\"" }.mkString("[", ",", "]")
    val total = freshOk.values.sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jsonMap(freshOk)},"warm":${jsonMap(warmOk)},"failed":$failedArr,"out":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
