package graft

import org.apache.spark.sql.SparkSession
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** r14 probe: root-cause the in-suite re-execution mode in BENCH_r13.json
  * (pl_dedup_substring fresh 4.2 s but warm reps 49/289/234 s with ZERO
  * GC and loadavg ~5 on 32 cores; keepfirst fresh 79.7 s right after;
  * clean in a dedicated JVM). Zero GC + idle cores during a 289 s
  * "re-execution" means executor threads were PARKED, not computing — so
  * the question is WHAT they wait on, and what earlier suite state arms
  * it.
  *
  * Method: optionally replay the exact bench-suite prefix (every query
  * that precedes pl_dedup_substring in sorted order, with Bench's own
  * fresh+warm+releaseAll cadence), then loop the substring query while a
  * watchdog samples every thread's stack at 2 Hz. Per rep it prints wall
  * vs process-CPU vs GC and the ContextCleaner backlog (reflection); for
  * reps slower than PROBE_SLOW_FACTOR x the best rep it prints the
  * dominant (thread-group, state, frames) bins — the smoking gun is
  * whichever frame the 32 executor threads sit in while the wall burns.
  *
  *   sbt package && /opt/spark/bin/spark-submit --master 'local[32]' \
  *     --driver-memory 32g --conf spark.sql.shuffle.partitions=32 \
  *     --class graft.ProbeSubstringMode \
  *     target/scala-2.13/qlbridgespark_2.13-0.1.0.jar
  *
  * Knobs: PROBE_PREFIX=1 replay suite prefix first; PROBE_REPS loop
  * count; PROBE_SF_DIR; PROBE_SLOW_FACTOR; PROBE_TARGET (query name);
  * PROBE_GC_EACH=1 to System.gc() between reps (tests the "refs only
  * drain after a GC" arm of the cleaner hypothesis); PROBE_REFTRACK
  * to set spark.cleaner.referenceTracking.
  */
object ProbeSubstringMode {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("PROBE_REPS", "6").toInt
    val doPrefix = sys.env.getOrElse("PROBE_PREFIX", "1") == "1"
    val slowFactor = sys.env.getOrElse("PROBE_SLOW_FACTOR", "3.0").toDouble
    val target = sys.env.getOrElse("PROBE_TARGET", "pl_dedup_substring")
    val gcEach = sys.env.getOrElse("PROBE_GC_EACH", "0") == "1"

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROBE_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROBE_SHUFFLE_PARTS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking",
        sys.env.getOrElse("PROBE_REFTRACK", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def gcMs(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).filter(_ > 0).sum

    def cleanerBacklog(): Long = try {
      val sc = spark.sparkContext
      sc.getClass.getMethods.find(_.getName == "cleaner").map(_.invoke(sc)) match {
        case Some(opt: Option[_]) if opt.isDefined =>
          val cl = opt.get
          cl.getClass.getDeclaredFields
            .find(_.getName.contains("referenceBuffer")) match {
            case Some(f) =>
              f.setAccessible(true)
              f.get(cl) match {
                case s: java.util.Set[_] => s.size.toLong
                case m: ConcurrentHashMap[_, _] => m.size.toLong
                case _ => -1L
              }
            case None => -2L
          }
        case _ => -3L
      }
    } catch { case _: Throwable => -4L }

    @volatile var sampling = false
    val bins = new ConcurrentHashMap[String, Integer]()
    def group(tn: String): String =
      if (tn.startsWith("Executor task launch worker")) "executor"
      else if (tn.startsWith("dispatcher")) "dispatcher"
      else if (tn.startsWith("block-manager")) "block-manager"
      else if (tn.contains("Cleaner")) "cleaner"
      else if (tn.startsWith("shuffle")) "shuffle"
      else if (tn.startsWith("dag-scheduler")) "dag-scheduler"
      else if (tn.startsWith("broadcast")) "broadcast"
      else "other:" + tn.takeWhile(c => !c.isDigit).take(24)
    val watchdog = new Thread(new Runnable {
      def run(): Unit = while (true) {
        if (sampling) {
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            if (st.nonEmpty) {
              val top = st.take(6)
                .map(f => f.getClassName + "." + f.getMethodName).mkString(" <- ")
              bins.merge(s"${group(t.getName)} ${t.getState} :: $top", 1,
                (a, b) => Integer.valueOf(a + b))
            }
          }
        }
        Thread.sleep(500)
      }
    }, "probe-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()

    def dumpBins(label: String): Unit = {
      println(s"---- stack bins: $label ----")
      bins.asScala.toSeq.sortBy(-_._2).take(16).foreach { case (k, n) =>
        println(f"  $n%5d  $k")
      }
      println("----")
    }

    def timed(name: String, watch: Boolean)(body: => Long): Double = {
      bins.clear()
      val c0 = osBean.getProcessCpuTime; val g0 = gcMs(); val t0 = System.nanoTime()
      if (watch) sampling = true
      val n = try body finally { sampling = false }
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"PROBE $name wall=$wall%8.2f cpu=$cpu%9.2f cpu/wall=${cpu / wall}%5.1f gc=${gcMs() - g0}%6d ms cleanerBuf=${cleanerBacklog()}%7d rows=$n")
      Console.out.flush()
      wall
    }

    val queries = SparkEntry.queries
    if (doPrefix) {
      println("== replaying suite prefix (Bench cadence) ==")
      val names = queries.keys.toSeq.sorted.takeWhile(_ != target)
      for (n <- names) {
        val fn = queries(n)
        val w = timed(s"prefix:$n", watch = false) { fn(spark, sfDir).count() }
        graft.operators.Dedup.releaseAll()
        if (w > 2.0) {
          for (_ <- 1 to 2) {
            timed(s"prefix-warm:$n", watch = false) { fn(spark, sfDir).count() }
            graft.operators.Dedup.releaseAll()
          }
        }
      }
    }

    println(s"== looping $target x$reps with stack sampling ==")
    val fn = queries(target)
    var best = Double.MaxValue
    for (i <- 1 to reps) {
      val w = timed(s"loop:$target#$i", watch = true) { fn(spark, sfDir).count() }
      graft.operators.Dedup.releaseAll()
      if (gcEach) System.gc()
      best = math.min(best, w)
      if (w > slowFactor * best) dumpBins(s"$target rep $i (wall=$w)")
    }
    for (n <- Seq("pl_dedup_substring_keepfirst", "ql_recursive_fixpoint")
         if queries.contains(n) && n != target) {
      val w = timed(s"after:$n", watch = true) { queries(n)(spark, sfDir).count() }
      graft.operators.Dedup.releaseAll()
      if (w > 10) dumpBins(s"$n (wall=$w)")
    }
    spark.stop()
  }
}
