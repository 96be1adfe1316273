package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Output contract (driver captures only the TAIL of the build log, so
  * the single final JSON line is not durable on its own — round 8 lost
  * 27 of 107 timings to tail truncation):
  *   - one `BENCHQ <name> <fresh_secs>` line per query, printed AS THE
  *     RUN PROGRESSES, so every timing survives any tail capture;
  *   - for heavy queries (fresh > 2 s) two same-JVM warm reps with
  *     `Dedup.releaseAll()` between, emitted as
  *     `BENCHQ <name> warm_min <secs>` — fresh-JVM numbers on this host
  *     vary 1.5-3x (codegen + JIT + cache pressure), so warm_min is the
  *     round-over-round comparable number for anything non-trivial;
  *   - the final one-line JSON (`queries` = fresh, `warm` = warm_min
  *     where measured) for the driver's structured capture.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmThresholdSec = sys.env.getOrElse("SPARK_GRAFT_WARM_THRESHOLD", "2.0").toDouble
    val warmReps = sys.env.getOrElse("SPARK_GRAFT_WARM_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: pay session/codegen/file-listing startup outside the timings
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => }
    // 3-decimal fixed notation: a 107-query line at full Double precision
    // (~3.2 KB) overflows the driver's tail buffer — the round-4 bench
    // came back unparseable. Locale.ROOT: the default-locale `f`
    // interpolator emits a comma decimal separator under e.g. de_DE,
    // which is invalid JSON.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // (elapsed, succeeded): a failure must never masquerade as a slow
    // measurement — it gets a `failed` marker and -1 in the JSON, and
    // no warm reps are burned re-running it
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] query failed: ${e.getMessage}")
          false
      }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val fresh = scala.collection.mutable.LinkedHashMap[String, Double]()
    val warm = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val (tF, ok) = timeOnce(fn)
      fresh(name) = if (ok) tF else -1.0
      println(s"BENCHQ $name ${if (ok) fmt(tF) else s"failed ${fmt(tF)}"}")
      graft.operators.Dedup.releaseAll() // no retained-cache carry-over between queries
      if (ok && tF > warmThresholdSec) {
        val reps = (1 to warmReps).map { _ =>
          val t = timeOnce(fn)
          graft.operators.Dedup.releaseAll()
          t
        }.collect { case (t, true) => t }
        if (reps.nonEmpty) {
          warm(name) = reps.min
          println(s"BENCHQ $name warm_min ${fmt(reps.min)}")
        }
      }
      Console.out.flush()
    }
    def jsonMap(m: collection.Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // -1 failure sentinels must not be summed into the headline total —
    // several failures would otherwise read as a phantom speedup
    val total = fresh.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jsonMap(fresh)},"warm":${jsonMap(warm)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
