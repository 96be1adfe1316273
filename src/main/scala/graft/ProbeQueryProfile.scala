package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): runs named
  * SparkEntry queries in a bench-identical session and reports, per
  * query, the wall time alongside WHERE it went — Spark job count,
  * stage count, task count, summed task run time, JVM GC — so driver
  * overhead (many tiny jobs, codegen, planning) is distinguishable
  * from executor compute without the UI. Also dumps
  * `.explain("formatted")` for the query's returned frame to
  * `<outDir>/<name>.txt` (the plans/r16 deliverable).
  *
  * Usage: runMain graft.ProbeQueryProfile <sfDir> <outDir> <q1,q2,...|all> [reps]
  *
  * Methodology matches Bench.scala: master local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions=cpus, timed action = .count() on the returned
  * frame, Dedup.releaseAll() between reps. A pure measurement tool —
  * never on any query path.
  */
object ProbeQueryProfile {
  final class Agg extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    // per-stage task-time attribution: (stageId -> (name, tasks, ms))
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int, Long)]()
    // per-stage max single-task time + its metric split
    val maxTask = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      stages += 1
      val id = e.stageInfo.stageId
      val cur = byStage.getOrDefault(id, ("", 0, 0L))
      byStage.put(id, (e.stageInfo.name, cur._2, cur._3))
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      tasks += 1
      val m = e.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
        val id = e.stageId
        val cur = byStage.getOrDefault(id, ("", 0, 0L))
        byStage.put(id, (cur._1, cur._2 + 1, cur._3 + m.executorRunTime))
        val prev = maxTask.getOrDefault(id, (0L, ""))
        if (m.executorRunTime >= prev._1)
          maxTask.put(id, (m.executorRunTime,
            s"cpu=${m.executorCpuTime / 1000000}ms deser=${m.executorDeserializeTime}ms " +
            s"gc=${m.jvmGCTime}ms fetchWait=${m.shuffleReadMetrics.fetchWaitTime}ms " +
            s"shufR=${m.shuffleReadMetrics.totalBytesRead} recs=${m.shuffleReadMetrics.recordsRead}"))
      }
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0
      shuffleReadB = 0; shuffleWriteB = 0; byStage.clear(); maxTask.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names: Seq[String] =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = graft.plans.SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
    // A/B knobs for optimization experiments (comma-separated k=v)
    val b = sys.env.get("SPARK_GRAFT_PROFILE_CONF").map(_.split(",").toSeq)
      .getOrElse(Nil).foldLeft(b0) { (acc, kv) =>
        val Array(k, v) = kv.split("=", 2); acc.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // same warmup as Bench
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => }
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMs(): Long = ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).filter(_ > 0).sum
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // explain of the returned frame (driver-loop side jobs excluded
      // by construction — they run during fn())
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$outDir/$name.txt", "UTF-8")
        try w.println(txt) finally w.close()
        // the final frame of a viaPersisted-built query is a flat
        // LogicalRDD scan — its exchanges live in the INNER execution
        // that materialized the stage (the r16 plan-evidence gap:
        // VERDICT r16 "what's wrong" #3). Dump those too, so plan
        // claims about persisted stages are checkable from files.
        graft.operators.Dedup.innerExecutionsFor(df).zipWithIndex.foreach {
          case (qe, i) =>
            val wi = new java.io.PrintWriter(s"$outDir/${name}_inner$i.txt", "UTF-8")
            try wi.println(qe.explainString(
              org.apache.spark.sql.execution.FormattedMode))
            finally wi.close()
        }
      } catch { case e: Throwable =>
        System.err.println(s"[profile] $name explain failed: ${e.getMessage}")
      }
      graft.operators.Dedup.releaseAll()
      (1 to reps).foreach { r =>
        // settle listener queue so counts attribute to this rep
        Thread.sleep(300)
        agg.reset()
        val gc0 = gcMs()
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[profile] $name failed: ${e.getMessage}"); false }
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"PROFILE $name rep=$r ok=$ok wall=$wall%.3f jobs=${agg.jobs} stages=${agg.stages} tasks=${agg.tasks} taskTime=${agg.taskTimeMs / 1000.0}%.3f gc=${(gcMs() - gc0) / 1000.0}%.3f shufR=${agg.shuffleReadB / 1024} shufW=${agg.shuffleWriteB / 1024}")
        if (sys.env.contains("SPARK_GRAFT_PROFILE_STAGES") && r == reps) {
          import scala.jdk.CollectionConverters._
          agg.byStage.asScala.toSeq.sortBy(-_._2._3).take(15).foreach {
            case (id, (nm, nt, ms)) =>
              val mx = agg.maxTask.getOrDefault(id, (0L, ""))
              println(f"  STAGE $id%5d ${ms / 1000.0}%8.3f s  $nt%4d tasks  maxTask=${mx._1}ms [${mx._2}]  $nm")
          }
        }
        graft.operators.Dedup.releaseAll()
      }
      Console.out.flush()
    }
    spark.stop()
  }
}
