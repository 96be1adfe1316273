// r13 same-JVM warm-rep variance probe (BENCH_sf1 adjudication).
// Identical re-executions of the banded pair-mining queries measured
// anywhere from 4 s to 131 s in one JVM with near-zero GC — this probe
// separates "slow rep burns CPU" (plan/recompute problem) from "slow
// rep waits" (lock/IO/scheduler problem) by printing per-rep wall vs
// process-CPU seconds.
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 32g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/qlbridgespark_2.13-0.1.0.jar \
//     -I scripts/ab_variance_r13.scala
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.Tables

val d = sys.env.getOrElse("AB_SF_DIR", "/tmp/graft_sf1")
val reps = sys.env.getOrElse("AB_REPS", "8").toInt
val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean.asInstanceOf[com.sun.management.OperatingSystemMXBean]
def gcMs(): Long = {
  import scala.jdk.CollectionConverters._
  java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    .map(_.getCollectionTime).filter(_ > 0).sum
}

def run(name: String)(body: => Long): Unit = {
  println(s"== $name ==")
  for (i <- 1 to reps) {
    val c0 = osBean.getProcessCpuTime; val g0 = gcMs(); val t0 = System.nanoTime()
    val n = body
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = (osBean.getProcessCpuTime - c0) / 1e9
    println(f"REP $name $i%2d wall=$wall%8.2f cpu=$cpu%9.2f cpu/wall=${cpu/wall}%5.1f gc=${gcMs()-g0}%6d ms rows=$n")
    Dedup.releaseAll()
  }
}

run("simhash_ship") {
  val docs = Tables(spark, d, "documents")
  val index = Dedup.simHashIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
  Dedup.simHashPairsDelta(index, docs.filter(col("doc_id") % 2 === 1),
    "doc_id", "text", maxHamming = 7, blocks = 9).count()
}

run("apply_priority") {
  Dedup.dropNearDuplicatesByPriority(Tables(spark, d, "documents"), "doc_id", "text",
    priority = when(col("lang") === "en", 0).when(col("lang") === "es", 1).otherwise(2),
    shingleN = 3, bands = 32, rowsPerBand = 4, threshold = 0.5).count()
}
sys.exit(0)
