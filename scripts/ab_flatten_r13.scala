// r13 follow-up probe: pl_dedup_minhash regressed 13 s -> 117 s at sf1
// after viaPersisted switched to flatten+persist. Isolate WHERE the
// time went by re-implementing the minhash pair pipeline inline with
// three different result-materialization strategies:
//   A) flatten+persist+count (current viaPersisted)
//   B) persist+count on the natural plan, stage unpersisted after (r12)
//   C) no result cache at all: stage persisted, consumer counts lazily
// Each runs `reps` times; per-rep wall vs process CPU vs GC printed.
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.storage.StorageLevel
import graft.functions.VectorExpressions
import graft.Tables

val d = sys.env.getOrElse("AB_SF_DIR", "/tmp/graft_sf1")
val reps = sys.env.getOrElse("AB_REPS", "3").toInt
val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean.asInstanceOf[com.sun.management.OperatingSystemMXBean]
def gcMs(): Long = {
  import scala.jdk.CollectionConverters._
  java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).filter(_ > 0).sum
}

def stageDf(): DataFrame = {
  val k = 32 * 4
  Tables(spark, d, "documents").select(col("doc_id").as("id"),
      VectorExpressions.word_shingle_hashes(col("text"), 3).as("sh"))
    .select(col("id"), col("sh"), VectorExpressions.minhash_sig(col("sh"), k).as("sig"))
}
def body(base: DataFrame): DataFrame = {
  val bands = 32; val rowsPerBand = 4
  val banded = base.select(col("id"),
    posexplode(transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
    .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
  val l = banded.select(col("band"), col("bh"), col("id").as("id_a"))
  val r = banded.select(col("band"), col("bh"), col("id").as("id_b"))
  val candPairs = l.join(r, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
    .select("id_a", "id_b").distinct()
  val aSide = base.select(col("id").as("id_a"), col("sh").as("sh_a")).join(candPairs, "id_a")
  val withSh = aSide.join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
  withSh.withColumn("shared", VectorExpressions.intersect_count(col("sh_a"), col("sh_b")))
    .withColumn("jaccard", col("shared").cast(DoubleType) /
      (size(col("sh_a")) + size(col("sh_b")) - col("shared")))
    .filter(col("jaccard") >= 0.5)
    .select(col("id_a"), col("id_b"), F.round(col("jaccard"), 4).as("jaccard"))
}

def run(name: String)(once: () => Long): Unit = {
  for (i <- 1 to reps) {
    val c0 = osBean.getProcessCpuTime; val g0 = gcMs(); val t0 = System.nanoTime()
    val n = once()
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = (osBean.getProcessCpuTime - c0) / 1e9
    println(f"REP $name $i%2d wall=$wall%8.2f cpu=$cpu%9.2f gc=${gcMs()-g0}%6d ms rows=$n")
  }
}

run("A_flatten") { () =>
  val s = stageDf().persist(StorageLevel.MEMORY_AND_DISK)
  try {
    val res = org.apache.spark.sql.GraftSqlShims.flattenPlan(body(s)).persist(StorageLevel.MEMORY_AND_DISK)
    res.count()
    val n = res.count()
    res.unpersist(blocking = false)
    n
  } finally s.unpersist(blocking = false)
}

run("B_persist") { () =>
  val s = stageDf().persist(StorageLevel.MEMORY_AND_DISK)
  val res = body(s).persist(StorageLevel.MEMORY_AND_DISK)
  res.count()
  val n = res.count()
  s.unpersist(blocking = false)
  res.unpersist(blocking = false)
  n
}

run("C_lazy") { () =>
  val s = stageDf().persist(StorageLevel.MEMORY_AND_DISK)
  try body(s).count() finally s.unpersist(blocking = false)
}

run("D_ckpt") { () =>
  val s = stageDf().persist(StorageLevel.MEMORY_AND_DISK)
  try {
    val res = body(s).localCheckpoint(true)
    val n = res.count()
    res.unpersist(blocking = false)
    n
  } finally s.unpersist(blocking = false)
}
sys.exit(0)
