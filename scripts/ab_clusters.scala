import org.apache.spark.sql.functions._
val d = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", 32)
def time(name: String, reps: Int = 3)(f: => Long): Unit =
  for (i <- 1 to reps) {
    val t0 = System.nanoTime(); val n = f
    println(f"[AB] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
  }
val docs = graft.Tables(spark, d, "documents")
docs.count()
time("pl_dedup_clusters_new") {
  val p = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 32, 4, 0.5)
  graft.operators.Dedup.nearDupClusters(p).count()
}
println("[AB] shuffle.partitions after: " + spark.conf.get("spark.sql.shuffle.partitions"))
System.exit(0)
