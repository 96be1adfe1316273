// Same-JVM A/B of round-4 bench outliers (see memory: graft-bench-variance).
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

val d = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", 32)
def time(name: String, reps: Int = 3)(f: => Long): Unit =
  for (i <- 1 to reps) {
    val t0 = System.nanoTime(); val n = f
    println(f"[AB] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
  }

val emb = graft.Tables(spark, d, "embeddings")
emb.count() // warm the scan

time("pl_emb_nn_new") {
  graft.operators.Similarity.nearestNeighborWithinBlock(emb, "vec_id", "embedding", "label", maxBlock = 10000).count() // pin the pre-r9 exact-path default: this script's recorded baselines measured it
}

def oldNN(): Long = {
  val l = emb.select(col("label").as("blk"), col("vec_id").as("id"), col("embedding").cast("array<double>").as("v_a"))
  val r = emb.select(col("label").as("blk"), col("vec_id").as("id_b"), col("embedding").cast("array<double>").as("v_b"))
  val pairs = l.join(r, Seq("blk")).filter(col("id") =!= col("id_b"))
    .withColumn("cos", graft.functions.VectorExpressions.cosine_sim(col("v_a"), col("v_b")))
  val w = Window.partitionBy("id").orderBy(col("cos").desc, col("id_b"))
  pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).count()
}
time("pl_emb_nn_old")(oldNN())

val docs = graft.Tables(spark, d, "documents")
docs.count()
time("pl_dedup_minhash") {
  graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 32, 4, 0.5).count()
}
time("pl_dedup_clusters") {
  val p = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 32, 4, 0.5)
  graft.operators.Dedup.nearDupClusters(p).count()
}
time("pl_emb_topk") {
  val q = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
  graft.operators.Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20).count()
}
time("pl_sample_quota") {
  graft.queries.PipelineQueries.all("pl_sample_quota").fn(spark, d).count()
}
time("ql_tosql_roundtrip") {
  graft.SparkEntry.queries("ql_tosql_roundtrip")(spark, d).count()
}
System.exit(0)
