// Targeted sf1 (10x) measurement for the late-round-10 operators —
// the full smoke list lives in scale_smoke_sf1.scala; this runs ONLY
// the new rows so a re-measure doesn't pay the whole suite.
//
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/qlbridgespark_2.13-0.1.0.jar \
//     -I scripts/ab_late_r10.scala
import org.apache.spark.sql.functions._

val src = "/root/testdata/sf0.1"
val dst = "/tmp/graft_sf1"
val copies = 10
spark.conf.set("spark.sql.shuffle.partitions", 32)

if (!new java.io.File(s"$dst/documents.parquet/_SUCCESS").exists) {
  val ids = spark.range(copies).select(col("id").as("__copy"))
  val docs = spark.read.parquet(s"$src/documents.parquet")
  val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1
  docs.crossJoin(ids)
    .withColumn("doc_id", col("doc_id") + col("__copy") * maxId)
    .withColumn("text", concat(col("text"), lit(" rev"), col("__copy")))
    .drop("__copy")
    .write.mode("overwrite").parquet(s"$dst/documents.parquet")
  val emb = spark.read.parquet(s"$src/embeddings.parquet")
  val maxV = emb.agg(max("vec_id")).head().getLong(0) + 1
  emb.crossJoin(ids)
    .withColumn("vec_id", col("vec_id") + col("__copy") * maxV)
    .withColumn("embedding", transform(col("embedding"),
      x => (x + col("__copy").cast("float") * lit(0.001f)).cast("float")))
    .drop("__copy")
    .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  println(s"[SF1] built $dst")
}

def time(name: String, reps: Int = 3): Unit = {
  val fn = graft.SparkEntry.queries(name)
  for (i <- 1 to reps) {
    val t0 = System.nanoTime(); val n = fn(spark, dst).count()
    println(f"[SF1] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    graft.operators.Dedup.releaseAll()
  }
}

Seq("pl_fingerprint_winnow", "pl_winnow_overlap", "pl_winnow_containment",
  "pl_dedup_apply_priority", "pl_curate_pipeline3", "pl_emb_prototype_prune",
  "pl_screen_ablation", "pl_stats_outliers", "pl_vocab_growth",
  "pl_multimodal_phash", "pl_multimodal_phash_pairs",
  "pl_emb_dedup_incr", "pl_dist_drift", "pl_drop_reasons")
  .foreach(time(_))
System.exit(0)
