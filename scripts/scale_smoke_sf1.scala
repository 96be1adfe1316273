// sf1 scale smoke (VERDICT r7 #7): run the heaviest pipeline queries on
// a 10x-scaled corpus so a skew/persist regression shows up here before
// a real cluster does. The scaled tables are derived from sf0.1 (the
// driver fixtures are read-only and there is no sf1 dir): 10 copies of
// documents/embeddings with distinct ids, a per-copy text suffix, and a
// per-copy embedding perturbation. The copies are deliberate NEAR-DUPS
// (suffix changes one token; vectors move 1e-3 per copy) — extra stress
// for exactly the dedup/ANN paths the round-7 verdict flagged.
//
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/qlbridgespark_2.13-0.1.0.jar \
//     -I scripts/scale_smoke_sf1.scala
//
// RESULTS (this host, 2026-08-13, 50k docs / 20k vectors, warm reps
// after rep1; same-JVM — host variance is 1.5-3x across JVMs):
//   pl_curate_pipeline2          rep1 19-21 s   warm 11-14 s  (~3x for 10x data)
//   pl_curate_report             rep1  4-11 s   warm  3-4 s   (~1.3x)
//   pl_dedup_clusters            rep1 12-20 s   warm  8-18 s  (10x near-dup pair mass)
//   pl_emb_ann_ivf_kmeans        rep1  5-11 s   warm  4-6 s   (~3x; cached train scan)
//   pl_emb_nn (exact path)       17-60 s — blocks ~2k ≤ default maxBlock,
//     so 10x rows = 100x pairs: the documented quadratic below the guard
//   pl_emb_nn (maxBlock=500)     1.6-2.8 s — every block sub-bucketed,
//     10-30x faster at identical output cardinality: the guard is the
//     knob that makes bulk NN survive a 100 TB block
//   pl_text_lm_quality           rep1 7.3 s   warm 1.6 s  (~1.6x for
//     10x data — vocab-bounded lm cache, corpus result stays lazy)
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
  println(s"[SF1] built $dst: " +
    spark.read.parquet(s"$dst/documents.parquet").count() + " docs, " +
    spark.read.parquet(s"$dst/embeddings.parquet").count() + " vectors")
}

def time(name: String, reps: Int = 3): Unit = {
  val fn = graft.SparkEntry.queries(name)
  for (i <- 1 to reps) {
    val t0 = System.nanoTime(); val n = fn(spark, dst).count()
    println(f"[SF1] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    graft.operators.Dedup.releaseAll() // drop retained result caches between reps
  }
}

Seq("pl_curate_pipeline2", "pl_curate_report", "pl_dedup_clusters",
  "pl_emb_ann_ivf_kmeans", "pl_emb_nn", "pl_text_lm_quality").foreach(time(_))

// pl_emb_nn above runs the EXACT path (label blocks ~2k rows sit under
// the default maxBlock=10000) — at 10x data that is 100x pairs, the
// quadratic growth the r7 verdict predicted. The skew guard is the
// knob: maxBlock=500 sub-buckets EVERY block (2^nPlanes=16 buckets →
// ~16x fewer pairs).
{
  val emb = spark.read.parquet(s"$dst/embeddings.parquet")
  for (i <- 1 to 3) {
    val t0 = System.nanoTime()
    val n = graft.operators.Similarity.nearestNeighborWithinBlock(
      emb, "vec_id", "embedding", "label", maxBlock = 500, nPlanes = 4).count()
    println(f"[SF1] pl_emb_nn guarded(maxBlock=500) rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    graft.operators.Dedup.releaseAll()
  }
}
println("[SF1] done")
