// Same-JVM A/B for the round-6/7 dedup edits + the r5 timing spikes
// (bench variance on this host is 1.5-3x, so only same-JVM warm reps
// are evidence — see scripts/ab_round5.scala protocol).
//
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/qlbridgespark_2.13-0.1.0.jar \
//     -I scripts/ab_round7.scala
//
// RESULTS (this host, sf0.1, 2026-08-12, warm reps after rep1):
//   simhash k=8 old blocking   0.40-0.48 s   237 pairs
//   simhash k=9 multi-block    0.36-0.42 s   237 pairs (identical set —
//     the corpus-scale blocking is free at this SF)
//   pl_emb_nn                  0.87-1.77 s   (r5's 6.54 s was host
//     variance, not a regression — matches r3)
//   drop_near  AQE 0.71-0.72 s vs forced-broadcast 1.01-1.05 s
//   drop_emb   AQE 0.77-0.84 s vs forced-broadcast 0.39-0.86 s (noise)
//     → removing the forced broadcasts costs nothing locally and
//       removes the driver-OOM cliff at crawl scale
//   minhash_pairs 0.27-0.31 s; clusters 1.51-1.73 s (in-plan loop width)
import org.apache.spark.sql.functions._

val d = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", 32)
def time(name: String, reps: Int = 3)(f: => Long): Unit =
  for (i <- 1 to reps) {
    val t0 = System.nanoTime(); val n = f
    println(f"[AB] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
  }

val docs = graft.Tables(spark, d, "documents")
docs.count() // warm the scan
val emb = graft.Tables(spark, d, "embeddings")
emb.count()

// -- r7 simhash blocking: k=8 single-chunk keys vs k=9 two-chunk keys
time("simhash_k8_oldblocking") {
  graft.operators.Dedup.simHashPairs(docs, "doc_id", "text", 7).count()
}
time("simhash_k9_multiblock") {
  graft.operators.Dedup.simHashPairs(docs, "doc_id", "text", 7, blocks = 9).count()
}

// -- r5 spike check: pl_emb_nn on unchanged code
time("pl_emb_nn") {
  graft.operators.Similarity.nearestNeighborWithinBlock(emb, "vec_id", "embedding", "label", maxBlock = 10000).count() // pin the pre-r9 exact-path default: this script's recorded baselines measured it
}

// -- r6 broadcast-removal delta: AQE-chosen anti join (new) vs forced
//    broadcast of the removal set (old r5 shape)
time("drop_near_aqe") {
  graft.operators.Dedup.dropNearDuplicates(docs, "doc_id", "text").count()
}
time("drop_near_forced_broadcast") {
  val pairs = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 32, 4, 0.5)
  val remove = pairs.select(greatest(col("id_a"), col("id_b")).as("__rm")).distinct()
  docs.join(broadcast(remove), col("doc_id") === col("__rm"), "left_anti").count()
}
time("drop_emb_aqe") {
  graft.operators.Dedup.dropEmbeddingNearDuplicates(emb, "vec_id", "embedding", "label", 0.95).count()
}
time("drop_emb_forced_broadcast") {
  val pairs = graft.operators.Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", "label", 0.95)
  val remove = pairs.select(col("id_b").as("__rm")).distinct()
  emb.join(broadcast(remove), col("vec_id") === col("__rm"), "left_anti").count()
}

// -- r6 minhash broadcast-drop + in-plan CC width (vs r5 baselines in
//    BENCH_r05: minhash 2.43s, clusters 3.32s from ab_round5 runs)
time("minhash_pairs") {
  graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 32, 4, 0.5).count()
}
time("clusters") {
  val p = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 32, 4, 0.5)
  graft.operators.Dedup.nearDupClusters(p).count()
}
System.exit(0)
