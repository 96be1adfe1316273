// sf1 scale smoke (VERDICT r7 #7): run the heaviest pipeline queries on
// a 10x-scaled corpus so a skew/persist regression shows up here before
// a real cluster does. The scaled tables are derived from sf0.1 (the
// driver fixtures are read-only and there is no sf1 dir): 10 copies of
// documents/embeddings with distinct ids, a per-copy text suffix, and a
// per-copy embedding perturbation. The copies are deliberate NEAR-DUPS
// (suffix changes one token; vectors get ±0.2 md5-derived component
// noise since r11) — extra stress for exactly the dedup/ANN paths the
// round-7 verdict flagged.
//
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/qlbridgespark_2.13-0.1.0.jar \
//     -I scripts/scale_smoke_sf1.scala
//
// FULL r11 RUN (this host, 2026-08-14, end-to-end at r11 HEAD): every
// family within the bands below; r11 additions measured —
//   merge_cdc_10x          1.11 s (dialect MERGE: 1% upd/del + 1% ins
//     over 50k docs, ambiguity check included; 50000 -> 50324 rows)
//   recursive_tree_10x     10.4 s (WITH RECURSIVE, 19 semi-naive
//     iterations over 500k ids, frontier-checkpointed; 500k rows out)
//   pl_winnow_index_ship   6.5-9.4 s, 120,676 delta-touching pairs
//   pl_dedup_simhash_ship  4.6-9.0 s, 119,623 delta-touching pairs
//   pl_search_hybrid_rrf   9.4-10.4 s (two ranking chains + fusion)
//   pl_split_dedup_aware   10.1-11.6 s / 50k docs (pair mine + CC + md5)
//   pl_multimodal_phash_pairs 1.85-3.5 s, 361,666 pairs (budgets live;
//     r10 exact: 24-30 s, 9.93M)
//   bpe_train rounds=64    12.2 s; tail 0.180 s/round vs head 0.261 (flat)
//   pl_emb_ann_recall      separates all 5 methods on the r11 noise
//     corpus (lsh 0.296 / ivfpq 0.464 / pq 0.58 / ivf 0.63 / km 0.65)
//   pl_token_divergence    1.6-2.3 s warm (9.2 fresh) for 500k docs —
//     one (source, token) shuffle, near-linear vs sf0.1
//   pl_threshold_sweep     7.9-8.1 s warm (12.6 fresh) — dominated by
//     the 3-round GD retrain (same class as pl_quality_classifier,
//     ~2.3x for 10x data); the sweep itself is one aggregate pass
//
// RESULTS (this host, 2026-08-14 r10 run at HEAD — post cellAssign
// kernel + Generate barrier + banded split-leakage + word-bigram
// kernel; 50k docs / 20k vectors, warm = later reps, same JVM; host
// variance is 1.5-3x across JVMs):
//   pl_curate_pipeline2          rep1 31 s    warm 12-18 s  (~2.5x for 10x data)
//   pl_curate_report             rep1  5 s    warm  3-4 s   (~1.3x)
//   pl_dedup_clusters            rep1 13 s    warm 11-13 s  (10x near-dup pair mass)
//   pl_dedup_apply_near          9-18 s  (AQE LeftAnti; ~5x for 10x data)
//   pl_emb_ann_ivf_kmeans        rep1  2.0 s  warm  1.0 s  (was 5-7.4 s
//     before the r10 CellAssign kernel + Generate-barrier fix)
//   pl_emb_ann_recall            rep1 13.6 s  warm 10.6-11.3 s  (multi-
//     probe: all 5 ANN pipelines + 50-probe exact ground truth; the
//     r10 copy-cluster corpus saturated the quantization methods at
//     1.0 — the r11 ±0.2 noise rebuild separates all five at sf1:
//     lsh 0.296 / ivfpq 0.464 / pq 0.58 / ivf 0.63 / ivf_kmeans 0.65,
//     the same ladder shape as the natural sf0.1 corpus:
//     lsh 0.20 / ivfpq 0.42 / ivf 0.50 / ivf_kmeans 0.54 / pq 0.55)
//   pl_emb_nn (default 2000)     17-21 s — only oversized blocks sub-bucket;
//     sub-threshold blocks (~1900 rows) pay the documented ~3.6M-pair budget
//   pl_emb_nn (exact, mb=10000)  23-25 s — 10x rows = 100x pairs; opt-in
//   pl_emb_nn (maxBlock=500)     2.0-2.2 s — every block sub-bucketed,
//     ~10x faster at identical output cardinality: the guard is the
//     knob that makes bulk NN survive a 100 TB block
//   pl_text_lm_quality           1.7-2.4 s  (vocab-bounded lm cache)
//   pl_dsir_sample               2.1-2.8 s  (bounded LM fit + top-k draw)
//   pl_quality_classifier        rep1 11.8 s  warm 8.2-9.0 s  (every rep
//     RETRAINS the 3 GD rounds; production trains once, pays scoring)
//   pl_classifier_eval           8.5-9.1 s  (same retrain shape)
//   pl_dedup_substring           20.6-24.2 s  (adversarial: every gram
//     duplicated across the 10 copies)
//   pl_split_leakage             rep1 7.9 s  warm 6.2-6.4 s — the r10
//     banded-MinHash default; the exact inverted index measured
//     293-336 s/rep on this corpus (C(df,2) candidates per shared gram,
//     quadratic in duplication density) for IDENTICAL output
//   pl_bpe_merges                1.4-1.9 s  (6 merge rounds; corpus scan
//     once, vocab-bounded rounds)
//   pl_text_bigram_ppl           2.8-3.4 s  (r10 WordBigrams kernel; the
//     interpreted HOF formulation never finished a rep on this corpus)
//   pl_emb_hard_negatives        0.95-1.4 s  (broadcast anchors, one pass)
//   pl_cluster_profile           rep1 1.3 s  warm 0.8 s  (post-kernel;
//     4.6-5.6 s before)
//   pl_emb_semdedup nlist=8      2.5-2.9 s;  nlist=64  2.0-2.1 s — MORE
//     clusters is CHEAPER (smaller quadratic pair cells), the property
//     that carries SemDeDup to its ~100k-cluster web-scale regime (the
//     pre-kernel nlist=64 ran 37.7 s; pre-barrier it ran >14 min)
//   corpus_diff_10x              0.2-0.5 s  (~linear; (id,hash) shuffle only)
//   cms_merge_10x                1.1-1.4 s  (~linear; |sources| blobs to driver)
//   streaming_lsh_dedup_10x      19.6 s / 50k docs, 280k matches
//     (10 micro-batches, simhash chunk-bucketed state)
//
// Late-r10 operators (same host, 2026-08-14, via scripts/ab_late_r10
// .scala — warm = later reps; this copy corpus is the ADVERSARIAL
// case for the pair miners, every doc has 9 near-identical partners):
//   pl_fingerprint_winnow        0.6-0.8 s  (50-doc slice)
//   pl_winnow_overlap            11-20 s, 232,579 pairs — pair volume
//     quadratic in copy-family size; maxDf=20 keeps corpus-wide
//     boilerplate out but in-family fingerprints are df=10 < 20 by
//     design here, so families pair fully (the honest worst case)
//   pl_winnow_containment        8-17 s, 477,312 directed pairs (2x
//     overlap's volume: both orientations + the 800-permill gate)
//   pl_dedup_apply_priority      10-14 s  (pair mine + CC + rank; same
//     mass as pl_dedup_clusters + one window)
//   pl_curate_pipeline3          13-16 s  (every rep RETRAINS the 3 GD
//     rounds, then gate → dedup → temperature → shard)
//   pl_emb_prototype_prune       1.2-3.0 s  (k-means train + broadcast
//     scoring scan, WindowGroupLimit cut)
//   pl_screen_ablation           1.5-2.3 s  (one scan aggregate)
//   pl_stats_outliers            0.7-1.0 s  (two percentile aggs)
//   pl_vocab_growth              0.75-1.25 s (one (source,token) agg)
//   pl_multimodal_phash          0.13-0.18 s / 50k docs (kernel scan)
//   pl_emb_dedup_incr            1.25-1.7 s warm — delta (4k vectors)
//     vs immutable corpus (16k) in LSH buckets; on this copy corpus
//     nearly every delta vector near-dups something (4 survive)
//   pl_dist_drift                0.4-0.5 s warm — two tiny histograms
//   pl_drop_reasons              1.8-2.0 s warm / 50k attributions
//   pl_multimodal_phash_pairs    r10: 24-30 s, 9,931,396 pairs (exact
//     banding; copies share IDENTICAL phashes — the rev suffix lands
//     past the 192 hashed bytes — so identical-hash groups multiply to
//     >64 members and their cliques dominate). r11 default budgets
//     (maxClique=64 star-collapse + maxBucket=2000 sub-banding):
//     rep1 10.7 s, warm 2.4-2.7 s, 361,666 pairs — 27x less output,
//     ~10x faster, connected components IDENTICAL to the exact list's
//     (spec-gated); exact list back via maxClique=0
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
  println(s"[SF1] built docs: " +
    spark.read.parquet(s"$dst/documents.parquet").count())
}
if (!new java.io.File(s"$dst/embeddings.parquet/_SUCCESS").exists) {
  val ids = spark.range(copies).select(col("id").as("__copy"))
  val emb = spark.read.parquet(s"$src/embeddings.parquet")
  val maxV = emb.agg(max("vec_id")).head().getLong(0) + 1
  // md5-derived per-(vec, component) noise, NOT a per-copy constant
  // shift: the r10 corpus (x + copy*0.001) left every copy far above
  // background cosine, so every exact top-10 was its own 10-copy
  // family and all quantization methods saturated recall 1.0 at sf1
  // (README r10) — ±0.1 noise did NOT fix this (measured: still 1.0
  // except lsh 0.948) because the family stayed cleanly separated.
  // ±0.2 per-component noise (noise-vector norm ~0.92 vs the unit
  // signal; family cosine ~0.73) puts natural neighbors inside the
  // top-10 decision boundary, and the ladder separates at 10x like it
  // does at sf0.1 — MEASURED (this host, 2026-08-14 r11): lsh 0.296 /
  // ivfpq 0.464 / pq 0.58 / ivf 0.63 / ivf_kmeans 0.65, all < 1.0,
  // same ordering shape as the natural sf0.1 corpus. Fully
  // deterministic (same corpus every run, any engine).
  emb.crossJoin(ids)
    .withColumn("vec_id", col("vec_id") + col("__copy") * maxV)
    .withColumn("embedding", transform(col("embedding"), (x, i) =>
      (x + (conv(substring(md5(concat_ws(":", col("vec_id"), i)), 1, 6), 16, 10)
          .cast("double") / lit(16777215.0) - 0.5) * lit(0.4))
        .cast("float")))
    .drop("__copy")
    .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  println(s"[SF1] built embeddings: " +
    spark.read.parquet(s"$dst/embeddings.parquet").count())
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
  "pl_dedup_apply_near", "pl_emb_ann_ivf_kmeans", "pl_emb_ann_recall",
  "pl_emb_nn", "pl_text_lm_quality",
  // r10 learned filters: DSIR's LM fit is vocab-bounded and the draw a
  // top-k heap; classifier training is 3 one-aggregation GD rounds over
  // the persisted feature frame, scoring one join-free pass
  "pl_dsir_sample", "pl_quality_classifier", "pl_classifier_eval",
  // r10 substring dedup + leakage audit: this copy-built corpus is the
  // adversarial case for both — every gram is duplicated across the 10
  // copies (the dup set ~= the gram stream) and every doc has 9
  // near-dup partners for the pair stage
  "pl_dedup_substring", "pl_split_leakage",
  // r10 additions: BPE fit is one corpus scan + vocab-bounded rounds;
  // bigram LM is a 64k-table fit + one scoring join; hard negatives one
  // broadcast-anchor pass; cluster profile trains k-means once
  "pl_bpe_merges", "pl_text_bigram_ppl", "pl_emb_hard_negatives",
  "pl_cluster_profile",
  // r10 embedding chain: hashed projection (one tokenize + bucket agg),
  // end-to-end retrieval, semantic decontamination, BPE-count packing
  "pl_text_embed", "pl_text_semantic_topk", "pl_decontaminate_semantic",
  "pl_bpe_pack",
  // late-r10 additions. winnow_overlap and phash_pairs hit this corpus
  // at its ADVERSARIAL worst: the 10 copies share ~all fingerprints
  // (and identical phashes — the rev suffix lands past the 192 hashed
  // bytes), so pair volume is quadratic in family size — the maxDf cut
  // (winnow) and the banding buckets (phash) are what's being stressed.
  // pipeline3 retrains the classifier every rep; prototype_prune is one
  // k-means train + a broadcast-join scan; ablation one scan aggregate.
  "pl_winnow_overlap", "pl_multimodal_phash_pairs",
  "pl_dedup_apply_priority", "pl_curate_pipeline3",
  "pl_emb_prototype_prune", "pl_screen_ablation",
  // r11 additions: both ship-the-index delta mines fingerprint only
  // the odd-id half and join the stored even-id index; hybrid RRF is
  // two bounded top-k chains + a tiny fusion join; dedup-aware split
  // is the LSH pair mine + CC + a scan-stage md5 of the cluster id
  "pl_winnow_index_ship", "pl_dedup_simhash_ship",
  "pl_search_hybrid_rrf", "pl_split_dedup_aware",
  // late-r11 additions: token divergence is one (source, token)
  // partial-agg shuffle + a per-source rank window over the
  // |sources|x|tokens| frame; the threshold sweep retrains the
  // classifier then runs ONE conditional-aggregate pass
  "pl_token_divergence", "pl_threshold_sweep")
  .foreach(time(_))

// BPE merge-round scaling (VERDICT r10 #6): per-round cost must be
// FLAT in the merge count — the r10 lineage chained r replaces by
// round r (O(rounds²) work + unbounded analyzer depth); since r11 the
// vocab localCheckpoints every 32 merges. Evidence: amortized
// per-round time of rounds 9-64 vs rounds 1-8 (the fixed corpus-scan
// cost amortizes away in the tail; ratio ~1 = flat, ~4+ = quadratic).
// MEASURED (this host, 2026-08-14 r11): rounds=8 2.9 s, rounds=64
// 14.1 s -> tail 0.201 s/round vs head 0.360 s/round — flat (the tail
// is cheaper than the head because the one corpus scan and first-plan
// codegen sit in the head).
{
  val docs = spark.read.parquet(s"$dst/documents.parquet")
  def train(r: Int): Double = {
    val t0 = System.nanoTime()
    graft.operators.Tokenizer.bpeTrain(docs, "text", rounds = r)
    graft.operators.Dedup.releaseAll()
    (System.nanoTime() - t0) / 1e9
  }
  train(2) // JIT/codegen warm
  val t8 = train(8); val t64 = train(64)
  println(f"[SF1] bpe_train rounds=8: $t8%.1f s; rounds=64: $t64%.1f s; " +
    f"tail per-round ${(t64 - t8) / 56}%.3f s vs head ${t8 / 8}%.3f s")
}

// semDeDup A/B on nlist — THE scale knob: the query row's nlist=8
// leaves ~2.5k-row cells on this 20k corpus (quadratic pair mass per
// cell); nlist=64 shrinks cells ~8x and pair mass ~64x. At 100 TB the
// paper's regime is ~100k clusters for the same reason.
{
  val emb = spark.read.parquet(s"$dst/embeddings.parquet")
  for ((nl, tag) <- Seq(8 -> "nlist=8", 64 -> "nlist=64"); i <- 1 to 2) {
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.semDeDup(
      emb, "vec_id", "embedding", nlist = nl, iters = 2, threshold = 0.25).count()
    println(f"[SF1] pl_emb_semdedup $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    graft.operators.Dedup.releaseAll()
  }
}

// pl_emb_nn in the list above now runs the DEFAULT guard (maxBlock=2000
// since r9): sf1 label blocks are ~1800-2180 rows, so the oversized
// blocks sub-bucket by default and the quadratic exact path is opt-in.
// A/B both paths explicitly — exact forced via a raised threshold:
{
  val emb = spark.read.parquet(s"$dst/embeddings.parquet")
  for ((mb, tag) <- Seq(10000 -> "exact(maxBlock=10000)", 500 -> "guarded(maxBlock=500)");
       i <- 1 to 2) {
    val t0 = System.nanoTime()
    val n = graft.operators.Similarity.nearestNeighborWithinBlock(
      emb, "vec_id", "embedding", "label", maxBlock = mb, nPlanes = 4).count()
    println(f"[SF1] pl_emb_nn $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    graft.operators.Dedup.releaseAll()
  }
}

// ---- r9 additions (VERDICT r8 #6): heavy families not yet smoked ----

// corpus snapshot diff between two 10x snapshots with ~2% drift: the
// shuffle carries (id, hash) only, so 10x rows should scale ~linearly
{
  val docs = spark.read.parquet(s"$dst/documents.parquet")
  val newSnap = docs
    .filter(pmod(col("doc_id"), lit(97)) =!= 0) // ~1% removed
    .withColumn("text", when(pmod(col("doc_id"), lit(101)) === 0,
      concat(col("text"), lit(" drifted"))).otherwise(col("text"))) // ~1% changed
    .unionByName(docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      .withColumn("doc_id", col("doc_id") + lit(100000000L))) // ~1% added
  for (i <- 1 to 3) {
    val t0 = System.nanoTime()
    val n = graft.operators.Curation.corpusDiff(docs, newSnap, "doc_id", "text").count()
    println(f"[SF1] corpus_diff_10x rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    graft.operators.Dedup.releaseAll()
  }
}

// count-min build + merge across the 10x corpus's sources: per-group
// blobs to the driver stay |sources|-bounded regardless of corpus size
{
  val docs = spark.read.parquet(s"$dst/documents.parquet")
  for (i <- 1 to 3) {
    val t0 = System.nanoTime()
    val cms = graft.operators.Profiling.mergeTokenSketches(
      graft.operators.Profiling.tokenFrequencySketch(docs, "source", "text"))
    val est = graft.operators.Profiling.estimateTokenCount(cms, "the")
    println(f"[SF1] cms_merge_10x rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s est(the)=$est")
    graft.operators.Dedup.releaseAll()
  }
}

// streaming LSH near-dedup over the 10x corpus: 10 micro-batches of
// 5k docs (one per copy, event time advancing 1 min/batch, all inside
// the 30 min horizon), memory sink. State is (chunk, value)-bucketed
// simhash entries — the quadratic risk lives per bucket, not per corpus.
{
  import spark.implicits._
  implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
  val all = spark.read.parquet(s"$dst/documents.parquet")
    .select("doc_id", "text").collect() // smoke-only driver feed (~50k rows)
  // builder: new_id = orig_id + copy * (maxOrig + 1), so max new id is
  // copies * (maxOrig + 1) - 1 and the per-copy stride recovers exactly
  val maxId = (all.map(_.getLong(0)).max + 1) / copies
  val t0ts = java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))
  val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)]
  val out = graft.streaming.EventStream.nearDedupMatches(
    mem.toDF().toDF("doc_id", "ts", "text").as[graft.streaming.EventStream.Doc],
    horizon = "30 minutes", maxHamming = 3)
  val q = out.writeStream.outputMode("append")
    .format("memory").queryName("sf1_neardup").start()
  val t0 = System.nanoTime()
  for (c <- 0 until copies) {
    val ts = new java.sql.Timestamp(t0ts.getTime + c * 60000L)
    mem.addData(all.iterator
      .filter(r => r.getLong(0) / maxId == c)
      .map(r => (r.getLong(0), ts, r.getString(1))).toSeq)
    q.processAllAvailable()
  }
  val secs = (System.nanoTime() - t0) / 1e9
  val matches = spark.table("sf1_neardup").count()
  q.stop()
  println(f"[SF1] streaming_lsh_dedup_10x: $secs%.2f s for ${all.length} docs, $matches matches")
}

// MERGE INTO at 10x: CDC-style delta (1% updates incl. deletes, 1%
// inserts) through the DIALECT — one left join + one anti join, delta
// side broadcast-eligible; the ambiguity check is one bounded agg.
{
  val docs = spark.read.parquet(s"$dst/documents.parquet").select("doc_id", "text", "source")
  val gs = new graft.engine.GraftSession(spark)
  gs.registerTable("corpus", docs)
  val delta = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("del")).otherwise(lit("upd")).as("op"))
    .unionByName(docs.filter(pmod(col("doc_id"), lit(101)) === 0)
      .select((col("doc_id") + lit(200000000L)).as("doc_id"), col("text"), lit("ins").as("op")))
  gs.registerTable("delta", delta)
  val before = docs.count()
  val t0 = System.nanoTime()
  gs.sql("""MERGE INTO corpus t USING delta d ON t.doc_id == d.doc_id
    WHEN MATCHED AND d.op == "del" THEN DELETE
    WHEN MATCHED THEN UPDATE SET text = d.text
    WHEN NOT MATCHED THEN INSERT (doc_id, text) VALUES (d.doc_id, d.text)""")
  val n = gs.sql("SELECT count(*) AS n FROM corpus").collect()(0).getLong(0)
  println(f"[SF1] merge_cdc_10x: ${(System.nanoTime() - t0) / 1e9}%.2f s rows $before -> $n")
}

// WITH RECURSIVE at 10x: binary-tree depth labels over 500k ids — 19
// semi-naive iterations, each joining the table against a checkpointed
// frontier (the frontier halves as the tree deepens; per-round work
// tracks the frontier, not the accumulated result).
{
  val gs = new graft.engine.GraftSession(spark)
  gs.registerTable("ids", spark.range(500000).toDF("id"))
  val t0 = System.nanoTime()
  val out = gs.sql("""WITH RECURSIVE walk(id, depth) AS (
      SELECT id, 0 FROM ids WHERE id == 0
      UNION ALL
      SELECT c.id, w.depth + 1 FROM ids c JOIN walk w ON toint(c.id / 2) == w.id AND c.id != 0
    ) SELECT max(depth) AS maxd, count(*) AS n FROM walk""").collect()(0)
  println(f"[SF1] recursive_tree_10x: ${(System.nanoTime() - t0) / 1e9}%.2f s maxDepth=${out.get(0)} rows=${out.get(1)}")
}

println("[SF1] done")
