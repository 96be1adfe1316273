package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates: these are the properties that decide
  * whether a query survives a 100 TB scale-up — filters reaching the
  * parquet scan, column pruning, broadcast joins for dims, partial
  * aggregation, top-k instead of full sort.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filters push down to the parquet scan") {
    val p = plan("q2_filter_proj")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(p.contains("GreaterThan"), p) // value filters reach the scan
  }

  test("projection prunes the scan schema") {
    val p = plan("q2_filter_proj")
    // only the needed columns are read — the 16-column lineitem scan
    // must not appear
    assert(!p.contains("l_returnflag"), "unpruned column in scan:\n" + p)
    assert(p.contains("l_extendedprice"), p)
  }

  test("star join broadcasts the dimension tables") {
    val p = plan("q5_star_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("aggregation is partial+final hash agg inside codegen") {
    val p = SparkEntry.queries("q1_agg")(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum"), p)
    // codegen'd stages carry the *(n) marker — visible in the FINAL
    // adaptive plan, so execute first
    val df = SparkEntry.queries("q1_agg")(spark, dir)
    df.collect() // count() would build a different plan instance
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("*("), fin)
  }

  test("order-by + limit compiles to top-k, not a full sort") {
    val p = plan("q9_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("semi and anti joins use join operators, not subquery loops") {
    assert(plan("q4_semi_join").contains("LeftSemi"), plan("q4_semi_join"))
    assert(plan("q11_anti_join").contains("LeftAnti"), plan("q11_anti_join"))
  }

  test("engine-dialect queries get the same pushdown treatment") {
    val p = plan("ql_select_where")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(p.contains("GreaterThan(l_quantity") || p.contains("EqualTo(l_returnflag"), p)
  }

  test("embedding pair stages normalize BELOW the join (once per row)") {
    // the whole point of the L2Normalize kernel: O(rows) normalization,
    // O(pairs) plain dot. If projection collapse ever pushed
    // graft_l2_normalize above the join it would run per pair again.
    for (q <- Seq("pl_emb_nn", "pl_emb_cosine_pairs")) {
      // kernels print by Catalyst prettyName = lowercased class name
      val p = plan(q).toLowerCase
      val joinAt = p.indexOf("join")
      val normAt = p.indexOf("l2normalize")
      assert(normAt >= 0, s"$q: L2Normalize kernel missing from plan:\n$p")
      assert(joinAt >= 0, s"$q: no join in plan:\n$p")
      // executedPlan prints parents first: the join line precedes its
      // children, so the normalization must appear AFTER (= below) it
      assert(normAt > joinAt, s"$q: L2Normalize above the join:\n$p")
      assert(p.contains("dotproduct"), s"$q: pair stage is not a plain dot:\n$p")
      assert(!p.contains("cosinesimilarity"), s"$q: fused cosine survived in the pair stage:\n$p")
      assert(!p.contains("cartesianproduct"), s"$q: cartesian product:\n$p")
    }
  }

  test("quota sample prunes per-group rows before the shuffle") {
    // row_number <= k must plan as WindowGroupLimit (partial + final),
    // so each map task keeps only k rows per group — without it the
    // whole corpus sorts inside every group at 100 TB
    val p = plan("pl_sample_quota")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("url/email projection prunes the customer scan") {
    val p = plan("ql_url_email")
    // only the four referenced columns should be read
    assert(p.contains("c_custkey") && p.contains("c_mktsegment"), p)
    assert(!p.contains("c_acctbal") && !p.contains("c_address"),
      "unpruned column in scan:\n" + p)
  }

  test("repetition screen runs shuffle-free at scan speed") {
    // the compiled TopNgramStats kernel must keep the per-doc stats in
    // the scan stage: no Exchange below the final ordering, no explode
    val p = plan("pl_text_repetition")
    assert(p.toLowerCase.contains("topngramstats"), p)
    assert(!p.contains("Generate"), "explode crept into the repetition screen:\n" + p)
    // exactly one Exchange — the rangepartitioning for the output ORDER BY
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"$exchanges exchanges (want <=1, only the output sort):\n$p")
  }

  test("exact-dedup apply decides on (id, hash) and never shuffles the payload (r17)") {
    // the r16 shape was one scan + a window whose exchange carried the
    // FULL rows keyed by md5(text); r17 mines the duplicate LOSERS on a
    // narrow (id, hash) frame and removes them with a LEFT ANTI join
    // (guide §8: shuffle a lightweight proxy, not the payload) — the
    // strategy stays AQE's (no broadcast hint: losers can be 50% of a
    // crawl corpus), and probe-side column pruning reaches the scan
    val df = SparkEntry.queries("pl_dedup_apply_exact")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), "removal must be a LeftAnti join:\n" + p)
    assert(!df.queryExecution.analyzed.toString.toLowerCase.contains("broadcast"),
      "forced broadcast hint on a data-dependent removal set")
    // the query projects (doc_id, n_chars): the probe-side scan must
    // no longer read the text it used to carry into the window
    val probeScans = p.linesIterator.filter(_.contains("ReadSchema"))
      .filterNot(_.contains("text")).toList
    assert(probeScans.nonEmpty,
      "no text-pruned scan — payload still flows through the dedup:\n" + p)
    // the loser-mining window runs over the narrow frame only: every
    // hashpartitioning exchange key set excludes the text column
    assert(!"""Exchange hashpartitioning\([^)]*text""".r.findFirstIn(p).isDefined,
      "text column entered a dedup exchange:\n" + p)
    // the curation funnel composes the same dedup + quota semi joins;
    // its quality screen must still evaluate in scan position (no
    // cartesian, no extra full-width exchange of text)
    val c = plan("pl_curate_pipeline")
    assert(!c.contains("CartesianProduct"), c)
    assert(!"""Exchange hashpartitioning\([^)]*text""".r.findFirstIn(c).isDefined,
      "text column entered a funnel exchange:\n" + c)
  }

  test("sequence packing windows per shard, never a single global partition") {
    // the naive global running sum is Window.orderBy with NO partition
    // key — Spark plans it as a single-partition Exchange and one task
    // sorts the entire corpus. The two-phase prefix sum must window by
    // the range shard instead. The returned frame's own plan is a flat
    // LogicalRDD since r13 (viaPersisted plan flattening), so the gate
    // reads THIS frame's inner execution (r15: per-call map, keyed by
    // the frame's flattened RDD — no last-writer-wins slot).
    val df = SparkEntry.queries("pl_seq_pack")(spark, dir)
    val execs = graft.operators.Dedup.innerExecutionsFor(df)
    assert(execs.size == 1, s"expected one viaPersisted stage, got ${execs.size}")
    val p = execs.head.executedPlan.toString
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"),
      "global single-partition window in the packing plan:\n" + p)
    assert(p.contains("__shard"), "per-shard window key missing:\n" + p)
  }

  test("rate sampling is a pure scan-stage filter") {
    // the keep decision must run inside the scan: no Exchange except
    // the output ORDER BY, no join, no window
    val p = plan("pl_sample_rate")
    assert(p.contains("Filter"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"$exchanges exchanges (want <=1, only the output sort):\n$p")
  }

  test("semantic-dedup apply anti-joins without a forced broadcast hint") {
    // The removal set is data-dependent (near-dups can be 10-50% of all
    // doc ids at crawl scale), so the join strategy must be left to AQE:
    // assert the LeftAnti shape, and that no broadcast HINT is pinned in
    // the logical plan. Whether AQE then picks broadcast (it will at
    // sf0.001) is a runtime size decision, not a gate.
    val df = SparkEntry.queries("pl_emb_dedup_apply")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), "removal must be a LeftAnti join:\n" + p)
    val logical = df.queryExecution.analyzed.toString
    assert(!logical.toLowerCase.contains("broadcast"),
      "forced broadcast hint on a data-dependent removal set:\n" + logical)
  }

  test("cc loop round shuffles exactly at the loop width, never full-width") {
    // nearDupClusters carries its shuffle width in-plan via
    // repartition(loopParts, key) — the join and groupBy must REUSE that
    // hash partitioning instead of inserting their own spark.sql
    // .shuffle.partitions-wide exchanges (the r5/r6 concern: a conf-set
    // leaked across queries; an implicit exchange would be 32-wide here).
    import org.apache.spark.sql.functions.col
    val loopParts = 7 // distinctive: != default parallelism, != 32
    val edges = spark.range(0, 500).selectExpr("id as src", "(id + 1) % 500 as dst")
    val labels = spark.range(0, 500).select(col("id"), col("id").as("label"))
    val round = graft.operators.Dedup.ccRound(edges, labels, loopParts)
    round.collect()
    // the adaptive plan prints Final + Initial; gate on the final only
    val full = round.queryExecution.executedPlan.toString
    val p = full.split("== Initial Plan ==")(0)
    val widths = """hashpartitioning\([^)]*, (\d+)\)""".r
      .findAllMatchIn(p).map(_.group(1).toInt).toSeq
    assert(widths.nonEmpty, "no hash partitioning in the cc round plan:\n" + p)
    assert(widths.forall(_ == loopParts),
      s"shuffle width escaped the loop setting (widths=$widths, want all $loopParts):\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 3,
      s"$shuffles shuffle exchanges per cc round (want <=3, the explicit repartitions):\n$p")
  }

  test("keyword search is a shuffle-free scan into a top-k heap") {
    val p = plan("pl_search_tf")
    assert(p.contains("TakeOrderedAndProject"), "search must end in a top-k heap:\n" + p)
    assert(!p.contains("Exchange"), "keyword scoring must not shuffle:\n" + p)
    assert(!p.contains("Join"), "keyword scoring must not join:\n" + p)
  }

  test("audio stats and frame sampling stay in the scan stage") {
    // both are per-row kernels/Column logic: the only exchange allowed
    // is the presentation sort, and neither may join or aggregate
    for (q <- Seq("pl_multimodal_audio", "pl_multimodal_frames")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 1, s"$q: $exchanges exchanges (want <=1, the sort):\n$p")
      assert(!p.contains("Join"), s"$q must not join:\n$p")
      assert(!p.contains("HashAggregate"), s"$q must not aggregate:\n$p")
    }
  }

  test("sketch profile partial-aggregates the sketches map-side") {
    // HLL registers and quantile summaries must combine BEFORE the
    // shuffle — per-group constant-size state, never rows — so the only
    // data crossing the wire is |sources| sketch blobs
    val df = SparkEntry.queries("pl_profile_sketch")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("partial_approx_count_distinct"), "HLL not map-side combined:\n" + p)
    assert(p.contains("partial_percentile_approx"), "quantile sketch not map-side combined:\n" + p)
    val shuffles = "Exchange".r.findAllIn(p).size
    // r8 contract query: sketch-side partial-agg shuffle + the exact
    // side's count-distinct expansion (2) + its agg shuffle + the
    // presentation sort; the sketch/exact join itself must stay
    // broadcast (|sources| rows), never a corpus shuffle
    assert(shuffles <= 5, s"$shuffles exchanges in sketch profile (want <=5):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "sketch/exact contract join must broadcast the bounded side:\n" + p)
  }

  test("temperature sampling joins the rate table unhinted, corpus unshuffled") {
    val df = SparkEntry.queries("pl_sample_temperature")(spark, dir)
    // rates are data-dependent: no broadcast hint may be pinned; AQE
    // decides (and picks broadcast for the tiny per-source frame)
    val logical = df.queryExecution.analyzed.toString
    assert(!logical.toLowerCase.contains("broadcast"),
      "forced broadcast hint on the rate table:\n" + logical)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the only SinglePartition exchange is the per-source rate frame's
    // whole-frame window (bounded by source cardinality, not corpus)
    val singles = "Exchange SinglePartition".r.findAllIn(p).size
    assert(singles == 1, s"$singles SinglePartition exchanges (want 1, the rate frame):\n$p")
    // the keep decision travels with the join, in-plan
    assert(p.contains("% 1000"), "md5 keep decision missing from the executed plan:\n" + p)
  }

  test("contamination fraction left-joins and partial-counts before its shuffle") {
    val df = SparkEntry.queries("pl_contamination_frac")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("LeftOuter"), "zero-overlap docs need a LEFT join:\n" + p)
    assert(p.contains("partial_count"), "per-doc counts not map-side combined:\n" + p)
    val logical = df.queryExecution.analyzed.toString
    assert(!logical.toLowerCase.contains("broadcast"),
      "forced broadcast hint on the benchmark shingle set:\n" + logical)
  }

  test("top-tokens partial-aggregates before the shuffle and heap-sorts") {
    val df = SparkEntry.queries("pl_profile_top_tokens")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("partial_count"), "token counts not map-side combined:\n" + p)
    assert(p.contains("TakeOrderedAndProject"), "top-k must be a heap, not a sort:\n" + p)
  }

  test("diversity sample assigns cells in the scan stage, prunes per-cell") {
    val df = SparkEntry.queries("pl_sample_diverse")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Generate"), "explode in cell assignment:\n" + p)
    val joins = "Join".r.findAllIn(p).size
    assert(joins == 0, s"cell assignment must not join ($joins joins):\n$p")
    assert(p.contains("WindowGroupLimit"), "per-cell quota must prune eagerly:\n" + p)
  }

  test("funnel is one shuffle of the event log, no per-step self-joins") {
    val df = SparkEntry.queries("pl_funnel")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Join"), "funnel must not self-join per step:\n" + p)
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1,
      s"$hashShuffles hash exchanges in the funnel (want 1, the user grouping):\n$p")
  }

  test("shuffle-shard is one exchange with per-shard windows, no global sort") {
    import org.apache.spark.sql.functions.col
    val df = graft.operators.Curation.shuffleShards(
      graft.Tables(spark, dir, "documents"), "doc_id", 8)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"$shuffles hash exchanges (want 1, the shard key):\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      "global sort leaked into shuffle-shard:\n" + p)
    assert(!p.contains("Exchange SinglePartition"),
      "single-partition window leaked into shuffle-shard:\n" + p)
  }

  test("perplexity buckets assign by broadcast thresholds, no per-language sort") {
    val df = graft.operators.TextAnalysis.perplexityBuckets(
      graft.Tables(spark, dir, "documents"), "doc_id", "text", "lang")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the bucket label must come from a threshold comparison, not an
    // ntile()/row_number() window — a per-language window sorts each
    // whole language partition on one task at 100 TB
    assert(!p.contains("Window"), "window function leaked into bucketing:\n" + p)
    assert(!p.contains("Exchange rangepartitioning"),
      "global sort leaked into bucketing:\n" + p)
    // the |languages|-row threshold frame joins back as a broadcast
    assert(p.contains("BroadcastHashJoin"), "threshold join not broadcast:\n" + p)
    graft.operators.Dedup.releaseAll()
  }

  test("mixture realization is scan-stage expansion over a broadcast plan") {
    val df = graft.operators.Curation.realizeMixture(
      graft.Tables(spark, dir, "documents"), "source", "doc_id", "text",
      budgetTokens = 100000L, alpha = 0.5)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the |sources|-row plan joins back as a broadcast; the epoch
    // expansion is a Generate in the scan stage, not a shuffle
    assert(p.contains("BroadcastHashJoin"), "plan join not broadcast:\n" + p)
    assert(p.contains("Generate explode"), "epoch expansion missing:\n" + p)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    // the only hash exchange is the plan's own per-source aggregate
    assert(shuffles <= 1, s"$shuffles hash exchanges (want <=1):\n$p")
  }

  test("bucketed tables join exchange-free on the bucket key") {
    import org.apache.spark.sql.functions.col
    val o = graft.Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = graft.Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    // a previous JVM's warehouse dir outlives the in-memory catalog:
    // drop both layers or saveAsTable fails with LOCATION_ALREADY_EXISTS
    for (t <- Seq("bkt_orders", "bkt_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    }
    graft.operators.Bucketing.writeBucketed(o, "bkt_orders", "o_orderkey", 8)
    graft.operators.Bucketing.writeBucketed(li, "bkt_lineitem", "l_orderkey", 8)
    // merge hint: keep the strategy a sort-merge join so the gate tests
    // the layout (broadcast would trivially avoid the exchange at this SF)
    val joined = spark.table("bkt_orders").hint("merge")
      .join(spark.table("bkt_lineitem"), col("o_orderkey") === col("l_orderkey"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("SortMergeJoin"), "expected a sort-merge join:\n" + p)
    assert(!p.contains("Exchange"),
      "bucketed layout must satisfy the join distribution without a shuffle:\n" + p)
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      "scan did not recognize the bucketed layout:\n" + p)
  }

  test("cell-partitioned embedding layout prunes partitions on the IVF probe") {
    // the 100 TB IVF layout: cells are low-cardinality (nlist), so
    // they become WRITE PARTITIONS — a probe filtering cell IN (...)
    // must prune at the file listing, reading only the probed dirs
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables(spark, dir, "embeddings")
    val cells = graft.operators.Similarity.diversitySample(
      emb, "vec_id", "embedding", 8, Int.MaxValue) // (vec_id, cell), full assignment
    val path = "/tmp/graft_ivf_cells"
    cells.join(emb, "vec_id").write.mode("overwrite")
      .partitionBy("cell").parquet(path)
    // cell ids are the seed rows' vec_ids — probe two real ones
    val probed = cells.select("cell").distinct()
      .orderBy("cell").limit(2).collect().map(_.getLong(0))
    val probe = spark.read.parquet(path).filter(col("cell").isin(probed: _*))
    probe.collect()
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") &&
      """PartitionFilters: \[[^\]]*cell""".r.findFirstIn(p).isDefined,
      "cell filter did not reach the partition pruning stage:\n" + p)
    // and only the probed cells' rows surface (partition values read
    // back int-inferred from directory names)
    assert(probe.select("cell").distinct().collect()
      .map(_.getAs[Number](0).longValue()).toSet == probed.toSet)
  }

  test("ivf ANN assigns cells in the scan stage and ends in top-k") {
    val df = SparkEntry.queries("pl_emb_ann_ivf")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // nearest-cell argmax is a scan-stage expression: no join, no
    // explode, no shuffle before the cell filter
    assert(!p.contains("Generate"), "explode in IVF assignment:\n" + p)
    assert(p.contains("TakeOrderedAndProject"), "IVF must end in a top-k heap:\n" + p)
    val joins = "Join".r.findAllIn(p).size
    assert(joins == 0, s"IVF assignment must not join ($joins joins):\n$p")
  }

  test("batch ANN: probes broadcast against the corpus, top-k prunes map-side") {
    import org.apache.spark.sql.functions.col
    val emb = Tables(spark, dir, "embeddings")
    val probes = operators.Similarity.probeRows(emb, "vec_id", "embedding", 5)

    // LSH batch: the probe frame must reach the corpus as a broadcast
    // (hash join on the bucket key — the corpus itself must NOT
    // shuffle to meet 5 probe rows), and the per-probe top-k must be a
    // WindowGroupLimit (map-side ≤k per probe per partition) so the
    // one required shuffle carries O(probes·k·partitions), not the
    // bucket-collision candidates
    val lsh = operators.Similarity.lshTopKBatch(
      emb, "vec_id", "embedding", probes, 3, nPlanes = 4)
    lsh.collect()
    val pLsh = lsh.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(pLsh.contains("BroadcastHashJoin"), "probe frame not broadcast:\n" + pLsh)
    assert(pLsh.contains("WindowGroupLimit"), "per-probe top-k not map-side limited:\n" + pLsh)
    val corpusShuffles = "Exchange hashpartitioning".r.findAllIn(pLsh).size
    assert(corpusShuffles <= 1,
      s"corpus must shuffle at most once (window repartition), got $corpusShuffles:\n$pLsh")

    // IVF batch with a precomputed quantizer: same contract, and the
    // probed-cell join must also be the broadcast side
    val seeded = Some(operators.Similarity.ivfSeedIndex(emb, "vec_id", "embedding", 4))
    val ivf = operators.Similarity.ivfTopKBatch(
      emb, "vec_id", "embedding", probes, 3, nlist = 4, nprobe = 2, seeded = seeded)
    ivf.collect()
    val pIvf = ivf.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(pIvf.contains("BroadcastHashJoin"), "probe-cell frame not broadcast:\n" + pIvf)
    assert(pIvf.contains("WindowGroupLimit"), "per-probe top-k not map-side limited:\n" + pIvf)

    // exact batch ground truth: the probe cross join must broadcast
    // (BroadcastNestedLoopJoin), never a shuffled cartesian
    val bf = operators.Similarity.bruteForceTopKBatch(
      emb, "vec_id", "embedding", probes, 3)
    bf.collect()
    val pBf = bf.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(pBf.contains("BroadcastNestedLoopJoin") || pBf.contains("BroadcastHashJoin"),
      "exact batch must broadcast the probe set:\n" + pBf)
    assert(!pBf.contains("CartesianProduct"), "shuffled cartesian in exact batch:\n" + pBf)
  }

  test("DSIR scoring broadcasts the bounded LM table and draws via a top-k heap") {
    import org.apache.spark.sql.functions.col
    val df = operators.Curation.importanceResample(
      Tables(spark, dir, "documents"), "doc_id", "text",
      col("source").isin("src0", "src1"), n = 20, vocab = 64)
    df.collect() // AQE must finalize before the executed plan is judged
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the token->logratio join must come to the corpus as a broadcast:
    // the LM table is vocab-bounded, the exploded token stream is
    // corpus-sized and must not shuffle to meet it
    assert(p.contains("BroadcastHashJoin"), "LM table not broadcast:\n" + p)
    // the draw is top-n, never a global sort of all scored docs
    assert(p.contains("TakeOrderedAndProject"), "draw is not a top-k heap:\n" + p)
    assert(!p.contains("Exchange rangepartitioning"), "global sort in the draw:\n" + p)
  }

  test("classifier scoring is pure scan work: no join, no exchange at all") {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, dir, "documents")
    val (w, b) = operators.TextAnalysis.trainClassifier(
      docs, "doc_id", "text", (col("lang") === "en").cast("double"),
      buckets = 64, iters = 1, lr = 0.5)
    val scored = operators.TextAnalysis.scoreClassifier(docs, "doc_id", "text", w, b)
    scored.collect()
    val p = scored.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the margin kernel bakes the weights in as a literal and computes
    // the whole per-doc margin in the scan: any Join or Exchange here
    // would put a shuffle on the 100 TB scoring pass
    assert(!p.contains("Join"), "scoring should not join a weight table:\n" + p)
    assert(!p.contains("Exchange"), "scoring must be exchange-free:\n" + p)
  }

  test("substring dedup: hash-only shuffle, partial agg, anti-join removal") {
    // The gram-frequency shuffle must carry md5 hashes (16 bytes/gram),
    // never gram TEXT — at crawl scale the gram stream is ~n_tokens rows
    // per doc and a text-keyed shuffle would be k× wider. Gate: the
    // aggregate is two-phase (partial_count before the exchange) and no
    // concat/array_join of the token array appears below the first
    // aggregate's exchange... simplest robust proxy: the grouping key is
    // the md5 column and partial aggregation exists in-plan.
    val p = plan("pl_dedup_substring")
    assert(p.contains("partial_count") || p.contains("partial"),
      "gram frequency must partial-aggregate map-side:\n" + p)
    assert(p.contains("LeftAnti"), "span removal must be a LeftAnti join:\n" + p)
    // removal set is data-dependent: no forced broadcast hint
    val logical = SparkEntry.queries("pl_dedup_substring")(spark, dir)
      .queryExecution.analyzed.toString
    assert(!logical.toLowerCase.contains("broadcasthint"),
      "forced broadcast on a data-dependent removal set:\n" + logical)
  }

  test("hard negatives broadcast the anchor set and cut top-k map-side") {
    val df = SparkEntry.queries("pl_emb_hard_negatives")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // 20 anchor rows must reach the corpus as a broadcast nested-loop
    // (label-inequality join), never a shuffled cartesian
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "anchor set not broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), "shuffled cartesian:\n" + p)
    // per-anchor top-k prunes to <=k per partition before the shuffle
    assert(p.contains("WindowGroupLimit"), "top-k not map-side limited:\n" + p)
  }

  test("BPE pair counting partial-aggregates before its shuffle") {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, dir, "documents")
    val counts = operators.Tokenizer.pairCounts(
      operators.Tokenizer.wordTypes(docs, "text"))
    val p = counts.queryExecution.executedPlan.toString
    // both groupBys (word types, then pair counts) must combine
    // map-side: the exploded pair stream shrinks to |distinct pairs|
    // per partition before any wire transfer
    assert("partial_count|partial_sum".r.findAllIn(p).nonEmpty,
      "no partial aggregation before shuffle:\n" + p)
    // the heaviest-first output is a sort of the |pairs|-sized
    // aggregate, never of the exploded stream: the pair aggregate must
    // sit ABOVE the pair explode (plans print top-down)
    val aggIdx = p.indexOf("HashAggregate(keys=[pair")
    val genIdx = p.indexOf("Generate explode(filter")
    assert(aggIdx >= 0 && genIdx >= 0 && aggIdx < genIdx,
      "pair explode must feed the pair aggregate:\n" + p)
  }

  test("Lloyd means pass evaluates the cell assignment below the explode") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // regression gate for the Generate-barrier fix: a select mixing
    // cellAssign with posexplode plans the nlist-branch argmax in the
    // Project ABOVE the Generate — re-evaluated once per exploded
    // DIMENSION (64x redundant at nlist=64; minutes instead of seconds
    // at the sf1 smoke). The barrier keeps the argmax (the compiled
    // cellassign kernel) BELOW the Generate: in the top-down plan
    // print, the Generate line must come first.
    val emb = Tables(spark, dir, "embeddings")
    val proj = emb.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("__v"))
    val cents = operators.Similarity.kmeansCentroids(proj, "vec_id", "__v", 8, 1)
    val means = proj
      .select(operators.Similarity.cellAssign(col("__v"), cents).as("cell"), col("__v"))
      .select(col("cell"), posexplode(col("__v")))
      .groupBy("cell", "pos").agg(avg("col").as("m"))
    val p = means.queryExecution.executedPlan.toString
    val gen = p.indexOf("Generate posexplode")
    val argmax = p.toLowerCase.indexOf("cellassign")
    assert(gen >= 0 && argmax >= 0 && gen < argmax,
      "cell assignment must sit below the Generate:\n" + p)
    operators.Dedup.releaseAll()
  }

  test("semDeDup pairs only within learned cells, corpus never cross-joins") {
    val df = SparkEntry.queries("pl_emb_semdedup")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the pair stage is an equi-join on the cell id — a CartesianProduct
    // would mean the cluster blocking failed and the corpus went O(n^2)
    assert(!p.contains("CartesianProduct"), "all-pairs cross join:\n" + p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "expected an equi-join on cell:\n" + p)
  }

  test("repeated spans: island merge windows partition by doc id only") {
    // The gaps-and-islands merge must shuffle once on the doc id (grams
    // of one doc co-locate) — a Window without PARTITION BY would pull
    // the whole gram stream onto one task at 100 TB.
    val p = plan("pl_substring_spans")
    assert(p.contains("Window"), "span merge should use window functions:\n" + p)
    // every Window operator line must carry a partition spec (printed as
    // windowspecdefinition(doc_id#..., p#... ASC ...)); a global window
    // prints windowspecdefinition(p#... ASC) with no partition column
    val specs = """windowspecdefinition\(([^)]*)\)""".r.findAllMatchIn(p).map(_.group(1)).toList
    assert(specs.nonEmpty, "expected windowspecdefinition in plan:\n" + p)
    specs.foreach(s => assert(s.contains("doc_id"),
      s"window not partitioned by doc id: $s\n" + p))
  }

  test("winnowing: per-doc windows, no cartesian, overlap joins on the fp hash") {
    // fingerprint selection must window per document (the rolling min
    // co-locates one doc's grams; a global window is a one-task funnel)
    val fp = plan("pl_fingerprint_winnow")
    val specs = """windowspecdefinition\(([^)]*)\)""".r.findAllMatchIn(fp).map(_.group(1)).toList
    assert(specs.nonEmpty, "expected windowspecdefinition in plan:\n" + fp)
    specs.foreach(s => assert(s.contains("doc_id"),
      s"winnow window not partitioned by doc id: $s\n" + fp))
    // the pair report must meet candidates on the fingerprint-hash
    // equi-join — never a cartesian/broadcast-nested-loop pair stage.
    // r16: the pair query runs inside viaPersisted (the fingerprint
    // index is persisted once instead of re-evaluated per consumer), so
    // the join shape lives in the retained stage's inner execution, not
    // in the returned frame's flattened plan
    val ovDf = SparkEntry.queries("pl_winnow_overlap")(spark, dir)
    val inner = graft.operators.Dedup.innerExecutionsFor(ovDf)
      .map(_.executedPlan.toString)
    val ov = (inner :+ ovDf.queryExecution.executedPlan.toString).mkString("\n")
    assert(!ov.contains("CartesianProduct"), "cartesian in overlap plan:\n" + ov)
    assert(!ov.contains("BroadcastNestedLoopJoin"), "BNLJ in overlap plan:\n" + ov)
    assert(ov.contains("SortMergeJoin") || ov.contains("ShuffledHashJoin")
      || ov.contains("BroadcastHashJoin"), "no equi-join in overlap plan:\n" + ov)
  }

  test("MAD outliers broadcast the per-group stat tables, no corpus sort") {
    val df = SparkEntry.queries("pl_stats_outliers")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the |groups|-row med/mad tables join as broadcasts; the corpus
    // side must never shuffle for them
    assert(p.contains("BroadcastHashJoin"), "stat joins should broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("vocab growth: first-occurrence aggregate is partial+final, windows per source") {
    val df = SparkEntry.queries("pl_vocab_growth")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the (source, token) min-rank aggregate must partial-aggregate
    // before its shuffle (map-side combine collapses repeated tokens)
    assert(p.contains("partial_min") || p.contains("partial_count"),
      "first-occurrence agg should be two-phase:\n" + p)
    val specs = """windowspecdefinition\(([^)]*)\)""".r.findAllMatchIn(p).map(_.group(1)).toList
    assert(specs.nonEmpty && specs.forall(_.contains("source")),
      s"growth windows must partition by source: $specs\n" + p)
  }

  test("dialect windows: Window operator, pushed scan filter, no cartesian") {
    val p = plan("ql_window")
    assert(p.contains("Window"), "dialect OVER should plan a Window operator:\n" + p)
    // the WHERE o_orderkey < 500 reaches the parquet scan despite the
    // window stage above it
    assert(p.contains("PushedFilters: [") && p.contains("LessThan(o_orderkey"),
      "scan filter should push below the window:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    // QUALIFY plans as a filter over the SAME single scan, not a rescan
    val q = plan("ql_qualify")
    assert(q.contains("Window") && q.contains("Filter"), q)
    assert("FileScan parquet".r.findAllMatchIn(q).size == 1,
      "QUALIFY must not rescan the table:\n" + q)
  }

  test("EXISTS and correlated IN plan as broadcast semi/anti joins, never loops") {
    for (q <- Seq("ql_exists_subquery", "ql_corr_in_subquery")) {
      val p = plan(q)
      assert(p.contains("LeftSemi"), s"$q missing semi join:\n" + p)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q degenerated to a loop join:\n" + p)
    }
    val anti = plan("ql_not_exists_subquery")
    assert(anti.contains("LeftAnti"), "NOT EXISTS missing anti join:\n" + anti)
  }

  test("hybrid RRF ends in bounded top-k heaps, no global sort of the corpus") {
    val df = SparkEntry.queries("pl_search_hybrid_rrf")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // both ranking arms cut with TakeOrderedAndProject before fusion
    assert("TakeOrderedAndProject".r.findAllMatchIn(p).size >= 2,
      "missing top-k heaps:\n" + p)
    graft.operators.Dedup.releaseAll()
  }

  test("dedup-aware split md5-assigns in the scan stage after one cluster join") {
    val df = SparkEntry.queries("pl_split_dedup_aware")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "cartesian in split plan:\n" + p)
    // the split label is computed from md5(cluster_id) inline — no
    // extra exchange beyond the pair mine + cc + label join
    assert(p.contains("md5"), "split hash not inline:\n" + p)
    graft.operators.Dedup.releaseAll()
  }

  test("PIVOT is one partial+final aggregate, UNPIVOT one generate — no joins") {
    val pv = plan("ql_pivot")
    assert(pv.contains("HashAggregate") && !pv.contains("Join"),
      "pivot should be a single aggregation:\n" + pv)
    val up = plan("ql_unpivot")
    assert(up.contains("Expand") || up.contains("Generate"),
      "unpivot should expand rows:\n" + up)
    assert(!up.contains("Join"), "unpivot must not join:\n" + up)
  }

  test("prototype pruning broadcasts centroids/sizes and cuts per cell") {
    val df = SparkEntry.queries("pl_emb_prototype_prune")(spark, dir)
    df.collect()
    // the result frame is cached behind a flattened plan (r13) — the
    // shape gates below audit THIS frame's inner execution (r15:
    // per-call map keyed by the flattened RDD, slot deleted)
    val execs = graft.operators.Dedup.innerExecutionsFor(df)
    assert(execs.nonEmpty, "no inner execution registered for the frame")
    val p = execs.head.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "cartesian in prune plan:\n" + p)
    // centroid table and cell-size table join as broadcasts — the
    // corpus side never shuffles for either join
    assert(p.contains("BroadcastHashJoin"), "centroid/size joins should broadcast:\n" + p)
    // the keep cut is a rank window partitioned by cell
    val specs = """windowspecdefinition\(([^)]*)\)""".r.findAllMatchIn(p).map(_.group(1)).toList
    assert(specs.nonEmpty && specs.forall(_.contains("cell")),
      s"prune window not partitioned by cell: $specs\n" + p)
    graft.operators.Dedup.releaseAll()
  }

  test("LATERAL rewrites to joins — never a cartesian or per-row rescan") {
    val gs = new graft.engine.GraftSession(spark)
    gs.registerTable("customer", spark.read.parquet(s"$dir/customer.parquet"))
    gs.registerTable("orders", spark.read.parquet(s"$dir/orders.parquet"))
    // top-k lateral: ONE equi-join + ONE rank window per outer row
    val df = gs.sql(
      """SELECT c.c_custkey, l.price FROM customer c,
        |LATERAL (SELECT o_totalprice AS price FROM orders
        |         WHERE o_custkey == c.c_custkey
        |         ORDER BY price DESC, o_orderkey LIMIT 2) l""".stripMargin)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "cartesian in lateral plan:\n" + p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      "lateral should be an equi-join:\n" + p)
    val wins = """windowspecdefinition\(([^)]*)\)""".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(wins.nonEmpty && wins.forall(_.contains("__lat_oid")),
      s"lateral window not per-outer-row: $wins\n" + p)
    // aggregate lateral: partial+final hash agg, still an equi-join
    val df2 = gs.sql(
      """SELECT c.c_custkey, l.n FROM customer c,
        |LATERAL (SELECT count(*) AS n FROM orders
        |         WHERE o_custkey == c.c_custkey) l""".stripMargin)
    df2.collect()
    val p2 = df2.queryExecution.executedPlan.toString
    assert(!p2.contains("CartesianProduct"), p2)
    assert(p2.contains("HashAggregate"), p2)
  }

  test("dialect ASOF JOIN plans as union + window — zero join operators") {
    val gs = new graft.engine.GraftSession(spark)
    gs.registerTable("events", spark.read.parquet(s"$dir/events.parquet"))
    val df = gs.sql(
      """SELECT l.event_id, sval
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type == "click") AS l
        |ASOF JOIN (SELECT user_id AS uid, ts AS sts, value AS sval
        |           FROM events WHERE event_type == "signup") AS r
        |  ON l.user_id == uid AND l.ts >= sts""".stripMargin)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "ASOF should have NO join operator:\n" + p)
    assert(p.contains("Union"), p)
    assert(p.contains("Window"), p)
    // one exchange per union branch feeds the window — every row moves
    // exactly once; no second shuffle after the window
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected at most one shuffle per side, saw $exchanges:\n" + p)
  }

  test("WITH-tail knobs drive execution: broadcast hint and repartition") {
    val gs = new graft.engine.GraftSession(spark)
    gs.registerTable("lineitem", spark.read.parquet(s"$dir/lineitem.parquet"))
    gs.registerTable("nation", spark.read.parquet(s"$dir/nation.parquet"))
    // broadcast = "n" pins the hint on the nation side regardless of
    // size estimation — the logical plan carries ResolvedHint
    val df = gs.sql(
      """SELECT l.l_orderkey, n.n_name FROM lineitem l
        |JOIN nation n ON l.l_suppkey % 25 == n.n_nationkey
        |WITH broadcast = "n", repartition = 7""".stripMargin)
    val logical = df.queryExecution.optimizedPlan.toString
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("ResolvedHint") || logical.contains("broadcast"),
      "broadcast hint missing:\n" + analyzed)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      df.queryExecution.executedPlan.toString)
    assert(df.rdd.getNumPartitions == 7, s"repartition=7 not applied: ${df.rdd.getNumPartitions}")
    // repartition_by hash-partitions on the key; coalesce caps width
    val df2 = gs.sql(
      """SELECT l_orderkey, l_quantity FROM lineitem
        |WITH repartition_by = "l_orderkey", repartition = 5""".stripMargin)
    assert(df2.rdd.getNumPartitions == 5)
    assert(df2.queryExecution.executedPlan.toString.contains("hashpartitioning(l_orderkey"),
      df2.queryExecution.executedPlan.toString)
    val df3 = gs.sql("SELECT l_orderkey FROM lineitem WITH coalesce = 2")
    assert(df3.rdd.getNumPartitions <= 2)
    // unknown keys are carried and ignored (reference property-bag parity)
    assert(gs.sql("""SELECT count(*) AS n FROM nation WITH distributed = true, node_ct = 10""")
      .collect().head.getLong(0) == 25L)
  }

  test("quantified ANY is one broadcast one-row aggregate, no row-join") {
    val df = SparkEntry.queries("ql_quant_any")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the subquery collapses to a 1-row min/max/count aggregate that
    // BROADCASTS; the outer side never shuffles for it
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), "row-shaped join for a 1-row aggregate:\n" + p)
    // the membership shape (= ANY ≡ IN) must stay a real semi join
    val gs = new graft.engine.GraftSession(spark)
    gs.registerTable("orders2", spark.read.parquet(s"$dir/orders.parquet"))
    val semi = gs.sql(
      """SELECT o_orderkey FROM orders2
        |WHERE o_totalprice = ANY (SELECT o_totalprice FROM orders2 WHERE o_orderkey < 10)""".stripMargin)
    assert(semi.queryExecution.executedPlan.toString.contains("LeftSemi"),
      semi.queryExecution.executedPlan.toString)
  }

  test("aggregate FILTER plans as one partial+final agg, no extra scan") {
    val df = SparkEntry.queries("ql_agg_filter")(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // count detail headers "(n) <op>" — the tree section repeats them
    def ops(name: String) =
      p.split("\n").count(_.matches(s"\\(\\d+\\) $name.*"))
    // one scan feeds all four aggregates (filtered + unfiltered)
    assert(ops("Scan parquet") == 1, p)
    assert(ops("HashAggregate") == 2, p) // partial + final
  }

  test("named WINDOW references collapse to one Window operator") {
    val df = SparkEntry.queries("ql_named_window")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // three OVER w references, ONE shared spec → exactly one Window
    // operator and one exchange for its partition
    assert(p.split("\n").count(_.contains("- Window [")) == 1, p)
  }

  test("correlated quantified plans one per-key aggregate + one join (r12)") {
    // the contract of the lowering: ONE grouped min/max/count aggregate
    // of the subquery joined back on the correlation key — never a
    // cartesian, never a row-count-shaped rescan
    for (q <- Seq("ql_quant_any_corr", "ql_quant_all_corr")) {
      val p = plan(q)
      assert(p.contains("HashAggregate"), s"$q: no aggregate\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: cartesian\n$p")
      val joins = p.split("\n").count(l =>
        l.contains("HashJoin") || l.contains("SortMergeJoin"))
      assert(joins == 1, s"$q: expected 1 join, saw $joins\n$p")
    }
    // grouped correlated IN: the same — one aggregate, one semi join
    val p = plan("ql_corr_in_having")
    assert(p.contains("HashAggregate") && !p.contains("CartesianProduct"), p)
  }

  test("scalar-subquery / EXISTS statement BUILD launches zero jobs (r12)") {
    // the single-row guard is IN-PLAN (count + raise_error inside the
    // broadcast aggregate), so building a WHERE with N scalar
    // subqueries and uncorrelated EXISTS probes runs no driver job
    // until the query itself runs
    val gs = new graft.engine.GraftSession(spark)
    gs.registerTable("orders3", spark.read.parquet(s"$dir/orders.parquet"))
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = gs.sql(
        """SELECT o_orderkey FROM orders3
          |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders3)
          |  AND o_totalprice < (SELECT max(o_totalprice) FROM orders3)
          |  AND EXISTS (SELECT 1 FROM orders3 WHERE o_orderkey < 5)""".stripMargin)
      Thread.sleep(300) // let any stray job-start events surface
      assert(jobs == 0, s"statement build launched $jobs jobs")
      assert(df.count() > 0) // …and the guarded plan still runs
      // the violation raises AT RUN TIME with the preserved message
      val multi = gs.sql(
        "SELECT o_orderkey FROM orders3 WHERE o_totalprice > (SELECT o_totalprice FROM orders3)")
      val e = intercept[Exception](multi.collect())
      assert(e.getMessage.contains("scalar subquery returned more than one row"),
        e.getMessage)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("SELECT/ORDER BY scalar subqueries + session.explain launch zero jobs (r13)") {
    // r12 left SELECT-position uncorrelated scalars EAGER (a
    // limit(2).collect() per subquery at statement build); r13 routes
    // them through the same lazy in-plan broadcast single-row guard as
    // WHERE — so building AND explaining a statement with scalar
    // subqueries in the select list and ORDER BY runs no driver job,
    // making `session.explain` a pure plan-audit surface
    val gs = new graft.engine.GraftSession(spark)
    gs.registerTable("orders13", spark.read.parquet(s"$dir/orders.parquet"))
    gs.registerTable("customer13", spark.read.parquet(s"$dir/customer.parquet"))
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val text =
        """SELECT c_custkey,
          |  (SELECT max(o_totalprice) FROM orders13) AS mx,
          |  (SELECT min(o_totalprice) FROM orders13) AS mn
          |FROM customer13
          |ORDER BY (SELECT avg(o_totalprice) FROM orders13) + c_custkey
          |LIMIT 5""".stripMargin
      val df = gs.sql(text)
      val planStr = gs.explain(text)
      Thread.sleep(300) // let any stray job-start events surface
      assert(jobs == 0, s"build + explain launched $jobs jobs")
      assert(planStr.contains("TakeOrderedAndProject"), planStr.take(400))
      assert(df.count() == 5) // …and the plan still runs
      // the single-row violation raises AT RUN TIME in SELECT position
      val multi = gs.sql(
        "SELECT (SELECT o_totalprice FROM orders13) AS v FROM customer13")
      val e = intercept[Exception](multi.collect())
      assert(e.getMessage.contains("scalar subquery returned more than one row"),
        e.getMessage)
      // explain refuses DML rather than executing it as a side effect
      val e2 = intercept[Exception](gs.explain("DELETE FROM orders13 WHERE 1 = 1"))
      assert(e2.getMessage.contains("query statements only"), e2.getMessage)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("AGGREGATE-path SELECT scalars are lazy too, and survive empty input (r14)") {
    // through r13 an aggregate statement pinned SELECT-position
    // uncorrelated scalars to a build-time limit(2).collect() (the
    // constant had to survive an empty input); r14 attaches the lazy
    // broadcast scalar to the POST-aggregate frame instead — the empty
    // input has already completed to its one global row there, so the
    // ANSI constant survives AND build/explain run zero driver jobs
    val gs = new graft.engine.GraftSession(spark)
    gs.registerTable("orders14", spark.read.parquet(s"$dir/orders.parquet"))
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val text =
        """SELECT count(*) AS n,
          |  count(*) + (SELECT max(o_totalprice) FROM orders14) AS nx,
          |  (SELECT min(o_totalprice) FROM orders14) AS mn
          |FROM orders14 WHERE o_totalprice < 0""".stripMargin
      val df = gs.sql(text)
      gs.explain(text)
      val grouped = gs.sql(
        """SELECT o_custkey, count(*) + (SELECT 5) AS c5
          |FROM orders14 GROUP BY o_custkey""".stripMargin)
      Thread.sleep(300)
      assert(jobs == 0, s"agg-statement build + explain launched $jobs jobs")
      // ANSI empty-input semantics: count over zero rows is 0, the
      // scalar still arrives (DuckDB: `0, NULL+…, min` — here the
      // filter keeps no rows but orders14 itself is non-empty, so the
      // subquery values are real numbers and nx = 0 + max)
      val r = df.collect()
      assert(r.length == 1, r.mkString(","))
      assert(r(0).getLong(0) == 0L, r(0).toString)
      assert(!r(0).isNullAt(1) && !r(0).isNullAt(2), r(0).toString)
      assert(grouped.count() > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("scalars INSIDE aggregate args attach pre-aggregate; FROM-less takes the literal probe (r15)") {
    // ADVICE r14 high: `sum(x + (SELECT 5))` must NOT marker-substitute
    // — the value is consumed per INPUT row, so it attaches on the
    // PRE-aggregate frame (a post-agg __pasq marker made extraAggNodes
    // build sum(x + __pasq_0) against a frame without the marker —
    // AnalysisException at build). And FROM-less statements
    // (`SELECT count(*), (SELECT 5)`) never reach the agg path's marker
    // attach, so they take the eager typed-literal probe.
    val gs = new graft.engine.GraftSession(spark)
    gs.registerTable("orders15", spark.read.parquet(s"$dir/orders.parquet"))
    // under-aggregate scalar, global aggregate
    val r1 = gs.sql(
      """SELECT sum(o_totalprice + (SELECT 5)) AS s5, sum(o_totalprice) AS s0
        |FROM orders15""".stripMargin).collect()
    assert(r1.length == 1)
    val n = gs.sql("SELECT count(*) AS n FROM orders15").collect()(0).getLong(0)
    assert(math.abs(r1(0).getDouble(0) - (r1(0).getDouble(1) + 5.0 * n)) < 1e-6,
      r1(0).toString)
    // under-aggregate scalar with GROUP BY, subquery over another table
    val r2 = gs.sql(
      """SELECT o_custkey, sum(o_totalprice + (SELECT min(o_totalprice) FROM orders15)) AS s
        |FROM orders15 GROUP BY o_custkey""".stripMargin)
    assert(r2.count() > 0)
    // under-aggregate scalar consumed inside an aggregate over an EMPTY
    // input: sum over zero rows is NULL regardless of the scalar (ANSI)
    val r3 = gs.sql(
      """SELECT count(*) AS n, sum(o_totalprice + (SELECT 5)) AS s
        |FROM orders15 WHERE o_totalprice < 0""".stripMargin).collect()
    assert(r3(0).getLong(0) == 0L && r3(0).isNullAt(1), r3(0).toString)
    // mixed: one under-agg scalar (pre-agg attach) + one bare scalar
    // (post-agg marker) in the same statement
    val r4 = gs.sql(
      """SELECT sum(o_totalprice + (SELECT 5)) AS a, (SELECT 7) AS b
        |FROM orders15""".stripMargin).collect()
    assert(r4(0).getLong(1) == 7L, r4(0).toString)
    // FROM-less: aggregate + scalar, and bare scalar (ADVICE r14 medium)
    val r5 = gs.sql("SELECT count(*) AS n, (SELECT 5) AS v").collect()
    assert(r5(0).getLong(0) == 1L && r5(0).getLong(1) == 5L, r5(0).toString)
    val r6 = gs.sql("SELECT (SELECT max(o_totalprice) FROM orders15) AS m").collect()
    assert(!r6(0).isNullAt(0))
  }

  test("boolean subqueries as values: joins on distinct keys, no rescan (r12)") {
    // EXISTS / IN in expression position lower to LEFT joins against
    // distinct-key (or per-key aggregated) frames — row cardinality is
    // preserved by construction and there is never a per-row rescan or
    // an unbounded cartesian; the only nested-loop shape allowed is
    // the broadcast ONE-ROW aggregate that carries IN's NULL-count
    // guard (and uncorrelated EXISTS/scalar probes)
    for (q <- Seq("ql_select_exists", "ql_select_in", "ql_where_or_subq")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: cartesian\n$p")
      assert(p.split("\n").count(_.contains("Join LeftOuter")) >= 1 ||
        p.contains("HashJoin"), s"$q: no join-based lowering\n$p")
      // any BroadcastNestedLoopJoin must be the 1-row guard broadcast:
      // its build side is an aggregate, never a table scan
      val bnl = p.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
      val aggs = p.split("\n").count(_.contains("HashAggregate"))
      assert(bnl == 0 || aggs > 0, s"$q: nested-loop without 1-row aggregate\n$p")
    }
  }
}
