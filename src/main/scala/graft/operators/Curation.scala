package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorExpressions

/** Corpus-curation operators for training-data pipelines: deterministic
  * quota sampling, benchmark decontamination, PII redaction. These sit
  * beside Dedup/TextAnalysis as the standard screens a 100 TB corpus
  * passes through before training.
  *
  * Everything is deterministic and engine-reproducible (md5-derived
  * pseudo-randomness, shared shingle formulations), so every operator
  * is DuckDB-oracle-gateable.
  */
object Curation {

  /** THE deterministic keep-decision bucket: first 8 hex chars of
    * md5(id) as an integer, mod 1000. Every sampler (batch and
    * streaming) and the DuckDB oracle twin
    * (`('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT % 1000`)
    * encode exactly this formula — ONE definition here so the
    * stream/batch equivalence specs and oracles cannot drift. */
  def md5Permill(idCol: Column): Column =
    conv(substring(md5(idCol.cast(StringType).cast(BinaryType)), 1, 8), 16, 10)
      .cast(LongType) % 1000

  /** Deterministic per-group quota sample: keep at most `k` rows per
    * group, chosen by a content-independent pseudo-random order (md5 of
    * the id) — the reproducible form of stratified downsampling used to
    * balance source mixtures.
    *
    * Scale: one shuffle on the group key; the window is a per-group
    * top-k (rank ≤ k ⇒ WindowGroupLimit prunes eagerly), no global
    * sort. Deterministic across runs AND engines — no RNG state. */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // rank on (id, group) only, then semi-join the winners back (r17,
    // guide §8): the old window over the full rows re-shuffled every
    // payload byte just to take the first k md5-ordered ids per group.
    // Same kept set; requires unique non-null ids, as the window's
    // determinism already did. AQE broadcasts the winner set when it
    // is small; corpus bytes never enter an exchange.
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast(StringType).cast(BinaryType)), col(idCol))
    val winners = df.select(col(idCol), col(groupCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col(idCol).as("__qid"))
    df.join(winners, col(idCol) === col("__qid"), "left_semi")
  }

  /** Benchmark decontamination: corpus documents sharing at least
    * `minShared` distinct word n-gram shingles with ANY benchmark
    * document. This is the screen run before training so eval sets
    * don't leak into the corpus.
    *
    * Scale: the benchmark side is tiny relative to the corpus — its
    * distinct shingle-hash set broadcasts; the corpus side explodes its
    * shingles once and semi-joins WITHOUT a shuffle of the corpus
    * (broadcast hash join), then aggregates hit counts per document.
    * No pairwise stage anywhere. */
  def contaminated(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int, minShared: Int): DataFrame = {
    val benchShingles = benchmark
      .select(explode(VectorExpressions.word_shingle_hashes(col(benchTextCol), n)).as("s"))
      .distinct()
    val corpusShingles = corpus.select(col(idCol),
        explode(VectorExpressions.word_shingle_hashes(col(textCol), n)).as("s"))
    corpusShingles.join(broadcast(benchShingles), "s")
      .groupBy(idCol)
      .agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= minShared)
  }

  /** Bloom-filter decontamination: drop every corpus row whose key is
    * in the blocklist, testing a compact Bloom filter in the SCAN stage
    * instead of anti-joining the corpus. Catalyst's own
    * `BloomFilterAggregate` / `BloomFilterMightContain` (the pair Spark
    * uses for runtime join filters) build and probe the filter, so the
    * probe is codegen'd.
    *
    * Semantics: NO false negatives — every blocklisted key is removed;
    * false positives over-remove harmless extra rows at ≈`fpp` rate,
    * the right trade for decontamination (never the reverse). Use the
    * exact anti-join ([[contaminated]] + a join) when over-removal is
    * unacceptable.
    *
    * Scale: the filter is `numBits/8` bytes regardless of corpus size
    * (~1.2 MB per million keys at 1% fpp) — one bounded driver
    * collect, embedded in the plan as a literal, evaluated per row in
    * the scan with zero shuffle of the corpus. The anti-join form
    * shuffles nothing either (broadcast) ONLY while the blocklist's
    * row form fits in executor memory; the bloom form stays flat to
    * ~10⁹ keys. */
  def decontaminateBloom(corpus: DataFrame, corpusKey: String,
      blocklist: DataFrame, blockKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    // Catalyst's bloom pair is not in the public registry (Spark uses it
    // for runtime join filters); expose it the same way the kernel suite
    // registers its expressions — the analyzer wraps the returned
    // AggregateFunction itself
    val reg = corpus.sparkSession.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "scala_udf")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val bytes = blocklist
      .select(call_function("graft_bloom_agg",
        xxhash64(col(blockKey).cast(StringType)), lit(expectedItems), lit(numBits)))
      .head().getAs[Array[Byte]](0)
    if (bytes == null) corpus // empty blocklist: nothing to remove
    else corpus.filter(!call_function("graft_bloom_might_contain",
      lit(bytes), xxhash64(col(corpusKey).cast(StringType))))
  }

  /** Deterministic train/val/test assignment: the first 8 hex chars of
    * md5(id) as an integer mod 1000, cut by cumulative per-mill
    * thresholds. Content- and order-independent, identical in any
    * engine — re-running the pipeline (or recomputing a single shard)
    * always lands each document in the same split, the property that
    * keeps eval sets stable across corpus rebuilds.
    *
    * Scale: pure Column, no shuffle — the split label materializes in
    * the scan stage and becomes a partition column on write. */
  def splitAssign(idCol: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.map(_._2).sum == 1000, "per-mill weights must sum to 1000")
    val bucket = md5Permill(idCol)
    val cuts = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    splits.zip(cuts).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), rest) => when(bucket < cut, name).otherwise(rest)
    }
  }

  /** Dedup-aware train/eval split: [[splitAssign]] hashes the near-dup
    * CLUSTER id, not the document id, so a document and its near
    * duplicates always land in the SAME split — the leakage
    * [[splitLeakage]] measures is zero by construction instead of
    * audited after the fact. Documents in no near-dup pair form their
    * own singleton cluster (hash of their own id — identical to plain
    * [[splitAssign]] for them, so adding dedup awareness never
    * reshuffles the unduplicated majority of the corpus).
    *
    * Scale: one LSH pair mine ([[Dedup.minHashLshPairs]], banded — no
    * all-pairs), a CC loop over the pair graph (orders of magnitude
    * smaller than the corpus), one left join of the cluster labels, and
    * a scan-stage md5 split — the same cost class as the leakage audit
    * itself. */
  def dedupAwareSplit(df: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Int)], shingleN: Int = 3, bands: Int = 32,
      rowsPerBand: Int = 4, threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.minHashLshPairs(df, idCol, textCol,
      shingleN, bands, rowsPerBand, threshold)
    val clusters = Dedup.nearDupClusters(pairs)
      .withColumnRenamed("doc_id", idCol)
    df.select(col(idCol))
      .join(clusters, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("split", splitAssign(col("cluster_id"), splits))
  }

  /** Token-window chunking for sequence packing: split each document
    * into windows of `size` tokens advancing by `size - overlap`. The
    * training-side operator that turns a variable-length corpus into
    * model-ready segments.
    *
    * Scale: one explode (inherent — chunking multiplies rows), no
    * shuffle, no join; the token array is built once per document and
    * sliced per chunk. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(overlap < size, "overlap must be smaller than the chunk size")
    val step = size - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    val nChunks = greatest(lit(1L),
      ceil((org.apache.spark.sql.functions.size(toks) - overlap).cast(DoubleType) / step)
        .cast(LongType))
    df.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0L), col("__nc") - 1L),
        i => array_join(slice(col("__toks"), (i * step + 1).cast(IntegerType), lit(size)), " "))))
      .select(col(idCol), col("pos").cast(LongType).as("chunk_id"),
        col("col").as("chunk_text"),
        org.apache.spark.sql.functions.size(split(col("col"), " "))
          .cast(LongType).as("chunk_tokens"))
  }

  /** Greedy sequence packing: documents are concatenated in `idCol`
    * order and cut into training sequences of `budget` tokens; each
    * document is assigned to the sequence where it STARTS
    * (`seq_id = start_token / budget`, `seq_offset = start_token %
    * budget`) — the approximate packing a pretraining loader applies
    * before example construction.
    *
    * Scale: the naive formulation is a GLOBAL running sum — a
    * single-partition window, the classic 100 TB killer. This is the
    * standard two-phase distributed prefix sum instead: range-partition
    * by id into `shards`, aggregate per-shard token totals (a
    * `shards`-row frame, prefix-summed on the driver), then a per-shard
    * window adds the shard's base offset. One range shuffle + one tiny
    * aggregate; window parallelism = `shards`. The sharded stage is
    * persisted while the offsets are derived from it — range boundaries
    * are sampled, so recomputing it could re-draw them and mismatch the
    * collected totals; the result is eagerly materialized (same
    * lifecycle as the dedup stages, [[Dedup.viaPersisted]]).
    *
    * The result is shard-independent: any contiguous-in-id sharding
    * yields the same global running sum, so the sampled range
    * boundaries never show in the output. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int = 32): DataFrame =
    packSequencesByCount(
      df.select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("n_tokens")),
      idCol, "n_tokens", budget, shards)

  /** [[packSequences]] over a caller-supplied (id, token-count) frame —
    * the variant a FITTED tokenizer feeds: chain
    * [[Tokenizer.bpeEncodeStats]]'s per-doc BPE token counts in here to
    * pack training sequences by what the tokenizer will actually emit,
    * not whitespace tokens. Same two-phase distributed prefix sum. */
  def packSequencesByCount(countsDf: DataFrame, idCol: String,
      tokensCol: String, budget: Int, shards: Int = 32): DataFrame = {
    require(budget > 0, "token budget must be positive")
    Dedup.viaPersisted(countsDf
      .select(col(idCol), col(tokensCol).cast(LongType).as("n_tokens"))
      .repartitionByRange(shards, col(idCol))
      .withColumn("__shard", spark_partition_id())) { base =>
      import org.apache.spark.sql.expressions.Window
      val totals = base.groupBy("__shard").agg(sum("n_tokens").as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      // shard i's base offset = total tokens of shards 0..i-1
      val offsets = totals.map(_._1).zip(totals.map(_._2).scanLeft(0L)(_ + _)).toMap
      val offOf = totals.foldRight(lit(0L): Column) { case ((shard, _), rest) =>
        when(col("__shard") === shard, lit(offsets(shard))).otherwise(rest)
      }
      val w = Window.partitionBy("__shard").orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      base
        .withColumn("__start", coalesce(sum(col("n_tokens")).over(w), lit(0L)) + offOf)
        .select(col(idCol), col("n_tokens"),
          // integer `div`, not `/`: Column./ is double division, which
          // loses exactness past 2^53 cumulative tokens — seq_offset
          // already uses exact Long arithmetic, seq_id must match
          expr(s"__start div $budget").as("seq_id"),
          (col("__start") % budget).as("seq_offset"))
    }
  }

  /** Deterministic mixture-rate sampling: keep each row of group g with
    * probability `permill(g)`‰ (falling back to `defaultPermill`),
    * decided by the same content-independent md5-of-id bucket as
    * [[splitAssign]] — the reproducible form of source-mixture
    * reweighting (e.g. downweight crawl, keep all of a curated source).
    *
    * Scale: pure Column, no shuffle — the keep decision runs in the
    * scan stage, and re-running the pipeline keeps exactly the same
    * rows. */
  def rateSample(df: DataFrame, groupCol: String, idCol: String,
      permill: Map[String, Int], defaultPermill: Int): DataFrame = {
    require((defaultPermill +: permill.values.toSeq).forall(w => w >= 0 && w <= 1000),
      "per-mill rates must be in [0, 1000]")
    val bucket = md5Permill(col(idCol))
    val rate = permill.toSeq.sortBy(_._1).foldRight(lit(defaultPermill): Column) {
      case ((g, w), rest) => when(col(groupCol) === g, lit(w)).otherwise(rest)
    }
    df.filter(bucket < rate)
  }

  /** Temperature-based mixture reweighting (the √-temperature sampling
    * of multilingual/multi-source LLM corpora): source i's keep rate is
    * chosen so its expected token contribution is `targetTokens ·
    * wᵢ/Σwⱼ` where `wᵢ = ⌊√nᵢ⌋` and `nᵢ` is the source's token mass —
    * upweighting low-resource sources relative to proportional
    * sampling. Rows are kept by the same content-independent
    * md5-of-id bucket as [[rateSample]], so the subsample is
    * deterministic across runs AND engines.
    *
    * Exactness: the per-source rate is computed in INTEGER arithmetic
    * (⌊√n⌋ is engine-stable because IEEE-754 sqrt is correctly rounded;
    * everything after is integral multiply/divide in DECIMAL(38,0), so
    * no float summation-order noise can flip a row) — the whole
    * operator is DuckDB-oracle-replayable.
    *
    * Scale: one partial-aggregated shuffle over sources for the token
    * masses (a ≤|sources|-row frame), the rate table joined back
    * unhinted (AQE broadcasts it when small), and the keep decision a
    * pure scan-stage Column. The windowed Σwⱼ runs on the tiny
    * per-source frame only. */
  def temperatureSample(df: DataFrame, sourceCol: String, idCol: String,
      textCol: String, targetTokens: Long): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = df.withColumn("__tok", TextAnalysis.tokenCount(col(textCol)))
    val rates = toks.groupBy(sourceCol).agg(sum("__tok").as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast(DoubleType))).cast(LongType))
      // whole-frame window: the frame is the per-source aggregate
      // (bounded by source cardinality), not the corpus
      .withColumn("__sw", sum("__w").over(Window.partitionBy()))
      .withColumn("__permill", least(lit(1000L), expr(
        s"CAST(1000 AS DECIMAL(38,0)) * CAST($targetTokens AS DECIMAL(38,0)) * __w" +
          " div (CAST(__sw AS DECIMAL(38,0)) * __n)")))
      .select(col(sourceCol).as("__rsrc"), col("__permill"))
    val bucket = md5Permill(col(idCol))
    // null-safe join: a NULL source (missing provenance) forms its own
    // rate group and must sample at that group's rate, not vanish —
    // an equi-join would never match null = null
    toks.join(rates, col(sourceCol) <=> col("__rsrc"))
      .filter(bucket < col("__permill"))
      .drop("__tok", "__permill", "__rsrc")
  }

  /** Graded contamination score — the per-document fraction of its
    * word-n-gram shingles found in the benchmark set (the GPT-3-style
    * overlap screen; [[contaminated]] is the thresholded special case).
    * Emits `n_shingles`, `n_shared` and `contamination ∈ [0,1]` per
    * corpus document so callers can pick their own cutoff or sort by
    * severity.
    *
    * Scale: identical shape to [[contaminated]] — the benchmark's
    * distinct shingle set stays small and joins unhinted (AQE
    * broadcasts it), the corpus explodes its shingles once, and the
    * per-document aggregate is one partial-aggregated shuffle. The
    * LEFT join keeps zero-overlap documents so the fraction is defined
    * for every document. */
  def contaminationFraction(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    val benchShingles = benchmark
      .select(explode(VectorExpressions.word_shingle_hashes(col(benchTextCol), n)).as("s"))
      .distinct()
      .withColumn("__hit", lit(1))
    corpus
      .select(col(idCol), explode(VectorExpressions.word_shingle_hashes(col(textCol), n)).as("s"))
      .join(benchShingles, Seq("s"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_shared"))
      // long/long IEEE division + fixed-decimal round: bit-identical in
      // any engine, no summation-order sensitivity
      .withColumn("contamination", round(col("n_shared") / col("n_shingles"), 4))
  }

  /** Screen-ablation report: given a set of named boolean quality
    * screens (true = pass), one row per screen with how many docs fail
    * it and how many fail ONLY it — the overlap analytics a pipeline
    * owner reads before re-tuning thresholds (a screen whose removals
    * are all unique is doing real work; one whose removals are fully
    * covered by the others is free to drop). A final `__any__` row
    * carries the union: docs failing at least one screen.
    *
    * Scale: the screens evaluate inside ONE scan pass and collapse into
    * a single global aggregate (2·|screens|+1 counters) — no shuffle of
    * rows, no per-screen job; the per-screen unpivot runs on the 1-row
    * aggregate. */
  def screenAblation(df: DataFrame, screens: Seq[(String, Column)]): DataFrame = {
    require(screens.nonEmpty, "need at least one screen")
    // screen names flow into stack() SQL text and generated column
    // names — restrict to identifier characters so a quote/space/
    // backtick can't break the expr or forge columns
    screens.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"screen name must match [A-Za-z0-9_]+: '$n'") }
    val fails = screens.map { case (n, c) =>
      when(!c, lit(1)).otherwise(lit(0)).as(s"__f_$n") }
    val flagged = df.select(fails: _*)
    val nFail = screens.map(s => col(s"__f_${s._1}")).reduce(_ + _)
    val aggs = screens.flatMap { case (n, _) => Seq(
      sum(col(s"__f_$n")).as(s"__nf_$n"),
      sum(when(col(s"__f_$n") === 1 && nFail === 1, 1L).otherwise(0L))
        .as(s"__uf_$n"))
    } :+ sum(when(nFail > 0, 1L).otherwise(0L)).as("__nf_any")
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    val stacked = screens.map { case (n, _) =>
      s"'$n', __nf_$n, __uf_$n" }.mkString(", ") +
      s", '__any__', __nf_any, __nf_any"
    one.select(expr(
      s"stack(${screens.size + 1}, $stacked) AS (screen, n_fail, n_unique_fail)"))
  }

  /** Deterministic shuffle-and-shard — the last step of every training
    * pipeline: assign each row a pseudorandom shard and a pseudorandom
    * position within it, so the written dataset is globally shuffled
    * yet BYTE-REPRODUCIBLE across pipeline reruns (and engines): shard
    * = md5-bucket of the id (fixed boundaries, not sampled ranges),
    * position = rank by md5 within the shard. Downstream training
    * readers stream shards in position order and see an
    * order-decorrelated curriculum.
    *
    * Scale: ONE shuffle on the shard key; the in-shard rank is a
    * window per shard (parallelism = `shards`), no global sort
    * anywhere. Write with `partitionBy("shard")` + sort on `pos`. */
  def shuffleShards(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, "need at least one shard")
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(idCol).cast(StringType).cast(BinaryType))
    val shard = (conv(substring(h, 1, 8), 16, 10).cast(LongType) % shards).cast(IntegerType)
    val w = Window.partitionBy(col("shard")).orderBy(h, col(idCol))
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast(LongType))
  }

  /** Curriculum-ordered shuffle-shard: [[shuffleShards]] whose
    * within-shard position follows the CURRICULUM — easy stages first
    * (Bengio et al. 2009) — while staying byte-reproducible. `stage` =
    * which of the `stages` exact-percentile difficulty bands the doc
    * falls in (thresholds rounded to 4 dp, ties land in the LOWER
    * stage — the [[TextAnalysis.perplexityBuckets]] discipline), shard
    * = md5 bucket of the id, and in-shard order is (stage asc, md5) —
    * training readers stream each shard in `pos` order and see
    * easy→hard with md5-decorrelated order inside each stage.
    *
    * Scale: ONE bounded percentile aggregate (stages−1 thresholds,
    * broadcast), the stage compare in the scan stage, and one
    * per-shard rank window (parallelism = `shards`) — no global sort,
    * same cost shape as [[shuffleShards]]. */
  def curriculumShards(df: DataFrame, idCol: String, difficulty: Column,
      shards: Int, stages: Int = 10, exact: Boolean = true): DataFrame = {
    require(shards > 0, "need at least one shard")
    require(stages > 1 && stages <= 1000, "stages in (1, 1000]")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol), difficulty.cast(DoubleType).as("__d"))
    // threshold quantiles ride the shared exact↔approx switch
    // (Profiling.quantileAgg): the GLOBAL aggregate here buffers every
    // difficulty value under `exact` — at 100 TB flip exact=false for a
    // constant-memory sketch (band edges tolerate sketch error; the
    // round(…,4) tie discipline is unchanged)
    val ps = (1 until stages).map(i => i.toDouble / stages)
    val th = base
      .agg(Profiling.quantileAgg(col("__d"), ps, exact).as("__th"))
      .select(transform(col("__th"), t => round(t, 4)).as("__th"))
    val h = md5(col(idCol).cast(StringType).cast(BinaryType))
    val shard = (conv(substring(h, 1, 8), 16, 10).cast(LongType) % shards).cast(IntegerType)
    val w = Window.partitionBy(col("shard")).orderBy(col("stage"), h, col(idCol))
    base.crossJoin(broadcast(th))
      .withColumn("stage",
        size(filter(col("__th"), t => col("__d") > t)).cast(LongType))
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast(LongType))
      .select(col(idCol), col("stage"), col("shard"), col("pos"))
  }

  /** Curation funnel report — pipeline observability: one row per
    * screen with its survivor count, so a corpus run shows where
    * documents die (the number every pipeline owner asks for first).
    * Stages cascade: quality gate → exact dedup (keep min id per
    * content hash) → boilerplate-span removal.
    *
    * Scale: each stage count is an aggregate over the cascaded frame;
    * the union evaluates in one job tree. Counts only — no payload
    * moves. */
  def curationReport(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int, spanTokens: Int, minDocs: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quality = df.filter(TextAnalysis.tokenCount(col(textCol)) >= minTokens)
    val deduped = quality
      .withColumn("__h", md5(col(textCol).cast(BinaryType)))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__h").orderBy(col(idCol))))
      .filter(col("__rk") === 1)
      .drop("__h", "__rk")
    val boiler = dropBoilerplateSpans(deduped, idCol, textCol, spanTokens, minDocs)
    def stage(name: String, d: DataFrame): DataFrame =
      d.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
    stage("0_input", df)
      .unionByName(stage("1_quality", quality))
      .unionByName(stage("2_dedup", deduped))
      .unionByName(stage("3_boilerplate", boiler))
  }

  /** End-to-end curation v2: [[dropBoilerplateSpans]] →
    * [[temperatureSample]] (target = `targetNum/targetDen` of the
    * CLEANED token mass) → [[shuffleShards]]. The cleaned corpus is
    * PERSISTED across the chain — the token-mass action, the
    * per-source rate aggregate and the final plan all read it, and
    * recomputing the span screen per consumer would quadruple the
    * pipeline's dominant stage (measured 4-5 s vs ~2 s at sf0.1). */
  def curateV2(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, spanTokens: Int, minDocs: Int,
      targetNum: Long, targetDen: Long, shards: Int): DataFrame =
    Dedup.viaPersisted(
      dropBoilerplateSpans(docs, idCol, textCol, spanTokens, minDocs)
        .join(docs.select(col(idCol), col(sourceCol)), idCol)) { withSrc =>
      // coalesce: sum over an empty frame is NULL, not 0 (a corpus of
      // pure boilerplate would otherwise NPE here)
      val total = withSrc.agg(coalesce(sum(
        TextAnalysis.tokenCount(col("clean_text"))), lit(0L))).head().getLong(0)
      require(total > 0, "no tokens survive the boilerplate screen")
      shuffleShards(
        temperatureSample(withSrc, sourceCol, idCol, "clean_text",
          total * targetNum / targetDen),
        idCol, shards)
    }

  /** Per-document drop attribution through the standard curation
    * cascade (quality screen → exact dedup keep-min-id → per-source
    * quota): for EVERY input document, the FIRST stage that drops it,
    * or `kept` — the lineage report that answers "why is my document
    * not in the training set" without replaying the funnel by hand.
    * Stage semantics are the cascade's own: a doc failing quality
    * reads `quality` even if it is also a duplicate; dedup ranks only
    * among quality survivors; quota ranks only among dedup survivors —
    * so the `kept` set is identical to
    * quotaSample∘dropExactDuplicates∘screen (spec-gated).
    *
    * Scale: the cascade's own shuffles (dedup hash window, quota
    * window — both WindowGroupLimit-friendly rank-1 shapes) plus two
    * id-keyed hash joins attaching the stage ranks back to the full
    * corpus. */
  def dropReasons(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, minQuality: Double = 0.6667,
      quotaK: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // every stage decision is a function of (id, source, content hash,
    // quality flag) — so decide on that narrow frame and never shuffle
    // the text (r17, guide §8; the old form carried textCol through
    // BOTH the dedup and the quota window exchanges). The dedup winner
    // per content hash is min(id) among quality passers (≡ the old
    // rn=1 under orderBy id); stage attribution reads identically.
    val qpass = TextAnalysis.qualityScore(col(textCol)) >= minQuality
    val base = df.select(col(idCol), col(sourceCol), qpass.as("__q"),
      md5(col(textCol).cast(BinaryType)).as("__h"))
    val winners = base.filter(col("__q"))
      .groupBy("__h").agg(min(col(idCol)).as("__did"))
      .select("__did")
    val quotaW = Window.partitionBy(sourceCol)
      .orderBy(md5(col(idCol).cast(StringType).cast(BinaryType)), col(idCol))
    val qt = base.join(winners, col(idCol) === col("__did"), "left_semi")
      .select(col(idCol), col(sourceCol))
      .withColumn("__qr", row_number().over(quotaW))
      .select(col(idCol).as("__tid"), col("__qr"))
    base
      .join(winners.withColumn("__dw", lit(1)),
        col(idCol) === col("__did"), "left")
      .join(qt, col(idCol) === col("__tid"), "left")
      .select(col(idCol), col(sourceCol),
        when(!col("__q"), lit("quality"))
          .when(col("__dw").isNull, lit("dedup"))
          .when(col("__qr") > quotaK, lit("quota"))
          .otherwise(lit("kept")).as("stage"))
  }

  /** End-to-end curation v3 — the classifier-gated funnel (the
    * GPT-3/CCNet/FineWeb shape): train the hashed-BoW quality
    * classifier in-engine ([[TextAnalysis.trainClassifier]]), keep the
    * documents scoring at or above the CORPUS MEAN (a relative gate —
    * scores are 4-dp, so the mean compare runs in exact integer
    * arithmetic `si·n >= Σsi` and replays in any engine; a fixed
    * absolute threshold would not transfer across corpora), exact-dedup
    * the survivors (keep min id), √-temperature the mixture down to
    * `targetNum/targetDen` of the gated token mass, and lay out
    * byte-reproducible shuffle shards.
    *
    * Scale: training's driver traffic is ≤`buckets` rows per GD round;
    * scoring is one scan pass (compiled token-margin kernel, weights as
    * literals); the mean gate joins a broadcast 1-row aggregate; dedup
    * is one window on the content hash; the sample + shard stages are
    * the [[curateV2]] tail. */
  def curateV3(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, labelCol: Column, targetNum: Long, targetDen: Long,
      shards: Int, buckets: Int = 64, iters: Int = 3,
      lr: Double = 5.0): DataFrame = {
    val (wts, bias) = TextAnalysis.trainClassifier(
      docs, idCol, textCol, labelCol, buckets, iters, lr)
    val scored = TextAnalysis.scoreClassifier(docs, idCol, textCol, wts, bias)
      .withColumn("__si", round(col("score") * 10000, 0).cast(LongType))
    val stats = scored.agg(sum("__si").as("__tot"), count(lit(1)).as("__n"))
    val gateIds = scored.crossJoin(broadcast(stats))
      .filter(col("__si") * col("__n") >= col("__tot"))
      .select(col(idCol))
    val gated = docs.join(gateIds, Seq(idCol), "left_semi")
    val deduped = Dedup.dropExactDuplicates(gated, idCol, textCol)
    Dedup.viaPersisted(
        deduped.select(col(idCol), col(textCol), col(sourceCol))) { clean =>
      val total = clean.agg(coalesce(sum(
        TextAnalysis.tokenCount(col(textCol))), lit(0L))).head().getLong(0)
      require(total > 0, "no tokens survive the classifier gate")
      shuffleShards(
        temperatureSample(clean, sourceCol, idCol, textCol,
          total * targetNum / targetDen),
        idCol, shards)
    }
  }

  /** One-call training-data export: [[shuffleShards]] layout written to
    * disk — `outPath/shard=N/` directories, rows inside each file in
    * `pos` order (training readers stream a shard sequentially and see
    * the globally-shuffled order without any runtime sort). The
    * repartition keys every shard to ONE task, so each shard directory
    * holds one pos-sorted file; reruns produce byte-identical layout.
    *
    * Scale: the one [[shuffleShards]] exchange is the only data
    * movement; per-shard sort spills if a shard exceeds memory. Size
    * `shards` so a shard ≈ a few GB (training-reader friendly). */
  def writeTrainingShards(df: DataFrame, idCol: String, outPath: String,
      shards: Int): Unit =
    shuffleShards(df, idCol, shards)
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(outPath)

  /** Boilerplate-span removal (the CCNet/RefinedWeb paragraph-dedup
    * screen, on token windows): cut each document into consecutive
    * `spanTokens`-token spans, count how many DISTINCT documents each
    * span text occurs in, drop every span that appears in `minDocs`+
    * documents (headers, footers, license blocks, templated text), and
    * reassemble the surviving spans in order. Documents whose spans are
    * all boilerplate disappear entirely.
    *
    * Scale: spans explode once; the frequency table is one
    * partial-aggregated shuffle on span text; the removal is a LEFT
    * ANTI join against the (data-dependent, usually small) frequent-
    * span set — unhinted, AQE picks the strategy; reassembly is one
    * shuffle on doc id with an in-group sort by span position (no
    * global sort). Fully deterministic → DuckDB-oracle-replayable. */
  def dropBoilerplateSpans(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, minDocs: Int): DataFrame = {
    require(spanTokens > 0 && minDocs > 1, "need spanTokens>0, minDocs>1")
    val toks = split(trim(col(textCol)), "\\s+")
    val nSpans = ceil(size(toks).cast(DoubleType) / spanTokens).cast(IntegerType)
    val spans = transform(sequence(lit(0), nSpans - 1), i =>
      struct(i.as("pos"),
        array_join(slice(toks, i * spanTokens + 1, lit(spanTokens)), " ").as("s")))
    // fan out before the span explode (guide §2.5): the span stream is
    // consumed twice (frequency side + anti-join probe) and both
    // consumers re-tokenize from the scan; locally that scan is one task
    val exploded = FanOut.byKey(df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), explode(spans).as("sp"))
      .select(col(idCol), col("sp.pos").as("pos"), col("sp.s").as("s"))
    val frequent = exploded.groupBy("s")
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("s")
    exploded.join(frequent, Seq("s"), "left_anti")
      .groupBy(idCol)
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          x => x.getField("s")), " ").as("clean_text"))
  }

  // conservative patterns that parse identically in Java regex and RE2
  // (DuckDB) — the point is reproducible redaction, not perfect recall
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** PII redaction: emails → `<EMAIL>`, IPv4 → `<IP>`, phone-shaped
    * numbers → `<PHONE>`. Pure Column regexp chain — runs at scan speed
    * inside codegen; order matters (emails first so their host part is
    * not half-eaten by the IP pattern). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** The same patterns as detection flags (for routing/reporting). */
  def piiFlags(text: Column): Column =
    struct(
      text.rlike(EmailRe).as("has_email"),
      text.rlike(Ipv4Re).as("has_ip"),
      text.rlike(PhoneRe).as("has_phone"))

  /** DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much more likely its tokens are under a TARGET
    * unigram LM (fit on the rows matching `targetPred`, e.g. a trusted
    * source or quality band) than under the RAW corpus LM, then draw
    * `n` documents with probability proportional to the importance
    * weight via Gumbel-top-k — the uniform behind each Gumbel comes
    * from md5 of the id ([[md5Permill]]), so the draw is reproducible
    * across runs AND engines with no RNG state.
    *
    * Model: the vocabulary is the top-`vocab` tokens of the RAW corpus
    * (the bounded feature space — DSIR likewise hashes into a fixed
    * space); both LMs use add-one smoothing over `vocab` slots,
    * logp(t) = ln((n_t + 1) / (total + vocab)), out-of-vocabulary
    * tokens at the n_t = 0 floor of BOTH sides (a per-instance
    * constant, ln((totalRaw+vocab)/(totalTgt+vocab))). A document's
    * log-weight is the sum over its token instances of
    * logp_target - logp_raw; the drawn score is
    * round(log_weight + Gumbel(u_id), 6). Documents with no tokens
    * have no likelihood under either LM and are excluded.
    *
    * Scale: ONE corpus tokenization feeds a single combined count
    * frame (raw + target counts per token, persisted only for the fit:
    * one totals action + the top-`vocab` cut, then released); scoring
    * joins the exploded tokens against the bounded LM table (AQE
    * broadcasts it) and aggregates once per doc; the draw is a
    * TakeOrdered top-`n` heap — no global sort, nothing
    * corpus-sized on the driver. */
  def importanceResample(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, n: Int, vocab: Int = 65536): DataFrame = {
    val toks = df.select(col(idCol), targetPred.cast(BooleanType).as("__tgt"),
        explode(split(trim(col(textCol)), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    var totRaw = 0L
    var totTgt = 0L
    val lm = Dedup.viaPersisted(
        toks.groupBy("t").agg(
          count(lit(1)).as("n_raw"),
          count(when(col("__tgt"), 1)).as("n_tgt"))) { counts =>
      val r = counts.agg(
        coalesce(sum("n_raw"), lit(0L)), coalesce(sum("n_tgt"), lit(0L))).head()
      totRaw = r.getLong(0)
      totTgt = r.getLong(1)
      require(totRaw > 0, "raw corpus has no tokens")
      require(totTgt > 0, "target slice has no tokens — check targetPred")
      counts.orderBy(col("n_raw").desc, col("t")).limit(vocab)
        .select(col("t"),
          (log((col("n_tgt") + 1).cast(DoubleType) / (totTgt.toDouble + vocab)) -
            log((col("n_raw") + 1).cast(DoubleType) / (totRaw.toDouble + vocab))).as("lr"))
    }
    val floorLr = math.log((totRaw.toDouble + vocab) / (totTgt.toDouble + vocab))
    val u = (md5Permill(col(idCol)).cast(DoubleType) + 0.5) / 1000.0
    toks.join(lm, Seq("t"), "left")
      .groupBy(idCol)
      .agg(round(sum(coalesce(col("lr"), lit(floorLr))), 6).as("log_weight"))
      .withColumn("score", round(col("log_weight") - log(-log(u)), 6))
      .orderBy(col("score").desc, col(idCol))
      .limit(n)
  }

  /** Corpus snapshot diff — the governance primitive for incremental
    * pipeline audits: which documents were added, removed, or changed
    * between two corpus versions. Rows are compared by md5 of the
    * content column, so a rebuilt snapshot with identical content
    * diffs as `unchanged` (dropped from the output).
    *
    * Scale: each side collapses to (id, hash) in its scan stage before
    * the full-outer join — the shuffle carries two hash columns, never
    * documents; unchanged rows (the overwhelming majority between
    * adjacent snapshots) are filtered before the result materializes. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    // presence comes from explicit markers, NOT hash nullability —
    // md5(NULL content) is NULL and would misreport a present row as
    // absent; the null-safe <=> makes NULL-content rows compare as
    // content too (NULL vs NULL unchanged, NULL vs text changed)
    val o = oldDf.select(col(idCol).as("id"), lit(1).as("__po"),
      md5(col(contentCol)).as("__ho"))
    val n = newDf.select(col(idCol).as("id"), lit(1).as("__pn"),
      md5(col(contentCol)).as("__hn"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__po").isNull, "added")
          .when(col("__pn").isNull, "removed")
          .when(!(col("__ho") <=> col("__hn")), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col("id"), col("status"))
  }

  /** Semantic benchmark decontamination over hashed-projection
    * embeddings: corpus docs whose [[TextAnalysis.hashedEmbedding]]
    * vector is cosine >= `threshold` to ANY benchmark doc, with the
    * max matching cosine. Complements the shingle-overlap
    * [[contaminated]]: token-level rewording moves shingles but barely
    * moves the bucketed tf vector, so paraphrase-level reuse that
    * exact n-grams miss still surfaces here. Embeddings depend only on
    * each doc's own text, so embedding the two slices separately
    * equals slicing one embedded corpus (the oracle's formulation).
    *
    * Scale (r14, VERDICT r13 #5 — the sf10 leg measured the naive
    * corpus × bench nested loop at 909.6 s / 28.8×): the pair stage is
    * ONE compiled kernel per corpus row
    * ([[graft.functions.VectorExpressions.MaxCosineVsMatrix]]) against
    * the broadcast bench matrix — primitive-array inner loop, no
    * per-pair Catalyst dispatch. Two designs were measured first: the
    * pairwise crossJoin paid ~1.37 µs/PAIR of row-materialization
    * overhead (30,829 CPU-s at sf10 for ~2 core-minutes of raw
    * flops), and an exact k-means-cell angular-triangle-inequality
    * prune made it WORSE (1139 s vs 909 s — in 16-dim hashed-tf space
    * the cell radii sit far above arccos(threshold), so nothing
    * pruned; the kernel commit message and MaxCosineVsMatrix's
    * scaladoc carry the numbers). The bench side collects to the
    * driver (an eager, benchmark-sized fetch — the same bounded-
    * collect class as the k-means codebooks) and broadcasts once per
    * executor; `maxBench` refuses a "benchmark" that is actually a
    * corpus, pointing at [[Similarity.knnJoin]] for that shape.
    * Result is bit-identical to the pairwise formulation: same
    * accumulation order per pair, and round-then-max equals
    * max-then-round by monotonicity.
    *
    * Caller contract (r15, ADVICE r14 low): the output has one row per
    * corpus ROW above threshold, not per distinct id — callers with
    * non-unique `idCol` must dedupe first (`corpus.dropDuplicates(id)`)
    * or aggregate the result; the matrix kernel deliberately avoids
    * re-adding a groupBy shuffle for the common unique-id case. And the
    * benchmark-side collect + broadcast happens EAGERLY at call time
    * (bounded by `maxBench`), not at the returned frame's first
    * action — callers building plans they may never execute should
    * defer the call itself. */
  def contaminatedSemantic(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      threshold: Double, buckets: Int = 64, dim: Int = 16,
      maxBench: Int = 1000000): DataFrame = {
    val ce = TextAnalysis.hashedEmbedding(corpus, idCol, textCol, buckets, dim)
    val benchRows = TextAnalysis.hashedEmbedding(bench, benchIdCol, benchTextCol,
        buckets, dim)
      .select(col("embedding").cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)))
      .limit(maxBench + 1).collect()
    if (benchRows.length > maxBench) throw new IllegalArgumentException(
      s"contaminatedSemantic: benchmark side exceeds $maxBench docs — " +
        "that is a corpus, not a benchmark; use Similarity.knnJoin for " +
        "corpus-vs-corpus similarity, or raise maxBench deliberately")
    val flat = new Array[Double](benchRows.length * dim)
    var j = 0
    for (r <- benchRows if !r.isNullAt(0)) {
      val v = r.getSeq[Double](0)
      var d = 0
      while (d < math.min(v.length, dim)) { flat(j * dim + d) = v(d); d += 1 }
      j += 1
    }
    val bc = corpus.sparkSession.sparkContext
      .broadcast(java.util.Arrays.copyOf(flat, j * dim))
    ce.select(col(idCol),
        round(org.apache.spark.sql.GraftSqlShims.columnOf(
          graft.functions.VectorExpressions.MaxCosineVsMatrix(
            org.apache.spark.sql.GraftSqlShims.expressionOf(col("embedding")),
            bc, dim)), 4).as("max_cos"))
      .filter(col("max_cos") >= threshold)
  }

  /** Cross-split leakage audit: near-duplicate pairs whose endpoints
    * land in DIFFERENT splits of [[splitAssign]] leak training text
    * into held-out evaluation — the check to run before trusting a
    * val/test metric on a deduped-per-split-only corpus. Returns the
    * full split×split pair matrix (split_a <= split_b lexicographically)
    * with pair counts and mean similarity; the off-diagonal rows are
    * the leaks.
    *
    * Scale: the pair stream defaults to the BANDED MinHash miner
    * ([[Dedup.minHashLshPairs]], 32 bands x 4 — candidates meet only
    * inside a (band, bandHash) bucket, so candidate volume tracks true
    * near-dup density, and the per-pair verification is exact Jaccard;
    * at threshold 0.5 the deterministic band-miss probability is
    * < 2e-14, the same argument pl_dedup_minhash's oracle rests on).
    * The exact shingle inverted index ([[Dedup.ngramJaccardPairs]],
    * `exact = true`) generates C(df, 2) candidates PER SHARED GRAM —
    * on a high-duplication corpus that is quadratic in duplication
    * density (the sf1 10-copy smoke measured ~300 s exact vs seconds
    * banded for identical output). The split labels are pure md5
    * functions of the ids already on each pair row, so labeling adds
    * ZERO joins and the only new shuffle is the final tiny |splits|²
    * aggregate. */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Int)], shingleN: Int = 3,
      threshold: Double = 0.5, exact: Boolean = false): DataFrame = {
    val pairs =
      if (exact) Dedup.ngramJaccardPairs(df, idCol, textCol, shingleN, threshold)
      else Dedup.minHashLshPairs(df, idCol, textCol, shingleN,
        bands = 32, rowsPerBand = 4, threshold = threshold)
    val sa = splitAssign(col("id_a"), splits)
    val sb = splitAssign(col("id_b"), splits)
    pairs
      .select(least(sa, sb).as("split_a"), greatest(sa, sb).as("split_b"),
        col("jaccard"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"), round(avg(col("jaccard")), 4).as("avg_jaccard"))
  }

  /** Token-budget mixture planner: given a target token budget and a
    * temperature `alpha`, compute per-source availability and the
    * α-temperature allocation (share_i = avail_i^α / Σ avail_j^α —
    * α=1 proportional, α→0 uniform; 0.5 is the √-temperature most
    * multilingual/multi-source recipes use). Emits the numbers a
    * pipeline needs to configure [[rateSample]]/[[temperatureSample]]
    * per source: allocated tokens, sampling rate, and epoch count
    * (sample_rate > 1 means the source up-samples / repeats).
    *
    * Scale: ONE partial-aggregated shuffle on the source column; the
    * normalization is a crossJoin against a 1×1 total frame over the
    * |sources|-row aggregate (bounded by construction, same pattern as
    * the curation report). share is rounded to 6 dp BEFORE the floor()
    * allocation so the plan is engine-stable (oracle-replayable). */
  def mixturePlan(df: DataFrame, sourceCol: String, textCol: String,
      budgetTokens: Long, alpha: Double = 0.5): DataFrame = {
    require(budgetTokens > 0 && alpha > 0, "need budgetTokens>0, alpha>0")
    // persist the |sources|-row aggregate: both the normalizer total
    // and the output rows derive from it, and without the persist each
    // branch re-runs the full corpus tokenization scan
    Dedup.viaPersisted(df.groupBy(col(sourceCol).as("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col(textCol))).as("avail_tokens"))) { per =>
    val tot = per.agg(
      sum(pow(col("avail_tokens").cast(DoubleType), lit(alpha))).as("__tot"))
    per.crossJoin(tot)
      .withColumn("share",
        round(pow(col("avail_tokens").cast(DoubleType), lit(alpha)) / col("__tot"), 6))
      .withColumn("alloc_tokens",
        floor(lit(budgetTokens.toDouble) * col("share")).cast(LongType))
      .withColumn("sample_rate",
        round(col("alloc_tokens").cast(DoubleType) / col("avail_tokens"), 6))
      .withColumn("epochs",
        ceil(col("alloc_tokens").cast(DoubleType) / col("avail_tokens")).cast(LongType))
      .select("source", "n_docs", "avail_tokens", "share",
        "alloc_tokens", "sample_rate", "epochs")
    }
  }

  /** Materialize a [[mixturePlan]]: expand each document into
    * `floor(sample_rate)` guaranteed epochs plus one more with
    * probability `frac(sample_rate)`, decided by a content-independent
    * md5-of-id draw in MILLIONTHS (matching the plan's 6-dp
    * `sample_rate` resolution; the draw is salted with "mix" so it is
    * independent of [[rateSample]]/[[splitAssign]] decisions on the
    * same ids). This is the step that turns the per-source allocation
    * into an actual training corpus: scarce sources up-sample
    * (rate > 1 repeats docs across epochs), abundant sources
    * down-sample (rate < 1 drops docs), and the expected token mass
    * per source lands on the plan's `alloc_tokens`.
    *
    * Scale: the plan is a |sources|-row frame joined back unhinted
    * (AQE broadcasts it); the epoch expansion is a scan-stage
    * explode(sequence(...)) with NO additional shuffle, and re-running
    * yields byte-identical output. */
  def realizeMixture(df: DataFrame, sourceCol: String, idCol: String,
      textCol: String, budgetTokens: Long, alpha: Double = 0.5): DataFrame = {
    val plan = mixturePlan(df, sourceCol, textCol, budgetTokens, alpha)
      .select(col("source").as(sourceCol), col("sample_rate"))
    val full = floor(col("sample_rate")).cast(LongType)
    // sample_rate is rounded to 6 dp upstream, so frac·1e6 is integral
    // up to fp noise; round() makes the millionths threshold exact
    val fracPpm = round((col("sample_rate") - full) * 1e6).cast(LongType)
    val draw = conv(substring(md5(
        concat(col(idCol).cast(StringType), lit("mix")).cast(BinaryType)),
        1, 8), 16, 10).cast(LongType) % 1000000L
    df.join(plan, Seq(sourceCol))
      .withColumn("__n", full + when(draw < fracPpm, 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .select(col(idCol), col(sourceCol),
        explode(sequence(lit(0L), col("__n") - 1)).as("epoch"))
  }
}
