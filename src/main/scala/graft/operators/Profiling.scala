package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sketch-based corpus profiling: the fixed-memory, single-pass,
  * mergeable summaries a 100 TB corpus is profiled with before any
  * curation decision — HyperLogLog distinct counts, quantile sketches,
  * and re-mergeable per-shard sketch columns. Exact `COUNT(DISTINCT)`
  * or a global sort for percentiles would shuffle the full corpus;
  * every aggregate here is partial-aggregated (map-side combined) and
  * constant-size per group regardless of input rows.
  *
  * Reference analog: none — the reference engine (araddon/qlbridge) has
  * only exact count/sum/avg (exec/groupby.go:350-435); sketches are
  * part of the beyond-reference scale surface, like window functions
  * and set ops.
  */
object Profiling {

  /** THE exact↔approx quantile switch, shared by every quantile
    * surface (madOutliers, Curation.curriculumShards, the q32 query
    * family). `exact = true` is Spark's `percentile` — bit-exact and
    * DuckDB-`quantile_cont`-matching, but its aggregation buffer holds
    * EVERY value of the group, so it only belongs where groups are
    * bounded (a handful of flags/sources). At 100 TB-scale group sizes
    * flip `exact = false`: `percentile_approx` keeps a constant-size
    * mergeable sketch per group (error ≤ 1/accuracy of rank), the same
    * trade the CCNet-bucket path already makes. */
  def quantileAgg(value: Column, ps: Seq[Double], exact: Boolean,
      accuracy: Int = 10000): Column = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "percentiles in [0,1]")
    val pcol = if (ps.length == 1) lit(ps.head) else array(ps.map(lit): _*)
    if (exact) percentile(value, pcol)
    else percentile_approx(value, pcol, lit(accuracy))
  }

  /** Per-group percentiles of one column — the q32 shape with the
    * [[quantileAgg]] switch advertised: exact for oracle replays on
    * bounded group counts, approx (constant per-group memory) for the
    * 100 TB path. Output columns `p_<pct>` rounded to 4 dp. */
  def groupPercentiles(df: DataFrame, groupCol: String, value: Column,
      ps: Seq[Double], exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    val qs = quantileAgg(value, ps, exact, accuracy)
    df.groupBy(groupCol)
      .agg(qs.as("__qs"))
      .select(col(groupCol) +: ps.zipWithIndex.map { case (p, i) =>
        val c = if (ps.length == 1) col("__qs") else col("__qs").getItem(i)
        round(c, 4).as(s"p${(p * 100).round}")
      }: _*)
  }

  /** Per-source corpus profile in ONE pass over the data: document
    * count, token mass, HLL-approximate distinct content fingerprints
    * (near-dup mass indicator), and approximate token-count quantiles
    * (p50/p90/p99 document lengths).
    *
    * Scale: one partial-aggregated shuffle on the source key; per-group
    * state is a fixed-size HLL register set + quantile summary, never
    * the rows. `rsd` trades register memory for distinct-count error;
    * `quantileAccuracy` likewise for the percentile sketch. */
  def corpusProfile(df: DataFrame, sourceCol: String, textCol: String,
      rsd: Double = 0.01, quantileAccuracy: Int = 10000): DataFrame =
    df.select(col(sourceCol),
        TextAnalysis.tokenCount(col(textCol)).as("__tok"),
        TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .groupBy(sourceCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__tok").as("n_tokens"),
        approx_count_distinct(col("__fp"), rsd).as("approx_distinct"),
        percentile_approx(col("__tok"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(quantileAccuracy))
          .as("tok_quantiles"))

  /** Exact global top-k token frequencies (vocabulary head): explode
    * tokens, count, top-k. The exact companion to the sketch profile —
    * when the head of the distribution is what's needed (stopword
    * lists, tokenizer vocab checks), the exact path is one
    * partial-aggregated shuffle.
    *
    * Scale: map-side combine collapses each partition's token counts
    * before the exchange (the shuffle carries ≤|vocab| rows per
    * partition, not token occurrences) and the sort is a
    * TakeOrderedAndProject heap, never global. */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)

  /** Per-group DataSketches HLL sketches over `keyCol`: each group gets
    * a compact binary sketch plus its estimate. Unlike
    * `approx_count_distinct`'s internal buffer, these sketches are
    * first-class VALUES — persist them per day/shard and re-union later
    * without touching the raw data. */
  def distinctSketches(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(hll_sketch_agg(col(keyCol)).as("sketch"))
      .withColumn("estimate", hll_sketch_estimate(col("sketch")))

  /** Union previously-built sketches to one global distinct estimate —
    * the merge step of the sketch lifecycle. Input is the (tiny)
    * per-group sketch frame, so this never re-reads the corpus. */
  def unionDistinct(sketches: DataFrame, sketchCol: String = "sketch"): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col(sketchCol))).as("distinct_est"))

  /** Per-group count-min token-frequency sketches — the mergeable
    * FREQUENT-ITEMS half of the sketch family ([[distinctSketches]] is
    * the distinct-count half): fixed-width counting over exploded
    * tokens, partial-aggregated map-side, one compact blob per group.
    * Persist per-day/shard, merge later, query any token's frequency
    * without re-reading the corpus. Guarantee: estimates never
    * undercount, and overcount by at most ε·N with probability
    * `confidence`. */
  def tokenFrequencySketch(df: DataFrame, groupCol: String, textCol: String,
      eps: Double = 0.001, confidence: Double = 0.99): DataFrame =
    df.select(col(groupCol), explode(split(trim(col(textCol)), "\\s+")).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(groupCol)
      .agg(count_min_sketch(col("__t"), lit(eps), lit(confidence), lit(42))
        .as("sketch"))

  /** Merge previously-built count-min blobs into one queryable sketch —
    * bounded driver traffic (|groups| blobs), never the corpus. */
  def mergeTokenSketches(sketches: DataFrame,
      sketchCol: String = "sketch"): org.apache.spark.util.sketch.CountMinSketch = {
    val blobs = sketches.select(col(sketchCol)).collect()
      .map(_.getAs[Array[Byte]](0))
    require(blobs.nonEmpty, "no sketches to merge")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(blobs.head))
    blobs.tail.foreach { b =>
      cms.mergeInPlace(org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(b)))
    }
    cms
  }

  /** Estimated frequency of a token in a merged sketch. The SQL
    * aggregate feeds UTF-8 BYTES into the sketch, so the query side
    * must hash the same representation. */
  def estimateTokenCount(cms: org.apache.spark.util.sketch.CountMinSketch,
      token: String): Long =
    cms.estimateCount(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Exact per-column table profile in ONE pass: row count, nulls,
    * distinct count, min/max (stringified for a uniform schema) for
    * each requested column, unpivoted to a row per column — the exact
    * complement to [[corpusProfile]]'s sketches when the column list
    * is small enough to afford COUNT(DISTINCT).
    *
    * Scale: a single aggregate scan (Spark expands the multiple
    * distinct aggregates internally); output is |cols| rows. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    // internal aliases are indexed, not name-derived: a user column name
    // containing quotes/backticks/dots must never reach an identifier
    // or an expr() string (it would break parsing or inject fragments)
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      val src = df(c)
      Seq(
        sum(when(src.isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
        countDistinct(src).as(s"__dist_$i"),
        min(src).cast(StringType).as(s"__min_$i"),
        max(src).cast(StringType).as(s"__max_$i"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    // Column-API unpivot (inline of structs) instead of a stack() SQL string
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__nulls_$i").as("n_nulls"),
        col(s"__dist_$i").as("n_distinct"),
        col(s"__min_$i").as("min_s"),
        col(s"__max_$i").as("max_s"))
    }
    agged.select(inline(array(rows: _*)))
  }

  /** Exact fixed-width histogram of an integer-valued expression:
    * bucket = value div width (integer division — engine-stable), one
    * partial-aggregated shuffle of |buckets| rows. */
  def histogram(df: DataFrame, value: Column, width: Int): DataFrame = {
    require(width > 0, "bucket width must be positive")
    df.select((value.cast(LongType)).as("__v"))
      .groupBy(expr(s"__v div $width").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** Robust per-group outlier screen (median/MAD — the length-outlier
    * filter shape of the public curation pipelines): flag rows whose
    * value deviates from their GROUP's median by more than
    * k × the median absolute deviation. Median/MAD instead of
    * mean/stddev because a heavy-tailed crawl source (one 10 MB doc
    * among tweets) drags a mean/σ filter into passing the garbage —
    * the median pair is outlier-immune by construction. A zero-MAD
    * group (over half its rows identical) flags every deviating row —
    * the conservative reading.
    *
    * Determinism: Spark's exact `percentile` interpolates identically
    * to DuckDB's `quantile_cont` (the q32 mapping), deviations are
    * exact doubles of integer-valued inputs, and k multiplies exactly
    * when binary-representable (default 1.5) — the flag compare
    * replays cross-engine.
    *
    * Scale: two exact-percentile aggregates per group (groups =
    * sources, bounded) + joins of the |groups|-row stat tables that
    * AQE broadcasts; the flag itself is scan-stage. */
  def madOutliers(df: DataFrame, idCol: String, groupCol: String,
      value: Column, k: Double = 1.5, exact: Boolean = true): DataFrame = {
    val vals = df.select(col(idCol), col(groupCol), value.cast(DoubleType).as("v"))
    val med = vals.groupBy(groupCol)
      .agg(quantileAgg(col("v"), Seq(0.5), exact).as("med"))
    val dev = vals.join(med, Seq(groupCol))
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = dev.groupBy(groupCol)
      .agg(quantileAgg(col("dev"), Seq(0.5), exact).as("mad"))
    dev.join(mad, Seq(groupCol))
      .filter(col("dev") > lit(k) * col("mad"))
      .select(col(idCol), col(groupCol), col("v"),
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"))
  }

  /** Vocabulary-growth profile (the Heaps'-law curve) per source:
    * order each source's docs deterministically (md5 of id), cut the
    * sequence into `buckets` equal rank slices, and count how many
    * DISTINCT tokens appear for the FIRST time in each slice, plus the
    * cumulative vocabulary. Natural text keeps minting new types
    * (V ∝ n^β, β≈0.4-0.6); a templated/synthetic/bot source's curve
    * flattens almost immediately — this is the cheap corpus-level
    * screen for "does this source actually contain new content".
    *
    * Scale: one explode + ONE partial-aggregated shuffle on
    * (source, token) for the first-occurrence rank; the bucket
    * aggregate and cumulative window run on ≤ |sources|·buckets rows.
    * The per-source doc ranking is a window over the doc frame (one
    * shuffle on source). */
  def vocabGrowth(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, buckets: Int = 10): DataFrame = {
    require(buckets > 0, "need at least one bucket")
    import org.apache.spark.sql.expressions.Window
    val byRank = Window.partitionBy(sourceCol)
      .orderBy(md5(col(idCol).cast(StringType).cast(BinaryType)), col(idCol))
    val ranked = df.select(col(idCol), col(sourceCol), col(textCol))
      .withColumn("__r", row_number().over(byRank))
    val cnt = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
    val toks = ranked.select(col(sourceCol), col("__r"),
        explode(split(trim(col(textCol)), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    val firstRank = toks.groupBy(col(sourceCol), col("t"))
      .agg(min("__r").as("__fr"))
    firstRank.join(cnt, Seq(sourceCol))
      .withColumn("bucket", expr(s"((__fr - 1) * $buckets) div __n"))
      .groupBy(col(sourceCol), col("bucket"))
      .agg(count(lit(1)).as("new_tokens"))
      .withColumn("cum_vocab", sum("new_tokens").over(
        Window.partitionBy(sourceCol).orderBy("bucket")))
  }

  /** Distribution-drift monitor (the PSI — population stability index
    * — shape): exact fixed-width histograms of `value` over two corpus
    * slices, joined per bin, with each bin's shares and its PSI term
    * `(p−q)·ln(p/q)`. Emitted PER BIN rather than summed: the per-bin
    * rows are what an operator actually reads ("where did the mass
    * move"), and skipping the cross-bin sum keeps the output free of
    * float-summation-order sensitivity (each term is one exact-ratio
    * division + one ln, rounded — engine-replayable; the
    * conventional PSI>0.2 alarm is the sum of the term column). Bins
    * present on only one side carry a NULL term (ln 0 undefined — the
    * standard epsilon fudge hides exactly the mass a drift monitor
    * must surface) with the one-sided counts still visible.
    *
    * Scale: two partial-aggregated histogram shuffles of |bins| rows
    * each, a full outer join of two tiny frames, scalar math. */
  def distributionDrift(oldDf: DataFrame, newDf: DataFrame, value: Column,
      width: Int): DataFrame = {
    require(width > 0, "bucket width must be positive")
    // FLOOR division (DuckDB `//` semantics), not Spark's `div` which
    // truncates toward zero: a negative value one bucket below zero
    // must land in bucket -1, not bucket 0, on both engines
    def histo(df: DataFrame, cnt: String): DataFrame =
      df.select(value.cast(LongType).as("__v"))
        .groupBy(expr(
          s"CASE WHEN __v % $width < 0 THEN __v div $width - 1 ELSE __v div $width END")
          .as("bucket"))
        .agg(count(lit(1)).as(cnt))
    val joined = histo(oldDf, "n_old").join(histo(newDf, "n_new"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    // totals via window over the tiny bin frame (one aggregate pass,
    // no driver round-trip, no second scan of the inputs)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(lit(1))
    joined
      .withColumn("__to", sum("n_old").over(w))
      .withColumn("__tn", sum("n_new").over(w))
      .withColumn("p", round(col("n_old").cast(DoubleType) / col("__to"), 6))
      .withColumn("q", round(col("n_new").cast(DoubleType) / col("__tn"), 6))
      .withColumn("psi_term",
        when(col("n_old") > 0 && col("n_new") > 0,
          round((col("n_old").cast(DoubleType) / col("__to")
            - col("n_new").cast(DoubleType) / col("__tn"))
            * log(col("n_old").cast(DoubleType) * col("__tn")
              / (col("n_new").cast(DoubleType) * col("__to"))), 6)))
      .select(col("bucket"), col("n_old"), col("n_new"),
        col("p"), col("q"), col("psi_term"))
  }

  /** Pairwise source-overlap estimation via KMV (bottom-k) sketches:
    * each source keeps the k smallest md5(content) values; for a pair,
    * the k smallest of the merged signatures act as a uniform sample
    * of the union, and the fraction present in BOTH signatures
    * estimates Jaccard — the standard bottom-k containment/overlap
    * estimator, here for provenance questions like "how much of source
    * A is also in source B" across a corpus too large to intersect.
    *
    * Deterministic (md5 order, no RNG) and fully oracle-replayable —
    * unlike the HLL profile, the sketch VALUES are engine-stable, not
    * just the estimates. When k ≥ |A∪B| the estimate is exact.
    *
    * Scale: one distinct + one per-source bottom-k (WindowGroupLimit
    * prunes map-side); the pairwise stage runs on |sources| signature
    * ROWS (k hashes each), never on documents — |sources|² pairs of
    * k-element array ops, independent of corpus size. */
  def sourceOverlapKmv(df: DataFrame, sourceCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = df.select(col(sourceCol).as("src"), md5(col(textCol)).as("h")).distinct()
    val w = Window.partitionBy("src").orderBy("h")
    val sig = hashed.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy("src").agg(sort_array(collect_list("h")).as("sig"))
    val a = sig.select(col("src").as("source_a"), col("sig").as("sig_a"))
    val b = sig.select(col("src").as("source_b"), col("sig").as("sig_b"))
    val merged = slice(array_sort(array_union(col("sig_a"), col("sig_b"))), 1, k)
    a.join(b, col("source_a") < col("source_b"))
      .withColumn("__m", merged)
      .select(col("source_a"), col("source_b"),
        round(size(array_intersect(array_intersect(col("__m"), col("sig_a")), col("sig_b")))
          / least(lit(k), size(col("__m"))), 4).as("jaccard_est"))
  }

  /** Per-token KL-divergence contributions of each source's unigram
    * distribution against the whole corpus — the tokens that most
    * OVERREPRESENT a source relative to the mixture, i.e. the concrete
    * drivers behind a distribution shift that PSI-style monitors
    * ([[distributionDrift]]) only report in aggregate. For token w in
    * source s: contrib = p_s(w) · ln(p_s(w) / p(w)) with
    * p_s = c_s/t_s and p = c/t. All four operands are exact integer
    * counts, so each output row is a correctly-rounded ln of exact
    * rationals times an exact rational — bit-stable across engines, no
    * cross-row float accumulation anywhere (the whole-distribution KL
    * is the reader's sum over the emitted rows, never a hashed
    * output). Emits the topK tokens per source by contribution (desc,
    * token asc tiebreak); `+ 0.0` folds a −0.0 from rounding a tiny
    * negative contribution (underrepresented token inside the top-k
    * tail) per the repo's signed-zero rule.
    *
    * Scale: one tokenize + one (source, token) partial-agg shuffle;
    * source totals and corpus totals derive from the SAME counts frame
    * (|sources| and |tokens| rows); the corpus-total is a 1-row
    * broadcast; top-k is one rank window per source — never a global
    * sort, never a driver round-trip. */
  def tokenDivergence(df: DataFrame, sourceCol: String, textCol: String,
      topK: Int = 20): DataFrame = {
    require(topK > 0, "topK must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(sourceCol).as("source"),
        explode(split(trim(col(textCol)), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    val bySrc = toks.groupBy("source", "t").agg(count(lit(1)).as("c_s"))
    val srcTot = bySrc.groupBy("source").agg(sum("c_s").as("t_s"))
    val corpus = bySrc.groupBy("t").agg(sum("c_s").as("c"))
    val corpTot = bySrc.agg(sum("c_s").as("tt"))
    // ln((c_s·tt)/(c·t_s)) with the products taken in doubles: exact
    // longs would overflow at corpus scale (c_s·tt ~ 1e24 at 100 TB),
    // and IEEE mul/div/ln round identically on any engine
    val kl = bySrc.join(srcTot, "source").join(corpus, "t")
      .crossJoin(broadcast(corpTot))
      .withColumn("kl", (col("c_s").cast(DoubleType) / col("t_s").cast(DoubleType)) *
        log((col("c_s").cast(DoubleType) * col("tt").cast(DoubleType)) /
            (col("c").cast(DoubleType) * col("t_s").cast(DoubleType))))
    val w = Window.partitionBy("source").orderBy(col("kl").desc, col("t"))
    kl.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= topK)
      .select(col("source"), col("rk"), col("t").as("token"),
        col("c_s").as("n_tok"), (round(col("kl"), 6) + lit(0.0)).as("kl_contrib"))
  }
}
