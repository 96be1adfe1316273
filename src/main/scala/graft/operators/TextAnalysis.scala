package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language identification (n-gram/stopword heuristic) and
  * document fingerprinting. Pure Column expressions throughout — these
  * run per-document inside codegen at scan speed, the shape you want
  * when scoring 100 TB of raw text.
  */
object TextAnalysis {

  /** Whitespace token count — compiled kernel with exact parity to
    * `size(split(trim(text), "\\s+"))` (VmMatrixSpec differential);
    * the regex-split form materializes every token just to count them,
    * which dominated the per-doc stats scan at the sf10 smoke. */
  def tokenCount(text: Column): Column =
    graft.functions.VectorExpressions.token_count(text)

  /** BPE-ish subword count: word-boundary pieces + digits + punctuation
    * as separate tokens (a cheap proxy for tokenizer cost estimation). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"), t => t =!= "" && t =!= " "))
      .cast(LongType)

  /** Character count (matches the fixture's n_chars). */
  def charCount(text: Column): Column = length(text).cast(LongType)

  /** Punctuation ratio: punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)

  /** Mean word length. */
  def meanWordLen(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) /
      greatest(size(toks), lit(1)).cast(DoubleType)
  }

  /** Canonical text normalization — THE step before any content
    * hashing or dedup: unicode NFC (composed vs decomposed accents
    * hash differently raw), lowercase, whitespace collapse, trim.
    * Pure scan-stage Column (the NFC kernel has an is-normalized fast
    * path, free on ASCII corpora); DuckDB twin:
    * `trim(regexp_replace(lower(nfc_normalize(t)), '\s+', ' ', 'g'))`. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      lower(graft.functions.VectorExpressions.nfc(text)), "\\s+", " "))

  /** Unigram-LM quality score (the CCNet-style perplexity filter, with
    * the corpus itself as the LM): pass 1 fits token probabilities over
    * the whole corpus (top-`vocab` tokens; everything rarer scores at
    * the 1/total floor), pass 2 scores each document by its mean token
    * log-probability — templated/natural text scores high, gibberish
    * and rare-token soup score low. Filter on a corpus quantile of the
    * score to drop the tail.
    *
    * Scale: the vocabulary fit is one partial-aggregated token count +
    * a top-`vocab` heap (bounded result, independent of corpus size);
    * scoring explodes tokens once and joins the vocab UNHINTED (AQE
    * broadcasts the bounded table), then one per-doc aggregate. Mean
    * of ln() is float-summation-order sensitive → not oracle-gated;
    * the spec runs a local reference implementation instead. */
  def unigramQualityScore(df: DataFrame, idCol: String, textCol: String,
      vocab: Int = 65536): DataFrame = {
    val toks = df.select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    // ONE corpus tokenization fits the LM: the distinct-token count
    // frame is persisted for exactly the fit (total-mass action + the
    // top-vocab cut), then released; what stays RETAINED for the lazy
    // scoring join is only the `vocab`-row lm slice — the counts frame
    // is O(distinct tokens), unbounded at crawl scale, and must not
    // outlive the fit. The per-doc result itself stays lazy and
    // unpersisted (it is corpus-sized).
    var total = 0L
    val lm = Dedup.viaPersisted(toks.groupBy("t").agg(count(lit(1)).as("n"))) { counts =>
      total = counts.agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
      require(total > 0, "corpus has no tokens")
      counts.orderBy(col("n").desc, col("t")).limit(vocab)
        .select(col("t"), log(col("n").cast(DoubleType) / total).as("logp"))
    }
    val floor = math.log(1.0 / total)
    toks.join(lm, Seq("t"), "left")
      .groupBy(idCol)
      .agg(round(avg(coalesce(col("logp"), lit(floor))), 4).as("logprob"),
        count(lit(1)).as("n_tokens"))
  }

  /** Bigram-LM quality score (one order up from
    * [[unigramQualityScore]], toward the CCNet/KenLM perplexity
    * filter): fit P(b|a) = c(a,b) / c_ctx(a) on the corpus's adjacent
    * token pairs, keep the top `tableSize` bigrams (count desc, then
    * (a, b)), score each doc as the mean log-prob over its bigram
    * positions with unseen bigrams floored at ln(1/total_pairs), and
    * report perplexity exp(-mean). Docs with fewer than two tokens
    * have no bigram positions and drop out.
    *
    * Scale: same lifecycle as the unigram fit — the unbounded
    * distinct-bigram count frame lives only for the fit (persisted
    * stage inside viaPersisted), what stays retained is the
    * `tableSize`-row LM slice; scoring is a broadcast-able left join
    * against it, and the context counts derive from the SAME persisted
    * counts frame (one corpus tokenization total). */
  def bigramQualityScore(df: DataFrame, idCol: String, textCol: String,
      tableSize: Int = 65536): DataFrame = {
    // compiled kernel: one tight pass emits "a b" pair strings in
    // document order with multiplicity (the pure-Column HOF formulation
    // ran interpreted per element and was the sf1 smoke's slowest
    // stage); the pair string is also the single join/group key —
    // its lexicographic order equals (a, b) tuple order because the
    // space separator sorts below every token byte
    val pairs = df.select(col(idCol),
      explode(graft.functions.VectorExpressions.word_bigrams(col(textCol))).as("p"))
    var total = 0L
    val lm = Dedup.viaPersisted(
        pairs.groupBy("p").agg(count(lit(1)).as("n"))) { counts =>
      total = counts.agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
      require(total > 0, "corpus has no bigrams")
      val ctx = counts.groupBy(substring_index(col("p"), " ", 1).as("a"))
        .agg(sum("n").as("nc"))
      counts.orderBy(col("n").desc, col("p")).limit(tableSize)
        .withColumn("a", substring_index(col("p"), " ", 1))
        .join(ctx, "a")
        .select(col("p"), log(col("n").cast(DoubleType) / col("nc")).as("logp"))
    }
    val floor = math.log(1.0 / total)
    val scored = pairs.join(lm, Seq("p"), "left")
      .groupBy(idCol)
      .agg(avg(coalesce(col("logp"), lit(floor))).as("__m"),
        count(lit(1)).as("n_bigrams"))
    scored.select(col(idCol), round(col("__m"), 4).as("logprob"),
      round(exp(-col("__m")), 4).as("ppl"), col("n_bigrams"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2019): score every
    * document with the in-engine bigram LM ([[bigramQualityScore]]),
    * compute per-language head/middle/tail TERTILE thresholds, and
    * label each doc with its bucket — the canonical "train on
    * head+middle, drop tail" perplexity filter, with the LM fit on the
    * corpus itself instead of an external KenLM artifact.
    *
    * Thresholds are a |languages|-row aggregate joined back to the
    * scored scan (AQE broadcasts it), so bucket assignment adds NO
    * per-language global sort — an ntile() formulation would sort each
    * whole language partition on a single task, which dies at 100 TB
    * where one language can be 90% of the corpus. `exact=true` uses the
    * interpolated exact percentile (oracle-replayable: Spark
    * `percentile` and DuckDB `quantile_cont` share the p·(n−1)
    * definition, the pl_profile_quantiles precedent); at cluster scale
    * flip `exact=false` for the sketch-based `percentile_approx` and
    * the thresholds stop needing a per-language exact sort entirely.
    * Docs with fewer than two tokens have no bigram positions and drop
    * out, matching the scorer. */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      langCol: String, tableSize: Int = 65536,
      exact: Boolean = true): DataFrame = {
    val scored = bigramQualityScore(df, idCol, textCol, tableSize)
      .join(df.select(col(idCol), col(langCol)), Seq(idCol))
    val pcts = "array(CAST(1 AS DOUBLE)/3, CAST(2 AS DOUBLE)/3)"
    val q =
      if (exact) expr(s"percentile(ppl, $pcts)")
      else expr(s"percentile_approx(ppl, $pcts, 10000)")
    val th = scored.groupBy(col(langCol))
      .agg(round(element_at(q, 1), 4).as("__t1"),
        round(element_at(q, 2), 4).as("__t2"))
    scored.join(th, Seq(langCol))
      .select(col(idCol), col(langCol), col("ppl"),
        when(col("ppl") <= col("__t1"), lit("head"))
          .when(col("ppl") <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Deterministic hashed-projection document embedding — the
    * "embed raw text without a model" primitive that feeds
    * [[Dedup.semDeDup]], [[Similarity]] ANN, and diversity sampling
    * when no embedding column exists. Tokens hash into `buckets` term
    * frequencies (the [[hashBucket]] md5 scheme the classifier already
    * uses), which are then projected to `dim` components through a
    * fixed ±1 sign matrix derived from md5(b:d) — a sparse random
    * projection (Achlioptas 2003): cosine between projected vectors
    * approximates cosine between the hashed-tf vectors, so exact
    * duplicates embed identically and near-dup text embeds nearby.
    * Components are L2-normalized and rounded to 6 dp.
    *
    * Scale: one tokenize + one (id, bucket) partial-agg shuffle; the
    * (buckets x dim) sign table broadcasts; per-doc output is a
    * `dim`-float vector. Every hash is md5, and the component sums are
    * INTEGER-exact: with tf x = c/nt, the L2-normalized component is
    * (Σ c·sign)/nt ÷ (sqrt(Σ(Σ c·sign)²)/nt) = S_d/sqrt(Σ S_d²) with
    * S_d a LongType sum — the nt normalization cancels, so no
    * cross-row float accumulation exists anywhere in the chain (the
    * one float op is a correctly-rounded divide of exact integers,
    * bit-identical on any IEEE engine). The final `+ 0.0` folds -0.0
    * to +0.0 so a tiny-negative component that rounds to zero hashes
    * identically across engines. Docs with no tokens drop out. */
  def hashedEmbedding(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 64, dim: Int = 16): DataFrame = {
    require(buckets > 0 && dim > 0, "need buckets > 0 and dim > 0")
    // r16 shape (guide §2.4 "remove shuffles outright"): the old form
    // shuffled FOUR times past the (id, bucket) count — explode signs
    // (id,d) agg, per-id norm agg, norm join-back, final collect_list —
    // all of it per-document work. Since every component sum is an
    // exact LongType (counts × ±1 signs), the projection, norm and
    // rounding fold into ONE per-row expression over the per-doc
    // (bucket, count) list: 1 keyed shuffle + 1 per-id shuffle total
    // (and the per-id one vanishes into the fan-out partitioning
    // locally). Values are bit-identical: same integer sums in any
    // order, same single rounded IEEE divide per component.
    val base = FanOut.byKey(df.select(col(idCol), col(textCol)), col(idCol))
    val toks = base.select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    val counts = toks.withColumn("b", hashBucket(col("t"), buckets))
      .groupBy(idCol, "b").agg(count(lit(1)).as("c"))
    // fixed sign matrix, driver-built: sign(b, d) = +1 if the first
    // md5 hex nibble of "b:d" is < 8 else -1 — folded in as one flat
    // array literal indexed [b*dim + d] (constant-folded; stable
    // codegen via a single ArrayData reference)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(b: Int, d: Int): Long = {
      val h = md.digest(s"$b:$d".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xF) < 8) 1L else -1L
    }
    val signsFlat: IndexedSeq[Long] =
      for (b <- 0 until buckets; d <- 0 until dim) yield sign(b, d)
    // compiled projection kernel, not transform/aggregate HOFs: the
    // per-element interpreted lambdas (buckets×dim per doc) measured
    // 60 core-s on the sf1 corpus vs <1 for the tight loop — identical
    // values (exact long sums; Spark Round double semantics replicated)
    counts.groupBy(idCol)
      .agg(collect_list(struct(col("b"), col("c"))).as("__bc"))
      .select(col(idCol),
        graft.functions.VectorExpressions.hashed_embed(
          col("__bc"), signsFlat, dim).as("embedding"))
  }

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> enStop,
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "que", "pas"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "de", "que", "no"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"))

  /** Stopword ratio against the english list (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    size(array_intersect(array_distinct(toks), array(enStop.map(lit): _*))).cast(DoubleType) /
      greatest(size(array_distinct(toks)), lit(1)).cast(DoubleType)
  }

  /** Composite quality score in [0,1]: length band + low punctuation +
    * plausible word length (the usual C4/Gopher-style cheap filters). */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(50, 5000), 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.0)
    val wordOk = when(meanWordLen(text).between(2.0, 12.0), 1.0).otherwise(0.0)
    round((lenOk + punctOk + wordOk) / 3.0, 4)
  }

  /** Language ID: argmax of per-language stopword hits over the token
    * set. Returns "und" when nothing matches. */
  def languageId(text: Column): Column = {
    val toks = array_distinct(split(lower(trim(text)), "\\s+"))
    val scored = stopwords.toSeq.map { case (lang, words) =>
      struct(size(array_intersect(toks, array(words.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Order-insensitive content fingerprint: md5 over the sorted distinct
    * token set — catches shuffled/reordered near-identical docs.
    * Compiled kernel with exact parity to the Column chain
    * `md5(cast(concat_ws(" ", array_sort(array_distinct(filter(
    * split(lower(trim(text)), "\\s+"), _ =!= "")))) as binary))`
    * (VmMatrixSpec differential) — the chain's interpreted array ops
    * were the costliest per-doc work in the sf10 smoke. */
  def fingerprint(text: Column): Column =
    graft.functions.VectorExpressions.token_fingerprint(text)

  /** Rolling-hash shingle fingerprint (winnowing-lite): min xxhash64
    * over character 8-grams — stable under small edits at the ends. */
  def rollingMinHash(text: Column): Column =
    aggregate(Dedup.charShingles(text, 8), lit(Long.MaxValue),
      (acc, s) => least(acc, xxhash64(s)))

  /** Position capacity per document for [[winnowFingerprints]]' packed
    * (hash, position) ordering key: 2^21 token positions (≈10 MB of
    * text per doc). hash(40 bit) * 2^21 stays inside a signed long. */
  private[operators] val WinnowPosRange: Long = 1L << 21

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every OVERLAPPING word
    * k-gram, then from each sliding window of `w` consecutive gram
    * hashes keep the minimum, breaking ties toward the RIGHTMOST
    * position. Guarantee: any token run of length >= w + k - 1 shared
    * by two documents shares at least one selected fingerprint, at an
    * expected density of 2/(w+1) of the grams — a compact, alignment-
    * free sketch for copy detection (the reference's fingerprinting
    * surface is hash builtins over whole fields, expr/builtins.go;
    * this is the local-substring analog a crawl pipeline needs).
    *
    * Determinism: the rightmost-min rule is realized by ONE packed
    * integer key `h * 2^21 + (2^21-1-p)` — min(key) == (min hash,
    * max position) — so a rolling `min` window replays identically in
    * any engine (no float, no argmin tie ambiguity). Positions beyond
    * 2^21 would fold into the hash bits; docs that large should be
    * chunked first ([[graft.operators.Curation.chunkDocuments]]).
    *
    * Scale: gram hashing is a per-row transform (scan stage); the only
    * shuffle is the per-document window (grams of one doc co-locate,
    * same shape as [[Dedup.repeatedSpans]]' island merge). Output is
    * ~2/(w+1) of the gram count — the downstream index is ~60% smaller
    * than a full inverted gram index at w=4. Docs shorter than k
    * tokens yield no fingerprints (no gram exists).
    *
    * Returns (idCol, fp_pos, fp_hash): selected gram start positions
    * (0-based) and their 40-bit gram hashes. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    require(k > 0 && w > 0, "need k>0, w>0")
    import org.apache.spark.sql.expressions.Window
    val toks = split(trim(col(textCol)), "\\s+")
    // fan out BEFORE the per-gram md5 transform (guide §2.5): locally
    // the docs scan is one task and the hashing serializes on it; the
    // doc-id partitioning is also exactly what the per-doc min-window
    // below needs, so the window's exchange disappears
    val base = FanOut.byKey(
      df.select(col(idCol), toks.as("__t")).filter(size(col("__t")) >= k),
      col(idCol))
    val gramHashes = transform(
      sequence(lit(0), size(col("__t")) - k),
      p => conv(substring(md5(concat_ws(" ", slice(col("__t"), p + 1, lit(k)))
        .cast(BinaryType)), 1, 10), 16, 10).cast(LongType))
    val grams = base.select(col(idCol), posexplode(gramHashes).as(Seq("p", "h")))
    val byPos = Window.partitionBy(idCol).orderBy("p")
    val sel = grams
      .withColumn("__k", col("h") * WinnowPosRange + (lit(WinnowPosRange - 1) - col("p")))
      .withColumn("__m", min(col("__k")).over(byPos.rowsBetween(-(w - 1), 0)))
      .withColumn("__last", max(col("p")).over(Window.partitionBy(idCol)))
      // windows are trailing: rows before w-1 see a clipped window that a
      // full window at p=w-1 re-covers — except in docs with fewer than w
      // grams, where the LAST row's clipped window spans the whole doc
      .filter(col("p") >= w - 1 || col("p") === col("__last"))
      .select(col(idCol), col("__m")).distinct()
    sel.select(col(idCol),
      (lit(WinnowPosRange - 1) - (col("__m") % WinnowPosRange)).as("fp_pos"),
      expr(s"__m div ${WinnowPosRange}L").as("fp_hash"))
  }

  /** Document-pair overlap from winnowed fingerprints: pairs sharing at
    * least `minShared` distinct fingerprint hashes, with the shared
    * count — the MOSS-style copy/plagiarism report over a corpus.
    *
    * Scale: the candidate stage is an inverted-index self-join on the
    * fingerprint hash, C(df,2) pairs per hash — `maxDf` drops hashes
    * present in more documents than that (boilerplate fingerprints; the
    * same over-common-feature cut MOSS applies), so candidate volume
    * tracks true overlap density, not shared-boilerplate frequency. */
  def winnowOverlapPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, minShared: Int = 2, maxDf: Int = 1000): DataFrame =
    winnowOverlapPairsFromIndex(
      winnowFingerprints(df, idCol, textCol, k, w), idCol, minShared, maxDf)

  /** [[winnowOverlapPairs]] over an already-built fingerprint frame —
    * the ship-the-index path: [[winnowFingerprints]]' output IS the
    * persistable artifact (a narrow (id, fp_pos, fp_hash) table,
    * parquet round-trip safe — integers only), so a corpus is
    * fingerprinted ONCE and every later overlap/containment/delta call
    * reads the stored frame instead of re-running the gram window over
    * 100 TB of text. Mirrors [[Dedup.MinHashIndex]].
    *
    * Eager materialization (ADVICE r16): building the RESULT frame runs
    * Spark jobs at construction time — the distinct fingerprint index
    * is persisted and counted via [[Dedup.viaPersisted]] before this
    * returns (same for the matched-regions/containment variants), and
    * the blocks stay pinned until [[Dedup.releaseAll]] or LRU eviction.
    * Callers building frames only for plan inspection should expect the
    * fingerprint pipeline to execute. */
  def winnowOverlapPairsFromIndex(fps: DataFrame, idCol: String,
      minShared: Int = 2, maxDf: Int = 1000): DataFrame = {
    require(minShared > 0 && maxDf > 1, "need minShared>0, maxDf>1")
    // persist the distinct index once (guide §5 "caching is worth it
    // when a frame is reused and recomputation is expensive"): it is
    // consumed THREE times below (df count + both self-join sides),
    // and when `fps` is the in-engine fingerprint pipeline each
    // broadcast build side would otherwise re-run the whole gram
    // window — measured as 2-4 CONCURRENT re-evaluations thrashing
    // execution memory at sf0.1 (pl_winnow_containment 78→250 core-s
    // across reps). The cached frame is (id, hash) integers — index-
    // sized, never corpus-sized.
    Dedup.viaPersisted(
      fps.select(col(idCol).as("__id"), col("fp_hash").as("__h")).distinct()
    ) { f =>
      val rare = f.groupBy("__h").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select("__h")
      val idx = f.join(rare, Seq("__h"), "left_semi")
      idx.select(col("__id").as("id_a"), col("__h"))
        .join(idx.select(col("__id").as("id_b"), col("__h")), Seq("__h"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
    }
  }

  /** Delta-mine against a stored winnow index: fingerprint ONLY the
    * `delta` docs, then report overlap pairs that TOUCH the delta
    * (delta-vs-corpus and delta-vs-delta; corpus-corpus pairs are the
    * stored index's business and are never re-mined). The `maxDf`
    * boilerplate cut is computed over the COMBINED corpus+delta
    * document frequency, so a fingerprint that becomes boilerplate
    * only once the delta arrives is cut exactly as a full rebuild
    * would cut it.
    *
    * Scale: the corpus side contributes only its (id, hash) index rows
    * to the join — no text, no gram window; the corpus-corpus join
    * product is never formed (left side of the candidate join is
    * delta-only). */
  def winnowOverlapPairsDelta(indexFps: DataFrame, delta: DataFrame,
      idCol: String, textCol: String, k: Int = 8, w: Int = 4,
      minShared: Int = 2, maxDf: Int = 1000): DataFrame = {
    require(minShared > 0 && maxDf > 1, "need minShared>0, maxDf>1")
    // persist the delta fingerprints (consumed via `all` twice and via
    // dIdx — three gram-window re-evaluations otherwise) and the
    // combined index (rare + allIdx). Both are (id, hash) index rows.
    Dedup.viaPersisted(
      winnowFingerprints(delta, idCol, textCol, k, w)
        .select(col(idCol).as("__id"), col("fp_hash").as("__h")).distinct()
    ) { dFps =>
      val cFps = indexFps.select(col(idCol).as("__id"), col("fp_hash").as("__h")).distinct()
      Dedup.viaPersisted(cFps.unionByName(dFps)) { all =>
        val rare = all.groupBy("__h").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxDf).select("__h")
        val dIdx = dFps.join(rare, Seq("__h"), "left_semi")
        val allIdx = all.join(rare, Seq("__h"), "left_semi")
        dIdx.select(col("__id").as("id_l"), col("__h"))
          .join(allIdx.select(col("__id").as("id_r"), col("__h")), Seq("__h"))
          .filter(col("id_l") =!= col("id_r"))
          .select(least(col("id_l"), col("id_r")).as("id_a"),
            greatest(col("id_l"), col("id_r")).as("id_b"), col("__h"))
          .distinct() // delta-delta pairs surface once from each side
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= minShared)
      }
    }
  }

  /** Matched-region bounds per overlapping pair — the report a
    * MOSS-style tool renders: for each pair passing the
    * [[winnowOverlapPairs]] gate, the min/max token positions of the
    * SHARED fingerprints on each side (the approximate extent of the
    * copied region; for verbatim copies shared fingerprint positions
    * always lie inside the true match). Same inverted-index shape and
    * `maxDf` cut; the position aggregates ride the pair groupBy for
    * free. */
  def winnowMatchedRegions(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, minShared: Int = 2, maxDf: Int = 1000): DataFrame =
    winnowMatchedRegionsFromIndex(
      winnowFingerprints(df, idCol, textCol, k, w), idCol, minShared, maxDf)

  /** [[winnowMatchedRegions]] over a stored fingerprint frame (ship-
    * the-index path; needs fp_pos, which the artifact carries).
    * Eagerly materializes the positioned index at construction time —
    * see [[winnowOverlapPairsFromIndex]]. */
  def winnowMatchedRegionsFromIndex(fps0: DataFrame, idCol: String,
      minShared: Int = 2, maxDf: Int = 1000): DataFrame = {
    require(minShared > 0 && maxDf > 1, "need minShared>0, maxDf>1")
    // persist the positioned index once — consumed three times (rare
    // count + both self-join sides); see winnowOverlapPairsFromIndex
    Dedup.viaPersisted(fps0.select(col(idCol).as("__id"),
        col("fp_pos").as("__p"), col("fp_hash").as("__h"))) { fps =>
      val rare = fps.select("__id", "__h").distinct()
        .groupBy("__h").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select("__h")
      val idx = fps.join(rare, Seq("__h"), "left_semi")
      idx.select(col("__id").as("id_a"), col("__h"), col("__p").as("pa"))
        .join(idx.select(col("__id").as("id_b"), col("__h"), col("__p").as("pb")),
          Seq("__h"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(countDistinct(col("__h")).as("n_shared"),
          min("pa").as("a_start"), max("pa").as("a_end"),
          min("pb").as("b_start"), max("pb").as("b_end"))
        .filter(col("n_shared") >= minShared)
    }
  }

  /** Directed containment detection over winnowed fingerprints: emit
    * (id_sub, id_super) when at least `minPermill`/1000 of id_sub's
    * distinct fingerprints also appear in id_super — the ASYMMETRIC
    * complement of [[winnowOverlapPairs]] (a short quote scores high
    * containment in its source while their symmetric overlap stays
    * low). The screen that finds subset/excerpt documents worth
    * dropping in favor of their superset.
    *
    * The threshold compare is integer-exact (`shared·1000 >=
    * minPermill·|fp(sub)|`); the reported `containment` is one IEEE
    * long/long division rounded to 4 dp. Same inverted-index shape and
    * `maxDf` boilerplate cut as the overlap report; the directed pair
    * stream is both orientations of each undirected candidate. The
    * denominator deliberately counts sub's fingerprints BEFORE the
    * maxDf cut: a doc made of boilerplate scores containment ~0
    * everywhere instead of a false 1.0 against every other
    * boilerplate carrier. */
  def winnowContainmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, minPermill: Int = 800, maxDf: Int = 1000): DataFrame =
    winnowContainmentPairsFromIndex(
      winnowFingerprints(df, idCol, textCol, k, w), idCol, minPermill, maxDf)

  /** [[winnowContainmentPairs]] over a stored fingerprint frame
    * (ship-the-index path). Eagerly materializes the distinct index at
    * construction time — see [[winnowOverlapPairsFromIndex]]. */
  def winnowContainmentPairsFromIndex(fps0: DataFrame, idCol: String,
      minPermill: Int = 800, maxDf: Int = 1000): DataFrame = {
    require(minPermill > 0 && minPermill <= 1000, "minPermill in (0, 1000]")
    require(maxDf > 1, "need maxDf>1")
    // persist the distinct index once — consumed FOUR times here (nFp,
    // rare, both self-join sides); the uncached form re-ran the whole
    // in-engine fingerprint pipeline per consumer, concurrently
    // (measured: 78→250 core-s rep drift at sf0.1)
    Dedup.viaPersisted(fps0
      .select(col(idCol).as("__id"), col("fp_hash").as("__h")).distinct()) { fps =>
      val nFp = fps.groupBy("__id").agg(count(lit(1)).as("__nfp"))
      val rare = fps.groupBy("__h").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select("__h")
      val idx = fps.join(rare, Seq("__h"), "left_semi")
      idx.select(col("__id").as("id_sub"), col("__h"))
        .join(idx.select(col("__id").as("id_super"), col("__h")), Seq("__h"))
        .filter(col("id_sub") =!= col("id_super"))
        .groupBy("id_sub", "id_super").agg(count(lit(1)).as("n_shared"))
        .join(nFp.withColumnRenamed("__id", "id_sub"), Seq("id_sub"))
        .filter(col("n_shared") * 1000 >= lit(minPermill) * col("__nfp"))
        .select(col("id_sub"), col("id_super"), col("n_shared"),
          round(col("n_shared").cast(DoubleType) / col("__nfp"), 4).as("containment"))
    }
  }

  /** Gopher-style repetition screens: duplicate-word fraction and the
    * character mass of the most frequent word bigram. High values flag
    * boilerplate/spam documents that survive exact dedup (the standard
    * repetition filters run alongside [[qualityScore]]).
    *
    * Scale: `dup_word_frac` is pure Column; the top-bigram stats are one
    * compiled pass per document
    * ([[graft.functions.VectorExpressions.TopNgramStats]]) — no explode,
    * no shuffle, the whole screen runs at scan speed. The struct is
    * consumed via three getFields; projection collapse re-evaluates the
    * kernel per field, a deliberate trade (3 cheap per-doc passes) to
    * stay shuffle-free. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = split(trim(t), "\\s+")
    val top = graft.functions.VectorExpressions.top_ngram(t, 2)
    df.select(col(idCol),
      round(lit(1.0) - size(array_distinct(toks)).cast(DoubleType) /
        greatest(size(toks), lit(1)).cast(DoubleType), 4).as("dup_word_frac"),
      top.getField("ngram").as("top_bigram"),
      top.getField("n").as("top_bigram_n"),
      round(top.getField("frac"), 4).as("top_bigram_frac"))
  }

  /** Deterministic md5 feature-hash bucket: first 8 hex chars of
    * md5(token) as an integer, mod `buckets` — the DuckDB twin is
    * `('0x' || substr(md5(t), 1, 8))::BIGINT % buckets`, same shape as
    * [[Curation.md5Permill]] so oracles can replay the hashing. */
  def hashBucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok.cast(BinaryType)), 1, 8), 16, 10)
      .cast(LongType) % buckets

  /** Hashed bag-of-tokens features for the linear classifier: one row
    * per (doc, bucket) with the doc-relative term frequency
    * x = count_bucket / n_tokens, PLUS one bias pseudo-feature row per
    * doc (b = `buckets`, x = 1.0) — the bias is just a feature that is
    * always on, which lets one per-bucket gradient aggregation update
    * the whole model (no separate bias pass per GD round). Token-less
    * documents vanish (no features ⇒ no defined score). */
  private def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      labelCol: Column, buckets: Int): DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
        labelCol.cast(DoubleType).as("__y"),
        explode(split(trim(col(textCol)), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    val counts = toks.withColumn("b", hashBucket(col("t"), buckets))
      .groupBy("__id", "__y", "b").agg(count(lit(1)).as("c"))
    val nt = counts.groupBy("__id").agg(sum("c").as("__nt"))
    counts.join(nt, "__id")
      .select(col("__id"), col("__y"), col("b"),
        (col("c").cast(DoubleType) / col("__nt").cast(DoubleType)).as("x"))
      .unionByName(counts.select("__id", "__y").distinct()
        .select(col("__id"), col("__y"),
          lit(buckets.toLong).as("b"), lit(1.0).as("x")))
  }

  /** Per-doc margin → probability under a literal-array weight model
    * (last slot = bias, matching the pseudo-feature): the weights
    * broadcast inside the plan (an array literal, no join), so scoring
    * is tokenize → hash → one per-doc aggregate. */
  private def sigmoidScores(feat: DataFrame, weightsAndBias: Array[Double]): DataFrame = {
    val wArr = array(weightsAndBias.map(lit): _*)
    feat.groupBy("__id", "__y")
      .agg(sum(col("x") * element_at(wArr, (col("b") + 1).cast(IntegerType))).as("m"))
      .select(col("__id"), col("__y"),
        (lit(1.0) / (lit(1.0) + exp(-col("m")))).as("p"))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** In-engine fastText-style quality classifier TRAINING: logistic
    * regression over md5-hashed bag-of-tokens term frequencies, fit by
    * `iters` rounds of full-batch gradient descent. The standard
    * quality-filter shape (GPT-3/CCNet style: label a trusted slice
    * positive, the raw crawl negative, keep high-scoring docs) —
    * trained BY the engine instead of imported. Returns
    * (weights[buckets], bias).
    *
    * Determinism: weights start at zero, every update rounds to 6
    * decimals (w ← round(w − lr·∇, 6), the k-means-trajectory
    * discipline), features hash via md5 — the whole trajectory replays
    * in DuckDB, so [[scoreClassifier]] outputs are oracle-gateable.
    *
    * Scale: the feature frame (doc × distinct-bucket, ≤ min(tokens,
    * `buckets`) rows per doc) persists once and serves every round; a
    * round is two aggregations — per-doc margins (weights enter as a
    * broadcast literal array, no join) and per-bucket gradients (one
    * shuffle on the bucket key, ≤ `buckets` result rows). Driver
    * traffic per round is one ≤`buckets`-row collect. Train on a
    * labeled sample; score the full corpus with the returned model. */
  def trainClassifier(df: DataFrame, idCol: String, textCol: String,
      labelCol: Column, buckets: Int = 256, iters: Int = 3,
      lr: Double = 0.5): (Array[Double], Double) = {
    require(buckets > 0 && buckets <= 65536, "buckets must be in (0, 65536]")
    require(iters >= 1, "iters must be >= 1")
    // weights(0..buckets-1) = hashed features, weights(buckets) = bias
    var weights = Array.fill(buckets + 1)(0.0)
    // manual persist (not viaPersisted: the result here is driver-side
    // weights, not a DataFrame) — eager materialize, release in finally
    val feat = hashedFeatures(df, idCol, textCol, labelCol, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // nDocs rides the first round's gradient collect (r17): the bias
      // pseudo-feature bucket holds exactly one row per doc, so its
      // row count IS the doc count — the old upfront cache-warming
      // count() was a whole extra job per training query (round 1's
      // margins job warms the cache just as well). The ÷nDocs moves
      // from the agg projection to the driver: the same IEEE double
      // division of the same sums, so the weight trajectory is
      // bit-identical.
      var nDocs = 0L
      for (it <- 1 to iters) {
        // ONE aggregation + one ≤(buckets+1)-row collect per GD round:
        // per-bucket gradient SUM of the logistic loss (the bias
        // bucket rides along via its always-on pseudo-feature); one
        // row per OBSERVED bucket (unobserved ⇒ zero gradient)
        val margins = sigmoidScores(feat, weights)
        val sums = feat.join(margins.select("__id", "p"), "__id")
          .groupBy("b")
          .agg(sum((col("p") - col("__y")) * col("x")).as("s"),
            count(lit(1)).as("c"))
          .collect().map(r => (r.getLong(0).toInt, (r.getDouble(1), r.getLong(2))))
        if (it == 1) {
          nDocs = sums.collectFirst { case (b, (_, c)) if b == buckets => c }
            .getOrElse(0L)
          require(nDocs > 0, "no documents with tokens to train on")
        }
        val grads = sums.map { case (b, (s, _)) => b -> s / nDocs }.toMap
        weights = Array.tabulate(buckets + 1)(i =>
          round6(weights(i) - lr * grads.getOrElse(i, 0.0)))
      }
    } finally feat.unpersist(blocking = false)
    (weights.init, weights.last)
  }

  /** Score documents under a trained [[trainClassifier]] model. The
    * tf·w margin collapses algebraically to token level —
    * Σ_b (c_b/NT)·w_b = (Σ_tokens w[bucket(token)]) / NT — and the
    * whole per-doc computation (tokenize → md5 bucket → weight sum)
    * runs as ONE compiled pass per row
    * ([[graft.functions.VectorExpressions.TokenBucketMargin]], weights
    * baked in as a literal): scoring is pure scan work, ZERO exchanges
    * (PlanSpec-gated) — the shape that scores 100 TB. Tokens hashing
    * to buckets unseen in training score w=0 but still count in the
    * denominator. Token-less docs are absent (null margin filtered —
    * same effect as the explode dropping them). */
  def scoreClassifier(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], bias: Double): DataFrame = {
    val m = graft.functions.VectorExpressions.token_margin(
      col(textCol), weights.toSeq, bias)
    df.select(col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-m)), 4).as("score"))
      .filter(col("score").isNotNull)
  }

  /** The trained [[trainClassifier]] model as a shippable table: one
    * (slot, weight) row per hashed-feature slot, the bias at slot
    * `buckets` — written to parquet once, loaded by any later job to
    * score any corpus via [[classifierFromTable]] +
    * [[scoreClassifier]], the same fit-once/apply-forever contract as
    * the BPE merge table and the dedup/winnow indexes. */
  def classifierToTable(spark: org.apache.spark.sql.SparkSession,
      weights: Array[Double], bias: Double): DataFrame = {
    import spark.implicits._
    // one partition (r17, guide §6): the model is buckets+1 rows by
    // definition — without the coalesce a ship write fans the tiny
    // table into defaultParallelism near-empty files (measured at
    // local[32]: 32 tasks, ~1.5 s of pure task overhead per write)
    (weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq :+
      ((weights.length.toLong, bias))).toDF("slot", "weight").coalesce(1)
  }

  /** Reconstruct (weights, bias) from a persisted
    * [[classifierToTable]] frame (the collect is model-sized —
    * buckets+1 rows — by definition). */
  def classifierFromTable(table: DataFrame): (Array[Double], Double) = {
    val all = table.select("slot", "weight").collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).sortBy(_._1).map(_._2)
    require(all.length >= 2, "classifier table needs at least one weight + bias")
    (all.init, all.last)
  }

  /** Per-source rank normalization of a score column: each doc's
    * percentile rank WITHIN its source (0 = worst, 1 = best; ties
    * break by id, single-doc sources score 1.0) — the cross-source
    * calibration step a curation pipeline applies before thresholding
    * a learned score globally: raw classifier scores shift with each
    * source's token statistics (a fixed absolute cut keeps all of one
    * source and none of another), while "top 30% of every source"
    * composes fairly. Rank arithmetic is integer-exact
    * ((rank−1)/(n−1), one IEEE division, 6 dp).
    *
    * Scale: one rank window + one count per source (broadcast-joined
    * back); the score column is any deterministic Column —
    * [[scoreClassifier]]'s output being the intended one. */
  def rankNormalize(df: DataFrame, idCol: String, sourceCol: String,
      score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
    df.select(col(idCol), col(sourceCol), score.as("score"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(sourceCol).orderBy(col("score").asc, col(idCol))))
      .join(broadcast(n), Seq(sourceCol))
      .withColumn("src_pct",
        when(col("__n") === 1, lit(1.0)).otherwise(
          round((col("__r") - 1).cast(DoubleType) / (col("__n") - 1), 6)))
      .select(col(idCol), col(sourceCol), col("score"), col("src_pct"))
  }

  /** Evaluate a trained [[trainClassifier]] model against labels at a
    * decision threshold: ONE bounded row with the confusion counts and
    * the derived metrics. Thresholding uses the same rounded
    * probability [[scoreClassifier]] emits, so a boundary doc
    * classifies identically in every engine. Same join-free
    * token-level scoring shape; the metric divisions are exact
    * small-integer ratios (engine-identical), f1 via 2tp/(2tp+fp+fn).
    * The driver sees one row — evaluation of a 100 TB corpus ships
    * nothing else. */
  def evaluateClassifier(df: DataFrame, idCol: String, textCol: String,
      labelCol: Column, weights: Array[Double], bias: Double,
      threshold: Double = 0.5): DataFrame = {
    val m = graft.functions.VectorExpressions.token_margin(
      col(textCol), weights.toSeq, bias)
    val scored = df.select(labelCol.cast(DoubleType).as("__y"),
        round(lit(1.0) / (lit(1.0) + exp(-m)), 4).as("p"))
      .filter(col("p").isNotNull)
    val pos = col("p") >= threshold
    val yq = col("__y") === 1.0
    val d = (c: Column) => c.cast(DoubleType)
    scored.agg(
        count(lit(1)).as("n"),
        sum(when(pos && yq, 1L).otherwise(0L)).as("tp"),
        sum(when(pos && !yq, 1L).otherwise(0L)).as("fp"),
        sum(when(!pos && !yq, 1L).otherwise(0L)).as("tn"),
        sum(when(!pos && yq, 1L).otherwise(0L)).as("fn"))
      .select(col("n"), col("tp"), col("fp"), col("tn"), col("fn"),
        round(d(col("tp") + col("tn")) / d(col("n")), 4).as("accuracy"),
        round(when(col("tp") + col("fp") === 0, lit(0.0))
          .otherwise(d(col("tp")) / d(col("tp") + col("fp"))), 4).as("prec"),
        round(when(col("tp") + col("fn") === 0, lit(0.0))
          .otherwise(d(col("tp")) / d(col("tp") + col("fn"))), 4).as("recall"),
        round(when(lit(2) * col("tp") + col("fp") + col("fn") === 0, lit(0.0))
          .otherwise(d(lit(2) * col("tp")) /
            d(lit(2) * col("tp") + col("fp") + col("fn"))), 4).as("f1"))
  }

  /** Calibration curve for a trained [[trainClassifier]] model: bucket
    * the corpus into `bins` equal-width score bins (floor(score·bins),
    * top bucket capped at bins−1) and report per-bin doc count, mean
    * score, and observed positive-label rate — the "can the score be
    * trusted as a keep/drop or sampling weight?" check a
    * classifier-filtered corpus needs before thresholding (a
    * well-calibrated model has pos_rate ≈ mean_score per bin). The bin
    * is integer arithmetic over the same 4-dp rounded probability
    * [[scoreClassifier]] emits, so a boundary doc buckets identically
    * in every engine; a weakly-separating model concentrates its
    * scores, so pick `bins` fine enough to resolve the observed range
    * (100 resolves 4-dp scores to ~centiles).
    *
    * Scale: scoring is the same join-free compiled token-margin scan
    * as [[scoreClassifier]]; the curve is ONE ≤`bins`-row aggregate —
    * the driver sees at most `bins` rows for a 100 TB corpus. */
  def calibrationCurve(df: DataFrame, idCol: String, textCol: String,
      labelCol: Column, weights: Array[Double], bias: Double,
      bins: Int = 10): DataFrame = {
    require(bins > 0 && bins <= 10000, "bins must be in (0, 10000]")
    val m = graft.functions.VectorExpressions.token_margin(
      col(textCol), weights.toSeq, bias)
    val scored = df.select(labelCol.cast(DoubleType).as("__y"),
        round(lit(1.0) / (lit(1.0) + exp(-m)), 4).as("p"))
      .filter(col("p").isNotNull)
    scored
      .groupBy(least(floor(col("p") * bins), lit(bins - 1L)).as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("p")), 4).as("mean_score"),
        round(avg(col("__y")), 4).as("pos_rate"))
      .orderBy("bin")
  }

  /** Train on `df` and score the same frame — the single-call form the
    * oracle gate exercises end to end. */
  def trainAndScoreClassifier(df: DataFrame, idCol: String, textCol: String,
      labelCol: Column, buckets: Int = 256, iters: Int = 3,
      lr: Double = 0.5): DataFrame = {
    val (w, b) = trainClassifier(df, idCol, textCol, labelCol, buckets, iters, lr)
    scoreClassifier(df, idCol, textCol, w, b)
  }

  /** Operating-point curve for a score-gated screen: for each
    * threshold, the documents and token mass RETAINED at
    * `score >= threshold` — the quality-vs-quantity tradeoff read
    * before choosing where to set a classifier gate (the cumulative
    * complement of [[calibrationCurve]]'s per-bin view). Counts and
    * token sums are exact integers; the two fractions are one
    * correctly-rounded divide of exact integers each (6 dp, −0.0
    * folded), so nothing hashed carries a cross-row float sum.
    *
    * Scale: ONE aggregate over the scored frame — two conditional
    * aggregates per threshold in a single partial+final pass (never a
    * re-scan per threshold, never a |thresholds|× row explosion), then
    * a |thresholds|-row literal unpivot of the 1-row result. */
  def thresholdSweep(scored: DataFrame, scoreCol: String, tokensCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(count(when(col(scoreCol) >= t, 1)).as(s"__n_$i"),
          sum(when(col(scoreCol) >= t, col(tokensCol))).as(s"__tk_$i"))
    } ++ Seq(count(lit(1)).as("__n_all"),
             sum(col(tokensCol).cast(LongType)).as("__tk_all"))
    val one = scored.agg(aggs.head, aggs.tail: _*)
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"),
        col(s"__n_$i").as("docs_kept"),
        coalesce(col(s"__tk_$i").cast(LongType), lit(0L)).as("tokens_kept"))
    }
    one.select(explode(array(rows: _*)).as("r"),
        col("__n_all").as("docs_total"), col("__tk_all").as("tokens_total"))
      .select(col("r.threshold").as("threshold"),
        col("r.docs_kept").as("docs_kept"), col("r.tokens_kept").as("tokens_kept"),
        col("docs_total"), col("tokens_total"),
        (round(col("r.docs_kept").cast(DoubleType) /
          col("docs_total").cast(DoubleType), 6) + lit(0.0)).as("frac_docs"),
        (round(col("r.tokens_kept").cast(DoubleType) /
          col("tokens_total").cast(DoubleType), 6) + lit(0.0)).as("frac_tokens"))
  }

  /** One-stop per-document stats frame. */
  def documentStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      tokenCount(t).as("n_tokens"),
      charCount(t).as("n_chars"),
      round(punctRatio(t), 4).as("punct_ratio"),
      round(meanWordLen(t), 4).as("mean_word_len"),
      round(stopwordRatio(t), 4).as("stopword_ratio"),
      qualityScore(t).as("quality"),
      languageId(t).as("lang_guess"),
      fingerprint(t).as("fingerprint"))
  }
}
