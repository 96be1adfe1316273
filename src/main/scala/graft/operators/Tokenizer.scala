package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Tokenizer fitting for LLM training pipelines: byte-pair-encoding
  * (BPE, Sennrich et al. 2016) learned distributedly over a corpus.
  *
  * The classic algorithm operates on the WORD-TYPE frequency table, not
  * the corpus: each distinct word is a sequence of symbols (initially
  * its characters), and each round merges the globally most frequent
  * adjacent symbol pair. That structure is what makes it cheap at
  * 100 TB:
  *
  *  - the corpus is touched ONCE (tokenize + groupBy word) — after
  *    that, every Lloyd-style merge round runs over the vocabulary
  *    frame, whose size is bounded by |vocab| (millions), not corpus
  *    rows (billions); pair counting is a map-side-combinable groupBy
  *    weighted by word frequency;
  *  - exactly ONE row (the winning pair) returns to the driver per
  *    round;
  *  - applying the learned merges back to documents is a join of
  *    exploded corpus tokens against the (small, broadcast-able)
  *    final vocabulary frame.
  *
  * Symbol sequences are encoded as strings: symbols joined by TWO
  * spaces with a single-space sentinel at each end (`" l  o  w "`).
  * A merge of pair (a, b) is then the literal string replacement
  * `" a  b " -> " ab "` — the double-space separator guarantees a
  * match can never straddle a symbol boundary, and the consumed
  * boundary spaces are restored by the replacement's own sentinels, so
  * consecutive occurrences (`a a a a` with merge `a+a`) merge exactly
  * like greedy left-to-right BPE. Both Spark's `replace` and DuckDB's
  * `replace` scan left-to-right non-overlapping, so the trajectory is
  * replayable cross-engine (the oracle unrolls it round by round).
  */
object Tokenizer {

  /** One learned merge: rank (1-based), the pair's two symbols, the
    * merged symbol, and the pair's corpus frequency when chosen. */
  final case class Merge(rank: Int, left: String, right: String,
      merged: String, count: Long)

  /** Initial symbol-sequence encoding of a word: characters joined by
    * two spaces, one-space sentinels. */
  private def charSeq(w: Column): Column =
    concat(lit(" "),
      array_join(transform(sequence(lit(1), length(w)),
        i => w.substr(i, lit(1))), "  "),
      lit(" "))

  /** Adjacent symbol pairs of a seq as "left right" strings. */
  private def seqPairs(seq: Column): Column = {
    val ws = split(trim(seq), "  ")
    filter(
      zip_with(ws, slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)), // concat null-propagates past the end
      p => p.isNotNull)
  }

  /** Word-type frequency frame: one row per distinct word with its
    * corpus count and initial character sequence — the single
    * corpus-wide scan of the whole fit. */
  def wordTypes(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .withColumn("seq", charSeq(col("w")))

  /** Corpus-wide adjacent-pair frequencies of a (w, n, seq) vocab
    * frame, heaviest first (count desc, pair asc). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(explode(seqPairs(col("seq"))).as("pair"), col("n"))
      .groupBy("pair").agg(sum("n").as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)

  /** Fit `rounds` BPE merges. Returns the merge table and the final
    * vocabulary frame (w, n, seq) with all merges applied. The vocab
    * frame is persisted across rounds (it is vocab-sized, not
    * corpus-sized); each round reads it once for pair counting and
    * chains one `replace` onto the lineage. Stops early if no pair is
    * left to merge. */
  def bpeTrain(df: DataFrame, textCol: String, rounds: Int)
      : (Seq[Merge], DataFrame) = {
    val merges = Seq.newBuilder[Merge]
    // viaPersisted: the word-type base is cached for the duration of the
    // rounds, the FINAL vocab is materialized into its own retained
    // cache (evictable, releaseAll-able), and the base cache is dropped
    // — the same lifecycle as every other multi-pass dedup stage.
    val vocabOut = Dedup.viaPersisted(wordTypes(df, textCol)) { base =>
      var vocab = base
      var checkpoint: DataFrame = null // re-persisted vocab, rotated
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        // exactly one row to the driver per round
        val top = pairCounts(vocab).limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val Array(l, rt) = top(0).getString(0).split(" ", 2)
          merges += Merge(r, l, rt, l + rt, top(0).getLong(1))
          vocab = vocab.withColumn("seq",
            replace(col("seq"), lit(s" $l  $rt "), lit(s" ${l + rt} ")))
          // checkpoint every 32 merges: without this, round r chains r
          // prior replaces onto the lineage, so each pair-count
          // re-executes (absent a cache hit) AND re-analyzes an
          // r-deep plan — O(rounds²) work that falls over near a
          // realistic 32k-merge vocab. The checkpoint TRUNCATES the
          // plan (persist alone would keep analyzer cost growing), so
          // every round reads a vocab-sized cut plus at most 32
          // pending replaces. Reliable checkpoint when a dir is set
          // (production: survives executor loss); localCheckpoint
          // otherwise (local mode).
          if (r % 32 == 0) {
            // eager by default, so cut_r is fully materialized HERE —
            // only then is dropping cut_{r-32} safe (cut_r is a leaf:
            // nothing recomputes through the old one; localCheckpoint
            // storage includes disk, so memory pressure demotes, never
            // loses). The LAST cut is deliberately never unpersisted:
            // the returned vocab reads through it, and a localCheckpoint
            // has no lineage to fall back on if its cache died — one
            // vocab-sized block per bpeTrain call is the price of a
            // race-free lifecycle (reliable checkpoint files, when a
            // dir is set, persist regardless).
            val cut =
              if (vocab.sparkSession.sparkContext.getCheckpointDir.isDefined)
                vocab.checkpoint()
              else vocab.localCheckpoint()
            if (checkpoint != null) checkpoint.unpersist(blocking = false)
            checkpoint = cut
            vocab = cut
          }
          r += 1
        }
      }
      vocab
    }
    (merges.result(), vocabOut)
  }

  /** Merge table as a DataFrame (merge_rank, left, right, merged,
    * pair_count) — the artifact a tokenizer consumer ships. */
  def bpeMergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("merge_rank", "left", "right", "merged", "pair_count")
  }

  /** Apply a FITTED merge list to a (possibly different) corpus:
    * rebuild the word-type frame and replay the merges in rank order —
    * no pair counting, no driver round-trips. This is the production
    * "ship the tokenizer" path: fit once ([[bpeTrain]]), persist the
    * merge table ([[bpeMergeTable]] to parquet), then encode any new
    * corpus by replaying the merges (words unseen in training still
    * merge wherever the learned pairs occur). On the training corpus
    * itself this reproduces [[bpeTrain]]'s final vocabulary exactly
    * (spec-gated). */
  def applyMerges(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame =
    merges.sortBy(_.rank).foldLeft(wordTypes(df, textCol)) { (v, m) =>
      v.withColumn("seq",
        replace(col("seq"), lit(s" ${m.left}  ${m.right} "), lit(s" ${m.merged} ")))
    }

  /** Reconstruct a merge list from a persisted [[bpeMergeTable]] frame
    * (rank order restored; the collect is |merges| rows — the artifact
    * is vocabulary-sized by definition). */
  def mergesFromTable(table: DataFrame): Seq[Merge] =
    table.select("merge_rank", "left", "right", "merged", "pair_count")
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .sortBy(_.rank).toSeq

  /** Apply a fitted vocabulary back to documents: per-doc BPE token
    * count and chars-per-token compression. The corpus side explodes to
    * tokens and joins the vocab frame (broadcast-able: |vocab| rows) —
    * no per-round work ever touches the corpus.
    *
    * Words absent from the vocab frame (possible only when the vocab
    * was fitted on a DIFFERENT corpus and applied directly, without
    * [[applyMerges]] re-deriving word types) fall back to
    * character-level tokens (n_tokens = word length) instead of
    * silently vanishing from the counts — the honest worst case a BPE
    * encoder produces for a fully-unseen word. */
  def bpeEncodeStats(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val toks = df.select(col(idCol),
        explode(split(trim(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
    val vlen = vocab.select(col("w"),
      size(split(trim(col("seq")), "  ")).cast("long").as("w_tokens"),
      length(col("w")).cast("long").as("w_chars"))
    toks.join(broadcast(vlen), Seq("w"), "left")
      .groupBy(idCol).agg(
        sum(coalesce(col("w_tokens"), length(col("w")).cast("long"))).as("n_tokens"),
        sum(coalesce(col("w_chars"), length(col("w")).cast("long"))).as("n_chars"))
      .select(col(idCol), col("n_tokens"), col("n_chars"),
        round(col("n_chars").cast("double") / col("n_tokens"), 4)
          .as("chars_per_token"))
  }
}
