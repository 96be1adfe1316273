package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Keyword relevance search over a document corpus: exact
  * term-frequency scoring (integer, oracle-replayable) and BM25
  * ranking (the standard quality/relevance selector for targeted
  * training-data curation — "give me the top-k documents about X").
  *
  * Reference analog: none — the reference's text operators stop at
  * LIKE/CONTAINS (vm/vm.go:1050-1126); ranked retrieval is part of the
  * beyond-reference pipeline surface.
  */
object Search {

  /** Whitespace tokens — the same split as
    * [[TextAnalysis.tokenCount]], so doc lengths agree across the text
    * operators. */
  private def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Exact summed term frequency: Σ_t tf(t, doc) — equal to ONE
    * membership count over distinct terms, so the text is tokenized
    * and scanned once per row, not once per term (higher-order array
    * functions are interpreted; a per-term chain costs |terms|×). */
  def tfScore(text: Column, terms: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(terms.distinct: _*))).cast(LongType)

  /** Top-k documents by exact term frequency; ties broken by id so the
    * cut is deterministic.
    *
    * Scale: scan-stage scoring + `TakeOrderedAndProject` top-k heap —
    * no global sort, no shuffle beyond the k-row gather. */
  def keywordTopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame =
    df.select(col(idCol), tfScore(col(textCol), terms).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** BM25 top-k (Robertson/Sparck Jones, the +1-smoothed Lucene idf):
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)).
    *
    * Scale: pass 1 is ONE bounded aggregate (corpus size, mean doc
    * length, one document-frequency counter per query term — a single
    * row to the driver, independent of corpus size); pass 2 scores in
    * the scan stage with the idf values folded in as literals and ends
    * in a top-k heap. Terms are a user query (bounded, small), so the
    * per-term columns stay codegen-friendly. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "query must have at least one term")
    val tok = df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .withColumn("__dl", size(col("__t")).cast(DoubleType))
    val statAggs = count(lit(1)).as("n") +: avg("__dl").as("avgdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("__t"), t), 1L).otherwise(0L)).as(s"df_$i")
      }
    val stats = tok.agg(statAggs.head, statAggs.tail: _*).head()
    // empty corpus: avg/sum aggregates return NULL — answer with an
    // empty result instead of unboxing NPEs
    if (stats.getAs[Long]("n") == 0L)
      return tok.select(col(idCol), lit(0.0).as("score")).limit(0)
    val n = stats.getAs[Long]("n").toDouble
    val avgdl = stats.getAs[Double]("avgdl")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val dft = stats.getAs[Long](s"df_$i").toDouble
      val idf = math.log((n - dft + 0.5) / (dft + 0.5) + 1.0)
      val tf = size(filter(col("__t"), w => w === lit(t))).cast(DoubleType)
      lit(idf) * (tf * (k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / lit(avgdl)))
    }.reduce(_ + _)
    tok.select(col(idCol), round(score, 6).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    * 2009): fuse the BM25 keyword ranking with a no-model semantic
    * ranking ([[TextAnalysis.hashedEmbedding]] cosine against the
    * `probeId` document's embedding) by RRF score
    * Σ 1/(rrfK + rank) over the lists a doc appears in — the standard
    * union of lexical and semantic evidence a curation pipeline uses
    * when either signal alone misses ("about X" keyword hits plus
    * paraphrases that share no keyword).
    *
    * Determinism: both source rankings cut and rank by (rounded score
    * desc, id); RRF is a fixed-order sum of two exact-integer-
    * denominator terms per row (never a cross-row float sum), rounded
    * to 6 — replayable in any engine.
    *
    * Scale: BM25 is one bounded stats aggregate + a scan-stage score +
    * top-kEach heap; the semantic side is one embed pass + a broadcast
    * single-probe scored scan + top-kEach heap; fusion joins two
    * ≤ kEach-row frames. Nothing quadratic, no global sort. */
  def hybridTopKRrf(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], probeId: Long, kEach: Int = 50, k: Int = 10,
      rrfK: Int = 60, buckets: Int = 64, dim: Int = 16): DataFrame = {
    require(kEach > 0 && k > 0 && rrfK > 0, "need kEach, k, rrfK > 0")
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(df, idCol, textCol, terms, kEach)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score").desc, col(idCol))).cast(LongType))
      .select(col(idCol), col("lex_rank"))
    val emb = TextAnalysis.hashedEmbedding(df, idCol, textCol, buckets, dim)
    // probe vector from embedding ONLY the probe document (the filter
    // pushes to the scan): per-doc embeddings are independent, so this
    // is value-identical to filtering the corpus embedding — without
    // paying a full corpus embed pass just to read one row (guide §1.2
    // "don't compute things you throw away")
    val q = TextAnalysis.hashedEmbedding(
        df.filter(col(idCol) === probeId), idCol, textCol, buckets, dim)
      .select("embedding").head().getSeq[Double](0)
    val sem = Similarity.bruteForceTopKBatch(emb, idCol, "embedding",
        Seq((0L, q)), kEach)
      .withColumn("sem_rank", row_number()
        .over(Window.orderBy(col("cos").desc, col(idCol))).cast(LongType))
      .select(col(idCol), col("sem_rank"))
    lex.join(sem, Seq(idCol), "full_outer")
      .select(col(idCol), col("lex_rank"), col("sem_rank"),
        round(
          coalesce(lit(1.0) / (lit(rrfK).cast(DoubleType) + col("lex_rank").cast(DoubleType)), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK).cast(DoubleType) + col("sem_rank").cast(DoubleType)), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}
