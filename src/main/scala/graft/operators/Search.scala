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
}
