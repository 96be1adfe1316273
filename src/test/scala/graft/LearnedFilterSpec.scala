package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, TextAnalysis}

/** Behavioral specs for the learned/likelihood-based curation filters —
  * DSIR importance resampling and the in-engine hashed-BoW logistic
  * classifier. The DuckDB oracle rows (pl_dsir_sample,
  * pl_quality_classifier) pin the arithmetic; these specs pin the
  * LEARNING behavior on constructed separable fixtures, which the
  * near-uniform synthetic corpus cannot exercise.
  */
class LearnedFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  import spark.implicits._

  /** 8 docs speaking the target dialect from the target source, 8
    * generic docs that ALSO speak it, 24 generic docs that don't. */
  private def dsirFixture = {
    val rows =
      (0 until 8).map(i => (i.toLong, "tgt", s"alpha beta gamma delta alpha beta seq$i")) ++
      (8 until 16).map(i => (i.toLong, "raw", s"alpha beta gamma delta beta alpha seq$i")) ++
      (16 until 40).map(i => (i.toLong, "raw", s"foo bar baz qux foo bar quux seq$i"))
    rows.toDF("doc_id", "source", "text")
  }

  test("DSIR resample prefers documents that look like the target slice") {
    val picked = Curation.importanceResample(
        dsirFixture, "doc_id", "text", col("source") === "tgt", n = 12, vocab = 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // target-dialect docs (ids 0-15) carry a large positive log-weight;
    // the off-dialect majority (16-39) should be nearly shut out even
    // though it outnumbers the dialect 24:16 and Gumbel noise is live
    val onDialect = picked.count(_ < 16)
    assert(onDialect >= 10, s"resample picked $picked — only $onDialect on-dialect")
  }

  test("DSIR log-weights separate dialects and the draw is deterministic") {
    val run1 = Curation.importanceResample(
        dsirFixture, "doc_id", "text", col("source") === "tgt", n = 40, vocab = 64)
      .orderBy("doc_id").collect()
    val run2 = Curation.importanceResample(
        dsirFixture, "doc_id", "text", col("source") === "tgt", n = 40, vocab = 64)
      .orderBy("doc_id").collect()
    assert(run1.toSeq == run2.toSeq, "draw must be reproducible")
    val lw = run1.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val onMean = (0L until 16L).map(lw).sum / 16
    val offMean = (16L until 40L).map(lw).sum / 24
    assert(onMean > 0 && offMean < 0,
      s"expected positive on-dialect ($onMean) and negative off-dialect ($offMean) log-weights")
  }

  test("DSIR excludes token-less documents and rejects an empty target") {
    val withEmpty = dsirFixture.union(Seq((99L, "raw", "   ")).toDF("doc_id", "source", "text"))
    val picked = Curation.importanceResample(
        withEmpty, "doc_id", "text", col("source") === "tgt", n = 100, vocab = 64)
      .select("doc_id").collect().map(_.getLong(0))
    assert(!picked.contains(99L), "empty doc must not be drawable")
    assertThrows[IllegalArgumentException] {
      Curation.importanceResample(
        dsirFixture, "doc_id", "text", col("source") === "nope", n = 5, vocab = 64)
    }
  }

  /** Positives speak "good" vocabulary, negatives "bad" — linearly
    * separable under hashed BoW unless 64 buckets collide them. */
  private def clfFixture = {
    val rows =
      (0 until 12).map(i => (i.toLong, 1.0, s"good great fine solid good great v$i")) ++
      (12 until 24).map(i => (i.toLong, 0.0, s"spam junk noise drivel spam junk v$i"))
    rows.toDF("doc_id", "y", "text")
  }

  test("classifier separates a separable corpus and is deterministic") {
    val (w1, b1) = TextAnalysis.trainClassifier(
      clfFixture, "doc_id", "text", col("y"), buckets = 64, iters = 10, lr = 5.0)
    val (w2, b2) = TextAnalysis.trainClassifier(
      clfFixture, "doc_id", "text", col("y"), buckets = 64, iters = 10, lr = 5.0)
    assert(w1.toSeq == w2.toSeq && b1 == b2, "training must be reproducible")
    val scores = TextAnalysis.scoreClassifier(clfFixture, "doc_id", "text", w1, b1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val posMean = (0L until 12L).map(scores).sum / 12
    val negMean = (12L until 24L).map(scores).sum / 12
    assert(posMean > 0.6, s"positive mean $posMean should exceed 0.6")
    assert(negMean < 0.4, s"negative mean $negMean should stay under 0.4")
  }

  test("a trained model transfers to unseen documents (train sample, score corpus)") {
    val (w, b) = TextAnalysis.trainClassifier(
      clfFixture, "doc_id", "text", col("y"), buckets = 64, iters = 10, lr = 5.0)
    val unseen = Seq(
      (100L, "good solid great work"),
      (101L, "junk noise spam drivel")).toDF("doc_id", "text")
    val s = TextAnalysis.scoreClassifier(unseen, "doc_id", "text", w, b)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(100L) > s(101L),
      s"good-vocab doc ${s(100L)} should outscore bad-vocab doc ${s(101L)}")
  }

  test("classifier evaluation reports a perfect confusion matrix when separable") {
    val (w, b) = TextAnalysis.trainClassifier(
      clfFixture, "doc_id", "text", col("y"), buckets = 64, iters = 10, lr = 5.0)
    val r = TextAnalysis.evaluateClassifier(
      clfFixture, "doc_id", "text", col("y"), w, b).head()
    assert(r.getLong(0) == 24 && r.getLong(1) == 12 && r.getLong(3) == 12,
      s"expected n=24 tp=12 tn=12, got $r")
    assert(r.getLong(2) == 0 && r.getLong(4) == 0, s"expected fp=fn=0, got $r")
    assert(r.getDouble(5) == 1.0 && r.getDouble(8) == 1.0,
      s"expected accuracy=f1=1.0, got $r")
  }

  test("calibration curve partitions the corpus into exact score bins") {
    val (w, b) = TextAnalysis.trainClassifier(
      clfFixture, "doc_id", "text", col("y"), buckets = 64, iters = 10, lr = 5.0)
    val curve = TextAnalysis.calibrationCurve(
        clfFixture, "doc_id", "text", col("y"), w, b, bins = 10)
      .collect()
    // total: every scored doc lands in exactly one bin
    assert(curve.map(_.getAs[Long]("n_docs")).sum == 24)
    curve.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0 && bin <= 9)
      val ms = r.getAs[Double]("mean_score")
      // mean of scores inside an equal-width bin stays inside the bin
      // (the top bin also absorbs score=1.0 exactly)
      assert(ms >= bin / 10.0 && ms <= (bin + 1) / 10.0,
        s"bin $bin mean_score $ms outside its bounds")
      val pr = r.getAs[Double]("pos_rate")
      assert(pr >= 0.0 && pr <= 1.0)
    }
    // a separable model is calibrated at the extremes: the lowest bin
    // is all-negative, the highest all-positive
    val sorted = curve.sortBy(_.getAs[Long]("bin"))
    assert(sorted.head.getAs[Double]("pos_rate") == 0.0)
    assert(sorted.last.getAs[Double]("pos_rate") == 1.0)
  }

  test("classifier scoring matches an independent local replay of the model") {
    // differential: recompute margins in plain Scala from the trained
    // weights + the SAME md5 bucketing, compare to the engine's scores
    val (w, b) = TextAnalysis.trainClassifier(
      clfFixture, "doc_id", "text", col("y"), buckets = 64, iters = 3, lr = 0.5)
    val got = TextAnalysis.scoreClassifier(clfFixture, "doc_id", "text", w, b)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(t: String): Int = {
      val hex = md.digest(t.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 64).toInt
    }
    clfFixture.collect().foreach { r =>
      val toks = r.getString(2).trim.split("\\s+").filter(_.nonEmpty)
      val m = b + toks.groupBy(bucket).map { case (bk, ts) =>
        (ts.length.toDouble / toks.length) * w(bk)
      }.sum
      val p = BigDecimal(1.0 / (1.0 + math.exp(-m)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(r.getLong(0)) - p) <= 1e-4,
        s"doc ${r.getLong(0)}: engine ${got(r.getLong(0))} vs local $p")
    }
  }
}
