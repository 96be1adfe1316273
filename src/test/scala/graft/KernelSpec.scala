package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorExpressions._
import graft.functions.{VectorExpressions => VE}
import graft.operators.Dedup

/** Unit tests for the compiled Catalyst kernels — each verified against
  * an independent formulation (pure-Column chain, JDK md5, or driver-
  * side Scala) so a silent bit-fiddling mistake can't change every
  * fingerprint downstream undetected (ADVICE r2).
  */
class KernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog the quick brown fox",
    "one two", "one", "", "  spaced   out   words  here ")

  private def textDf = spark.createDataFrame(
    java.util.Arrays.asList(texts.map(Row(_)): _*),
    StructType(Seq(StructField("text", StringType))))

  test("TokenCount/TokenFingerprint match their pure-Column formulations") {
    // the kernels replaced the Column forms in TextAnalysis; parity
    // must hold on the edge cases Spark's split (limit=-1, trailing
    // empties KEPT — not Java String.split) defines: leading/trailing
    // non-space whitespace each yield ONE empty token, "" -> [""],
    // all-whitespace after the space-only trim, unicode and mixed-case
    // tokens, duplicates
    val tricky = texts ++ Seq(
      "\tleading tab", "trailing tab\t", "\t", " \t ", "a\tb\nc\rd\fe",
      "mixed CASE Mixed case", "Ünïcode Tökens ünïcode", "a  b   a b",
      "x", "  ", "ab")
    val df = spark.createDataFrame(
      java.util.Arrays.asList(tricky.map(Row(_)): _*),
      StructType(Seq(StructField("text", StringType))))
    val got = df.select(
      VE.token_count(col("text")).as("k_cnt"),
      VE.token_fingerprint(col("text")).as("k_fp"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("c_cnt"),
      md5(concat_ws(" ", array_sort(array_distinct(
        filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= ""))))
        .cast("binary")).as("c_fp")).collect()
    for ((r, t) <- got.zip(tricky)) {
      assert(r.getLong(0) == r.getLong(2), s"token count drift on <$t>")
      assert(r.getString(1) == r.getString(3), s"fingerprint drift on <$t>")
    }
    // null propagates
    val nr = spark.sql("SELECT graft_token_count(CAST(NULL AS STRING)) a, " +
      "graft_token_fingerprint(CAST(NULL AS STRING)) b").head()
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("TokenBucketMargin matches the explode + md5-bucket Column formulation") {
    // independent reference: the exact chain the kernel replaced —
    // explode(split) filter nonempty -> conv(substr(md5,1,8),16,10)%D
    // -> bias + sum(w)/count per doc. Compared at full double
    // precision (tiny tolerance for summation-order drift), plus the
    // no-token null contract.
    val tricky = texts ++ Seq(
      "\tleading tab", "trailing tab\t", "a\tb\nc\rd\fe",
      "mixed CASE Mixed case", "Ünïcode Tökens ünïcode", "a  b   a b")
    val weights = Array.tabulate(64)(i => (i * 37 % 19) * 0.25 - 2.0)
    val bias = 0.375
    val df = spark.createDataFrame(
      java.util.Arrays.asList(tricky.zipWithIndex.map { case (t, i) =>
        Row(i.toLong, t) }: _*),
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
    val got = df.select(col("id"),
        VE.token_margin(col("text"), weights.toSeq, bias).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val wArr = array(weights.map(lit).toSeq: _*)
    val b = conv(substring(md5(col("t").cast(BinaryType)), 1, 8), 16, 10)
      .cast(LongType) % 64
    val want = df.select(col("id"),
        explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(col("t") =!= "")
      .select(col("id"), element_at(wArr, (b + 1).cast(IntegerType)).as("w"))
      .groupBy("id").agg((lit(bias) + sum(col("w")) / count(lit(1))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((t, i) <- tricky.zipWithIndex) {
      (got(i.toLong), want.get(i.toLong)) match {
        case (Some(g), Some(w)) =>
          assert(math.abs(g - w) < 1e-12, s"margin drift on <$t>: kernel $g vs chain $w")
        case (None, None) => // no tokens: kernel null, chain row absent
        case (g, w) => fail(s"null contract drift on <$t>: kernel $g vs chain $w")
      }
    }
  }

  test("WordShingleMd5 matches parseLong(md5Hex.substring(0,15), 16) per shingle") {
    // independent: JDK MessageDigest hex string, first 15 hex chars
    def md5_60ref(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def shinglesRef(text: String, n: Int): Seq[Long] = {
      val toks = text.trim.split("\\s+").toSeq
      val grams =
        if (toks.length < n) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      grams.map(md5_60ref).distinct
    }
    for (n <- Seq(2, 3)) {
      val got = textDf.select(VE.word_shingle_md5(col("text"), n).as("h"))
        .collect().map(_.getSeq[Long](0).toSeq)
      val want = texts.map(shinglesRef(_, n))
      assert(got.toSeq == want, s"n=$n")
    }
  }

  test("WordShingleHashes agrees with the pure-Column wordShingles formulation") {
    // same shingle SET semantics: identical sizes, and identical overlap
    // counts between every text pair (hash is injective on this corpus)
    for (n <- Seq(2, 3)) {
      val kernel = textDf.select(VE.word_shingle_hashes(col("text"), n).as("h"))
        .collect().map(_.getSeq[Long](0).toSet)
      val column = textDf.select(Dedup.wordShingles(col("text"), n).as("s"))
        .collect().map(_.getSeq[String](0).toSet)
      for (i <- texts.indices) {
        assert(kernel(i).size == column(i).size, s"n=$n text=$i size")
        for (j <- texts.indices if j > i) {
          assert((kernel(i) & kernel(j)).size == (column(i) & column(j)).size,
            s"n=$n overlap($i,$j)")
        }
      }
    }
  }

  test("IntersectCount equals size(array_intersect) on long arrays") {
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L)),
      Row(Seq(1L, 2L), Seq(3L, 4L)),
      Row(Seq.empty[Long], Seq(1L)),
      Row(Seq(7L, 7L, 8L), Seq(7L, 8L, 8L, 9L))),
      StructType(Seq(StructField("a", ArrayType(LongType)), StructField("b", ArrayType(LongType)))))
    val got = df.select(
      VE.intersect_count(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("SimHash64 matches a driver-side majority vote") {
    def simRef(hs: Seq[Long]): Long = {
      var sim = 0L
      for (b <- 0 until 64)
        if (2 * hs.count(h => ((h >>> b) & 1L) == 1L) >= hs.length) sim |= (1L << b)
      sim
    }
    val arrays = Seq(Seq(0x0FL, 0xF0L, 0x0EL), Seq(Long.MaxValue, -1L, 0L), Seq(42L))
    val df = spark.createDataFrame(java.util.Arrays.asList(arrays.map(Row(_)): _*),
      StructType(Seq(StructField("hs", ArrayType(LongType)))))
    val got = df.select(VE.simhash64(col("hs"))).collect().map(_.getLong(0))
    assert(got.toSeq == arrays.map(simRef))
  }

  test("L2Normalize: unit norm, zero vector → null, float input") {
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(Seq(3.0, 4.0)), Row(Seq(0.0, 0.0)), Row(Seq(1.0, 1.0, 1.0, 1.0))),
      StructType(Seq(StructField("v", ArrayType(DoubleType)))))
    val raw = df.select(VE.l2_normalize(col("v")).as("n")).collect()
    assert(raw(0).getSeq[Double](0).toSeq == Seq(0.6, 0.8))
    // zero vector → NULL so dot products null-propagate like the fused
    // cosine's zero denominator (pair filtered, never scored 0.0)
    assert(raw(1).isNullAt(0))
    val rows = raw.filterNot(_.isNullAt(0)).map(_.getSeq[Double](0).toSeq)
    assert(math.abs(rows(1).map(x => x * x).sum - 1.0) < 1e-12)
    // float input path
    val f = spark.createDataFrame(java.util.List.of(Row(Seq(3.0f, 4.0f))),
      StructType(Seq(StructField("v", ArrayType(FloatType)))))
    assert(f.select(VE.l2_normalize(col("v"))).head().getSeq[Double](0).toSeq == Seq(0.6, 0.8))
  }

  test("PqEncode/PqAdc match a driver-side PQ reference (double + float paths)") {
    val ncent = 4; val sub = 2; val m = 3 // 6-dim vectors, 3 subspaces
    val books: IndexedSeq[Double] = IndexedSeq(
      // s=0: centroids (1,0) (0,1) (-1,0) (0,-1)
      1, 0, 0, 1, -1, 0, 0, -1,
      // s=1: same
      1, 0, 0, 1, -1, 0, 0, -1,
      // s=2: same
      1, 0, 0, 1, -1, 0, 0, -1).map(_.toDouble)
    def ref(v: Seq[Double]): (Seq[Int], Double) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      val x = if (n == 0) v else v.map(_ / n)
      val cs = (0 until m).map { s =>
        (0 until ncent).minBy { c =>
          (0 until sub).map { j =>
            val d = x(s * sub + j) - books((s * ncent + c) * sub + j); d * d
          }.sum
        }
      }
      val dt = (0 until m * ncent).map(i => i * 0.25)
      (cs, cs.zipWithIndex.map { case (c, s) => dt(s * ncent + c) }.sum)
    }
    val vecs = Seq(
      Seq(5.0, 0.1, -0.1, 3.0, 0.0, -2.0),
      Seq(-1.0, -1.0, 1.0, 1.0, 0.5, 0.5),
      Seq(0.0, 2.0, 0.0, -2.0, 2.0, 0.0))
    val df = spark.createDataFrame(java.util.Arrays.asList(vecs.map(Row(_)): _*),
      StructType(Seq(StructField("v", ArrayType(DoubleType)))))
    val dt = (0 until m * ncent).map(i => i * 0.25)
    val got = df.select(VE.pq_encode(col("v"), books, ncent, sub).as("c"))
      .select(col("c"), VE.pq_adc(col("c"), dt, ncent).as("d")).collect()
      .map(r => (r.getSeq[Int](0).toSeq, r.getDouble(1)))
    assert(got.toSeq == vecs.map(ref), s"kernel/reference divergence: ${got.toSeq}")
    // float input path encodes identically
    val f = spark.createDataFrame(
      java.util.Arrays.asList(vecs.map(v => Row(v.map(_.toFloat))): _*),
      StructType(Seq(StructField("v", ArrayType(FloatType)))))
    val gotF = f.select(VE.pq_encode(col("v"), books, ncent, sub)).collect()
      .map(_.getSeq[Int](0).toSeq)
    assert(gotF.toSeq == vecs.map(v => ref(v)._1))
  }

  test("WordBigrams matches a driver-side sliding-pair reference") {
    def ref(text: String): Seq[String] = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    }
    val got = textDf.select(VE.word_bigrams(col("text")).as("b"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got == texts.map(ref))
    // multiplicity preserved: the repeated "the quick" appears twice
    assert(got(1).count(_ == "the quick") == 2)
    // fixture spot check: per-doc pair count == tokenCount - 1
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val sizes = docs.select(size(VE.word_bigrams(col("text"))).cast("long").as("nb"),
        graft.operators.TextAnalysis.tokenCount(col("text")).as("nt"))
      .collect()
    sizes.foreach(r => assert(r.getLong(0) == r.getLong(1) - 1))
  }

  test("CellAssign matches the array_max-of-structs Column formulation") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val v = col("embedding").cast(ArrayType(DoubleType))
    // deterministic centroids: 16 md5-ordered seeds, normalized
    val cents = graft.operators.Similarity.kmeansCentroids(
      emb.select(col("vec_id"), v.as("__v")), "vec_id", "__v", 16, 1)
    val colForm = {
      val assigned = array_max(array(cents.zipWithIndex.map { case (c, i) =>
        struct(VE.cosine_sim(v, array(c.map(lit): _*)).as("cos"),
          lit(-i).as("negidx"))
      }: _*))
      -assigned.getField("negidx")
    }
    val rows = emb.select(col("vec_id"),
        VE.cell_assign(v, cents.flatten, cents.length).as("k"),
        colForm.as("c"))
      .collect()
    rows.foreach(r => assert(r.getInt(1) == r.getInt(2), s"vec ${r.getLong(0)}"))
    Dedup.releaseAll()
  }

  test("kernels reject wrong input types at analysis time") {
    val df = spark.createDataFrame(java.util.List.of(Row(Seq(1, 2), "x")),
      StructType(Seq(StructField("ia", ArrayType(IntegerType)), StructField("s", StringType))))
    // array<int> into a long-array kernel: analysis error, not garbage
    intercept[Exception] { df.select(VE.simhash64(col("ia"))).collect() }
    intercept[Exception] { df.select(VE.intersect_count(col("ia"), col("ia"))).collect() }
    intercept[Exception] { df.select(VE.l2_normalize(col("s"))).collect() }
    intercept[Exception] { df.select(VE.word_shingle_md5(col("ia"), 2)).collect() }
    // pq_encode wants a numeric array; pq_adc wants array<int>
    intercept[Exception] { df.select(VE.pq_encode(col("s"), Seq(1.0, 2.0), 1, 2)).collect() }
    intercept[Exception] { df.select(VE.pq_adc(col("s"), Seq(1.0), 1)).collect() }
  }

  test("simHash column equals DuckDB-reproducible md5 formulation on fixtures") {
    // recompute the full fingerprint driver-side from raw text
    def md5_60ref(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def simRef(text: String): Long = {
      val toks = text.trim.split("\\s+").toSeq
      val grams = if (toks.length < 2) Seq(toks.mkString(" "))
        else toks.sliding(2).map(_.mkString(" ")).toSeq.distinct
      val hs = grams.map(md5_60ref).distinct
      var sim = 0L
      for (b <- 0 until 64)
        if (2 * hs.count(h => ((h >>> b) & 1L) == 1L) >= hs.length) sim |= (1L << b)
      sim
    }
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val got = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> simRef(r.getString(1))).toMap
    assert(got == raw)
  }

  test("TopNgramStats matches a driver-side sliding-count formulation") {
    // independent: Scala collections (sliding + groupBy), no shared code
    def topRef(text: String, n: Int): Option[(String, Long, Double)] = {
      val toks = text.trim.split("\\s+").toSeq
      if (toks.length < n) None
      else {
        val counts = toks.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).view.mapValues(_.size).toSeq
        val (g, c) = counts.minBy { case (g, c) => (-c, g) }
        Some((g, c.toLong, c.toDouble * g.length / math.max(text.length, 1)))
      }
    }
    for (n <- Seq(1, 2, 3)) {
      val got = textDf.select(VE.top_ngram(col("text"), n).as("t")).collect().map { r =>
        if (r.isNullAt(0)) None
        else {
          val s = r.getStruct(0)
          Some((s.getString(0), s.getLong(1), s.getDouble(2)))
        }
      }.toSeq
      val want = texts.map(topRef(_, n))
      assert(got == want, s"n=$n")
    }
    // fixture spot check at sf0.001: kernel never disagrees with the ref
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val gotFix = docs.select(col("doc_id"), VE.top_ngram(col("text"), 2).as("t"))
      .collect().map(r => r.getLong(0) -> {
        val s = r.getStruct(1); (s.getString(0), s.getLong(1))
      }).toMap
    val wantFix = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> topRef(r.getString(1), 2).map(t => (t._1, t._2)).get).toMap
    assert(gotFix == wantFix)
  }

  test("r17 graft_hashed_embed refuses out-of-domain bucket ids (ADVICE r16)") {
    // user-callable SQL surface: a bucket id outside the sign matrix
    // must fail with a descriptive error, not a raw
    // ArrayIndexOutOfBoundsException (or an Int-overflowed index)
    VE.register(spark)
    def run(b: Long): Unit = spark.sql(
      s"SELECT graft_hashed_embed(array(named_struct('b', CAST($b AS LONG), " +
        "'c', CAST(1 AS LONG))), array(1L, -1L, 1L, -1L), 2) AS v").collect()
    run(0L); run(1L) // in-domain buckets for a 2x2 sign matrix: fine
    for (bad <- Seq(2L, -1L, Long.MaxValue / 2)) {
      val e = intercept[Exception] { run(bad) }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(e).exists(t => Option(t.getMessage).exists(
        _.contains(s"graft_hashed_embed: bucket id $bad"))),
        s"missing descriptive error for bucket $bad: $e")
    }
  }
}
