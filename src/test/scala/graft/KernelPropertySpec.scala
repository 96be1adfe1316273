package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{VectorExpressions => VE}

/** Generative properties for the compiled kernels: randomized inputs
  * through the Spark column path vs a direct driver-side reference —
  * the fixed-vector KernelSpec cases can miss edge regions (zero
  * vectors, tiny norms, negative values, duplicated components).
  */
class KernelPropertySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def check(prop: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"$name: $res")
  }

  private val vecGen: Gen[List[Double]] =
    Gen.choose(4, 16).flatMap { n =>
      Gen.listOfN(n * 4, Gen.choose(-10.0, 10.0)) // dim divisible by 4
    }

  private def evalColumn(vs: Seq[Seq[Double]], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Array[Row] = {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(vs.map(v => Row(v)): _*),
      StructType(Seq(StructField("v", ArrayType(DoubleType)))))
    df.select(f(col("v"))).collect()
  }

  test("bpeTrain matches a driver-side greedy BPE reference on random corpora") {
    import graft.operators.Tokenizer
    // independent reference: word-type table, per-round pair counts
    // (adjacent, multiplicity within word, weighted by word count),
    // winner by (count desc, "l r" string asc), greedy non-overlapping
    // left-to-right merge within each word
    def refBpe(words: Map[String, Long], rounds: Int)
        : (Seq[(String, String, String, Long)], Map[String, Vector[String]]) = {
      var vocab: Map[String, Vector[String]] =
        words.keys.map(w => w -> w.map(_.toString).toVector).toMap
      val merges = Seq.newBuilder[(String, String, String, Long)]
      var r = 0
      var done = false
      while (r < rounds && !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((w, syms) <- vocab; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
        if (counts.isEmpty) done = true
        else {
          val ((l, rt), c) = counts.minBy { case ((l, rt), c) => (-c, l + " " + rt) }
          merges += ((l, rt, l + rt, c))
          vocab = vocab.map { case (w, syms) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rt) {
                out += (l + rt); i += 2
              } else { out += syms(i); i += 1 }
            }
            w -> out.result()
          }
          r += 1
        }
      }
      (merges.result(), vocab)
    }
    val wordGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, wordGen))
    val prop = Prop.forAll(corpusGen) { ws =>
      val text = ws.mkString(" ")
      val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(text)),
        StructType(Seq(StructField("text", StringType))))
      val (merges, vocab) = Tokenizer.bpeTrain(df, "text", rounds = 4)
      val wordCounts = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (refMerges, refVocab) = refBpe(wordCounts, rounds = 4)
      val got = merges.map(m => (m.left, m.right, m.merged, m.count))
      val gotVocab = vocab.select("w", "seq").collect()
        .map(r => r.getString(0) ->
          r.getString(1).trim.split("  ").toVector).toMap
      graft.operators.Dedup.releaseAll()
      if (got != refMerges || gotVocab != refVocab)
        println(s"[bpe-prop] corpus='$text'\n  merges $got vs $refMerges\n  vocab $gotVocab vs $refVocab")
      got == refMerges && gotVocab == refVocab
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, s"bpe: $res")
  }

  test("PqEncode: codes in range, nearest-centroid invariant on random input") {
    val prop = Prop.forAll(Gen.listOfN(3, vecGen).suchThat(_.nonEmpty)) { vs0 =>
      val dim = vs0.head.length
      val vs = vs0.filter(_.length == dim)
      val sub = 4; val m = dim / sub; val ncent = 3
      // codebook derived from the inputs themselves (scaled variants)
      val books: IndexedSeq[Double] =
        (0 until m * ncent * sub).map(i => math.sin(i.toDouble) * 2).toIndexedSeq
      val got = evalColumn(vs, v => VE.pq_encode(v, books, ncent, sub))
        .map(_.getSeq[Int](0).toSeq)
      def unit(v: Seq[Double]) = {
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0) v else v.map(_ / n)
      }
      got.zip(vs).forall { case (codes, raw) =>
        val x = unit(raw)
        codes.length == m && codes.zipWithIndex.forall { case (c, s) =>
          val dists = (0 until ncent).map { cc =>
            (0 until sub).map { j =>
              val d = x(s * sub + j) - books((s * ncent + cc) * sub + j); d * d
            }.sum
          }
          c >= 0 && c < ncent && dists(c) <= dists.min + 1e-12 &&
            // tie rule: smallest code among the minima
            (0 until c).forall(cc => dists(cc) > dists.min + 1e-12 || dists(cc) != dists(c))
        }
      }
    }
    check(prop, "pq_encode")
  }

  test("CosineSimilarity kernel matches driver math on random vectors") {
    val prop = Prop.forAll(vecGen, vecGen) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val a = a0.take(n); val b = b0.take(n)
      val df = spark.createDataFrame(
        java.util.List.of(Row(a, b)),
        StructType(Seq(StructField("a", ArrayType(DoubleType)),
          StructField("b", ArrayType(DoubleType)))))
      val got = df.select(VE.cosine_sim(col("a"), col("b"))).head()
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val den = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (den == 0.0) got.isNullAt(0)
      else math.abs(got.getDouble(0) - dot / den) < 1e-9
    }
    check(prop, "cosine")
  }

  test("PqAdc sums exactly the indexed table entries on random codes") {
    val prop = Prop.forAll(
      Gen.choose(2, 6).flatMap(m => Gen.choose(2, 8).flatMap(nc =>
        Gen.listOfN(m, Gen.choose(0, nc - 1)).map(codes => (m, nc, codes))))) {
      case (m, nc, codes) =>
        val dtable = (0 until m * nc).map(i => i * 0.5 + 1)
        val df = spark.createDataFrame(
          java.util.List.of(Row(codes)),
          StructType(Seq(StructField("c", ArrayType(IntegerType)))))
        val got = df.select(VE.pq_adc(col("c"), dtable, nc)).head().getDouble(0)
        val want = codes.zipWithIndex.map { case (c, s) => dtable(s * nc + c) }.sum
        math.abs(got - want) < 1e-12
    }
    check(prop, "pq_adc")
  }

  test("MinHashSignature: k minima, permutation-stable under input reorder") {
    val prop = Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue)),
      Gen.choose(1, 16)) { (hs, k) =>
      def sig(xs: Seq[Long]): Seq[Long] = {
        val df = spark.createDataFrame(
          java.util.List.of(Row(xs)),
          StructType(Seq(StructField("h", ArrayType(LongType)))))
        df.select(VE.minhash_sig(col("h"), k)).head().getSeq[Long](0).toSeq
      }
      val s1 = sig(hs)
      // signature is a set-function: element order must not matter
      s1.length == k && s1 == sig(scala.util.Random.shuffle(hs))
    }
    check(prop, "minhash")
  }

  test("SimHash64: majority vote, reorder-invariant on random hash sets") {
    val prop = Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))) { hs =>
      def ref(xs: Seq[Long]): Long = {
        var sim = 0L
        for (b <- 0 until 64)
          if (2 * xs.count(h => ((h >>> b) & 1L) == 1L) >= xs.length) sim |= (1L << b)
        sim
      }
      val df = spark.createDataFrame(
        java.util.List.of(Row(hs)),
        StructType(Seq(StructField("h", ArrayType(LongType)))))
      df.select(VE.simhash64(col("h"))).head().getLong(0) == ref(hs)
    }
    check(prop, "simhash64")
  }

  test("L2Normalize output is unit length for any non-zero random vector") {
    val prop = Prop.forAll(vecGen.suchThat(v => v.exists(_ != 0.0))) { v =>
      val out = evalColumn(Seq(v), c => VE.l2_normalize(c))
        .head.getSeq[Double](0)
      math.abs(out.map(x => x * x).sum - 1.0) < 1e-9
    }
    check(prop, "l2_normalize")
  }

  test("PcmStats matches driver-side decode on random byte payloads") {
    val bytesGen = Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue.toInt, Byte.MaxValue.toInt).map(_.toByte)))
    val prop = Prop.forAll(bytesGen) { bl =>
      val b = bl.toArray
      val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(b)),
        StructType(Seq(StructField("p", BinaryType))))
      val row = df.select(VE.pcm_stats(col("p")).as("s"))
        .select("s.n_samples", "s.rms", "s.zcr").collect().head
      // driver reference: same LE int16 decode, same accumulate order
      val n = b.length / 2
      val samples = (0 until n).map { i =>
        val u = (b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8)
        if (u >= 32768) u - 65536 else u
      }
      val rms = if (n == 0) 0.0
        else math.sqrt(samples.foldLeft(0.0)((a, s) => a + s.toDouble * s) / n)
      val zcr = if (n < 2) 0.0
        else samples.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0)).toDouble / (n - 1)
      row.getLong(0) == n.toLong && row.getDouble(1) == rms &&
        row.getDouble(2) == zcr && zcr >= 0.0 && zcr <= 1.0
    }
    check(prop, "pcm_stats")
  }

  test("avg_hash64 matches a driver-side reference on random payloads") {
    def ref(b: Array[Byte]): Long = {
      val g = new Array[Long](64)
      var total = 0L
      for (i <- 0 until 64) {
        var s = 0L
        var j = 3 * i
        while (j < math.min(3 * i + 3, b.length)) { s += (b(j) & 0xff); j += 1 }
        g(i) = s; total += s
      }
      var h = 0L
      for (k <- 0 until 64) if (g(k) * 64 >= total) h |= (1L << k)
      h
    }
    val byteGen = Gen.choose(0, 400)
      .flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)))
    val prop = Prop.forAll(byteGen) { bl =>
      val b = bl.toArray
      val df = spark.createDataFrame(java.util.Arrays.asList(Row(b)),
        StructType(Seq(StructField("p", BinaryType))))
      df.select(VE.avg_hash64(col("p"))).head().getLong(0) == ref(b)
    }
    check(prop, "avg_hash64")
  }

  test("winnowFingerprints matches a driver-side reference on random docs") {
    import graft.operators.TextAnalysis
    def ref(text: String, k: Int, w: Int): Set[(Long, Long)] = {
      val toks = text.trim.split("\\s+")
      if (toks.length < k) return Set.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      val hashes = (0 to toks.length - k).map { p =>
        val hex = md.digest(toks.slice(p, p + k).mkString(" ")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(10), 16)
      }
      val pr = 1L << 21
      val keys = hashes.zipWithIndex.map { case (h, p) => h * pr + (pr - 1 - p) }
      val sel = keys.indices.filter(i => i >= w - 1 || i == keys.length - 1)
        .map(i => keys.slice(math.max(0, i - w + 1), i + 1).min).toSet
      sel.map(m => (pr - 1 - (m % pr), m / pr))
    }
    val gen = for {
      k <- Gen.choose(2, 5)
      w <- Gen.choose(1, 5)
      n <- Gen.choose(0, 40)
      // tiny alphabet so duplicate grams (the tie/rightmost paths) occur
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "aa", "bb"))
    } yield (k, w, toks.mkString(" "))
    val prop = Prop.forAll(gen) { case (k, w, text) =>
      val df = spark.createDataFrame(java.util.Arrays.asList(Row(0L, text)),
        StructType(Seq(StructField("id", LongType), StructField("t", StringType))))
      val got = TextAnalysis.winnowFingerprints(df, "id", "t", k, w)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      got == ref(text, k, w)
    }
    check(prop, "winnow")
  }
}
