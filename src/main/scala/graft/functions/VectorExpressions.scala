package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot vector/fingerprint kernels.
  *
  * Spark's higher-order array functions (aggregate/transform/zip_with)
  * are CodegenFallback AND interpreted per expression node — a 64-bit
  * simhash vote or a 64-dim cosine written with them costs dozens of
  * interpreted `eval` dispatches per element. These expressions do the
  * same math in one tight JVM loop, benchmarked ~50-100x faster on the
  * dedup/ANN paths. The per-PAIR kernels (dot, cosine, l2-normalize,
  * intersect-count) additionally implement `doGenCode`, so they inline
  * into whole-stage codegen with no boxed eval boundary — they run
  * O(candidate-pairs) times, where per-call overhead multiplies
  * directly into cluster-hours at 100 TB. The per-ROW string/fingerprint
  * kernels (shingles, minhash, simhash) stay CodegenFallback: their
  * loop bodies dominate and string codegen buys little.
  */
object VectorExpressions {

  // ---- input type guards (ADVICE r2: misuse must fail at analysis
  // time, not read garbage via getLong/getDouble on UnsafeArrayData) ----
  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true; case _ => false
  }
  /** float or double elements (the embedding fixtures are array<float>;
    * literals/casts produce array<double>). */
  private def isNumericArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true; case _ => false
  }
  private def check(ok: Boolean, expr: String, want: String, got: Seq[DataType]): TypeCheckResult =
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$expr expects $want, got ${got.map(_.catalogString).mkString(", ")}")

  /** Majority-vote 64-bit simhash over an array<long> of feature hashes. */
  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isLongArray(child.dataType), "simhash64", "array<bigint>", Seq(child.dataType))
    override def dataType: DataType = LongType
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val b = ctx.freshName("b"); val counts = ctx.freshName("counts")
        val nf = ctx.freshName("nf"); val h = ctx.freshName("h")
        val sim = ctx.freshName("sim")
        s"""
        int $n = $a.numElements();
        int[] $counts = new int[64];
        int $nf = 0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            $nf++;
            long $h = $a.getLong($i);
            for (int $b = 0; $b < 64; $b++) $counts[$b] += (int) (($h >>> $b) & 1L);
          }
        }
        long $sim = 0L;
        for (int $b = 0; $b < 64; $b++) if ($counts[$b] * 2 >= $nf) $sim |= (1L << $b);
        ${ev.value} = $sim;
        """
      })
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var nf = 0 // non-null feature count (null slots skipped, not read as 0)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          nf += 1
          val h = arr.getLong(i)
          var b = 0
          while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
        }
        i += 1
      }
      var sim = 0L
      var b = 0
      while (b < 64) { if (counts(b) * 2 >= nf) sim |= (1L << b); b += 1 }
      java.lang.Long.valueOf(sim)
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  }

  /** `a.getDouble(i)`-style accessor for the element type, for codegen. */
  private def getter(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }

  /** Max cosine of a vector column against an ENTIRE broadcast matrix
    * (n × dim, row-major flat) in one tight JVM loop per row — the
    * "score the corpus against every benchmark doc" kernel.
    *
    * Why this exists (r14): the pairwise formulation — crossJoin then
    * [[CosineSimilarity]] per pair — pays the per-row Catalyst
    * dispatch (join row materialization, two ArrayData unpacks, one
    * boxed result) once per PAIR: measured 1.37 µs/pair at sf10, i.e.
    * 30,829 CPU-seconds for 22.5e9 pairs of 16-dim vectors whose raw
    * flops are ~2 minutes of one core. A k-means cell prune with the
    * exact angular triangle-inequality bound was built and MEASURED
    * first and made it WORSE (1139 s vs 909 s: in 16-dim hashed-tf
    * space the per-cell max radii sit far above the arccos(threshold)
    * bound, so nothing pruned and the corpus paid three embed passes
    * plus training) — the bottleneck is per-pair overhead, not
    * candidate count. Here the inner loop touches primitive arrays
    * only: the matrix rides a Broadcast (one copy per executor, not
    * per task closure), row norms precompute lazily once per task, and
    * each corpus row costs n×dim mult-adds with no allocation.
    *
    * Arithmetic matches [[CosineSimilarity]] exactly (same
    * accumulation order, same `dot / (sqrt(na) * sqrt(nb))`, zero-norm
    * rows skipped like the pairwise NULL), so `round(max, 4)` equals
    * the oracle's max-of-rounded-pairs by monotonicity. Returns null
    * for null/zero-norm inputs or an empty/all-zero matrix.
    *
    * CodegenFallback is deliberate: the boxed eval boundary is paid
    * once per ROW and amortized over n×dim flops. */
  case class MaxCosineVsMatrix(child: Expression,
      matrix: org.apache.spark.broadcast.Broadcast[Array[Double]], dim: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isNumericArray(child.dataType) && dim > 0,
        "max_cos_matrix", "array<float|double> and dim>0",
        Seq(child.dataType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    @transient private lazy val mat: Array[Double] = matrix.value
    @transient private lazy val nRows: Int = mat.length / dim
    @transient private lazy val norms: Array[Double] = {
      val out = new Array[Double](nRows)
      var j = 0
      while (j < nRows) {
        var s = 0.0; var d = 0; val base = j * dim
        while (d < dim) { val v = mat(base + d); s += v * v; d += 1 }
        out(j) = math.sqrt(s); j += 1
      }
      out
    }
    @transient private lazy val childIsFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val m = math.min(a.numElements(), dim)
      val av = new Array[Double](dim) // missing tail stays 0.0
      var na = 0.0
      var i = 0
      while (i < m) {
        val x = if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
        av(i) = x; na += x * x; i += 1
      }
      val nA = math.sqrt(na)
      if (nA == 0.0 || nRows == 0) return null
      var best = Double.NegativeInfinity
      var j = 0
      while (j < nRows) {
        if (norms(j) > 0.0) {
          val base = j * dim
          var dot = 0.0; var d = 0
          while (d < dim) { dot += av(d) * mat(base + d); d += 1 }
          val c = dot / (nA * norms(j))
          if (c > best) best = c
        }
        j += 1
      }
      if (best == Double.NegativeInfinity) null
      else java.lang.Double.valueOf(best)
    }
    override protected def withNewChildInternal(newChild: Expression): MaxCosineVsMatrix =
      copy(child = newChild)
  }

  /** Cosine similarity between two numeric arrays (float or double).
    * Participates in whole-stage codegen — these run once PER PAIR in
    * the O(n²)-shaped similarity stages, where the CodegenFallback
    * boundary (one boxed eval call per row) is measurable. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isNumericArray(left.dataType) && isNumericArray(right.dataType),
        "cosine", "two array<float|double>", Seq(left.dataType, right.dataType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // zero vector → null
    private def elemIsFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      val af = elemIsFloat(left); val bf = elemIsFloat(right)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb"); val denom = ctx.freshName("denom")
        s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double x = (double) $a.${getter(left)}($i);
          double y = (double) $b.${getter(right)}($i);
          $dot += x * y; $na += x * x; $nb += y * y;
        }
        double $denom = Math.sqrt($na) * Math.sqrt($nb);
        if ($denom == 0.0) { ${ev.isNull} = true; }
        else { ${ev.value} = $dot / $denom; }
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
      copy(l, r)
  }

  /** Dot product between two numeric arrays (float or double);
    * codegen-participating (see [[CosineSimilarity]]). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isNumericArray(left.dataType) && isNumericArray(right.dataType),
        "dot", "two array<float|double>", Seq(left.dataType, right.dataType))
    override def dataType: DataType = DoubleType
    private def elemIsFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      val af = elemIsFloat(left); val bf = elemIsFloat(right)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y
        i += 1
      }
      java.lang.Double.valueOf(dot)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += (double) $a.${getter(left)}($i) * (double) $b.${getter(right)}($i);
        }
        ${ev.value} = $dot;
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(l, r)
  }

  /** splitmix64 finalizer — cheap avalanche for seed-mixing. Public so
    * generated (Janino) code can call the static forwarder. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signature: k minima of seed-mixed values over an
    * array<long> of base feature hashes. One pass over the features per
    * row (the pure-Column formulation runs k interpreted aggregates). */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isLongArray(child.dataType), "minhash", "array<bigint>", Seq(child.dataType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val j = ctx.freshName("j"); val sig = ctx.freshName("sig")
        val h = ctx.freshName("h"); val m = ctx.freshName("m")
        s"""
        int $n = $a.numElements();
        long[] $sig = new long[$k];
        java.util.Arrays.fill($sig, Long.MAX_VALUE);
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            long $h = $a.getLong($i);
            for (int $j = 0; $j < $k; $j++) {
              long $m = graft.functions.VectorExpressions.mix64(
                $h ^ ((long) $j * 0xC2B2AE3D27D4EB4FL));
              if ($m < $sig[$j]) $sig[$j] = $m;
            }
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
        """
      })
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) { // skip null slots, don't read them as 0
          val h = arr.getLong(i)
          var j = 0
          while (j < k) {
            val m = mix64(h ^ (j * 0xC2B2AE3D27D4EB4FL))
            if (m < sig(j)) sig(j) = m
            j += 1
          }
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  }

  /** Sign-of-projection LSH bucket over nPlanes deterministic pseudo-
    * random hyperplanes (components from splitmix64(p*dim + i), mapped
    * to [-1, 1]) — reproducible across runs and engines. */
  case class HyperplaneBucket(child: Expression, nPlanes: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isNumericArray(child.dataType), "hyperplane_bucket",
        "array<float|double>", Seq(child.dataType))
    override def dataType: DataType = LongType
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val p = ctx.freshName("p"); val bucket = ctx.freshName("bucket")
        val dotv = ctx.freshName("dotv")
        s"""
        int $n = $a.numElements();
        long $bucket = 0L;
        for (int $p = 0; $p < $nPlanes; $p++) {
          double $dotv = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double x = (double) $a.${getter(child)}($i);
            double c = (double) graft.functions.VectorExpressions.mix64(
              (long) $p * $n + $i) / (double) Long.MAX_VALUE;
            $dotv += x * c;
          }
          if ($dotv >= 0) $bucket |= (1L << $p);
        }
        ${ev.value} = $bucket;
        """
      })
    private def elemIsFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val isF = elemIsFloat
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        var dotv = 0.0
        var i = 0
        while (i < n) {
          val x = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
          // plane component in [-1, 1]
          val c = (mix64(p.toLong * n + i).toDouble / Long.MaxValue)
          dotv += x * c
          i += 1
        }
        if (dotv >= 0) bucket |= (1L << p)
        p += 1
      }
      java.lang.Long.valueOf(bucket)
    }
    override protected def withNewChildInternal(c: Expression): HyperplaneBucket = copy(child = c)
  }

  /** Distinct hashed word n-gram shingles in one pass: tokenize on
    * whitespace, slide an n-token window, 64-bit-hash each shingle.
    * Replaces the split/zip_with/transform Column chain (interpreted,
    * re-evaluated per reference after projection collapse) with a single
    * compiled kernel — the shingling stage of every dedup operator.
    * Clamping rule (shared by every oracle regardless of n): a text with
    * fewer than n tokens yields exactly one shingle containing all its
    * tokens. */
  case class WordShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, "word_shingles", "string", Seq(child.dataType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val toks = v.toString.trim.split("\\s+")
      val out = new java.util.ArrayList[Long]()
      val seen = new java.util.HashSet[java.lang.Long]()
      @inline def hashOf(sb: CharSequence): Long = {
        var h = 1125899906842597L
        var i = 0
        while (i < sb.length) { h = 31 * h + sb.charAt(i); i += 1 }
        mix64(h)
      }
      if (toks.length < n) {
        out.add(hashOf(toks.mkString(" ")))
      } else {
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i + n <= toks.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
          val h = hashOf(sb)
          if (seen.add(h)) out.add(h)
          i += 1
        }
      }
      val arr = new Array[Long](out.size())
      var i = 0
      while (i < arr.length) { arr(i) = out.get(i); i += 1 }
      ArrayData.toArrayData(arr)
    }
    override protected def withNewChildInternal(c: Expression): WordShingleHashes =
      copy(child = c)
  }

  /** Like [[WordShingleHashes]] but the hash is the first 60 bits of the
    * shingle's MD5 — reproducible in ANY engine (DuckDB:
    * ('0x' || substr(md5(g),1,15))::BIGINT), so fingerprints built on it
    * (SimHash) can be oracle-checked cross-engine. */
  case class WordShingleMd5(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, "word_shingles_md5", "string", Seq(child.dataType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    // per-thread digest: one expression instance may be evaluated from
    // several task threads concurrently (the hazard Stateful/freshCopy
    // exists for) — a shared instance would interleave reset/digest
    @transient private lazy val md =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    private def md5_60(s: String): Long = {
      val d = md.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = top 60 bits, big-endian hex order
      var h = 0L
      var i = 0
      while (i < 8) {
        val b = d(i) & 0xff
        if (i < 7) h = (h << 8) | b
        else h = (h << 4) | (b >>> 4) // 15th hex char = high nibble of byte 7
        i += 1
      }
      h
    }
    override def nullSafeEval(v: Any): Any = {
      val toks = v.toString.trim.split("\\s+")
      val out = new java.util.ArrayList[Long]()
      val seen = new java.util.HashSet[java.lang.Long]()
      if (toks.length < n) {
        out.add(md5_60(toks.mkString(" ")))
      } else {
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i + n <= toks.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
          val h = md5_60(sb.toString)
          if (seen.add(h)) out.add(h)
          i += 1
        }
      }
      val arr = new Array[Long](out.size())
      var i = 0
      while (i < arr.length) { arr(i) = out.get(i); i += 1 }
      ArrayData.toArrayData(arr)
    }
    override protected def withNewChildInternal(c: Expression): WordShingleMd5 =
      copy(child = c)
  }

  /** |a ∩ b| for two array<long> columns — one hash-set probe instead of
    * array_intersect + size (which materializes the intersection). */
  case class IntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isLongArray(left.dataType) && isLongArray(right.dataType),
        "intersect_count", "two array<bigint>", Seq(left.dataType, right.dataType))
    override def dataType: DataType = IntegerType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val set = new java.util.HashSet[java.lang.Long]()
      var i = 0
      // null slots skipped, not read as 0 (SQL-surface arrays may carry nulls)
      while (i < a.numElements()) { if (!a.isNullAt(i)) set.add(a.getLong(i)); i += 1 }
      var c = 0
      i = 0
      while (i < b.numElements()) { if (!b.isNullAt(i) && set.remove(b.getLong(i))) c += 1; i += 1 }
      java.lang.Integer.valueOf(c)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val set = ctx.freshName("set"); val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        s"""
        java.util.HashSet $set = new java.util.HashSet();
        for (int $i = 0; $i < $a.numElements(); $i++) {
          if (!$a.isNullAt($i)) $set.add(java.lang.Long.valueOf($a.getLong($i)));
        }
        int $c = 0;
        for (int $i = 0; $i < $b.numElements(); $i++) {
          if (!$b.isNullAt($i) && $set.remove(java.lang.Long.valueOf($b.getLong($i)))) $c++;
        }
        ${ev.value} = $c;
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCount =
      copy(l, r)
  }

  /** L2-normalized copy of a numeric array (as array<double>). Lets the
    * pair stage of bulk-NN use a plain dot product (1/3 the flops of a
    * fused cosine, amortizing the normalization over O(n²)/n pairs). */
  case class L2Normalize(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isNumericArray(child.dataType), "l2_normalize",
        "array<float|double>", Seq(child.dataType))
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    // a ZERO vector normalizes to NULL, so downstream dot products
    // null-propagate exactly like the fused cosine's 0-denominator
    // (pair filtered / ranked last, never cos = 0.0)
    override def nullable: Boolean = true
    private def elemIsFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val isF = elemIsFloat
      val out = new Array[Double](n)
      var ss = 0.0
      var i = 0
      while (i < n) {
        val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = x; ss += x * x; i += 1
      }
      val norm = math.sqrt(ss)
      if (norm == 0.0) null
      else {
        i = 0; while (i < n) { out(i) /= norm; i += 1 }
        ArrayData.toArrayData(out)
      }
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val out = ctx.freshName("out"); val ss = ctx.freshName("ss")
        val norm = ctx.freshName("norm")
        s"""
        int $n = $a.numElements();
        double[] $out = new double[$n];
        double $ss = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double x = (double) $a.${getter(child)}($i);
          $out[$i] = x; $ss += x * x;
        }
        double $norm = Math.sqrt($ss);
        if ($norm == 0.0) { ${ev.isNull} = true; }
        else {
          for (int $i = 0; $i < $n; $i++) $out[$i] /= $norm;
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
        """
      })
    override protected def withNewChildInternal(c: Expression): L2Normalize = copy(c)
  }

  /** Most frequent word n-gram of a text: struct(ngram, n, frac) where
    * `frac` is the Gopher-style repetition signal — characters covered
    * by all occurrences of that n-gram over the raw text length
    * (count × ngram-chars / text-chars). Ties break to the
    * lexicographically smallest n-gram, so the result is deterministic
    * and reproducible in any engine.
    *
    * One tight JVM pass per document (tokenize → hash-count → argmax);
    * the explode + groupBy(doc, ngram) + window formulation costs two
    * shuffles of the exploded corpus, which at 100 TB is the difference
    * between a scan-speed screen and a multi-stage job. Texts with
    * fewer than n tokens return NULL (no n-gram exists).
    * CodegenFallback like the other per-ROW string kernels: the loop
    * body dominates; one boxed call per document is noise. */
  case class TopNgramStats(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, "top_ngram expects n >= 1")
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, "top_ngram", "string", Seq(child.dataType))
    override def dataType: DataType = StructType(Seq(
      StructField("ngram", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("frac", DoubleType, nullable = false)))
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val text = v.toString
      val toks = text.trim.split("\\s+")
      if (toks.length < n) return null
      val counts = new java.util.HashMap[String, Integer]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        counts.merge(sb.toString, 1, (a, b) => a + b)
        i += 1
      }
      var bestG: String = null
      var bestC = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.intValue()
        if (c > bestC || (c == bestC && e.getKey.compareTo(bestG) < 0)) {
          bestC = c; bestG = e.getKey
        }
      }
      val frac = bestC.toDouble * bestG.length / math.max(text.length, 1)
      org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(bestG),
        java.lang.Long.valueOf(bestC.toLong), java.lang.Double.valueOf(frac))
    }
    override protected def withNewChildInternal(c: Expression): TopNgramStats =
      copy(child = c)
  }

  /** Whitespace token count with EXACT parity to
    * `size(split(trim(text), "\\s+"))`: space-only trim (Spark's
    * default StringTrim), then Spark split's limit=-1 rules
    * (Pattern.split(input, -1), NOT Java String.split) — one empty
    * token when the trimmed text starts with non-space whitespace, one
    * when it ends with it (trailing empties are KEPT at limit=-1), and
    * `""` splitting to `[""]` (count 1). One byte scan, zero
    * allocation; the Column form pays a regex split that materializes
    * every token just to count them (the costliest part of the per-doc
    * stats scan, measured 4.5 s of the sf10 smoke's text_stats before
    * this kernel). \s is the Java-regex ASCII set, so scanning UTF-8
    * bytes is exact (multi-byte chars never collide with ASCII
    * values). */
  case class TokenCount(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, "token_count", "string", Seq(child.dataType))
    override def dataType: DataType = LongType
    private def ws(x: Byte): Boolean = x == 0x20 || x == 0x09 || x == 0x0A ||
      x == 0x0B || x == 0x0C || x == 0x0D
    override def nullSafeEval(v: Any): Any = {
      val b = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].trim().getBytes
      if (b.length == 0) return 1L // split("", "\\s+") -> [""]
      // leading/trailing \s (only non-space ones survive the trim)
      // each contribute ONE empty token at Spark's limit=-1
      var count = (if (ws(b(0))) 1L else 0L) + (if (ws(b(b.length - 1))) 1L else 0L)
      var inTok = false
      var i = 0
      while (i < b.length) {
        val w = ws(b(i))
        if (!w && !inTok) { count += 1L; inTok = true }
        if (w) inTok = false
        i += 1
      }
      count
    }
    override protected def withNewChildInternal(c: Expression): TokenCount =
      copy(child = c)
  }

  /** Order-insensitive document fingerprint with EXACT parity to
    * `md5(cast(concat_ws(" ", array_sort(array_distinct(filter(
    * split(lower(trim(text)), "\\s+"), t => t != "")))) as binary))`:
    * space-only trim and UTF8String.toLowerCase (the same methods the
    * Column chain's trim()/lower() call), tokens as byte slices,
    * distinct+sort via a TreeSet in UTF8String's binary order (what
    * array_sort uses for strings), and the md5 streamed over the
    * space-joined tokens without materializing the joined string. The
    * Column chain runs four interpreted array ops per row (filter is a
    * CodegenFallback higher-order function); this is one tight pass —
    * the dominant 9.5 s of the sf10 smoke's text_stats before this
    * kernel. */
  case class TokenFingerprint(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, "token_fingerprint", "string", Seq(child.dataType))
    override def dataType: DataType = StringType
    private def ws(x: Byte): Boolean = x == 0x20 || x == 0x09 || x == 0x0A ||
      x == 0x0B || x == 0x0C || x == 0x0D
    /** Unsigned byte-lexicographic slice compare — UTF8String's binary
      * order (common prefix unsigned, then shorter < longer), which is
      * what array_sort uses for strings. */
    private def cmpSlice(b: Array[Byte], s1: Int, l1: Int, s2: Int, l2: Int): Int = {
      val n = math.min(l1, l2)
      var i = 0
      while (i < n) {
        val d = (b(s1 + i) & 0xFF) - (b(s2 + i) & 0xFF)
        if (d != 0) return d
        i += 1
      }
      l1 - l2
    }
    override def nullSafeEval(v: Any): Any = {
      val b = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .trim().toLowerCase.getBytes
      // token slices as parallel (start, len) arrays — no per-token
      // object; the md5 streams straight from the source bytes
      var starts = new Array[Int](64)
      var lens = new Array[Int](64)
      var n = 0
      var start = -1
      var i = 0
      while (i <= b.length) {
        val atWs = i == b.length || ws(b(i))
        if (atWs && start >= 0) {
          if (n == starts.length) {
            starts = java.util.Arrays.copyOf(starts, n * 2)
            lens = java.util.Arrays.copyOf(lens, n * 2)
          }
          starts(n) = start; lens(n) = i - start; n += 1
          start = -1
        } else if (!atWs && start < 0) start = i
        i += 1
      }
      // in-place quicksort of the slice arrays (no boxed comparator,
      // no per-token object; insertion sort below 16 elements)
      def sort(lo: Int, hi: Int): Unit =
        if (hi - lo < 16) {
          var k = lo + 1
          while (k <= hi) {
            val cs = starts(k); val cl = lens(k)
            var j = k - 1
            while (j >= lo && cmpSlice(b, starts(j), lens(j), cs, cl) > 0) {
              starts(j + 1) = starts(j); lens(j + 1) = lens(j); j -= 1
            }
            starts(j + 1) = cs; lens(j + 1) = cl
            k += 1
          }
        } else {
          val mid = lo + (hi - lo) / 2
          val ps = starts(mid); val pl = lens(mid)
          var a = lo; var z = hi
          while (a <= z) {
            while (cmpSlice(b, starts(a), lens(a), ps, pl) < 0) a += 1
            while (cmpSlice(b, starts(z), lens(z), ps, pl) > 0) z -= 1
            if (a <= z) {
              val ts = starts(a); val tl = lens(a)
              starts(a) = starts(z); lens(a) = lens(z)
              starts(z) = ts; lens(z) = tl
              a += 1; z -= 1
            }
          }
          if (lo < z) sort(lo, z)
          if (a < hi) sort(a, hi)
        }
      if (n > 1) sort(0, n - 1)
      val md = java.security.MessageDigest.getInstance("MD5")
      var first = true
      var p = 0
      while (p < n) {
        // adjacent-equal slices collapse: sorted order makes distinct a
        // single neighbor check
        if (p == 0 || cmpSlice(b, starts(p - 1), lens(p - 1), starts(p), lens(p)) != 0) {
          if (!first) md.update(0x20.toByte)
          first = false
          md.update(b, starts(p), lens(p))
        }
        p += 1
      }
      val dig = md.digest()
      val hexChars = "0123456789abcdef".getBytes
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = hexChars((dig(j) >> 4) & 0xF)
        hex(2 * j + 1) = hexChars(dig(j) & 0xF)
        j += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromBytes(hex)
    }
    override protected def withNewChildInternal(c: Expression): TokenFingerprint =
      copy(child = c)
  }

  /** Scan-stage classifier margin with EXACT bucket parity to the
    * Column chain `explode(split(trim(text), "\\s+")) filter != "" →
    * conv(substring(md5(token), 1, 8), 16, 10) % D → w` followed by
    * `bias + sum(w)/count(*)` per doc: tokens are the non-whitespace
    * byte runs of the space-trimmed text (empty tokens are what the
    * chain filters away), each hashed by md5 over its UTF-8 slice with
    * the first 4 digest bytes as the unsigned bucket. NULL when the
    * doc has no tokens — the chain's explode drops such docs, so the
    * caller filters nulls to the same effect.
    *
    * This turns classifier scoring from explode + shuffle + per-doc
    * aggregate into ONE per-row pass at scan speed — zero exchanges in
    * the scoring plan (PlanSpec-gated), which is the shape that scores
    * 100 TB. The weight sum runs in document token order; like the
    * aggregate's partial-merge order it differs from DuckDB's sum
    * order only below the round(…,4) the score applies. */
  case class TokenBucketMargin(child: Expression, weights: IndexedSeq[Double],
      bias: Double) extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, "token_margin", "string", Seq(child.dataType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    private def ws(x: Byte): Boolean = x == 0x20 || x == 0x09 || x == 0x0A ||
      x == 0x0B || x == 0x0C || x == 0x0D
    @transient private lazy val mdLocal =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    override def nullSafeEval(v: Any): Any = {
      val b = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].trim().getBytes
      val md = mdLocal.get()
      val d = weights.length
      var sum = 0.0
      var n = 0L
      var start = -1
      var i = 0
      while (i <= b.length) {
        val atWs = i == b.length || ws(b(i))
        if (atWs && start >= 0) {
          md.reset()
          md.update(b, start, i - start)
          val dig = md.digest()
          val bucket = (((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
            ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)) % d
          sum += weights(bucket.toInt)
          n += 1
          start = -1
        } else if (!atWs && start < 0) start = i
        i += 1
      }
      if (n == 0L) null else java.lang.Double.valueOf(bias + sum / n)
    }
    override protected def withNewChildInternal(c: Expression): TokenBucketMargin =
      copy(child = c)
  }

  /** PQ encoder: L2-normalizes the input vector (cosine target ⇒
    * unit-sphere L2), then per subspace `s` of `sub` dims emits
    * argmin_c ‖x_s − book(s,c)‖², ties to the smallest code. `books`
    * is the flat codebook, laid out books[(s·ncent + c)·sub + j].
    *
    * One compiled loop per row instead of the unrolled m×ncent
    * candidate Column tree — the tree form at m=8, ncent=16 generates
    * an expression so large that Janino compilation dominates the
    * query (~40 s at sf0.1, measured); this kernel plans in
    * milliseconds and participates in whole-stage codegen. */
  case class PqEncode(child: Expression, books: IndexedSeq[Double],
      ncent: Int, sub: Int) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isNumericArray(child.dataType), "pq_encode", "array<float|double>",
        Seq(child.dataType))
    private val m = books.length / (ncent * sub)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val bookArr: Array[Double] = books.toArray
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val dim = m * sub
      val isF = child.dataType match {
        case ArrayType(FloatType, _) => true; case _ => false
      }
      val x = new Array[Double](dim)
      val n = math.min(arr.numElements(), dim)
      var ss = 0.0; var i = 0
      while (i < n) {
        val e = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
        x(i) = e; ss += e * e; i += 1
      }
      val nrm = math.sqrt(ss)
      if (nrm != 0.0) { i = 0; while (i < dim) { x(i) /= nrm; i += 1 } }
      val codes = new Array[Int](m)
      var s = 0
      while (s < m) {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < ncent) {
          val off = (s * ncent + c) * sub
          var d2 = 0.0; var j = 0
          while (j < sub) { val d = x(s * sub + j) - bookArr(off + j); d2 += d * d; j += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        codes(s) = best; s += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bk = ctx.addReferenceObj("pqBooks", bookArr, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val x = ctx.freshName("x"); val codes = ctx.freshName("codes")
        val ss = ctx.freshName("ss"); val nrm = ctx.freshName("nrm")
        val i = ctx.freshName("i"); val s = ctx.freshName("s")
        val c = ctx.freshName("c"); val j = ctx.freshName("j")
        val n = ctx.freshName("n"); val best = ctx.freshName("best")
        val bestD = ctx.freshName("bestD"); val d2 = ctx.freshName("d2")
        val off = ctx.freshName("off"); val dd = ctx.freshName("dd")
        s"""
        double[] $x = new double[${m * sub}];
        int $n = Math.min($a.numElements(), ${m * sub});
        double $ss = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $dd = (double) $a.${getter(child)}($i);
          $x[$i] = $dd; $ss += $dd * $dd;
        }
        double $nrm = Math.sqrt($ss);
        if ($nrm != 0.0) for (int $i = 0; $i < ${m * sub}; $i++) $x[$i] /= $nrm;
        int[] $codes = new int[$m];
        for (int $s = 0; $s < $m; $s++) {
          int $best = 0; double $bestD = Double.MAX_VALUE;
          for (int $c = 0; $c < $ncent; $c++) {
            int $off = ($s * $ncent + $c) * $sub;
            double $d2 = 0.0;
            for (int $j = 0; $j < $sub; $j++) {
              double $dd = $x[$s * $sub + $j] - $bk[$off + $j];
              $d2 += $dd * $dd;
            }
            if ($d2 < $bestD) { $bestD = $d2; $best = $c; }
          }
          $codes[$s] = $best;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
        """
      })
    }
    override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  }

  /** PQ asymmetric-distance score: Σ_s dtable[s·ncent + codes[s]] —
    * the per-query lookup-table scan over PQ codes. `dtable` is flat
    * [s][c] → dtable[s·ncent + c]. Compiled loop, whole-stage codegen. */
  case class PqAdc(child: Expression, dtable: IndexedSeq[Double], ncent: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType match {
        case ArrayType(IntegerType, _) => true; case _ => false
      }, "pq_adc", "array<int>", Seq(child.dataType))
    private val m = dtable.length / ncent
    override def dataType: DataType = DoubleType
    @transient private lazy val tabArr: Array[Double] = dtable.toArray
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), m)
      var acc = 0.0; var s = 0
      // codes outside [0, ncent) contribute 0 — the SQL surface
      // (graft_pq_adc) accepts any array<int>, so a bad code must not
      // throw ArrayIndexOutOfBoundsException on executors
      while (s < n) {
        val c = arr.getInt(s)
        if (c >= 0 && c < ncent) acc += tabArr(s * ncent + c)
        s += 1
      }
      java.lang.Double.valueOf(acc)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tb = ctx.addReferenceObj("pqDtable", tabArr, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val s = ctx.freshName("s")
        val acc = ctx.freshName("acc"); val c = ctx.freshName("c")
        s"""
        int $n = Math.min($a.numElements(), $m);
        double $acc = 0.0;
        for (int $s = 0; $s < $n; $s++) {
          int $c = $a.getInt($s);
          if ($c >= 0 && $c < $ncent) $acc += $tb[$s * $ncent + $c];
        }
        ${ev.value} = $acc;
        """
      })
    }
    override protected def withNewChildInternal(c: Expression): PqAdc = copy(child = c)
  }

  /** Unicode NFC normalization — the canonicalization step before any
    * content hashing/dedup (composed vs decomposed accents would
    * otherwise hash differently). Per-row string kernel,
    * CodegenFallback like the other string kernels; DuckDB twin:
    * `nfc_normalize`. */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, "nfc", "string", Seq(child.dataType))
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      // fast path: NFC-normalized ASCII/latin text skips the copy
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
      else org.apache.spark.unsafe.types.UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
  }

  /** PCM-16LE waveform statistics — the REAL half of the audio
    * plumbing (byte math needs no codec): interpret a binary payload
    * as little-endian signed 16-bit samples and return
    * (n_samples, rms, zero-crossing rate). Same accumulate order as a
    * DuckDB hex-decode replay, so the floats hash cross-engine.
    * A trailing odd byte is ignored; an empty payload returns zeros. */
  case class PcmStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == BinaryType, "pcm_stats", "binary", Seq(child.dataType))
    override def dataType: DataType = StructType(Seq(
      StructField("n_samples", LongType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("zcr", DoubleType, nullable = false)))
    override def nullSafeEval(v: Any): Any = {
      val b = v.asInstanceOf[Array[Byte]]
      val n = b.length / 2
      var sumsq = 0.0
      var crossings = 0L
      var prevNonNeg = true
      var i = 0
      while (i < n) {
        val u = (b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8)
        val s = if (u >= 32768) u - 65536 else u
        sumsq += s.toDouble * s
        val nonNeg = s >= 0
        if (i > 0 && nonNeg != prevNonNeg) crossings += 1
        prevNonNeg = nonNeg
        i += 1
      }
      val rms = if (n == 0) 0.0 else math.sqrt(sumsq / n)
      val zcr = if (n < 2) 0.0 else crossings.toDouble / (n - 1)
      org.apache.spark.sql.catalyst.InternalRow(n.toLong,
        java.lang.Double.valueOf(rms), java.lang.Double.valueOf(zcr))
    }
    override protected def withNewChildInternal(c: Expression): PcmStats = copy(c)
  }

  /** 8×8 average-hash (aHash) over an RGB-raster binary payload — the
    * classic perceptual image fingerprint: slot i (i = 0..63) sums the
    * unsigned bytes [3i, 3i+2] (one RGB triplet; absent bytes past the
    * payload end contribute nothing, so short payloads leave high
    * slots at 0), bit i is set when slot·64 >= Σ slots (exact integer
    * compare — no float mean), bits pack LSB-first into one signed
    * 64-bit value (bit 63 lands on the sign bit; both engines read the
    * same two's-complement value). Applied to
    * [[graft.operators.Multimodal.resizeImages]](8, 8) pixel bytes
    * (192 bytes = 64 RGB triplets) this is exactly average-hash; the
    * oracle replays it from a hex dump of the payload. An empty (or
    * all-zero) payload sets every bit — total 0 makes each slot
    * compare true. One kernel pass per row, CodegenFallback (the
    * per-byte loop dominates). */
  case class AvgHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == BinaryType, "avg_hash64", "binary", Seq(child.dataType))
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val b = v.asInstanceOf[Array[Byte]]
      val g = new Array[Long](64)
      var total = 0L
      var i = 0
      while (i < 64) {
        var s = 0L
        var j = 3 * i
        val end = math.min(3 * i + 3, b.length)
        while (j < end) { s += (b(j) & 0xff); j += 1 }
        g(i) = s
        total += s
        i += 1
      }
      var h = 0L
      var k = 0
      while (k < 64) { if (g(k) * 64 >= total) h |= (1L << k); k += 1 }
      java.lang.Long.valueOf(h)
    }
    override protected def withNewChildInternal(c: Expression): AvgHash64 = copy(c)
  }

  /** Nearest-centroid assignment against a flat (nlist x dim) centroid
    * matrix: argmax of cosine, ties to the smallest index — ONE kernel
    * per row instead of an nlist-branch array_max-of-structs Column
    * expression. The Column form generates nlist inline cosine loops;
    * at nlist=64 the generated method exceeds the JIT's huge-method
    * limit and runs interpreted (sf1 smoke: 37 s/rep vs ~3 s at
    * nlist=8) — and at SemDeDup's web-scale regime (~100k clusters) it
    * would not compile at all. Per-centroid cosine accumulates
    * (dot, |a|², |b|²) in index order, the same arithmetic order as
    * [[CosineSimilarity]]'s eval, so assignments are bit-identical to
    * the Column formulation the oracles replay. A zero-norm pair
    * (cosine undefined, null in the Column form) never wins the argmax;
    * if every centroid ties at undefined, cell 0 is assigned. */
  case class CellAssign(child: Expression, cents: IndexedSeq[Double], nlist: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isNumericArray(child.dataType) && nlist > 0 &&
        cents.nonEmpty && cents.length % nlist == 0,
        "cell_assign", "array<float|double> + flat centroid matrix",
        Seq(child.dataType))
    override def dataType: DataType = IntegerType
    private val dim = cents.length / nlist
    private def elemIsFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val af = elemIsFloat
      val n = math.min(a.numElements(), dim)
      var best = Double.NegativeInfinity
      var bestIdx = 0
      var c = 0
      while (c < nlist) {
        val off = c * dim
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
          val y = cents(off + i)
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom != 0.0) {
          val cos = dot / denom
          if (cos > best) { best = cos; bestIdx = c }
        }
        c += 1
      }
      bestIdx
    }
    override protected def withNewChildInternal(c: Expression): CellAssign =
      copy(child = c)
  }

  /** Hashed-embedding projection: from a doc's (bucket, count) list,
    * compute the dim-component sign projection, L2-normalize and round
    * — one tight long-arithmetic loop per row. Replaces the
    * transform/aggregate higher-order-function formulation, whose
    * per-ELEMENT interpreted lambdas (buckets×dim ≈ 1024 per doc) cost
    * ~60 core-s on the sf1 corpus where this loop costs well under one.
    * Value-identical by construction: sv_d = Σ c·sign (exact LongType,
    * order-free), nrm = sqrt(Σ sv² as long), component =
    * round(sv/nrm, 6) + 0.0 with Spark Round's exact double semantics
    * (NaN/Inf passthrough, BigDecimal.valueOf HALF_UP). `signs` is the
    * flat ±1 matrix indexed [b*dim + d]. */
  case class HashedEmbedProject(child: Expression, signs: IndexedSeq[Long],
      dim: Int) extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      check(dim > 0 && signs.length % dim == 0 && (child.dataType match {
        case ArrayType(st: StructType, _) => st.length == 2 &&
          st.fields.forall(_.dataType == LongType)
        case _ => false
      }), "hashed_embed", "array<struct<b:long,c:long>> + flat sign matrix",
        Seq(child.dataType))
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    @transient private lazy val signArr: Array[Long] = signs.toArray
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val sv = new Array[Long](dim)
      val nBuckets = signArr.length / dim
      var i = 0
      while (i < n) {
        val row = a.getStruct(i, 2)
        val bL = row.getLong(0)
        // graft_hashed_embed is a user-callable SQL function (ADVICE
        // r16): an out-of-domain bucket id must fail descriptively, not
        // as a raw ArrayIndexOutOfBounds (or, for huge ids, a silent
        // b*dim Int overflow into the wrong sign row)
        if (bL < 0 || bL >= nBuckets)
          throw new IllegalArgumentException(
            s"graft_hashed_embed: bucket id $bL outside [0, $nBuckets) " +
              s"for the supplied ${nBuckets}x$dim sign matrix")
        val c = row.getLong(1)
        val off = bL.toInt * dim
        var d = 0
        while (d < dim) { sv(d) += c * signArr(off + d); d += 1 }
        i += 1
      }
      var ss = 0L
      var d = 0
      while (d < dim) { ss += sv(d) * sv(d); d += 1 }
      val nrm = math.sqrt(ss.toDouble)
      val out = new Array[Double](dim)
      d = 0
      while (d < dim) {
        val x = sv(d).toDouble / nrm
        val r =
          if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
          else java.math.BigDecimal.valueOf(x)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        out(d) = r + 0.0
        d += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): HashedEmbedProject =
      copy(child = c)
  }

  /** Adjacent word-bigram strings ("a b"), multiplicity-preserving and
    * in document order — the corpus side of the bigram-LM fit/score.
    * One tight pass per row; the pure-Column formulation
    * (transform(sequence, element_at+struct) under an explode) runs the
    * higher-order function interpreted per element and measured ~2
    * orders slower on the sf1 smoke corpus. Tokens are `trim.split
    * ("\\s+")` like every text kernel; docs with fewer than two tokens
    * return an empty array (no bigram positions). */
  case class WordBigrams(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, "word_bigrams", "string", Seq(child.dataType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val toks = v.toString.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 2) return ArrayData.toArrayData(
        Array.empty[org.apache.spark.unsafe.types.UTF8String])
      val out = new Array[org.apache.spark.unsafe.types.UTF8String](toks.length - 1)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < toks.length - 1) {
        sb.setLength(0)
        sb.append(toks(i)).append(' ').append(toks(i + 1))
        out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
        i += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): WordBigrams =
      copy(child = c)
  }

  /** Register the expressions as SQL functions on a session (idempotent).
    * Exposed names double as the SQL surface: graft_simhash64,
    * graft_cosine, graft_dot. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash",
      exprs => MinHashSignature(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hyperplane_bucket",
      exprs => HyperplaneBucket(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_word_shingles",
      exprs => WordShingleHashes(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_word_shingles_md5",
      exprs => WordShingleMd5(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_intersect_count",
      exprs => IntersectCount(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_l2_normalize",
      exprs => L2Normalize(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_top_ngram",
      exprs => TopNgramStats(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_pq_encode",
      exprs => PqEncode(exprs(0),
        exprs(1).eval().asInstanceOf[ArrayData].toDoubleArray().toIndexedSeq,
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_nfc",
      exprs => NfcNormalize(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_pq_adc",
      exprs => PqAdc(exprs(0),
        exprs(1).eval().asInstanceOf[ArrayData].toDoubleArray().toIndexedSeq,
        exprs(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_pcm_stats",
      exprs => PcmStats(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_avg_hash64",
      exprs => AvgHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_token_count",
      exprs => TokenCount(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_token_fingerprint",
      exprs => TokenFingerprint(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_word_bigrams",
      exprs => WordBigrams(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cell_assign",
      exprs => CellAssign(exprs(0),
        exprs(1).eval().asInstanceOf[ArrayData].toDoubleArray().toIndexedSeq,
        exprs(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_token_margin",
      exprs => TokenBucketMargin(exprs(0),
        exprs(1).eval().asInstanceOf[ArrayData].toDoubleArray().toIndexedSeq,
        exprs(2).eval().asInstanceOf[Number].doubleValue()), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hashed_embed",
      exprs => HashedEmbedProject(exprs(0),
        exprs(1).eval().asInstanceOf[ArrayData].toLongArray().toIndexedSeq,
        exprs(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
  }

  private def ensure(): Unit =
    register(org.apache.spark.sql.SparkSession.active)

  def simhash64(c: Column): Column = { ensure(); org.apache.spark.sql.functions.call_function("graft_simhash64", c) }
  def cosine_sim(a: Column, b: Column): Column = { ensure(); org.apache.spark.sql.functions.call_function("graft_cosine", a, b) }
  def dot_product(a: Column, b: Column): Column = { ensure(); org.apache.spark.sql.functions.call_function("graft_dot", a, b) }
  def minhash_sig(c: Column, k: Int): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_minhash", c, org.apache.spark.sql.functions.lit(k)) }
  def hyperplane_bucket(c: Column, nPlanes: Int): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_hyperplane_bucket", c, org.apache.spark.sql.functions.lit(nPlanes)) }
  def word_shingle_hashes(c: Column, n: Int): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_word_shingles", c, org.apache.spark.sql.functions.lit(n)) }
  def word_shingle_md5(c: Column, n: Int): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_word_shingles_md5", c, org.apache.spark.sql.functions.lit(n)) }
  def intersect_count(a: Column, b: Column): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_intersect_count", a, b) }
  def l2_normalize(c: Column): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_l2_normalize", c) }
  def top_ngram(c: Column, n: Int): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_top_ngram", c, org.apache.spark.sql.functions.lit(n)) }
  def nfc(c: Column): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_nfc", c) }
  def pcm_stats(c: Column): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_pcm_stats", c) }
  def avg_hash64(c: Column): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_avg_hash64", c) }
  def token_count(c: Column): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_token_count", c) }
  def word_bigrams(c: Column): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_word_bigrams", c) }
  def cell_assign(c: Column, cents: Seq[Double], nlist: Int): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_cell_assign", c,
      org.apache.spark.sql.functions.lit(cents.toArray),
      org.apache.spark.sql.functions.lit(nlist)) }
  def token_fingerprint(c: Column): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_token_fingerprint", c) }
  def token_margin(c: Column, weights: Seq[Double], bias: Double): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_token_margin", c,
      org.apache.spark.sql.functions.lit(weights.toArray),
      org.apache.spark.sql.functions.lit(bias)) }
  def pq_encode(c: Column, books: Seq[Double], ncent: Int, sub: Int): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_pq_encode", c,
      org.apache.spark.sql.functions.lit(books.toArray),
      org.apache.spark.sql.functions.lit(ncent), org.apache.spark.sql.functions.lit(sub)) }
  def hashed_embed(c: Column, signs: Seq[Long], dim: Int): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_hashed_embed", c,
      org.apache.spark.sql.functions.lit(signs.toArray),
      org.apache.spark.sql.functions.lit(dim)) }
  def pq_adc(codes: Column, dtable: Seq[Double], ncent: Int): Column =
    { ensure(); org.apache.spark.sql.functions.call_function("graft_pq_adc", codes,
      org.apache.spark.sql.functions.lit(dtable.toArray),
      org.apache.spark.sql.functions.lit(ncent)) }
}
