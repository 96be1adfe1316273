package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`): brute-force cosine top-k as the correctness
  * baseline, and a random-hyperplane LSH bucketed variant as the scale
  * path (bucket join instead of an O(n·q) scan).
  *
  * All vector math is `zip_with`/`aggregate`/`transform` Column
  * expressions — codegen-friendly, no UDF.
  */
object Similarity {

  /** dot(a, b) over array columns — custom Catalyst expression (the
    * zip_with+aggregate formulation is interpreted per element and
    * ~50x slower; see graft.functions.VectorExpressions). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_product(a, b)

  /** L2 norm (pure-Column; used rarely, outside hot loops). */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity of two array columns (custom expression). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine_sim(a, b)

  private def litVec(q: Seq[Float]): Column = array(q.map(x => lit(x.toDouble)): _*)

  /** Brute-force cosine top-k against a literal query vector.
    * At 100 TB this is one pass over the embeddings (no shuffle until
    * the final TakeOrdered heap) — still the right baseline for recall
    * measurement. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame =
    df.select(col(idCol),
        round(cosine(col(vecCol).cast(ArrayType(DoubleType)), litVec(query)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplane component h_{p,i}: a unit-
    * free ±value derived from xxhash64(p, i) — identical across runs and
    * engines, so buckets are reproducible. */
  private def planeComponent(p: Int, i: Column): Column =
    (call_function("shiftright", xxhash64(lit(p), i), lit(32)).cast(DoubleType) / 1e9)

  /** Sign-of-projection LSH bucket id from nPlanes deterministic
    * hyperplanes (custom Catalyst expression — see VectorExpressions). */
  def hyperplaneBucket(vec: Column, nPlanes: Int): Column =
    graft.functions.VectorExpressions.hyperplane_bucket(vec, nPlanes)

  /** LSH-bucketed ANN: search only the query's bucket. Trades recall
    * for a ~2^nPlanes-fold candidate reduction; at scale the bucket id
    * becomes the shuffle/partition key so each query touches one
    * partition group. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nPlanes: Int): DataFrame = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val withBucket = df.select(col(idCol), v.as("v"),
      hyperplaneBucket(v, nPlanes).as("bucket"))
    val qRow = df.sparkSession.range(1)
      .select(hyperplaneBucket(litVec(query), nPlanes).as("qbucket"))
    withBucket.join(broadcast(qRow), col("bucket") === col("qbucket"))
      .select(col(idCol), round(cosine(col("v"), litVec(query)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nlist` cells by
    * nearest centroid, search only the `nprobe` cells nearest the query.
    * The FAISS-style coarse quantizer, engine-reproducible: centroids
    * are the embeddings of the `nlist` rows with the smallest
    * md5(id) — a deterministic pseudo-random sample (no k-means RNG
    * state), so any engine derives the identical index.
    *
    * Scale: centroid selection is a tiny top-k; assignment is `nlist`
    * compiled cosine kernels inside the scan stage (no shuffle, no
    * explode); at 100 TB the corpus is written bucketed/partitioned by
    * `cell` once, and every query then reads only nprobe/nlist of the
    * data — the same plan as the LSH variant but with data-adaptive
    * cells. At real scale the seed sample would be refined with a few
    * k-means iterations; the probe/assignment plumbing is identical. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nlist: Int, nprobe: Int): DataFrame = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val (seeds, cell) = seedCells(df, idCol, vecCol, nlist)
    // probe: the nprobe cells nearest the query (driver-side, nlist is tiny)
    val probed = probeCells(seeds, query, nprobe)
    df.select(col(idCol), v.as("v"), cell.as("cell"))
      .filter(col("cell").isin(probed: _*))
      .select(col(idCol), round(cosine(col("v"), litVec(query)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** k-NN JOIN: for EVERY row of `queries`, its `k` nearest `corpus`
    * rows by cosine — the bulk retrieval shape (augmentation, labeling
    * by neighbors, hard-negative mining), where per-query loops or a
    * cross join would be quadratic. Both sides hash into the same
    * deterministic hyperplane LSH buckets; candidates meet ONLY inside
    * their bucket, and a per-query WindowGroupLimit keeps the top k.
    *
    * Scale: one shuffle of each side on the bucket key (co-partitioned
    * equi-join — at 100 TB both sides can be bucketed-by-LSH on write
    * and the join goes exchange-free, see [[Bucketing]]); candidate
    * volume is corpus/2^nPlanes per query in expectation. Recall is
    * the single-bucket LSH trade — raise it by lowering nPlanes (or
    * running multiple plane sets) at more candidates per query.
    * Scores are true cosines; only candidate SELECTION is approximate.
    *
    * `excludeSelf` drops identity pairs BY ID — right for self-joins
    * (the default usage); pass `false` when `queries` and `corpus` are
    * genuinely different tables whose id spaces may collide. */
  def knnJoin(queries: DataFrame, qIdCol: String, corpus: DataFrame,
      cIdCol: String, vecCol: String, k: Int, nPlanes: Int,
      excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qv = col(vecCol).cast(ArrayType(DoubleType))
    val q = queries.select(col(qIdCol).as("query_id"), qv.as("__qv"),
      hyperplaneBucket(qv, nPlanes).as("__b"))
    val c = corpus.select(col(cIdCol).as("neighbor_id"), qv.as("__cv"),
      hyperplaneBucket(qv, nPlanes).as("__b"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    val pairs = q.join(c, Seq("__b"))
    (if (excludeSelf) pairs.filter(col("query_id") =!= col("neighbor_id")) else pairs)
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("__qv"), col("__cv")), 4).as("cos"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic md5-seeded coarse quantizer, shared by [[ivfTopK]]
    * and [[diversitySample]]: the `nlist` rows with the smallest
    * md5(id) act as centroids (cell id = the seed row's id), and the
    * returned Column assigns each vector its nearest cell via the
    * compiled cosine argmax — a pure scan-stage expression, ties to the
    * smallest centroid id (the ordering the oracle's row_number uses).
    * Bounded driver traffic: `nlist` seed vectors. */
  private[operators] def seedCells(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int): (Seq[(Long, Seq[Double])], Column) = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val seeds: Seq[(Long, Seq[Double])] = seedRows(df, idCol, v, nlist)
    val assigned = array_max(array(seeds.map { case (cid, c) =>
      struct(cosine(v, array(c.map(lit): _*)).as("cos"), lit(-cid).as("negid"))
    }: _*))
    (seeds, -assigned.getField("negid"))
  }

  /** The deterministic seed draw every quantizer shares: the `n` rows
    * with the smallest md5(id), as (id, vector). THE seeding order all
    * oracles and determinism specs replay — one definition so the
    * copies cannot drift. Bounded driver traffic: `n` vectors. */
  private def seedRows(df: DataFrame, idCol: String, vec: Column,
      n: Int): IndexedSeq[(Long, IndexedSeq[Double])] =
    df.select(col(idCol).cast(LongType).as("cid"), vec.as("c"))
      .orderBy(md5(col("cid").cast(StringType).cast(BinaryType)), col("cid"))
      .limit(n).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq)).toIndexedSeq

  /** Driver-side probe selection shared by the IVF variants: the
    * `nprobe` centroid ids nearest the query by cosine, ties to the
    * smaller id. */
  private def probeCells(seeds: Seq[(Long, Seq[Double])], query: Seq[Float],
      nprobe: Int): Seq[Long] = probeCellsD(seeds, query.map(_.toDouble), nprobe)

  private def probeCellsD(seeds: Seq[(Long, Seq[Double])], qd: Seq[Double],
      nprobe: Int): Seq[Long] = {
    def cosD(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    seeds.map { case (cid, c) => (cid, cosD(c, qd)) }
      .sortBy { case (cid, cos) => (-cos, cid) }.take(nprobe).map(_._1)
  }

  /** Embedding-diversity (cell-stratified) sampling: every vector is
    * assigned to its nearest md5-seeded centroid cell, and at most
    * `perCell` rows survive per cell, chosen by the same
    * content-independent md5-of-id order as
    * [[graft.operators.Curation.quotaSample]] — semantic coverage
    * sampling: sparse regions of embedding space keep representation
    * that proportional/random sampling would wash out.
    *
    * Scale: cell assignment is `nlist` compiled cosine kernels inside
    * the scan (no explode, no join); the per-cell top-k is one shuffle
    * on the cell key with WindowGroupLimit pruning (rank ≤ perCell)
    * pushed to the map side. Deterministic across runs AND engines. */
  def diversitySample(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, perCell: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, cell) = seedCells(df, idCol, vecCol, nlist)
    val w = Window.partitionBy(col("cell"))
      .orderBy(md5(col(idCol).cast(StringType).cast(BinaryType)), col(idCol))
    df.select(col(idCol), cell.as("cell"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= perCell)
      .select(col(idCol), col("cell"))
  }

  /** Product-quantization (PQ) ANN: each vector compresses to `m`
    * small codes (nearest centroid per subspace), and search scores
    * candidates from a per-query distance TABLE instead of the raw
    * vectors — Jégou/Douze/Schmid's asymmetric distance computation,
    * the memory-side complement to IVF's compute-side pruning. With
    * m=8 subspaces × 16 centroids a 64-dim float vector becomes 8
    * codes (32× compression): at 100 TB the code table fits where the
    * raw embeddings never could, and the raw vectors are read only to
    * rescore the `refine·k` shortlist.
    *
    * Engine-reproducible like the IVF family: codebooks start as
    * md5-seeded row slices (no RNG state) and are refined by
    * `trainIters` distributed per-subspace Lloyd iterations; encoding
    * is ONE compiled kernel ([[graft.functions.VectorExpressions.PqEncode]],
    * normalize + argmin in a single scan-stage loop) and the ADC score
    * one compiled table-lookup kernel — no join, no shuffle before the
    * top-k heaps.
    *
    * Exactness contract: returned `cos` values are TRUE cosines
    * (rescored on the shortlist); PQ only decides which candidates
    * reach the rescore, so recall is approximate but scores are not. */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String, query: Seq[Float],
      k: Int, m: Int = 8, ncent: Int = 16, refine: Int = 8,
      trainIters: Int = 2): DataFrame = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val (books, sub) = pqTrain(df, idCol, vecCol, m, ncent, trainIters)
    val codes = graft.functions.VectorExpressions.pq_encode(v, books, ncent, sub)
    val dtable = pqDistanceTable(books, query, m, ncent, sub)
    val approx = graft.functions.VectorExpressions.pq_adc(col("__codes"), dtable, ncent)
    df.select(col(idCol), v.as("v"), codes.as("__codes"))
      .withColumn("__approx", approx)
      .orderBy(col("__approx"), col(idCol))
      .limit(refine * k)
      .select(col(idCol), round(cosine(col("v"), litVec(query)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** PQ codebook training — the BUILD step of the index lifecycle,
    * separable from search so codebooks train once per corpus, not per
    * query. Returns the flat [s][c][j] codebook plus the subspace
    * width. Deterministic: md5-seeded starts, distributed per-subspace
    * Lloyd iterations (assignment runs in the scan via the compiled
    * kernel; ONE posexplode aggregate per iteration returns
    * m × ncent × sub means to the driver — 1024 doubles at the
    * defaults). Means rounded (6 dp) for cross-run stability; empty
    * cells keep their centroid. Raw md5 seeds quantize noticeably
    * worse — recall at the same shortlist roughly doubles after two
    * iterations. */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ncent: Int, trainIters: Int): (IndexedSeq[Double], Int) = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    // the target metric is cosine: encode/score UNIT vectors so L2
    // ADC order coincides with cosine order (‖a−b‖² = 2−2cos on the
    // sphere) — PQ on raw norms would rank by magnitude, not angle
    val vn = graft.functions.VectorExpressions.l2_normalize(v)
    // ONE source scan regardless of `trainIters`: the projected
    // (id, raw, unit) frame is persisted and serves the seed fetch and
    // every Lloyd iteration (the unpersisted loop re-read the source
    // trainIters+1 times). The skip applies only when THIS exact frame
    // was persisted by the caller (storageLevel is plan-identity-based)
    // — a filtered slice of a cached frame still gets its own cache
    // here, a strict subset reading from the parent's cache.
    val projected = df.select(col(idCol).cast(LongType).as("__id"),
      v.as("__v"), vn.as("__vn"))
    val inputCached = df.storageLevel != StorageLevel.NONE
    val train = if (inputCached) projected
      else projected.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val seeds: IndexedSeq[IndexedSeq[Double]] =
        seedRows(train, "__id", col("__vn"), ncent).map(_._2)
      require(seeds.nonEmpty, "PQ training frame is empty")
      val dim = seeds.head.length
      require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
      val sub = dim / m
      // a frame smaller than ncent (tiny corpus, or an IVF probe slice)
      // seeds by cycling the available rows — fewer EFFECTIVE centroids,
      // no crash; Lloyd then separates the duplicated cells
      def seed(c: Int): IndexedSeq[Double] = seeds(c % seeds.length)
      var books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = (0 until m).map(s =>
        (0 until ncent).map(c => seed(c).slice(s * sub, (s + 1) * sub)))
      def flatBooks: IndexedSeq[Double] =
        for (s <- 0 until m; c <- 0 until ncent; j <- 0 until sub)
          yield books(s)(c)(j)
      for (_ <- 1 to trainIters) {
        val codes = graft.functions.VectorExpressions.pq_encode(
          col("__v"), flatBooks, ncent, sub)
        // same Generate-barrier as the k-means means pass: encode once
        // per ROW below the posexplode, not once per exploded dimension
        val means = train.select(codes.as("__cs"), col("__vn"))
          .select(col("__cs"), posexplode(col("__vn")))
          .select(expr(s"pos div $sub").as("s"),
            element_at(col("__cs"), expr(s"pos div $sub").cast(IntegerType) + 1).as("c"),
            expr(s"pos % $sub").as("j"), col("col").as("x"))
          .groupBy("s", "c", "j").agg(avg("x").as("mu"))
          .collect()
          .map(r => ((r.getAs[Number]("s").intValue(), r.getAs[Number]("c").intValue(),
            r.getAs[Number]("j").intValue()), r.getAs[Double]("mu")))
          .toMap
        books = (0 until m).map(s => (0 until ncent).map { c =>
          if (!means.contains((s, c, 0))) books(s)(c)
          else (0 until sub).map(j => BigDecimal(means((s, c, j)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toIndexedSeq
        })
      }
      (flatBooks, sub)
    } finally if (!inputCached) train.unpersist(blocking = false)
  }

  /** Encode the corpus into the persistable PQ index: (id, codes) —
    * m small ints per row instead of the raw vector (32× smaller at
    * the defaults on 64-dim floats). Write THIS table out; search
    * never touches raw vectors until the rescore. */
  def pqEncodeIndex(df: DataFrame, idCol: String, vecCol: String,
      books: IndexedSeq[Double], ncent: Int, sub: Int): DataFrame =
    df.select(col(idCol), graft.functions.VectorExpressions.pq_encode(
      col(vecCol).cast(ArrayType(DoubleType)), books, ncent, sub).as("codes"))

  /** Per-query ADC table over the flat codebook: dtable[s·ncent+c] =
    * ‖q_s − b_sc‖² (driver-side, m × ncent doubles). */
  private def pqDistanceTable(books: IndexedSeq[Double], query: Seq[Float],
      m: Int, ncent: Int, sub: Int): IndexedSeq[Double] =
    pqDistanceTableD(books, query.map(_.toDouble), m, ncent, sub)

  private def pqDistanceTableD(books: IndexedSeq[Double], qraw: Seq[Double],
      m: Int, ncent: Int, sub: Int): IndexedSeq[Double] = {
    val qnorm = math.sqrt(qraw.map(x => x * x).sum)
    val qd = (if (qnorm == 0.0) qraw else qraw.map(_ / qnorm)).toIndexedSeq
    for (s <- 0 until m; c <- 0 until ncent) yield {
      (0 until sub).map { j =>
        val d = qd(s * sub + j) - books((s * ncent + c) * sub + j); d * d
      }.sum
    }
  }

  /** SEARCH over a prebuilt PQ index: ADC-rank the CODES table (the
    * only thing scanned — 32× less IO than raw vectors), then join the
    * refine·k shortlist back to the raw table for the true-cosine
    * rescore (an unhinted join of a k-row side — AQE broadcasts it).
    * Same results as [[pqTopK]] with the same codebooks; the spec
    * gates the equivalence. */
  def pqSearch(index: DataFrame, books: IndexedSeq[Double], raw: DataFrame,
      idCol: String, vecCol: String, query: Seq[Float], k: Int,
      m: Int = 8, ncent: Int = 16, refine: Int = 8): DataFrame = {
    val sub = books.length / (m * ncent)
    val dtable = pqDistanceTable(books, query, m, ncent, sub)
    val short = index
      .withColumn("__approx",
        graft.functions.VectorExpressions.pq_adc(col("codes"), dtable, ncent))
      .orderBy(col("__approx"), col(idCol))
      .limit(refine * k)
      .select(idCol)
    short.join(raw, idCol)
      .select(col(idCol),
        round(cosine(col(vecCol).cast(ArrayType(DoubleType)), litVec(query)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF-PQ — the production FAISS composition: the IVF coarse
    * quantizer prunes COMPUTE (only `nprobe`/`nlist` of the corpus is
    * scored) while PQ codes prune MEMORY (candidates are scored from
    * `m` compressed codes via the ADC table, not raw vectors); the
    * shortlist alone is rescored with true cosines. At 100 TB: corpus
    * bucketed by cell on write, queries read nprobe cells' CODE
    * tables, touch raw vectors only for refine·k rows.
    *
    * Composition of [[seedCells]] (cell assignment) and the
    * [[pqTopK]] kernels (encode/ADC), both scan-stage; one filter, two
    * top-k heaps, no join/shuffle anywhere.
    *
    * Codebooks here train PER QUERY on the probed-cells slice (they
    * adapt to the probed region; deterministic given the query). For
    * the amortized production shape — train once, persist codes,
    * search many — compose [[pqTrain]] / [[pqEncodeIndex]] /
    * [[pqSearch]] per cell instead. */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nlist: Int = 8, nprobe: Int = 2,
      m: Int = 8, ncent: Int = 16, refine: Int = 8,
      trainIters: Int = 2): DataFrame = {
    // one persisted (id, vec) projection serves the coarse seed fetch,
    // the probed-slice PQ training loop, the encode, and the final
    // rescore — ONE source scan for the whole query. The PQ trainer
    // additionally caches its probed SLICE (a filtered frame's
    // storageLevel is NONE, so its skip-persist check does not fire) —
    // a strict-subset second cache fed from this projection's cache,
    // nprobe/nlist of the corpus.
    Dedup.viaPersisted(df.select(col(idCol), col(vecCol))) { proj =>
      val (seeds, cell) = seedCells(proj, idCol, vecCol, nlist)
      val probed = probeCells(seeds, query, nprobe)
      // the PQ stage sees only the probed cells; pqTopK internally trains
      // codebooks on that slice, encodes in-scan, ADC-ranks and rescores
      pqTopK(proj.filter(cell.isin(probed: _*)), idCol, vecCol, query,
        k, m, ncent, refine, trainIters)
    }
  }

  /** IVF with a k-means-refined coarse quantizer: the md5-seeded
    * centroids of [[ivfTopK]] improved by `iters` spherical Lloyd
    * iterations before the same probe/assign/top-k plumbing. Data-
    * adaptive cells follow the embedding distribution, so cell
    * populations even out and recall-per-probe rises vs raw seeds —
    * the step a production FAISS-style index performs at build time.
    *
    * Distribution: each iteration assigns cells with the compiled
    * cosine argmax INSIDE the scan (no shuffle of vectors beyond the
    * per-(cell, dim) partial means of the hash aggregation), and only
    * `nlist × dim` averaged doubles return to the driver — the same
    * bounded-collect class as the seed fetch. Empty cells retain their
    * previous centroid. Centroid means are rounded (6 dp) and
    * L2-normalized each round, keeping trajectories stable across
    * repeated runs. */
  def ivfTopKKMeans(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nlist: Int, nprobe: Int,
      iters: Int = 3): DataFrame = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    // one persisted (id, vec) projection serves the k-means trainer
    // (which detects the cache and skips its own persist), the final
    // cell-assign pass, and the seed fetch — ONE source scan for the
    // whole query instead of iters+2
    Dedup.viaPersisted(df.select(col(idCol), v.as("__v"))) { proj =>
      val centroids = kmeansCentroids(proj, idCol, "__v", nlist, iters)
      val probed = probeCells(
        centroids.zipWithIndex.map { case (c, i) => (i.toLong, c) }, query, nprobe)
      proj.select(col(idCol), col("__v").as("v"),
          cellAssign(col("__v"), centroids).as("cell"))
        .filter(col("cell").isin(probed: _*))
        .select(col(idCol), round(cosine(col("v"), litVec(query)), 4).as("cos"))
        .orderBy(col("cos").desc, col(idCol))
        .limit(k)
    }
  }

  /** Nearest-centroid cell id as a scan-stage expression: argmax of
    * cosine over `cs`, ties to the smallest index. ONE compiled kernel
    * holding the flat centroid matrix ([[graft.functions
    * .VectorExpressions.CellAssign]]) — the previous array_max-of-
    * structs form generated nlist inline cosine loops, which blows the
    * JIT's method limit past nlist≈64 and could never reach SemDeDup's
    * web-scale regime (~100k clusters). Assignment values are
    * bit-identical (same per-centroid accumulation order). */
  private[graft] def cellAssign(v: Column, cs: IndexedSeq[Seq[Double]]): Column =
    graft.functions.VectorExpressions.cell_assign(v, cs.flatten, cs.length)

  /** Spherical-k-means centroids: md5-seeded start, `iters` Lloyd
    * iterations. Each iteration's assignment runs in the scan stage;
    * only nlist × dim per-(cell, dim) means return to the driver.
    * Means are L2-normalized and rounded (6 dp) each round; empty cells
    * keep their previous centroid. Every Lloyd step is monotone in the
    * spherical objective (mean cosine to assigned centroid) up to the
    * rounding epsilon — the property the spec gates. */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int): IndexedSeq[Seq[Double]] = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    def normD(c: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0.0) c else c.map(x => BigDecimal(x / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // ONE source scan regardless of `iters`: the projected (id, vec)
    // frame is persisted and serves the seed fetch and every Lloyd
    // iteration (the unpersisted loop re-read the source iters+1
    // times). Skipped when the input plan is already cached.
    val projected = df.select(col(idCol).cast(LongType).as("__id"), v.as("__v"))
    val inputCached = df.storageLevel != StorageLevel.NONE
    val train = if (inputCached) projected
      else projected.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: IndexedSeq[Seq[Double]] =
        seedRows(train, "__id", col("__v"), nlist).map(s => normD(s._2))
      require(centroids.nonEmpty, "k-means training frame is empty")
      for (_ <- 1 to iters) {
        // per-(cell, dim) means: nlist x dim rows to the driver, bounded.
        // TWO selects, not one: a select that mixes cellAssign with
        // posexplode plans the assignment in the Project ABOVE the
        // Generate, re-evaluating the nlist-branch argmax once per
        // exploded DIMENSION (nlist=64 at the sf1 smoke turned a
        // seconds-long pass into minutes). The barrier select computes
        // the cell once per row, below the Generate.
        val means = train
          .select(cellAssign(col("__v"), centroids).as("cell"), col("__v"))
          .select(col("cell"), posexplode(col("__v")))
          .groupBy("cell", "pos").agg(avg("col").as("m"))
          .collect().map(r => ((r.getAs[Number]("cell").intValue(), r.getInt(1)), r.getDouble(2)))
          .toMap
        val dim = centroids.head.length
        centroids = centroids.indices.map { c =>
          if (means.contains((c, 0))) normD((0 until dim).map(d => means((c, d))))
          else centroids(c) // empty cell keeps its centroid
        }
      }
      centroids
    } finally if (!inputCached) train.unpersist(blocking = false)
  }

  /** For each vector, its nearest neighbor (by cosine) within a blocking
    * key — the bulk variant of top-k used for near-dup mining.
    *
    * Normalizes each vector ONCE per row (compiled
    * [[graft.functions.VectorExpressions.L2Normalize]] kernel) before
    * the block self-join, so the O(pairs) stage is a plain dot product —
    * 1/3 the flops of a fused cosine, and the normalization cost is
    * amortized over every pair the row participates in.
    *
    * Skew guard: a block larger than `maxBlock` (a dominant language at
    * crawl scale) would go quadratic; such blocks are sub-bucketed with
    * the deterministic hyperplane LSH before pairing, so candidates
    * meet only inside (block, sub-bucket) — the same locality argument
    * as [[knnJoin]]. Blocks at or under the threshold keep the EXACT
    * all-pairs semantics; above it the neighbor is approximate (and a
    * row alone in its sub-bucket drops out, like an unmatched LSH
    * probe).
    *
    * The default `maxBlock=2000` is a pair-budget bound: an exact block
    * admits at most ~4x10^6 pairs (b^2), a few seconds of dot products
    * per block — the previous 10000 default allowed ~5x10^7 pairs per
    * block before the guard engaged, and the sf1 smoke measured that
    * exact path at 17-60 s vs 1.6-2.8 s guarded (r8 verdict #3). Raise
    * it only when block-exact semantics are worth the quadratic cost. */
  def nearestNeighborWithinBlock(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, maxBlock: Int = 2000, nPlanes: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Deliberately LAZY and unpersisted: the result is one row per
    // input row, so the viaPersisted pattern (eager materialize +
    // retained cache) would pin a corpus-sized block until releaseAll.
    // The tagged stage is recomputed once per self-join side — a
    // normalize + broadcast-tag scan, far cheaper than a corpus-sized
    // cache at scale (the O(pairs) work happens only once either way).
    val w = Window.partitionBy("id").orderBy(col("cos").desc, col("id_b"))
    nnPairsOf(nnTagged(df, idCol, vecCol, blockCol, maxBlock, nPlanes))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("id_b").as("neighbor_id"))
  }

  /** (blk, sub-bucket, id, unit-vector) frame for [[nearestNeighborWithinBlock]]:
    * the per-block sizes are a |blocks|-row frame — AQE broadcasts the
    * tag join, so the corpus shuffles only on the pair key. Sub-buckets
    * apply ONLY to oversized blocks: the sign-pattern of the vector
    * against `nPlanes` deterministic hyperplanes (scale-invariant, so
    * bucketing the normalized vector equals bucketing the raw one). */
  private def nnTagged(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, maxBlock: Int, nPlanes: Int): DataFrame = {
    val vn = graft.functions.VectorExpressions.l2_normalize(col(vecCol))
    val base = df.select(col(blockCol).as("blk"), col(idCol).as("id"), vn.as("__v"))
    val sizes = base.groupBy("blk").agg(count(lit(1)).as("__bn"))
    base.join(sizes, Seq("blk"))
      .withColumn("__sb", when(col("__bn") <= maxBlock, lit(0L))
        .otherwise(hyperplaneBucket(col("__v"), nPlanes).cast(LongType)))
  }

  /** Self-join of the tagged frame on (block, sub-bucket) → scored
    * candidate pairs. */
  private def nnPairsOf(tagged: DataFrame): DataFrame = {
    val l = tagged.select(col("blk"), col("__sb"), col("id"), col("__v").as("v_a"))
    val r = tagged.select(col("blk"), col("__sb"), col("id").as("id_b"), col("__v").as("v_b"))
    l.join(r, Seq("blk", "__sb")).filter(col("id") =!= col("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")))
  }

  /** Candidate-pair stage of [[nearestNeighborWithinBlock]], separable
    * so the skew spec can gate the pair count. */
  private[graft] def nnCandidatePairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, maxBlock: Int, nPlanes: Int): DataFrame =
    nnPairsOf(nnTagged(df, idCol, vecCol, blockCol, maxBlock, nPlanes))

  // ===== Batch (multi-probe) ANN =====
  //
  // The production retrieval shape: MANY query vectors against one
  // index in ONE job — per-probe driver loops would re-scan the corpus
  // per query. Every batch variant broadcasts the probe set (bounded:
  // n × dim doubles), trains its index ONCE (training is probe-
  // independent), and resolves the per-probe top-k with a single
  // windowed rank whose map-side WindowGroupLimit keeps ≤k rows per
  // probe per partition before the shuffle. Results are
  // (probe_id, <id>, cos) with true rounded cosines.

  /** The deterministic probe draw for batch evaluation: the `n` rows
    * with the smallest md5(id || "probe") — SALTED so the probe set is
    * not the same head-of-md5-order rows the quantizer seeds
    * ([[seedRows]]) pick, which would grade ANN recall mostly on the
    * centroids themselves. Bounded driver traffic: n vectors. */
  def probeRows(df: DataFrame, idCol: String, vecCol: String,
      n: Int): IndexedSeq[(Long, IndexedSeq[Double])] =
    df.select(col(idCol).cast(LongType).as("pid"),
        col(vecCol).cast(ArrayType(DoubleType)).as("pv"))
      .orderBy(md5(concat(col("pid").cast(StringType), lit("probe")).cast(BinaryType)),
        col("pid"))
      .limit(n).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq)).toIndexedSeq

  private def probeFrame(df: DataFrame,
      probes: Seq[(Long, Seq[Double])]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    probes.map { case (pid, pv) => (pid, pv) }.toDF("probe_id", "pv")
  }

  /** Per-probe top-k cut shared by the batch variants: rank ≤ k within
    * probe_id on (cos desc, id) — Spark's WindowGroupLimit prunes to k
    * rows per probe per partition on the map side, so the shuffle
    * carries O(probes × k × partitions), not the scored candidates. */
  private def topPerProbe(scored: DataFrame, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col(idCol))
    scored.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .select(col("probe_id"), col(idCol), col("cos"))
  }

  /** Exact batch ground truth: one corpus pass scores every (probe,
    * row) pair against the broadcast probe set; per-probe top-k via the
    * group-limited window. O(n·probes) compiled dot products — the
    * recall baseline, not the scale path.
    *
    * No FanOut here — measured NET NEGATIVE twice: (r16) dimAblation /
    * ann_recall call this repeatedly and each call pays its own
    * exchange + 32-task stage (pl_emb_dim_ablation 1.7 → 3.2 s fresh);
    * (r17, VERDICT r16 #7 tried) fanning out even the ONE exact batch
    * in pl_emb_ann_recall added ~13 core-s of task/JIT overhead to
    * parallelize ~0.7 core-s of cosine work — wall flat-to-worse
    * (3-rep A/B: 16-19 vs 3.2-4.2 core-s task time, walls
    * overlapping). The single-task scan is the fixture's layout, not
    * a scale property — a real corpus scan is already parallel. */
  def bruteForceTopKBatch(df: DataFrame, idCol: String, vecCol: String,
      probes: Seq[(Long, Seq[Double])], k: Int): DataFrame = {
    val scored = df.select(col(idCol), col(vecCol).cast(ArrayType(DoubleType)).as("__v"))
      .crossJoin(broadcast(probeFrame(df, probes)))
      .select(col("probe_id"), col(idCol),
        round(cosine(col("__v"), col("pv")), 4).as("cos"))
    topPerProbe(scored, idCol, k)
  }

  /** Dimension-truncation recall ablation — the matryoshka-embedding
    * question: how many LEADING dimensions still retrieve what the
    * full vectors retrieve? For `nProbes` md5-sampled probes, the
    * exact top-k under each truncated prefix length is compared to the
    * full-dimension exact top-k; one row per dim with mean/min
    * recall@k. This is the measurement that licenses storing and
    * searching a prefix at a fraction of the memory and flops.
    *
    * Determinism: every ranking is (round(cos,4) desc, id) like the
    * other exact paths; recall arithmetic is integer hit counts over
    * k·probes with one final division — replayable in any engine.
    *
    * Scale: one scored corpus pass per dim (probes broadcast, per-probe
    * group-limited top-k); driver traffic is probes×k ids per dim. */
  def dimAblation(df: DataFrame, idCol: String, vecCol: String,
      nProbes: Int, k: Int, dims: Seq[Int]): DataFrame = {
    require(dims.nonEmpty && nProbes > 0 && k > 0, "need dims, probes, k")
    val spark = df.sparkSession
    import spark.implicits._
    val probes = probeRows(df, idCol, vecCol, nProbes)
    def topIds(frame: DataFrame, vc: String, ps: Seq[(Long, Seq[Double])]): Array[(Long, Long)] =
      bruteForceTopKBatch(frame, idCol, vc, ps, k)
        .select(col("probe_id"), col(idCol).cast(LongType))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    val full = topIds(df, vecCol, probes).toSet
    val rows = dims.map { d =>
      val truncated = df.select(col(idCol),
        slice(col(vecCol).cast(ArrayType(DoubleType)), 1, d).as("__tv"))
      val got = topIds(truncated, "__tv", probes.map { case (id, v) => (id, v.take(d)) })
      val hitsByProbe = got.groupBy(_._1).map { case (pid, g) =>
        pid -> g.count(full.contains) }
      val totalHits = probes.map { case (pid, _) => hitsByProbe.getOrElse(pid, 0) }.sum
      val minHits = probes.map { case (pid, _) => hitsByProbe.getOrElse(pid, 0) }.min
      (d.toLong,
        BigDecimal(totalHits.toDouble / (k.toLong * probes.size))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(minHits.toDouble / k)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    rows.toDF("dim", "mean_recall", "min_recall")
  }

  /** Batch LSH ANN: corpus and probes hash into the same deterministic
    * hyperplane buckets; candidates meet only inside their bucket
    * (broadcast hash join on the bucket key — no shuffle of the
    * corpus), then the per-probe top-k cut. */
  def lshTopKBatch(df: DataFrame, idCol: String, vecCol: String,
      probes: Seq[(Long, Seq[Double])], k: Int, nPlanes: Int): DataFrame = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val pf = probeFrame(df, probes)
      .select(col("probe_id"), col("pv"), hyperplaneBucket(col("pv"), nPlanes).as("__b"))
    val scored = df.select(col(idCol), v.as("__v"), hyperplaneBucket(v, nPlanes).as("__b"))
      .join(broadcast(pf), "__b")
      .select(col("probe_id"), col(idCol),
        round(cosine(col("__v"), col("pv")), 4).as("cos"))
    topPerProbe(scored, idCol, k)
  }

  /** Per-cluster corpus profile on a learned spherical-k-means
    * clustering: size, dominant label, and purity (dominant share) per
    * cell — the triage view a curator reads before setting per-cluster
    * sampling or filtering rates. Shares [[kmeansCentroids]]'s
    * deterministic trajectory (and therefore the SemDeDup clustering).
    * One persisted (id, vec, label) projection serves training and the
    * final assignment; the result is an nlist-row frame. */
  def clusterProfile(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, nlist: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(vecCol).cast(ArrayType(DoubleType))
    Dedup.viaPersisted(
        df.select(col(idCol), v.as("__v"), col(labelCol).as("__lab"))) { proj =>
      val centroids = kmeansCentroids(proj, idCol, "__v", nlist, iters)
      val assigned = proj.select(
        cellAssign(col("__v"), centroids).cast(LongType).as("cell"),
        col("__lab"))
      val perLabel = assigned.groupBy("cell", "__lab")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("cell").orderBy(col("n").desc, col("__lab"))
      val dom = perLabel.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("cell"), col("__lab").as("dom_label"), col("n").as("__domN"))
      val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("size"))
      sizes.join(dom, Seq("cell"))
        .select(col("cell"), col("size"), col("dom_label"),
          round(col("__domN").cast(DoubleType) / col("size"), 4).as("purity"))
    }
  }

  /** Prototype-distance pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws: beating power-law scaling via data pruning"): train
    * spherical k-means on the embeddings ([[kmeansCentroids]],
    * deterministic), score every vector by cosine to its ASSIGNED
    * centroid (prototypicality), and keep only the `keepPermill`
    * hardest — least prototypical — members of each cell (ties: lowest
    * id; every non-empty cell keeps at least one member). This is the
    * paper's data-rich-regime rule: easy, redundant examples near the
    * cluster center go, the informative boundary examples stay. The cut
    * is per-cell rather than global — the paper's class-balanced
    * variant — which also avoids a global sort of the corpus.
    *
    * Scale: one persisted (id, vec) projection serves training,
    * assignment and scoring; the centroid table (nlist × dim) and the
    * cell-size table (nlist rows) broadcast; the per-cell cut is a
    * row_number window partitioned by cell (WindowGroupLimit-friendly).
    * Returns (idCol, cell, proto_cos) survivors, proto_cos at 6 dp. */
  def prototypePrune(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int, keepPermill: Int): DataFrame = {
    require(keepPermill > 0 && keepPermill <= 1000, "keepPermill in (0, 1000]")
    import org.apache.spark.sql.expressions.Window
    val v = col(vecCol).cast(ArrayType(DoubleType))
    Dedup.viaPersisted(df.select(col(idCol), v.as("__v"))) { proj =>
      val centroids = kmeansCentroids(proj, idCol, "__v", nlist, iters)
      val spark = df.sparkSession
      import spark.implicits._
      val centDf = centroids.zipWithIndex
        .map { case (c, i) => (i.toLong, c) }.toDF("cell", "__c")
      val scored = proj.select(col(idCol),
          cellAssign(col("__v"), centroids).cast(LongType).as("cell"), col("__v"))
        .join(broadcast(centDf), Seq("cell"))
        .select(col(idCol), col("cell"),
          round(cosine(col("__v"), col("__c")), 6).as("proto_cos"))
      val sizes = scored.groupBy("cell").agg(count(lit(1)).as("__n"))
      val w = Window.partitionBy("cell").orderBy(col("proto_cos").asc, col(idCol))
      scored.join(broadcast(sizes), Seq("cell"))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= greatest(lit(1L),
          expr(s"(__n * $keepPermill) div 1000")))
        .select(col(idCol), col("cell"), col("proto_cos"))
    }
  }

  /** Embedding-diversity sampling over LEARNED k-means cells: the
    * [[diversitySample]] upgrade that trains the cells
    * ([[kmeansCentroids]], deterministic) instead of md5-seeding them,
    * then keeps an md5-ordered quota per cell — the balanced
    * topic-mixture sampler (every region of embedding space keeps
    * representation regardless of its corpus share). One persisted
    * (id, vec) projection serves training + assignment; the per-cell
    * cut is a WindowGroupLimit, so map tasks keep only `perCell` rows
    * per cell. */
  def diversitySampleKMeans(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int, perCell: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(vecCol).cast(ArrayType(DoubleType))
    Dedup.viaPersisted(df.select(col(idCol), v.as("__v"))) { proj =>
      val centroids = kmeansCentroids(proj, idCol, "__v", nlist, iters)
      val assigned = proj.select(col(idCol),
        cellAssign(col("__v"), centroids).cast(LongType).as("cell"))
      val w = Window.partitionBy("cell").orderBy(
        md5(concat(col(idCol).cast(StringType), lit("div")).cast(BinaryType)),
        col(idCol))
      assigned.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= perCell)
        .select(col(idCol), col("cell"))
    }
  }

  /** Hard-negative mining for contrastive training: for each of
    * `nProbes` md5-sampled anchor vectors (same deterministic sample as
    * [[probeRows]]), the `k` most cosine-similar vectors with a
    * DIFFERENT label — the "hard" negatives an embedding-model trainer
    * pairs with each anchor. One corpus pass scores every anchor
    * (broadcast anchor set, compiled cosine); the per-anchor cut is the
    * group-limited window, so the shuffle carries O(probes x k x
    * partitions), not the scored candidates. At 100 TB, swap the exact
    * scoring pass for [[lshTopKBatch]]-style bucketed candidates — the
    * anchor/filter/cut shape is unchanged. */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, nProbes: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val anchors = df.select(col(idCol).cast(LongType).as("probe_id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("pv"),
        col(labelCol).as("probe_label"))
      .orderBy(md5(concat(col("probe_id").cast(StringType), lit("probe"))
          .cast(BinaryType)),
        col("probe_id"))
      .limit(nProbes)
    val scored = df.select(col(idCol),
        col(vecCol).cast(ArrayType(DoubleType)).as("__v"),
        col(labelCol).as("neg_label"))
      .crossJoin(broadcast(anchors))
      .filter(col("neg_label") =!= col("probe_label"))
      .select(col("probe_id"), col(idCol), col("neg_label"),
        round(cosine(col("__v"), col("pv")), 4).as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast(LongType).as("rank"),
        col(idCol), col("neg_label"), col("cos"))
  }

  /** Contrastive training triplets — the (anchor, positive, hard
    * negative) tuples an embedding-model trainer consumes, mined by
    * the engine: for each md5-sampled anchor (same deterministic draw
    * as [[hardNegatives]]), its most-cosine-similar SAME-label vector
    * (the positive; the anchor itself excluded) joined with its
    * `kNeg` most-similar DIFFERENT-label vectors (the hard negatives).
    * An anchor whose label has no other member yields no triplets.
    *
    * Scale: ONE corpus pass scores every candidate against the
    * broadcast anchor set (compiled cosine); the positive and negative
    * cuts are group-limited windows over the same scored frame, and
    * the final positive×negative join runs on nProbes-keyed rows. */
  def contrastiveTriplets(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, nProbes: Int, kNeg: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nProbes > 0 && kNeg > 0, "need nProbes>0, kNeg>0")
    val anchors = df.select(col(idCol).cast(LongType).as("probe_id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("pv"),
        col(labelCol).as("probe_label"))
      .orderBy(md5(concat(col("probe_id").cast(StringType), lit("probe"))
          .cast(BinaryType)),
        col("probe_id"))
      .limit(nProbes)
    val scored = df.select(col(idCol).cast(LongType).as("cand_id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("__v"),
        col(labelCol).as("cand_label"))
      .crossJoin(broadcast(anchors))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("probe_label"), col("cand_id"),
        col("cand_label"), round(cosine(col("__v"), col("pv")), 4).as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
    val pos = scored.filter(col("cand_label") === col("probe_label"))
      .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("probe_id"), col("cand_id").as("pos_id"), col("cos").as("pos_cos"))
    val neg = scored.filter(col("cand_label") =!= col("probe_label"))
      .withColumn("neg_rank", row_number().over(w)).filter(col("neg_rank") <= kNeg)
      .select(col("probe_id"), col("neg_rank").cast(LongType).as("neg_rank"),
        col("cand_id").as("neg_id"), col("cos").as("neg_cos"))
    pos.join(neg, Seq("probe_id"))
      .select(col("probe_id"), col("pos_id"), col("pos_cos"),
        col("neg_rank"), col("neg_id"), col("neg_cos"))
  }

  /** Precomputed md5-seeded coarse quantizer ([[seedCells]] made
    * caller-visible): pass one instance to several batch ANN calls so
    * the seed fetch runs once per index, not once per method. */
  final case class IvfSeedIndex(seeds: Seq[(Long, Seq[Double])], cell: Column)
  def ivfSeedIndex(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int): IvfSeedIndex = {
    val (seeds, cell) = seedCells(df, idCol, vecCol, nlist)
    IvfSeedIndex(seeds, cell)
  }

  /** Persistable IVF index artifact: `centroids` (cid, c) and the
    * PRE-ASSIGNED corpus `assignments` (id, cell, v) — both parquet
    * round-trip safe. The build-once/search-forever contract the other
    * shipped artifacts follow (MinHash, winnow, hamming, BPE,
    * classifier): a query never re-runs the quantizer over the corpus,
    * it reads the stored cell column and scans only the probed cells.
    * At 100 TB, write `assignments` partitioned (or bucketed) BY
    * `cell` and a search touches only nprobe/nlist of the files. */
  final case class IvfIndex(centroids: DataFrame, assignments: DataFrame)

  /** Build the [[IvfIndex]]: one corpus pass assigns every vector to
    * its nearest md5-seeded centroid (the [[ivfSeedIndex]] quantizer,
    * so seeded searches and shipped searches agree exactly). */
  def buildIvfIndex(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int): IvfIndex = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val (seeds, cell) = seedCells(df, idCol, vecCol, nlist)
    val spark = df.sparkSession
    import spark.implicits._
    IvfIndex(seeds.toDF("cid", "c"),
      df.select(col(idCol).as("id"), v.as("v"), cell.as("cell")))
  }

  /** IVF top-k from a stored [[IvfIndex]]: probe selection reads the
    * |nlist|-row centroid table (bounded collect), the corpus side
    * reads only the probed cells of the stored assignments — identical
    * output to [[ivfTopK]] on the same corpus (spec-gated). */
  def ivfTopKFromIndex(index: IvfIndex, query: Seq[Float], k: Int,
      nprobe: Int): DataFrame = {
    val seeds = index.centroids.select("cid", "c").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1).toSeq
    val probed = probeCellsD(seeds, query.map(_.toDouble), nprobe)
    index.assignments.filter(col("cell").isin(probed: _*))
      .select(col("id"), round(cosine(col("v"), litVec(query)), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Batch seeded-IVF ANN: one md5-seeded quantizer serves every probe;
    * per-probe cell selection happens on the driver (nlist × probes
    * cosines) and joins back as a broadcast (probe_id, cell, pv) frame,
    * so the corpus is scanned once and each row is scored only against
    * the probes that probed its cell. `seeded`/`trained` on the batch
    * variants accept a precomputed quantizer/codebook — training is
    * probe-independent AND method-independent, so a caller running
    * several methods over one corpus (the recall row) trains each
    * index once instead of once per method. */
  def ivfTopKBatch(df: DataFrame, idCol: String, vecCol: String,
      probes: Seq[(Long, Seq[Double])], k: Int, nlist: Int, nprobe: Int,
      seeded: Option[IvfSeedIndex] = None): DataFrame = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val IvfSeedIndex(seeds, cell) =
      seeded.getOrElse(ivfSeedIndex(df, idCol, vecCol, nlist))
    val pf = probeCellFrame(df, probes, seeds, nprobe)
    val scored = df.select(col(idCol), v.as("__v"), cell.as("__cell"))
      .join(broadcast(pf), col("__cell") === col("cid"))
      .select(col("probe_id"), col(idCol),
        round(cosine(col("__v"), col("pv")), 4).as("cos"))
    topPerProbe(scored, idCol, k)
  }

  /** Batch k-means-IVF ANN: the Lloyd-refined centroids of
    * [[ivfTopKKMeans]] (trained once — the trajectory is probe-
    * independent), then the same broadcast probe-cell join as
    * [[ivfTopKBatch]]. */
  def ivfTopKKMeansBatch(df: DataFrame, idCol: String, vecCol: String,
      probes: Seq[(Long, Seq[Double])], k: Int, nlist: Int, nprobe: Int,
      iters: Int = 3): DataFrame = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    Dedup.viaPersisted(df.select(col(idCol), v.as("__v"))) { proj =>
      val centroids = kmeansCentroids(proj, idCol, "__v", nlist, iters)
      val indexed = centroids.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      val pf = probeCellFrame(proj, probes, indexed, nprobe)
      val scored = proj.select(col(idCol), col("__v"),
          cellAssign(col("__v"), centroids).cast(LongType).as("__cell"))
        .join(broadcast(pf), col("__cell") === col("cid"))
        .select(col("probe_id"), col(idCol),
          round(cosine(col("__v"), col("pv")), 4).as("cos"))
      topPerProbe(scored, idCol, k)
    }
  }

  /** (probe_id, cid, pv) broadcast frame: each probe's `nprobe` nearest
    * cells, selected on the driver with the shared [[probeCellsD]]
    * ordering. */
  private def probeCellFrame(df: DataFrame, probes: Seq[(Long, Seq[Double])],
      seeds: Seq[(Long, Seq[Double])], nprobe: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    probes.flatMap { case (pid, pv) =>
      probeCellsD(seeds, pv, nprobe).map(cid => (pid, cid, pv))
    }.toDF("probe_id", "cid", "pv")
  }

  /** Batch PQ ANN: codebooks train ONCE ([[pqTrain]]), the corpus
    * encodes once in-scan, and each probe carries its driver-computed
    * ADC table as a broadcast array column — the per-(probe, row)
    * approximate score is an 8-element table lookup. The per-probe
    * refine·k shortlist is rescored with true cosines.
    *
    * The ADC rank key is rounded to 9 dp on BOTH engines (here and in
    * the DuckDB oracle): the scores are sums of driver doubles vs
    * oracle-replayed doubles, identical to well past 9 dp, and the
    * rounding pins the shortlist cut to the shared (value, id) order
    * instead of 1-ulp float noise. */
  def pqTopKBatch(df: DataFrame, idCol: String, vecCol: String,
      probes: Seq[(Long, Seq[Double])], k: Int, m: Int = 8, ncent: Int = 16,
      refine: Int = 8, trainIters: Int = 2,
      trained: Option[(IndexedSeq[Double], Int)] = None): DataFrame = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val (books, sub) =
      trained.getOrElse(pqTrain(df, idCol, vecCol, m, ncent, trainIters))
    val codes = graft.functions.VectorExpressions.pq_encode(v, books, ncent, sub)
    val coded = df.select(col(idCol), v.as("__v"), codes.as("__codes"))
    pqAdcRescore(coded, idCol, pqProbeFrame(df, probes, books, m, ncent, sub),
      k, m, ncent, refine)
  }

  /** Batch IVF-PQ ANN: the md5-seeded coarse quantizer prunes each
    * probe's candidates to its `nprobe` cells, PQ codes (trained once,
    * on the FULL corpus — the amortized batch shape, unlike the
    * per-query probed-slice training of the single-probe
    * [[ivfPqTopK]]) rank the candidates, true cosines rescore the
    * shortlist. One persisted (id, vec) projection serves seeds, PQ
    * training, and the scoring scan. */
  def ivfPqTopKBatch(df: DataFrame, idCol: String, vecCol: String,
      probes: Seq[(Long, Seq[Double])], k: Int, nlist: Int = 8, nprobe: Int = 2,
      m: Int = 8, ncent: Int = 16, refine: Int = 8, trainIters: Int = 2,
      seeded: Option[IvfSeedIndex] = None,
      trained: Option[(IndexedSeq[Double], Int)] = None): DataFrame =
    Dedup.viaPersisted(df.select(col(idCol), col(vecCol))) { proj =>
      val v = col(vecCol).cast(ArrayType(DoubleType))
      val IvfSeedIndex(seeds, cell) =
        seeded.getOrElse(ivfSeedIndex(proj, idCol, vecCol, nlist))
      val (books, sub) =
        trained.getOrElse(pqTrain(proj, idCol, vecCol, m, ncent, trainIters))
      val codes = graft.functions.VectorExpressions.pq_encode(v, books, ncent, sub)
      val pf = pqProbeFrame(proj, probes, books, m, ncent, sub)
        .join(probeCellFrame(proj, probes, seeds, nprobe).select("probe_id", "cid"),
          "probe_id")
      val coded = proj.select(col(idCol), v.as("__v"), codes.as("__codes"),
        cell.as("__cell"))
      pqAdcRescore(coded, idCol, broadcast(pf), k, m, ncent, refine,
        joinOn = Some(col("__cell") === col("cid")))
    }

  /** (probe_id, pv, dtable) frame: each probe's flat ADC table,
    * computed on the driver against the trained codebooks. */
  private def pqProbeFrame(df: DataFrame, probes: Seq[(Long, Seq[Double])],
      books: IndexedSeq[Double], m: Int, ncent: Int, sub: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    probes.map { case (pid, pv) =>
      (pid, pv, pqDistanceTableD(books, pv, m, ncent, sub))
    }.toDF("probe_id", "pv", "dtable")
  }

  /** Shared ADC-rank + rescore tail of the batch PQ variants:
    * broadcast-join the probe frame (cross for plain PQ, on the coarse
    * cell for IVF-PQ), rank candidates per probe by the rounded ADC
    * sum, rescore the refine·k shortlist with true cosines, cut to
    * top-k. */
  private def pqAdcRescore(coded: DataFrame, idCol: String, pf: DataFrame,
      k: Int, m: Int, ncent: Int, refine: Int,
      joinOn: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paired = joinOn match {
      case Some(cond) => coded.join(broadcast(pf), cond)
      case None => coded.crossJoin(broadcast(pf))
    }
    // Σ_s dtable[s·ncent + codes[s]] in subspace order — the same
    // summation order as the PqAdc kernel and the oracle's s-ordered
    // list sum; 9-dp rounding pins the cross-engine shortlist cut
    val approx = aggregate(
      zip_with(col("__codes"), sequence(lit(0), lit(m - 1)),
        (c, s) => element_at(col("dtable"), (s * lit(ncent) + c + lit(1)).cast(IntegerType))),
      lit(0.0), (acc, x) => acc + x)
    val wShort = Window.partitionBy("probe_id").orderBy(col("__approx"), col(idCol))
    paired
      .select(col("probe_id"), col(idCol), col("__v"), col("pv"),
        round(approx, 9).as("__approx"))
      .withColumn("__rs", row_number().over(wShort))
      .filter(col("__rs") <= refine * k)
      .select(col("probe_id"), col(idCol),
        round(cosine(col("__v"), col("pv")), 4).as("cos"))
      .transform(topPerProbe(_, idCol, k))
  }
}
