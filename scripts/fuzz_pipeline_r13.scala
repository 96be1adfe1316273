// Pipeline-operator property fuzz, Scala half (VERDICT r12 #5).
// Randomized (seeded, deterministic — md5-free RNG only for INPUT
// GENERATION; the operators themselves are RNG-free) differentials for
// the highest-blast-radius kernels:
//   1. MinHash+LSH pair mining vs an ALL-PAIRS exact-Jaccard sweep —
//      banding must lose nothing above threshold at rowsPerBand=1
//      (miss prob (1-J)^32 <= 1e-9 for J >= 0.5; the corpora are fixed
//      by seed, so pass/fail is deterministic) and must emit the SAME
//      verified jaccard values.
//   2. Connected-component clustering on random graphs (incl. long
//      chains that stress the iteration count) — labels written to
//      parquet; the python half replays DuckDB's WITH RECURSIVE
//      transitive closure and compares min-reachable-id per node.
//   3. sqrt-temperature sampling — kept-id sets written to parquet; the
//      python half replays the integer md5/permill formula in DuckDB.
// Usage:
//   /opt/spark/bin/spark-shell --master 'local[8]' --driver-memory 8g \
//     --conf spark.sql.shuffle.partitions=8 \
//     --driver-class-path target/scala-2.13/classes \
//     -I scripts/fuzz_pipeline_r13.scala
// then: python3 scripts/fuzz_pipeline_r13.py /tmp/fuzz_pipeline_r13 [report]
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.operators.{Curation, Dedup}
import graft.functions.VectorExpressions

val OUT = sys.env.getOrElse("FPL_OUT", "/tmp/fuzz_pipeline_r13")
val SEED = sys.env.getOrElse("FPL_SEED", "1313").toInt
val TRIALS = sys.env.getOrElse("FPL_TRIALS", "8").toInt
val rng = new scala.util.Random(SEED)
spark.sparkContext.setLogLevel("ERROR")

import scala.jdk.CollectionConverters._

def docsDf(rows: Seq[(Long, String)]): DataFrame =
  spark.createDataFrame(rows.map { case (i, t) => Row(i, t) }.asJava,
    StructType(Seq(StructField("id", LongType), StructField("text", StringType))))

// ---- 1. MinHash/LSH vs brute-force exact Jaccard --------------------
var lshTrials = 0; var lshPairsTotal = 0L; var lshFailures = 0
val vocab = (0 until 40).map(i => s"w$i")
for (t <- 0 until TRIALS) {
  // corpus: base docs + mutated near-dups (token swaps) + unrelated
  val base = (0 until 12).map { d =>
    (0 until (8 + rng.nextInt(12))).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
  }
  val docs = collection.mutable.ArrayBuffer[(Long, String)]()
  var id = 0L
  for (b <- base) {
    docs += ((id, b)); id += 1
    for (_ <- 0 until rng.nextInt(3)) { // 0-2 near-dup mutants per base
      val toks = b.split(" ").toBuffer
      for (_ <- 0 until (1 + rng.nextInt(2)))
        toks(rng.nextInt(toks.size)) = vocab(rng.nextInt(vocab.size))
      docs += ((id, toks.mkString(" "))); id += 1
    }
  }
  val df = docsDf(docs.toSeq)
  val engine = Dedup.minHashLshPairs(df, "id", "text",
      shingleN = 3, bands = 32, rowsPerBand = 1, threshold = 0.5)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  // brute force: ALL pairs, same shingle + jaccard definition, no LSH
  val sh = df.select(col("id"),
    VectorExpressions.word_shingle_hashes(col("text"), 3).as("sh"))
  val brute = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    .crossJoin(sh.select(col("id").as("id_b"), col("sh").as("sh_b")))
    .filter(col("id_a") < col("id_b"))
    .withColumn("shared", VectorExpressions.intersect_count(col("sh_a"), col("sh_b")))
    .withColumn("jaccard", col("shared").cast(DoubleType) /
      (size(col("sh_a")) + size(col("sh_b")) - col("shared")))
    .filter(col("jaccard") >= 0.5)
    .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("j"))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  lshTrials += 1; lshPairsTotal += brute.size
  if (engine != brute) {
    lshFailures += 1
    println(s"FPL_LSH_FAIL trial=$t engine-only=${(engine -- brute).take(5)} brute-only=${(brute -- engine).take(5)}")
  }
}
println(s"FPL_LSH trials=$lshTrials qualifying_pairs=$lshPairsTotal failures=$lshFailures")
Dedup.releaseAll()

// ---- 2. CC clustering on random graphs (written for DuckDB replay) --
val ccEdges = collection.mutable.ArrayBuffer[(Int, Long, Long)]()
val ccLabels = collection.mutable.ArrayBuffer[(Int, Long, Long)]()
for (t <- 0 until TRIALS) {
  val n = 60 + rng.nextInt(140)
  val edges = collection.mutable.Set[(Long, Long)]()
  // random edges
  for (_ <- 0 until (n / 2 + rng.nextInt(n)))
    { val a = rng.nextInt(n).toLong; val b = rng.nextInt(n).toLong
      if (a != b) edges += ((math.min(a, b), math.max(a, b))) }
  // plus one long CHAIN (stresses iteration count far past the
  // near-clique diameter the operator is tuned for)
  val chainLen = 20 + rng.nextInt(20)
  val chain = (0 until chainLen).map(_ => rng.nextInt(n).toLong).distinct
  chain.sliding(2).foreach { case Seq(a, b) =>
    edges += ((math.min(a, b), math.max(a, b))); case _ => }
  val pairsDf = spark.createDataFrame(
    edges.toSeq.map { case (a, b) => Row(a, b) }.asJava,
    StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
  val labels = Dedup.nearDupClusters(pairsDf, maxIter = 60)
    .collect().map(r => (r.getLong(0), r.getLong(1)))
  ccEdges ++= edges.toSeq.map { case (a, b) => (t, a, b) }
  ccLabels ++= labels.map { case (i, l) => (t, i, l) }
  Dedup.releaseAll()
}
spark.createDataFrame(ccEdges.toSeq.map { case (t, a, b) => Row(t, a, b) }.asJava,
  StructType(Seq(StructField("trial", IntegerType),
    StructField("src", LongType), StructField("dst", LongType))))
  .coalesce(1).write.mode("overwrite").parquet(s"$OUT/cc_edges.parquet")
spark.createDataFrame(ccLabels.toSeq.map { case (t, i, l) => Row(t, i, l) }.asJava,
  StructType(Seq(StructField("trial", IntegerType),
    StructField("id", LongType), StructField("cluster_id", LongType))))
  .coalesce(1).write.mode("overwrite").parquet(s"$OUT/cc_labels.parquet")
println(s"FPL_CC trials=$TRIALS edges=${ccEdges.size} labels=${ccLabels.size}")

// ---- 3. sqrt-temperature sampling (written for integer replay) ------
val tsDocs = collection.mutable.ArrayBuffer[(Int, Long, String, String)]()
val tsKept = collection.mutable.ArrayBuffer[(Int, Long)]()
val tsTarget = collection.mutable.ArrayBuffer[(Int, Long)]()
for (t <- 0 until TRIALS) {
  val nSrc = 2 + rng.nextInt(4)
  val rows = collection.mutable.ArrayBuffer[(Long, String, String)]()
  var id = 0L
  for (s <- 0 until nSrc) {
    val docsN = 20 * (s + 1) + rng.nextInt(40) // skewed source sizes
    for (_ <- 0 until docsN) {
      val words = (0 until (3 + rng.nextInt(15)))
        .map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
      rows += ((id, s"src$s", words)); id += 1
    }
  }
  val df = spark.createDataFrame(
    rows.toSeq.map { case (i, s, x) => Row(i, s, x) }.asJava,
    StructType(Seq(StructField("id", LongType),
      StructField("source", StringType), StructField("text", StringType))))
  val target = 100L + rng.nextInt(900)
  val kept = Curation.temperatureSample(df, "source", "id", "text", target)
    .select("id").collect().map(_.getLong(0))
  tsDocs ++= rows.map { case (i, s, x) => (t, i, s, x) }
  tsKept ++= kept.map(k => (t, k))
  tsTarget += ((t, target))
}
spark.createDataFrame(tsDocs.toSeq.map { case (t, i, s, x) => Row(t, i, s, x) }.asJava,
  StructType(Seq(StructField("trial", IntegerType), StructField("id", LongType),
    StructField("source", StringType), StructField("text", StringType))))
  .coalesce(1).write.mode("overwrite").parquet(s"$OUT/ts_docs.parquet")
spark.createDataFrame(tsKept.toSeq.map { case (t, k) => Row(t, k) }.asJava,
  StructType(Seq(StructField("trial", IntegerType), StructField("id", LongType))))
  .coalesce(1).write.mode("overwrite").parquet(s"$OUT/ts_kept.parquet")
spark.createDataFrame(tsTarget.toSeq.map { case (t, g) => Row(t, g) }.asJava,
  StructType(Seq(StructField("trial", IntegerType), StructField("target", LongType))))
  .coalesce(1).write.mode("overwrite").parquet(s"$OUT/ts_target.parquet")
println(s"FPL_TS trials=$TRIALS docs=${tsDocs.size} kept=${tsKept.size}")
println(s"FPL_SCALA_DONE seed=$SEED trials=$TRIALS lsh_failures=$lshFailures out=$OUT")
if (lshFailures > 0) sys.exit(1)
sys.exit(0)
