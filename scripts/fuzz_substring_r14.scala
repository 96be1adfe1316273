// Substring/winnow-family property fuzz, Scala half (VERDICT r13 #6).
// The family that showed the BENCH_r13 execution-mode anomaly is also
// the one whose kernels had only fixed-shape oracles (k=10, minOcc=2,
// the sf fixtures) — this randomizes corpus shape AND parameters:
//   1. repeatedSpans / dropRepeatedSpans / dropRepeatedSpansKeepFirst
//      on corpora with PLANTED repeated spans (cross-doc splices,
//      within-doc repeats, sub-k decoys, shorter-than-k docs), k in
//      {3,4,5,8}, minOcc in {2,3} per trial.
//   2. winnowFingerprints (MOSS winnowing) on the same corpora, w in
//      {2,3,4} — the python half replays the packed-key rightmost-min
//      window rule in DuckDB SQL and compares exact (id, pos, hash)
//      sets.
// Inputs + engine outputs land in parquet; scripts/fuzz_substring_r14.py
// replays DuckDB references per trial and diffs exactly.
// Usage:
//   /opt/spark/bin/spark-shell --master 'local[8]' --driver-memory 8g \
//     --conf spark.sql.shuffle.partitions=8 \
//     --driver-class-path target/scala-2.13/classes \
//     -I scripts/fuzz_substring_r14.scala
// then: python3 scripts/fuzz_substring_r14.py /tmp/fuzz_substring_r14 [report]
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.operators.{Dedup, TextAnalysis}

val OUT = sys.env.getOrElse("FSS_OUT", "/tmp/fuzz_substring_r14")
val SEED = sys.env.getOrElse("FSS_SEED", "1414").toInt
val TRIALS = sys.env.getOrElse("FSS_TRIALS", "10").toInt
val rng = new scala.util.Random(SEED)
spark.sparkContext.setLogLevel("ERROR")

import scala.jdk.CollectionConverters._

val docsBuf = collection.mutable.ArrayBuffer[(Int, Long, String)]()
val paramsBuf = collection.mutable.ArrayBuffer[(Int, Int, Int, Int)]() // trial, k, minOcc, w
val spansBuf = collection.mutable.ArrayBuffer[(Int, Long, Long, Long, String)]()
val dropBuf = collection.mutable.ArrayBuffer[(Int, Long, String)]()
val keepBuf = collection.mutable.ArrayBuffer[(Int, Long, String)]()
val winnowBuf = collection.mutable.ArrayBuffer[(Int, Long, Long, Long)]()

val vocab = (0 until 30).map(i => s"w$i")

for (t <- 0 until TRIALS) {
  val k = Seq(3, 4, 5, 8)(rng.nextInt(4))
  val minOcc = 2 + rng.nextInt(2)
  val w = 2 + rng.nextInt(3)
  paramsBuf += ((t, k, minOcc, w))
  // corpus: random docs, then plant repeated spans — a template run of
  // k..3k tokens spliced into other docs (cross-doc duplication) and
  // sometimes twice into ONE doc (within-doc repetition, which the
  // total-occurrence count must see); sub-k decoys (k-1 tokens) must
  // NEVER produce a span; a few shorter-than-k docs exercise the
  // no-gram edge
  val nDocs = 12 + rng.nextInt(8)
  val docs = (0 until nDocs).map { d =>
    val len = if (rng.nextInt(6) == 0) 1 + rng.nextInt(k - 1) // short doc
      else 15 + rng.nextInt(40)
    (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).toBuffer
  }
  def splice(target: scala.collection.mutable.Buffer[String], run: Seq[String]): Unit = {
    val at = rng.nextInt(target.size + 1)
    target.insertAll(at, run)
  }
  for (_ <- 0 until (2 + rng.nextInt(3))) {
    val src = docs(rng.nextInt(nDocs))
    if (src.size >= k) {
      val runLen = k + rng.nextInt(2 * k + 1)
      val from = rng.nextInt(math.max(1, src.size - runLen + 1))
      val run = src.slice(from, math.min(src.size, from + runLen)).toSeq
      val copies = 1 + rng.nextInt(minOcc) // enough to cross minOcc with the source
      for (_ <- 0 until copies) splice(docs(rng.nextInt(nDocs)), run)
      if (rng.nextBoolean()) { // within-doc repeat
        val d = docs(rng.nextInt(nDocs)); splice(d, run); splice(d, run)
      }
    }
    val decoySrc = docs(rng.nextInt(nDocs))
    if (k > 1 && decoySrc.size >= k - 1) { // sub-k decoy: duplicated but too short
      val from = rng.nextInt(decoySrc.size - (k - 2))
      splice(docs(rng.nextInt(nDocs)), decoySrc.slice(from, from + (k - 1)).toSeq)
    }
  }
  val rows = docs.zipWithIndex.map { case (toks, d) => (d.toLong, toks.mkString(" ")) }
  rows.foreach { case (id, text) => docsBuf += ((t, id, text)) }
  val df = spark.createDataFrame(
    rows.map { case (i, s) => Row(i, s) }.asJava,
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  Dedup.repeatedSpans(df, "doc_id", "text", k, minOcc).collect().foreach(r =>
    spansBuf += ((t, r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))))
  Dedup.dropRepeatedSpans(df, "doc_id", "text", k, minOcc).collect().foreach(r =>
    dropBuf += ((t, r.getLong(0), r.getString(1))))
  Dedup.dropRepeatedSpansKeepFirst(df, "doc_id", "text", k, minOcc).collect().foreach(r =>
    keepBuf += ((t, r.getLong(0), r.getString(1))))
  TextAnalysis.winnowFingerprints(df, "doc_id", "text", k, w).collect().foreach(r =>
    winnowBuf += ((t, r.getLong(0), r.getLong(1), r.getLong(2))))
  println(s"FSS_TRIAL t=$t k=$k minOcc=$minOcc w=$w docs=$nDocs " +
    s"spans=${spansBuf.count(_._1 == t)} winnow_fps=${winnowBuf.count(_._1 == t)}")
}

def write(name: String, df: DataFrame): Unit =
  df.coalesce(1).write.mode("overwrite").parquet(s"$OUT/$name.parquet")

write("ss_docs", spark.createDataFrame(
  docsBuf.map { case (t, i, s) => Row(t, i, s) }.asJava,
  StructType(Seq(StructField("trial", IntegerType), StructField("doc_id", LongType),
    StructField("text", StringType)))))
write("ss_params", spark.createDataFrame(
  paramsBuf.map { case (t, k, m, w) => Row(t, k, m, w) }.asJava,
  StructType(Seq(StructField("trial", IntegerType), StructField("k", IntegerType),
    StructField("min_occ", IntegerType), StructField("w", IntegerType)))))
write("ss_spans", spark.createDataFrame(
  spansBuf.map { case (t, i, a, b, s) => Row(t, i, a, b, s) }.asJava,
  StructType(Seq(StructField("trial", IntegerType), StructField("doc_id", LongType),
    StructField("span_start", LongType), StructField("span_end", LongType),
    StructField("span_text", StringType)))))
write("ss_drop", spark.createDataFrame(
  dropBuf.map { case (t, i, s) => Row(t, i, s) }.asJava,
  StructType(Seq(StructField("trial", IntegerType), StructField("doc_id", LongType),
    StructField("clean_text", StringType)))))
write("ss_keepfirst", spark.createDataFrame(
  keepBuf.map { case (t, i, s) => Row(t, i, s) }.asJava,
  StructType(Seq(StructField("trial", IntegerType), StructField("doc_id", LongType),
    StructField("clean_text", StringType)))))
write("ss_winnow", spark.createDataFrame(
  winnowBuf.map { case (t, i, p, h) => Row(t, i, p, h) }.asJava,
  StructType(Seq(StructField("trial", IntegerType), StructField("doc_id", LongType),
    StructField("fp_pos", LongType), StructField("fp_hash", LongType)))))

println(s"FSS_DONE trials=$TRIALS docs=${docsBuf.size} spans=${spansBuf.size} " +
  s"drop_rows=${dropBuf.size} keepfirst_rows=${keepBuf.size} winnow_fps=${winnowBuf.size}")
sys.exit(0)
