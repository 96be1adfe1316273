// sf1 / sf10 fixture generator (VERDICT r12 #1: full-board scale proof).
// Scales the driver's sf0.1 fixtures Nx into an sf1-shaped directory the
// Bench harness can point SPARK_GRAFT_SF_DIR at — keys offset per copy so
// every join/FK relationship holds at the larger scale:
//   customer/supplier/part/orders/lineitem/events/documents/embeddings
//   get N copies with disjoint key ranges (custkey +1e6/copy,
//   orderkey +1e7, partkey +1e6, suppkey +1e5, event_id +1e7,
//   user_id +1e6, doc_id +1e6, vec_id +1e6);
//   region/nation stay fixed (scale-invariant dimensions, as in TPC-H).
// Near-dup stress is deliberate (same design as scale_smoke_sf1.scala):
//   copy c>0 documents carry a " rev<c>" suffix (n_chars recomputed so
//   the fixture invariant n_chars = length(text) holds) and embeddings
//   get +/-0.2 md5-derived per-component noise — the dedup/ANN families
//   must face 10x the near-dup pair mass, not 10x free rows.
// Deterministic: md5-based noise, no RNG. Usage:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     -I scripts/gen_sf1.scala            # writes /tmp/graft_sf1 (10x)
//   env GEN_COPIES=100 GEN_OUT=/tmp/graft_sf10 ... for the 100x variant
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

val src = sys.env.getOrElse("GEN_SRC", "/root/testdata/sf0.1")
val out = sys.env.getOrElse("GEN_OUT", "/tmp/graft_sf1")
val copies = sys.env.getOrElse("GEN_COPIES", "10").toInt

def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
// Scaled tables are REPARTITIONED before write (r13): the broadcast
// crossJoin used for scaling otherwise lands every copy in the single
// input partition and the table ships as ONE parquet file — every
// downstream scan-stage kernel (shingling, minhash, embedding math)
// then runs at parallelism 1, which is neither how a 100 TB table is
// laid out nor a fair scan to benchmark. Dimensions stay single-file
// (they are single-file at sf0.1 too).
val parts = sys.env.getOrElse("GEN_PARTS", "32").toInt
def write(t: String, df: DataFrame, split: Boolean = true): Unit = {
  (if (split) df.repartition(parts) else df)
    .write.mode("overwrite").parquet(s"$out/$t.parquet")
  println(s"GEN $t -> ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
}

// a one-column frame of copy ids to cross with (broadcast: tiny)
val copyDf = broadcast(spark.range(copies).toDF("__c"))
def scaled(t: String)(f: (DataFrame, org.apache.spark.sql.Column) => DataFrame): DataFrame = {
  val base = read(t).crossJoin(copyDf)
  f(base, col("__c")).drop("__c")
}

// dimensions: fixed
write("region", read("region"), split = false)
write("nation", read("nation"), split = false)

write("customer", scaled("customer") { (d, c) =>
  d.withColumn("c_custkey", col("c_custkey") + c * 1000000L) })
write("supplier", scaled("supplier") { (d, c) =>
  d.withColumn("s_suppkey", col("s_suppkey") + c * 100000L) })
write("part", scaled("part") { (d, c) =>
  d.withColumn("p_partkey", col("p_partkey") + c * 1000000L) })
write("orders", scaled("orders") { (d, c) =>
  d.withColumn("o_orderkey", col("o_orderkey") + c * 10000000L)
   .withColumn("o_custkey", col("o_custkey") + c * 1000000L) })
write("lineitem", scaled("lineitem") { (d, c) =>
  d.withColumn("l_orderkey", col("l_orderkey") + c * 10000000L)
   .withColumn("l_partkey", col("l_partkey") + c * 1000000L)
   .withColumn("l_suppkey", col("l_suppkey") + c * 100000L) })
// events: distinct users per copy, timestamps unchanged (sessionization
// and as-of joins then replay the same per-user patterns at 10x users)
write("events", scaled("events") { (d, c) =>
  d.withColumn("event_id", col("event_id") + c * 10000000L)
   .withColumn("user_id", col("user_id") + c * 1000000L) })
// documents: near-dup copies (one-token suffix), invariant preserved
write("documents", scaled("documents") { (d, c) =>
  d.withColumn("doc_id", col("doc_id") + c * 1000000L)
   .withColumn("text", when(c === 0, col("text"))
     .otherwise(concat(col("text"), lit(" rev"), c.cast("string"))))
   .withColumn("n_chars", length(col("text")).cast("long")) })
// embeddings: +/-0.2 md5 noise per component for c>0 (near-neighbor
// stress without exact duplicates); float element type preserved
write("embeddings", scaled("embeddings") { (d, c) =>
  d.withColumn("vec_id", col("vec_id") + c * 1000000L)
   .withColumn("embedding", when(c === 0, col("embedding")).otherwise(
     // index via the (value, idx) zip: noise = f(vec_id, copy, idx)
     expr("""transform(embedding, (x, i) -> CAST(x +
       (CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), '_',
         CAST(__c AS STRING), '_', CAST(i AS STRING))), 1, 4), 16, 10) AS DOUBLE)
        / 65535.0 - 0.5) * 0.4 AS FLOAT))""")))
   .withColumn("label", col("label")) })

println(s"GEN_DONE $out copies=$copies")
sys.exit(0)
