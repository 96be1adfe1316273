// r12 scale smoke: the new correlated-subquery lowerings on a 10x
// orders corpus (1.5M rows, ~100k customers — derived from sf0.1, the
// same discipline as scale_smoke_sf1.scala). What scale failure would
// look like: the per-key aggregate shuffling the full corpus more than
// once, a cartesian sneaking in below AQE, or the <> ALL anti join
// exploding on duplicate keys. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 8g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes \
//     -I scripts/scale_smoke_r12.scala
// Evidence committed to bench_out/scale_smoke_r12.txt.
import org.apache.spark.sql.functions._

val sf = "/root/testdata/sf0.1"
val base = spark.read.parquet(s"$sf/orders.parquet")
val orders10 = (0 until 10).map { c =>
  base.withColumn("o_orderkey", col("o_orderkey") * 10 + lit(c))
    .withColumn("o_custkey", col("o_custkey") * 10 + lit(c % 3)) // skewier keys
    .withColumn("o_totalprice", col("o_totalprice") + lit(c) * 0.01)
}.reduce(_ union _)
val gs = new graft.engine.GraftSession(spark)
gs.registerTable("orders", orders10.cache())
gs.registerTable("customer", spark.read.parquet(s"$sf/customer.parquet"))
println(s"orders10 rows: ${orders10.count()}")

def t(name: String, sql: String): Unit = {
  val t0 = System.nanoTime()
  val n = gs.sql(sql).count()
  println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s   $n%9d rows")
}
// warm the cache/codegen once
t("warmup_count", "SELECT o_orderkey FROM orders WHERE o_totalprice > 500000")

t("quant_any_corr_10x",
  "SELECT o_orderkey FROM orders o WHERE o_totalprice > ANY (SELECT o_totalprice FROM orders WHERE o_custkey = o.o_custkey)")
t("quant_all_corr_10x",
  "SELECT o_orderkey FROM orders o WHERE o_totalprice >= ALL (SELECT o_totalprice FROM orders WHERE o_custkey = o.o_custkey)")
t("quant_ne_all_corr_10x",
  "SELECT o_orderkey FROM orders o WHERE o_totalprice <> ALL (SELECT o_totalprice FROM orders WHERE o_custkey = o.o_custkey AND o_orderstatus == \"F\")")
t("corr_in_having_10x",
  "SELECT o_orderkey FROM orders o WHERE o_totalprice IN (SELECT max(o_totalprice) FROM orders WHERE o_custkey = o.o_custkey GROUP BY o_orderstatus HAVING count(*) >= 2)")
t("exists_having_10x",
  "SELECT c_custkey FROM customer c WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey HAVING count(*) >= 12)")
t("placeholder_args_10x_parse", "SELECT count(*) AS n FROM orders WHERE o_totalprice > 100000")
println("R12_SCALE_SMOKE_OK")
System.exit(0)
