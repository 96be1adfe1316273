// r12b scale smoke: the EXPRESSION-POSITION subquery lowerings
// (attachExprSubqueries) on the same 10x orders corpus as
// scale_smoke_r12.scala (1.5M rows, skewed custkeys). What scale
// failure would look like: the membership-marker join exploding on
// duplicate keys (it must join DISTINCT keys only), the NULL-count
// guard rescanning the inner per disjunct, or a cartesian under the
// OR. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 8g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes \
//     -I scripts/scale_smoke_r12b.scala
// Evidence committed to bench_out/scale_smoke_r12b.txt.
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
t("warmup_count", "SELECT o_orderkey FROM orders WHERE o_totalprice > 500000")

t("select_exists_10x",
  "SELECT o_orderkey, EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 5000) AS rich FROM orders")
t("select_in_notin_10x",
  "SELECT o_orderkey, o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) AS a, o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) AS b FROM orders")
t("or_in_exists_10x",
  "SELECT o_orderkey FROM orders o WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) OR EXISTS (SELECT 1 FROM customer WHERE c_custkey = o.o_custkey AND c_acctbal < -900)")
t("where_arith_corr_10x",
  "SELECT o_orderkey FROM orders o WHERE o_totalprice > 50 * (SELECT max(c_acctbal) FROM customer WHERE c_custkey = o.o_custkey)")
t("having_nested_corr_10x",
  "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey HAVING count(*) >= 9 + (SELECT count(*) FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 5000)")
println("R12B_SCALE_SMOKE_OK")
System.exit(0)
