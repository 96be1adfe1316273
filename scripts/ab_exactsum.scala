// Same-JVM A/B: DECIMAL(30,8) exact sum (Tables.exactSum, adopted for
// order-stable float oracles in r7) vs the plain double sum it replaced
// on the headline q1 aggregate. Protocol: scripts/ab_round5.scala —
// warm reps in one JVM, rep1 discarded.
//
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/qlbridgespark_2.13-0.1.0.jar \
//     -I scripts/ab_exactsum.scala
//
// RESULTS (this host, sf0.1, 2026-08-13, warm reps after rep1):
//   q1_double_sum   0.29-0.35 s
//   q1_decimal_sum  0.23-0.28 s
//   → exactSum is free at this scale (within host noise, decimal even
//     measured slightly faster) — bit-stable money sums cost nothing.
import org.apache.spark.sql.functions._
import graft.Tables.{exactSum, r4}

val d = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", 32)
def time(name: String, reps: Int = 4)(f: => Long): Unit =
  for (i <- 1 to reps) {
    val t0 = System.nanoTime(); val n = f
    println(f"[AB] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
  }

val li = graft.Tables(spark, d, "lineitem")
li.count() // warm the scan

time("q1_double_sum") {
  li.filter(col("l_shipdate") <= "1998-09-02")
    .groupBy("l_returnflag", "l_linestatus")
    .agg(r4(sum("l_quantity")).as("sum_qty"),
      r4(sum(col("l_extendedprice"))).as("sum_base_price"),
      r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
      r4(avg("l_quantity")).as("avg_qty"),
      r4(avg("l_extendedprice")).as("avg_price"),
      count(lit(1)).as("count_order"))
    .count()
}
time("q1_decimal_sum") {
  li.filter(col("l_shipdate") <= "1998-09-02")
    .groupBy("l_returnflag", "l_linestatus")
    .agg(r4(sum("l_quantity")).as("sum_qty"),
      r4(exactSum(col("l_extendedprice"))).as("sum_base_price"),
      r4(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
      r4(avg("l_quantity")).as("avg_qty"),
      r4(avg("l_extendedprice")).as("avg_price"),
      count(lit(1)).as("count_order"))
    .count()
}
sys.exit(0)
