package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-shuffling fact tables on their join key so repeated
  * joins are exchange-free — the 100 TB answer to "this join shuffles
  * every night". Verifies that a join of two tables bucketed on the
  * same key produces a plan with NO shuffle exchange.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  test("join of co-bucketed tables has no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    // warehouse dir is a static conf — the shared test session's default
    // (spark-warehouse under cwd) is fine for managed bucketed tables
    for (t <- Seq("li_bkt", "o_bkt")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    // AQE coalescing notes aside, bucketed join elision needs the
    // bucket count to match on both sides
    Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bkt")
    Tables(spark, dir, "orders").select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bkt")
    // force a sort-merge join so the test exercises the bucketed
    // exchange-elision path (tiny tables would broadcast otherwise)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // bucketed scans feed the join directly — no hash repartition
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join still shuffles:\n" + plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE li_bkt"); spark.sql("DROP TABLE o_bkt")
    }
  }
}
