package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet/csv/json: ORC round-trip
  * with predicate pushdown, and the split-partitioned corpus write (the
  * layout a 100 TB pipeline hands to training — one directory per
  * split, readable with partition pruning).
  */
class FormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  test("orc round-trip preserves schema and pushes filters") {
    val out = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val docs = Tables(spark, dir, "documents")
    docs.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    val filtered = back.filter(col("doc_id") < 10)
    assert(filtered.count() == docs.filter(col("doc_id") < 10).count())
    // ORC scans support pushdown too: the filter must reach the scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]"), plan)
  }

  test("split-partitioned write prunes to one directory per split") {
    val out = java.nio.file.Files.createTempDirectory("graft_split").toString
    val docs = Tables(spark, dir, "documents")
      .withColumn("split", graft.operators.Curation.splitAssign(col("doc_id"),
        Seq("train" -> 800, "val" -> 100, "test" -> 100)))
    docs.write.mode("overwrite").partitionBy("split").parquet(out)
    // one directory per split label
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("split=test", "split=train", "split=val"), dirs.toSeq)
    // reading one split prunes the others at the source (partition
    // pruning, not a post-scan filter)
    val train = spark.read.parquet(out).filter(col("split") === "train")
    val expected = docs.filter(col("split") === "train").count()
    assert(train.count() == expected)
    val plan = train.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(split"), plan)
  }
}
