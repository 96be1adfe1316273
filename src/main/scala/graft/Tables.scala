package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Parquet table loader for the driver-provided TPC-H-ish fixtures
  * (TESTDATA.md). Reads are lazy DataFrames so Catalyst pushes filters
  * and prunes columns down to the parquet scan — at 100 TB the scan is
  * the dominant cost, so every query must keep its filters/projections
  * attached to these scans (verify via .explain: PushedFilters/ReadSchema).
  */
object Tables {
  import org.apache.spark.sql.types._

  /** events as stored: ts is TIMESTAMP(NANOS), which Spark's schema
    * inference rejects outright. Supplying this schema (ts: LongType)
    * skips inference and the vectorized reader delivers the raw nanos
    * longs — no session conf involved, so concurrent queries over other
    * nanos parquet are unaffected (the old spark.conf.set here leaked). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // nanos → micros precision (matches what the DuckDB oracle
      // computes after date_trunc/year/…)
      spark.read.schema(eventsRawSchema).parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          timestamp_micros((col("ts") / 1000L).cast(LongType)))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** round(col, 4) — canonical double normalization shared with the
    * DuckDB oracle so float summation order differences can't flip a
    * hash compare. */
  def r4(c: Column): Column = round(c, 4)
}
