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
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) which Spark's vectorized parquet
      // reader rejects; read nanos as long, convert to micros precision
      // (matches what the DuckDB oracle computes after date_trunc/year/…).
      // NOTE: this mutates SESSION conf — harmless for the other fixture
      // tables (none carry nanos timestamps, so the flag never changes
      // their schemas), but a caller mixing in external nanos parquet
      // would see those columns arrive as raw longs too.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          (org.apache.spark.sql.functions.col("ts") / 1000L)
            .cast(org.apache.spark.sql.types.LongType)))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** round(col, 4) — canonical double normalization shared with the
    * DuckDB oracle so float summation order differences can't flip a
    * hash compare. */
  def r4(c: Column): Column = round(c, 4)
}
