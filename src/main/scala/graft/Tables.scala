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

  /** events with ts as raw longs — the read path for fixture
    * generations that store ts as TIMESTAMP(NANOS), which Spark's
    * schema inference rejects outright. Supplying this schema
    * (ts: LongType) skips inference and the vectorized reader delivers
    * the raw nanos longs — no session conf involved, so concurrent
    * queries over other nanos parquet are unaffected (the old
    * spark.conf.set here leaked). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** The driver's fixtures have shipped events.ts at BOTH precisions
    * across generations (nanos pre-r10, micros since) — sniff instead
    * of assuming: inference succeeds for micros/millis, while the
    * TIMESTAMP(NANOS) annotation is exactly what inference rejects.
    * Returns the inferred schema when native reading works. One
    * driver-side footer read; never row data. */
  private[graft] def inferableSchema(spark: SparkSession, path: String): Option[StructType] =
    try Some(spark.read.parquet(path).schema)
    catch { case scala.util.control.NonFatal(_) => None }

  /** events.ts normalized to session-TZ TimestampType at micros
    * precision regardless of stored annotation (micros reads natively,
    * possibly as NTZ — cast unifies; nanos falls back to raw longs).
    * Absolute-time parity with the DuckDB oracle is spec-gated
    * (TablesSpec read-back year assert), so a future fixture
    * regeneration at yet another precision fails loudly. */
  private def readEvents(spark: SparkSession, path: String): DataFrame =
    inferableSchema(spark, path) match {
      case Some(_) =>
        spark.read.parquet(path).withColumn("ts", col("ts").cast(TimestampType))
      case None =>
        spark.read.schema(eventsRawSchema).parquet(path)
          .withColumn("ts",
            // integer `div`, NOT `/`: Column./ is double division, and
            // 2024-era nanosecond longs (~1.7e18) exceed a double's
            // 2^53 integer range — the rounded quotient lands ±1 µs
            // off (caught by the funnel oracle's exact ts compare)
            timestamp_micros(expr("ts div 1000")))
    }

  // memoized per (session, dir, table): `spark.read.parquet` runs a
  // schema-inference job on EVERY call (one footer-read job each, r13
  // probe), and a statement references its sources several times during
  // planning (correlation probes, outer-scope probes) — so an
  // unmemoized catalog pays O(references) driver jobs per statement
  // BUILD. The fixtures are static files; the cached value is a lazy
  // logical plan (no data pinned). Keyed by session identity so a
  // DataFrame never crosses sessions.
  private val memo = collection.concurrent.TrieMap.empty[(Int, String, String), DataFrame]

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.getOrElseUpdate((System.identityHashCode(spark), dir, name),
      if (name == "events") readEvents(spark, s"$dir/$name.parquet")
      else spark.read.parquet(s"$dir/$name.parquet"))

  /** round(col, 4) — canonical double normalization shared with the
    * DuckDB oracle so float summation order differences can't flip a
    * hash compare. */
  def r4(c: Column): Column = round(c, 4)

  /** Order-independent float sum: cast each term to DECIMAL(38,8) and
    * sum exactly, back to double at the end. A plain double sum of
    * money-scale products carries ~N×ulp noise that differs between
    * engines (different summation order) — at sf0.1 it landed exactly
    * on a round(…,4) boundary and flipped a hash compare. Both engines
    * cast the same IEEE double to the same 8dp decimal, and decimal
    * addition is exact in both, so the result is bit-identical in any
    * order at any SF. Oracle twin:
    * `CAST(sum(CAST(x AS DECIMAL(38,8))) AS DOUBLE)`.
    *
    * Magnitude bound: |term| < 1e30 (DECIMAL(38,8)'s integral range).
    * A larger term would cast to NULL under non-ANSI mode and silently
    * vanish from the sum (ADVICE r7) — instead it raises. A SUM that
    * overflows 1e30 in aggregate still returns NULL (visible, not a
    * dropped term); DuckDB errors on both, so an overflowing query can
    * never hash-agree by accident. */
  def exactSum(c: Column): Column = {
    val d = c.cast(org.apache.spark.sql.types.DecimalType(38, 8))
    // NaN/Infinity also null out under the decimal cast — name them in
    // the diagnostic instead of claiming a magnitude overflow (ADVICE r8)
    sum(when(c.isNotNull && d.isNull,
        raise_error(concat(
          lit("exactSum term not representable as DECIMAL(38,8) " +
            "(exceeds 1e30, NaN, or Infinity): "),
          c.cast(org.apache.spark.sql.types.StringType))))
      .otherwise(d))
      .cast(org.apache.spark.sql.types.DoubleType)
  }
}
