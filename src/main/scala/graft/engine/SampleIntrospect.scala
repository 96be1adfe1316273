package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Sample-based schema introspection + periodic refresh — the
  * reference's CSV/JSON typing model (datasource/introspect.go:14-78:
  * type each column from the first ~20 rows; value/coerce.go:53-67:
  * per-value guess order int → bool → float → date → json → string;
  * schema/schema.go:23: schemas refresh every 5 minutes).
  *
  * Spark's own `inferSchema` reads the ENTIRE file before typing — at
  * 100 TB that is a full extra pass per registration. Sampling the
  * first `IntrospectCount` rows bounds introspection cost to a driver
  * fetch regardless of file size, and the resulting explicit schema
  * makes the real read single-pass. The trade is the reference's own:
  * a type that drifts after the sample window reads as null rather
  * than widening the column.
  */
object SampleIntrospect {

  /** Rows examined per introspection (datasource/introspect.go:17). */
  val IntrospectCount = 20

  /** Cache lifetime of an introspected schema (schema/schema.go:23,
    * SchemaRefreshInterval = 5 min). */
  val RefreshIntervalMs: Long = 5L * 60 * 1000

  /** Per-value type guess, the reference's coerce.go:53-67 order. Int
    * subsumes bool's "1"/"0" (ParseInt wins first, same as the
    * reference); date accepts ISO date/timestamp shapes; JSON-looking
    * strings stay STRING (this engine traverses JSON with the map/
    * identity operators instead of a dedicated JsonType). */
  private[engine] def guessType(s: String): DataType = {
    val t = s.trim
    if (t.isEmpty) NullType
    else if (t.toLongOption.isDefined) LongType
    else if (t.equalsIgnoreCase("true") || t.equalsIgnoreCase("false")) BooleanType
    else if (t.toDoubleOption.isDefined) DoubleType
    else if (parsesAsTime(t)) TimestampType
    else StringType
  }

  private def parsesAsTime(s: String): Boolean = {
    import java.time.format.DateTimeFormatter._
    def ok(f: java.time.format.DateTimeFormatter, parse: String => Any): Boolean =
      try { parse(s); true } catch { case _: Exception => false }
    ok(ISO_LOCAL_DATE, java.time.LocalDate.parse(_, ISO_LOCAL_DATE)) ||
    ok(ISO_LOCAL_DATE_TIME, java.time.LocalDateTime.parse(_, ISO_LOCAL_DATE_TIME)) ||
    ok(ISO_OFFSET_DATE_TIME, java.time.OffsetDateTime.parse(_, ISO_OFFSET_DATE_TIME))
  }

  /** Widening merge across the sample: nulls defer, equal types keep,
    * long+double widen to double, anything else conflicts to string. */
  private[engine] def merge(a: DataType, b: DataType): DataType = (a, b) match {
    case (NullType, t) => t
    case (t, NullType) => t
    case (x, y) if x == y => x
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case _ => StringType
  }

  /** Introspect a headered CSV: column names from the header, types
    * from the first `sampleRows` data rows (bounded driver fetch — the
    * LocalLimit stops the scan; no full-file inference pass). */
  def introspectCsv(spark: SparkSession, path: String,
      sampleRows: Int = IntrospectCount): StructType = {
    val raw = spark.read.option("header", "true").csv(path) // all-string schema
    val names = raw.schema.fieldNames
    val sample = raw.limit(sampleRows).collect()
    val types = names.indices.map { i =>
      sample.foldLeft(NullType: DataType) { (acc, row) =>
        if (row.isNullAt(i)) acc else merge(acc, guessType(row.getString(i)))
      }
    }
    StructType(names.zip(types).map { case (n, t) =>
      StructField(n, if (t == NullType) StringType else t)
    })
  }

  /** Lazy CSV loader with introspection caching + TTL refresh: the
    * schema re-samples after `refreshMs` (the reference's 5-minute
    * daemon, expressed as refresh-on-access — idiomatic for a lazy
    * library instead of a background thread). `clock` is injectable
    * for tests. */
  def csvLoader(spark: SparkSession, path: String,
      sampleRows: Int = IntrospectCount,
      refreshMs: Long = RefreshIntervalMs,
      clock: () => Long = () => System.currentTimeMillis()): () => DataFrame = {
    val cached = new java.util.concurrent.atomic.AtomicReference[(StructType, Long)]()
    () => {
      val now = clock()
      val c = cached.get()
      val schema =
        if (c != null && now - c._2 < refreshMs) c._1
        else {
          val st = introspectCsv(spark, path, sampleRows)
          cached.set((st, now))
          st
        }
      spark.read.option("header", "true").schema(schema).csv(path)
    }
  }
}
