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
    * identity operators instead of a dedicated JsonType).
    *
    * Guesses run on the RAW datum, not a trimmed copy: the CSV reader
    * does not trim either, so a guessed type must be one the reader's
    * converter accepts for the same bytes (a whitespace-padded " 123"
    * guesses DOUBLE — parseDouble trims, parseLong does not — and a
    * padded bool/date stays STRING rather than typing as something the
    * read path would null out). */
  private[engine] def guessType(s: String): DataType = {
    if (s.trim.isEmpty) NullType
    else if (s.toLongOption.isDefined) LongType
    else if (s.equalsIgnoreCase("true") || s.equalsIgnoreCase("false")) BooleanType
    else if (s.toDoubleOption.isDefined) DoubleType
    else if (parsesAsTime(s)) TimestampType
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
    * long+double widen to double, structs union field-wise, arrays
    * merge element types, anything else conflicts to string. */
  private[engine] def merge(a: DataType, b: DataType): DataType = (a, b) match {
    case (NullType, t) => t
    case (t, NullType) => t
    case (x, y) if x == y => x
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case (StructType(fa), StructType(fb)) =>
      val bByName = fb.map(f => f.name -> f.dataType).toMap
      val merged = fa.map(f =>
        StructField(f.name, merge(f.dataType, bByName.getOrElse(f.name, NullType))))
      val extra = fb.filterNot(f => fa.exists(_.name == f.name))
      StructType(merged ++ extra)
    case (ArrayType(ea, _), ArrayType(eb, _)) => ArrayType(merge(ea, eb))
    case _ => StringType
  }

  /** Introspect a headered CSV: column names from the header, types
    * from the first `sampleRows` data rows (bounded driver fetch — the
    * LocalLimit stops the scan; no full-file inference pass).
    *
    * Multi-file paths: the sample comes from whichever file Spark's
    * listing order yields first (matching the reference, which reads
    * one stream's head — datasource/introspect.go:14), NOT a stable
    * "first N rows" across the directory; a directory whose files
    * disagree in their head rows can introspect differently as the
    * layout changes. Deterministic per-file sampling would force a
    * full listing + sort on every introspection — if layout-stable
    * typing matters, declare the schema explicitly instead (ADVICE
    * r8, documented choice). */
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

  /** Introspect a JSON-lines file from its first `sampleRows` lines
    * (bounded driver fetch): nested objects become StructTypes and
    * arrays merge their element guesses (the reference's
    * datasource/introspect.go:57-78 rules over decoded JSON bodies).
    * String VALUES guess only timestamp-or-string: JSON already types
    * numbers/bools natively, and Spark's JSON reader has no
    * string→long/bool conversion — guessing LongType for a quoted
    * "42" would make the reader null out every such record. */
  def introspectJsonLines(spark: SparkSession, path: String,
      sampleRows: Int = IntrospectCount): StructType = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def guessNode(n: com.fasterxml.jackson.databind.JsonNode): DataType =
      if (n == null || n.isNull) NullType
      else if (n.isIntegralNumber) LongType
      else if (n.isNumber) DoubleType
      else if (n.isBoolean) BooleanType
      else if (n.isTextual) {
        if (parsesAsTime(n.asText())) TimestampType else StringType
      }
      else if (n.isArray) {
        var et: DataType = NullType
        n.elements().forEachRemaining(e => et = merge(et, guessNode(e)))
        ArrayType(if (et == NullType) StringType else et)
      } else if (n.isObject) {
        val fields = scala.collection.mutable.ArrayBuffer.empty[StructField]
        n.fields().forEachRemaining(e =>
          fields += StructField(e.getKey, guessNode(e.getValue)))
        StructType(fields.toSeq)
      } else StringType
    val lines = spark.read.text(path).limit(sampleRows).collect()
      .map(_.getString(0)).filter(_.trim.nonEmpty)
    val mergedAcc = lines.foldLeft(NullType: DataType) { (acc, l) =>
      merge(acc, guessNode(mapper.readTree(l)))
    }
    def solidify(t: DataType): DataType = t match {
      case NullType => StringType
      case StructType(fs) => StructType(fs.map(f =>
        StructField(f.name, solidify(f.dataType))))
      case ArrayType(e, _) => ArrayType(solidify(e))
      case other => other
    }
    mergedAcc match {
      case st: StructType => solidify(st).asInstanceOf[StructType]
      case _ => throw new IllegalArgumentException(
        s"$path: top-level JSON lines must be objects")
    }
  }

  /** Optional background schema refresher with the reference daemon's
    * semantics (schema/schema.go:23: refresh every 5 minutes
    * UNPROMPTED): a single shared daemon thread re-runs every
    * registered source's introspection each interval, so a long-IDLE
    * session serves a schema at most one interval stale — the one
    * observable gap of the default TTL-on-access mode, which refreshes
    * only on the first access after expiry.
    *
    * Opt-in by passing an instance to [[csvLoader]]/[[jsonLoader]] (or
    * `GraftSession.registerCsvSampled`/`registerJsonSampled`): the
    * lazy-library default stays thread-free. A refresh failure (file
    * temporarily missing mid-rewrite) keeps the previous schema and
    * retries next interval. `close()` stops the thread; registered
    * loaders then fall back to their own TTL-on-access refresh. */
  final class BackgroundRefresher(refreshMs: Long = RefreshIntervalMs)
      extends AutoCloseable {
    // keyed by a caller-supplied token: GraftSession keys by TABLE name
    // (re-registering a table REPLACES its task; dropTable deregisters),
    // while direct loader users without a key get a fresh token per
    // registration — two sampled sources over the same path never
    // collide, and nothing is keyed by path
    private val tasks =
      new java.util.concurrent.ConcurrentHashMap[AnyRef, () => Unit]()
    private val exec =
      java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "graft-schema-refresh")
        t.setDaemon(true)
        t
      })
    // failure counters MUST initialize before the schedule below: the
    // first tick can fire while the constructor is still running, and a
    // noteFailure() on a null field would NPE inside the catch handler —
    // escaping run() and cancelling the schedule for good
    private val failures = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile private var lastFailureAtMs = 0L
    private def noteFailure(): Unit = {
      failures.incrementAndGet()
      lastFailureAtMs = System.currentTimeMillis()
    }
    // outer catch-all: scheduleAtFixedRate cancels ALL future runs if a
    // task throws, and refreshAll's per-task net is NonFatal-only — an
    // InterruptedException from a cancelled Spark action must not
    // silently kill the daemon for the session's lifetime (but IS
    // counted: a swallowed-and-invisible failure is an ops blind spot)
    exec.scheduleAtFixedRate(
      () => try refreshAll() catch { case _: Throwable => noteFailure() },
      refreshMs, refreshMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    private[engine] def register(key: AnyRef, refresh: () => Unit): Unit =
      tasks.put(key, refresh)
    /** Stop refreshing the source registered under `key` (no-op if
      * absent) — without this an abandoned source's closure would
      * re-introspect every interval until close(). */
    def deregister(key: AnyRef): Unit = tasks.remove(key)
    /** Number of live refresh tasks (ops/spec visibility: a count that
      * grows without bound means leaked registrations). */
    def taskCount: Int = tasks.size
    /** Cumulative refresh failures since construction (ops visibility:
      * the daemon survives failures by design, so a permanently failing
      * source is otherwise invisible — a counter that keeps climbing
      * interval after interval is the signal). */
    def failureCount: Long = failures.get()
    /** Epoch millis of the most recent refresh failure (0 = never). */
    def lastFailureMs: Long = lastFailureAtMs
    /** Run every registered refresh now (also the spec's deterministic
      * hook — the timer calls exactly this). A failing task keeps its
      * previous schema, bumps [[failureCount]], and retries next
      * interval; other tasks still run. */
    def refreshAll(): Unit = tasks.forEach((_, f) =>
      try f() catch { case scala.util.control.NonFatal(_) => noteFailure() })
    override def close(): Unit = exec.shutdownNow()
  }

  /** Introspection caching + TTL refresh shared by the sampled
    * loaders: the schema re-samples after `refreshMs` (the reference's
    * 5-minute daemon, expressed as refresh-on-access — idiomatic for a
    * lazy library instead of a background thread; pass a
    * [[BackgroundRefresher]] for the unprompted-daemon variant).
    * `clock` is injectable for tests. */
  private def cachedLoader(introspect: () => StructType,
      refreshMs: Long, clock: () => Long,
      refresher: Option[BackgroundRefresher], refreshKey: AnyRef)(
      read: StructType => DataFrame): () => DataFrame = {
    val cached = new java.util.concurrent.atomic.AtomicReference[(StructType, Long)]()
    val key = if (refreshKey == null) new Object else refreshKey
    refresher.foreach(_.register(key, () => cached.set((introspect(), clock()))))
    () => {
      val now = clock()
      val c = cached.get()
      val schema =
        if (c != null && now - c._2 < refreshMs) c._1
        else {
          val st = introspect()
          cached.set((st, now))
          st
        }
      read(schema)
    }
  }

  /** Lazy CSV loader with sample introspection + TTL refresh.
    * `refreshKey` identifies this source in the refresher for
    * replace-on-reregister and [[BackgroundRefresher.deregister]];
    * null means a fresh token (task lives until the refresher closes). */
  def csvLoader(spark: SparkSession, path: String,
      sampleRows: Int = IntrospectCount,
      refreshMs: Long = RefreshIntervalMs,
      clock: () => Long = () => System.currentTimeMillis(),
      refresher: Option[BackgroundRefresher] = None,
      refreshKey: AnyRef = null): () => DataFrame =
    cachedLoader(() => introspectCsv(spark, path, sampleRows),
      refreshMs, clock, refresher, refreshKey)(
      st => spark.read.option("header", "true").schema(st).csv(path))

  /** Lazy JSON-lines loader with sample introspection + TTL refresh.
    * `refreshKey`: see [[csvLoader]]. */
  def jsonLoader(spark: SparkSession, path: String,
      sampleRows: Int = IntrospectCount,
      refreshMs: Long = RefreshIntervalMs,
      clock: () => Long = () => System.currentTimeMillis(),
      refresher: Option[BackgroundRefresher] = None,
      refreshKey: AnyRef = null): () => DataFrame =
    cachedLoader(() => introspectJsonLines(spark, path, sampleRows),
      refreshMs, clock, refresher, refreshKey)(
      st => spark.read.schema(st).json(path))
}
