package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the events table — the unbounded-source
  * capability the reference only gestures at (pull-based Iterator
  * sources, per-message Ts(); no watermarks/windows/state —
  * /root/reference/schema/message.go:31-33, SURVEY §2.10). Here the
  * same event schema flows through real watermarked windowed
  * aggregation and custom sessionization state.
  *
  * Scale notes: windowed counts shuffle on (window, event_type) with
  * partial aggregation and watermark-driven state eviction — state size
  * is bounded by (#windows in watermark horizon × #types), not stream
  * length; sessionization state is per-user and evicted on timeout.
  */
object EventStream {

  /** The events schema for nanos-generation fixtures (ts streamed as
    * long nanos then converted, same as graft.Tables). Supplying the
    * schema explicitly means no nanosAsLong session conf is needed
    * (inference is what rejects the nanos annotation). */
  val rawSchema: StructType = graft.Tables.eventsRawSchema

  /** Streaming source over a directory of events parquet files —
    * precision-aware like graft.Tables (the fixtures have shipped
    * both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) ts across driver
    * generations): a streaming source needs its schema up front, so
    * sniff one batch inference of the SAME directory and stream under
    * whichever read path that selects. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.inferableSchema(spark, dir) match {
      case Some(sch) =>
        spark.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1")
          .parquet(dir)
          .withColumn("ts", col("ts").cast(TimestampType))
      case None =>
        spark.readStream.schema(rawSchema)
          .option("maxFilesPerTrigger", "1")
          .parquet(dir)
          // integer `div`, NOT `/` — double division is lossy past
          // 2^53 ns (see graft.Tables: same conversion, same reason)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }

  /** Tumbling-window counts with a watermark: the canonical streaming
    * aggregation (10-minute windows, 30-minute late-data horizon). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"),
        round(col("sum_value"), 4).as("sum_value"))

  // ---- custom sessionization state ----------------------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionAgg(user_id: Long, n_events: Long, total_value: Double,
      first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp)
  /** Internal state for [[sessionize]] — must be public: the state
    * encoder's generated (Janino) code cannot access a private class. */
  case class SessionState(n: Long, total: Double, firstMs: Long, lastMs: Long)

  /** Per-user session aggregation with mapGroupsWithState — emits the
    * running session snapshot per trigger (update mode). */
  def sessionize(events: Dataset[Event]): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionAgg](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val events = batch.toSeq
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MaxValue, Long.MinValue))
          val next = events.foldLeft(prev) { (s, e) =>
            SessionState(s.n + 1, s.total + e.value,
              math.min(s.firstMs, e.ts.getTime), math.max(s.lastMs, e.ts.getTime))
          }
          state.update(next)
          SessionAgg(user, next.n, next.total,
            new java.sql.Timestamp(next.firstMs), new java.sql.Timestamp(next.lastMs))
      }
  }

  /** A CLOSED gap session: emitted once no event for `user_id` arrives
    * within the gap, or on end-of-stream timeout. */
  case class ClosedSession(user_id: Long, n_events: Long, total_value: Double,
      first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp)

  /** Gap-based sessionization with flatMapGroupsWithState — the
    * streaming form of [[graft.operators.EventOps.gapSessionIds]]: a
    * session CLOSES (and is emitted) when the user is silent for
    * `gapMinutes` of event time. Batches may deliver events out of
    * order inside the watermark horizon, so each batch is sorted before
    * folding; a batch-internal gap also closes a session.
    *
    * State is one running aggregate per ACTIVE user (no event buffer),
    * evicted by the event-time timeout — bounded by concurrently-active
    * users, not stream length: the property that lets this run
    * indefinitely on an unbounded feed. */
  def sessionizeGaps(events: Dataset[Event], gapMinutes: Int): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // gap elapsed with no new events: close and emit
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.n, s.total,
              new java.sql.Timestamp(s.firstMs), new java.sql.Timestamp(s.lastMs)))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            for (e <- sorted) {
              val ms = e.ts.getTime
              cur match {
                case Some(s) if ms - s.lastMs > gapMs =>
                  closed += ClosedSession(user, s.n, s.total,
                    new java.sql.Timestamp(s.firstMs), new java.sql.Timestamp(s.lastMs))
                  cur = Some(SessionState(1L, e.value, ms, ms))
                case Some(s) =>
                  cur = Some(SessionState(s.n + 1, s.total + e.value,
                    math.min(s.firstMs, ms), math.max(s.lastMs, ms)))
                case None =>
                  cur = Some(SessionState(1L, e.value, ms, ms))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes lastMs + gap
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup — the unbounded form of
    * [[graft.operators.Dedup.dropExactDuplicates]]: drop re-seen content
    * (by 128-bit hash) within the watermark horizon.
    * `dropDuplicatesWithinWatermark` keeps ONE state entry per distinct
    * hash and evicts it once the watermark passes, so state is bounded
    * by (horizon × distinct-docs-per-horizon), not stream length — the
    * property that makes this run forever on a 100 TB/day feed. */
  def dedupContent(stream: DataFrame, tsCol: String, textCol: String,
      horizon: String = "30 minutes"): DataFrame =
    stream.withWatermark(tsCol, horizon)
      .withColumn("content_hash", md5(col(textCol).cast(BinaryType)))
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming curation pipeline — the batch screens composed on an
    * unbounded document feed: quality gate (pure Column, fuses into
    * the stream scan), exact first-seen dedup within the watermark
    * horizon ([[dedupContent]]), and deterministic md5-of-id rate
    * sampling ([[graft.operators.Curation.rateSample]]'s keep rule).
    * Everything but the dedup state is stateless, so the pipeline's
    * memory is exactly dedupContent's horizon-bounded store.
    *
    * Keep decisions: the quality gate and rate sample are pure
    * per-row functions, identical to batch on any delivery order. The
    * dedup stage keeps the FIRST-PROCESSED copy of duplicate content —
    * for an event-time-ordered feed that matches batch's min-(ts, id)
    * keeper (the spec gates that equivalence); under out-of-order
    * delivery within the watermark, streaming may keep a different
    * (equally valid) representative of a duplicate group, which can
    * then flip that group's md5-of-id sampling decision. */
  def curationStream(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, minTokens: Int, keepPermill: Int,
      horizon: String = "30 minutes"): DataFrame = {
    val quality = docs
      .filter(graft.operators.TextAnalysis.tokenCount(col(textCol)) >= minTokens)
    val bucket = graft.operators.Curation.md5Permill(col(idCol))
    dedupContent(quality, tsCol, textCol, horizon)
      .filter(bucket < keepPermill)
  }

  /** Streaming mixture control with batch-trained rates: a STATIC
    * per-source permill table (e.g. from
    * [[graft.operators.Curation.temperatureSample]]'s rate computation
    * over yesterday's corpus) joins the live stream — the stream-static
    * join pattern: the static side is planned once per micro-batch, no
    * state store involved — and the same content-independent md5-of-id
    * rule decides keeps. Deterministic: replaying the feed reproduces
    * the sample exactly.
    *
    * Rates must come from a BATCH pass by design: a true global token
    * aggregate is unbounded state on a stream; the production shape is
    * rates retrained per window/day and swapped in as a new static
    * frame. */
  def mixtureStream(docs: DataFrame, idCol: String, sourceCol: String,
      rates: DataFrame, rateSourceCol: String, permillCol: String): DataFrame = {
    val bucket = graft.operators.Curation.md5Permill(col(idCol))
    docs.join(rates.select(col(rateSourceCol).as(sourceCol), col(permillCol)),
        Seq(sourceCol))
      .filter(bucket < col(permillCol))
      .drop(permillCol)
  }

  // ---- streaming near-dup dedup (streaming LSH) ----------------------

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  case class NearDupMatch(doc_id: Long, dup_of: Long, hamming: Int)
  /** Bucket member: (simhash, doc id, event-time ms). Public for the
    * state encoder's generated code, like [[SessionState]]. */
  case class SimBucketState(entries: List[(Long, Long, Long)])
  case class BucketRow(doc_id: Long, ts: java.sql.Timestamp, sim: Long,
      chunk: Int, ch: Long)

  /** Streaming NEAR-dup detection — the unbounded form of
    * [[graft.operators.Dedup.simHashPairs]]: emit a match whenever a
    * document's simhash is within `maxHamming` bits of an EARLIER
    * document in the watermark horizon. Pigeonhole blocking, same as
    * the batch operator: each doc lands in `maxHamming + 1` chunk
    * buckets; any qualifying pair shares at least one bucket, so recall
    * within the horizon is exact. Per-bucket state compares the
    * incoming fingerprint against resident members (64-bit XOR +
    * popcount per comparison — no text retained in state).
    *
    * The same (doc, dup_of) pair can surface from several buckets;
    * downstream consumers dedupe by key (kept out of this operator: a
    * second stateful aggregation would pin the query shape, and the
    * caller may want first-bucket latency).
    *
    * Scale/state: one entry per (bucket, doc) within the horizon,
    * evicted by event-time timeout once the watermark passes — bounded
    * by horizon churn like [[dedupContent]], not stream length. Bucket
    * crowding follows the batch operator's math (8-bit chunks ⇒ 256
    * buckets per chunk index); at corpus-scale ingest rates, widen the
    * blocking exactly as `simHashPairs(blocks = h + 2)` does. */
  def nearDedupMatches(docs: Dataset[Doc], horizon: String = "30 minutes",
      maxHamming: Int = 3): Dataset[NearDupMatch] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = maxHamming + 1
    val chunkBits = 64 / k
    val horizonMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    val evictMs = (horizonMs.months * 30L + horizonMs.days) * 86400000L +
      horizonMs.microseconds / 1000L
    val rows = docs
      .withColumn("sim", graft.operators.Dedup.simHash(col("text")))
      .withWatermark("ts", horizon)
      .select(col("doc_id"), col("ts"), col("sim"),
        posexplode(transform(sequence(lit(0), lit(k - 1)),
          c => call_function("shiftright", col("sim"), c * chunkBits)
            .bitwiseAND(lit((1L << chunkBits) - 1)))))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ch")
      .as[BucketRow]
    rows.groupByKey(r => (r.chunk, r.ch))
      .flatMapGroupsWithState[SimBucketState, NearDupMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), batch: Iterator[BucketRow], state: GroupState[SimBucketState]) =>
          val wm = state.getCurrentWatermarkMs()
          if (batch.isEmpty && state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // resident members still inside the horizon
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_._3 >= wm - evictMs)
            val out = Seq.newBuilder[NearDupMatch]
            // arrival order within the batch: event time, then id
            for (r <- batch.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))) {
              for ((sim, id, _) <- entries if id != r.doc_id) {
                val h = java.lang.Long.bitCount(sim ^ r.sim)
                if (h <= maxHamming) out += NearDupMatch(r.doc_id, id, h)
              }
              entries = (r.sim, r.doc_id, r.ts.getTime) :: entries
            }
            state.update(SimBucketState(entries))
            // evict once the watermark passes the newest member + horizon
            state.setTimeoutTimestamp(entries.map(_._3).max + evictMs)
            out.result().iterator
          }
      }
  }

  /** Watermarked stream-stream interval join: each click joins signups
    * of the same user within `withinMinutes` BEFORE the click — the
    * unbounded form of [[graft.operators.EventOps.asofJoin]]'s "latest
    * prior event" shape (bounded here to an interval so both join
    * states are evictable).
    *
    * Scale: both sides carry watermarks and the join condition bounds
    * event time in both directions, so Spark evicts join state once the
    * watermark passes the interval — state is O(events in the horizon),
    * not stream length. Without the time bound a stream-stream join
    * must buffer one side forever; the interval is what makes this run
    * indefinitely. */
  def clickSignupJoin(clicks: DataFrame, signups: DataFrame,
      withinMinutes: Int, horizon: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", horizon)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val s = signups.withWatermark("ts", horizon)
      .select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"),
        col("value").as("signup_value"))
    c.join(s,
      col("user_id") === col("s_user_id") &&
        col("signup_ts") <= col("click_ts") &&
        col("signup_ts") >= col("click_ts") - expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("click_id"), col("user_id"), col("signup_ts"), col("signup_value"))
  }

  /** Windowed streaming sketch profile: per-(window, event_type) row
    * counts and HLL-approximate distinct users. HLL registers merge by
    * elementwise max — commutative and associative — so the streaming
    * incremental merge produces the IDENTICAL estimate to the batch
    * computation over the same finalized windows (the spec gates this
    * equality, not a tolerance). The streaming face of
    * [[graft.operators.Profiling]]: constant-size per-window state at
    * any event rate. */
  def windowedProfile(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("approx_users"))

  /** Run a bounded smoke of the streaming pipeline: consume every
    * available file, return the materialized windowed counts. */
  def runWindowedBatch(spark: SparkSession, dir: String, queryName: String): DataFrame =
    runToMemory(windowedCounts(readEvents(spark, dir)), queryName)

  /** Consume every available file through `df`'s streaming plan into a
    * memory sink and return the materialized table. */
  def runToMemory(df: DataFrame, queryName: String): DataFrame = {
    val spark = df.sparkSession
    val q = df.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Streaming CDC upsert: a change stream (key, payload columns, an
    * op column with "upsert"/"delete", and a monotonic sequence
    * column) MERGEs into a registered table once per micro-batch via
    * foreachBatch — the streaming spelling of the dialect's MERGE
    * INTO. Within a batch, last-writer-wins per key (one rank window
    * over the sequence column) BEFORE the merge, so the engine's
    * multi-match ambiguity check never trips on a busy key. Each
    * micro-batch is one set-based merge: one left join + one anti
    * join against the current table state, delta side
    * broadcast-eligible — per-batch cost tracks the BATCH, and the
    * 100 TB target is never rewritten row-at-a-time by the driver.
    *
    * Update/insert columns = the batch's payload columns that exist in
    * the target (key excluded from SET). Returns the started query;
    * the caller owns its lifecycle. */
  def cdcMergeSink(delta: DataFrame, gs: graft.engine.GraftSession,
      target: String, keyCol: String, opCol: String, seqCol: String): org.apache.spark.sql.streaming.StreamingQuery = {
    delta.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keyCol).orderBy(col(seqCol).desc)
          val lastWins = batch
            .withColumn("__cdc_rk", row_number().over(w))
            .filter(col("__cdc_rk") === 1)
            .drop("__cdc_rk", seqCol)
          val tmp = s"__cdc_b$batchId"
          gs.registerTable(tmp, lastWins)
          val targetCols = gs.sql(s"SELECT * FROM $target LIMIT 0").columns
          val payload = lastWins.columns.filterNot(c =>
            c.equalsIgnoreCase(keyCol) || c.equalsIgnoreCase(opCol))
            .filter(c => targetCols.exists(_.equalsIgnoreCase(c)))
          val setSql = payload.map(c => s"$c = d.$c").mkString(", ")
          val insCols = (keyCol +: payload.toSeq).mkString(", ")
          val insVals = (keyCol +: payload.toSeq).map(c => s"d.$c").mkString(", ")
          gs.sql(
            s"""MERGE INTO $target t USING $tmp d ON t.$keyCol == d.$keyCol
               |WHEN MATCHED AND d.$opCol == "delete" THEN DELETE
               |WHEN MATCHED THEN UPDATE SET $setSql
               |WHEN NOT MATCHED AND d.$opCol != "delete" THEN INSERT ($insCols) VALUES ($insVals)""".stripMargin)
          gs.dropTable(tmp)
          // truncate the target's lineage each batch (the bpeTrain
          // lesson: batch n must not replay batches 1..n-1's merges);
          // a production deployment would MERGE into a storage-backed
          // table instead — this keeps the in-memory harness honest
          gs.registerTable(target,
            gs.sql(s"SELECT * FROM $target").localCheckpoint(true))
        }
      }
      .start()
  }
}
