package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** Structured Streaming specs: the windowed aggregation must match the
  * equivalent batch computation once the bounded stream drains, and
  * sessionization state must accumulate per user.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  /** The file-stream source requires a directory: stage the events
    * parquet file into a temp dir. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("windowed streaming counts equal the batch computation") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    // append mode emits only watermark-finalized windows: compare the
    // subset whose end precedes max(ts) - 30min watermark horizon
    val maxTs = events.agg(max("ts")).head().getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - (40 * 60 * 1000))
    val streamed = EventStream.runWindowedBatch(spark, dir, "win_smoke")
      .filter(col("win_start") <= horizon)
      .orderBy("win_start", "event_type")
    val batch = events
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .filter(col("win_start") <= horizon)
      .orderBy("win_start", "event_type")
    val s = streamed.collect().toSeq
    val b = batch.collect().toSeq
    assert(s.nonEmpty)
    assert(s == b, s"stream/batch divergence: ${s.diff(b).take(3)} vs ${b.diff(s).take(3)}")
  }

  test("streaming sketch profile merges HLL identically to batch") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val maxTs = events.agg(max("ts")).head().getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - (40 * 60 * 1000))
    val streamed = EventStream.runToMemory(
        EventStream.windowedProfile(EventStream.readEvents(spark, dir)), "prof_smoke")
      .filter(col("win_start") <= horizon)
      .orderBy("win_start", "event_type")
    val batch = events
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("approx_users"))
      .filter(col("win_start") <= horizon)
      .orderBy("win_start", "event_type")
    val s = streamed.collect().toSeq
    val b = batch.collect().toSeq
    assert(s.nonEmpty)
    // HLL register merge is max-commutative: incremental streaming merge
    // must EQUAL the batch estimate, not just approximate it
    assert(s == b, s"stream/batch HLL divergence: ${s.diff(b).take(3)} vs ${b.diff(s).take(3)}")
  }

  test("streaming exact dedup drops re-seen content within the watermark") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)]
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val out = EventStream.dedupContent(mem.toDF().toDF("ts", "text"), "ts", "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_smoke").start()
    mem.addData((ts(0), "aaa"), (ts(0), "bbb"), (ts(1), "aaa")) // dup in batch
    q.processAllAvailable()
    mem.addData((ts(5), "aaa"), (ts(5), "ccc")) // dup across batches, inside horizon
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_smoke").select("text").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("aaa", "bbb", "ccc"), got)
  }

  test("streaming curation pipeline equals the batch screens on a replay") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Long, String)]
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val rows = Seq(
      (ts(0), 1L, "alpha beta gamma delta epsilon"),
      (ts(0), 2L, "short"), // fails the quality gate
      (ts(1), 3L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (ts(2), 4L, "one two three four five six"),
      (ts(3), 5L, "seven eight nine ten eleven twelve"),
      (ts(4), 6L, "thirteen fourteen fifteen sixteen seventeen"))
    val out = EventStream.curationStream(mem.toDF().toDF("ts", "doc_id", "text"),
      "ts", "doc_id", "text", minTokens = 4, keepPermill = 700)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("curation_smoke").start()
    mem.addData(rows: _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table("curation_smoke").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // batch replay: same screens over the same rows as a static frame
    val static = rows.toDF("ts", "doc_id", "text")
      .filter(graft.operators.TextAnalysis.tokenCount(col("text")) >= 4)
    val deduped = static.withColumn("h", md5(col("text").cast("binary")))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("h").orderBy("ts", "doc_id")))
      .filter(col("rk") === 1)
    val expected = graft.operators.Curation.rateSample(
        deduped, "h", "doc_id", Map.empty, defaultPermill = 700)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got.nonEmpty && got == expected,
      s"stream/batch curation divergence: $got vs $expected")
  }

  test("stream-static mixture join equals the batch rate sample") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val rates = Seq(("src0", 1000), ("src1", 500), ("src2", 0))
      .toDF("source", "permill")
    val rows = (0L until 60L).map(i => (i, s"src${i % 3}"))
    val out = EventStream.mixtureStream(mem.toDF().toDF("doc_id", "source"),
      "doc_id", "source", rates, "source", "permill")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mixture_smoke").start()
    mem.addData(rows: _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table("mixture_smoke").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val expected = graft.operators.Curation.rateSample(
        rows.toDF("doc_id", "source"), "source", "doc_id",
        Map("src0" -> 1000, "src1" -> 500, "src2" -> 0), defaultPermill = 0)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got.nonEmpty && got == expected,
      s"stream/batch mixture divergence: $got vs $expected")
    // src2 at 0 permill must be fully suppressed, src0 fully kept
    assert(!got.exists(_ % 3 == 2) && got.count(_ % 3 == 0) == 20)
  }

  test("streaming classifier scoring equals the batch scores (stateless kernel)") {
    // a trained quality model applied to a live feed: the margin kernel
    // is pure per-row Column work, so it drops into a stream unchanged —
    // no state store, no watermark, and stream output must EQUAL batch
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val train = Seq(
      (0L, 1.0, "good great fine solid"), (1L, 1.0, "good fine good great"),
      (2L, 0.0, "spam junk noise drivel"), (3L, 0.0, "junk spam junk noise"))
      .toDF("doc_id", "y", "text")
    val (w, b) = graft.operators.TextAnalysis.trainClassifier(
      train, "doc_id", "text", org.apache.spark.sql.functions.col("y"),
      buckets = 32, iters = 6, lr = 5.0)
    val feed = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) s"good solid v$i" else s"spam drivel v$i"))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = graft.operators.TextAnalysis.scoreClassifier(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", w, b)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("clf_stream").start()
    mem.addData(feed: _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table("clf_stream")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = graft.operators.TextAnalysis.scoreClassifier(
        feed.toDF("doc_id", "text"), "doc_id", "text", w, b)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want, s"stream/batch classifier divergence")
    // and the model actually separates the live feed
    assert((0L until 40L by 2).forall(i => got(i) > got(i + 1)),
      "even (good) docs must outscore odd (spam) docs")
  }

  test("streaming near-dup detection flags small-hamming arrivals, evicts old state") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)]
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val base = "the quick brown fox jumps over the lazy dog while the spark " +
      "engine shuffles partitions across the cluster and the watermark " +
      "advances through event time toward the horizon of the stream"
    val nearDup = base.replace("lazy", "sleepy") // ~2 shingles differ
    val unrelated = "completely different content about databases indexes " +
      "btrees pages buffers checkpoints logs transactions locks latches " +
      "cursors schemas catalogs statistics optimizers plans executors rows"
    val out = EventStream.nearDedupMatches(
      mem.toDF().toDF("doc_id", "ts", "text").as[EventStream.Doc],
      horizon = "30 minutes", maxHamming = 7)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_smoke").start()
    mem.addData((1L, ts(0), base), (2L, ts(0), unrelated))
    q.processAllAvailable()
    mem.addData((3L, ts(5), nearDup)) // near-dup of doc 1, inside horizon
    q.processAllAvailable()
    // advance the watermark far past doc 1/3, then replay the base text:
    // state evicted, so no match fires
    mem.addData((4L, ts(100), "watermark advancing sentinel gamma delta " +
      "epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho " +
      "sigma tau upsilon phi chi psi omega alpha beta one two three four"))
    q.processAllAvailable()
    mem.addData((5L, ts(105), base))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_smoke")
      .select("doc_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet // dedupe multi-bucket emits
    assert(got.contains((3L, 1L)), s"missed the near-dup pair: $got")
    assert(!got.exists(_._1 == 2L) && !got.exists(_._2 == 2L),
      s"unrelated doc flagged: $got")
    assert(!got.exists(_._1 == 5L), s"match fired after state eviction: $got")
  }

  test("sessionization accumulates per-user state") {
    import spark.implicits._
    val events = EventStream.readEvents(spark, dir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val q = EventStream.sessionize(events)
      .writeStream.outputMode("update").format("memory").queryName("sess_smoke").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_smoke")
    // last snapshot per user must equal the batch per-user aggregate
    val lastSnap = out.groupBy("user_id").agg(max("n_events").as("n_events"))
    val batch = Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val joined = lastSnap.join(batch, "user_id")
      .filter(col("n_events") =!= col("n"))
    assert(joined.count() == 0, s"state mismatch for users: ${joined.collect().mkString}")
  }

  test("stream-stream interval join matches the batch equivalent") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val clicks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, java.sql.Timestamp)]
    val signups = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = EventStream.clickSignupJoin(
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      signups.toDF().toDF("user_id", "ts", "value"),
      withinMinutes = 10)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("ssj_smoke").start()
    // user 1 signs up at t5, clicks at t8 (inside window) and t20 (outside);
    // user 2 clicks with no signup
    signups.addData((1L, ts(5), 42.0))
    clicks.addData((100L, 1L, ts(8)), (101L, 1L, ts(20)), (102L, 2L, ts(9)))
    q.processAllAvailable()
    // advance both watermarks so joined rows finalize (distinct users,
    // so the advancer rows don't join with each other)
    signups.addData((8L, ts(600), 0.0))
    clicks.addData((999L, 9L, ts(600)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_smoke")
      .select("click_id", "user_id", "signup_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((100L, 1L, 42.0)), got)
  }

  test("gap sessionization closes sessions on event-time timeout") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event]
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))
    def ev(id: Long, user: Long, min: Int, v: Double) =
      EventStream.Event(id, new java.sql.Timestamp(t0.getTime + min * 60000L), user, "click", v)
    val out = EventStream.sessionizeGaps(mem.toDS(), gapMinutes = 30)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("gap_smoke").start()
    // user 1: two events 5 min apart (one session); user 2: one event
    mem.addData(ev(1, 1, 0, 1.0), ev(2, 1, 5, 2.0), ev(3, 2, 0, 7.0))
    q.processAllAvailable()
    // a batch-internal gap: user 3 has two sessions inside one batch
    mem.addData(ev(4, 3, 0, 1.0), ev(5, 3, 90, 1.0))
    q.processAllAvailable()
    // advance the watermark far past every open session's gap
    mem.addData(ev(9, 9, 600, 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("gap_smoke").as[EventStream.ClosedSession].collect()
      .map(s => (s.user_id, s.n_events, s.total_value)).sorted.toSeq
    // user 1: one closed session of 2 events; user 2: one of 1 event;
    // user 3: the batch-internal early session closes immediately, the
    // late one closes via timeout
    assert(got.contains((1L, 2L, 3.0)), got)
    assert(got.contains((2L, 1L, 7.0)), got)
    assert(got.count(_._1 == 3L) == 2, got)
  }

  test("streaming CDC merges into a registered table per micro-batch") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gs = new graft.engine.GraftSession(spark)
    gs.registerTable("cdc_target",
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "name", "qty"))
    // (k, name, qty, op, seq)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long, String, Long)]
    val q = graft.streaming.EventStream.cdcMergeSink(
      mem.toDF().toDF("k", "name", "qty", "op", "seq"),
      gs, "cdc_target", "k", "op", "seq")
    // batch 1: update k=1, insert k=3; a busy key (two ops on k=3,
    // last-writer-wins by seq)
    mem.addData((1L, "a", 11L, "upsert", 1L), (3L, "c", 30L, "upsert", 2L),
      (3L, "c", 31L, "upsert", 3L))
    q.processAllAvailable()
    // batch 2: delete k=2, insert-then-delete k=4 nets to nothing
    mem.addData((2L, "b", 0L, "delete", 4L), (4L, "d", 40L, "upsert", 5L),
      (4L, "d", 0L, "delete", 6L))
    q.processAllAvailable()
    q.stop()
    val got = gs.sql("SELECT k, name, qty FROM cdc_target ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 11L), (3L, "c", 31L)), got)
    gs.dropTable("cdc_target")
  }
}
