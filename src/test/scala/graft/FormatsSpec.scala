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
    // and the dialect DDL surface registers it like csv/json/parquet
    val gs = new graft.engine.GraftSession(spark)
    gs.sql(s"""CREATE SOURCE orcdocs WITH {"type":"orc","path":"$out"}""")
    val n = gs.sql("SELECT count(*) AS n FROM orcdocs WHERE doc_id < 10")
      .collect()(0).getLong(0)
    assert(n == docs.filter(col("doc_id") < 10).count())
  }

  test("sample introspection: 20-row typing, drift past the sample, TTL refresh") {
    // reference behavior: type from the first ~20 rows
    // (datasource/introspect.go:14-78, coerce.go:53-67), refresh every
    // 5 min (schema/schema.go:23) — here with an injectable clock
    val f = java.nio.file.Files.createTempDirectory("graft_csv").resolve("t.csv")
    def write(rows: Seq[String]): Unit =
      java.nio.file.Files.write(f, ("id,price,active,seen,name,pad" +: rows)
        .mkString("\n").getBytes)
    // rows 1-20 cleanly typed; row 25's "abc" id sits PAST the sample
    // window, so full inference would say string — sampling says long
    // `pad` is whitespace-padded numerics: the guess must pick a type
    // the reader's converter accepts for the same bytes (parseDouble
    // trims, parseLong does not), so the data survives the read
    write((1 to 22).map(i => s"$i,$i.5,true,2024-01-0${i % 9 + 1},n$i, $i") :+
      "abc,9.5,false,2024-01-02,n23, 23")
    val eng = new graft.engine.GraftSession(spark)
    var now = 0L
    eng.registerCsvSampled("t", f.toString, clock = () => now)
    val st = eng.table("t").schema
    assert(st("id").dataType == org.apache.spark.sql.types.LongType, st)
    assert(st("price").dataType == org.apache.spark.sql.types.DoubleType, st)
    assert(st("active").dataType == org.apache.spark.sql.types.BooleanType, st)
    assert(st("seen").dataType == org.apache.spark.sql.types.TimestampType, st)
    assert(st("name").dataType == org.apache.spark.sql.types.StringType, st)
    assert(st("pad").dataType == org.apache.spark.sql.types.DoubleType, st)
    // the drifted value reads as null instead of widening the column
    assert(eng.table("t").filter(col("id").isNull).count() == 1)
    // date-only strings guessed TimestampType must actually CONVERT
    // under Spark CSV's default timestamp parsing — a converter
    // regression would silently null the whole column (ADVICE r8)
    assert(eng.table("t").filter(col("seen").isNull).count() == 0)
    // padded numerics came through the read, not nulled
    assert(eng.table("t").filter(col("pad").isNull).count() == 0)
    // schema drift within the TTL: cached schema still serves
    write(Seq("x1,1.5,true,2024-01-01,n1,2"))
    now += 1000
    assert(eng.table("t").schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    // past the TTL: re-introspection picks up the drifted type
    now += graft.engine.SampleIntrospect.RefreshIntervalMs
    assert(eng.table("t").schema("id").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("background refresher updates schemas unprompted, inside the TTL") {
    // the daemon variant of schema refresh (schema/schema.go:23): the
    // refresher re-introspects WITHOUT an access and WITHOUT the TTL
    // expiring — refreshAll() is the exact closure the timer runs, so
    // the spec stays deterministic instead of sleeping on the thread
    val f = java.nio.file.Files.createTempDirectory("graft_csv_bg").resolve("t.csv")
    def write(rows: Seq[String]): Unit =
      java.nio.file.Files.write(f, ("id,name" +: rows).mkString("\n").getBytes)
    write(Seq("1,a", "2,b"))
    val eng = new graft.engine.GraftSession(spark)
    val bg = new graft.engine.SampleIntrospect.BackgroundRefresher()
    try {
      var now = 0L
      eng.registerCsvSampled("bgt", f.toString, clock = () => now,
        refresher = Some(bg))
      assert(eng.table("bgt").schema("id").dataType ==
        org.apache.spark.sql.types.LongType)
      write(Seq("x,a")) // drift: id becomes string
      now += 1000 // well inside the TTL: on-access refresh would NOT fire
      assert(eng.table("bgt").schema("id").dataType ==
        org.apache.spark.sql.types.LongType, "TTL cache should still serve")
      bg.refreshAll() // what the daemon timer runs each interval
      assert(eng.table("bgt").schema("id").dataType ==
        org.apache.spark.sql.types.StringType,
        "background refresh did not re-introspect")
      // task lifecycle: re-registering a table REPLACES its task, and
      // dropTable deregisters — a leaked task would re-scan the source
      // every interval for the session's lifetime
      assert(bg.taskCount == 1)
      eng.registerCsvSampled("bgt", f.toString, clock = () => now,
        refresher = Some(bg))
      assert(bg.taskCount == 1, "re-registration duplicated the refresh task")
      eng.dropTable("bgt")
      assert(bg.taskCount == 0, "dropTable leaked the refresh task")
    } finally bg.close()
  }

  test("background refresher counts failures and survives them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_fail")
    val f = dir.resolve("t.csv")
    def write(rows: Seq[String]): Unit =
      java.nio.file.Files.write(f, ("id,name" +: rows).mkString("\n").getBytes)
    write(Seq("1,a"))
    val eng = new graft.engine.GraftSession(spark)
    val bg = new graft.engine.SampleIntrospect.BackgroundRefresher()
    try {
      var now = 0L
      eng.registerCsvSampled("failt", f.toString, clock = () => now,
        refresher = Some(bg))
      assert(eng.table("failt").schema("id").dataType ==
        org.apache.spark.sql.types.LongType)
      assert(bg.failureCount == 0L && bg.lastFailureMs == 0L)
      // source vanishes mid-rewrite: the refresh fails, the daemon
      // survives, and the failure is VISIBLE (r9 verdict #5 — the
      // swallow-for-survival catch was an ops blind spot)
      java.nio.file.Files.delete(f)
      bg.refreshAll()
      assert(bg.failureCount == 1L, "failed refresh was not counted")
      assert(bg.lastFailureMs > 0L, "failure timestamp not recorded")
      assert(bg.taskCount == 1, "failed refresh dropped its task")
      bg.refreshAll() // keeps retrying, keeps counting
      assert(bg.failureCount == 2L)
      // the file returns with drifted types: the next interval recovers
      write(Seq("x,a"))
      bg.refreshAll()
      assert(bg.failureCount == 2L, "successful refresh counted as failure")
      assert(eng.table("failt").schema("id").dataType ==
        org.apache.spark.sql.types.StringType, "daemon did not recover")
    } finally { bg.close(); eng.dropTable("failt") }
  }

  test("re-registration deregisters a displaced refresher's task") {
    // ADVICE r9: registering the same table again with refresher=None
    // or a DIFFERENT BackgroundRefresher instance must deregister the
    // old instance's task — otherwise it re-introspects an orphaned
    // loader's cache every interval until its close()
    val f = java.nio.file.Files.createTempDirectory("graft_csv_swap").resolve("t.csv")
    java.nio.file.Files.write(f, "id,name\n1,a".getBytes)
    val eng = new graft.engine.GraftSession(spark)
    val r1 = new graft.engine.SampleIntrospect.BackgroundRefresher()
    val r2 = new graft.engine.SampleIntrospect.BackgroundRefresher()
    try {
      eng.registerCsvSampled("swapt", f.toString, refresher = Some(r1))
      assert(r1.taskCount == 1)
      // different instance displaces r1's task
      eng.registerCsvSampled("swapt", f.toString, refresher = Some(r2))
      assert(r1.taskCount == 0, "displaced refresher kept the task")
      assert(r2.taskCount == 1)
      // refresher=None displaces r2's task
      eng.registerCsvSampled("swapt", f.toString, refresher = None)
      assert(r2.taskCount == 0, "None re-registration leaked the task")
      // a PLAIN re-registration (non-sampled path) also displaces
      eng.registerCsvSampled("swapt", f.toString, refresher = Some(r1))
      assert(r1.taskCount == 1)
      eng.registerParquet("swapt", f.toString)
      assert(r1.taskCount == 0, "plain re-registration leaked the task")
      // same-instance re-registration REPLACES, never cancels
      eng.registerCsvSampled("swapt", f.toString, refresher = Some(r1))
      eng.registerCsvSampled("swapt", f.toString, refresher = Some(r1))
      assert(r1.taskCount == 1, "same-instance re-registration lost the task")
    } finally { r1.close(); r2.close(); eng.dropTable("swapt") }
  }

  test("json sample introspection: nested structs, arrays, string-content guessing") {
    import org.apache.spark.sql.types._
    val f = java.nio.file.Files.createTempDirectory("graft_json").resolve("t.jsonl")
    java.nio.file.Files.write(f, Seq(
      """{"id": 1, "score": 1.5, "ok": true, "tags": ["a", "b"], "meta": {"n": 7, "when": "2024-01-02"}}""",
      """{"id": 2, "score": 2.0, "ok": false, "tags": ["c"], "meta": {"n": 9, "when": "2024-02-03"}}""",
      """{"id": 3, "score": 2, "ok": true, "tags": [], "meta": {"n": 1, "when": "2024-03-04"}, "extra": "42"}""")
      .mkString("\n").getBytes)
    val eng = new graft.engine.GraftSession(spark)
    eng.registerJsonSampled("j", f.toString)
    val st = eng.table("j").schema
    assert(st("id").dataType == LongType, st)
    assert(st("score").dataType == DoubleType, st) // long+double widens
    assert(st("ok").dataType == BooleanType, st)
    assert(st("tags").dataType == ArrayType(StringType), st)
    val meta = st("meta").dataType.asInstanceOf[StructType]
    assert(meta("n").dataType == LongType, st)
    // string CONTENT guessing applies inside nested objects too
    assert(meta("when").dataType == TimestampType, st)
    // a key appearing only in a later sampled line still unions in;
    // a QUOTED numeric stays STRING (the JSON reader has no
    // string->long conversion — typing it long would null the record)
    assert(st("extra").dataType == StringType, st)
    assert(eng.table("j").filter(col("extra") === "42").count() == 1)
    assert(eng.table("j").count() == 3)
    assert(eng.table("j").agg(sum(col("meta.n"))).head().getLong(0) == 17L)
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
