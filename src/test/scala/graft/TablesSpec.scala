package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the Tables helpers shared by every oracle query —
  * in particular exactSum's overflow contract (ADVICE r7: a term too
  * large for the decimal cast must fail loudly, never silently vanish
  * from the sum). */
class TablesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("events ts reads back at the fixture's ABSOLUTE time, any stored precision") {
    // the r10 fixture regeneration silently switched ts from
    // TIMESTAMP(NANOS) to TIMESTAMP(MICROS); the old hardcoded nanos
    // divide read 2024 data as 1970 while every engine-vs-engine spec
    // stayed green (both sides equally wrong) — only the absolute
    // epoch catches a precision mix-up, so pin it here
    val years = Tables(spark, "/root/testdata/sf0.001", "events")
      .agg(min(year(col("ts"))), max(year(col("ts")))).head()
    assert(years.getInt(0) >= 2020 && years.getInt(1) <= 2030,
      s"events ts decoded outside the fixture's era: $years — " +
        "stored precision changed again?")
    // and the streaming read path must agree with the batch one
    val batchTs = Tables(spark, "/root/testdata/sf0.001", "events")
      .agg(min(col("ts"))).head().getTimestamp(0)
    val tmp = java.nio.file.Files.createTempDirectory("evts").toFile
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        tmp.toPath.resolve("events.parquet"))
      val sq = graft.streaming.EventStream.readEvents(spark, tmp.getAbsolutePath)
        .agg(min(col("ts")).as("mn"))
        .writeStream.format("memory").queryName("ts_readback")
        .outputMode("complete").start()
      try {
        sq.processAllAvailable()
        val streamTs = spark.table("ts_readback").head().getTimestamp(0)
        assert(streamTs == batchTs,
          s"stream min ts $streamTs != batch min ts $batchTs")
      } finally sq.stop()
    } finally {
      tmp.listFiles().foreach(_.delete()); tmp.delete(); ()
    }
  }

  test("exactSum is exact, order-independent, and keeps large in-range terms") {
    import spark.implicits._
    val terms = Seq(1.0e25, 1.5, -2.25, 1.0e21)
    // exact decimal sum = 1.0001e25 - 0.75, whose nearest double is
    // 1.0001e25 (the naive left-to-right DOUBLE sum lands one ulp off —
    // exactly the engine-order noise exactSum exists to remove)
    for (shuffled <- Seq(terms, terms.reverse)) {
      val got = shuffled.toDF("x").repartition(4)
        .agg(Tables.exactSum(col("x"))).head().getDouble(0)
      assert(got == 1.0001e25, s"exactSum drifted: $got")
    }
  }

  test("exactSum raises on a term beyond DECIMAL(38,8) instead of dropping it") {
    import spark.implicits._
    // 1e31 does not fit DECIMAL(38,8). Under ANSI mode (this session's
    // default) the cast itself raises; under non-ANSI it casts to NULL
    // and the when-guard raises instead — either way the sum can never
    // silently become 2.0
    val ex = intercept[Exception] {
      Seq(1.0e31, 2.0).toDF("x").agg(Tables.exactSum(col("x"))).head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m => m.contains("exactSum term exceeds") ||
        m.contains("cannot be represented as Decimal(38, 8)")),
      s"expected an overflow error, got: ${messages(ex).mkString(" | ")}")
    // null terms are still ignored, like any SQL sum
    val withNull = Seq(Some(3.5), None, Some(1.25)).toDF("x")
      .agg(Tables.exactSum(col("x"))).head().getDouble(0)
    assert(withNull == 4.75)
  }
}
