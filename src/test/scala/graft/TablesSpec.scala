package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the Tables helpers shared by every oracle query —
  * in particular exactSum's overflow contract (ADVICE r7: a term too
  * large for the decimal cast must fail loudly, never silently vanish
  * from the sum). */
class TablesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

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
