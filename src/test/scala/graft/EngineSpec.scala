package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftSession

/** Golden-output end-to-end SQL suite mirroring the reference's
  * testutil/testsuite.go:65-152 + exec/sqldriver_test.go join tests,
  * over the users/orders mock tables (FIXTURES.md §A).
  */
class EngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  lazy val session: GraftSession = {
    val s = new GraftSession(spark)
    val users = spark.createDataFrame(
      java.util.List.of(
        Row("9Ip1aKbeZe2njCDM", "aaron@email.com", "fishing", ts("2012-10-17 17:29:39.738"), 82L, """{"name":"aaron"}"""),
        Row("hT2impsOPUREcVPc", "bob@email.com", "swimming", ts("2009-12-11 19:53:31.547"), 12L, """{"name":"bob"}"""),
        Row("hT2impsabc345c", "not_an_email_2", null, ts("2009-12-11 19:53:31.547"), 12L, """{"name":"notbob"}""")),
      StructType(Seq(
        StructField("user_id", StringType), StructField("email", StringType),
        StructField("interests", StringType), StructField("reg_date", TimestampType),
        StructField("referral_count", LongType), StructField("json_data", StringType))))
    val orders = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "9Ip1aKbeZe2njCDM", 1L, 22.50, ts("2012-12-24 17:29:39.738"), 82L),
        Row(2L, "9Ip1aKbeZe2njCDM", 2L, 37.50, ts("2013-10-24 17:29:39.738"), 82L),
        Row(3L, "abcabcabc", 1L, 22.50, ts("2013-10-24 17:29:39.738"), 82L)),
      StructType(Seq(
        StructField("order_id", LongType), StructField("user_id", StringType),
        StructField("item_id", LongType), StructField("price", DoubleType),
        StructField("order_date", TimestampType), StructField("item_count", LongType))))
    s.registerTable("users", users)
    s.registerTable("orders", orders)
    s
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => if (r.isNullAt(i)) null else r.get(i)))

  /** TestSelect harness (testutil/harness.go:186-212): exact rows. */
  private def testSelect(sql: String, expected: Seq[Seq[Any]]): Unit = {
    val got = rows(session.sql(sql))
    assert(got == expected, s"\nsql: $sql\ngot:  $got\nwant: $expected")
  }
  private def testSelectErr(sql: String): Unit =
    assertThrows[Exception] { session.sql(sql).collect() }

  test("literal select") {
    testSelect("SELECT 1", Seq(Seq(1L)))
    testSelect("SELECT 1 + 1 AS two, 'x' AS s", Seq(Seq(2L, "x")))
  }

  test("window functions through the dialect (OVER — beyond ref)") {
    // ranking + running aggregate + offset per partition, via GraftSession.sql
    testSelect(
      """SELECT order_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY price, order_id) AS rk,
        |  sum(price) OVER (PARTITION BY user_id ORDER BY order_id) AS run,
        |  lag(price) OVER (PARTITION BY user_id ORDER BY order_id) AS prev
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, 1L, 22.50, null), Seq(2L, 2L, 60.0, 22.50),
        Seq(3L, 1L, 22.50, null)))
    // count(*) window and global (no PARTITION BY) window
    testSelect(
      """SELECT order_id, count(*) OVER (PARTITION BY user_id) AS n
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, 2L), Seq(2L, 2L), Seq(3L, 1L)))
    // print -> parse round trip preserves the window clause
    val stmt = graft.rel.SqlParser.parse(
      "SELECT order_id, rank() OVER (PARTITION BY user_id ORDER BY price DESC) AS rk FROM orders")
    val printed = graft.rel.SqlWriter.toSql(stmt)
    assert(printed.contains("OVER (PARTITION BY"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
    // an unknown window function fails loudly instead of dropping OVER
    testSelectErr("SELECT todays_date() OVER (ORDER BY order_id) AS x FROM orders")
  }

  test("CASE WHEN expressions (dialect)") {
    // searched form with ELSE
    testSelect(
      """SELECT order_id,
        |  CASE WHEN price > 30 THEN "high" WHEN price > 20 THEN "mid"
        |    ELSE "low" END AS band
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, "mid"), Seq(2L, "high"), Seq(3L, "mid")))
    // simple form desugars to equality; missing ELSE yields NULL
    testSelect(
      """SELECT order_id, CASE item_id WHEN 1 THEN "one" END AS w
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, "one"), Seq(2L, null), Seq(3L, "one")))
    // CASE works in WHERE and round-trips through the printer
    testSelect(
      """SELECT order_id FROM orders
        |WHERE CASE WHEN item_id == 2 THEN true ELSE false END
        |ORDER BY order_id""".stripMargin,
      Seq(Seq(2L)))
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT CASE WHEN a > 1 THEN 2 ELSE 3 END AS x FROM t"))
    assert(printed.contains("CASE WHEN"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
    // single-row eval path (LocalEval) takes the first true branch
    assert(session.compile("CASE WHEN x > 5 THEN \"big\" ELSE \"small\" END")(
      Map("x" -> 10L)) == "big")
  }

  test("WITH common table expressions (dialect)") {
    // one CTE, referenced by the body
    testSelect(
      """WITH big AS (SELECT order_id, price FROM orders WHERE price > 30)
        |SELECT order_id FROM big ORDER BY order_id""".stripMargin,
      Seq(Seq(2L)))
    // chained CTEs: the second reads the first; body joins a real table
    testSelect(
      """WITH expensive AS (SELECT user_id, price FROM orders WHERE price > 30),
        |  cnt AS (SELECT user_id, count(*) AS n FROM expensive GROUP BY user_id)
        |SELECT u.user_id, c.n FROM users u JOIN cnt c ON u.user_id == c.user_id
        |ORDER BY u.user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 1L)))
    // a CTE shadows a registered table for the statement only
    testSelect(
      """WITH orders AS (SELECT order_id FROM orders WHERE order_id == 3)
        |SELECT order_id FROM orders""".stripMargin,
      Seq(Seq(3L)))
    testSelect("SELECT count(*) AS n FROM orders", Seq(Seq(3L)))
    // print -> parse roundtrip
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "WITH t AS (SELECT order_id FROM orders) SELECT order_id FROM t"))
    assert(printed.startsWith("WITH t AS ("), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("scalar subqueries in WHERE (dialect)") {
    // orders above the average price: avg = 27.5, only order 2 qualifies
    testSelect(
      """SELECT order_id FROM orders
        |WHERE price > (SELECT avg(price) FROM orders) ORDER BY order_id""".stripMargin,
      Seq(Seq(2L)))
    // combinable with plain predicates in the same AND chain
    testSelect(
      """SELECT order_id FROM orders
        |WHERE price >= (SELECT min(price) FROM orders) AND item_id == 1
        |ORDER BY order_id""".stripMargin,
      Seq(Seq(1L), Seq(3L)))
  }

  test("EXISTS subqueries in WHERE (dialect)") {
    // correlated EXISTS → left_semi on the equality conjunct: users
    // with at least one order over 30
    testSelect(
      """SELECT user_id FROM users
        |WHERE EXISTS (SELECT 1 FROM orders WHERE orders.user_id = users.user_id AND price > 30)
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM")))
    // correlated NOT EXISTS → left_anti: users with no order at all
    testSelect(
      """SELECT user_id FROM users
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE orders.user_id = users.user_id)
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("hT2impsOPUREcVPc"), Seq("hT2impsabc345c")))
    // the plan is the join Catalyst would pick itself, not a loop
    val plan = session.sql(
      """SELECT user_id FROM users
        |WHERE EXISTS (SELECT 1 FROM orders WHERE orders.user_id = users.user_id)""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    // uncorrelated EXISTS is a whole-corpus existence gate
    testSelect(
      "SELECT order_id FROM orders WHERE EXISTS (SELECT 1 FROM users WHERE referral_count > 50) ORDER BY order_id",
      Seq(Seq(1L), Seq(2L), Seq(3L)))
    testSelect(
      "SELECT order_id FROM orders WHERE EXISTS (SELECT 1 FROM users WHERE referral_count > 500)",
      Seq())
    testSelect(
      "SELECT order_id FROM orders WHERE NOT EXISTS (SELECT 1 FROM users WHERE referral_count > 500) ORDER BY order_id",
      Seq(Seq(1L), Seq(2L), Seq(3L)))
    // FilterQL field-presence EXISTS is untouched by the subquery form
    testSelect(
      "SELECT user_id FROM users WHERE EXISTS interests ORDER BY user_id",
      Seq(Seq("9Ip1aKbeZe2njCDM"), Seq("hT2impsOPUREcVPc")))
    // print -> parse roundtrip keeps the subquery
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT user_id FROM users WHERE EXISTS (SELECT 1 FROM orders WHERE orders.user_id = users.user_id)"))
    assert(printed.contains("EXISTS (SELECT"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("window frame clauses (ROWS BETWEEN) through the dialect") {
    // 2-row trailing sum per user: row n sums rows n-1..n
    testSelect(
      """SELECT order_id,
        |  sum(price) OVER (PARTITION BY user_id ORDER BY order_id
        |    ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS trail2
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, 22.50), Seq(2L, 60.0), Seq(3L, 22.50)))
    // shorthand `ROWS n PRECEDING` = BETWEEN n PRECEDING AND CURRENT ROW
    testSelect(
      """SELECT order_id,
        |  count(*) OVER (ORDER BY order_id ROWS UNBOUNDED PRECEDING) AS running
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, 1L), Seq(2L, 2L), Seq(3L, 3L)))
    // ranking functions refuse a frame loudly
    testSelectErr(
      "SELECT row_number() OVER (ORDER BY order_id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM orders")
    // print -> parse roundtrip keeps the frame
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT sum(price) OVER (PARTITION BY user_id ORDER BY order_id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM orders"))
    assert(printed.contains("ROWS BETWEEN 1 PRECEDING AND CURRENT ROW"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("JOIN USING coalesces the key column (dialect)") {
    testSelect(
      """SELECT user_id, order_id, email FROM orders
        |JOIN users USING (user_id) ORDER BY order_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 1L, "aaron@email.com"),
        Seq("9Ip1aKbeZe2njCDM", 2L, "aaron@email.com")))
    // LEFT JOIN USING keeps unmatched left rows
    testSelect(
      """SELECT order_id, email FROM orders
        |LEFT JOIN users USING (user_id) ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, "aaron@email.com"), Seq(2L, "aaron@email.com"), Seq(3L, null)))
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT order_id FROM orders JOIN users USING (user_id)"))
    assert(printed.contains("JOIN users USING (user_id)"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("NATURAL JOIN joins on every shared name, refuses when none (dialect)") {
    // users/orders share only user_id
    testSelect(
      """SELECT order_id, email FROM orders
        |NATURAL JOIN users ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, "aaron@email.com"), Seq(2L, "aaron@email.com")))
    // no shared columns -> loud error, never a silent cartesian
    testSelectErr(
      "SELECT 1 FROM (SELECT order_id FROM orders) a NATURAL JOIN (SELECT user_id FROM users) b")
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT order_id FROM orders NATURAL JOIN users"))
    assert(printed.contains("NATURAL INNER JOIN users"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("PIVOT through the dialect") {
    // per-user item-count pivot: remaining column (user_id) groups
    testSelect(
      """SELECT * FROM (SELECT user_id, item_id, price FROM orders) t
        |PIVOT (sum(price) FOR item_id IN (1 AS i1, 2 AS i2))
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 22.50, 37.50), Seq("abcabcabc", 22.50, null)))
    // count aggregate; absent combos are null (no rows to count)
    testSelect(
      """SELECT * FROM (SELECT user_id, item_id FROM orders) t
        |PIVOT (count(*) FOR item_id IN (1, 2)) ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 1L, 1L), Seq("abcabcabc", 1L, null)))
    // print -> parse roundtrip
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT * FROM (SELECT user_id, item_id, price FROM orders) t PIVOT (sum(price) FOR item_id IN (1 AS i1, 2)) ORDER BY user_id"))
    assert(printed.contains("PIVOT (sum(price) FOR item_id IN (1 AS i1, 2))"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("UNPIVOT through the dialect") {
    // melt price/item_count into (metric, v) rows; ids = the rest
    testSelect(
      """SELECT order_id, metric, v
        |FROM (SELECT order_id, price, item_count FROM orders) t
        |UNPIVOT (v FOR metric IN (price, item_count AS items))
        |ORDER BY order_id, metric""".stripMargin,
      Seq(Seq(1L, "items", 82.0), Seq(1L, "price", 22.50),
        Seq(2L, "items", 82.0), Seq(2L, "price", 37.50),
        Seq(3L, "items", 82.0), Seq(3L, "price", 22.50)))
    // print -> parse roundtrip
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT * FROM (SELECT order_id, price, item_count FROM orders) t UNPIVOT (v FOR metric IN (price, item_count AS items)) ORDER BY order_id"))
    assert(printed.contains("UNPIVOT (v FOR metric IN (price, item_count AS items))"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("correlated IN-subqueries in WHERE (dialect)") {
    // users whose own orders include item 2 — the correlation pins the
    // subquery to each outer row's user
    testSelect(
      """SELECT user_id FROM users
        |WHERE user_id IN (SELECT orders.user_id FROM orders WHERE orders.user_id = users.user_id AND item_id == 2)
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM")))
    // NOT IN with correlation → anti join
    testSelect(
      """SELECT user_id FROM users
        |WHERE user_id NOT IN (SELECT orders.user_id FROM orders WHERE orders.user_id = users.user_id)
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("hT2impsOPUREcVPc"), Seq("hT2impsabc345c")))
    // the uncorrelated form still plans the plain semi join
    testSelect(
      """SELECT order_id FROM orders
        |WHERE user_id IN (SELECT user_id FROM users WHERE referral_count > 50)
        |ORDER BY order_id""".stripMargin,
      Seq(Seq(1L), Seq(2L)))
  }

  test("scalar subqueries in the SELECT list (dialect)") {
    // whole-column and nested-in-expression forms; the value is a
    // plain literal downstream (works under aggregation too)
    testSelect(
      """SELECT order_id, (SELECT max(price) FROM orders) AS top_price,
        |  price - (SELECT min(price) FROM orders) AS over_min
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, 37.50, 0.0), Seq(2L, 37.50, 15.0), Seq(3L, 37.50, 0.0)))
    testSelect(
      """SELECT count(*) AS n, (SELECT count(*) FROM users) AS n_users
        |FROM orders""".stripMargin,
      Seq(Seq(3L, 3L)))
    // >1 row raises, like the WHERE form
    testSelectErr("SELECT (SELECT order_id FROM orders) AS x FROM users")
    // string-typed scalar and HAVING position
    testSelect(
      """SELECT user_id, count(*) AS n FROM orders GROUP BY user_id
        |HAVING count(*) >= (SELECT count(*) FROM users WHERE referral_count < 50)
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 2L)))
  }

  test("GROUP BY ROLLUP produces subtotal rows (dialect)") {
    // per-user counts plus the grand-total row (null user_id); Spark
    // sorts nulls first ascending
    testSelect(
      """SELECT user_id, count(*) AS n FROM orders
        |GROUP BY ROLLUP(user_id) ORDER BY user_id""".stripMargin,
      Seq(Seq(null, 3L), Seq("9Ip1aKbeZe2njCDM", 2L), Seq("abcabcabc", 1L)))
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT user_id, count(*) AS n FROM orders GROUP BY ROLLUP(user_id)"))
    assert(printed.contains("GROUP BY ROLLUP("), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("GROUP BY GROUPING SETS produces exactly the named sets (dialect)") {
    // sets: (user_id), () — per-user counts plus the grand total, but
    // NOT the per-(user,item) rows a CUBE would add
    testSelect(
      """SELECT user_id, count(*) AS n FROM orders
        |GROUP BY GROUPING SETS ((user_id), ()) ORDER BY user_id""".stripMargin,
      Seq(Seq(null, 3L), Seq("9Ip1aKbeZe2njCDM", 2L), Seq("abcabcabc", 1L)))
    // two single-key sets = the union of two groupings, one pass
    testSelect(
      """SELECT user_id, item_id, count(*) AS n FROM orders
        |GROUP BY GROUPING SETS ((user_id), (item_id))
        |ORDER BY user_id, item_id""".stripMargin,
      Seq(Seq(null, 1L, 2L), Seq(null, 2L, 1L),
        Seq("9Ip1aKbeZe2njCDM", null, 2L), Seq("abcabcabc", null, 1L)))
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT user_id, count(*) AS n FROM orders GROUP BY GROUPING SETS ((user_id), ())"))
    assert(printed.contains("GROUP BY GROUPING SETS ((user_id), ())"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("QUALIFY filters on window results (dialect)") {
    // the window-dedup idiom: keep each user's priciest order
    testSelect(
      """SELECT user_id, order_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY price DESC, order_id) AS rk
        |FROM orders QUALIFY rk == 1 ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 2L, 1L), Seq("abcabcabc", 3L, 1L)))
    // QUALIFY may reference plain columns too, and prints/reparses
    testSelect(
      "SELECT order_id, price FROM orders QUALIFY price > 30 ORDER BY order_id",
      Seq(Seq(2L, 37.50)))
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT order_id, row_number() OVER (ORDER BY order_id) AS rk FROM orders QUALIFY rk == 1"))
    assert(printed.contains("QUALIFY"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("quantified subqueries: ANY/SOME/ALL over every comparison shape") {
    // fixture prices: {22.5 (o1), 37.5 (o2), 22.5 (o3)}; item_id 1 rows
    // carry price 22.5 twice, item_id 2 carries 37.5 once
    testSelect(
      "SELECT order_id FROM orders WHERE price > ANY (SELECT price FROM orders WHERE item_id == 1) ORDER BY order_id",
      Seq(Seq(2L))) // > min(22.5)
    testSelect(
      "SELECT order_id FROM orders WHERE price >= ALL (SELECT price FROM orders WHERE item_id == 1) ORDER BY order_id",
      Seq(Seq(1L), Seq(2L), Seq(3L))) // >= max(22.5)
    testSelect( // SOME ≡ ANY
      "SELECT order_id FROM orders WHERE price < SOME (SELECT price FROM orders) ORDER BY order_id",
      Seq(Seq(1L), Seq(3L))) // < max(37.5)
    testSelect( // = ANY ≡ IN (semi join, not an aggregate)
      "SELECT order_id FROM orders WHERE price = ANY (SELECT price FROM orders WHERE item_id == 2) ORDER BY order_id",
      Seq(Seq(2L)))
    testSelect( // <> ALL ≡ NOT IN (anti join)
      "SELECT order_id FROM orders WHERE price != ALL (SELECT price FROM orders WHERE item_id == 2) ORDER BY order_id",
      Seq(Seq(1L), Seq(3L)))
    testSelect( // = ALL: multi-valued subquery → nothing equals all of it
      "SELECT order_id FROM orders WHERE price = ALL (SELECT price FROM orders) ORDER BY order_id",
      Seq.empty)
    testSelect( // <> ANY: two distinct values → every row differs from one
      "SELECT order_id FROM orders WHERE price != ANY (SELECT price FROM orders) ORDER BY order_id",
      Seq(Seq(1L), Seq(2L), Seq(3L)))
    // ANSI empty-set semantics: ALL is vacuously true, ANY is false
    testSelect(
      "SELECT order_id FROM orders WHERE price > ALL (SELECT price FROM orders WHERE item_id == 99) ORDER BY order_id",
      Seq(Seq(1L), Seq(2L), Seq(3L)))
    testSelect(
      "SELECT order_id FROM orders WHERE price > ANY (SELECT price FROM orders WHERE item_id == 99) ORDER BY order_id",
      Seq.empty)
    // CORRELATED quantified (r12): lowers through the same per-key
    // bounded min/max/count aggregate, LEFT-joined on the correlation
    // equality — still never a row-count-shaped rescan
    testSelect( // per-user min price: only order 2 beats its user's min
      "SELECT order_id FROM orders o WHERE price > ANY (SELECT price FROM orders WHERE user_id = o.user_id) ORDER BY order_id",
      Seq(Seq(2L)))
    testSelect( // per-user max: orders at their user's max price
      "SELECT order_id FROM orders o WHERE price >= ALL (SELECT price FROM orders WHERE user_id = o.user_id) ORDER BY order_id",
      Seq(Seq(2L), Seq(3L)))
    testSelect( // correlated <> ALL: per-user anti join (no order differs
      // from every price of its own user — each contributes its own)
      "SELECT order_id FROM orders o WHERE price <> ALL (SELECT price FROM orders WHERE user_id = o.user_id) ORDER BY order_id",
      Seq.empty)
    testSelect( // correlated ANY against a per-user EMPTY set → FALSE
      "SELECT order_id FROM orders o WHERE price > ANY (SELECT price FROM orders WHERE user_id = o.user_id AND item_id == 99) ORDER BY order_id",
      Seq.empty)
    testSelect( // correlated ALL against a per-user EMPTY set → TRUE
      "SELECT order_id FROM orders o WHERE price > ALL (SELECT price FROM orders WHERE user_id = o.user_id AND item_id == 99) ORDER BY order_id",
      Seq(Seq(1L), Seq(2L), Seq(3L)))
    // prints and re-parses
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT order_id FROM orders WHERE price > ANY (SELECT price FROM orders)"))
    assert(printed.contains("> ANY"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("quantified ANY/ALL: ANSI NULL semantics (review findings r11)") {
    // subquery {10.0, NULL, NULL}: ALL is UNKNOWN for every row (a NULL
    // comparison can never be proven), ANY decides on the non-null value
    testSelect(
      """SELECT order_id FROM orders
        |WHERE price > ALL (SELECT CASE WHEN interests == "fishing" THEN 10.0 END FROM users)
        |ORDER BY order_id""".stripMargin,
      Seq.empty)
    testSelect(
      """SELECT order_id FROM orders
        |WHERE price > ANY (SELECT CASE WHEN interests == "fishing" THEN 10.0 END FROM users)
        |ORDER BY order_id""".stripMargin,
      Seq(Seq(1L), Seq(2L), Seq(3L)))
    // <> ALL with a NULL in the set: UNKNOWN for every row (ANSI NOT IN)
    testSelect(
      """SELECT order_id FROM orders
        |WHERE price != ALL (SELECT CASE WHEN interests == "fishing" THEN 99.0 END FROM users)
        |ORDER BY order_id""".stripMargin,
      Seq.empty)
    // all-NULL set behaves like the mixed case for ALL (still UNKNOWN)
    testSelect(
      """SELECT order_id FROM orders
        |WHERE price >= ALL (SELECT CASE WHEN user_id == "none" THEN 1.0 END FROM users)""".stripMargin,
      Seq.empty)
    // quantified comparisons PROJECT as 3VL values too (r12): prices
    // are 22.5, 37.5, 22.5 — only the max fails `> ANY`
    testSelect(
      """SELECT order_id, price > ANY (SELECT price FROM orders) AS q
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, false), Seq(2L, true), Seq(3L, false)))
    // `>= ALL` projected: only the max passes
    testSelect(
      """SELECT order_id, price >= ALL (SELECT price FROM orders) AS q
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, false), Seq(2L, true), Seq(3L, false)))
    // a NULL in the set turns a no-decision verdict UNKNOWN: x > ALL
    // {nulls} is NULL unless the extremum already decides FALSE
    testSelect(
      """SELECT order_id, price > ALL (SELECT referral_count FROM users WHERE interests IS NULL) AS q,
        |  price <= ALL (SELECT CASE WHEN referral_count > 50 THEN referral_count END FROM users) AS r
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, true, null), Seq(2L, true, null), Seq(3L, true, null)))
    // in ORDER BY the quantified verdict attaches as a hidden column
    // on the pre-projection frame and sorts (r13 — this replaced the
    // r12 refusal): FALSE rows first under ASC, tiebreak by order_id
    testSelect(
      """SELECT order_id FROM orders
        |ORDER BY price > ANY (SELECT price FROM orders), order_id""".stripMargin,
      Seq(Seq(1L), Seq(3L), Seq(2L)))
  }

  test("subquery edges (review findings r12)") {
    // a NULL scalar-subquery result stays ANSI-NULL through the
    // comparison (3VL), it must NOT collapse into the dialect's
    // literal-NULL idiom `x == NULL ≙ IS NULL` (fuzz find): the empty
    // max() gives every row NULL, never TRUE/FALSE
    testSelect(
      """SELECT order_id, price = (SELECT max(price) FROM orders WHERE price > 1000) AS m
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, null), Seq(2L, null), Seq(3L, null)))
    // …while the literal spelling keeps reference parity: == NULL is
    // the IS NULL test
    testSelect(
      "SELECT order_id FROM orders WHERE price == NULL ORDER BY order_id",
      Seq.empty)
    // <> ANY with a NULL LEFT operand: UNKNOWN, row drops — the r11
    // shortcut (`mn <> mx` decides without looking at x) kept it
    testSelect(
      """SELECT order_id FROM orders
        |WHERE (CASE WHEN order_id == 1 THEN NULL ELSE price END) != ANY (SELECT price FROM orders)
        |ORDER BY order_id""".stripMargin,
      Seq(Seq(2L), Seq(3L)))
    // correlated IN with GROUP BY + HAVING: correlation keys append to
    // the grouping, HAVING evaluates per (user key × correlation) group
    testSelect( // every per-(item,user) group max: all three orders match their own
      """SELECT order_id FROM orders o
        |WHERE price IN (SELECT max(price) FROM orders WHERE user_id = o.user_id GROUP BY item_id HAVING count(*) >= 1)
        |ORDER BY order_id""".stripMargin,
      Seq(Seq(1L), Seq(2L), Seq(3L)))
    testSelect( // no (item,user) group has 2+ rows → empty set, IN is false
      """SELECT order_id FROM orders o
        |WHERE price IN (SELECT max(price) FROM orders WHERE user_id = o.user_id GROUP BY item_id HAVING count(*) >= 2)
        |ORDER BY order_id""".stripMargin,
      Seq.empty)
    // LATERAL aggregate over a NULL-keyed outer row: count comes back
    // 0 (empty group), not NULL — the join-back is null-safe
    testSelect(
      """SELECT u.user_id, l.n FROM users u,
        |LATERAL (SELECT count(*) AS n FROM users WHERE interests = u.interests) l
        |ORDER BY u.user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 1L), Seq("hT2impsOPUREcVPc", 1L),
        Seq("hT2impsabc345c", 0L)))
    // aggregate-valued correlated IN without explicit GROUP BY: one
    // per-slice aggregate (each order's price vs its user's max)
    testSelect(
      """SELECT order_id FROM orders o
        |WHERE price IN (SELECT max(price) FROM orders WHERE user_id = o.user_id)
        |ORDER BY order_id""".stripMargin,
      Seq(Seq(2L), Seq(3L)))
    // correlated EXISTS with HAVING (no GROUP BY): users with 2+ orders
    testSelect(
      """SELECT user_id FROM users u
        |WHERE EXISTS (SELECT 1 FROM orders WHERE user_id = u.user_id HAVING count(*) >= 2)
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM")))
    // …and its NOT EXISTS complement (users with fewer than 2 orders)
    testSelect(
      """SELECT user_id FROM users u
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE user_id = u.user_id HAVING count(*) >= 2)
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("hT2impsOPUREcVPc"), Seq("hT2impsabc345c")))
    // the ANSI COUNT-bug edge: HAVING count(*) == 0 must make EXISTS
    // true exactly for the ORDERLESS users (empty slice → count 0)
    testSelect(
      """SELECT user_id FROM users u
        |WHERE EXISTS (SELECT 1 FROM orders WHERE user_id = u.user_id HAVING count(*) == 0)
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("hT2impsOPUREcVPc"), Seq("hT2impsabc345c")))
    // correlated EXISTS with explicit GROUP BY + HAVING: a user with
    // some (user,item) group of 1+ orders above 30
    testSelect(
      """SELECT user_id FROM users u
        |WHERE EXISTS (SELECT 1 FROM orders WHERE user_id = u.user_id
        |  GROUP BY item_id HAVING max(price) > 30)
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM")))
    // CORRELATED scalar subquery in the SELECT list: the aggregate-
    // LATERAL rewrite — ANSI per-outer-row values, count 0 (not NULL)
    // for users with no orders, and usable inside arithmetic
    testSelect(
      """SELECT user_id,
        |  (SELECT count(*) FROM orders WHERE user_id = u.user_id) AS n,
        |  (SELECT max(price) FROM orders WHERE user_id = u.user_id) + 0.5 AS topp
        |FROM users u ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 2L, 38.0),
        Seq("hT2impsOPUREcVPc", 0L, null),
        Seq("hT2impsabc345c", 0L, null)))
    // …and an UNCORRELATED one alongside stays on the literal path
    testSelect(
      """SELECT order_id, (SELECT max(price) FROM orders) AS mx FROM orders
        |WHERE order_id == 1""".stripMargin,
      Seq(Seq(1L, 37.5)))
    // HAVING with an IN-subquery: shared WHERE machinery on the agg frame
    testSelect(
      """SELECT user_id, count(*) AS n FROM orders GROUP BY user_id
        |HAVING user_id IN (SELECT user_id FROM users WHERE interests == "fishing")
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 2L)))
    // HAVING with NOT EXISTS (correlated against a group key)
    testSelect(
      """SELECT user_id, count(*) AS n FROM orders o GROUP BY user_id
        |HAVING NOT EXISTS (SELECT 1 FROM users WHERE users.user_id = o.user_id)
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("abcabcabc", 1L)))
    // HAVING with a correlated scalar comparison on an aggregate
    testSelect(
      """SELECT user_id, sum(price) AS tot FROM orders o GROUP BY user_id
        |HAVING sum(price) > (SELECT max(referral_count) FROM users WHERE user_id = o.user_id)
        |ORDER BY user_id""".stripMargin,
      Seq.empty)
  }

  test("subquery expressions as values: ANSI 3VL in any position (r12)") {
    // correlated EXISTS projected as a boolean column
    testSelect(
      """SELECT order_id, EXISTS (SELECT 1 FROM users WHERE users.user_id = o.user_id) AS known
        |FROM orders o ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, true), Seq(2L, true), Seq(3L, false)))
    // IN against a set CONTAINING NULLs with no match: verdict NULL,
    // never FALSE (x might equal the NULL member)
    testSelect(
      """SELECT order_id, user_id IN (SELECT interests FROM users) AS m
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, null), Seq(2L, null), Seq(3L, null)))
    // NOT IN under OR in WHERE — disjunctive membership keeps 3VL
    testSelect(
      """SELECT order_id FROM orders
        |WHERE user_id NOT IN (SELECT user_id FROM users) OR price > 30
        |ORDER BY order_id""".stripMargin,
      Seq(Seq(2L), Seq(3L)))
    // NULL left operand IN a nonempty set: UNKNOWN → the OR cannot
    // rescue it and the row drops
    testSelect(
      """SELECT order_id FROM orders
        |WHERE (CASE WHEN order_id == 3 THEN NULL ELSE user_id END)
        |  IN (SELECT user_id FROM users) OR price > 100
        |ORDER BY order_id""".stripMargin,
      Seq(Seq(1L), Seq(2L)))
    // EMPTY set: IN → FALSE and NOT IN → TRUE, even for a NULL x
    testSelect(
      """SELECT order_id,
        |  user_id IN (SELECT user_id FROM users WHERE referral_count > 1000) AS m,
        |  (CASE WHEN order_id == 1 THEN NULL ELSE user_id END)
        |    NOT IN (SELECT user_id FROM users WHERE referral_count > 1000) AS nm
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, false, true), Seq(2L, false, true), Seq(3L, false, true)))
    // a bare * never leaks the hidden subquery plumbing columns
    testSelect(
      """SELECT *, EXISTS (SELECT 1 FROM users WHERE users.user_id = o.user_id) AS known
        |FROM orders o WHERE order_id == 3""".stripMargin,
      Seq(Seq(3L, "abcabcabc", 1L, 22.50, ts("2013-10-24 17:29:39.738"), 82L, false)))
    // uncorrelated EXISTS as a value; scalar nested in SELECT CASE
    testSelect(
      """SELECT order_id,
        |  EXISTS (SELECT 1 FROM users WHERE referral_count > 50) AS any_big,
        |  CASE WHEN price >= (SELECT avg(price) FROM orders) THEN 'hi' ELSE 'lo' END AS band
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, true, "lo"), Seq(2L, true, "hi"), Seq(3L, true, "lo")))
  }

  test("subqueries in ORDER BY / QUALIFY / column guards (r13)") {
    // correlated scalar in ORDER BY decides the order — exact rows
    // (the oracle hash is order-insensitive, so ordering bugs are
    // pinned HERE; see oracle-parity-idioms)
    testSelect(
      """SELECT order_id FROM orders
        |ORDER BY (SELECT count(*) FROM users WHERE users.user_id = orders.user_id) DESC, order_id DESC""".stripMargin,
      Seq(Seq(2L), Seq(1L), Seq(3L)))
    // uncorrelated scalar in ORDER BY (lazy in-plan broadcast)
    testSelect(
      """SELECT order_id FROM orders
        |ORDER BY (SELECT max(price) FROM orders) - price, order_id""".stripMargin,
      Seq(Seq(2L), Seq(1L), Seq(3L)))
    // ORDER BY subquery + select-list window: the hidden verdict
    // column rides the __wsort carry (sort ABOVE the window)
    testSelect(
      """SELECT order_id, row_number() OVER (ORDER BY order_id) AS rk FROM orders
        |ORDER BY (SELECT count(*) FROM users WHERE users.user_id = orders.user_id), order_id""".stripMargin,
      Seq(Seq(3L, 3), Seq(1L, 1), Seq(2L, 2)))
    // DISTINCT + ORDER BY subquery: hidden-carry through the dedup
    testSelect(
      """SELECT DISTINCT price FROM orders
        |ORDER BY (SELECT max(order_id) FROM orders o2 WHERE o2.price = orders.price) DESC""".stripMargin,
      Seq(Seq(22.50), Seq(37.50)))
    // QUALIFY with a scalar subquery, no window (hoists to the
    // pre-projection frame as a hidden verdict column)
    testSelect(
      """SELECT order_id FROM orders
        |QUALIFY price < (SELECT avg(price) FROM orders) ORDER BY order_id""".stripMargin,
      Seq(Seq(1L), Seq(3L)))
    // QUALIFY EXISTS on the AGGREGATE frame (post-agg attach)
    testSelect(
      """SELECT user_id, count(*) AS n FROM orders GROUP BY user_id
        |QUALIFY EXISTS (SELECT 1 FROM users WHERE users.user_id = orders.user_id)""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 2L)))
    // column guard with a scalar subquery (`col IF expr`)
    testSelect(
      """SELECT order_id, price IF price > (SELECT avg(price) FROM orders) AS rich
        |FROM orders ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, null), Seq(2L, 37.50), Seq(3L, null)))
    // ORDER BY subquery on the aggregate path (post-agg attach)
    testSelect(
      """SELECT user_id, count(*) AS n FROM orders GROUP BY user_id
        |ORDER BY (SELECT count(*) FROM users WHERE users.user_id = orders.user_id), user_id""".stripMargin,
      Seq(Seq("abcabcabc", 1L), Seq("9Ip1aKbeZe2njCDM", 2L)))
  }

  test("SELECT * with a correlated SELECT scalar never leaks the lateral (r12 ADVICE)") {
    // the substituted lateral's __ssqv_N hidden value column must not
    // ride a bare-star expansion into the output (nor join DISTINCT's
    // dedup keys)
    testSelect(
      """SELECT *, (SELECT max(price) FROM orders o2 WHERE o2.user_id = orders.user_id) AS m
        |FROM orders WHERE order_id == 1""".stripMargin,
      Seq(Seq(1L, "9Ip1aKbeZe2njCDM", 1L, 22.50, ts("2012-12-24 17:29:39.738"), 82L, 37.50)))
    testSelect(
      """SELECT DISTINCT *, (SELECT max(price) FROM orders o2 WHERE o2.user_id = orders.user_id) AS m
        |FROM orders WHERE order_id == 1""".stripMargin,
      Seq(Seq(1L, "9Ip1aKbeZe2njCDM", 1L, 22.50, ts("2012-12-24 17:29:39.738"), 82L, 37.50)))
    // star MODIFIERS expand from the same plumbing-free schema
    testSelect(
      """SELECT * EXCLUDE (order_date, item_count, item_id),
        |  (SELECT max(price) FROM orders o2 WHERE o2.user_id = orders.user_id) AS m
        |FROM orders WHERE order_id == 1""".stripMargin,
      Seq(Seq(1L, "9Ip1aKbeZe2njCDM", 22.50, 37.50)))
  }

  test("placeholder args: queryArgsConvert parity (r12, sqldriver.go:352-390)") {
    val s = session
    def ids(df: DataFrame): Seq[Long] = df.collect().map(_.getLong(0)).toSeq
    // positional ? substitution: string + number
    assert(ids(s.sql(
      "SELECT order_id FROM orders WHERE user_id = ? AND price > ? ORDER BY order_id",
      Seq("9Ip1aKbeZe2njCDM", 25L))) == Seq(2L))
    // float renders in e-notation and still compares correctly
    assert(ids(s.sql(
      "SELECT order_id FROM orders WHERE price = ? ORDER BY order_id",
      Seq(22.5d))) == Seq(1L, 3L))
    // bool renders 1/0; NULL renders NULL (comparison → UNKNOWN → empty)
    assert(ids(s.sql(
      "SELECT order_id FROM orders WHERE price = ? ORDER BY order_id",
      Seq(null))).isEmpty)
    // injection-shaped strings stay VALUES: the quote is escaped inside
    // one literal, never a second statement / always-true predicate
    assert(ids(s.sql(
      "SELECT order_id FROM orders WHERE user_id = ? ORDER BY order_id",
      Seq("x' OR '1'='1"))).isEmpty)
    // more args than placeholders → the reference's exact message
    val e1 = intercept[Exception](s.sql(
      "SELECT order_id FROM orders WHERE price > ?", Seq(1L, 2L)))
    assert(e1.getMessage.contains(
      "number of parameters doesn't match number of placeholders"), e1.getMessage)
    // pre-existing quotes in a parameterized text are refused (the
    // reference's sanitization guard, loud here)
    val e2 = intercept[Exception](s.sql(
      "SELECT order_id FROM orders WHERE user_id = 'abc' AND price > ?", Seq(1L)))
    assert(e2.getMessage.contains("quote"), e2.getMessage)
    // timestamp rendering round-trips through the dialect's time parser
    assert(ids(s.sql(
      "SELECT order_id FROM orders WHERE order_date = ? ORDER BY order_id",
      Seq(java.sql.Timestamp.valueOf("2012-12-24 17:29:39.738")))) == Seq(1L))
  }

  test("MERGE NOT MATCHED resolves bare shared names source-first (r12)") {
    val s = new GraftSession(spark)
    import org.apache.spark.sql.Row
    val inv = spark.createDataFrame(
      java.util.List.of(Row(1L, 10L)),
      StructType(Seq(StructField("sku", LongType), StructField("amount", LongType))))
    s.registerTable("inv2", inv)
    // bare `sku`/`amount` in the INSERT VALUES are names BOTH tables
    // carry — the NOT MATCHED frame is source-only, so they must
    // resolve to the source columns without qualification
    s.sql("""MERGE INTO inv2 t USING (VALUES (1, 5), (2, 7)) AS d(sku, amount)
      |ON t.sku == d.sku
      |WHEN MATCHED THEN UPDATE SET amount = t.amount + d.amount
      |WHEN NOT MATCHED AND amount > 0 THEN INSERT (sku, amount) VALUES (sku, amount)""".stripMargin)
    val out = s.sql("SELECT sku, amount FROM inv2 ORDER BY sku")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 15L), (2L, 7L)), out)
    s.sql("DROP TABLE inv2")
  }

  test("QUALIFY/ORDER BY window edges (review findings r11)") {
    // agg path: QUALIFY inline window + ORDER BY the AGGREGATE ALIAS —
    // the re-sort must use the projected column, not re-expand count(*)
    testSelect(
      """SELECT user_id, count(*) AS n FROM orders GROUP BY user_id
        |QUALIFY row_number() OVER (ORDER BY n DESC, user_id) <= 2 ORDER BY n DESC, user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 2L), Seq("abcabcabc", 1L)))
    // inline window in ORDER BY with a window-free select list
    testSelect(
      "SELECT order_id FROM orders ORDER BY row_number() OVER (ORDER BY price DESC, order_id) LIMIT 2",
      Seq(Seq(2L), Seq(1L)))
    // mixed QUALIFY: window conjunct AND an UNPROJECTED source column
    testSelect(
      """SELECT order_id FROM orders
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY price DESC, order_id) == 1 AND price > 30
        |ORDER BY order_id""".stripMargin,
      Seq(Seq(2L)))
    // DISTINCT + QUALIFY on a select-window ALIAS stays on the plain
    // post-projection path (no inline window in the raw predicate)
    testSelect(
      """SELECT DISTINCT user_id, row_number() OVER (PARTITION BY user_id ORDER BY price DESC, order_id) AS rk
        |FROM orders QUALIFY rk == 1 ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 1L), Seq("abcabcabc", 1L)))
    // IS DISTINCT FROM goes through the dialect coercion matrix like `=`
    testSelect(
      "SELECT order_id FROM orders WHERE price IS NOT DISTINCT FROM \"22.5\" ORDER BY order_id",
      Seq(Seq(1L), Seq(3L)))
    // inline ORDER BY windows + DISTINCT (r12, DuckDB semantics): the
    // window evaluates over the PRE-distinct rows as a hidden carry —
    // a per-selected-key extremum gives a deterministic replay
    testSelect(
      """SELECT DISTINCT user_id FROM orders
        |ORDER BY max(price) OVER (PARTITION BY user_id) DESC""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM"), Seq("abcabcabc")))
    testSelect(
      """SELECT DISTINCT user_id FROM orders
        |ORDER BY sum(price) OVER (PARTITION BY user_id) ASC, user_id""".stripMargin,
      Seq(Seq("abcabcabc"), Seq("9Ip1aKbeZe2njCDM")))
    // TABLESAMPLE over a VALUES source prints and re-parses
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT a FROM (VALUES (1), (2)) AS t(a) TABLESAMPLE (100 PERCENT) ON (a)"))
    assert(printed.contains("TABLESAMPLE (100 PERCENT) ON (a)"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("aggregate FILTER (WHERE …) desugars to a guarded aggregate") {
    testSelect(
      """SELECT count(*) AS n, count(*) FILTER (WHERE price > 30) AS n_big,
        |  sum(item_count) FILTER (WHERE item_id == 1) AS ic,
        |  count(DISTINCT(user_id)) FILTER (WHERE price < 30) AS u_small
        |FROM orders""".stripMargin,
      Seq(Seq(3L, 1L, 164L, 2L)))
    // grouped: the filter applies per group; empty filter bucket is NULL
    // for sum/max and 0 for count
    testSelect(
      """SELECT user_id, count(*) FILTER (WHERE price > 30) AS n_big,
        |  max(price) FILTER (WHERE price > 100) AS mx
        |FROM orders GROUP BY user_id ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 1L, null), Seq("abcabcabc", 0L, null)))
    // FILTER demands an aggregate
    val e = intercept[Exception](graft.rel.SqlParser.parse(
      "SELECT upper(email) FILTER (WHERE true) FROM users"))
    assert(e.getMessage.contains("requires an aggregate"), e.getMessage)
    // prints in desugared CASE form and re-parses
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT count(*) FILTER (WHERE price > 30) AS n FROM orders"))
    assert(printed.toUpperCase.contains("CASE WHEN"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("ORDER BY sorts ABOVE window evaluation (regression: pre-window sort destroyed)") {
    // the Window operator's partition exchange used to destroy the
    // pre-projection sort: output arrived partition-ordered, and a
    // LIMIT kept wrong rows. The sort must plan above the Window.
    val df = session.sql(
      """SELECT order_id, row_number() OVER (PARTITION BY user_id ORDER BY price) AS rk
        |FROM orders ORDER BY price DESC, order_id LIMIT 2""".stripMargin)
    assert(rows(df) == Seq(Seq(2L, 2L), Seq(1L, 1L)))
    // unprojected sort key (price) rides hidden and drops after sorting;
    // the sort+limit collapses to a top-k heap ABOVE the Window
    assert(df.columns.toSeq == Seq("order_id", "rk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("named WINDOW clause: one definition shared by references") {
    testSelect(
      """SELECT user_id, order_id, row_number() OVER w AS rk
        |FROM orders
        |WINDOW w AS (PARTITION BY user_id ORDER BY price DESC, order_id)
        |QUALIFY rk == 1 ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 2L, 1L), Seq("abcabcabc", 3L, 1L)))
    // two names, both resolved
    testSelect(
      """SELECT order_id, row_number() OVER w AS rk, sum(price) OVER v AS run
        |FROM orders
        |WINDOW w AS (ORDER BY price DESC, order_id), v AS (PARTITION BY user_id ORDER BY order_id)
        |ORDER BY order_id""".stripMargin,
      Seq(Seq(1L, 2L, 22.50), Seq(2L, 1L, 60.00), Seq(3L, 3L, 22.50)))
    val unknown = intercept[Exception](graft.rel.SqlParser.parse(
      "SELECT row_number() OVER w AS rk FROM orders"))
    assert(unknown.getMessage.contains("unknown window"), unknown.getMessage)
    val dup = intercept[Exception](graft.rel.SqlParser.parse(
      "SELECT row_number() OVER w AS rk FROM orders WINDOW w AS (ORDER BY order_id), w AS (ORDER BY price)"))
    assert(dup.getMessage.contains("duplicate window"), dup.getMessage)
    // prints in substituted (inline OVER) form and re-parses
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT row_number() OVER w AS rk FROM orders WINDOW w AS (PARTITION BY user_id ORDER BY order_id)"))
    assert(printed.contains("OVER (PARTITION BY user_id ORDER BY order_id"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("EXTRACT(part FROM ts), date_trunc, TRY_CAST") {
    // reg_date 2012-10-17 is a Wednesday → DOW 3 (DuckDB Sunday = 0)
    testSelect(
      """SELECT EXTRACT(YEAR FROM reg_date) AS y, EXTRACT(DOW FROM reg_date) AS dw,
        |  EXTRACT(QUARTER FROM reg_date) AS q
        |FROM users WHERE user_id == "9Ip1aKbeZe2njCDM"""".stripMargin,
      Seq(Seq(2012L, 3L, 4L)))
    // the reference's comma form extract(ts, fmt) still parses (strftime)
    testSelect(
      "SELECT extract(reg_date, \"%Y\") AS y FROM users WHERE user_id == \"9Ip1aKbeZe2njCDM\"",
      Seq(Seq("2012")))
    testSelect( // try_cast: NULL on malformed, value on clean
      "SELECT try_cast(email AS bigint) AS bad, try_cast(referral_count AS bigint) AS ok FROM users ORDER BY user_id",
      Seq(Seq(null, 82L), Seq(null, 12L), Seq(null, 12L)))
    testSelect(
      "SELECT cast(date_trunc(\"year\", reg_date) AS date) AS ys FROM users ORDER BY user_id",
      Seq(Seq(java.sql.Date.valueOf("2012-01-01")),
          Seq(java.sql.Date.valueOf("2009-01-01")),
          Seq(java.sql.Date.valueOf("2009-01-01"))))
  }

  test("inline windows in QUALIFY, nested window arithmetic, OVER-in-ORDER-BY") {
    // no select alias needed; the ranking may use unprojected columns
    testSelect(
      """SELECT user_id, order_id FROM orders
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY price DESC, order_id) == 1
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 2L), Seq("abcabcabc", 3L)))
    // ANSI: QUALIFY filters AFTER window computation — the select
    // window's values are from the UNFILTERED frame
    testSelect(
      """SELECT order_id, row_number() OVER (ORDER BY order_id) AS rn FROM orders
        |QUALIFY row_number() OVER (ORDER BY order_id DESC) == 1 ORDER BY order_id""".stripMargin,
      Seq(Seq(3L, 3L)))
    // windows compose in expressions now (hook binds OVER inside parseExpr)
    testSelect(
      "SELECT order_id, row_number() OVER (ORDER BY order_id) * 10 AS rk10 FROM orders ORDER BY order_id",
      Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 30L)))
    // named WINDOW refs resolve inside QUALIFY too
    testSelect(
      """SELECT user_id, order_id FROM orders
        |WINDOW w AS (PARTITION BY user_id ORDER BY price DESC, order_id)
        |QUALIFY row_number() OVER w == 1 ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 2L), Seq("abcabcabc", 3L)))
    // DISTINCT + inline-window QUALIFY (r12, DuckDB semantics): the
    // window evaluates pre-distinct, QUALIFY filters, THEN the dedup
    testSelect(
      """SELECT DISTINCT user_id FROM orders
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY price) == 1
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM"), Seq("abcabcabc")))
    // …and a filter that drops a whole partition pre-dedup
    testSelect(
      """SELECT DISTINCT user_id FROM orders
        |QUALIFY sum(price) OVER (PARTITION BY user_id) > 30 ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM")))
    // the AGGREGATE path hoists too (top-1 group by count), ORDER BY
    // re-established above the hoisted window
    testSelect(
      """SELECT user_id, count(*) AS n FROM orders GROUP BY user_id
        |QUALIFY row_number() OVER (ORDER BY n DESC, user_id) == 1 ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 2L)))
  }

  test("TABLESAMPLE: deterministic md5-keyed sampling, stable across runs") {
    val a = rows(session.sql(
      "SELECT order_id FROM orders TABLESAMPLE (50 PERCENT) ON (order_id) ORDER BY order_id"))
    val b = rows(session.sql(
      "SELECT order_id FROM orders TABLESAMPLE (50 PERCENT) ON (order_id) ORDER BY order_id"))
    assert(a == b, "sample must be reproducible") // content-addressed, not random
    assert(a.nonEmpty && a.length < 3, a.toString) // a strict, non-empty subset here
    // 100 percent keeps everything, 0 keeps nothing
    assert(rows(session.sql(
      "SELECT order_id FROM orders TABLESAMPLE (100 PERCENT) ON (order_id)")).length == 3)
    assert(rows(session.sql(
      "SELECT order_id FROM orders TABLESAMPLE (0 PERCENT) ON (order_id)")).isEmpty)
    // prints and re-parses
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT order_id FROM orders TABLESAMPLE (2.5 PERCENT) ON (order_id)"))
    assert(printed.contains("TABLESAMPLE (2.5 PERCENT) ON (order_id)"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("INTERVAL literals: timestamp arithmetic, comparisons, refusals") {
    testSelect(
      """SELECT cast(reg_date + INTERVAL 1 DAY AS date) AS d FROM users
        |WHERE user_id == "9Ip1aKbeZe2njCDM"""".stripMargin,
      Seq(Seq(java.sql.Date.valueOf("2012-10-18"))))
    testSelect( // negative and plural units
      """SELECT cast(reg_date - INTERVAL 12 HOURS AS date) AS d FROM users
        |WHERE user_id == "9Ip1aKbeZe2njCDM"""".stripMargin,
      Seq(Seq(java.sql.Date.valueOf("2012-10-17"))))
    // a bare `interval` identifier still parses as a column name
    val st = graft.rel.SqlParser.parse("SELECT interval FROM t")
    assert(graft.rel.SqlWriter.toSql(st).contains("interval"))
    val e = intercept[Exception](session.sql(
      "SELECT reg_date + INTERVAL 3 PARSECS AS x FROM users").collect())
    assert(e.getMessage.contains("unsupported interval"), e.getMessage)
  }

  test("grouping() under ROLLUP and the ANSI null scalars") {
    testSelect(
      "SELECT user_id, grouping(user_id) AS g, count(*) AS n FROM orders GROUP BY ROLLUP(user_id) ORDER BY user_id, g",
      Seq(Seq(null, 1L, 3L), Seq("9Ip1aKbeZe2njCDM", 0L, 2L), Seq("abcabcabc", 0L, 1L)))
    testSelect( // coalesce + nullif compose; NULL input stays NULL
      "SELECT coalesce(nullif(interests, \"fishing\"), \"none\") AS i FROM users ORDER BY user_id",
      Seq(Seq("none"), Seq("swimming"), Seq("none")))
    testSelect(
      "SELECT greatest(referral_count, 50) AS g, least(referral_count, 50) AS l FROM users ORDER BY user_id",
      Seq(Seq(82L, 50L), Seq(50L, 12L), Seq(50L, 12L)))
  }

  test("IS [NOT] DISTINCT FROM: null-safe comparison") {
    // interests: fishing / swimming / NULL — NULL IS DISTINCT FROM a
    // value (unlike <>, which would drop the NULL row)
    testSelect(
      "SELECT user_id FROM users WHERE interests IS DISTINCT FROM \"fishing\" ORDER BY user_id",
      Seq(Seq("hT2impsOPUREcVPc"), Seq("hT2impsabc345c")))
    testSelect(
      "SELECT user_id FROM users WHERE interests IS NOT DISTINCT FROM NULL ORDER BY user_id",
      Seq(Seq("hT2impsabc345c")))
    testSelect( // both sides non-null: plain equality semantics
      "SELECT user_id FROM users WHERE interests IS NOT DISTINCT FROM \"fishing\"",
      Seq(Seq("9Ip1aKbeZe2njCDM")))
    val printed = graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(
      "SELECT user_id FROM users WHERE interests IS NOT DISTINCT FROM \"fishing\""))
    assert(printed.contains("IS NOT DISTINCT FROM"), printed)
    assert(graft.rel.SqlWriter.toSql(graft.rel.SqlParser.parse(printed)) == printed)
  }

  test("reference README flagship demo (user UDF + funcs in select/where)") {
    // README.md:127-213 / examples/qlcsv: register a custom function via
    // the expr.FuncAdd surface, then use it in WHERE with builtins in
    // the projection
    graft.expr.FuncRegistry.add("email_is_valid",
      returnType = Some(BooleanType))(a =>
      org.apache.spark.sql.functions.regexp_like(
        a.head.cast(StringType),
        org.apache.spark.sql.functions.lit("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$")))
    testSelect(
      """SELECT user_id, email, referral_count * 2 AS rc2, yy(reg_date) > 10 AS y
        |FROM users WHERE email_is_valid(email) ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", "aaron@email.com", 164L, true),
          Seq("hT2impsOPUREcVPc", "bob@email.com", 24L, false)))
  }

  test("golden suite exact shapes (testutil/testsuite.go:65-152)") {
    testSelect("select 1;", Seq(Seq(1L)))
    testSelect("select 1, \"hello\";", Seq(Seq(1L, "hello")))
    testSelect("select exists(email), email FROM users WHERE yy(reg_date) > 10;",
      Seq(Seq(true, "aaron@email.com")))
    testSelect(
      "SELECT user_id FROM users WHERE (`users.user_id` != NULL) ORDER BY user_id",
      Seq(Seq("9Ip1aKbeZe2njCDM"), Seq("hT2impsOPUREcVPc"), Seq("hT2impsabc345c")))
    testSelect("SELECT email FROM users WHERE (`users`.`email` like \"%aaron%\");",
      Seq(Seq("aaron@email.com")))
    testSelect("SELECT COUNT(*) AS count FROM users WHERE (`users.user_id` != NULL)",
      Seq(Seq(3L)))
    testSelect("select `users`.`user_id` AS userids FROM users " +
      "WHERE email = \"aaron@email.com\" GROUP BY `users`.`user_id`;",
      Seq(Seq("9Ip1aKbeZe2njCDM")))
    // COUNT(DISTINCT(x)): computed correctly — the reference returns 0
    // (its issue #56), a documented divergence
    testSelect("SELECT COUNT(DISTINCT(`users.email`)) AS cd FROM users", Seq(Seq(3L)))
    testSelect("SELECT email FROM users ORDER BY email DESC",
      Seq(Seq("not_an_email_2"), Seq("bob@email.com"), Seq("aaron@email.com")))
    testSelect("SELECT email FROM users ORDER BY email ASC",
      Seq(Seq("aaron@email.com"), Seq("bob@email.com"), Seq("not_an_email_2")))
    // mixed star/func/literal projection
    val mixed = rows(session.sql(
      "SELECT *, emaildomain(email), contains(email,\"aaron\"), 5 FROM users " +
      "WHERE email = \"aaron@email.com\""))
    assert(mixed.size == 1)
    assert(mixed.head.takeRight(3) == Seq("email.com", true, 5L), mixed.head)
    // schema-aware: unknown column errors
    testSelectErr("SELECT email, non_existent_field FROM users ORDER BY email ASC")
  }

  test("select with func in where") {
    testSelect(
      "SELECT user_id, email FROM users WHERE yy(reg_date) > 10 ORDER BY user_id",
      Seq(Seq("9Ip1aKbeZe2njCDM", "aaron@email.com")))
  }

  test("not-null idiom and exists") {
    testSelect("SELECT user_id FROM users WHERE interests != NULL ORDER BY user_id",
      Seq(Seq("9Ip1aKbeZe2njCDM"), Seq("hT2impsOPUREcVPc")))
    testSelect("SELECT user_id FROM users WHERE EXISTS interests ORDER BY user_id",
      Seq(Seq("9Ip1aKbeZe2njCDM"), Seq("hT2impsOPUREcVPc")))
  }

  test("glob like") {
    testSelect("SELECT user_id FROM users WHERE email LIKE \"%bob%\"",
      Seq(Seq("hT2impsOPUREcVPc")))
    testSelect("SELECT user_id FROM users WHERE email LIKE \"aaron*\"",
      Seq(Seq("9Ip1aKbeZe2njCDM")))
  }

  test("star plus mixed projection") {
    val got = session.sql("SELECT *, string.uppercase(user_id) AS uid FROM users WHERE email = \"bob@email.com\"")
    assert(got.columns.toSeq == Seq("user_id", "email", "interests", "reg_date",
      "referral_count", "json_data", "uid"))
    assert(rows(got).head.last == "HT2IMPSOPURECVPC")
  }

  test("count and aggregates") {
    testSelect("SELECT COUNT(*) AS cnt FROM users", Seq(Seq(3L)))
    testSelect("SELECT count(*) AS cnt FROM users WHERE referral_count > 50", Seq(Seq(1L)))
    // nested funcs inside agg (testsuite.go: AVG(CHAR_LENGTH(CAST(email AS CHAR))))
    testSelect("SELECT AVG(CHAR_LENGTH(CAST(email AS CHAR))) AS a FROM users",
      Seq(Seq((15.0 + 13.0 + 14.0) / 3)))
    testSelect("SELECT sum(referral_count) AS s, avg(referral_count) AS a FROM users",
      Seq(Seq(106.0, 106.0 / 3)))
  }

  test("group by with alias and having") {
    testSelect(
      "SELECT referral_count AS rc, count(*) AS cnt FROM users GROUP BY referral_count ORDER BY rc",
      Seq(Seq(12L, 2L), Seq(82L, 1L)))
    testSelect(
      "SELECT referral_count AS rc, count(*) AS cnt FROM users GROUP BY referral_count HAVING count(*) > 1",
      Seq(Seq(12L, 2L)))
  }

  test("order by asc desc") {
    testSelect("SELECT user_id FROM users ORDER BY referral_count DESC, user_id ASC",
      Seq(Seq("9Ip1aKbeZe2njCDM"), Seq("hT2impsOPUREcVPc"), Seq("hT2impsabc345c")))
  }

  test("distinct, limit, offset") {
    testSelect("SELECT DISTINCT item_id FROM orders ORDER BY item_id", Seq(Seq(1L), Seq(2L)))
    testSelect("SELECT order_id FROM orders ORDER BY order_id LIMIT 2", Seq(Seq(1L), Seq(2L)))
    testSelect("SELECT order_id FROM orders ORDER BY order_id LIMIT 1 OFFSET 1", Seq(Seq(2L)))
    testSelect("SELECT order_id FROM orders ORDER BY order_id LIMIT 1, 1", Seq(Seq(2L)))
  }

  test("column guard IF") {
    // `col IF boolexpr` nullifies the column where guard is false
    testSelect(
      "SELECT user_id, email IF referral_count > 50 FROM users ORDER BY user_id",
      Seq(Seq("9Ip1aKbeZe2njCDM", "aaron@email.com"),
          Seq("hT2impsOPUREcVPc", null), Seq("hT2impsabc345c", null)))
  }

  test("inner join drops dangling keys") {
    // exec/sqldriver_test.go:75-117 — order 3 has no matching user
    testSelect(
      """SELECT u.user_id, o.order_id, o.price FROM users u
        |JOIN orders o ON u.user_id = o.user_id ORDER BY o.order_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 1L, 22.50), Seq("9Ip1aKbeZe2njCDM", 2L, 37.50)))
  }

  test("expression join keys") {
    // exec/sqldriver_test.go:119 — ON lower(t1.x) = lower(t2.x)
    testSelect(
      """SELECT o.order_id FROM users u
        |JOIN orders o ON tolower(u.user_id) = tolower(o.user_id)
        |ORDER BY o.order_id""".stripMargin,
      Seq(Seq(1L), Seq(2L)))
  }

  test("left join keeps unmatched") {
    testSelect(
      """SELECT u.user_id, o.order_id FROM users u
        |LEFT JOIN orders o ON u.user_id = o.user_id
        |ORDER BY u.user_id, o.order_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 1L), Seq("9Ip1aKbeZe2njCDM", 2L),
          Seq("hT2impsOPUREcVPc", null), Seq("hT2impsabc345c", null)))
  }

  test("subquery in FROM") {
    testSelect(
      """SELECT uid, cnt FROM
        |(SELECT user_id AS uid, count(*) AS cnt FROM orders GROUP BY user_id) x
        |WHERE cnt > 1""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 2L)))
  }

  test("IN subquery becomes semi join") {
    testSelect(
      "SELECT user_id FROM users WHERE user_id IN (SELECT user_id FROM orders) ORDER BY user_id",
      Seq(Seq("9Ip1aKbeZe2njCDM")))
    testSelect(
      "SELECT user_id FROM users WHERE user_id NOT IN (SELECT user_id FROM orders) ORDER BY user_id",
      Seq(Seq("hT2impsOPUREcVPc"), Seq("hT2impsabc345c")))
  }

  test("json builtin over table") {
    testSelect(
      "SELECT json.jmespath(json_data, \"name\") AS n FROM users ORDER BY user_id",
      Seq(Seq("aaron"), Seq("bob"), Seq("notbob")))
  }

  test("unknown column errors") {
    testSelectErr("SELECT nosuchcolumn FROM users")
    testSelectErr("SELECT user_id FROM users WHERE nosuchcolumn > 5")
  }

  test("session vars") {
    session.sql("SET @minref = 50")
    testSelect("SELECT user_id FROM users WHERE referral_count > @minref",
      Seq(Seq("9Ip1aKbeZe2njCDM")))
  }

  test("multi-statement script threads session state (TestSqlMultiStatement)") {
    // the reference's rel.ParseSqlStatements shape: SET then SELECT
    // using the var, in one call
    val parsed = graft.rel.SqlParser.parseStatements(
      """SET @var1 = "hello"; select a, b from accounts where name = @var1;""")
    assert(parsed.size == 2, parsed)
    assert(parsed.head.isInstanceOf[graft.rel.SqlSet], parsed.head)
    val sel = parsed(1).asInstanceOf[graft.rel.SqlSelect]
    assert(sel.columns.size == 2)
    assert(sel.from.head.asInstanceOf[graft.rel.TableSource].name == "accounts")
    // executed end-to-end against the engine
    val out = session.sqlScript(
      """SET @scriptref = 50; SELECT user_id FROM users WHERE referral_count > @scriptref;""")
    assert(rows(out) == Seq(Seq("9Ip1aKbeZe2njCDM")))
  }

  test("show and describe") {
    val t = rows(session.sql("SHOW TABLES")).map(_.head)
    assert(t.contains("users") && t.contains("orders"))
    val liked = rows(session.sql("SHOW TABLES LIKE \"use%\"")).map(_.head)
    assert(liked == Seq("users"))
    // MySQL DESCRIBE shape: Field/Type/Null/Key/Default/Extra (schema.go:31)
    val desc = session.sql("DESCRIBE users")
    assert(desc.columns.toSeq == Seq("Field", "Type", "Null", "Key", "Default", "Extra"))
    assert(rows(desc).map(_.head).contains("email"))
    val fullCols = session.sql("SHOW FULL COLUMNS FROM users")
    assert(fullCols.columns.toSeq == Seq("Field", "Type", "Collation", "Null",
      "Key", "Default", "Extra", "Privileges", "Comment"))
    // SHOW COLUMNS is LIKE/WHERE-filterable (plan/sql_rewrite.go:95-113)
    val emailCol = rows(session.sql("SHOW COLUMNS FROM users LIKE \"ema%\""))
    assert(emailCol.map(_.head) == Seq("email"))
    val whereCol = rows(session.sql("SHOW COLUMNS FROM users WHERE Field == \"user_id\""))
    assert(whereCol.map(_.head) == Seq("user_id"))
    val v = session.sql("SHOW VARIABLES")
    assert(rows(v).exists(_.head == "minref"))
    assert(rows(session.sql("SHOW VARIABLES LIKE \"minre%\"")).map(_.head) == Seq("minref"))
    assert(rows(session.sql("SHOW SESSION VARIABLES")).exists(_.head == "minref"))
    assert(rows(session.sql("SHOW GLOBAL VARIABLES")).exists(_.head == "minref"))
    val ft = rows(session.sql("SHOW FULL TABLES"))
    assert(ft.exists(r => r.head == "users" && r(1) == "BASE TABLE"))
  }

  test("jdbc source pushes filters to the database (sqlite source parity)") {
    // the reference's SQLite source rewrites statements for full pushdown
    // (datasource/sqlite/sqlrewrite.go); Spark's JDBC relation does the
    // same via DataSource pushdown. Derby ships with Spark — use its
    // in-memory mode as the stand-in database.
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE people(id INT, name VARCHAR(32), age INT)")
      st.execute("INSERT INTO people VALUES (1, 'ann', 41), (2, 'bo', 22), (3, 'cy', 35)")
    } finally conn.close()
    session.registerJdbc("people", "jdbc:derby:memory:graftdb", "people")
    val df = session.sql("SELECT name FROM people WHERE age > 30 ORDER BY name")
    assert(rows(df).map(_.head) == Seq("ann", "cy"))
    // pushdown gate: the WHERE must reach the JDBC scan, not a Spark filter
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.toUpperCase.contains("AGE"), plan)
  }

  test("ALTER accept-and-error parity (exec/ddl.go:150-159)") {
    val e = intercept[Exception](session.sql("ALTER TABLE users ADD COLUMN x varchar(10)"))
    assert(e.getMessage.contains("not implemented"), e.getMessage)
    assert(!e.getMessage.contains("unsupported statement start"))
  }

  test("DISTINCT with ORDER BY key not in the select list") {
    // referral_count is not projected: carry hidden, dedupe, sort, drop
    val df = session.sql(
      "SELECT DISTINCT email FROM users WHERE EXISTS email ORDER BY referral_count DESC")
    assert(df.columns.toSeq == Seq("email"))
    val got = rows(df).map(_.head)
    assert(got.nonEmpty && got.toSet.size == got.size)
    // still works when the key IS selected
    val df2 = session.sql("SELECT DISTINCT referral_count FROM users ORDER BY referral_count")
    val vals = rows(df2).map(_.head.asInstanceOf[Long])
    assert(vals == vals.sorted)
  }

  test("ddl and dml lifecycle") {
    session.sql("CREATE TABLE scratch AS SELECT user_id, referral_count FROM users")
    assert(rows(session.sql("SELECT count(*) AS c FROM scratch")) == Seq(Seq(3L)))
    session.sql("INSERT INTO scratch (user_id, referral_count) VALUES ('newbie', 7)")
    assert(rows(session.sql("SELECT count(*) AS c FROM scratch")) == Seq(Seq(4L)))
    session.sql("UPDATE scratch SET referral_count = 100 WHERE user_id = 'newbie'")
    assert(rows(session.sql("SELECT referral_count FROM scratch WHERE user_id = 'newbie'")) ==
      Seq(Seq(100L)))
    session.sql("UPSERT INTO scratch (user_id, referral_count) VALUES ('newbie', 8)")
    assert(rows(session.sql("SELECT referral_count FROM scratch WHERE user_id = 'newbie'")) ==
      Seq(Seq(8L)))
    session.sql("DELETE FROM scratch WHERE user_id = 'newbie'")
    assert(rows(session.sql("SELECT count(*) AS c FROM scratch")) == Seq(Seq(3L)))
    // DELETE … LIMIT removes at most n matching rows
    session.sql("INSERT INTO scratch (user_id, referral_count) VALUES ('d1', 1), ('d2', 2)")
    session.sql("DELETE FROM scratch WHERE referral_count < 100 LIMIT 1")
    assert(rows(session.sql("SELECT count(*) AS c FROM scratch")) == Seq(Seq(4L)))
    session.sql("DELETE FROM scratch WHERE user_id LIKE 'd%'")
    session.sql("DROP TABLE scratch")
    testSelectErr("SELECT * FROM scratch")
    // transaction keywords accepted and ignored
    session.sql("BEGIN"); session.sql("COMMIT"); session.sql("ROLLBACK")
  }

  test("DML WHERE accepts subqueries (r12, beyond ref)") {
    val s = session
    s.sql("CREATE TABLE scr2 AS SELECT order_id, user_id, price FROM orders")
    // DELETE … WHERE k IN (SELECT …): the CDC tombstone shape
    s.sql("""DELETE FROM scr2 WHERE user_id IN
      |(SELECT user_id FROM users WHERE interests == "fishing")""".stripMargin)
    assert(rows(s.sql("SELECT order_id FROM scr2 ORDER BY order_id")) ==
      Seq(Seq(3L))) // fishing = 9Ip… whose orders 1,2 are gone
    // UPDATE … WHERE NOT EXISTS (correlated — the surviving order's
    // user 'abcabcabc' is NOT a registered user)
    s.sql("""UPDATE scr2 SET price = 0 WHERE NOT EXISTS
      |(SELECT 1 FROM users WHERE user_id = scr2.user_id)""".stripMargin)
    assert(rows(s.sql("SELECT price FROM scr2")) == Seq(Seq(0.0)))
    // UPDATE with a scalar subquery in WHERE
    s.sql("UPDATE scr2 SET price = 9 WHERE price <= (SELECT min(price) FROM scr2)")
    assert(rows(s.sql("SELECT price FROM scr2")) == Seq(Seq(9.0)))
    // DELETE with quantified subquery
    s.sql("DELETE FROM scr2 WHERE price >= ALL (SELECT price FROM scr2)")
    assert(rows(s.sql("SELECT count(*) AS c FROM scr2")) == Seq(Seq(0L)))
    s.sql("DROP TABLE scr2")
  }

  test("correlated EXISTS with a NON-equality cross-scope conjunct (r15, fuzz_dml)") {
    // found live by scripts/fuzz_dml.py case dml0003: the extra
    // correlated comparison (`o.price > u.referral_count`-shaped) must
    // fold into the semi/anti join condition, not land unresolvable in
    // the inner WHERE. Orders: (1, 9Ip…, 22.5), (2, 9Ip…, 37.5),
    // (3, abcabcabc, 22.5); users 9Ip…/hT2… have referral_count 82/12.
    val s = session
    s.sql("CREATE TABLE scr4 AS SELECT user_id, referral_count FROM users")
    // equality + non-equality conjunct: users with SOME order priced
    // above their referral_count (9Ip…: 82 > both prices → no; hT2…:
    // no orders; only the invalid-email user has none either) — then
    // flip the comparison so 9Ip… qualifies
    assert(rows(s.sql(
      """SELECT user_id FROM scr4 WHERE EXISTS
        |(SELECT 1 FROM orders WHERE orders.user_id = scr4.user_id
        |   AND orders.price > scr4.referral_count)""".stripMargin)).isEmpty)
    s.sql("""DELETE FROM scr4 WHERE EXISTS
      |(SELECT 1 FROM orders WHERE orders.user_id = scr4.user_id
      |   AND orders.price < scr4.referral_count)""".stripMargin)
    assert(rows(s.sql("SELECT count(*) AS c FROM scr4")) == Seq(Seq(2L)))
    // pure non-equality correlation (no equality key): plans as the
    // nested-loop it is — correct verdict, loud plan
    assert(rows(s.sql(
      """SELECT count(*) AS c FROM scr4 WHERE EXISTS
        |(SELECT 1 FROM orders WHERE orders.price > scr4.referral_count)""".stripMargin))
      == Seq(Seq(2L))) // both survivors have referral_count 12 < some price
    s.sql("DROP TABLE scr4")
  }

  test("non-equality correlated EXISTS as a VALUE; other shapes refuse with a rewrite hint (r15)") {
    val s = session
    // expression position: the verdict is a row-id semi-join round
    // trip — cardinality must survive a non-equi condition matching
    // SEVERAL inner rows per outer row (every order beats 12)
    val got = rows(s.sql(
      """SELECT user_id,
        |  EXISTS (SELECT 1 FROM orders WHERE orders.user_id = users.user_id
        |            AND orders.price < users.referral_count) AS cheap,
        |  NOT EXISTS (SELECT 1 FROM orders
        |            WHERE orders.price > users.referral_count) AS rich
        |FROM users ORDER BY user_id""".stripMargin))
    assert(got.length == 3, got.toString) // one row per user — no duplication
    // 9Ip… (82): has orders below 82 -> cheap true; some price > 82? no -> rich true
    val byUser = got.map(r => r.head.toString -> (r(1), r(2))).toMap
    assert(byUser("9Ip1aKbeZe2njCDM") == ((true, true)), byUser.toString)
    // both hT2… users (12): no own orders -> cheap false; prices > 12 exist -> rich false
    assert(byUser("hT2impsOPUREcVPc") == ((false, false)), byUser.toString)
    assert(byUser("hT2impsabc345c") == ((false, false)), byUser.toString)
    // the per-key aggregation shapes refuse LOUDLY, naming the rewrite
    val e1 = intercept[Exception](s.sql(
      """SELECT user_id FROM users WHERE referral_count IN
        |(SELECT item_count FROM orders WHERE orders.price > users.referral_count)""".stripMargin))
    assert(e1.getMessage.contains("rewrite through EXISTS"), e1.getMessage)
    val e2 = intercept[Exception](s.sql(
      """SELECT user_id FROM users WHERE referral_count > ANY
        |(SELECT item_count FROM orders WHERE orders.price != users.referral_count)""".stripMargin))
    assert(e2.getMessage.contains("rewrite through EXISTS"), e2.getMessage)
  }

  test("expression-position non-equi EXISTS pins its row-id frame: " +
      "multi-partition SHUFFLED outer (r16, VERDICT r15 #1)") {
    // The lowering stamps the outer with monotonically_increasing_id
    // and round-trips it through a semi-join; without the cache pin the
    // two branches re-evaluate the stamped subtree, and when the outer
    // contains a shuffle (here: a grouped aggregate) reducer fetch
    // order can renumber rows between evaluations = wrong verdicts.
    // This runs the shape on 8 shuffle partitions with an aggregate
    // upstream and asserts every verdict exactly.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val s = new GraftSession(spark)
      val uRows = (1L to 400L).map(i => Row(i, i % 97))
      val oRows = (1L to 2000L).map(i => Row(i % 400 + 1, i % 113))
      s.registerTable("pin_u", spark.createDataFrame(
        java.util.Arrays.asList(uRows: _*),
        StructType(Seq(StructField("uid", LongType), StructField("score", LongType))))
        .repartition(8))
      s.registerTable("pin_o", spark.createDataFrame(
        java.util.Arrays.asList(oRows: _*),
        StructType(Seq(StructField("ouid", LongType), StructField("price", LongType))))
        .repartition(8))
      val got = s.sql(
        """SELECT uid,
          |  EXISTS (SELECT 1 FROM pin_o WHERE pin_o.ouid = g.uid
          |            AND pin_o.price > g.score) AS has,
          |  NOT EXISTS (SELECT 1 FROM pin_o WHERE pin_o.ouid = g.uid
          |            AND pin_o.price < g.score) AS never_below
          |FROM (SELECT uid, max(score) AS score FROM pin_u GROUP BY uid) g""".stripMargin)
      // the pin is IN the plan: the round trip reads an InMemoryRelation
      val qe = got.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
      assert(qe.withCachedData.collectFirst {
        case im: org.apache.spark.sql.execution.columnar.InMemoryRelation => im
      }.isDefined, "expected the rid-stamped frame to be cache-pinned")
      val byUid = rows(got).map(r => (r(0).asInstanceOf[Long],
        (r(1).asInstanceOf[Boolean], r(2).asInstanceOf[Boolean]))).toMap
      assert(byUid.size == 400, s"round trip duplicated/dropped rows: ${byUid.size}")
      val ordersByUid = (1L to 2000L).map(i => (i % 400 + 1, i % 113))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      for (uid <- 1L to 400L) {
        val score = uid % 97
        val prices = ordersByUid.getOrElse(uid, Seq.empty)
        val want = (prices.exists(_ > score), !prices.exists(_ < score))
        assert(byUid(uid) == want, s"uid=$uid score=$score got=${byUid(uid)} want=$want")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("FROM-less scalar subqueries over decimal and NULL build (r16, ADVICE r15 medium)") {
    val s = session
    // the BigDecimal exactness path re-enters as cast('…' AS
    // decimal(p,s)) — castTo must parse the parameterized DDL type
    s.registerTable("dec_t", spark.sql(
      "SELECT CAST(12345.67 AS DECIMAL(10,2)) AS price UNION ALL SELECT CAST(0.01 AS DECIMAL(10,2))"))
    assert(rows(s.sql("SELECT (SELECT max(price) FROM dec_t) AS m")) ==
      Seq(Seq(new java.math.BigDecimal("12345.67"))))
    // NULL scalar: the literal path casts to the subquery's schema type
    // — VOID for a bare NULL, decimal(10,2) for an empty decimal scan
    assert(rows(s.sql("SELECT (SELECT NULL) AS n")) == Seq(Seq(null)))
    assert(rows(s.sql("SELECT (SELECT price FROM dec_t WHERE price < 0) AS e")) ==
      Seq(Seq(null)))
    s.sql("DROP TABLE dec_t")
  }

  test("unknown multi-part qualifiers refuse in correlation position (r16, VERDICT r15 #2)") {
    val s = session
    // 3-part path through a KNOWN outer alias (the fuzz-found l.j2.x
    // shape): the old suffix fallback silently bound bare
    // referral_count — must now raise the projection path's
    // unresolved-column error. Expression position:
    val e1 = intercept[Exception](s.sql(
      """SELECT user_id,
        |  EXISTS (SELECT 1 FROM orders WHERE orders.user_id = users.user_id
        |            AND orders.price > users.j2.referral_count) AS x
        |FROM users""".stripMargin).collect())
    assert(e1.getMessage.toLowerCase.matches("(?s).*(unresolved|cannot resolve|no such).*"),
      e1.getMessage)
    // WHERE-conjunct position (the fold-into-join lowering):
    val e2 = intercept[Exception](s.sql(
      """SELECT user_id FROM users WHERE EXISTS
        |(SELECT 1 FROM orders WHERE orders.user_id = users.user_id
        |   AND orders.price > users.j2.referral_count)""".stripMargin).collect())
    assert(e2.getMessage.toLowerCase.matches("(?s).*(unresolved|cannot resolve|no such).*"),
      e2.getMessage)
    // an entirely unknown qualifier refuses too (binds NOWHERE — not
    // outer by suffix, not inner)
    val e3 = intercept[Exception](s.sql(
      """SELECT user_id FROM users WHERE EXISTS
        |(SELECT 1 FROM orders WHERE orders.user_id = users.user_id
        |   AND orders.price > nosuch.referral_count)""".stripMargin).collect())
    assert(e3 != null)
    // the legitimate stripped-qualifier fallback (2-part, known outer
    // alias over an aggregated frame) still resolves
    assert(rows(s.sql(
      """SELECT user_id FROM (SELECT user_id, max(referral_count) AS rc
        |  FROM users GROUP BY user_id) u
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE orders.user_id = u.user_id AND orders.price > u.rc)
        |ORDER BY user_id""".stripMargin)).isEmpty) // 82 > both prices: no
  }

  test("UPDATE SET accepts subqueries (r12, beyond ref)") {
    val s = session
    s.sql("CREATE TABLE scr3 AS SELECT order_id, user_id, price FROM orders")
    // uncorrelated scalar in SET, filtered by a plain WHERE
    s.sql("UPDATE scr3 SET price = (SELECT max(price) FROM scr3) WHERE order_id == 1")
    assert(rows(s.sql("SELECT order_id, price FROM scr3 ORDER BY order_id")) ==
      Seq(Seq(1L, 37.5), Seq(2L, 37.5), Seq(3L, 22.5)))
    // CORRELATED aggregate in SET with no WHERE: every row gets its
    // user's referral_count (the missing user 'abcabcabc' → NULL max
    // casts to NULL price)
    s.sql("""UPDATE scr3 SET price =
      |(SELECT max(referral_count) FROM users WHERE users.user_id = scr3.user_id)""".stripMargin)
    assert(rows(s.sql("SELECT order_id, price FROM scr3 ORDER BY order_id")) ==
      Seq(Seq(1L, 82.0), Seq(2L, 82.0), Seq(3L, null)))
    // SET subquery + WHERE subquery combine; arithmetic around the sub
    s.sql("""UPDATE scr3 SET price = 1 + (SELECT min(price) FROM scr3 WHERE price > 0)
      |WHERE user_id IN (SELECT user_id FROM users WHERE interests == "fishing")""".stripMargin)
    assert(rows(s.sql("SELECT order_id, price FROM scr3 ORDER BY order_id")) ==
      Seq(Seq(1L, 83.0), Seq(2L, 83.0), Seq(3L, null)))
    s.sql("DROP TABLE scr3")
  }

  test("insert-select, upsert-set, explain") {
    session.sql("CREATE TABLE t2 AS SELECT user_id, referral_count FROM users WHERE referral_count > 50")
    session.sql("INSERT INTO t2 (user_id, referral_count) SELECT user_id, item_count FROM orders WHERE order_id = 1")
    assert(rows(session.sql("SELECT count(*) AS c FROM t2")) == Seq(Seq(2L)))
    // alternate reference form: UPSERT tbl SET k = v (applies to all rows here)
    session.sql("UPDATE t2 SET referral_count = 1 WHERE user_id = '9Ip1aKbeZe2njCDM'")
    assert(rows(session.sql("SELECT referral_count FROM t2 WHERE user_id = '9Ip1aKbeZe2njCDM' LIMIT 1")).head
      == Seq(1L))
    val plan = rows(session.sql("EXPLAIN SELECT user_id FROM t2 WHERE referral_count > 0")).head.head.toString
    assert(plan.contains("Physical Plan"))
    session.sql("DROP TABLE t2")
  }

  test("filterql") {
    val f = session.sql("FILTER AND(referral_count > 50, EXISTS email) FROM users")
    assert(rows(f.select(f("user_id"))) == Seq(Seq("9Ip1aKbeZe2njCDM")))
    // single-row matches (vm.Matches)
    assert(session.matches("FILTER AND(x > 5, EXISTS name)", Map("x" -> 10L, "name" -> "a")))
    assert(!session.matches("FILTER AND(x > 5, EXISTS name)", Map("x" -> 3L, "name" -> "a")))
    // INCLUDE resolution
    session.addFilter("bigref", "FILTER referral_count > 50")
    val inc = session.sql("FILTER AND(INCLUDE bigref, EXISTS interests) FROM users")
    assert(rows(inc.select(inc("user_id"))) == Seq(Seq("9Ip1aKbeZe2njCDM")))
    // NOT INCLUDE
    val notInc = session.sql("FILTER NOT INCLUDE bigref FROM users")
    assert(notInc.count() == 2)
    // FilterQL select form: SELECT cols FROM t FILTER expr (rel/filter.go:30-33)
    testSelect(
      "SELECT user_id, email FROM users FILTER AND(referral_count > 50, EXISTS email)",
      Seq(Seq("9Ip1aKbeZe2njCDM", "aaron@email.com")))
  }

  test("expression text round-trips through the parser") {
    // rel/parse_sql_test.go parity: AST.text must re-parse to an equal AST
    for (e <- Seq(
      "a + 5 > b", "NOT (x AND y)", "AND (a, b, c)",
      "user_id LIKE \"ab*\"", "x NOT IN (\"a\", \"b\")",
      "5 BETWEEN 1 AND 10", "EXISTS email", "tolower(email) == \"x\"",
      "a.b + map(\"k\", 1)")) {
      val once = graft.expr.ExprParser.parse(e)
      val twice = graft.expr.ExprParser.parse(once.text)
      assert(once == twice, s"round-trip changed: $e -> ${once.text} -> ${twice.text}")
    }
  }

  test("set operations") {
    testSelect(
      """SELECT user_id FROM users WHERE referral_count > 50
        |UNION
        |SELECT user_id FROM orders WHERE price > 30
        |ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM")))
    testSelect(
      """SELECT user_id FROM users
        |INTERSECT
        |SELECT user_id FROM orders ORDER BY user_id""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM")))
    testSelect(
      """SELECT user_id FROM users
        |EXCEPT
        |SELECT user_id FROM orders ORDER BY user_id""".stripMargin,
      Seq(Seq("hT2impsOPUREcVPc"), Seq("hT2impsabc345c")))
    testSelect(
      """SELECT item_id FROM orders
        |UNION ALL
        |SELECT item_id FROM orders ORDER BY item_id LIMIT 3""".stripMargin,
      Seq(Seq(1L), Seq(1L), Seq(1L)))
  }

  test("engine dialect exposes the compiled kernel suite as builtins") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    session.registerTable("emb_k", emb)
    val self = session.sql(
      "SELECT vec_id, cosine_sim(embedding, embedding) AS c FROM emb_k LIMIT 5")
      .collect()
    assert(self.length == 5)
    assert(self.forall(r => math.abs(r.getAs[Double]("c") - 1.0) < 1e-9),
      "self-cosine through the engine dialect must be 1.0")
    val dp = session.sql(
      "SELECT dot_product(l2_normalize(embedding), l2_normalize(embedding)) AS d " +
        "FROM emb_k LIMIT 3").collect()
    assert(dp.forall(r => math.abs(r.getAs[Double]("d") - 1.0) < 1e-9))
  }

  test("single-row expression eval (vm.Eval embedding)") {
    assert(session.eval("a + 5 > b", Map("a" -> 10L, "b" -> 12L)) == true)
    assert(session.eval("tolower(name)", Map("name" -> "AARON")) == "aaron")
    assert(session.eval("x * 2 + 1", Map("x" -> 4L)) == 9L)
    // missing field: comparisons are false, except != which is true
    // (vm.go nil handling, lines ~340-342 / ~476-480)
    assert(session.eval("missing_field > 5", Map("x" -> 1L)) == false)
    assert(session.eval("missing_field != 5", Map("x" -> 1L)) == true)
    assert(session.eval("missing_field + 5", Map("x" -> 1L)) == null)
    assert(rows(session.sql("SHOW INDEX FROM users")).isEmpty)
  }

  test("eval/matches run on the driver — zero Spark jobs (r3 verdict #4)") {
    val sc = session.spark.sparkContext
    Thread.sleep(300) // drain the async listener bus
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    for (i <- 1 to 100) {
      assert(session.eval("a + 5 > b AND contains(name, \"ar\")",
        Map("a" -> (i + 10L), "b" -> 12L, "name" -> "aaron")) == true)
      assert(session.matches("FILTER AND(x > 5, EXISTS name)",
        Map("x" -> 10L, "name" -> "a")))
      assert(session.eval("toint(price)", Map("price" -> "$1.50")) == 1L)
    }
    Thread.sleep(500)
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, s"LocalEval path ran ${after - before} Spark jobs")
    // INCLUDE is inlined before local eval
    session.addFilter("is_aaron", "FILTER name == \"aaron\"")
    assert(session.matches("FILTER AND(INCLUDE is_aaron, x > 1)",
      Map("name" -> "aaron", "x" -> 5L)))
    // builtins outside the LocalEval subset fall back to the Spark path
    assert(session.eval("hash.md5(name)", Map("name" -> "hello"))
      == "5d41402abc4b2a76b9719d911017c592")
    // parse-once-eval-many (expr.MustParse + vm.Eval loop): 100k rows
    // through the compiled closure must be driver-speed (the reference's
    // ~789 ns/op path — we allow generous CI slack)
    val f = session.compile("a + 5 > b AND contains(name, \"ar\")")
    val t0 = System.nanoTime()
    var i = 0
    while (i < 100000) {
      assert(f(Map("a" -> (i + 10L), "b" -> 12L, "name" -> "aaron")) == true)
      i += 1
    }
    val perOp = (System.nanoTime() - t0) / 100000
    assert(perOp < 100000, s"compiled eval too slow: $perOp ns/op") // < 0.1 ms/op
  }

  test("datemath boundary analyzer (vm/datemath.go DateConverter)") {
    val nowMs = System.currentTimeMillis()
    val h = 3600L * 1000
    def ts(deltaMs: Long) = new java.sql.Timestamp(nowMs + deltaMs)
    // last_event = now-12h: `< "now-1d"` false now, flips true at now+12h
    val b1 = session.dateBoundary("FILTER last_event < \"now-1d\"",
      Map("last_event" -> ts(-12 * h)))
    assert(b1.hasDateMath && b1.timeStrings == Seq("now-1d"))
    assert(math.abs(b1.boundaryMs.get - (nowMs + 12 * h)) < 5000, b1)
    // swapped sides normalize: `"now-1d" > last_event`
    val b2 = session.dateBoundary("FILTER \"now-1d\" > last_event",
      Map("last_event" -> ts(-12 * h)))
    assert(math.abs(b2.boundaryMs.get - (nowMs + 12 * h)) < 5000, b2)
    // OR of two datemath terms: earliest boundary wins
    val b3 = session.dateBoundary(
      "FILTER OR (last_event < \"now-6d\", last_event < \"now-1d\")",
      Map("last_event" -> ts(-12 * h)))
    assert(b3.timeStrings == Seq("now-6d", "now-1d"))
    assert(math.abs(b3.boundaryMs.get - (nowMs + 12 * h)) < 5000, b3)
    // true now, flips false in 12h
    val b4 = session.dateBoundary("FILTER last_event > \"now-1d\"",
      Map("last_event" -> ts(-12 * h)))
    assert(math.abs(b4.boundaryMs.get - (nowMs + 12 * h)) < 5000, b4)
    // == / != never produce boundaries
    val b5 = session.dateBoundary("FILTER last_event == \"now-1d\"",
      Map("last_event" -> ts(-12 * h)))
    assert(b5.hasDateMath && b5.boundaryMs.isEmpty)
    // no datemath at all
    val b6 = session.dateBoundary("FILTER x > 5", Map("x" -> 1L))
    assert(!b6.hasDateMath && b6.boundaryMs.isEmpty)
    // evalMillis truncation: "now/d" = start of today (UTC)
    val dayStart = graft.expr.DateMath.evalMillis("now/d", nowMs).get
    assert(dayStart <= nowMs && nowMs - dayStart < 86400000L)
    assert(dayStart % 86400000L == 0)
  }

  test("select into") {
    session.sql("SELECT user_id, email INTO snap FROM users WHERE referral_count > 50")
    assert(rows(session.sql("SELECT count(*) AS c FROM snap")) == Seq(Seq(1L)))
    session.sql("DROP TABLE snap")
  }

  test("create source from csv with-config") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val p = dir.resolve("pets.csv")
    java.nio.file.Files.writeString(p, "name,age\nrex,3\nfido,5\n")
    session.sql(s"""CREATE SOURCE pets WITH {"type": "csv", "path": "$p"}""")
    testSelect("SELECT name FROM pets WHERE age > 4", Seq(Seq("fido")))
    session.sql("DROP SOURCE pets")
  }

  test("SEMI / ANTI JOIN through the dialect") {
    // semi: users with at least one order; only left columns in scope
    testSelect(
      "SELECT u.email FROM users u SEMI JOIN orders o ON u.user_id == o.user_id",
      Seq(Seq("aaron@email.com")))
    // anti: users with no order
    testSelect(
      """SELECT u.email FROM users u ANTI JOIN orders o ON u.user_id == o.user_id
        |ORDER BY u.email""".stripMargin,
      Seq(Seq("bob@email.com"), Seq("not_an_email_2")))
    // LEFT SEMI spelling = SEMI; a right column must NOT be in scope
    testSelect(
      "SELECT u.email FROM users u LEFT SEMI JOIN orders o ON u.user_id == o.user_id",
      Seq(Seq("aaron@email.com")))
    testSelectErr(
      "SELECT o.price FROM users u SEMI JOIN orders o ON u.user_id == o.user_id")
  }

  test("VALUES table in FROM position") {
    testSelect(
      """SELECT t.b FROM (VALUES (1, "one"), (2, "two")) AS t(a, b)
        |WHERE t.a == 2""".stripMargin,
      Seq(Seq("two")))
    // joined against a real table
    testSelect(
      """SELECT o.order_id, t.label
        |FROM orders o JOIN (VALUES (1, "first")) AS t(oid, label)
        |  ON o.order_id == t.oid""".stripMargin,
      Seq(Seq(1L, "first")))
  }

  test("star modifiers: * EXCLUDE and * REPLACE") {
    testSelect(
      """SELECT * EXCLUDE (order_date, item_count, user_id, item_id)
        |  REPLACE (price * 2 AS price)
        |FROM orders WHERE order_id == 1""".stripMargin,
      Seq(Seq(1L, 45.0)))
    // unknown name in a modifier refuses loudly
    testSelectErr("SELECT * EXCLUDE (no_such_col) FROM orders")
    testSelectErr("SELECT * REPLACE (1 AS no_such_col) FROM orders")
  }

  test("GROUP BY ALL, ORDER BY ALL and ordinal references") {
    testSelect(
      """SELECT user_id, count(*) AS n FROM orders GROUP BY ALL
        |ORDER BY 2 DESC, 1""".stripMargin,
      Seq(Seq("9Ip1aKbeZe2njCDM", 2L), Seq("abcabcabc", 1L)))
    testSelect(
      "SELECT item_id, order_id FROM orders ORDER BY ALL DESC",
      Seq(Seq(2L, 2L), Seq(1L, 3L), Seq(1L, 1L)))
    testSelect(
      "SELECT user_id, sum(price) AS spend FROM orders GROUP BY 1 ORDER BY 1",
      Seq(Seq("9Ip1aKbeZe2njCDM", 60.0), Seq("abcabcabc", 22.50)))
    // ordinal out of range / pointing at * refuse at parse time
    testSelectErr("SELECT order_id FROM orders ORDER BY 3")
    testSelectErr("SELECT * FROM orders GROUP BY 1")
  }

  test("MERGE INTO: update, delete, insert in one set-based statement") {
    val s = new GraftSession(spark)
    import org.apache.spark.sql.Row
    val inv = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "widget", 10L), Row(2L, "gadget", 5L), Row(3L, "doodad", 0L)),
      StructType(Seq(StructField("sku", LongType), StructField("name", StringType),
        StructField("qty", LongType))))
    s.registerTable("inventory", inv)
    // delta: restock sku 1, discontinue sku 3, add sku 4
    s.sql("""MERGE INTO inventory AS t
      |USING (VALUES (1, 7, "restock"), (3, 0, "drop"), (4, 20, "new"))
      |  AS d(sku, amount, kind)
      |ON t.sku == d.sku
      |WHEN MATCHED AND d.kind == "drop" THEN DELETE
      |WHEN MATCHED THEN UPDATE SET qty = t.qty + d.amount
      |WHEN NOT MATCHED THEN INSERT (sku, qty) VALUES (d.sku, d.amount)""".stripMargin)
    val out = s.sql("SELECT sku, name, qty FROM inventory ORDER BY sku")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, "widget", 17L), (2L, "gadget", 5L), (4L, null, 20L)), out)
    // conditional matched clauses: first match wins
    s.sql("""MERGE INTO inventory t USING (VALUES (1, 100)) AS d(sku, amount)
      |ON t.sku == d.sku
      |WHEN MATCHED AND t.qty > 1000 THEN UPDATE SET qty = 0
      |WHEN MATCHED THEN UPDATE SET qty = d.amount""".stripMargin)
    assert(s.sql("SELECT qty FROM inventory WHERE sku == 1").collect().head.getLong(0) == 100L)
    // ambiguity: two source rows matching one target row raises
    assertThrows[Exception](s.sql(
      """MERGE INTO inventory t USING (VALUES (1, 1), (1, 2)) AS d(sku, amount)
        |ON t.sku == d.sku WHEN MATCHED THEN UPDATE SET qty = d.amount""".stripMargin))
    s.sql("DROP TABLE inventory")
  }

  test("LATERAL subqueries: aggregate, top-k, uncorrelated, error shapes") {
    // aggregate lateral: one row per user, zero-order users keep count 0
    testSelect(
      """SELECT u.email, l.n FROM users u,
        |LATERAL (SELECT count(*) AS n FROM orders WHERE orders.user_id == u.user_id) l
        |ORDER BY u.email""".stripMargin,
      Seq(Seq("aaron@email.com", 2L), Seq("bob@email.com", 0L), Seq("not_an_email_2", 0L)))
    // top-1 lateral: each user's priciest order (users w/o orders drop)
    testSelect(
      """SELECT u.email, l.price FROM users u,
        |LATERAL (SELECT price FROM orders WHERE orders.user_id == u.user_id
        |         ORDER BY price DESC LIMIT 1) l""".stripMargin,
      Seq(Seq("aaron@email.com", 37.50)))
    // uncorrelated lateral degrades to a cross join
    assert(session.sql(
      """SELECT u.email, l.one FROM users u,
        |LATERAL (SELECT 1 AS one) l""".stripMargin).count() == 3)
    // LIMIT without ORDER BY refuses (nondeterministic top-k)
    testSelectErr(
      """SELECT u.email FROM users u,
        |LATERAL (SELECT price FROM orders WHERE orders.user_id == u.user_id LIMIT 1) l""".stripMargin)
    // mixing aggregate and plain columns refuses
    testSelectErr(
      """SELECT u.email FROM users u,
        |LATERAL (SELECT price, count(*) AS n FROM orders WHERE orders.user_id == u.user_id) l""".stripMargin)
  }

  test("correlated scalar subquery in WHERE plans as a grouped aggregate") {
    // orders at their user's max price (ties kept)
    testSelect(
      """SELECT o.order_id FROM orders o
        |WHERE o.price == (SELECT max(o2.price) FROM orders o2
        |                  WHERE o2.user_id == o.user_id)
        |ORDER BY o.order_id""".stripMargin,
      Seq(Seq(2L), Seq(3L)))
    // non-aggregate correlated scalar refuses
    testSelectErr(
      """SELECT o.order_id FROM orders o
        |WHERE o.price > (SELECT o2.price FROM orders o2
        |                 WHERE o2.user_id == o.user_id)""".stripMargin)
  }

  test("ASOF JOIN through the dialect: inner drops, left keeps, guards refuse") {
    // each order pairs with the user's latest registration at-or-before
    // the order date; order 3's user never registered
    testSelect(
      """SELECT o.order_id, email FROM orders o
        |ASOF JOIN (SELECT user_id AS uid, reg_date, email FROM users) AS u
        |  ON o.user_id == uid AND o.order_date >= reg_date
        |ORDER BY o.order_id""".stripMargin,
      Seq(Seq(1L, "aaron@email.com"), Seq(2L, "aaron@email.com")))
    testSelect(
      """SELECT o.order_id, email FROM orders o
        |ASOF LEFT JOIN (SELECT user_id AS uid, reg_date, email FROM users) AS u
        |  ON o.user_id == uid AND o.order_date >= reg_date
        |ORDER BY o.order_id""".stripMargin,
      Seq(Seq(1L, "aaron@email.com"), Seq(2L, "aaron@email.com"), Seq(3L, null)))
    // right columns colliding with left refuse loudly
    testSelectErr(
      """SELECT o.order_id FROM orders o
        |ASOF JOIN users u ON o.user_id == u.user_id AND o.order_date >= u.reg_date""".stripMargin)
    // missing timestamp inequality refuses
    testSelectErr(
      """SELECT o.order_id FROM orders o
        |ASOF JOIN (SELECT user_id AS uid, email FROM users) AS u ON o.user_id == uid""".stripMargin)
  }

  test("DISTINCT ON keeps the first row per key under ORDER BY") {
    testSelect(
      """SELECT DISTINCT ON (user_id) order_id, price FROM orders
        |ORDER BY user_id, price DESC, order_id""".stripMargin,
      Seq(Seq(2L, 37.50), Seq(3L, 22.50)))
    // deterministic-winner guard: ORDER BY is mandatory
    testSelectErr("SELECT DISTINCT ON (user_id) order_id FROM orders")
    // cannot combine with plain DISTINCT semantics or GROUP BY
    testSelectErr(
      "SELECT DISTINCT ON (user_id) count(*) FROM orders GROUP BY user_id ORDER BY user_id")
  }

  test("r17 GraftSession applies SessionTuning to a consumer session (VERDICT r16 #2)") {
    // the engine's perf confs must travel with GraftSession itself, not
    // only the Bench/Verify mains: a library consumer wrapping an
    // existing SparkSession gets the cached-plan AQE coalescing too
    val k = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try {
      new GraftSession(spark)
      assert(spark.conf.get(k) == "true",
        "bare GraftSession must apply SessionTuning confs")
    } finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }
}
