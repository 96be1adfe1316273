package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rel.{SqlParser, SqlWriter}

/** Ports rel/sql_test.go TestToSql: parse → String() → reparse must
  * preserve the AST. Our comparison is full structural equality (the
  * reference compares column/from shapes node-kind-wise).
  */
class SqlWriterSpec extends AnyFunSuite {

  private val sqlStrings = Seq(
    """SELECT
      |    email IF NOT (email IN ("hello"))
      |INTO table FROM mystream""".stripMargin,
    """/*
      |  DESCRIPTION
      |*/
      |SELECT
      |    fname
      |    , lname AS last_name
      |    , count(host(_ses)) IF contains(_ses,"google.com")
      |    , now() AS created_ts
      |    , count(*) as ct
      |    , name   -- comment
      |    , email IF email NOT IN ("hello")
      |    , email as email2 IF NOT EXISTS reg_date
      |    , valuect(event)
      |    , todate(reg_date)
      |    , todate(`field xyz $%`)
      |INTO table
      |FROM mystream
      |WHERE
      |   ne(event,"stuff") AND ge(party, 1)""".stripMargin,
    """/*
      |  multi line comment
      |*/
      |SELECT
      |    fname -- First Name
      |    , lname AS last_name
      |    , count(_ses) IF contains(_ses,google.com)
      |    , email
      |    , set(cc)          AS choices
      |FROM mystream
      |WHERE
      |   ne(event,"stuff") AND ge(party, 1)""".stripMargin,
    """SELECT
      |  u.user_id, u.email, o.item_id,o.price
      |FROM users AS u
      |INNER JOIN orders AS o
      |ON u.user_id = o.user_id;""".stripMargin)

  test("parse -> toSql -> reparse preserves the AST (TestToSql)") {
    for (s <- sqlStrings) {
      val ast1 = SqlParser.parse(s)
      val printed = SqlWriter.toSql(ast1)
      val ast2 =
        try SqlParser.parse(printed)
        catch { case e: Exception => fail(s"reparse failed for:\n$printed\n  -> ${e.getMessage}") }
      assert(ast1 == ast2, s"AST diverged:\n  in:  $ast1\n  out: $ast2\n  sql: $printed")
    }
  }

  test("round-trip survives precedence parens, escapes and subqueries") {
    for (s <- Seq(
      // grouped arithmetic must not reassociate
      """SELECT a FROM t WHERE (price + tax) * 2 > 10""",
      """SELECT -(a + b) AS neg FROM t""",
      // string values with backslashes and embedded quotes
      """SELECT a FROM t WHERE x = "ab\\" OR y = "c""d"""",
      // string literals and quoted identities inside IN (SELECT ...)
      """SELECT a FROM t WHERE x IN (SELECT y FROM u WHERE n = "bob" AND `weird col` > 1)""",
      // value-position subqueries (r12): projected EXISTS / IN /
      // quantified, OR-disjunct membership, arithmetic around scalars
      """SELECT a, EXISTS (SELECT 1 FROM u WHERE u.k = t.k) AS e, x IN (SELECT y FROM u) AS m FROM t""",
      """SELECT a FROM t WHERE x IN (SELECT y FROM u) OR EXISTS (SELECT 1 FROM u WHERE u.k = t.k)""",
      """SELECT a, x > ANY (SELECT y FROM u) AS q FROM t WHERE p > 2 * (SELECT avg(y) FROM u)""")) {
      val ast1 = SqlParser.parse(s)
      val printed = SqlWriter.toSql(ast1)
      val ast2 = SqlParser.parse(printed)
      // SubqueryNode keeps raw tokens: compare the reprinted form (a
      // fixpoint) instead of token-level equality
      assert(SqlWriter.toSql(ast2) == printed, s"not a fixpoint: $s\n  -> $printed\n  -> ${SqlWriter.toSql(ast2)}")
      (ast1, ast2) match {
        case (a: graft.rel.SqlSelect, b: graft.rel.SqlSelect) =>
          assert(a.columns.map(_.outputName) == b.columns.map(_.outputName))
        case _ =>
      }
    }
    // semantic check: the reparsed grouped arithmetic keeps grouping
    val w = SqlParser.parse(SqlWriter.toSql(SqlParser.parse(
      """SELECT a FROM t WHERE (price + tax) * 2 > 10""")))
      .asInstanceOf[graft.rel.SqlSelect].where.get
    val mul = w.asInstanceOf[graft.expr.BinaryNode].l.asInstanceOf[graft.expr.BinaryNode]
    assert(mul.op == "*" && mul.l.isInstanceOf[graft.expr.BinaryNode], mul)
  }

  test("toSql covers set ops, filters and admin statements") {
    for (s <- Seq(
      """SELECT a FROM t1 UNION SELECT a FROM t2""",
      """FILTER AND ( x > 5, EXISTS email ) FROM users LIMIT 10 ALIAS screen""",
      """DESCRIBE mytable""",
      """USE mydb""",
      """DROP TABLE articles""",
      """MERGE INTO t AS a USING (VALUES (1, "x")) AS d(k, v) ON a.k == d.k WHEN MATCHED AND d.v != "x" THEN UPDATE SET v = d.v WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT (k, v) VALUES (d.k, d.v)""")) {
      val ast1 = SqlParser.parse(s)
      val ast2 = SqlParser.parse(SqlWriter.toSql(ast1))
      assert(ast1 == ast2, s"AST diverged for: $s -> ${SqlWriter.toSql(ast1)}")
    }
  }

  test("round-trip covers SEMI/ANTI joins, VALUES tables and DISTINCT ON") {
    for (s <- Seq(
      """SELECT c.a FROM c SEMI JOIN o ON c.a == o.a""",
      """SELECT c.a FROM c ANTI JOIN o ON c.a == o.a AND o.p > 5""",
      """SELECT r.x, t.label FROM r JOIN (VALUES (0, "a"), (1, "b")) AS t(rk, label) ON r.k == t.rk""",
      """SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, v DESC""",
      """SELECT * EXCLUDE (a, b) REPLACE (x + 1 AS x) FROM t""",
      """SELECT a, b, count(*) AS n FROM t GROUP BY ALL""",
      """SELECT a FROM t LIMIT 10 WITH broadcast = "dim", repartition = 8""",
      """SELECT t.a, l.n FROM t, LATERAL (SELECT count(*) AS n FROM u WHERE u.k == t.k) AS l""",
      """SELECT t.a FROM t ASOF LEFT JOIN u ON t.k == u.k AND t.ts >= u.ts""")) {
      val ast1 = SqlParser.parse(s)
      val ast2 = SqlParser.parse(SqlWriter.toSql(ast1))
      assert(ast1 == ast2, s"AST diverged for: $s -> ${SqlWriter.toSql(ast1)}")
    }
    // LEFT SEMI / LEFT ANTI normalize to the bare printed form
    val semi = SqlParser.parse("SELECT c.a FROM c LEFT SEMI JOIN o ON c.a == o.a")
    assert(SqlWriter.toSql(semi).contains("SEMI JOIN"))
    assert(SqlParser.parse(SqlWriter.toSql(semi)) == semi)
  }
}
