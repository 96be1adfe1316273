package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftSession
import graft.rel.{Fingerprint, SqlParser}

/** Ports the reference's vm/sqlvm_test.go single-row SELECT table and
  * rel/sql_test.go TestSqlFingerPrinting.
  *
  * Divergence (README #1): the reference returns nil (error) for WHEREs
  * that cannot evaluate (`not_a_field > 10`, `user_id > true`,
  * `int5 + 6`) and an empty result for ones that evaluate false; here
  * both are the empty map — could-not-evaluate ≡ not-true.
  */
class SqlVmSpec extends AnyFunSuite {

  private lazy val session = new GraftSession(SparkTestSession.get)

  // the reference's message context (sqlvm_test.go sqlData);
  // created = 12/18/2014, updated = 12/18/2019
  private val row: Map[String, Any] = Map(
    "int5" -> 5L,
    "str5" -> "5",
    "created" -> java.sql.Timestamp.valueOf("2014-12-18 00:00:00"),
    "updated" -> java.sql.Timestamp.valueOf("2019-12-18 00:00:00"),
    "bvalt" -> true,
    "bvalf" -> false,
    "user_id" -> "abc",
    "urls" -> Seq("abc", "123"),
    "email" -> "bob@bob.com")

  private def st(sql: String): Map[String, Any] = session.sqlEval(sql, row)

  test("plain projection and datemath WHERE") {
    assert(st("select int5 FROM mycontext") == Map("int5" -> 5L))
    assert(st("""select int5 FROM mycontext WHERE created < "now-1M"""") ==
      Map("int5" -> 5L))
    // missing field in WHERE → no result
    assert(st("""select int5 FROM mycontext WHERE not_a_field < "now-1M"""") == Map.empty)
  }

  test("column guards drop columns, not rows") {
    assert(st("""select int5 IF EXISTS urls FROM mycontext WHERE created < "now-1M"""") ==
      Map("int5" -> 5L))
    assert(st("""select int5, str5 IF EXISTS not_a_field FROM mycontext WHERE created < "now-1M"""") ==
      Map("int5" -> 5L))
    // non-boolean guard value (toint → 5) omits the column
    assert(st("""select int5, str5 IF toint(str5) FROM mycontext WHERE created < "now-1M"""") ==
      Map("int5" -> 5L))
    // guard eval error (string > bool) omits the column
    assert(st("""select int5, "hello" AS hello IF user_id > true FROM mycontext WHERE created < "now-1M"""") ==
      Map("int5" -> 5L))
    // column eval error (todate("hello")) omits the column
    assert(st("""select int5, todate("hello") AS hello FROM mycontext WHERE created < "now-1M"""") ==
      Map("int5" -> 5L))
  }

  test("unevaluable WHEREs yield no result (divergence: empty, not nil)") {
    assert(st("select int5 FROM mycontext WHERE not_a_field > 10") == Map.empty)
    assert(st("select int5 FROM mycontext WHERE user_id > true") == Map.empty)
    assert(st("select int5 FROM mycontext WHERE int5 + 6") == Map.empty)
  }

  test("fingerprints are literal- and case-insensitive (TestSqlFingerPrinting)") {
    val s1 = SqlParser.parse(
      """SELECT name, item_id, email, price
        |FROM users WHERE user_id = "12345"""".stripMargin)
    val s2 = SqlParser.parse(
      """select name, ITEM_ID, email, price
        |FROM users WHERE user_id = "789456"""".stripMargin)
    assert(Fingerprint.text(s1) == Fingerprint.text(s2))
    assert(Fingerprint.id(s1) == Fingerprint.id(s2))
    // different shape → different fingerprint
    val s3 = SqlParser.parse("""SELECT name FROM users WHERE user_id = "12345"""")
    assert(Fingerprint.id(s1) != Fingerprint.id(s3))
    // INTO targets are side effects: they must NOT collide
    val i1 = SqlParser.parse("""SELECT a INTO t1 FROM x""")
    val i2 = SqlParser.parse("""SELECT a INTO t2 FROM x""")
    assert(Fingerprint.id(i1) != Fingerprint.id(i2))
    // subquery literals erase, so parameterizations collide (by design)
    val q1 = SqlParser.parse("""SELECT a FROM t WHERE x IN (SELECT y FROM u WHERE n = "Bob")""")
    val q2 = SqlParser.parse("""SELECT a FROM t WHERE x IN (SELECT y FROM u WHERE n = "Alice")""")
    assert(Fingerprint.id(q1) == Fingerprint.id(q2))
  }
}
