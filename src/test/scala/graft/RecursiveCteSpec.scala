package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftSession
import graft.expr.BuildException
import graft.rel.{SqlParser, SqlWith, SqlWriter}

/** WITH RECURSIVE through the dialect (beyond ref and beyond stock
  * Spark SQL): semi-naive fixpoint in GraftSession.planRecursiveCte.
  * Oracle rows: ql_recursive_tree / ql_recursive_fixpoint /
  * ql_recursive_series.
  */
class RecursiveCteSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def session: GraftSession = {
    val s = new GraftSession(spark)
    import spark.implicits._
    s.registerTable("nums", (0L until 25L).toSeq.toDF("n"))
    s
  }

  test("UNION ALL recursion: series with a stop predicate") {
    val gs = session
    val out = gs.sql(
      """WITH RECURSIVE f(i, fact) AS (
        |  SELECT 1, 1
        |  UNION ALL
        |  SELECT f.i + 1, f.fact * (f.i + 1) FROM f WHERE f.i < 6
        |) SELECT i, fact FROM f ORDER BY i""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq(1L -> 1L, 2L -> 2L, 3L -> 6L, 4L -> 24L, 5L -> 120L, 6L -> 720L))
  }

  test("UNION ALL recursion over a table: binary-tree depth labels") {
    val gs = session
    val out = gs.sql(
      """WITH RECURSIVE walk(nk, depth) AS (
        |  SELECT n, 0 FROM nums WHERE n == 0
        |  UNION ALL
        |  SELECT c.n, w.depth + 1 FROM nums c
        |  JOIN walk w ON toint(c.n / 2) == w.nk AND c.n != 0
        |) SELECT nk, depth FROM walk ORDER BY nk""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size == 25)
    // depth(nk) = halvings to reach 0 = bit length of nk
    for ((nk, d) <- out)
      assert(d == (64 - java.lang.Long.numberOfLeadingZeros(nk)).toLong.max(0L),
        s"depth of $nk was $d")
  }

  test("UNION distinct recursion reaches a fixpoint on a cyclic graph") {
    val gs = session
    val out = gs.sql(
      """WITH RECURSIVE reach(nk) AS (
        |  SELECT n FROM nums WHERE n == 0
        |  UNION
        |  SELECT (reach.nk * 2 + 1) % 25 FROM reach
        |) SELECT nk FROM reach ORDER BY nk""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    // closure of 0 under x -> (2x+1) mod 25
    val expect = Iterator.iterate(Set(0L)) { s =>
      s ++ s.map(x => (2 * x + 1) % 25)
    }.drop(25).next()
    assert(out == expect && out.size == 20)
  }

  test("recursive CTE feeds later CTEs and the body like any table") {
    val gs = session
    val out = gs.sql(
      """WITH RECURSIVE r(i) AS (
        |  SELECT 1 UNION ALL SELECT r.i + 1 FROM r WHERE r.i < 10
        |), odd AS (SELECT i FROM r WHERE i % 2 == 1)
        |SELECT count(*) AS n, sum(i) AS s FROM odd""".stripMargin)
      .collect().head
    assert((out.getLong(0), out.getDouble(1)) == (5L, 25.0))
  }

  test("UNION ALL cycle without a stop predicate raises at the depth cap") {
    val gs = session
    gs.sql("SET @@max_recursion = 8")
    val e = intercept[BuildException](gs.sql(
      """WITH RECURSIVE r(i) AS (
        |  SELECT 1 UNION ALL SELECT r.i FROM r
        |) SELECT i FROM r""".stripMargin).collect())
    assert(e.getMessage.contains("no fixpoint after 8"))
  }

  test("malformed recursive bodies are refused with clear errors") {
    val gs = session
    // no UNION split at all
    val e1 = intercept[BuildException](gs.sql(
      "WITH RECURSIVE r(i) AS (SELECT r.i + 1 FROM r) SELECT i FROM r"))
    assert(e1.getMessage.contains("must be"))
    // self-reference in the base term
    val e2 = intercept[BuildException](gs.sql(
      """WITH RECURSIVE r(i) AS (
        |  SELECT r.i FROM r UNION ALL SELECT r.i + 1 FROM r WHERE r.i < 3
        |) SELECT i FROM r""".stripMargin))
    assert(e2.getMessage.contains("final UNION term"))
    // column-list arity mismatch
    val e3 = intercept[BuildException](gs.sql(
      "WITH RECURSIVE r(i, j) AS (SELECT 1 UNION ALL SELECT r.i + 1 FROM r WHERE r.i < 3) SELECT i FROM r"))
    assert(e3.getMessage.contains("declares 2"))
  }

  test("@@checkpoint_dir makes recursion rounds durable without changing results") {
    // VERDICT r14 #5: the reliable-checkpoint knob on the session —
    // SET @@checkpoint_dir routes every @@checkpoint_every-th frontier
    // through a reliable checkpoint; the fixpoint is unchanged
    val gs = session
    val dir = java.nio.file.Files.createTempDirectory("graft_cte_ckpt").toString
    gs.sql(s"SET @@checkpoint_dir = '$dir'")
    gs.sql("SET @@checkpoint_every = 1")
    val out = gs.sql(
      """WITH RECURSIVE s(i) AS (
        |  SELECT 1 UNION ALL SELECT s.i + 1 FROM s WHERE s.i < 5
        |) SELECT sum(i) AS t FROM s""".stripMargin).collect()
    assert(out(0).get(0).toString.toDouble == 15.0, out(0).toString)
    def countFiles(p: java.io.File): Int =
      if (p.isFile) 1 else Option(p.listFiles).map(_.map(countFiles).sum).getOrElse(0)
    assert(countFiles(new java.io.File(dir)) > 0,
      s"no reliable checkpoint files under $dir")
  }

  test("RECURSIVE is a soft keyword: a CTE named recursive still works") {
    val gs = session
    val out = gs.sql(
      "WITH recursive AS (SELECT 2 AS a) SELECT a FROM recursive")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L))
  }

  test("column alias list renames non-recursive CTEs positionally") {
    val gs = session
    val out = gs.sql(
      "WITH t(x, y) AS (SELECT n, n * 2 FROM nums WHERE n < 3) SELECT x, y FROM t ORDER BY x")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq(0L -> 0L, 1L -> 2L, 2L -> 4L))
  }

  test("parse -> toSql -> reparse preserves RECURSIVE flag and column list") {
    val s = "WITH RECURSIVE r(i) AS (SELECT 1 UNION ALL SELECT r.i + 1 FROM r WHERE r.i < 5) SELECT i FROM r"
    val ast = SqlParser.parse(s)
    assert(ast.asInstanceOf[SqlWith].recursive)
    val printed = SqlWriter.toSql(ast)
    assert(printed.contains("WITH RECURSIVE r(i) AS"))
    assert(SqlParser.parse(printed) == ast)
  }
}
