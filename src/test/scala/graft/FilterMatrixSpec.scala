package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftSession

/** Port of the reference's FilterQL match matrix
  * (/root/reference/vm/filterqlvm_test.go:67-233) through
  * `GraftSession.matches` — which runs on the driver via LocalEval, so
  * this doubles as the interpreter's parity suite.
  *
  * Context mirrors the reference's merged User-struct + map readers.
  * Skipped vs the reference: `FullName == "Yoda, Jedi"` (Go struct
  * method call — no analog in a map context).
  */
class FilterMatrixSpec extends AnyFunSuite {

  private lazy val session = new GraftSession(SparkTestSession.get)
  session.addFilter("match_all_include", "FILTER *")
  session.addFilter("is_yoda_true", "FILTER name == \"Yoda\"")

  import java.sql.Timestamp
  import java.time.Instant

  private val t1 = Timestamp.from(Instant.parse("2015-12-18T00:00:00Z"))
  private val nowMs = System.currentTimeMillis()
  private def ts(ms: Long) = new Timestamp(ms)

  private val row: Map[String, Any] = Map(
    "name" -> "Yoda",
    "created" -> t1,
    "updated" -> ts(nowMs - 3600L * 1000), // now-1h
    "authenticated" -> true,
    "roles" -> Seq("admin", "api"),
    "bankamount" -> 55.5,
    "address" -> Map("city" -> "Detroit", "zip" -> 55L),
    "hits" -> Map("foo" -> 5L),
    "firstevent" -> Map("signedup" -> t1),
    "city" -> "Peoria, IL",
    "zip" -> 5L,
    "lastevent" -> Map("signedup" -> t1),
    "last.event" -> Map("has.period" -> t1),
    "transactions" -> Seq(ts(t1.getTime - 86400000L), ts(t1.getTime + 86400000L)),
    "transactionsnil" -> Seq.empty[Timestamp])

  private val hits = Seq(
    """FILTER name == "Yoda"""",
    """FILTER name != "yoda"""", // case-sensitive by default
    """FILTER name = "Yoda"""", // = is equivalent to ==
    """FILTER "Yoda" == name""", // reverse order of identity/value
    """FILTER name != "Anakin"""",
    """FILTER first_name != "Anakin"""", // missing key: != is true
    """FILTER tolower(name) == "yoda"""",
    """FILTER Address.City == "Detroit"""", // struct traversal path.field
    """FILTER name LIKE "*da"""",
    """FILTER name NOT LIKE "*kin"""",
    """FILTER name CONTAINS "od"""",
    """FILTER name NOT CONTAINS "kin"""",
    """FILTER roles INTERSECTS ("user", "api")""",
    """FILTER roles IN ("user", "api")""", // IN ≡ INTERSECTS for slices
    """FILTER roles NOT INTERSECTS ("user", "guest")""",
    """FILTER Created BETWEEN "12/01/2015" AND "01/01/2016"""",
    """FILTER Created < "now-1d"""",
    """FILTER NOT ( Created > "now-1d") """,
    """FILTER NOT ( FakeDate > "now-1d") """, // missing field, negated
    """FILTER Updated > "now-2h"""",
    """FILTER transactions < "now-1h"""", // []time: any element
    """FILTER FirstEvent.signedup < "now-2h"""",
    """FILTER FirstEvent.signedup == "12/18/2015"""",
    """FILTER lastevent.signedup < "now-2h"""",
    """FILTER lastevent.signedup == "12/18/2015"""",
    "FILTER `lastevent`.`signedup` == \"12/18/2015\"", // backtick escape
    "FILTER `last.event`.`has.period` == \"12/18/2015\"",
    """FILTER hits INTERSECTS ("bar", "foo")""",
    """FILTER hits IN ("bar", "foo")""", // map keys
    """FILTER hits NOT IN ("not-gonna-happen")""",
    """FILTER lastevent IN ("signedup")""",
    """FILTER lastevent NOT IN ("not-gonna-happen")""",
    "FILTER *",
    """FILTER OR (
        name == "Rey"     -- false
        INCLUDE match_all_include
      )""",
    """FILTER OR (
        name == "Rey"     -- false
        INCLUDE is_yoda_true
      )""",
    """FILTER OR (
        EXISTS name,       -- inline comments
        EXISTS not_a_key,  -- more inline comments
      )""",
    "FILTER EXISTS transactions",
    """FILTER OR (
        EXISTS name
        EXISTS not_a_key   -- line breaks separate expressions
      )""",
    """FILTER AND (name == "Yoda", city == "Peoria, IL", zip == 5, BankAmount > 50)""",
    """FILTER AND (zip == "5", BankAmount > "50")""", // string→number coercion
    """FILTER bankamount > "9.4"""",
    """FILTER AND (zip == 5, "Yoda" == name, OR ( city IN ( "Portland, OR", "New York, NY", "Peoria, IL" ) ) )""",
    """FILTER OR (
        EXISTS q,
        AND (
          zip > 0,
          OR ( zip > 10000, zip < 100 )
        ),
        NOT ( name == "Yoda" ) )""",
    "FILTER hits.foo > 1.5",
    """FILTER hits.foo > "1.5"""",
    "FILTER NOT ( hits.foo > 5.5 )",
    """FILTER not_a_field NOT IN ("Yoda")""")

  private val misses = Seq(
    """FILTER name == "yoda"""", // casing
    """FILTER not_a_field + "yoda"""", // invalid statement
    "FILTER OR (false, false, AND (true, false))",
    """FILTER AND (name == "Yoda", city == "xxx", zip == 5)""",
    """FILTER lastevent.signedup > "now-2h"""",
    """FILTER lastevent.signedup != "12/18/2015"""",
    """FILTER transactionsnil < "now-1h"""", // empty slice
    """FILTER ["hello","apple"] < "now-1h"""", // non-time strings
    """FILTER zip * 5 * 2""") // numeric result is not a match

  /** Differential: the same filter through ColumnBuilder on a one-row
    * typed DataFrame. None = not comparable on the Spark path (missing
    * columns fail analysis there by design, INCLUDEs need the session,
    * ANSI cast errors) — the LocalEval assertion stands alone then. */
  private def sparkMatches(q: String): Option[Boolean] = {
    import org.apache.spark.sql.types._
    import graft.rel.{FilterStatement, SqlParser}
    import graft.expr.{BuildCtx, ColumnBuilder}
    def sparkType(v: Any): Option[DataType] = v match {
      case _: Long => Some(LongType)
      case _: Double => Some(DoubleType)
      case _: Boolean => Some(BooleanType)
      case _: String => Some(StringType)
      case _: java.sql.Timestamp => Some(TimestampType)
      case s: Seq[_] => Some(ArrayType(
        s.headOption.flatMap(sparkType).getOrElse(StringType)))
      case m: collection.Map[_, _] => Some(MapType(StringType,
        m.values.headOption.flatMap(sparkType).getOrElse(StringType)))
      case _ => None
    }
    try {
      val node = SqlParser.parse(q) match {
        case FilterStatement(n, _, _, _) => n
        case _ => return None
      }
      val fields = row.toSeq.map { case (k, v) =>
        org.apache.spark.sql.types.StructField(k, sparkType(v).getOrElse(return None))
      }
      val spark = SparkTestSession.get
      val df = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(row.values.toSeq: _*)),
        StructType(fields))
      val c = ColumnBuilder.build(node, BuildCtx(Some(StructType(fields))))
      val r = df.select(c.cast(BooleanType)).head()
      Some(!r.isNullAt(0) && r.getBoolean(0))
    } catch { case _: Throwable => None }
  }

  test("hit filters all match") {
    for (q <- hits) {
      assert(session.matches(q, row), s"expected MATCH: $q")
      // two-evaluator differential: where the Spark path evaluates at
      // all, it must agree
      sparkMatches(q).foreach(m =>
        assert(m, s"Spark path disagrees (miss) on hit filter: $q"))
    }
  }

  test("miss filters never match") {
    for (q <- misses) {
      assert(!session.matches(q, row), s"expected MISS: $q")
      sparkMatches(q).foreach(m =>
        assert(!m, s"Spark path disagrees (match) on miss filter: $q"))
    }
  }

  test("INCLUDE resolution and failure (vm TestInclude)") {
    val s2 = new GraftSession(SparkTestSession.get)
    s2.addFilter("test", "FILTER x > 5")
    assert(s2.matches("FILTER AND (x < 9000, INCLUDE test)", Map("x" -> 6L, "y" -> "1")))
    assert(!s2.matches("FILTER AND (x < 9000, INCLUDE test)", Map("x" -> 4L, "y" -> "1")))
    // unresolvable INCLUDE is an error, not a silent false
    assertThrows[Exception](
      s2.matches("FILTER AND (x < 9000, INCLUDE shouldfail)", Map("x" -> 6L)))
  }

  test("INCLUDE depth guard: cyclic filters raise the parity error (r12)") {
    // two mutually-recursive named filters (expr/include.go:14-15
    // maxIncludeDepth/ErrMaxDepth ≙) — a loud BuildException naming the
    // cycle path, never a StackOverflowError
    val s2 = new graft.engine.GraftSession(SparkTestSession.get)
    s2.addFilter("ping", "FILTER AND (x > 0, INCLUDE pong)")
    s2.addFilter("pong", "FILTER AND (x < 9000, INCLUDE ping)")
    val e = intercept[Exception](
      s2.matches("FILTER INCLUDE ping", Map("x" -> 6L)))
    assert(e.getMessage.contains("Recursive Evaluation Error"), e.getMessage)
    assert(e.getMessage.contains("ping -> pong"), e.getMessage)
    // a DEEP but acyclic chain inside the cap still resolves — at the
    // FULL reference bound (expr/include.go:38 `depth > maxIncludeDepth`,
    // r12 ADVICE: the old `>=` refused a legal 100-deep chain)
    s2.addFilter("base", "FILTER x > 5")
    for (i <- 1 to 101)
      s2.addFilter(s"lvl$i", s"FILTER INCLUDE ${if (i == 1) "base" else s"lvl${i - 1}"}")
    assert(s2.matches("FILTER INCLUDE lvl100", Map("x" -> 6L)))
    // one level past the cap refuses as a DEPTH violation (the message
    // names the include path, not a "cycle" — this chain is acyclic)
    val e3 = intercept[Exception](
      s2.matches("FILTER INCLUDE lvl101", Map("x" -> 6L)))
    assert(e3.getMessage.contains("Recursive Evaluation Error"), e3.getMessage)
    assert(e3.getMessage.contains("include path"), e3.getMessage)
    // the SPARK column-builder path is guarded the same way
    val df = SparkTestSession.get.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(6L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType))))
    s2.registerTable("cycrow", df)
    val e2 = intercept[Exception](
      s2.sql("FILTER INCLUDE ping FROM cycrow").collect())
    assert(e2.getMessage.contains("Recursive Evaluation Error"), e2.getMessage)
  }

  test("city IN list on the engine path (column-builder parity)") {
    // the same IN-list semantics must hold through the Spark path:
    // register a one-row table and filter it
    val spark = SparkTestSession.get
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row("Peoria, IL", 5L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("city",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("zip",
          org.apache.spark.sql.types.LongType))))
    session.registerTable("ctxrow", df)
    val out = session.sql(
      """FILTER AND (zip == "5", city IN ("Portland, OR", "Peoria, IL")) FROM ctxrow""")
    assert(out.count() == 1)
  }
}
