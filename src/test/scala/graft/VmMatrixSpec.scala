package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr._

/** Port of the reference's ~150-case expression VM matrix
  * (/root/reference/vm/vm_test.go:46-295) over the same message context:
  * int5=5, str5="5", created=now-14d, bvalt/bvalf, user_id="abc",
  * urls=["abc","123"], hits={google.com:5,bing.com:1},
  * email="bob@bob.com", mt={event0:2015-12-18, event1:2039-12-18}.
  *
  * Missing fields (`key`, `not_a_field`, `namex`, …) are modeled as
  * null string columns — SURVEY §7's sparse-row mapping (Spark columns
  * must exist; the reference's "could not evaluate" maps to SQL NULL).
  *
  * Documented divergences from the reference (each noted inline):
  *  1. "could not evaluate" → SQL NULL. `chkFalsy` accepts null|false —
  *     both filter a row, the reference's observable behavior.
  *  2. String relational compares (`user_id > "abc"`) evaluate
  *     lexicographically where the reference returns an eval error
  *     (vm.go:1035-1067 supports only = != contains like in on strings).
  *  3. Arithmetic over unevaluable operands under OR
  *     (`namex + true || …`) fails analysis where the reference skips
  *     the bad operand; Spark type-checks the whole expression tree.
  */
class VmMatrixSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import java.sql.Timestamp

  private val now = System.currentTimeMillis()
  private def daysAgo(d: Int) = new Timestamp(now - d * 86400000L)

  private val present = Seq(
    StructField("int5", LongType),
    StructField("str5", StringType),
    StructField("created", TimestampType),
    StructField("bvalt", BooleanType),
    StructField("bvalf", BooleanType),
    StructField("user_id", StringType),
    StructField("urls", ArrayType(StringType)),
    StructField("hits", MapType(StringType, LongType)),
    StructField("email", StringType),
    StructField("mt", MapType(StringType, TimestampType)))
  // fields the reference matrix references but the context does NOT have
  private val missing = Seq("key", "not_a_field", "not_real", "namex",
    "namex2", "userid", "fld1", "field", "field2", "fieldx")
  private val schema = StructType(present ++ missing.map(StructField(_, StringType)))

  private lazy val df = spark.createDataFrame(
    java.util.List.of(Row(
      Seq(5L, "5", daysAgo(14), true, false, "abc",
        Seq("abc", "123"), Map("google.com" -> 5L, "bing.com" -> 1L),
        "bob@bob.com",
        Map("event0" -> Timestamp.valueOf("2015-12-18 00:00:00"),
            "event1" -> Timestamp.valueOf("2039-12-18 00:00:00"))) ++
        missing.map(_ => null): _*)),
    schema)

  private lazy val ctx = BuildCtx(schema = Some(schema))

  /** the same row as a LocalEval context (missing fields NOT present —
    * the interpreter models absence, not null columns). */
  private val localCtx: Map[String, Any] = Map(
    "int5" -> 5L, "str5" -> "5", "created" -> daysAgo(14),
    "bvalt" -> true, "bvalf" -> false, "user_id" -> "abc",
    "urls" -> Seq("abc", "123"),
    "hits" -> Map("google.com" -> 5L, "bing.com" -> 1L),
    "email" -> "bob@bob.com",
    "mt" -> Map("event0" -> Timestamp.valueOf("2015-12-18 00:00:00"),
                "event1" -> Timestamp.valueOf("2039-12-18 00:00:00")))

  private def eval(e: String): Any = {
    val r = df.select(ColumnBuilder.build(ExprParser.parse(e), ctx).as("r")).head()
    if (r.isNullAt(0)) null else r.get(0)
  }

  private def scalar(v: Any): Boolean = v match {
    case _: Seq[_] | _: collection.Map[_, _] | null => false
    case _ => true
  }

  /** Checks the Spark path, then runs the SAME expression through
    * LocalEval: wherever both engines produce scalar values they must
    * agree (the two-evaluator differential — divergence #1's null-vs-
    * false mapping only applies when one side is null/missing). */
  private def chk(e: String, expected: Any): Unit = {
    val sv = eval(e)
    assert(sv == expected, s"expr: $e")
    try {
      val lv = graft.expr.LocalEval.eval(ExprParser.parse(e), localCtx).orNull
      if (scalar(sv) && scalar(lv))
        assert(lv == sv, s"LocalEval/Spark divergence on: $e → $lv vs $sv")
    } catch { case _: graft.expr.LocalEval.Unsupported => }
  }
  /** reference: false / could-not-evaluate; ours: false or NULL (both
    * filter the row — divergence #1). */
  private def chkFalsy(e: String): Unit = {
    val v = eval(e)
    assert(v == null || v == false, s"expr: $e gave $v, want null|false")
  }
  /** reference: eval error; ours: build/analysis error. */
  private def chkErr(e: String): Unit =
    assertThrows[Exception] { eval(e) }

  test("date math") {
    chk("""created > "now-1M"""", true)
    chk("""now() > todate("01/01/2014")""", true)
    chk("""todate("now+3d") > now()""", true)
    chk("created < 2032220220175", true)
    chk("mt.event0 > now()", false)
    chk("mt.event1 > now()", true)
    chkFalsy("mt.not_event > now()") // missing map key → NULL (ref: false)
  }

  test("exists/or combinations") {
    chkFalsy("""!exists(user_id) OR toint(not_a_field) > 21""") // false OR NULL
    chk("""exists(user_id) OR toint(not_a_field) > 21""", true)
    chk("""!exists(user_id) OR toint(str5) >= 1""", true)
    chk("""!exists(user_id) OR toint(str5) < 1""", false)
  }

  test("contains function with missing fields") {
    chk("""contains(key,"-")""", false)
    chk("""not(contains(key,"-"))""", true)
    chk("""contains(email,"@")""", true)
    chk("""not(contains(email,"@"))""", false)
    chk("""not(contains(key,"-")) AND not(contains(email,"@"))""", false)
    chk("""not(contains(key,"-")) OR not(contains(email,"@"))""", true)
    chk("""not(contains(key,"-")) OR not(contains(not_real,"@"))""", true)
    chk("""str5 NOT IN ("nope") AND userid NOT IN ("abc") AND email NOT IN ("jane@bob.com")""", true)
  }

  test("native LIKE keyword") {
    chk("""["portland"] LIKE "*land"""", true)
    chk("""["chicago"] LIKE "*land"""", false)
    chk("""["New York"] LIKE "New York"""", true)
    chk(""""New York" LIKE ["Boston","New York"]""", true)
    chk(""""New York" LIKE split("Boston,New York", ",")""", true)
    chk(""""New York" LIKE split("Boston",",")""", false)
    chkErr("user_id LIKE mt") // map pattern: eval error in both engines
    chk("""urls LIKE "a*"""", true)
    chk("""urls LIKE "d*"""", false)
    chk("""split("chicago,portland",",") LIKE "*land"""", true)
    chk("""split("chicago,portland",",") LIKE "*sea"""", false)
    chk("""email LIKE "bob*"""", true)
    chk("""email LIKE "bob"""", false)
    chk("""email LIKE "*.com"""", true)
  }

  test("native CONTAINS keyword") {
    chk("[1,2,3] contains int5", false)
    chk("[1,2,3] NOT contains int5", true)
    chk("[1,2,3,5] contains int5", true)
    chk("[1,2,3,5] NOT contains int5", false)
    chk("""email contains "bob"""", true)
    chk("""email contains ["lss","bob"]""", true)
    chk("""email contains split("lss,bob",",")""", true)
    chk("""email contains split("lss,qr",",")""", false)
    chk("""email NOT contains "bob"""", false)
    chk("""urls contains "abc"""", true)
    chk("""urls NOT contains "abc"""", false)
    chk("""urls contains "ab"""", true) // element-substring semantics
  }

  test("between ternary") {
    chk("10 BETWEEN 1 AND 50", true)
    chk("""10 BETWEEN "1" AND 50""", true)
    chk("""10 BETWEEN 1 AND "50"""", true)
    chk("""10 BETWEEN 1 AND "55.5"""", true)
    chk("""15.5 BETWEEN 1 AND "55.5"""", true)
    chk("10 BETWEEN 20 AND 50", false)
    chk("""10 BETWEEN 5 AND toint("50.5")""", true)
    chk("10 BETWEEN int5 AND 50", true)
    chkErr("10 BETWEEN 20 AND true") // number-vs-bool: error in both
    chk("""created BETWEEN "12/18/2015" AND "12/18/2050"""", true)
    chk("""created BETWEEN "now-50w" AND "12/18/2050"""", true)
  }

  test("IN multi-arg") {
    chk("""10 IN ("a","b",10, 4.5)""", true)
    chk("""10 IN ("a","b",20, 4.5)""", false)
    chk(""""a" IN ("a","b",10, 4.5)""", true)
    chk(""""a" IN ["a","b",10, 4.5]""", true)
    // comma-less list `("a","b" 4.5)` — the reference parser accepts it
    chk("""10 NOT IN ("a","b" 4.5)""", true)
    chk("""NOT (10 IN ("a","b" 4.5))""", true)
    chk(""""a" NOT IN ("a","b" 4.5)""", false)
    chk("""email NOT IN ("bob@bob.com")""", false)
    chk("""NOT email IN ("bob@bob.com")""", false)
    chk("""toint(not_a_field) NOT IN ("a","b" 4.5)""", true) // missing NOT IN → true
    chk(""""a" IN urls""", false)
    chk(""""abc" IN urls""", true)
    chk(""""com" IN hits""", false)
    chk(""""google.com" IN hits""", true)
    chk(""""event0" IN mt""", true)
    chk(""""event_no" IN mt""", false)
    chk("""emaildomain(email) in "google.com"""", false) // string IN string = equality
    chkErr(""""hello" == split("hell-no", ",")""") // string == array: error in both
  }

  test("binary string") {
    chk("""user_id == "abc"""", true)
    chk("""user_id != "abcd"""", true)
    chk("""user_id == "abcd"""", false)
    chk("""user_id != "abc"""", false)
    // divergence #2: reference eval-errors on string >, we compare
    chk("""user_id > "abc"""", false)
    chk("""user_id LIKE "*bc"""", true)
    chk("user_id LIKE \"\\*bc\"", false) // \* is a literal star
    chk("user_id != NULL", true)
  }

  test("binary bool") {
    chk("bvalt == true", true)
    chk("bvalt = true", true)
    chk("bvalf == false", true)
    chk("bvalf = false", true)
    chk("bvalt == bvalf", false)
    chk("bvalt != bvalf", true)
    chk("(toint(not_a_field) > 0) || true", true)
    chkFalsy("user_id == true") // non-bool string vs bool (ref: false)
  }

  test("boolean logic DSL") {
    chk("""AND (email == "bob@bob.com")""", true)
    chk("""AND (email == "bob@bob.com", EXISTS urls )""", true)
    chk("""NOT AND (email == "bob@bob.com", EXISTS urls )""", false)
    chk("""AND (email == "bob@bob.com", EXISTS not_a_field )""", false)
    chk("""OR (email == "bob@bob.com", EXISTS not_a_field )""", true)
    chk("""OR (email != "bob@bob.com", EXISTS not_a_field )""", false)
    // newline-separated args in the DSL (vm_test.go:196-205)
    chk("""
      OR (
        email != "bob@bob.com"
        AND (
          NOT EXISTS not_a_field
          int5 == 5
        )
      )""", true)
  }

  test("math") {
    chk("5 + 4", 9L)
    chk("5.2 + 4", 9.2)
    chk("(4 + 5) / 2", 4L)
    chk("6 > 5", true)
    chk("6 > 5.5", true)
    chk("6.5 > 5.5", true)
    chk("6 == 6", true)
    chk("6 != 5", true)
    chk("!eq(5,6)", true)
    // number-vs-array: any-element numeric equality for ANY op
    chk("""5.5 +  ["hello"]""", false)
    chk("""5.5 == ["5.5"]""", true)
    chk("""5.5 == ["hello", 3, "5.5"]""", true)
    chk("""5.5 == ["5.9", 99, "hello"]""", false)
    chk(""""5.5" == 5.5""", true)
    chk(""""5.5" > 5""", true)
  }

  test("bool with context") {
    chk("bvalt == true", true)
    chk("bvalf == false", true)
    chk("bvalf == true", false)
    chk("!(bvalf == true)", true)
  }

  test("EXISTS") {
    chk("EXISTS int5", true)
    chk("EXISTS not_a_field", false)
    chk("EXISTS bvalt", true)
    chk("EXISTS bvalf", true)
    chk("EXISTS toint(not_a_field)", false)
  }

  test("paren wrapping and urnary") {
    chk("6 == (5 + 1)", true)
    chk("true || !eq(5,6)", true)
  }

  test("context based math") {
    chk("int5 + 5", 10L)
    chk("int5 * 6", 30L)
    chk("toint(str5 * 6)", 30L)
    chk("toint(str5 + 6)", 11L)
    chk("user_id", "abc")
    chk("eq(toint(int5),5)", true)
    chk("eq(toint(int5),6)", false)
    chk("2 * (3 + 5)", 16L)
    chk("(bvalt == true && bvalf == false)", true)
    chkFalsy("""(fld1 != "stuff" AND (field2 == "stuff" AND toint(fieldx) > 7))""")
    chkFalsy("""(
      (fld1 != "stuff" AND field = true)
      OR
      (field2 == "stuff" AND toint(fieldx) > 7)
    )""")
  }

  test("code elide equivalences") {
    chk("""user_id == "abc"""", true)
    chk("""NOT (user_id != "abc")""", true)
    chk("""user_id != "abcd"""", true)
    chk("""NOT (user_id == "abcd")""", true)
    chk("""email contains "bob"""", true)
    chk("""NOT (email NOT contains "bob")""", true)
    chk("exists email", true)
    chk("NOT (NOT EXISTS email)", true)
    chk("exists not_a_field", false)
    chk("NOT (NOT EXISTS not_a_field)", false)
    chk("int5 > 10", false)
    chk("NOT (int5 <= 10)", false)
    chk("int5 < 10", true)
    chk("NOT (int5 >= 10)", true)
    chk("int5 >= 10", false)
    chk("NOT (int5 < 10)", false)
    chk("int5 <= 10", true)
    chk("NOT (int5 > 10)", true)
  }

  test("error and nil expressions") {
    chkErr("namex + true")
    // divergence #3: the reference skips unevaluable OR operands /
    // returns false from comparisons over them; Spark type-checks the
    // whole tree, so these fail analysis instead of yielding false
    chkErr("namex + true || namex2 + true")
    chkErr("(namex + true) == (namex2 + true)")
    chkErr("(namex + true) != (namex2 + true)")
    chkErr("(namex + true) > (namex2 + true)")
    chkErr("(namex + true) + (namex2 + true)")
  }
}
