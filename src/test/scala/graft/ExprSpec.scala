package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr._

/** Expression-table tests mirroring the reference's vm/vm_test.go
  * context (FIXTURES.md §A): one row with int5=5, str5="5",
  * created=now-14d, bools, urls array, hits map, email, mt time-map.
  */
class ExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import java.sql.Timestamp

  private val now = System.currentTimeMillis()
  private def daysAgo(d: Int) = new Timestamp(now - d * 86400000L)

  private val schema = StructType(Seq(
    StructField("int5", LongType),
    StructField("str5", StringType),
    StructField("created", TimestampType),
    StructField("bvalt", BooleanType),
    StructField("bvalf", BooleanType),
    StructField("user_id", StringType),
    StructField("urls", ArrayType(StringType)),
    StructField("hits", MapType(StringType, LongType)),
    StructField("email", StringType),
    StructField("mt", MapType(StringType, TimestampType)),
    StructField("price", StringType),
    StructField("empty", StringType)))

  private lazy val df = spark.createDataFrame(
    java.util.List.of(Row(
      5L, "5", daysAgo(14), true, false, "abc",
      Seq("abc", "123"), Map("google.com" -> 5L, "bing.com" -> 1L),
      "bob@bob.com",
      Map("event0" -> Timestamp.valueOf("2015-12-18 00:00:00"),
          "event1" -> Timestamp.valueOf("2039-12-18 00:00:00")),
      "$1.50", null)),
    schema)

  private lazy val ctx = BuildCtx(schema = Some(schema))

  private def eval(e: String): Any = {
    val r = df.select(ColumnBuilder.build(ExprParser.parse(e), ctx).as("r")).head()
    if (r.isNullAt(0)) null else r.get(0)
  }

  private def check(e: String, expected: Any): Unit =
    assert(eval(e) == expected, s"expr: $e")

  test("arithmetic") {
    check("5 + 5", 10L)
    check("5 + 5.5", 10.5)
    check("10 - 4", 6L)
    check("6 * 7", 42L)
    check("60 / 2", 30L)        // int/int stays integral
    check("5 / 2", 2L)          // truncating int division
    check("5.0 / 2", 2.5)
    check("5 / 0", null)        // div-by-zero: eval error ⇒ null
    check("9 % 4", 1L)
    check("int5 * 2", 10L)
  }

  test("comparison with coercion") {
    check("5 == 5", true)
    check("5 != 5", false)
    check("5 <> 6", true)
    check("str5 == 5", true)    // string → number coercion
    check("int5 == \"5\"", true)
    check("6 > int5", true)
    check("4 >= 5", false)
    check("\"abc\" == user_id", true)
    check("10 < 9", false)
  }

  test("boolean logic") {
    check("bvalt AND true", true)
    check("bvalt AND bvalf", false)
    check("bvalf OR true", true)
    check("NOT bvalf", true)
    check("!bvalf", true)
    check("AND(bvalt, 5 == 5, \"abc\" == user_id)", true)
    check("OR(bvalf, 5 == 6, user_id == \"abc\")", true)
    check("NOT(bvalf)", true)
  }

  test("between is exclusive") {
    check("5 BETWEEN 4 AND 6", true)
    check("5 BETWEEN 5 AND 6", false)   // exclusive lower (vm.go:868)
    check("5 BETWEEN 4 AND 5", false)   // exclusive upper
    check("int5 NOT BETWEEN 5 AND 6", true)
  }

  test("like is glob") {
    check("user_id LIKE \"ab*\"", true)
    check("user_id LIKE \"a%\"", true)   // % rewritten to *
    check("user_id LIKE \"a?c\"", true)
    check("user_id LIKE \"xyz*\"", false)
    check("user_id NOT LIKE \"xyz*\"", true)
    check("urls LIKE \"12*\"", true)     // array: any element matches
    // ILIKE: case-insensitive over the same glob translation
    check("user_id ILIKE \"AB*\"", true)
    check("user_id LIKE \"AB*\"", false)
    check("user_id NOT ILIKE \"XYZ*\"", true)
  }

  test("contains / in / intersects / exists") {
    check("user_id CONTAINS \"bc\"", true)
    check("user_id NOT CONTAINS \"xy\"", true)
    check("urls CONTAINS \"23\"", true)  // element substring
    check("\"abc\" IN urls", true)
    check("\"xyz\" IN urls", false)
    check("user_id IN (\"abc\", \"def\")", true)
    check("5 IN [4, 5, 6]", true)
    check("\"google.com\" IN hits", true) // key-in-map
    check("urls INTERSECTS [\"abc\", \"zzz\"]", true)
    check("urls NOT INTERSECTS [\"xx\", \"zzz\"]", true)
    check("EXISTS user_id", true)
    check("EXISTS empty", false)          // empty string counts as nil
  }

  test("datemath comparisons") {
    check("created < \"now-3d\"", true)   // created = now-14d
    check("created > \"now-1M\"", true)
    check("created < \"now+1h\"", true)
    check("mt.event0 < \"now-3d\"", true) // map traversal + datemath
    check("mt.event1 > \"now\"", true)
  }

  test("scalar builtins: strings") {
    check("tolower(\"HELLO\")", "hello")
    check("string.uppercase(user_id)", "ABC")
    check("string.titlecase(\"hello world\")", "Hello World")
    check("contains(email, \"bob\")", true)
    check("hasprefix(email, \"bob@\")", true)
    check("hassuffix(email, \".com\")", true)
    check("replace(user_id, \"b\", \"x\")", "axc")
    check("join(\"a\", \"b\", \"-\")", "a-b")
    check("string.substr(email, 0, 3)", "bob")
    check("char_length(user_id)", 3L)
    check("string.index(email, \"@\")", 3L)
    assert(eval("split(\"a,b,c\", \",\")") == Seq("a", "b", "c"))
    check("strip(\"  x \")", "x")
  }

  test("scalar builtins: casts and numbers") {
    check("toint(\"$1.50\")", 1L)
    check("toint(price)", 1L)
    check("tonumber(\"$1.50\")", 1.5)
    check("toint(\"1,000\")", 1000L)
    check("tostring(5)", "5")
    check("tobool(\"true\")", true)
    check("sqrt(16)", 4.0)
    check("pow(2, 10)", 1024.0)
    check("cast(int5 AS char)", "5")
    check("eq(str5, int5)", true)
    check("gt(6, int5)", true)
    check("not(bvalf)", true)
  }

  test("selection builtins") {
    check("oneof(empty, user_id)", "abc")  // empty string skipped
    check("oneof(\"\", \"b\")", "b")
    check("any(empty, user_id)", true)
    check("all(bvalt, user_id)", true)
    check("all(bvalt, empty)", false)
  }

  test("array and map builtins") {
    check("len(urls)", 2L)
    check("len(user_id)", 3L)
    check("len(hits)", 2L)
    check("array.index(urls, 0)", "abc")
    check("array.index(urls, -1)", "123")
    assert(eval("array.slice(urls, 0, 1)") == Seq("abc"))
    assert(eval("mapkeys(hits)").asInstanceOf[collection.Seq[String]].toSet == Set("google.com", "bing.com"))
    assert(eval("mapvalues(hits)").asInstanceOf[collection.Seq[Long]].toSet == Set(5L, 1L))
    assert(eval("filtermatch(hits, \"goo*\")").asInstanceOf[collection.Map[String, Long]].toMap == Map("google.com" -> 5L))
    assert(eval("filter(hits, \"goo*\")").asInstanceOf[collection.Map[String, Long]].toMap == Map("bing.com" -> 1L))
  }

  test("url and email builtins") {
    check("email(\"Bob <BOB@bob.com>\")", "bob@bob.com")
    check("email(email)", "bob@bob.com")
    check("emaildomain(email)", "bob.com")
    check("emailname(\"Bob B <bob@bob.com>\")", "Bob B")
    check("host(\"http://www.lytics.io/index.html\")", "www.lytics.io")
    check("domain(\"http://www.lytics.io/index.html\")", "lytics.io")
    check("path(\"http://www.lytics.io/crm/index.html?city=x\")", "/crm/index.html")
    check("qs(\"http://www.lytics.io/?utm=tst%20x\", \"utm\")", "tst x")
    check("urlmain(\"http://www.lytics.io/crm?city=x\")", "http://www.lytics.io/crm")
    check("urlminusqs(\"http://x.com/p?q1=1&q2=2\", \"q1\")", "http://x.com/p?q2=2")
    check("urldecode(\"a%20b\")", "a b")
  }

  test("time builtins") {
    check("yy(\"2015-12-18\")", 15L)
    check("mm(\"2015-12-18\")", 12L)
    check("dayofweek(\"2015-12-18\")", 5L)  // Friday, 0 = Sunday
    check("hourofday(\"2015-12-18 14:30:00\")", 14L)
    check("totimestamp(\"2009-11-10 23:00:00\")", 1257894000L)
    check("strftime(\"2015-12-18\", \"%Y-%m\")", "2015-12")
    check("extract(\"2015-12-18 14:00:00\", \"%H\")", "14")
    check("seconds(\"25m\")", 1500.0)
    check("seconds(\"90\")", 90.0)
    check("todate(\"01/02/2006\", \"10/25/2015\")", Timestamp.valueOf("2015-10-25 00:00:00"))
  }

  test("hash and encoding builtins") {
    check("hash.md5(\"hello\")", "5d41402abc4b2a76b9719d911017c592")
    check("hash.sha1(\"hello\")", "aaf4c61ddcc5e8a2dabede0f3b482cd9aea9434d")
    check("hash.sha256(\"hello\")",
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
    check("encoding.b64encode(\"hello\")", "aGVsbG8=")
    check("encoding.b64decode(\"aGVsbG8=\")", "hello")
    assert(eval("hash(user_id)") != null)
  }

  test("json builtins") {
    check("json.jmespath('{\"name\":\"aaron\"}', \"name\")", "aaron")
    check("json.jmespath('{\"a\":{\"b\":2}}', \"a.b\")", "2")
  }

  test("remaining url/useragent builtins") {
    assert(eval("domains(\"www.google.com/blog\", \"http://www.lytics.io\")")
      .asInstanceOf[collection.Seq[String]].toSet == Set("google.com", "lytics.io"))
    assert(eval("hosts(\"www.google.com/blog\", \"http://www.lytics.io\")")
      .asInstanceOf[collection.Seq[String]].toSet == Set("www.google.com", "www.lytics.io"))
    assert(eval("qsl(\"http://x.com/?a=1&a=2&b=3\", \"a\")")
      .asInstanceOf[collection.Seq[String]] == Seq("1", "2"))
    check("qs2(\"http://x.com/?u=a%20b\", \"u\")", "a%20b")
    check("url.matchqs(\"http://x.com/p?a=1&b=2&c=3\", \"a\", \"c\")", "http://x.com/p?a=1&c=3")
    check("useragent(\"Mozilla/5.0 (Windows NT 10.0) Chrome/91.0\", \"browser\")", "Chrome")
    check("useragent(\"Mozilla/5.0 (Windows NT 10.0) Chrome/91.0\", \"os\")", "Windows")
    assert(eval("useragent.map(\"Mozilla/5.0 (Macintosh; Mac OS X) Safari/605\")")
      .asInstanceOf[collection.Map[String, String]]("os") == "Mac OS")
    assert(eval("uuid()").asInstanceOf[String].length == 36)
  }

  test("remaining map/time builtins") {
    assert(eval("map(\"k\", 5)").asInstanceOf[collection.Map[String, Long]].toMap == Map("k" -> 5L))
    assert(eval("maptime(\"ev\", \"2015-12-18 00:00:00\")")
      .asInstanceOf[collection.Map[String, java.sql.Timestamp]]("ev") ==
        java.sql.Timestamp.valueOf("2015-12-18 00:00:00"))
    assert(eval("mapinvert(map(\"k\", \"v\"))")
      .asInstanceOf[collection.Map[String, String]].toMap == Map("v" -> "k"))
    check("yymm(\"2015-12-18\")", "1512")
    check("hourofweek(\"2015-12-18 02:00:00\")", 122L) // Friday(5)*24+2
    check("unixtrunc(\"2009-11-10 23:00:00\")", "1257894000")
    check("unixtrunc(\"2009-11-10 23:00:00\", \"ms\")", "1257894000000")
    check("todatein(\"2016-02-03 22:00:00\", \"America/Los_Angeles\")",
      java.sql.Timestamp.valueOf("2016-02-04 06:00:00")) // PST = UTC-8
  }

  test("match builtin collects prefixed fields") {
    // match("bval") over the fixture row → {t: true, f: false} stripped keys
    val m = eval("match(\"bval\")").asInstanceOf[collection.Map[String, String]].toMap
    assert(m == Map("t" -> "true", "f" -> "false"))
  }

  test("user-registered function (expr.FuncAdd parity)") {
    FuncRegistry.add("email_is_valid", returnType =
      Some(org.apache.spark.sql.types.BooleanType))(a =>
      org.apache.spark.sql.functions.regexp_like(
        a.head.cast(org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.functions.lit("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$")))
    check("email_is_valid(email)", true)
    check("email_is_valid(\"not_an_email\")", false)
  }

  test("coercion corner cases") {
    check("10 > \"9\"", true)        // numeric compare, not lexicographic
    check("\"10\" == 10", true)
    check("\"2\" < 10", true)        // "2" < "10" would be false as strings
    check("empty IS NULL", true)
    check("user_id IS NOT NULL", true)
    check("str5 + 1", 6.0)           // string+number coerces numeric
    check("tobool(\"1\")", true)     // "1"/"0" accepted like Go strconv.ParseBool
    check("toint(3.7)", 3L)          // truncation toward zero
  }

  test("arithmetic edge parity") {
    check("\"a\" + \"b\"", "ab")        // string + string concatenates
    check("9.5 % 4", 1L)                // % truncates operands to int (vm.go:976-978)
    check("-int5", -5L)
    check("int5 + NULL", null)          // null propagation
  }

  test("approx distinct tracks exact within tolerance") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val exact = docs.select(org.apache.spark.sql.functions.countDistinct(
      org.apache.spark.sql.functions.col("source"))).head().getLong(0)
    val approx = docs.select(org.apache.spark.sql.functions.approx_count_distinct(
      org.apache.spark.sql.functions.col("source"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"approx=$approx exact=$exact")
  }

  test("parse errors") {
    assertThrows[ParseException](ExprParser.parse("5 +"))
    assertThrows[ParseException](ExprParser.parse("AND AND"))
    assertThrows[BuildException](eval("nosuchfunc(5)"))
  }
}
