package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{ExprParser, Lexer, BinaryNode, BooleanNode}

/** Expression-parser corpus from the reference's expr/parse_test.go
  * exprTests table: every expression it parses must parse here, its
  * invalid statements must fail, and the structural conventions
  * (NOT IN wrapping, n-ary boolean flattening) must hold.
  */
class ExprParseCorpusSpec extends AnyFunSuite {

  private def parse(s: String): graft.expr.Node = {
    val p = new ExprParser(Lexer.lex(s))
    val n = p.parseExpr()
    assert(p.atEof, s"trailing input in: $s")
    n
  }

  private val good = Seq(
    "`content table`.`Ford Motor Company` >= \"0.58\"",
    "content.`Ford Motor Company` >= \"0.58\"",
    """AND ( EXISTS x, EXISTS y)""",
    """AND ( EXISTS x, INCLUDE ref_name )""",
    """AND ( EXISTS x, INCLUDE ref_name, x == "y" AND ( EXISTS x, EXISTS y ) )""",
    """x = "y" AND ( EXISTS a OR EXISTS b)""",
    """NOT `fieldname` INTERSECTS ("hello")""",
    """company = "Toys R"" Us"""",
    """NOT INCLUDE name""",
    """eq(event,"stuff") OR ge(party, 1)""",
    """eq(event,"stuff") OR (ge(party, 1) AND true)""",
    """eq(event,"stuff") AND ge(party, 1)""",
    """item * 5""",
    """eq(toint(item),5)""",
    """eq(5,5)""",
    """oneof("1",item,4)""",
    """toint("1")""",
    """item IN "value1"""",
    """item NOT IN "value2"""",
    """NOT item IN "value3"""",
    """NOT 10 IN "value4"""",
    """"value5" IN ident""",
    """NOT (email IN ("hello"))""",
    """email IN ["hello"]""",
    """1 IN ident""",
    "`tablename` LIKE \"%\"",
    "`content.Ford Motor Company` >= \"0.58\"",
    """"value" IN hosts(@@content_whitelist_domains)""",
    """and (
      |  not(
      |    or (event IN ("rq", "ab") , product IN ("my", "app"))
      |  )
      |)""".stripMargin,
    """NOT(exists(@@content_whitelist_domains))
      |OR len(@@content_whitelist_domains) == 0""".stripMargin,
    """version == 4
      |AND (
      |  NOT(exists(@@content_whitelist_domains))
      |  OR len(@@content_whitelist_domains) == 0
      |  OR host(url) IN hosts(@@content_whitelist_domains)
      |)""".stripMargin,
    """OR (x == "y")""",
    """NOT OR (x == "y")""",
    """NOT AND (x == "y")""",
    """AND (x == "y" , AND ( stuff == x ))""")

  // Right side of INTERSECTS only allows identity|array|func
  private val bad = Seq(
    "`fieldname` INTERSECTS \"hello\"",
    "`fieldname` INTERSECTS false")

  test("reference expression corpus parses") {
    for (s <- good) {
      try parse(s)
      catch { case e: Exception => fail(s"should parse: $s\n  -> ${e.getMessage}") }
    }
  }

  test("reference invalid expressions fail to parse") {
    for (s <- bad) assertThrows[Exception](parse(s))
  }

  test("parse -> text -> parse is a fixpoint (reference TestExprRoundTrip)") {
    for (s <- good) {
      val t1 = parse(s).text
      val t2 = parse(t1).text
      assert(t1 == t2, s"round-trip diverged for: $s\n  1: $t1\n  2: $t2")
    }
  }

  test("findIncludes walks the whole tree (reference TestFindIncludes)") {
    val f = graft.rel.SqlParser.parse(
      """FILTER AND (
        |  name == "Yoda"
        |  INCLUDE yoda_sword
        |  NOT EXISTS email
        |  X between 4 and 5
        |  OR (
        |    INCLUDE return_of_the_jedi
        |  )
        |  "x" in (4,5,Z)
        |  email(email_name)
        |)
        |ALIAS yoda;""".stripMargin).asInstanceOf[graft.rel.FilterStatement]
    assert(graft.expr.Node.findIncludes(f.filter) ==
      Seq("yoda_sword", "return_of_the_jedi"))
  }

  test("NOT IN and n-ary forms keep the reference structure") {
    // item NOT IN x ≡ NOT (item IN x): the negation is carried on the node
    val n1 = parse("""item NOT IN "value2"""")
    assert(n1.asInstanceOf[BinaryNode].negated)
    // non-binary AND with paren groups: x = "y" AND (a OR b) flattens to
    // an n-ary AND of [compare, OR[...]] like the reference's printer
    val n2 = parse("""x = "y" AND ( EXISTS a OR EXISTS b)""")
    val and = n2.asInstanceOf[BooleanNode]
    assert(and.op == "AND" && and.args.size == 2, and)
    assert(and.args(1).asInstanceOf[BooleanNode].op == "OR", and)
    // nested same-op n-ary stays nested (args preserved)
    val n3 = parse("""AND ( EXISTS x, INCLUDE ref_name, x == "y" AND ( EXISTS x, EXISTS y ) )""")
    assert(n3.asInstanceOf[BooleanNode].args.size >= 3, n3)
  }
}
