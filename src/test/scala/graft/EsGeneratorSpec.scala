package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.generators.EsGenerator
import graft.rel.{FilterStatement, SqlParser}

/** FilterQL → Elasticsearch query-DSL generator (SURVEY §2.11),
  * mirroring the mapping in the reference's
  * generators/elasticsearch/esgen (esgenerator.go, bridgeutil.go). */
class EsGeneratorSpec extends AnyFunSuite {

  private def gen(q: String): String = SqlParser.parse(q) match {
    case f: FilterStatement => EsGenerator.walk(f)
    case other => fail(s"not a filter statement: $other")
  }

  test("term, range, and bool connectives") {
    assert(gen("FILTER name == \"bob\"") ==
      """{"size":0,"filter":{"term":{"name":"bob"}}}""")
    assert(gen("FILTER AND(age > 21, state = \"CA\")") ==
      """{"size":0,"filter":{"bool":{"must":[{"range":{"age":{"gt":21}}},{"term":{"state":"CA"}}]}}}""")
    assert(gen("FILTER OR(x >= 1.5, y <= 2)") ==
      """{"size":0,"filter":{"bool":{"should":[{"range":{"x":{"gte":1.5}}},{"range":{"y":{"lte":2}}}]}}}""")
  }

  test("negation forms wrap in must_not") {
    assert(gen("FILTER NOT name == \"bob\"") ==
      """{"size":0,"filter":{"bool":{"must_not":[{"term":{"name":"bob"}}]}}}""")
    assert(gen("FILTER name != \"bob\"") ==
      """{"size":0,"filter":{"bool":{"must_not":[{"term":{"name":"bob"}}]}}}""")
  }

  test("wildcard: LIKE maps % to *, bare CONTAINS wraps *v*") {
    assert(gen("FILTER url LIKE \"%google%\"") ==
      """{"size":0,"filter":{"wildcard":{"url":"*google*"}}}""")
    // mid-pattern glob: % converts, then wcFunc anchors the bare ends
    assert(gen("FILTER url LIKE \"api%v1\"") ==
      """{"size":0,"filter":{"wildcard":{"url":"*api*v1*"}}}""")
    assert(gen("FILTER title CONTAINS \"rug\"") ==
      """{"size":0,"filter":{"wildcard":{"title":"*rug*"}}}""")
  }

  test("IN/INTERSECTS → terms; EXISTS → exists; match-all forms") {
    assert(gen("FILTER state IN (\"CA\", \"OR\", \"WA\")") ==
      """{"size":0,"filter":{"terms":{"state":["CA","OR","WA"]}}}""")
    assert(gen("FILTER tags INTERSECTS (\"a\", \"b\")") ==
      """{"size":0,"filter":{"terms":{"tags":["a","b"]}}}""")
    assert(gen("FILTER EXISTS email") ==
      """{"size":0,"filter":{"exists":{"field":"email"}}}""")
    assert(gen("FILTER *") == """{"size":0,"filter":{"match_all":{}}}""")
  }

  test("BETWEEN is the engine's exclusive form: range gt/lt under must") {
    assert(gen("FILTER age BETWEEN 18 AND 65") ==
      """{"size":0,"filter":{"bool":{"must":[{"range":{"age":{"gt":18}}},{"range":{"age":{"lt":65}}}]}}}""")
  }

  test("LIMIT lands in size; INCLUDE inlines through the includer") {
    assert(gen("FILTER x > 5 LIMIT 100").startsWith("""{"size":100,"""))
    val inc = (n: String) =>
      if (n == "adults") Some(SqlParser.parse("FILTER age >= 18") match {
        case f: FilterStatement => f.filter
      }) else None
    val f = SqlParser.parse("FILTER AND(state = \"CA\", INCLUDE adults)")
      .asInstanceOf[FilterStatement]
    assert(EsGenerator.walk(f, inc) ==
      """{"size":0,"filter":{"bool":{"must":[{"term":{"state":"CA"}},{"range":{"age":{"gte":18}}}]}}}""")
  }

  test("unsupported surfaces raise qlindex errors, never wrong queries") {
    val e1 = intercept[IllegalArgumentException](gen("FILTER x + 1 > 2"))
    assert(e1.getMessage.startsWith("qlindex:"))
    val e2 = intercept[IllegalArgumentException](
      gen("FILTER INCLUDE missing"))
    assert(e2.getMessage.contains("INCLUDE"))
  }
}
