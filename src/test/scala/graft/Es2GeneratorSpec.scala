package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.generators.Es2Generator
import graft.generators.Es2Generator.{AnyColumns, EsField, MapColumns}
import graft.rel.{FilterStatement, SqlParser}

/** FilterQL → Elasticsearch 2.x filter DSL (SURVEY §2.11), mirroring
  * generators/elasticsearch/es2gen in the reference: schema-aware field
  * resolution (missing column ⇒ logical false, es2gen/schema.go +
  * esgenerator.go:99-105), ES2 combinator shapes (estypes.go:28-30),
  * entity-map nesting, and the timewindow() segment function. */
class Es2GeneratorSpec extends AnyFunSuite {

  private val cols = MapColumns(Map(
    "name" -> EsField("name"),
    "age" -> EsField("age", typ = "int"),
    "state" -> EsField("state"),
    "url" -> EsField("url"),
    "visits" -> EsField("visits", typ = "map_time", path = "timebucket_visits"),
    "map_events" -> EsField("map_events", typ = "map_value", path = "map_events")))

  private def parse(q: String): FilterStatement = SqlParser.parse(q) match {
    case f: FilterStatement => f
    case other => fail(s"not a filter statement: $other")
  }
  private def gen(q: String): String = Es2Generator.walk(parse(q), cols)

  test("es2 combinators: AND→bool.filter, OR→bool.should, scalar must_not") {
    assert(gen("FILTER AND(age > 21, state = \"CA\")") ==
      """{"size":0,"filter":{"bool":{"filter":[{"range":{"age":{"gt":21}}},{"term":{"state":"CA"}}]}}}""")
    assert(gen("FILTER OR(age >= 10, age <= 2)") ==
      """{"size":0,"filter":{"bool":{"should":[{"range":{"age":{"gte":10}}},{"range":{"age":{"lte":2}}}]}}}""")
    // NotFilter takes ONE filter, not an array (es2gen/estypes.go:30)
    assert(gen("FILTER name != \"bob\"") ==
      """{"size":0,"filter":{"bool":{"must_not":{"term":{"name":"bob"}}}}}""")
  }

  test("single-operand booleans collapse to the operand (esgenerator.go:175-178)") {
    assert(gen("FILTER AND(age > 21)") ==
      """{"size":0,"filter":{"range":{"age":{"gt":21}}}}""")
  }

  test("missing columns compile to logical false, not an error") {
    // under an AND the vanished column poisons only its own branch
    assert(gen("FILTER vanished = \"x\"") ==
      s"""{"size":0,"filter":${Es2Generator.MatchNone}}""")
    assert(gen("FILTER OR(state = \"CA\", vanished = \"x\")") ==
      """{"size":0,"filter":{"bool":{"should":[{"term":{"state":"CA"}},""" +
        """{"bool":{"must_not":{"match_all":{}}}}]}}}""")
  }

  test("numeric columns coerce string range literals (bridgeutil.go:68-77)") {
    assert(gen("FILTER age > \"21\"") ==
      """{"size":0,"filter":{"range":{"age":{"gt":21}}}}""")
    // non-numeric column keeps the string
    assert(gen("FILTER name > \"21\"") ==
      """{"size":0,"filter":{"range":{"name":{"gt":"21"}}}}""")
    // non-finite parses ("NaN"/"Infinity") must stay quoted — a bare
    // NaN token is invalid JSON
    assert(gen("FILTER age > \"NaN\"") ==
      """{"size":0,"filter":{"range":{"age":{"gt":"NaN"}}}}""")
    assert(gen("FILTER age > \"Infinity\"") ==
      """{"size":0,"filter":{"range":{"age":{"gt":"Infinity"}}}}""")
  }

  test("BETWEEN emits the ES2 and-array, exclusive bounds") {
    assert(gen("FILTER age BETWEEN 18 AND 65") ==
      """{"size":0,"filter":{"and":[{"range":{"age":{"gt":18}}},{"range":{"age":{"lt":65}}}]}}""")
  }

  test("wildcards wrap in query (estypes.go:150-152) and anchor bare values") {
    assert(gen("FILTER url LIKE \"%google%\"") ==
      """{"size":0,"filter":{"query":{"wildcard":{"url":"*google*"}}}}""")
    assert(gen("FILTER url CONTAINS \"rug\"") ==
      """{"size":0,"filter":{"query":{"wildcard":{"url":"*rug*"}}}}""")
  }

  test("entity-map fields nest with the k-term (estypes.go:93-105, schema.go:34-46)") {
    // legacy `path.field` resolution: map_events.open → path=map_events
    assert(gen("FILTER map_events.open = \"x\"") ==
      """{"size":0,"filter":{"nested":{"filter":{"and":[{"term":{"map_events.v":"x"}},""" +
        """{"term":{"map_events.k":"open"}}]},"path":"map_events"}}}""")
    assert(gen("FILTER EXISTS map_events.open") ==
      """{"size":0,"filter":{"nested":{"filter":{"term":{"map_events.k":"open"}},"path":"map_events"}}}""")
  }

  test("timewindow() compiles to the nested time-bucket filter") {
    val f = parse("FILTER timewindow(visits, 1, 3)")
    val js = Es2Generator.walk(f, cols, epochDay = 16916L)
    assert(js ==
      """{"size":0,"filter":{"nested":{"filter":{"and":[""" +
        """{"term":{"visits.threshold":"1"}},{"term":{"visits.window":"3"}},""" +
        """{"range":{"visits.enter":{"lte":16916}}},{"range":{"visits.exit":{"gte":16916}}}]},""" +
        """"path":"visits"}}}""")
  }

  test("IN → terms; EXISTS → exists; match-all; size from LIMIT") {
    assert(gen("FILTER state IN (\"CA\", \"OR\")") ==
      """{"size":0,"filter":{"terms":{"state":["CA","OR"]}}}""")
    assert(gen("FILTER EXISTS name") ==
      """{"size":0,"filter":{"exists":{"field":"name"}}}""")
    assert(gen("FILTER *") == """{"size":0,"filter":{"match_all":{}}}""")
    assert(gen("FILTER age > 5 LIMIT 50").startsWith("""{"size":50,"""))
  }

  test("INCLUDE inlines; unsupported functions raise qlindex errors") {
    val inc = (n: String) =>
      if (n == "adults") Some(parse("FILTER age >= 18").filter) else None
    assert(Es2Generator.walk(parse("FILTER AND(state = \"CA\", INCLUDE adults)"), cols, inc) ==
      """{"size":0,"filter":{"bool":{"filter":[{"term":{"state":"CA"}},{"range":{"age":{"gte":18}}}]}}}""")
    val e = intercept[IllegalArgumentException](
      Es2Generator.walk(parse("FILTER frobnicate(age, 1)"), AnyColumns))
    assert(e.getMessage.startsWith("qlindex:") && e.getMessage.contains("frobnicate"))
  }
}
