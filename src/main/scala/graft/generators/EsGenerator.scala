package graft.generators

import graft.expr._
import graft.rel.FilterStatement

/** FilterQL/expression AST → Elasticsearch query-DSL JSON — the
  * reference's pushdown-to-foreign-backend exemplar
  * (`generators/elasticsearch/esgen/esgenerator.go:58-331`,
  * `bridgeutil.go:23-190`, `estypes.go:161-211`). SURVEY §2.11.
  *
  * Inside the Spark engine, pushdown itself is Catalyst's job (DSv2 /
  * JDBC); this generator exists for the OTHER use the reference serves:
  * compiling a stored FilterQL predicate into a query an external ES
  * cluster can run — e.g. pre-filtering a document corpus at its source
  * before it ever becomes a DataFrame, which at 100 TB is the cheapest
  * filter of all (the bytes never leave the index).
  *
  * Output mirrors the reference's filter JSON shapes:
  *  - `=`/`==` → `{"term":{f:v}}`; `!=` → must_not(term)
  *    (esgenerator.go:200-222)
  *  - `> >= < <=` → `{"range":{f:{"gt"|"gte"|"lt"|"lte":v}}}`
  *    (bridgeutil.go:113-131)
  *  - BETWEEN → bool.must of range gt/lt — exclusive, the engine-wide
  *    BETWEEN semantics (bridgeutil.go:139-190)
  *  - LIKE/CONTAINS → `{"wildcard":{f:pattern}}`; `%`→`*`, bare CONTAINS
  *    values wrapped `*v*` per wcFunc (esgenerator.go:223-250,
  *    estypes.go:179-191)
  *  - IN / INTERSECTS over a literal array → `{"terms":{f:[…]}}`
  *    (esgenerator.go:251-268)
  *  - AND/OR → bool.must / bool.should; NOT/negation → bool.must_not
  *    (esgenerator.go:141-186,129-138)
  *  - EXISTS f → `{"exists":{"field":f}}` (esgenerator.go:117-128)
  *  - `*` / `match_all` / TRUE → `{"match_all":{}}` (esgenerator.go:79-85)
  *  - INCLUDE name → resolved through the supplied includer and inlined
  *    (esgenerator.go:88-92)
  *
  * Anything outside this surface (arithmetic, scalar functions other
  * than the identity field) throws IllegalArgumentException with a
  * `qlindex:`-style message, matching the reference's explicit
  * unsupported errors rather than silently generating a wrong query.
  */
object EsGenerator {

  /** Full payload for a FILTER statement: `{"size":n,"filter":…}`
    * (gentypes/gen.go:51-52; size defaults to 0 like the reference's
    * always-allocated Size pointer). */
  def walk(stmt: FilterStatement,
      includer: String => Option[Node] = _ => None): String =
    s"""{"size":${stmt.limit.getOrElse(0)},"filter":${walkExpr(stmt.filter, includer)}}"""

  /** Filter JSON for a bare expression node. */
  def walkExpr(node: Node,
      includer: String => Option[Node] = _ => None): String = node match {
    case IdentityNode(Seq("*")) | IdentityNode(Seq("match_all")) | BoolNode(true) =>
      """{"match_all":{}}"""
    case IncludeNode(name, negated) =>
      val inner = includer(name).getOrElse(
        fail(s"could not resolve INCLUDE '$name'"))
      val js = walkExpr(inner, includer)
      if (negated) mustNot(js) else js
    case UnaryNode("EXISTS", IdentityNode(parts)) =>
      s"""{"exists":{"field":${jstr(parts.mkString("."))}}}"""
    case UnaryNode("NOT" | "!", child) =>
      mustNot(walkExpr(child, includer))
    case BooleanNode(op, args, negated) =>
      val occur = op match {
        case "AND" => "must"
        case "OR"  => "should"
        case other => fail(s"unsupported boolean connective: $other")
      }
      val js = s"""{"bool":{"$occur":[${args.map(walkExpr(_, includer)).mkString(",")}]}}"""
      if (negated) mustNot(js) else js
    case BinaryNode(op, l, r, negated) =>
      val js = binary(op, l, r)
      if (negated) mustNot(js) else js
    case TriNode("BETWEEN", f, lo, hi, negated) =>
      val fld = field(f)
      val js = s"""{"bool":{"must":[{"range":{${jstr(fld)}:{"gt":${scalar(lo)}}}},{"range":{${jstr(fld)}:{"lt":${scalar(hi)}}}}]}}"""
      if (negated) mustNot(js) else js
    case other =>
      fail(s"unsupported expression: ${other.text}")
  }

  private def binary(op: String, l: Node, r: Node): String = {
    lazy val fld = jstr(field(l))
    op match {
      case "=" | "==" => s"""{"term":{$fld:${scalar(r)}}}"""
      case "!=" | "<>" => mustNot(s"""{"term":{$fld:${scalar(r)}}}""")
      case ">"  => s"""{"range":{$fld:{"gt":${scalar(r)}}}}"""
      case ">=" => s"""{"range":{$fld:{"gte":${scalar(r)}}}}"""
      case "<"  => s"""{"range":{$fld:{"lt":${scalar(r)}}}}"""
      case "<=" => s"""{"range":{$fld:{"lte":${scalar(r)}}}}"""
      case "LIKE" =>
        s"""{"wildcard":{$fld:${jstr(wc(str(r).replace('%', '*')))}}}"""
      case "CONTAINS" =>
        s"""{"wildcard":{$fld:${jstr(wc(str(r)))}}}"""
      case "IN" | "INTERSECTS" => r match {
        case ArrayNode(items) =>
          s"""{"terms":{$fld:[${items.map(scalar).mkString(",")}]}}"""
        case other => fail(s"second argument to $op must be an array, found: ${other.text}")
      }
      case other => fail(s"unsupported binary expression: $other")
    }
  }

  /** wcFunc (estypes.go:179-191): values already anchored with a
    * leading or trailing `*` pass through; bare values search as
    * substrings. */
  private def wc(v: String): String =
    if (v.isEmpty || v.head == '*' || v.last == '*') v else s"*$v*"

  private def field(n: Node): String = n match {
    case IdentityNode(parts) => parts.mkString(".")
    case other => fail(s"expected a field identity, found: ${other.text}")
  }

  private def str(n: Node): String = n match {
    case StringNode(v) => v
    case NumberNode(d, isInt) => if (isInt) d.toLong.toString else d.toString
    case other => fail(s"expected a literal, found: ${other.text}")
  }

  private def scalar(n: Node): String = n match {
    case StringNode(v) => jstr(v)
    case NumberNode(d, isInt) => if (isInt) d.toLong.toString else d.toString
    case BoolNode(b) => b.toString
    case NullNode => "null"
    case other => fail(s"non-scalar argument: ${other.text}")
  }

  private def mustNot(inner: String): String =
    s"""{"bool":{"must_not":[$inner]}}"""

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"qlindex: $msg")
}
