package graft.generators

import graft.expr._
import graft.rel.FilterStatement

/** FilterQL → Elasticsearch 2.x filter-DSL JSON — the reference's second
  * generator dialect (`generators/elasticsearch/es2gen/esgenerator.go`,
  * `es2gen/bridgeutil.go`, `es2gen/estypes.go`, `es2gen/schema.go`).
  * Where [[EsGenerator]] ports the modern bool/must shapes, this variant
  * reproduces what es2gen emits for ES 2.x clusters, and — the bigger
  * semantic difference — is SCHEMA-AWARE:
  *
  *  - a [[Columns]] catalog resolves every identity to an ES field
  *    descriptor (es2gen/schema.go:12-49, incl. the legacy `path.field`
  *    split for entity-map fields); a missing column compiles to
  *    logical FALSE — `{"bool":{"must_not":{"match_all":{}}}}` —
  *    instead of an error (esgenerator.go:99-105 MissingFieldError →
  *    MatchNone), so stored segments keep working as schemas drift.
  *  - AND → `{"bool":{"filter":[…]}}`, OR → `{"bool":{"should":[…]}}`,
  *    NOT → `{"bool":{"must_not":…}}` with a SCALAR inner filter
  *    (es2gen/estypes.go:28-30); single-operand booleans collapse to
  *    the operand (esgenerator.go:175-178).
  *  - entity-map ("nested") fields wrap in
  *    `{"nested":{"filter":…,"path":p}}` with a `p.k` key term
  *    (estypes.go:93-105); BETWEEN emits the ES2 `{"and":[…]}` array
  *    (bridgeutil.go:152-178); wildcards wrap as
  *    `{"query":{"wildcard":…}}` (estypes.go:150-152).
  *  - range comparisons against numeric columns coerce string literals
  *    to numbers (bridgeutil.go:68-77).
  *  - the `timewindow(field, threshold, window)` segment function
  *    compiles to the nested time-bucket filter keyed on the generator
  *    timestamp's day bucket (esgenerator.go:297-331,
  *    bridgeutil.go:242-281).
  */
object Es2Generator {

  /** ES field descriptor (gentypes.FieldType ≙): `path` non-empty marks
    * an entity-map field stored as `{path: [{k: field, v/f/b/t: …}]}`;
    * `prefix` is the value-subfield key ("v", "f", "b", "t"). */
  final case class EsField(field: String, typ: String = "string",
      path: String = "", prefix: String = "v") {
    def nested: Boolean = path.nonEmpty
    def numeric: Boolean = typ == "int" || typ == "number"
    def pathAndPrefix: String = s"$path.$prefix"
  }

  /** Column catalog (gentypes.SchemaColumns ≙). */
  trait Columns { def columnInfo(name: String): Option[EsField] }

  /** Catalog over a plain field→descriptor map with the reference's
    * legacy `path.field` fallback (es2gen/schema.go:34-46). */
  final case class MapColumns(cols: Map[String, EsField]) extends Columns {
    def columnInfo(name: String): Option[EsField] =
      cols.get(name).orElse {
        name.split("\\.", 2) match {
          case Array(path, fld) if fld.nonEmpty =>
            cols.get(path).map(c => c.copy(field = fld, path = path))
          case _ => None
        }
      }
  }

  /** Accept-everything catalog for schemaless use. */
  object AnyColumns extends Columns {
    def columnInfo(name: String): Option[EsField] = Some(EsField(name))
  }

  val MatchAll = """{"match_all":{}}"""
  val MatchNone = s"""{"bool":{"must_not":$MatchAll}}"""

  /** signals a field absent from [[Columns]] — converted to MatchNone
    * at the enclosing expression (gentypes.MissingFieldError ≙). */
  private final class MissingField(val name: String) extends RuntimeException(name)

  /** Full payload `{"size":n,"filter":…}` for a FILTER statement.
    * `epochDay` anchors timewindow() (DayBucket(ts) — esgenerator.go:28-30). */
  def walk(stmt: FilterStatement, columns: Columns = AnyColumns,
      includer: String => Option[Node] = _ => None,
      epochDay: Long = 0L): String =
    s"""{"size":${stmt.limit.getOrElse(0)},"filter":${walkExpr(stmt.filter, columns, includer, epochDay)}}"""

  /** Filter JSON for a bare expression; missing fields become MatchNone
    * here, mirroring walkExpr's per-node conversion. */
  def walkExpr(node: Node, columns: Columns = AnyColumns,
      includer: String => Option[Node] = _ => None,
      epochDay: Long = 0L): String =
    try gen(node, columns, includer, epochDay)
    catch { case _: MissingField => MatchNone }

  private def gen(node: Node, columns: Columns,
      includer: String => Option[Node], epochDay: Long): String = {
    // every child hop converts its own missing fields (walkExpr tail,
    // esgenerator.go:99-105) — so an OR over a vanished column still
    // matches its other branches. NOTE: es2gen's booleanExpr carries a
    // skip-in-OR / collapse-AND-to-MatchNone branch for
    // MissingFieldError, but it is DEAD code — its args go through the
    // inner walkExpr, whose tail converts the error to an inline
    // MatchNone first. The observable reference behavior is the inline
    // conversion, which this port matches; don't "fix" it to the dead
    // branch's semantics.
    def walk(n: Node): String =
      try gen(n, columns, includer, epochDay)
      catch { case _: MissingField => MatchNone }

    def field(n: Node): EsField = n match {
      case IdentityNode(parts) =>
        val name = parts.mkString(".")
        columns.columnInfo(name).getOrElse(throw new MissingField(name))
      case other => fail(s"expected a field identity, found: ${other.text}")
    }

    node match {
      case IdentityNode(Seq("*")) | IdentityNode(Seq("match_all")) | BoolNode(true) =>
        MatchAll
      case IncludeNode(name, negated) =>
        val inner = includer(name).getOrElse(fail(s"could not resolve INCLUDE '$name'"))
        neg(negated, walk(inner))
      case UnaryNode("EXISTS", f) =>
        val ft = field(f)
        if (ft.nested) nested(ft.path, term(s"${ft.path}.k", jstr(ft.field)))
        else s"""{"exists":{"field":${jstr(ft.field)}}}"""
      case UnaryNode("NOT" | "!", child) => mustNot(walk(child))
      case BooleanNode(op, args, negated) =>
        val occur = op match {
          case "AND" => "filter"
          case "OR"  => "should"
          case other => fail(s"unexpected op $other")
        }
        val items = args.map(walk)
        neg(negated,
          if (items.size == 1) items.head // collapse the useless bool
          else s"""{"bool":{"$occur":[${items.mkString(",")}]}}""")
      case BinaryNode(op, l, r, negated) =>
        neg(negated, binary(op, field(l), r))
      case TriNode("BETWEEN", f, lo, hi, negated) =>
        val ft = field(f)
        val ranges = Seq(range(ft, "gt", scalar(ft, lo)), range(ft, "lt", scalar(ft, hi)))
        val js =
          if (ft.nested) nested(ft.path, andArr(ranges :+ term("k", jstr(ft.field))))
          else andArr(ranges)
        neg(negated, js)
      case FuncNode("timewindow", Seq(f, NumberNode(th, true), NumberNode(w, true))) =>
        val ft = field(f)
        nested(ft.field, andArr(Seq(
          term(s"${ft.field}.threshold", jstr(th.toLong.toString)),
          term(s"${ft.field}.window", jstr(w.toLong.toString)),
          s"""{"range":{${jstr(s"${ft.field}.enter")}:{"lte":$epochDay}}}""",
          s"""{"range":{${jstr(s"${ft.field}.exit")}:{"gte":$epochDay}}}""")))
      case FuncNode("timewindow", args) =>
        fail(s"'timewindow' function requires (field, int, int), got ${args.map(_.text).mkString(", ")}")
      case FuncNode(name, _) => fail(s"unsupported function: $name")
      case other => fail(s"unsupported expression: ${other.text}")
    }
  }

  private def binary(op: String, ft: EsField, r: Node): String = op match {
    case "=" | "==" =>
      val v = scalar(ft, r)
      if (ft.nested) nested(ft.path, andArr(Seq(
        term(ft.pathAndPrefix, v), term(s"${ft.path}.k", jstr(ft.field)))))
      else term(ft.field, v)
    case "!=" | "<>" => mustNot(binary("=", ft, r))
    case ">" => range(ft, "gt", scalar(ft, r))
    case ">=" => range(ft, "gte", scalar(ft, r))
    case "<" => range(ft, "lt", scalar(ft, r))
    case "<=" => range(ft, "lte", scalar(ft, r))
    case "LIKE" | "CONTAINS" =>
      val raw = r match {
        case StringNode(v) => v
        case IdentityNode(parts) => parts.mkString(".")
        case NumberNode(d, isInt) => if (isInt) d.toLong.toString else d.toString
        case other => fail(s"unsupported non-string argument for $op pattern: ${other.text}")
      }
      val pat = wc(if (op == "LIKE") raw.replace('%', '*') else raw)
      val wcq = s"""{"query":{"wildcard":{${jstr(if (ft.nested) ft.pathAndPrefix else ft.field)}:${jstr(pat)}}}}"""
      if (ft.nested) nested(ft.path, andArr(Seq(wcq, term(s"${ft.path}.k", jstr(ft.field)))))
      else wcq
    case "IN" | "INTERSECTS" => r match {
      case ArrayNode(items) =>
        val vals = items.map(scalar(ft, _)).mkString(",")
        val terms = s"""{"terms":{${jstr(if (ft.nested) ft.pathAndPrefix else ft.field)}:[$vals]}}"""
        if (ft.nested) nested(ft.path, andArr(Seq(terms, term(s"${ft.path}.k", jstr(ft.field)))))
        else terms
      case other => fail(s"second argument to $op must be an array, found: ${other.text}")
    }
    case other => fail(s"unsupported binary expression: $other")
  }

  /** string literals against numeric columns coerce to numbers — ES 2.x
    * range filters don't compare "9.5" numerically (bridgeutil.go:68-77). */
  private def scalar(ft: EsField, n: Node): String = n match {
    case StringNode(v) =>
      // isFinite guard: toDoubleOption accepts "NaN"/"Infinity", whose
      // toString would emit bare NaN — invalid JSON; keep those quoted
      if (ft.numeric) v.toDoubleOption.filter(_.isFinite).map(d =>
        if (d.isValidInt || d == d.toLong) d.toLong.toString else d.toString
      ).getOrElse(jstr(v))
      else jstr(v)
    case NumberNode(d, isInt) => if (isInt) d.toLong.toString else d.toString
    case BoolNode(b) => b.toString
    case other => fail(s"non-scalar argument: ${other.text}")
  }

  private def wc(v: String): String =
    if (v.isEmpty || v.head == '*' || v.last == '*') v else s"*$v*"

  private def term(f: String, jsonVal: String): String =
    s"""{"term":{${jstr(f)}:$jsonVal}}"""
  private def range(ft: EsField, cmp: String, v: String): String =
    s"""{"range":{${jstr(ft.field)}:{"$cmp":$v}}}"""
  private def andArr(items: Seq[String]): String =
    s"""{"and":[${items.mkString(",")}]}"""
  private def nested(path: String, filter: String): String =
    s"""{"nested":{"filter":$filter,"path":${jstr(path)}}}"""
  private def mustNot(inner: String): String =
    s"""{"bool":{"must_not":$inner}}"""
  private def neg(negated: Boolean, js: String): String =
    if (negated) mustNot(js) else js

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
