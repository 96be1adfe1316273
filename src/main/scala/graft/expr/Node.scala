package graft.expr

/** Expression AST for the qlbridge expression language.
  *
  * Shape mirrors the reference's node taxonomy (see
  * /root/reference/expr/node.go:170-312: IdentityNode, StringNode,
  * NumberNode, ValueNode, BinaryNode, BooleanNode, TriNode, UnaryNode,
  * FuncNode, IncludeNode, ArrayNode, NullNode) — re-expressed as Scala
  * case classes. Evaluation is NOT a tree-walking VM: `ColumnBuilder`
  * compiles a Node to an `org.apache.spark.sql.Column`, so every
  * expression runs inside Catalyst/whole-stage codegen.
  */
sealed trait Node {
  /** Round-trippable text form (used by tests and error messages). */
  def text: String
}

private[expr] object NodeText {
  /** Escape a string literal so the printed form re-lexes to the same
    * value: backslashes first (the lexer collapses `\\`), then embedded
    * quotes by doubling. */
  def quote(v: String): String =
    "\"" + v.replace("\\", "\\\\").replace("\"", "\"\"") + "\""

  /** Parenthesize compound operands so precedence/associativity survive
    * the round-trip (`(a + b) * 2` must not print as `a + b * 2`). */
  def wrap(n: Node): String = n match {
    case _: BinaryNode | _: BooleanNode | _: TriNode => "(" + n.text + ")"
    case _ => n.text
  }
}

/** `user_id`, `t.column`, backtick-quoted identifiers. `parts` keeps the
  * dotted path: Seq("t","column") or Seq("hits") etc. */
final case class IdentityNode(parts: Seq[String]) extends Node {
  def name: String = parts.mkString(".")
  /** Re-quotes parts that are not plain identifiers via the shared
    * [[StringUtil.identityMaybeQuote]] policy, so `text` always
    * re-parses to the same node. `*` and `@`/`@@` var references pass
    * through (quoting them would lose their lexer role). */
  def text: String = parts.map { p =>
    if (p == "*" || p.startsWith("@")) p else StringUtil.identityMaybeQuote('`', p)
  }.mkString(".")
}
object IdentityNode { def apply(name: String): IdentityNode = IdentityNode(name.split('.').toSeq) }

/** String literal. `text` re-escapes backslashes and embedded quotes
  * (doubling, the dialect's escape form) so the printed form always
  * re-lexes — including values ending in a backslash. */
final case class StringNode(v: String) extends Node {
  def text = NodeText.quote(v)
}
final case class NumberNode(d: Double, isInt: Boolean) extends Node {
  def text: String = if (isInt) d.toLong.toString else d.toString
}
final case class BoolNode(v: Boolean) extends Node { def text = v.toString }
case object NullNode extends Node { def text = "NULL" }
final case class ArrayNode(items: Seq[Node]) extends Node {
  def text: String = items.map(_.text).mkString("[", ", ", "]")
}

/** Binary operator: arithmetic (+ - * / %), comparison (= == != <> > >=
  * < <=), LIKE / CONTAINS / IN / INTERSECTS. `negated` covers NOT LIKE,
  * NOT IN, … */
final case class BinaryNode(op: String, l: Node, r: Node, negated: Boolean = false) extends Node {
  def text: String =
    // null-safe comparison prints its SQL surface form (re-parses);
    // `negated` is the NOT of IS NOT DISTINCT FROM
    if (op == "ISDISTINCT")
      s"${NodeText.wrap(l)} IS ${if (negated) "NOT " else ""}DISTINCT FROM ${NodeText.wrap(r)}"
    else
      s"${NodeText.wrap(l)} ${if (negated) "NOT " else ""}$op ${NodeText.wrap(r)}"
}

/** N-ary AND / OR (the reference's BooleanNode, expr/node.go). */
final case class BooleanNode(op: String, args: Seq[Node], negated: Boolean = false) extends Node {
  def text: String = args.map(_.text).mkString(s"${if (negated) "NOT " else ""}$op (", ", ", ")")
}

/** `!expr`, `NOT expr`, `-expr`, `EXISTS ident`. */
final case class UnaryNode(op: String, child: Node) extends Node {
  def text = s"$op ${NodeText.wrap(child)}"
}

/** `x BETWEEN a AND b` — reference semantics are EXCLUSIVE on both ends
  * (/root/reference/vm/vm.go:868). */
final case class TriNode(op: String, a: Node, b: Node, c: Node, negated: Boolean = false) extends Node {
  def text = s"${NodeText.wrap(a)} ${if (negated) "NOT " else ""}$op " +
    s"${NodeText.wrap(b)} AND ${NodeText.wrap(c)}"
}

/** Function call; name may be dotted (`string.uppercase`). */
final case class FuncNode(name: String, args: Seq[Node]) extends Node {
  def text: String = args.map(_.text).mkString(s"$name(", ", ", ")")
}

/** `CASE [operand] WHEN … THEN … [ELSE …] END` — searched and simple
  * forms; the simple form desugars to `operand == v` per branch at
  * parse time, so only the searched shape exists in the tree (and in
  * the printed text — semantically lossless). Beyond the reference
  * dialect (qlbridge has no CASE). */
final case class CaseNode(branches: Seq[(Node, Node)], elseNode: Option[Node]) extends Node {
  def text: String = "CASE " +
    branches.map { case (c, v) => s"WHEN ${c.text} THEN ${v.text}" }.mkString(" ") +
    elseNode.map(e => s" ELSE ${e.text}").getOrElse("") + " END"
}

/** Window-function application: `func(args) OVER (PARTITION BY …
  * ORDER BY … [ASC|DESC] [ROWS|RANGE BETWEEN … AND …])` — beyond the
  * reference dialect (qlbridge has no OVER; its engine evaluates
  * row-at-a-time and cannot see a partition), planned onto Spark's
  * Window operator. `frame` is (unit, start, end) with the Spark
  * sentinels Long.MinValue = UNBOUNDED PRECEDING, 0 = CURRENT ROW,
  * Long.MaxValue = UNBOUNDED FOLLOWING; None = Spark's default frame
  * (what running aggregates mean). Frames apply to aggregate window
  * functions only — ranking/offset functions refuse one loudly. */
final case class WindowNode(func: FuncNode, partitionBy: Seq[Node],
    orderBy: Seq[(Node, Boolean)],
    frame: Option[(String, Long, Long)] = None,
    ref: Option[String] = None) extends Node {
  // `ref` names a window from the statement's WINDOW clause (`OVER w`);
  // the SQL parser substitutes the definition before planning, so a
  // populated ref never reaches the planner.
  private def bound(v: Long, following: String): String = v match {
    case Long.MinValue => "UNBOUNDED PRECEDING"
    case Long.MaxValue => "UNBOUNDED FOLLOWING"
    case 0 => "CURRENT ROW"
    case n if n < 0 => s"${-n} PRECEDING"
    case n => s"$n $following"
  }
  def text: String = {
    if (ref.isDefined) return s"${func.text} OVER ${ref.get}"
    val clauses = Seq(
      if (partitionBy.nonEmpty)
        Some("PARTITION BY " + partitionBy.map(_.text).mkString(", "))
      else None,
      if (orderBy.nonEmpty)
        Some("ORDER BY " + orderBy.map { case (n, asc) =>
          n.text + (if (asc) " ASC" else " DESC") }.mkString(", "))
      else None,
      frame.map { case (u, s, e) =>
        s"$u BETWEEN ${bound(s, "FOLLOWING")} AND ${bound(e, "FOLLOWING")}" })
      .flatten
    s"${func.text} OVER (${clauses.mkString(" ")})"
  }
}

/** Captured `(SELECT …)` token stream appearing inside an expression
  * (e.g. `WHERE x IN (SELECT …)`) — parsed lazily by the SQL layer.
  * The reference parses this shape but never implemented it
  * (plan/planner_select.go:95-98); Spark gives it via left_semi. */
final case class SubqueryNode(tokens: Vector[Lexer.Token]) extends Node {
  /** Tokens are re-quoted by kind when printing: TString values regain
    * their quotes (and escapes), non-plain identifiers their backticks —
    * otherwise `IN (SELECT y FROM u WHERE n = "bob")` would print `bob`
    * as a bare identifier and re-parse to a different query. */
  def text: String = "(" + tokens.map { t =>
    t.kind match {
      case Lexer.TString => NodeText.quote(t.text)
      case Lexer.TIdent => IdentityNode(Seq(t.text)).text
      case _ => t.text
    }
  }.mkString(" ") + ")"
}

/** `INCLUDE name` — splice of a named stored filter (FilterQL). */
final case class IncludeNode(name: String, negated: Boolean = false) extends Node {
  def text = s"${if (negated) "NOT " else ""}INCLUDE $name"
}

object Node {
  /** Every INCLUDE name referenced anywhere in the tree, depth-first in
    * source order (the reference's expr.FindIncludes,
    * expr/include.go — used to pre-resolve named filters before
    * evaluation). */
  def findIncludes(n: Node): Seq[String] = n match {
    case IncludeNode(name, _) => Seq(name)
    case BinaryNode(_, l, r, _) => findIncludes(l) ++ findIncludes(r)
    case BooleanNode(_, args, _) => args.flatMap(findIncludes)
    case UnaryNode(_, c) => findIncludes(c)
    case TriNode(_, a, b, c, _) => findIncludes(a) ++ findIncludes(b) ++ findIncludes(c)
    case FuncNode(_, args) => args.flatMap(findIncludes)
    case ArrayNode(items) => items.flatMap(findIncludes)
    case CaseNode(bs, e) =>
      bs.flatMap { case (c, v) => findIncludes(c) ++ findIncludes(v) } ++
        e.toSeq.flatMap(findIncludes)
    case WindowNode(f, parts, ord, _, _) =>
      findIncludes(f) ++ parts.flatMap(findIncludes) ++ ord.flatMap(o => findIncludes(o._1))
    case _ => Nil
  }
}
