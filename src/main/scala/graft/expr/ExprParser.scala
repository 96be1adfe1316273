package graft.expr

import Lexer._

/** Recursive-descent expression parser with MySQL-style precedence,
  * covering the qlbridge expression grammar
  * (/root/reference/expr/parse.go:280-320 behavior): n-ary AND/OR (both
  * infix and FilterQL function form `AND(a, b, …)`), NOT LIKE/IN/
  * CONTAINS/INTERSECTS/BETWEEN negation, EXISTS ident, INCLUDE name,
  * tuple and bracket array literals, dotted identifiers and dotted
  * function names (`string.uppercase`).
  */
final class ExprParser(tokens: Vector[Token]) {
  /** SQL-layer hook: when set (by the SQL parser), a function call
    * followed by OVER parses its window suffix IN PLACE, so window
    * expressions bind anywhere an expression does (nested arithmetic,
    * QUALIFY, ORDER BY) instead of only at select-column top level.
    * The pure-expression dialect (FilterQL) leaves it unset — OVER is
    * not part of that grammar. */
  var overSuffixHook: Option[Node => Node] = None
  private var p = 0
  private def cur: Token = tokens(p)
  private def advance(): Token = { val t = tokens(p); p += 1; t }
  private def expectOp(s: String): Unit =
    if (cur.kind == TOp && cur.text == s) p += 1
    else fail(s"expected '$s' but found '${cur.text}'")
  private def fail(msg: String): Nothing =
    throw ParseException(s"$msg (at pos ${cur.pos})")

  def pos: Int = p
  def setPos(np: Int): Unit = { p = np }
  def current: Token = cur
  def next(): Token = advance()
  def atEof: Boolean = cur.kind == TEof

  def parseFull(): Node = {
    val n = parseExpr()
    if (!atEof) fail(s"unexpected trailing input '${cur.text}'")
    n
  }

  def parseExpr(): Node = parseOr()

  private def parseOr(): Node = {
    val first = parseAnd()
    val items = collection.mutable.ArrayBuffer(first)
    var done = false
    while (!done && (cur.isKeyword("OR") || cur.is("||"))) {
      val save = p
      advance()
      parseAnd() match {
        case ArrayNode(_) if tokens(save).isKeyword("OR") => p = save; done = true
        case operand => items += operand
      }
    }
    if (items.size == 1) first else BooleanNode("OR", items.toSeq)
  }

  /** An infix AND/OR whose operand parses to a bare multi-expression
    * paren group (`AND ( a  b )`) is really the reference's PREFIX
    * boolean-DSL form starting a new list item — rewind and let the
    * enclosing list parse it (the reference separates such items by
    * newline; our lexer drops whitespace, so detect by shape). */
  private def parseAnd(): Node = {
    val first = parseNot()
    val items = collection.mutable.ArrayBuffer(first)
    var done = false
    while (!done && (cur.isKeyword("AND") || cur.is("&&"))) {
      val save = p
      advance()
      parseNot() match {
        case ArrayNode(_) if tokens(save).isKeyword("AND") => p = save; done = true
        case operand => items += operand
      }
    }
    if (items.size == 1) first else BooleanNode("AND", items.toSeq)
  }

  private def parseNot(): Node =
    if (cur.isKeyword("NOT") && !tokens(p + 1).is("(")) { advance(); UnaryNode("NOT", parseNot()) }
    else parseComparison()

  private val cmpOps = Set("==", "=", "!=", "<>", ">", ">=", "<", "<=")

  private def parseComparison(): Node = {
    val left = parseAdditive()
    var negated = false
    // NOT is infix negation only before a postfix operator keyword —
    // otherwise it begins the NEXT argument of a comma-less n-ary list
    // (`AND ( INCLUDE x  NOT EXISTS email )`, expr/include_test.go)
    if (cur.isKeyword("NOT") &&
        Seq("IN", "LIKE", "ILIKE", "CONTAINS", "INTERSECTS", "BETWEEN")
          .exists(tokens(p + 1).isKeyword)) { negated = true; advance() }
    if (cur.kind == TOp && cmpOps.contains(cur.text)) {
      if (negated) fail("NOT before comparison operator")
      val op = advance().text
      // quantified comparison `x > ANY|SOME|ALL (SELECT …)` — the op
      // string carries the quantifier ("> ANY"); SOME ≡ ANY (ANSI).
      // The SQL planner rewrites these onto one bounded aggregate of
      // the subquery (or a semi/anti join for = ANY / <> ALL).
      if ((cur.isKeyword("ANY") || cur.isKeyword("SOME") || cur.isKeyword("ALL")) &&
          p + 2 < tokens.length && tokens(p + 1).is("(") &&
          tokens(p + 2).isKeyword("SELECT")) {
        val q = if (advance().text.equalsIgnoreCase("ALL")) "ALL" else "ANY"
        BinaryNode(s"$op $q", left, captureSubquery())
      }
      // `x > (SELECT …)` and `x > (SELECT …) / 2` both parse through
      // parseAdditive — `(SELECT …)` is a PRIMARY (parsePrimary:
      // captureSubquery), so arithmetic may continue after it. (The
      // old dedicated capture here returned the subquery as the whole
      // right side and left `/ 2` as trailing input — r13 fix.)
      else BinaryNode(op, left, parseAdditive())
    } else if (cur.isKeyword("LIKE")) { advance(); BinaryNode("LIKE", left, parseAdditive(), negated) }
    else if (cur.isKeyword("ILIKE")) { advance(); BinaryNode("ILIKE", left, parseAdditive(), negated) }
    else if (cur.isKeyword("CONTAINS")) { advance(); BinaryNode("CONTAINS", left, parseAdditive(), negated) }
    else if (cur.isKeyword("INTERSECTS")) {
      advance()
      // parity: right side only allows identity|array|func
      // (expr/parse_test.go "Invalid Statements": INTERSECTS "hello",
      // INTERSECTS false must fail to parse). A paren list is an array
      // even with one element: INTERSECTS ("hello") is valid.
      val rhs =
        if (cur.is("(")) ArrayNode(parseParenList())
        else parseAdditive() match {
          case ok @ (_: IdentityNode | _: ArrayNode | _: FuncNode) => ok
          case _ => fail("INTERSECTS right side must be identity, array or function")
        }
      BinaryNode("INTERSECTS", left, rhs, negated)
    }
    else if (cur.isKeyword("IN")) {
      advance()
      if (cur.is("(") && tokens(p + 1).isKeyword("SELECT"))
        BinaryNode("IN", left, captureSubquery(), negated)
      else BinaryNode("IN", left, parseAdditive(), negated)
    }
    else if (cur.isKeyword("BETWEEN")) {
      advance()
      val lo = parseAdditive()
      if (!cur.isKeyword("AND")) fail("expected AND in BETWEEN")
      advance()
      TriNode("BETWEEN", left, lo, parseAdditive(), negated)
    } else if (cur.isKeyword("IS")) {
      advance()
      var neg = false
      if (cur.isKeyword("NOT")) { neg = true; advance() }
      if (cur.isKeyword("DISTINCT")) {
        // `x IS [NOT] DISTINCT FROM y` — null-safe comparison (ANSI);
        // builds to Spark's <=> (negated for the DISTINCT direction)
        advance()
        if (!cur.isKeyword("FROM")) fail("expected FROM after IS [NOT] DISTINCT")
        advance()
        BinaryNode("ISDISTINCT", left, parseAdditive(), neg)
      } else {
        if (!cur.isKeyword("NULL")) fail("expected NULL after IS")
        advance()
        BinaryNode("IS", left, NullNode, neg)
      }
    } else {
      if (negated) fail("dangling NOT")
      left
    }
  }

  private def parseAdditive(): Node = {
    var left = parseMultiplicative()
    while (cur.is("+") || cur.is("-")) {
      val op = advance().text
      left = BinaryNode(op, left, parseMultiplicative())
    }
    left
  }

  private def parseMultiplicative(): Node = {
    var left = parseUnary()
    while (cur.is("*") || cur.is("/") || cur.is("%")) {
      // '*' only binds as multiplication when something follows it that
      // can start an operand (protects `SELECT *` handled by SQL parser).
      val op = advance().text
      left = BinaryNode(op, left, parseUnary())
    }
    left
  }

  private def parseUnary(): Node = {
    if (cur.is("!")) { advance(); UnaryNode("!", parseUnary()) }
    else if (cur.is("-")) { advance(); UnaryNode("-", parseUnary()) }
    else if (cur.isKeyword("EXISTS")) {
      advance()
      // `EXISTS (SELECT …)` — subquery form (planned as a semi join /
      // existence gate by the SQL layer); `EXISTS ident` stays the
      // FilterQL field-presence test
      if (cur.is("(") && tokens(p + 1).isKeyword("SELECT"))
        UnaryNode("EXISTS", captureSubquery())
      else UnaryNode("EXISTS", parseUnary())
    }
    else parsePrimary()
  }

  private def parsePrimary(): Node = cur.kind match {
    case TNumber =>
      val t = advance().text
      if (t.startsWith("0x") || t.startsWith("0X"))
        NumberNode(
          try java.lang.Long.parseLong(t.drop(2), 16).toDouble
          catch { case _: NumberFormatException =>
            fail(s"invalid hex literal '$t'") },
          isInt = true)
      else {
        val isInt = !t.exists(c => c == '.' || c == 'e' || c == 'E')
        NumberNode(t.toDouble, isInt)
      }
    case TString => StringNode(advance().text)
    case TIdent =>
      val t = cur
      if (t.isKeyword("TRUE")) { advance(); BoolNode(true) }
      else if (t.isKeyword("FALSE")) { advance(); BoolNode(false) }
      else if (t.isKeyword("NULL")) { advance(); NullNode }
      else if (t.isKeyword("INCLUDE")) {
        advance()
        if (cur.kind != TIdent) fail("expected identifier after INCLUDE")
        IncludeNode(advance().text)
      } else if (t.isKeyword("INTERVAL") && p + 1 < tokens.length &&
          tokens(p + 1).kind == TNumber) {
        // `INTERVAL n UNIT` literal (ANSI): desugars to the
        // interval_lit builtin; `ts + INTERVAL 3 DAY` then builds to
        // Spark's native timestamp+interval arithmetic. Bare
        // `interval` stays an identifier (the guard requires a number).
        advance()
        val n = advance().text
        if (cur.kind != TIdent) fail("expected a unit after INTERVAL <n>")
        val unit = advance().text
        FuncNode("interval_lit", Seq(StringNode(n), StringNode(unit)))
      } else if (t.isKeyword("CASE")) {
        advance()
        // simple form carries an operand before the first WHEN;
        // searched form starts at WHEN directly
        val operand: Option[Node] =
          if (cur.isKeyword("WHEN")) None else Some(parseExpr())
        val branches = collection.mutable.ArrayBuffer[(Node, Node)]()
        while (cur.isKeyword("WHEN")) {
          advance()
          val v = parseExpr()
          val cond = operand match {
            case Some(op) => BinaryNode("==", op, v)
            case None => v
          }
          if (!cur.isKeyword("THEN")) fail("expected THEN in CASE")
          advance()
          branches += ((cond, parseExpr()))
        }
        if (branches.isEmpty) fail("CASE needs at least one WHEN")
        val els =
          if (cur.isKeyword("ELSE")) { advance(); Some(parseExpr()) } else None
        if (!cur.isKeyword("END")) fail("expected END to close CASE")
        advance()
        CaseNode(branches.toSeq, els)
      } else if (t.isKeyword("NOT") && tokens(p + 1).is("(")) {
        advance(); // FilterQL `NOT ( expr )` / `NOT(expr)`
        val args = parseParenList()
        if (args.size != 1) fail("NOT(...) takes one argument")
        UnaryNode("NOT", args.head)
      } else if ((t.isKeyword("AND") || t.isKeyword("OR")) && tokens(p + 1).is("(")) {
        val op = advance().text.toUpperCase // FilterQL n-ary form AND(a, b, …)
        BooleanNode(op, parseParenList())
      } else {
        // dotted name: ident (. ident)* — then func call or identity
        val parts = collection.mutable.ArrayBuffer(advance().text)
        while (cur.is(".") && tokens(p + 1).kind == TIdent) {
          advance(); parts += advance().text
        }
        if (cur.is("(")) {
          val name = parts.mkString(".")
          // ANSI EXTRACT(part FROM expr) — desugars to
          // extract_part("PART", expr); the reference's comma form
          // extract(ts, fmt) parses through the generic path below
          if (name.equalsIgnoreCase("extract") && p + 2 < tokens.length &&
              tokens(p + 1).kind == TIdent && tokens(p + 2).isKeyword("FROM")) {
            advance() // (
            val part = advance().text
            advance() // FROM
            val e = parseExpr()
            expectOp(")")
            return FuncNode("extract_part", Seq(StringNode(part.toUpperCase), e))
          }
          val fn = FuncNode(name.toLowerCase, parseParenList(allowStar = true))
          // SQL-standard aggregate filter `agg(args) FILTER (WHERE p)`
          // — desugared at parse time to agg(CASE WHEN p THEN arg END)
          // (count(*) counts a literal 1; DISTINCT wraps inside), so no
          // new node type reaches the planner and the printed text
          // re-parses. Disambiguated from FilterQL's `FROM t FILTER e`
          // by the mandatory `(WHERE` that follows.
          if (cur.isKeyword("FILTER") && p + 2 < tokens.length &&
              tokens(p + 1).is("(") && tokens(p + 2).isKeyword("WHERE")) {
            advance(); advance(); advance() // FILTER ( WHERE
            val pred = parseExpr()
            expectOp(")")
            if (!FuncRegistry.isAgg(fn.name))
              fail(s"FILTER (WHERE …) requires an aggregate function, got ${fn.name}")
            def guard(a: Node): Node = CaseNode(Seq((pred, a)), None)
            val newArgs = fn.args match {
              case Seq() => Seq(guard(NumberNode(1, isInt = true)))
              case Seq(IdentityNode(Seq("*"))) => Seq(guard(NumberNode(1, isInt = true)))
              case Seq(FuncNode("distinct", inner), rest @ _*) =>
                FuncNode("distinct", inner.headOption.map(guard).toSeq ++ inner.drop(1)) +: rest
              case as => guard(as.head) +: as.tail
            }
            val filtered = FuncNode(fn.name, newArgs)
            if (cur.isKeyword("OVER") && overSuffixHook.isDefined)
              overSuffixHook.get(filtered)
            else filtered
          } else if (cur.isKeyword("OVER") && overSuffixHook.isDefined)
            overSuffixHook.get(fn)
          else fn
        } else IdentityNode(parts.toSeq)
      }
    case TOp if cur.text == "(" =>
      // `(SELECT …)` as a primary — scalar subquery in a SELECT list /
      // expression position (substituted by the SQL planner)
      if (tokens(p + 1).isKeyword("SELECT")) captureSubquery()
      else {
        val items = parseParenList()
        if (items.size == 1) items.head else ArrayNode(items)
      }
    case TOp if cur.text == "[" =>
      advance()
      val items = collection.mutable.ArrayBuffer[Node]()
      if (!cur.is("]")) {
        items += parseExpr()
        while (cur.is(",")) { advance(); items += parseExpr() }
      }
      expectOp("]")
      ArrayNode(items.toSeq)
    case TOp if cur.text == "*" =>
      advance(); IdentityNode(Seq("*"))
    case TOp if cur.text == "@" || cur.text == "@@" =>
      val prefix = advance().text // session / global var reference
      if (cur.kind != TIdent) fail("expected identifier after " + prefix)
      val parts = collection.mutable.ArrayBuffer(prefix + advance().text)
      while (cur.is(".") && tokens(p + 1).kind == TIdent) { advance(); parts += advance().text }
      IdentityNode(parts.toSeq)
    case _ => fail(s"unexpected token '${cur.text}'")
  }

  /** Capture the balanced token stream of a `(SELECT …)` subquery. */
  private def captureSubquery(): Node = {
    expectOp("(")
    val buf = Vector.newBuilder[Token]
    var depth = 1
    while (depth > 0 && !atEof) {
      if (cur.is("(")) depth += 1
      else if (cur.is(")")) depth -= 1
      if (depth > 0) buf += advance() else advance()
    }
    buf += Token(TEof, "", cur.pos)
    SubqueryNode(buf.result())
  }

  /** Parenthesized list. Commas are OPTIONAL separators — the reference
    * parser accepts newline/space-separated args in the boolean DSL
    * (`AND ( a \n b )`) and even `IN ("a","b" 4.5)`. */
  private def parseParenList(allowStar: Boolean = false): Seq[Node] = {
    expectOp("(")
    val items = collection.mutable.ArrayBuffer[Node]()
    var first = true
    while (!cur.is(")") && !atEof) {
      if (!first && cur.is(",")) advance()
      if (!cur.is(")")) { // tolerate a trailing comma before ')'
        items += parseExpr()
        if (first && cur.isKeyword("AS")) { // CAST(x AS type)
          advance()
          if (cur.kind != TIdent) fail("expected type after AS")
          items += StringNode(advance().text)
        }
      }
      first = false
    }
    expectOp(")")
    items.toSeq
  }
}

final case class ParseException(msg: String) extends RuntimeException(msg)

object ExprParser {
  /** Parse one standalone expression (the reference's `expr.MustParse`). */
  def parse(input: String): Node = new ExprParser(Lexer.lex(input)).parseFull()
}
