package graft.rel

import graft.expr._
import graft.expr.Lexer._

/** Recursive-descent SQL + FilterQL parser over the shared lexer,
  * covering the reference dialect (/root/reference/rel/parse_sql.go:
  * SELECT with joins/group/having/order/limit-offset/INTO, INSERT,
  * UPDATE, UPSERT, DELETE, SET, USE, SHOW, DESCRIBE, EXPLAIN, CREATE,
  * DROP, transaction no-ops; /root/reference/rel/parse_filterql.go:
  * FILTER statements). Expressions delegate to [[ExprParser]].
  */
final class SqlParser(tokens: Vector[Token]) {

  private val ep = new ExprParser(tokens)
  // window suffixes bind inside ANY expression the SQL dialect parses
  // (nested arithmetic, QUALIFY, ORDER BY) — the hook routes the OVER
  // grammar back here, where the window-spec parser lives
  ep.overSuffixHook = Some(parseWindowSuffix)
  private def cur: Token = ep.current
  private def next(): Token = ep.next()
  private def kw(s: String): Boolean = cur.isKeyword(s)
  private def eat(s: String): Boolean = if (kw(s) || cur.is(s)) { next(); true } else false
  private def expect(s: String): Unit =
    if (!eat(s)) throw ParseException(s"expected '$s' but found '${cur.text}' at ${cur.pos}")
  private def ident(): String = {
    if (cur.kind != TIdent) throw ParseException(s"expected identifier, found '${cur.text}'")
    next().text
  }

  private val clauseKeywords = Set(
    "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "SORT", "LIMIT", "OFFSET", "AS", "IF",
    "INTO", "JOIN", "INNER", "LEFT", "RIGHT", "OUTER", "FULL", "CROSS", "ON",
    "ASC", "DESC", "AND", "OR", "NOT", "BY", "WITH", "ALIAS", "FILTER", "VALUES", "SET",
    "UNION", "INTERSECT", "EXCEPT", "ALL", "OVER", "PARTITION", "QUALIFY", "PIVOT", "UNPIVOT", "USING", "NATURAL",
    "SEMI", "ANTI", "LATERAL", "ASOF", "WINDOW", "TABLESAMPLE")

  def parseStatement(): Statement = {
    val st =
      if (kw("SELECT")) parseSelectChain()
      else if (kw("WITH")) parseWith()
      else if (kw("FILTER")) parseFilter()
      else if (kw("INSERT")) parseInsert()
      else if (kw("UPSERT")) parseUpsert()
      else if (kw("UPDATE")) parseUpdate()
      else if (kw("MERGE")) parseMerge()
      else if (kw("DELETE")) parseDelete()
      else if (kw("SET")) parseSet()
      else if (kw("USE")) { next(); SqlUse(ident()) }
      else if (kw("SHOW")) parseShow()
      else if (kw("DESCRIBE") || kw("DESC")) { next(); SqlDescribe(ident()) }
      else if (kw("EXPLAIN")) { next(); eat("EXTENDED"); SqlExplain(parseStatement()) }
      else if (kw("CREATE")) parseCreate()
      else if (kw("DROP")) parseDrop()
      else if (kw("BEGIN") || kw("COMMIT") || kw("ROLLBACK")) SqlNoop(next().text.toUpperCase)
      else if (kw("PREPARE")) parsePrepare()
      // parity: reference parses ALTER but its executor returns
      // ErrNotImplemented (exec/ddl.go:150-159, rel/sql.go:1972)
      else if (kw("ALTER")) throw ParseException("ALTER not implemented")
      else throw ParseException(s"unsupported statement start '${cur.text}'")
    eat(";")
    st
  }

  def atEnd: Boolean = ep.atEof

  def parseEnd(): Unit =
    if (!ep.atEof) throw ParseException(s"unexpected trailing input '${cur.text}' at ${cur.pos}")

  // ---- SELECT --------------------------------------------------------

  /** SELECT possibly chained with UNION / INTERSECT / EXCEPT [ALL];
    * or the FilterQL select form `SELECT cols FROM t FILTER expr`
    * (rel/filter.go:30-33 FilterSelect). */
  /** Statement-leading `WITH [RECURSIVE] name[(col, …)] AS (select)
    * [, …]` — CTE prefix; the body is any further statement (usually
    * SELECT, possibly another chain). Distinct from the reference's
    * `WITH key = value` statement-config TAIL (consumeWith), which
    * only ever appears after the clauses. */
  private def parseWith(): Statement = {
    expect("WITH")
    // `RECURSIVE` is a soft keyword: only the flag when NOT itself a
    // CTE name (i.e. not directly followed by AS or a column list)
    val recursive = cur.kind == TIdent &&
      cur.text.equalsIgnoreCase("RECURSIVE") && {
        val after = tokens.lift(ep.pos + 1).map(_.text.toUpperCase)
        !after.contains("AS") && !after.contains("(")
      } && eat("RECURSIVE")
    val ctes = collection.mutable.ArrayBuffer[CteDef]()
    var more = true
    while (more) {
      val name = ident()
      val cols =
        if (eat("(")) {
          val cs = collection.mutable.ArrayBuffer[String](ident())
          while (eat(",")) cs += ident()
          expect(")")
          cs.toSeq
        } else Nil
      expect("AS")
      expect("(")
      val sub = parseSelectChain()
      expect(")")
      ctes += CteDef(name, cols, sub)
      more = eat(",")
    }
    SqlWith(ctes.toSeq, parseStatement(), recursive)
  }

  private def parseSelectChain(): Statement = {
    var left: Statement = parseSelect()
    if (kw("FILTER")) {
      next()
      val filter = if (cur.is("*")) { next(); BoolNode(true) } else ep.parseExpr()
      val (limit, _) = parseLimitOffset()
      val alias = if (eat("ALIAS")) Some(ident()) else None
      val sel = left.asInstanceOf[SqlSelect]
      val from = sel.from.headOption.collect { case TableSource(n, _, _, _) => n }
      return FilterSelect(sel.columns, from, filter, limit.orElse(sel.limit), alias)
    }
    while (kw("UNION") || kw("INTERSECT") || kw("EXCEPT")) {
      val op = next().text.toUpperCase
      val all = eat("ALL")
      val right = parseSelect()
      // hoist the right-most select's ORDER BY / LIMIT onto the set op
      val (r2, ob, lim) = right match {
        case s: SqlSelect if s.orderBy.nonEmpty || s.limit.isDefined =>
          (s.copy(orderBy = Nil, limit = None), s.orderBy, s.limit)
        case s => (s, Nil, None)
      }
      left = SqlSetOp(op, all, left, r2, ob, lim)
    }
    left
  }

  private def parseSelect(): SqlSelect = {
    expect("SELECT")
    var distinct = eat("DISTINCT")
    // DISTINCT ON (exprs): keep one row per key tuple (DuckDB/Postgres
    // dialect) — NOT additionally distinct over the projection
    val distinctOn =
      if (distinct && kw("ON")) {
        next(); expect("(")
        val keys = parseExprList()
        expect(")")
        distinct = false
        keys
      } else Nil
    val cols = parseSelectColumns()
    // ordinal references (SQL-standard `GROUP BY 1` / `ORDER BY 2`):
    // a bare integer literal in either list names the select column at
    // that 1-based position
    def ordinal(n: Node): Option[SelectColumn] = n match {
      case NumberNode(d, true) =>
        val i = d.toInt
        if (i < 1 || i > cols.length)
          throw ParseException(s"ordinal $i out of range (select has ${cols.length} columns)")
        if (cols(i - 1).expr == IdentityNode(Seq("*")))
          throw ParseException(s"ordinal $i refers to *")
        Some(cols(i - 1))
      case _ => None
    }
    def derefGroup(n: Node): Node = ordinal(n).map(_.expr).getOrElse(n)
    def derefOrder(n: Node): Node = ordinal(n).map(c =>
      c.alias.map(a => IdentityNode(Seq(a)): Node).getOrElse(c.expr)).getOrElse(n)
    val into = if (eat("INTO")) Some(ident()) else None
    val from = if (kw("FROM")) parseFrom() else Nil
    val where = if (eat("WHERE")) Some(parseWhereExpr()) else None
    var groupByRollup = false
    var groupByCube = false
    var groupByAll = false
    var groupingSets: Seq[Seq[graft.expr.Node]] = Nil
    val groupBy = if (kw("GROUP")) {
      next(); expect("BY")
      if (kw("ALL")) {
        // DuckDB GROUP BY ALL: keys = every non-aggregate select
        // expression, resolved at plan time (aggregate-ness is a
        // registry question, not a grammar one)
        next(); groupByAll = true; Nil
      } else if (kw("ROLLUP") || kw("CUBE")) {
        if (kw("CUBE")) groupByCube = true else groupByRollup = true
        next()
        expect("(")
        val keys = parseExprList()
        expect(")")
        keys
      } else if (kw("GROUPING")) {
        next(); expect("SETS"); expect("(")
        val sets = collection.mutable.ArrayBuffer[Seq[graft.expr.Node]]()
        var more = true
        while (more) {
          expect("(")
          val set = if (cur.is(")")) Nil else parseExprList()
          expect(")")
          sets += set
          more = eat(",")
        }
        expect(")")
        groupingSets = sets.toSeq
        // distinct keys in first-appearance order
        val seen = collection.mutable.LinkedHashMap[String, graft.expr.Node]()
        for (set <- groupingSets; k <- set if !seen.contains(k.text)) seen(k.text) = k
        seen.values.toSeq
      } else parseExprList().map(derefGroup)
    } else Nil
    val having = if (eat("HAVING")) Some(ep.parseExpr()) else None
    // WINDOW clause (ANSI): named specs `WINDOW w AS (…), v AS (…)` —
    // every `OVER w` reference in the select list substitutes its
    // definition here, so the planner only ever sees inline windows
    val windowDefs: Map[String, (Seq[graft.expr.Node],
        Seq[(graft.expr.Node, Boolean)], Option[(String, Long, Long)])] =
      if (eat("WINDOW")) {
        val defs = collection.mutable.LinkedHashMap[String, (Seq[graft.expr.Node],
          Seq[(graft.expr.Node, Boolean)], Option[(String, Long, Long)])]()
        var more = true
        while (more) {
          val n = ident()
          expect("AS"); expect("(")
          if (defs.contains(n)) throw ParseException(s"duplicate window name '$n'")
          defs(n) = parseWindowSpec()
          more = eat(",")
        }
        defs.toMap
      } else Map.empty
    // recursive: `OVER w` can sit anywhere in an expression (the OVER
    // hook binds windows in nested positions), so every clause rewrites
    // its whole tree against the WINDOW-clause definitions
    def rewriteRefs(n: graft.expr.Node): graft.expr.Node = {
      import graft.expr._
      n match {
        case w: WindowNode if w.ref.isDefined =>
          val (p2, o2, f2) = windowDefs.getOrElse(w.ref.get,
            throw ParseException(s"unknown window '${w.ref.get}' — no WINDOW clause definition"))
          WindowNode(rewriteRefs(w.func).asInstanceOf[FuncNode], p2, o2, f2)
        case w: WindowNode => WindowNode(
          rewriteRefs(w.func).asInstanceOf[FuncNode],
          w.partitionBy.map(rewriteRefs),
          w.orderBy.map { case (e, asc) => (rewriteRefs(e), asc) }, w.frame)
        case BinaryNode(op, l, r, neg) => BinaryNode(op, rewriteRefs(l), rewriteRefs(r), neg)
        case BooleanNode(op, args, neg) => BooleanNode(op, args.map(rewriteRefs), neg)
        case UnaryNode(op, c) => UnaryNode(op, rewriteRefs(c))
        case TriNode(op, a, b, c, neg) =>
          TriNode(op, rewriteRefs(a), rewriteRefs(b), rewriteRefs(c), neg)
        case FuncNode(name, args) => FuncNode(name, args.map(rewriteRefs))
        case CaseNode(branches, els) => CaseNode(
          branches.map { case (w, t) => (rewriteRefs(w), rewriteRefs(t)) },
          els.map(rewriteRefs))
        case ArrayNode(items) => ArrayNode(items.map(rewriteRefs))
        case other => other
      }
    }
    val colsResolved = cols.map(c => c.copy(expr = rewriteRefs(c.expr),
      guard = c.guard.map(rewriteRefs)))
    // QUALIFY: filter on the projected row (post-window predicate —
    // `QUALIFY rk == 1` is the window-dedup idiom; beyond the reference).
    // Inline windows are legal here (hoisted by the planner)
    val qualify = if (eat("QUALIFY")) Some(rewriteRefs(ep.parseExpr())) else None
    // no SORT BY: the reference rejects it as an unknown keyword
    // (rel/parse_sql_test.go:402 "Must fail parse")
    val orderBy = if (kw("ORDER")) {
      next(); expect("BY")
      if (kw("ALL")) {
        // DuckDB ORDER BY ALL [ASC|DESC]: every select column, left to
        // right — desugared here (prints in the expanded form)
        next()
        val asc = if (kw("DESC")) { next(); false } else { eat("ASC"); true }
        if (cols.exists(_.expr == IdentityNode(Seq("*"))))
          throw ParseException("ORDER BY ALL cannot expand a * select")
        // expand from colsRESOLVED: an unaliased select column using a
        // named window (`sum(x) OVER w`) has already had its ref
        // inlined there — expanding from the raw cols would leak an
        // unresolved WindowNode ref past the WINDOW clause rewrite
        colsResolved.map(c => (c.alias.map(a => IdentityNode(Seq(a)): Node)
          .getOrElse(c.expr), asc))
      } else parseOrderList().map { case (n, asc) => (rewriteRefs(derefOrder(n)), asc) }
    } else Nil
    val (limit, offset) = parseLimitOffset()
    val withCfg = consumeWith()
    if (eat("ALIAS")) ident() // named statement (rel/sql.go Alias) — accepted
    SqlSelect(colsResolved, from, distinct, where, groupBy, groupByRollup,
      groupByCube, groupingSets, having, orderBy, limit, offset, into, qualify,
      distinctOn, groupByAll, withCfg)
  }

  /** Optional `WITH key = value, …` statement config
    * (rel/parse_sql.go:706-814 WITH forms). The reference stores these
    * as arbitrary properties (rel/sql.go:100 With); here the pairs are
    * kept on the statement and the recognized keys drive Spark
    * execution (broadcast / repartition / repartition_by / coalesce —
    * see the Planner). The `WITH {json}` form is accepted and
    * discarded, as before. */
  private def consumeWith(): Seq[(String, Node)] = if (eat("WITH")) {
    if (cur.is("{")) { skipJson(); Nil } // WITH {json} form (TestWithJson)
    else parseWithPairs()
  } else Nil

  /** The `key = value, …` tail of a WITH clause. */
  private def parseWithPairs(): Seq[(String, Node)] = {
    val out = collection.mutable.ArrayBuffer[(String, Node)]()
    var more = true
    while (more) {
      val k = ident()
      expect("=")
      val v: Node = cur.kind match {
        case TString => StringNode(next().text)
        case TNumber =>
          val t = next().text
          NumberNode(t.toDouble,
            isInt = !t.contains(".") && !t.toLowerCase.contains("e"))
        case TIdent if cur.text.equalsIgnoreCase("true") => next(); BoolNode(true)
        case TIdent if cur.text.equalsIgnoreCase("false") => next(); BoolNode(false)
        case _ => StringNode(next().text) // bare-word value
      }
      out += ((k, v))
      more = eat(",")
    }
    out.toSeq
  }

  private def parseSelectColumns(): Seq[SelectColumn] = {
    val out = collection.mutable.ArrayBuffer[SelectColumn]()
    var done = false
    while (!done) {
      var expr = ep.parseExpr()
      // DuckDB star modifiers, only directly after `*`:
      // `* EXCLUDE (a, …)` and `* REPLACE (e AS a, …)`, either order
      var starExcl: Seq[String] = Nil
      var starRepl: Seq[(Node, String)] = Nil
      if (expr == IdentityNode(Seq("*"))) {
        var modding = true
        while (modding) {
          if (starExcl.isEmpty && kw("EXCLUDE")) {
            next(); expect("(")
            val ns = collection.mutable.ArrayBuffer(ident())
            while (eat(",")) ns += ident()
            expect(")")
            starExcl = ns.toSeq
          } else if (starRepl.isEmpty && kw("REPLACE")) {
            next(); expect("(")
            val rs = collection.mutable.ArrayBuffer[(Node, String)]()
            var more = true
            while (more) {
              val e = ep.parseExpr()
              expect("AS")
              rs += ((e, ident()))
              more = eat(",")
            }
            expect(")")
            starRepl = rs.toSeq
          } else modding = false
        }
      }
      if (starExcl.nonEmpty || starRepl.nonEmpty) {
        out += SelectColumn(expr, None, None, starExcl, starRepl)
        done = !eat(",")
      } else {
      // window suffix `OVER (PARTITION BY ... ORDER BY ...)` — beyond
      // the reference dialect (qlbridge's row-at-a-time VM cannot see a
      // partition); planned onto Spark's Window operator
      if (kw("OVER")) expr = parseWindowSuffix(expr)
      // column guard `IF boolexpr` (rel/sql.go:259 Guard) and AS alias
      // accepted in EITHER order, like the reference's column loop
      // (rel/parse_sql.go:960-1000 switches on AS/IF repeatedly)
      var guard: Option[graft.expr.Node] = None
      var alias: Option[String] = None
      var looping = true
      while (looping) {
        if (guard.isEmpty && eat("IF")) guard = Some(ep.parseExpr())
        else if (alias.isEmpty && eat("AS")) alias = Some(ident())
        else looping = false
      }
      if (alias.isEmpty && cur.kind == TIdent &&
          !clauseKeywords.contains(cur.text.toUpperCase) && !ep.atEof)
        alias = Some(ident()) // implicit alias
      out += SelectColumn(expr, alias, guard)
      done = !eat(",")
      }
    }
    out.toSeq
  }

  /** `OVER (PARTITION BY e, ... ORDER BY e [ASC|DESC], ...)` after a
    * select-column function call. Frame clauses are not accepted —
    * ranking/offset functions ignore frames, and running aggregates
    * get Spark's default frame. */
  private def parseWindowSuffix(fn: graft.expr.Node): graft.expr.Node = {
    val f = fn match {
      case fc: graft.expr.FuncNode => fc
      case other => throw new IllegalArgumentException(
        s"OVER requires a function call, got: ${other.text}")
    }
    expect("OVER")
    // named reference `OVER w` — the definition lives in the
    // statement's WINDOW clause, substituted after the full parse
    if (!cur.is("(")) {
      val name = ident()
      return graft.expr.WindowNode(f, Nil, Nil, None, Some(name))
    }
    expect("(")
    val (parts, orders, frame) = parseWindowSpec()
    graft.expr.WindowNode(f, parts, orders, frame)
  }

  /** The body of a window specification, from after the opening paren
    * through (and including) the closing paren — shared by OVER (…)
    * and the WINDOW clause. */
  private def parseWindowSpec(): (Seq[graft.expr.Node],
      Seq[(graft.expr.Node, Boolean)], Option[(String, Long, Long)]) = {
    val parts = collection.mutable.ArrayBuffer[graft.expr.Node]()
    val orders = collection.mutable.ArrayBuffer[(graft.expr.Node, Boolean)]()
    if (kw("PARTITION")) {
      next(); expect("BY")
      parts += ep.parseExpr()
      while (eat(",")) parts += ep.parseExpr()
    }
    if (kw("ORDER")) {
      next(); expect("BY")
      var more = true
      while (more) {
        val e = ep.parseExpr()
        val asc =
          if (kw("DESC")) { next(); false }
          else { if (kw("ASC")) next(); true }
        orders += ((e, asc))
        more = eat(",")
      }
    }
    val frame: Option[(String, Long, Long)] =
      if (kw("ROWS") || kw("RANGE")) {
        val unit = next().text.toUpperCase
        def bound(): Long = {
          if (kw("UNBOUNDED")) {
            next()
            if (kw("PRECEDING")) { next(); Long.MinValue }
            else { expect("FOLLOWING"); Long.MaxValue }
          } else if (kw("CURRENT")) { next(); expect("ROW"); 0L }
          else {
            val n = cur.text.toLongOption.getOrElse(
              throw ParseException(s"expected frame bound, got '${cur.text}'"))
            next()
            if (kw("PRECEDING")) { next(); -n }
            else { expect("FOLLOWING"); n }
          }
        }
        if (kw("BETWEEN")) {
          next()
          val lo = bound(); expect("AND"); val hi = bound()
          Some((unit, lo, hi))
        } else Some((unit, bound(), 0L)) // shorthand: <bound> = BETWEEN <bound> AND CURRENT ROW
      } else None
    expect(")")
    (parts.toSeq, orders.toSeq, frame)
  }

  private def parseFrom(): Seq[FromSource] = {
    expect("FROM")
    val out = collection.mutable.ArrayBuffer[FromSource]()
    out += parseOneSource(JoinType.Inner, None)
    var more = true
    while (more) {
      if (eat(",")) {
        // comma join; `, LATERAL (SELECT …) l` is the cross-apply form
        if (kw("LATERAL")) out += parseLateralSource()
        else out += parseOneSource(JoinType.Cross, None)
      } else if (kw("CROSS") && tokens.lift(ep.pos + 1)
          .exists(_.text.equalsIgnoreCase("JOIN")) && tokens.lift(ep.pos + 2)
          .exists(_.text.equalsIgnoreCase("LATERAL"))) {
        next(); next() // CROSS JOIN LATERAL ≡ comma-LATERAL
        out += parseLateralSource()
      } else {
        var jt: Option[JoinType] = None
        var natural = false
        if (kw("NATURAL")) { next(); natural = true }
        if (kw("INNER")) { next(); jt = Some(JoinType.Inner) }
        else if (kw("LEFT")) {
          next(); eat("OUTER")
          // LEFT SEMI / LEFT ANTI: Spark's spelling of DuckDB's bare
          // SEMI / ANTI — both accepted, one printed form (SEMI JOIN)
          if (kw("SEMI")) { next(); jt = Some(JoinType.Semi) }
          else if (kw("ANTI")) { next(); jt = Some(JoinType.Anti) }
          else jt = Some(JoinType.Left)
        }
        else if (kw("RIGHT")) { next(); eat("OUTER"); jt = Some(JoinType.Right) }
        else if (kw("FULL")) { next(); eat("OUTER"); jt = Some(JoinType.Outer) }
        else if (kw("OUTER")) { next(); jt = Some(JoinType.Outer) }
        else if (kw("CROSS")) { next(); jt = Some(JoinType.Cross) }
        else if (kw("SEMI")) { next(); jt = Some(JoinType.Semi) }
        else if (kw("ANTI")) { next(); jt = Some(JoinType.Anti) }
        else if (kw("ASOF")) {
          next()
          if (kw("LEFT")) { next(); eat("OUTER"); jt = Some(JoinType.AsofLeft) }
          else jt = Some(JoinType.Asof)
        }
        if (kw("JOIN")) {
          next()
          val t = jt.getOrElse(JoinType.Inner)
          val on = { // parse source first, then ON / USING
            val src = parseOneSource(t, None)
            val onExpr =
              if (natural) {
                if (kw("ON") || kw("USING"))
                  throw ParseException("NATURAL JOIN takes no ON/USING clause")
                // shared key names resolve at plan time, when both
                // schemas are known
                Some(graft.expr.FuncNode("__natural", Nil))
              }
              else if (eat("ON")) Some(ep.parseExpr())
              else if (eat("USING")) {
                // USING (a, b): equality on the shared names, key columns
                // coalesced in the output (standard semantics) — encoded
                // as the __using marker the planner and writer recognize
                expect("(")
                val names = collection.mutable.ArrayBuffer(ident())
                while (eat(",")) names += ident()
                expect(")")
                Some(graft.expr.FuncNode("__using",
                  names.toSeq.map(n => graft.expr.IdentityNode(Seq(n)))))
              } else None
            // reference/rel/parse_sql.go:1264-1291 refuses a JOIN with no
            // ON clause; only CROSS JOIN (and comma-FROM) may omit it.
            if (onExpr.isEmpty && t != JoinType.Cross)
              throw ParseException("JOIN requires ON clause (use CROSS JOIN for a cartesian product)")
            out += (src match {
              case ts: TableSource => ts.copy(joinType = t, joinOn = onExpr)
              case ss: SubquerySource => ss.copy(joinType = t, joinOn = onExpr)
              case ps: PivotSource => ps.copy(joinType = t, joinOn = onExpr)
              case us: UnpivotSource => us.copy(joinType = t, joinOn = onExpr)
              case vs: ValuesSource => vs.copy(joinType = t, joinOn = onExpr)
              case sm: SampleSource => sm.copy(joinType = t, joinOn = onExpr)
            })
          }
        } else if (jt.isDefined || natural) throw ParseException("expected JOIN")
        else more = false
      }
    }
    out.toSeq
  }

  private def parseOneSource(jt: JoinType, on: Option[Node]): FromSource = {
    val base: FromSource = if (cur.is("(")) {
      next()
      if (kw("VALUES")) return maybeSample(maybePivot(parseValuesSource(jt, on), jt, on), jt, on)
      val sub = parseSelect()
      expect(")")
      if (kw("PIVOT") || kw("UNPIVOT")) SubquerySource(sub, "__pvt_src", jt, on)
      else {
        eat("AS")
        SubquerySource(sub, ident(), jt, on)
      }
    } else {
      // schema-qualified names: `mockcsv.users` (reference schema.table)
      var name = ident()
      while (cur.is(".") && { next(); true }) name = name + "." + ident()
      val alias =
        if (kw("PIVOT") || kw("UNPIVOT")) None
        else if (eat("AS")) Some(ident())
        else if (cur.kind == TIdent && !clauseKeywords.contains(cur.text.toUpperCase)) Some(ident())
        else None
      TableSource(name, alias, jt, on)
    }
    maybeSample(maybePivot(base, jt, on), jt, on)
  }

  /** `LATERAL (SELECT …) [AS] alias` — a subquery that may reference
    * the preceding FROM sources' columns (cross apply; beyond ref and
    * beyond Spark's DataFrame API). Planned by rewrite in the Planner:
    * correlated-aggregate form → grouped aggregate joined back;
    * LIMIT-k form → join + per-outer-row rank window. */
  private def parseLateralSource(): FromSource = {
    expect("LATERAL")
    expect("(")
    val sub = parseSelect()
    expect(")")
    eat("AS")
    SubquerySource(sub, ident(), JoinType.Cross, None, lateral = true)
  }

  /** `(VALUES (e, …)[, …]) AS t(c1, …)` in FROM position — the `(` and
    * lookahead `VALUES` already consumed/seen. The `t(cols)` alias list
    * is mandatory: Spark names inline-table columns col1…, DuckDB
    * col0… — an unaliased VALUES table cannot be written portably. */
  private def parseValuesSource(jt: JoinType, on: Option[Node]): FromSource = {
    expect("VALUES")
    val rows = collection.mutable.ArrayBuffer[Seq[Node]]()
    var more = true
    while (more) {
      expect("(")
      rows += parseExprList()
      expect(")")
      more = eat(",")
    }
    expect(")")
    eat("AS")
    val alias = ident()
    expect("(")
    val cols = collection.mutable.ArrayBuffer(ident())
    while (eat(",")) cols += ident()
    expect(")")
    if (rows.exists(_.length != cols.length))
      throw ParseException(s"VALUES rows must all have ${cols.length} " +
        s"expressions to match alias list ($alias)")
    ValuesSource(rows.toSeq, alias, cols.toSeq, jt, on)
  }

  /** `<source> PIVOT (agg FOR col IN (v1 [AS a1], …)) [AS alias]` —
    * SQL-standard pivot (beyond ref; DuckDB speaks the same shape). */
  private def maybePivot(src: FromSource, jt: JoinType, on: Option[Node]): FromSource = {
    if (kw("UNPIVOT")) return parseUnpivot(src, jt, on)
    if (!kw("PIVOT")) return src
    next(); expect("(")
    val agg = ep.parseExpr()
    expect("FOR")
    val forCol = ident()
    expect("IN"); expect("(")
    val values = collection.mutable.ArrayBuffer[(Node, Option[String])]()
    var more = true
    while (more) {
      val v = ep.parseExpr()
      val a = if (eat("AS")) Some(ident()) else None
      values += ((v, a))
      more = eat(",")
    }
    expect(")"); expect(")")
    val alias =
      if (eat("AS")) Some(ident())
      else if (cur.kind == TIdent && !clauseKeywords.contains(cur.text.toUpperCase)) Some(ident())
      else None
    PivotSource(src, agg, forCol, values.toSeq, alias, jt, on)
  }

  /** `<source> TABLESAMPLE (n PERCENT) ON (keyExpr)` — deterministic
    * md5-keyed sampling (see [[SampleSource]]); n may be fractional
    * (2.5 PERCENT → 25‰). The ON key is mandatory: it is what makes
    * the sample reproducible instead of engine-random. */
  private def maybeSample(src: FromSource, jt: JoinType, on: Option[Node]): FromSource = {
    if (!kw("TABLESAMPLE")) return src
    next(); expect("(")
    val n = cur.kind match {
      case graft.expr.Lexer.TNumber => next().text.toDouble
      case _ => throw ParseException(s"expected a number in TABLESAMPLE, got '${cur.text}'")
    }
    expect("PERCENT"); expect(")")
    expect("ON"); expect("(")
    val key = ep.parseExpr()
    expect(")")
    val permill = math.round(n * 10).toInt
    if (permill < 0 || permill > 1000)
      throw ParseException(s"TABLESAMPLE percent must be in [0, 100], got $n")
    SampleSource(src, permill, key, jt, on)
  }

  /** `<source> UNPIVOT (val FOR key IN (c1 [AS l1], …)) [AS alias]`. */
  private def parseUnpivot(src: FromSource, jt: JoinType, on: Option[Node]): FromSource = {
    next(); expect("(")
    val valCol = ident()
    expect("FOR")
    val keyCol = ident()
    expect("IN"); expect("(")
    val cols = collection.mutable.ArrayBuffer[(String, Option[String])]()
    var more = true
    while (more) {
      val c = ident()
      val a = if (eat("AS")) Some(
        if (cur.kind == graft.expr.Lexer.TString) { val t = cur.text; next(); t }
        else ident()) else None
      cols += ((c, a))
      more = eat(",")
    }
    expect(")"); expect(")")
    val alias =
      if (eat("AS")) Some(ident())
      else if (cur.kind == TIdent && !clauseKeywords.contains(cur.text.toUpperCase)) Some(ident())
      else None
    UnpivotSource(src, valCol, keyCol, cols.toSeq, alias, jt, on)
  }

  /** WHERE expr — also allows `WHERE x IN (SELECT …)` by detecting a
    * SELECT right after `IN (` (rel/parse_sql.go:1319); represented as
    * BinaryNode("IN", x, SubqueryNode). */
  private def parseWhereExpr(): Node = ep.parseExpr()

  private def parseExprList(): Seq[Node] = {
    val out = collection.mutable.ArrayBuffer[Node]()
    out += ep.parseExpr()
    while (eat(",")) out += ep.parseExpr()
    out.toSeq
  }

  private def parseOrderList(): Seq[(Node, Boolean)] = {
    val out = collection.mutable.ArrayBuffer[(Node, Boolean)]()
    var done = false
    while (!done) {
      val e = ep.parseExpr()
      val asc = if (eat("DESC")) false else { eat("ASC"); true }
      out += ((e, asc))
      done = !eat(",")
    }
    out.toSeq
  }

  private def parseLimitOffset(): (Option[Int], Option[Int]) = {
    if (eat("LIMIT")) {
      val n1 = intLit()
      if (eat(",")) (Some(intLit()), Some(n1))             // MySQL LIMIT offset, count
      else if (eat("OFFSET")) (Some(n1), Some(intLit()))   // LIMIT n OFFSET m
      else (Some(n1), None)
    } else (None, None)
  }

  private def intLit(): Int = {
    if (cur.kind != TNumber) throw ParseException(s"expected number, found '${cur.text}'")
    next().text.toDouble.toInt
  }

  // ---- FilterQL ------------------------------------------------------

  private def parseFilter(): FilterStatement = {
    expect("FILTER")
    val filter = if (cur.is("*")) { next(); BoolNode(true) } else ep.parseExpr()
    var from: Option[String] = None
    var limit: Option[Int] = None
    var alias: Option[String] = None
    var more = true
    while (more) {
      if (eat("FROM")) from = Some(ident())
      else if (eat("LIMIT")) limit = Some(intLit())
      else if (eat("ALIAS")) alias = Some(ident())
      else if (eat("WITH")) skipJson()
      else more = false
    }
    FilterStatement(filter, from, limit, alias)
  }

  // ---- DML -----------------------------------------------------------

  private def parseInsert(): Statement = {
    expect("INSERT"); expect("INTO")
    val table = ident()
    val cols = parseColumnNameList()
    if (kw("SELECT")) SqlInsert(table, cols, Nil, Some(parseSelect()))
    else {
      expect("VALUES")
      SqlInsert(table, cols, parseValuesRows(), None)
    }
  }

  private def parseUpsert(): Statement = {
    expect("UPSERT")
    if (eat("INTO")) {
      val table = ident()
      val cols = parseColumnNameList()
      expect("VALUES")
      SqlUpsert(table, cols, parseValuesRows(), Nil)
    } else {
      // UPSERT tbl SET a = 1, b = 2 — alternate reference form
      val table = ident()
      expect("SET")
      SqlUpsert(table, Nil, Nil, parseSetPairs())
    }
  }

  private def parseUpdate(): Statement = {
    expect("UPDATE")
    val table = ident()
    expect("SET")
    val pairs = parseSetPairs()
    val where = if (eat("WHERE")) Some(ep.parseExpr()) else None
    SqlUpdate(table, pairs, where)
  }

  /** `MERGE INTO target [AS t] USING <table|(subquery)|(VALUES …)> [AS s]
    * ON cond WHEN [NOT] MATCHED [AND c] THEN UPDATE SET …|DELETE|
    * INSERT [(cols)] VALUES (…)` — set-based CDC upsert (beyond ref). */
  private def parseMerge(): Statement = {
    expect("MERGE"); expect("INTO")
    val target = ident()
    val tAlias =
      if (eat("AS")) Some(ident())
      else if (cur.kind == TIdent && !cur.isKeyword("USING")) Some(ident())
      else None
    expect("USING")
    val source = parseOneSource(JoinType.Inner, None)
    expect("ON")
    val on = ep.parseExpr()
    val whens = collection.mutable.ArrayBuffer[MergeWhen]()
    while (kw("WHEN")) {
      next()
      val matched =
        if (kw("NOT")) { next(); expect("MATCHED"); false }
        else { expect("MATCHED"); true }
      val cond = if (eat("AND")) Some(ep.parseExpr()) else None
      expect("THEN")
      val action: MergeAction =
        if (kw("UPDATE")) {
          if (!matched) throw ParseException("WHEN NOT MATCHED cannot UPDATE")
          next(); expect("SET"); MergeUpdate(parseSetPairs())
        } else if (kw("DELETE")) {
          if (!matched) throw ParseException("WHEN NOT MATCHED cannot DELETE")
          next(); MergeDelete
        } else if (kw("INSERT")) {
          if (matched) throw ParseException("WHEN MATCHED cannot INSERT")
          next()
          val cols =
            if (eat("(")) {
              val cs = collection.mutable.ArrayBuffer(ident())
              while (eat(",")) cs += ident()
              expect(")")
              cs.toSeq
            } else Nil
          expect("VALUES"); expect("(")
          val vals = parseExprList()
          expect(")")
          if (cols.nonEmpty && cols.length != vals.length)
            throw ParseException(s"MERGE INSERT names ${cols.length} columns " +
              s"but provides ${vals.length} values")
          MergeInsert(cols, vals)
        } else throw ParseException(
          s"expected UPDATE/DELETE/INSERT after THEN, got '${cur.text}'")
      whens += MergeWhen(matched, cond, action)
    }
    if (whens.isEmpty)
      throw ParseException("MERGE requires at least one WHEN clause")
    SqlMerge(target, tAlias, source, on, whens.toSeq)
  }

  private def parseDelete(): Statement = {
    expect("DELETE"); expect("FROM")
    val table = ident()
    val where = if (eat("WHERE")) Some(ep.parseExpr()) else None
    val (limit, _) = parseLimitOffset()
    SqlDelete(table, where, limit)
  }

  private def parseColumnNameList(): Seq[String] = {
    if (!cur.is("(")) return Nil
    next()
    val out = collection.mutable.ArrayBuffer(ident())
    while (eat(",")) out += ident()
    expect(")")
    out.toSeq
  }

  private def parseValuesRows(): Seq[Seq[Node]] = {
    val rows = collection.mutable.ArrayBuffer[Seq[Node]]()
    var done = false
    while (!done) {
      expect("(")
      val row = collection.mutable.ArrayBuffer(ep.parseExpr())
      while (eat(",")) row += ep.parseExpr()
      expect(")")
      rows += row.toSeq
      done = !eat(",")
    }
    rows.toSeq
  }

  private def parseSetPairs(): Seq[(String, Node)] = {
    val out = collection.mutable.ArrayBuffer[(String, Node)]()
    var done = false
    while (!done) {
      // `[bracket quoted]` column names (reference UPDATE test shape)
      val name =
        if (cur.is("[")) { next(); val n = ident(); expect("]"); n }
        else ident()
      expect("=")
      out += ((name, ep.parseExpr()))
      done = !eat(",")
    }
    out.toSeq
  }

  // ---- session / schema ----------------------------------------------

  private def parseSet(): Statement = {
    expect("SET")
    eat("GLOBAL"); eat("SESSION")
    val name = {
      val sb = new StringBuilder
      if (cur.is("@@")) { next(); sb.append("@@") }
      else if (cur.is("@")) { next(); sb.append("@") }
      sb.append(ident())
      while (cur.is(".")) { next(); sb.append(".").append(ident()) }
      sb.toString
    }
    // bare `set autocommit` — administrative command with no value
    // (rel/parse_sql_test.go:553-559 SqlCommand, treated as true)
    if (ep.atEof || cur.is(";")) SqlSet(name, graft.expr.BoolNode(true))
    else { expect("="); SqlSet(name, ep.parseExpr()) }
  }

  private def parseShow(): Statement = {
    expect("SHOW")
    val full = eat("FULL")
    var kind = ident().toUpperCase
    // SHOW [GLOBAL|SESSION] VARIABLES (plan/sql_rewrite.go:135-143)
    if ((kind == "GLOBAL" || kind == "SESSION") && cur.kind == TIdent)
      kind = kind + " " + ident().toUpperCase
    var target: Option[String] = None
    if (kind == "COLUMNS" || kind == "INDEX" || kind == "INDEXES" || kind == "KEYS") {
      if (eat("FROM") || eat("IN")) target = Some(ident())
    } else if (kind == "CREATE") {
      eat("TABLE")
      var t = ident()
      while (eat(".")) t = ident() // `db`.`table` — keep the table part
      target = Some(t)
    }
    if (eat("FROM") || eat("IN")) {
      // `SHOW COLUMNS FROM table FROM db`: the second FROM is the db
      // qualifier — it must not overwrite an already-set table target
      val sec = ident()
      if (target.isEmpty) target = Some(sec)
    }
    val like = if (eat("LIKE")) {
      if (cur.kind != TString) throw ParseException("expected string after LIKE")
      Some(next().text)
    } else None
    val where = if (eat("WHERE")) Some(ep.parseExpr()) else None
    SqlShow(kind, target, like, where, full)
  }

  private def parseCreate(): Statement = {
    expect("CREATE")
    eat("OR"); eat("REPLACE")
    val kind = ident().toUpperCase // SOURCE | SCHEMA | TABLE | VIEW | CONTINUOUSVIEW
    val ifNotExists = if (kw("IF")) { next(); expect("NOT"); expect("EXISTS"); true } else false
    val name = ident()
    // optional (col type, …) DDL — kept as raw strings
    val cols = collection.mutable.ArrayBuffer[String]()
    if (cur.is("(")) {
      var depth = 0
      val sb = new StringBuilder
      next(); depth = 1
      while (depth > 0 && !ep.atEof) {
        if (cur.is("(")) depth += 1
        else if (cur.is(")")) depth -= 1
        if (depth > 0) {
          if (cur.is(",") && depth == 1) { cols += sb.toString.trim; sb.clear() }
          else sb.append(cur.text).append(' ')
        }
        next()
      }
      if (sb.nonEmpty) cols += sb.toString.trim
    }
    // MySQL-style table options: ENGINE=InnoDB AUTO_INCREMENT=4080
    // DEFAULT CHARSET=utf8 — accepted and discarded (the reference's
    // lexer consumes them the same way, rel/parse_sql_test.go:636-643)
    while (cur.kind == TIdent &&
        !Set("WITH", "AS", "SELECT").contains(cur.text.toUpperCase) && !ep.atEof) {
      next()
      if (cur.is("=")) {
        next()
        if (ep.atEof) throw ParseException("expected value after '=' in table options")
        next()
      }
    }
    // WITH {json} or WITH k = v, … (both reference forms)
    val withJson =
      if (eat("WITH")) {
        if (cur.is("{")) Some(captureJson())
        else { parseWithPairs(); None }
      } else None
    val select = if (kw("AS")) { next(); Some(parseSelect()) }
                 else if (kw("SELECT")) Some(parseSelect()) else None
    SqlCreate(kind, name, ifNotExists, cols.toSeq, withJson, select)
  }

  private def parseDrop(): Statement = {
    expect("DROP")
    val kind = ident().toUpperCase
    val ifExists = if (kw("IF")) { next(); expect("EXISTS"); true } else false
    SqlDrop(kind, ident(), ifExists)
  }

  /** PREPARE name FROM '<sql>' — the inner statement is parsed
    * recursively like the reference (rel/parse_sql.go:471-505). */
  private def parsePrepare(): Statement = {
    expect("PREPARE")
    val name = ident()
    expect("FROM")
    if (cur.kind != TString) throw ParseException("expected statement value after FROM")
    val inner = SqlParser.parse(next().text)
    SqlPrepare(name, inner)
  }

  /** Capture a trailing `{...}` JSON blob as raw text. */
  private def captureJson(): String = {
    val sb = new StringBuilder
    if (!cur.is("{")) throw ParseException("expected { after WITH")
    var depth = 0
    do {
      if (cur.is("{")) depth += 1
      if (cur.is("}")) depth -= 1
      sb.append(cur.kind match {
        case TString => "\"" + cur.text + "\""
        case _ => cur.text
      })
      sb.append(' ')
      next()
    } while (depth > 0 && !ep.atEof)
    sb.toString.trim
  }

  private def skipJson(): Unit = { captureJson(); () }
}

object SqlParser {
  def parse(sql: String): Statement = {
    val p = new SqlParser(Lexer.lex(sql))
    val st = p.parseStatement()
    p.parseEnd()
    st
  }

  /** Parse a `;`-separated script into its statements — the reference's
    * rel.ParseSqlStatements (rel/parse_sql_test.go TestSqlMultiStatement:
    * `SET @var1 = "hello"; select a, b from accounts where name = @var1`).
    * parseStatement consumes one trailing `;` itself, so statements are
    * read back-to-back until EOF. */
  def parseStatements(sql: String): Seq[Statement] = {
    val p = new SqlParser(Lexer.lex(sql))
    val out = collection.mutable.ArrayBuffer[Statement]()
    while (!p.atEnd) out += p.parseStatement()
    out.toSeq
  }
}
