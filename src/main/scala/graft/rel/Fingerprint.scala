package graft.rel

import graft.expr._

/** Statement fingerprinting for plan caching — the reference's
  * expr.FingerPrinter / SqlSelect.FingerPrintID (rel/sql.go,
  * expr/dialects.go): two statements that differ only in literal values
  * or identifier case share one fingerprint, so a cached physical plan
  * can be reused across parameterizations.
  */
object Fingerprint {

  /** Literal-erased, case-normalized text of an expression tree. */
  private def norm(n: Node): String = n match {
    case _: StringNode | _: NumberNode | _: BoolNode | NullNode => "?"
    case IdentityNode(parts) => parts.map(_.toLowerCase).mkString(".")
    case ArrayNode(items) => items.map(norm).mkString("[", ", ", "]")
    case BinaryNode(op, l, r, neg) =>
      s"${norm(l)} ${if (neg) "NOT " else ""}$op ${norm(r)}"
    case BooleanNode(op, args, neg) =>
      args.map(norm).mkString(s"${if (neg) "NOT " else ""}$op (", ", ", ")")
    case UnaryNode(op, c) => s"$op ${norm(c)}"
    case TriNode(op, a, b, c, neg) =>
      s"${norm(a)} ${if (neg) "NOT " else ""}$op ${norm(b)} AND ${norm(c)}"
    case FuncNode(name, args) => args.map(norm).mkString(s"$name(", ", ", ")")
    case CaseNode(branches, els) =>
      "case " + branches.map { case (c, v) =>
        "when " + norm(c) + " then " + norm(v) }.mkString(" ") +
        els.map(e => " else " + norm(e)).getOrElse("") + " end"
    case WindowNode(f, parts, ord, frame, _) =>
      norm(f) + " over (" + parts.map(norm).mkString(", ") + " ; " +
        ord.map { case (n, asc) => norm(n) + (if (asc) " asc" else " desc") }
          .mkString(", ") +
        frame.map { case (u, s, e) => s" ; ${u.toLowerCase} $s $e" }.getOrElse("") + ")"
    case SubqueryNode(tokens) => "(" + tokens.map { t =>
      t.kind match {
        // literals inside the subquery erase like any other literal;
        // identifiers case-normalize; keywords/operators keep their text
        case Lexer.TString | Lexer.TNumber => "?"
        case Lexer.TIdent => t.text.toLowerCase
        case _ => t.text.toLowerCase
      }
    }.mkString(" ") + ")"
    case IncludeNode(name, neg) => s"${if (neg) "NOT " else ""}INCLUDE ${name.toLowerCase}"
  }

  private def normStmt(s: Statement): String = s match {
    case SqlWith(ctes, body, recursive) =>
      "WITH " + (if (recursive) "RECURSIVE " else "") +
        ctes.map { case CteDef(n, cols, st) =>
          n.toLowerCase +
            (if (cols.nonEmpty) cols.map(_.toLowerCase).mkString("(", ", ", ")") else "") +
            " AS (" + normStmt(st) + ")" }.mkString(", ") +
        " " + normStmt(body)
    case sel: SqlSelect =>
      val cols = sel.columns.map { c =>
        norm(c.expr) +
          (if (c.starExclude.nonEmpty)
            " EXCLUDE (" + c.starExclude.map(_.toLowerCase).mkString(", ") + ")"
          else "") +
          (if (c.starReplace.nonEmpty)
            " REPLACE (" + c.starReplace.map { case (e, n) =>
              norm(e) + " AS " + n.toLowerCase }.mkString(", ") + ")"
          else "") +
          c.guard.map(g => " IF " + norm(g)).getOrElse("") +
          c.alias.map(a => " AS " + a.toLowerCase).getOrElse("")
      }.mkString(", ")
      val from = sel.from.map {
        case TableSource(name, _, jt, on) =>
          name.toLowerCase + s"/$jt" + on.map(o => " ON " + norm(o)).getOrElse("")
        case SubquerySource(sub, _, jt, on, lat) =>
          (if (lat) "lateral " else "") + "(" + normStmt(sub) + s")/$jt" + on.map(o => " ON " + norm(o)).getOrElse("")
        case ValuesSource(rows, _, cols, jt, on) =>
          // literal rows erase like other literals; arity + column names
          // remain (two VALUES tables of different shape must not alias)
          s"(values ${rows.length}x" + cols.map(_.toLowerCase)
            .mkString("(", ", ", ")") + s")/$jt" +
            on.map(o => " ON " + norm(o)).getOrElse("")
        // PIVOT/UNPIVOT sources: printed SQL is already canonical —
        // lowercase it rather than leaving a MatchError hole
        case other => SqlWriter.toSql(SqlSelect(
          Seq(SelectColumn(graft.expr.IdentityNode(Seq("*")), None, None)),
          Seq(other))).toLowerCase
      }.mkString(" ")
      Seq(
        "SELECT" + (if (sel.distinct) " DISTINCT" else "") +
          (if (sel.distinctOn.nonEmpty)
            " DISTINCT ON (" + sel.distinctOn.map(norm).mkString(", ") + ")"
          else ""),
        cols,
        // INTO is a side-effect target: two statements writing different
        // tables must NOT share a cached plan
        sel.into.map("INTO " + _.toLowerCase).getOrElse(""),
        "FROM", from,
        sel.where.map("WHERE " + norm(_)).getOrElse(""),
        if (sel.groupBy.nonEmpty)
          "GROUP BY " + (if (sel.groupByRollup) "ROLLUP "
            else if (sel.groupByCube) "CUBE " else "") +
            sel.groupBy.map(norm).mkString(", ")
        else if (sel.groupByAll) "GROUP BY ALL"
        else "",
        sel.having.map("HAVING " + norm(_)).getOrElse(""),
        sel.qualify.map("QUALIFY " + norm(_)).getOrElse(""),
        if (sel.orderBy.nonEmpty)
          "ORDER BY " + sel.orderBy.map { case (n, asc) =>
            norm(n) + (if (asc) " ASC" else " DESC") }.mkString(", ")
        else "",
        // LIMIT/OFFSET values are literals: erased like other literals
        sel.limit.map(_ => "LIMIT ?").getOrElse(""),
        sel.offset.map(_ => "OFFSET ?").getOrElse(""),
        // WITH-tail keys shape execution (broadcast/repartition), so
        // they are plan-relevant; values erase like other literals
        if (sel.withConfig.nonEmpty)
          "WITH " + sel.withConfig.map { case (k, _) =>
            k.toLowerCase + " = ?" }.mkString(", ")
        else "")
        .filter(_.nonEmpty).mkString(" ")
    case SqlSetOp(op, all, l, r, _, _) =>
      normStmt(l) + s" $op${if (all) " ALL" else ""} " + normStmt(r)
    case other => other.toString.toLowerCase
  }

  /** Normalized dialect text (the FingerPrinter's output). */
  def text(s: Statement): String = normStmt(s)

  /** Stable fingerprint id (the reference hashes the normalized text). */
  def id(s: Statement): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(normStmt(s).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(md).getLong
  }
}
