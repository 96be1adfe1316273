package graft.rel

import graft.expr.Node

/** Statement → SQL text, the reference's `SqlSelect.String()` /
  * WriteDialect surface (rel/sql.go) used to re-write queries shipped
  * to individual sources during joins. Guaranteed round-trippable:
  * `parse(toSql(parse(s)))` equals `parse(s)` (rel/sql_test.go
  * TestToSql, ported in SqlWriterSpec).
  */
object SqlWriter {

  private def col(c: SelectColumn): String =
    c.expr.text +
      (if (c.starExclude.nonEmpty)
        " EXCLUDE (" + c.starExclude.mkString(", ") + ")" else "") +
      (if (c.starReplace.nonEmpty)
        " REPLACE (" + c.starReplace.map { case (e, n) =>
          s"${e.text} AS $n" }.mkString(", ") + ")" else "") +
      c.alias.map(a => " AS " + graft.expr.StringUtil.identityMaybeQuote('`', a)).getOrElse("") +
      c.guard.map(g => " IF " + g.text).getOrElse("")

  private def joinKw(j: JoinType): String = j match {
    case JoinType.Inner => "INNER JOIN"
    case JoinType.Left => "LEFT JOIN"
    case JoinType.Right => "RIGHT JOIN"
    case JoinType.Outer => "FULL OUTER JOIN"
    case JoinType.Cross => "CROSS JOIN"
    case JoinType.Semi => "SEMI JOIN"
    case JoinType.Anti => "ANTI JOIN"
    case JoinType.Asof => "ASOF JOIN"
    case JoinType.AsofLeft => "ASOF LEFT JOIN"
  }

  private def from(fs: Seq[FromSource]): String =
    fs.zipWithIndex.map { case (f, i) =>
      val base = f match {
        case TableSource(name, alias, _, _) =>
          graft.expr.StringUtil.identityMaybeQuote('`', name) +
            alias.map(" AS " + _).getOrElse("")
        case SubquerySource(sub, alias, _, _, lat) =>
          (if (lat) "LATERAL " else "") + s"(${toSql(sub)}) AS $alias"
        case ValuesSource(rows, alias, cols, _, _) =>
          "(VALUES " + rows.map(_.map(_.text).mkString("(", ", ", ")"))
            .mkString(", ") + s") AS $alias" + cols.mkString("(", ", ", ")")
        case PivotSource(src, agg, forCol, values, alias, _, _) =>
          val inner = src match {
            case TableSource(name, a, _, _) =>
              graft.expr.StringUtil.identityMaybeQuote('`', name) +
                a.map(" AS " + _).getOrElse("")
            case SubquerySource(sub, _, _, _, _) => s"(${toSql(sub)})"
            case ValuesSource(rows, a, cs, _, _) =>
              "(VALUES " + rows.map(_.map(_.text).mkString("(", ", ", ")"))
                .mkString(", ") + s") AS $a" + cs.mkString("(", ", ", ")")
            case p => throw new IllegalStateException(
              s"nested PIVOT cannot print: $p")
          }
          val vals = values.map { case (v, a) =>
            v.text + a.map(" AS " + _).getOrElse("") }.mkString(", ")
          s"$inner PIVOT (${agg.text} FOR $forCol IN ($vals))" +
            alias.map(" AS " + _).getOrElse("")
        case UnpivotSource(src, valCol, keyCol, cols, alias, _, _) =>
          val inner = src match {
            case TableSource(name, a, _, _) =>
              graft.expr.StringUtil.identityMaybeQuote('`', name) +
                a.map(" AS " + _).getOrElse("")
            case SubquerySource(sub, _, _, _, _) => s"(${toSql(sub)})"
            case ValuesSource(rows, a, cs, _, _) =>
              "(VALUES " + rows.map(_.map(_.text).mkString("(", ", ", ")"))
                .mkString(", ") + s") AS $a" + cs.mkString("(", ", ", ")")
            case p => throw new IllegalStateException(s"nested pivot cannot print: $p")
          }
          val cs = cols.map { case (c, a) =>
            c + a.map(" AS " + _).getOrElse("") }.mkString(", ")
          s"$inner UNPIVOT ($valCol FOR $keyCol IN ($cs))" +
            alias.map(" AS " + _).getOrElse("")
        case SampleSource(src, permill, key, _, _) =>
          val inner = src match {
            case TableSource(name, a, _, _) =>
              graft.expr.StringUtil.identityMaybeQuote('`', name) +
                a.map(" AS " + _).getOrElse("")
            case SubquerySource(sub, alias, _, _, _) => s"(${toSql(sub)}) AS $alias"
            case ValuesSource(rows, a, cs, _, _) =>
              "(VALUES " + rows.map(_.map(_.text).mkString("(", ", ", ")"))
                .mkString(", ") + s") AS $a" + cs.mkString("(", ", ", ")")
            case p => throw new IllegalStateException(s"nested sample cannot print: $p")
          }
          val pct = if (permill % 10 == 0) (permill / 10).toString
                    else (permill / 10.0).toString
          s"$inner TABLESAMPLE ($pct PERCENT) ON (${key.text})"
      }
      val on = f.joinOn.map {
        case graft.expr.FuncNode("__natural", _) => ""
        case graft.expr.FuncNode("__using", args) =>
          " USING (" + args.map(_.text).mkString(", ") + ")"
        case o => " ON " + o.text
      }.getOrElse("")
      val natural = f.joinOn.exists {
        case graft.expr.FuncNode("__natural", _) => true; case _ => false }
      if (i == 0) base
      else s"${if (natural) "NATURAL " else ""}${joinKw(f.joinType)} $base$on"
    }.mkString(" ")

  private def orderBy(o: Seq[(Node, Boolean)]): String =
    o.map { case (n, asc) => n.text + (if (asc) " ASC" else " DESC") }.mkString(", ")

  def toSql(st: Statement): String = st match {
    case s: SqlSelect =>
      Seq(
        "SELECT" + (if (s.distinct) " DISTINCT" else "") +
          (if (s.distinctOn.nonEmpty)
            " DISTINCT ON (" + s.distinctOn.map(_.text).mkString(", ") + ")"
          else ""),
        s.columns.map(col).mkString(", "),
        s.into.map("INTO " + _).getOrElse(""),
        if (s.from.nonEmpty) "FROM " + from(s.from) else "",
        s.where.map("WHERE " + _.text).getOrElse(""),
        if (s.groupBy.nonEmpty) {
          val keys = s.groupBy.map(_.text).mkString(", ")
          if (s.groupByRollup) s"GROUP BY ROLLUP($keys)"
          else if (s.groupByCube) s"GROUP BY CUBE($keys)"
          else if (s.groupingSets.nonEmpty)
            "GROUP BY GROUPING SETS (" + s.groupingSets.map(
              _.map(_.text).mkString("(", ", ", ")")).mkString(", ") + ")"
          else "GROUP BY " + keys
        } else if (s.groupByAll) "GROUP BY ALL" else "",
        s.having.map("HAVING " + _.text).getOrElse(""),
        s.qualify.map("QUALIFY " + _.text).getOrElse(""),
        if (s.orderBy.nonEmpty) "ORDER BY " + orderBy(s.orderBy) else "",
        s.limit.map("LIMIT " + _).getOrElse(""),
        s.offset.map("OFFSET " + _).getOrElse(""),
        if (s.withConfig.nonEmpty)
          "WITH " + s.withConfig.map { case (k, v) => s"$k = ${v.text}" }
            .mkString(", ")
        else "")
        .filter(_.nonEmpty).mkString(" ")
    case SqlWith(ctes, body, recursive) =>
      "WITH " + (if (recursive) "RECURSIVE " else "") +
        ctes.map { case CteDef(n, cols, st) =>
          val cl = if (cols.nonEmpty) cols.mkString("(", ", ", ")") else ""
          s"$n$cl AS (${toSql(st)})"
        }.mkString(", ") + " " + toSql(body)
    case SqlSetOp(op, all, l, r, ob, lim) =>
      toSql(l) + s" $op${if (all) " ALL" else ""} " + toSql(r) +
        (if (ob.nonEmpty) " ORDER BY " + orderBy(ob) else "") +
        lim.map(" LIMIT " + _).getOrElse("")
    case SqlMerge(t, ta, src, on, whens) =>
      s"MERGE INTO $t" + ta.map(" AS " + _).getOrElse("") +
        " USING " + from(Seq(src)) + " ON " + on.text + " " +
        whens.map { w =>
          "WHEN " + (if (w.matched) "MATCHED" else "NOT MATCHED") +
            w.cond.map(" AND " + _.text).getOrElse("") + " THEN " +
            (w.action match {
              case MergeUpdate(set) => "UPDATE SET " +
                set.map { case (k, v) => s"$k = ${v.text}" }.mkString(", ")
              case MergeDelete => "DELETE"
              case MergeInsert(cols, vals) =>
                "INSERT " +
                  (if (cols.nonEmpty) cols.mkString("(", ", ", ")") + " " else "") +
                  "VALUES (" + vals.map(_.text).mkString(", ") + ")"
            })
        }.mkString(" ")
    case FilterStatement(f, fromT, lim, alias) =>
      "FILTER " + f.text +
        fromT.map(" FROM " + _).getOrElse("") +
        lim.map(" LIMIT " + _).getOrElse("") +
        alias.map(" ALIAS " + _).getOrElse("")
    case SqlDescribe(t) => s"DESCRIBE $t"
    case SqlUse(db) => s"USE $db"
    case SqlSet(name, v) => s"SET $name = ${v.text}"
    case SqlDrop(kind, name, ifExists) =>
      s"DROP $kind ${if (ifExists) "IF EXISTS " else ""}$name"
    case other =>
      throw new UnsupportedOperationException(s"toSql: ${other.getClass.getSimpleName}")
  }
}
