package graft.rel

import graft.expr.Node

/** Statement ASTs mirroring the reference's rel package
  * (/root/reference/rel/sql.go:80-316, rel/filter.go:30-46) — the SQL
  * dialect (SELECT/INSERT/UPDATE/UPSERT/DELETE/SET/USE/SHOW/DESCRIBE/
  * CREATE/DROP + transaction no-ops) and FilterQL.
  */
sealed trait Statement

/** `expr [IF guard] [AS alias]` — guard is the reference's column-level
  * IF (drops the COLUMN when false, exec/projection.go:158-175).
  * starExclude / starReplace carry DuckDB's `* EXCLUDE (a, …)` /
  * `* REPLACE (e AS a, …)` star modifiers (only meaningful when expr
  * is `*`): EXCLUDE drops named columns from the expansion, REPLACE
  * substitutes an expression keeping the column's name and position. */
final case class SelectColumn(expr: Node, alias: Option[String], guard: Option[Node],
    starExclude: Seq[String] = Nil, starReplace: Seq[(Node, String)] = Nil) {
  def outputName: String = alias.getOrElse(graft.rel.Ast.defaultName(expr))
}

sealed trait JoinType
object JoinType {
  case object Inner extends JoinType
  case object Left extends JoinType
  case object Right extends JoinType
  case object Outer extends JoinType
  case object Cross extends JoinType
  /** `SEMI JOIN` / `ANTI JOIN` (DuckDB dialect, beyond ref): keep /
    * drop left rows with a right match; only left columns survive.
    * The relational spelling of the WHERE [NOT] IN/EXISTS rewrites
    * the planner already performs. */
  case object Semi extends JoinType
  case object Anti extends JoinType
  /** `ASOF [LEFT] JOIN` (DuckDB dialect, beyond ref): each left row
    * pairs with the single right row holding the LATEST right
    * timestamp at-or-before the left one (per equality keys). Planned
    * by rewrite — a tagged union + one window, no join operator. */
  case object Asof extends JoinType
  case object AsofLeft extends JoinType
  def spark(j: JoinType): String = j match {
    case Inner => "inner"; case Left => "left"; case Right => "right"
    case Outer => "outer"; case Cross => "cross"
    case Semi => "left_semi"; case Anti => "left_anti"
    case Asof | AsofLeft =>
      throw new IllegalArgumentException("ASOF JOIN plans by rewrite, not a Spark join type")
  }
}

sealed trait FromSource {
  def aliasName: String
  def joinType: JoinType
  def joinOn: Option[Node]
}
final case class TableSource(name: String, alias: Option[String],
    joinType: JoinType = JoinType.Inner, joinOn: Option[Node] = None) extends FromSource {
  def aliasName: String = alias.getOrElse(name)
}
/** `lateral = true` marks `FROM t, LATERAL (SELECT …) l` — the inner
  * select may reference the preceding sources' columns (cross apply).
  * Planned by rewrite: correlated-aggregate laterals become a grouped
  * aggregate joined back (count coalesced to 0 for empty groups),
  * LIMIT-k laterals a join + per-outer-row rank window. */
final case class SubquerySource(select: SqlSelect, alias: String,
    joinType: JoinType = JoinType.Inner, joinOn: Option[Node] = None,
    lateral: Boolean = false) extends FromSource {
  def aliasName: String = alias
}
/** SQL-standard `<source> PIVOT (agg FOR col IN (v1 [AS a1], …))`
  * (beyond the reference dialect): the source's remaining columns
  * group implicitly, one output column per IN value named by the
  * value (or its alias). */
final case class PivotSource(source: FromSource, agg: Node, forCol: String,
    values: Seq[(Node, Option[String])], alias: Option[String] = None,
    joinType: JoinType = JoinType.Inner, joinOn: Option[Node] = None) extends FromSource {
  def aliasName: String = alias.getOrElse(source.aliasName)
}
/** SQL-standard `<source> UNPIVOT (val FOR key IN (c1 [AS l1], …))`
  * (beyond the reference dialect): melts the named columns into
  * (key, val) rows, key labeled by the column name or its alias;
  * NULL cells are excluded (the standard default, and DuckDB's). */
final case class UnpivotSource(source: FromSource, valCol: String, keyCol: String,
    cols: Seq[(String, Option[String])], alias: Option[String] = None,
    joinType: JoinType = JoinType.Inner, joinOn: Option[Node] = None) extends FromSource {
  def aliasName: String = alias.getOrElse(source.aliasName)
}
/** Deterministic `<source> TABLESAMPLE (n PERCENT) ON (keyExpr)`
  * (extension): keeps rows whose md5-of-key permill bucket falls below
  * n·10 — content-addressed sampling, reproducible across runs AND
  * engines (standard BERNOULLI/SYSTEM sampling is engine-random, so it
  * could never survive an oracle replay; the mandatory ON names the
  * identity the sample is addressed by, same scheme as the pipeline's
  * rateSample/splitAssign operators). */
final case class SampleSource(source: FromSource, permill: Int, key: Node,
    joinType: JoinType = JoinType.Inner, joinOn: Option[Node] = None) extends FromSource {
  def aliasName: String = source.aliasName
}

/** `(VALUES (r1c1, …), …) AS t(c1, …)` — an inline literal table in
  * FROM position (beyond the reference dialect, whose only VALUES is
  * the INSERT form). The column alias list is mandatory: neither
  * engine-default naming (Spark col1…, DuckDB col0…) is portable. */
final case class ValuesSource(rows: Seq[Seq[Node]], alias: String, cols: Seq[String],
    joinType: JoinType = JoinType.Inner, joinOn: Option[Node] = None) extends FromSource {
  def aliasName: String = alias
}

final case class SqlSelect(
    columns: Seq[SelectColumn],
    from: Seq[FromSource],
    distinct: Boolean = false,
    where: Option[Node] = None,
    groupBy: Seq[Node] = Nil,
    // GROUP BY ROLLUP(...) / CUBE(...) — subtotal grouping sets
    // (beyond ref); at most one of the two is set
    groupByRollup: Boolean = false,
    groupByCube: Boolean = false,
    // GROUP BY GROUPING SETS ((a, b), (a), ()) — the general grouping-
    // set form (beyond ref); groupBy holds the distinct keys in first-
    // appearance order, groupingSets the per-set key lists
    groupingSets: Seq[Seq[Node]] = Nil,
    having: Option[Node] = None,
    orderBy: Seq[(Node, Boolean)] = Nil, // (expr, ascending)
    limit: Option[Int] = None,
    offset: Option[Int] = None,
    into: Option[String] = None,
    // QUALIFY predicate over the PROJECTED row (post-window filter,
    // Snowflake/DuckDB-style; beyond the reference) — may reference
    // select aliases and plain columns
    qualify: Option[Node] = None,
    // SELECT DISTINCT ON (exprs): keep ONE row per distinct key tuple,
    // the first under the statement's ORDER BY (DuckDB/Postgres
    // dialect; beyond the reference). Mutually exclusive with plain
    // DISTINCT; requires ORDER BY so the kept row is deterministic.
    distinctOn: Seq[Node] = Nil,
    // GROUP BY ALL (DuckDB dialect): group by every select expression
    // that contains no aggregate — resolved at plan time, where
    // aggregate-ness is known (groupBy stays empty in the AST)
    groupByAll: Boolean = false,
    // the reference's `WITH key = value, …` statement-config tail
    // (rel/sql.go:100 With JsonHelper — arbitrary properties). Here the
    // recognized keys drive Spark execution: broadcast = "alias[,…]"
    // pins a broadcast hint on those join sources, repartition = n /
    // repartition_by = "col[,…]" / coalesce = n shape the output
    // partitioning. Unrecognized keys are carried and ignored, like the
    // reference. Values are literal nodes (string/number/bool).
    withConfig: Seq[(String, Node)] = Nil) extends Statement

/** One common table expression: `name[(col, …)] AS (stmt)`. The
  * optional column alias list renames the CTE's output positionally
  * (required in practice for recursive CTEs, where the recursive term
  * must see stable column names). */
final case class CteDef(name: String, cols: Seq[String], stmt: Statement)

/** `WITH [RECURSIVE] name[(cols)] AS (SELECT …)[, …] <body>` — common
  * table expressions (beyond the reference dialect, which has no
  * WITH-prefix statement form; its only WITH is the `key = value`
  * statement-config tail). Each CTE is in scope for the CTEs after it
  * and for the body; a CTE name shadows a registered table of the same
  * name. With RECURSIVE, a CTE whose UNION [ALL] chain's final term
  * references its own name is evaluated to fixpoint (semi-naive:
  * each iteration sees only the previous iteration's new rows). */
final case class SqlWith(ctes: Seq[CteDef], body: Statement,
    recursive: Boolean = false) extends Statement

/** UNION / INTERSECT / EXCEPT [ALL] chain — beyond the reference (its
  * dialect has no set ops, SURVEY §2.7); trailing ORDER BY/LIMIT of the
  * right-most SELECT applies to the whole result. */
final case class SqlSetOp(op: String, all: Boolean, left: Statement, right: Statement,
    orderBy: Seq[(graft.expr.Node, Boolean)] = Nil, limit: Option[Int] = None) extends Statement

final case class SqlInsert(table: String, columns: Seq[String],
    values: Seq[Seq[Node]], select: Option[SqlSelect]) extends Statement
final case class SqlUpdate(table: String, set: Seq[(String, Node)], where: Option[Node]) extends Statement
final case class SqlUpsert(table: String, columns: Seq[String],
    values: Seq[Seq[Node]], set: Seq[(String, Node)]) extends Statement
final case class SqlDelete(table: String, where: Option[Node], limit: Option[Int]) extends Statement

/** `MERGE INTO target [AS t] USING src [AS s] ON cond WHEN …` (beyond
  * ref — the set-based CDC upsert). Actions: WHEN MATCHED [AND c] THEN
  * UPDATE SET / DELETE; WHEN NOT MATCHED [AND c] THEN INSERT. First
  * matching WHEN wins per row; a target row with multiple source
  * matches raises (standard MERGE ambiguity semantics). */
sealed trait MergeAction
final case class MergeUpdate(set: Seq[(String, Node)]) extends MergeAction
case object MergeDelete extends MergeAction
final case class MergeInsert(columns: Seq[String], values: Seq[Node]) extends MergeAction
final case class MergeWhen(matched: Boolean, cond: Option[Node], action: MergeAction)
final case class SqlMerge(target: String, targetAlias: Option[String],
    source: FromSource, on: Node, whens: Seq[MergeWhen]) extends Statement

final case class SqlSet(name: String, value: Node) extends Statement
final case class SqlUse(db: String) extends Statement
final case class SqlShow(kind: String, target: Option[String],
    like: Option[String], where: Option[Node], full: Boolean = false) extends Statement
final case class SqlDescribe(table: String) extends Statement
final case class SqlExplain(stmt: Statement) extends Statement
final case class SqlCreate(kind: String, name: String, ifNotExists: Boolean,
    columnsDdl: Seq[String], withJson: Option[String], select: Option[SqlSelect]) extends Statement
final case class SqlDrop(kind: String, name: String, ifExists: Boolean) extends Statement
/** BEGIN/COMMIT/ROLLBACK — parsed and ignored (exec/command.go:59-61). */
final case class SqlNoop(keyword: String) extends Statement
/** PREPARE name FROM '<sql>' — parsed like the reference
  * (rel/parse_sql.go:471-505, inner statement parsed recursively);
  * execution errors not-implemented (exec/executor.go:144-146). */
final case class SqlPrepare(name: String, stmt: Statement) extends Statement

/** FilterQL: `FILTER <expr> [FROM t] [LIMIT n] [ALIAS name]` and
  * `SELECT cols FROM t FILTER <expr>` (rel/filter.go). */
final case class FilterStatement(filter: Node, from: Option[String],
    limit: Option[Int], alias: Option[String]) extends Statement
final case class FilterSelect(columns: Seq[SelectColumn], from: Option[String],
    filter: Node, limit: Option[Int], alias: Option[String]) extends Statement

object Ast {
  /** Output column name when no alias given: the expression's text,
    * matching the reference's behavior of naming by source text. */
  def defaultName(n: Node): String = n match {
    case graft.expr.IdentityNode(parts) => parts.last
    case other => other.text
  }
}
