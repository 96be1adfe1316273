package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}
import graft.expr._
import graft.rel._

/** Statement → DataFrame planner, mirroring the reference's
  * PlannerDefault.WalkSelect pipeline (/root/reference/plan/
  * planner_select.go:27-141): Source(s) → Join → Where → GroupBy →
  * Having → Order → Projection → Limit — except each stage is a lazy
  * DataFrame transformation, so Catalyst performs predicate pushdown,
  * column pruning, join selection (broadcast vs shuffle) and AQE
  * replanning that the reference hand-rolls (rel/sql_rewrite.go) or
  * lacks entirely.
  */
final class Planner(catalog: String => DataFrame,
    vars: Map[String, Any] = Map.empty,
    includer: String => Option[Node] = _ => None) {

  /** Plan a SELECT or a set-operation chain. */
  def planStatement(st: Statement): DataFrame = st match {
    case s: SqlSelect => plan(s)
    case SqlSetOp(op, all, l, r, orderBy, limit) =>
      val ld = planStatement(l); val rd = planStatement(r)
      var out = (op, all) match {
        case ("UNION", true)      => ld.union(rd)
        case ("UNION", false)     => ld.union(rd).distinct()
        case ("INTERSECT", true)  => ld.intersectAll(rd)
        case ("INTERSECT", false) => ld.intersect(rd)
        case ("EXCEPT", true)     => ld.exceptAll(rd)
        case ("EXCEPT", false)    => ld.except(rd)
        case other                => throw BuildException(s"unknown set op $other")
      }
      if (orderBy.nonEmpty) {
        val ctx = BuildCtx(Some(out.schema), vars, includer)
        out = out.orderBy(orderBy.map { case (n, asc) =>
          val c = ColumnBuilder.build(n, ctx)
          if (asc) c.asc else c.desc
        }: _*)
      }
      limit.map(out.limit).getOrElse(out)
    case other => throw BuildException(s"not a plannable statement: $other")
  }

  def plan(sel0: SqlSelect): DataFrame = {
    val (sel1, pendingAggScalars) = substituteSelectScalars(sel0)
    // is a pending post-agg scalar marker (`__pasq_N`) anywhere in n?
    def containsPendingScalar(n: Node): Boolean =
      pendingAggScalars.nonEmpty && {
        val names = pendingAggScalars.map(_._1).toSet
        def go(m: Node): Boolean = m match {
          case IdentityNode(Seq(p)) => names.contains(p)
          case BinaryNode(_, l, r, _) => go(l) || go(r)
          case BooleanNode(_, args, _) => args.exists(go)
          case UnaryNode(_, c) => go(c)
          case TriNode(_, a, b, c, _) => go(a) || go(b) || go(c)
          case FuncNode(_, args) => args.exists(go)
          case CaseNode(bs, e) =>
            bs.exists { case (w, t) => go(w) || go(t) } || e.exists(go)
          case ArrayNode(items) => items.exists(go)
          case WindowNode(f, pb, ob, _, _) =>
            go(f) || pb.exists(go) || ob.exists(p => go(p._1))
          case _ => false
        }
        go(n)
      }
    // GROUP BY ALL (DuckDB dialect): keys = every select expression
    // with no aggregate in it — window expressions and `*` excluded
    // (Spark's analyzer rejects either as a grouping key loudly), and
    // post-agg scalar markers too (a scalar subquery is one constant
    // for all rows: grouping by it never changes the groups, and the
    // marker column does not exist below the aggregate)
    val sel = if (!sel1.groupByAll) sel1 else sel1.copy(
      groupBy = sel1.columns.collect {
        case c if c.expr != IdentityNode(Seq("*")) &&
          !containsWindow(c.expr) && !containsAgg(c.expr) &&
          !containsPendingScalar(c.expr) => c.expr
      },
      groupByAll = false)
    if (sel.from.isEmpty) { // literal select: SELECT 1, SELECT now()
      val ctx = BuildCtx(None, vars, includer)
      return applyLimit(catalogFreeRow().select(projCols(sel.columns, ctx): _*), sel)
    }

    // ---- sources + joins (exec/join.go ≙ df.join) ---------------------
    // WITH broadcast = "alias[, …]": pin Spark's broadcast hint on the
    // named sources — the statement-level spelling of the hand-placed
    // broadcast() the DataFrame queries use for dimension tables
    val bcastNames = withCfgStr(sel, "broadcast").toSeq
      .flatMap(_.split(",")).map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
    def planSource(s: FromSource): DataFrame = {
      val d = source(s)
      if (bcastNames.contains(s.aliasName.toLowerCase)) broadcast(d) else d
    }
    var df = planSource(sel.from.head)
    for (src <- sel.from.tail) src match {
      case ss: SubquerySource if ss.lateral =>
        df = planLateral(df, sel, ss)
      case _ if src.joinType == JoinType.Asof || src.joinType == JoinType.AsofLeft =>
        df = planAsof(df, src, planSource(src))
      case _ =>
      val right = planSource(src)
      val joined = (src.joinType, src.joinOn) match {
        case (JoinType.Cross, None) => df.crossJoin(right)
        case (jt, Some(FuncNode("__natural", _))) =>
          // NATURAL JOIN: USING over every shared column name; refuse
          // loudly when there is none (a silent cartesian is the classic
          // NATURAL-JOIN footgun)
          val shared = df.columns.filter(c =>
            right.columns.exists(_.equalsIgnoreCase(c))).toSeq
          if (shared.isEmpty)
            throw BuildException("NATURAL JOIN with no shared column names")
          df.join(right, shared, JoinType.spark(jt))
        case (jt, Some(FuncNode("__using", args))) =>
          // USING join: Spark's Seq-of-names form coalesces the key
          // columns into one, per the standard
          val names = args.collect { case IdentityNode(p) => p.mkString(".") }
          df.join(right, names, JoinType.spark(jt))
        case (jt, Some(on)) =>
          val ctx = mkCtx(df, right)
          df.join(right, ColumnBuilder.build(on, ctx), JoinType.spark(jt))
        case (jt, None) =>
          // Guard for programmatically-built ASTs: a qualified join with
          // no ON must not silently degrade to a cartesian product
          // (reference/rel/parse_sql.go:1264-1291 refuses it at parse time).
          throw BuildException(s"$jt JOIN requires ON clause")
      }
      df = joined
    }
    // ---- where (exec/where.go); IN-subqueries → semi/anti joins,
    // scalar comparisons against (SELECT agg …) → broadcast 1-row join
    // — the machinery lives in applyPredicate (shared with HAVING/DML)
    sel.where.foreach { w => df = applyPredicate(df, w, sel) }

    // ---- DISTINCT ON (DuckDB/Postgres dialect, beyond ref): one
    // window per key tuple over the PRE-projection frame — the kept
    // row is the first under the statement's ORDER BY, which must be
    // present (nondeterministic winners never survive an oracle
    // replay) and must reference source columns
    if (sel.distinctOn.nonEmpty) {
      if (sel.distinct || sel.groupBy.nonEmpty)
        throw BuildException(
          "DISTINCT ON cannot combine with DISTINCT or GROUP BY")
      if (sel.orderBy.isEmpty)
        throw BuildException(
          "DISTINCT ON requires ORDER BY to make the kept row deterministic")
      val donCtx = mkCtx(df)
      val parts = sel.distinctOn.map(ColumnBuilder.build(_, donCtx))
      val ords = sel.orderBy.map { case (n, asc) =>
        val c = ColumnBuilder.build(resolveAlias(n, sel.columns), donCtx)
        if (asc) c.asc else c.desc
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(parts: _*).orderBy(ords: _*)
      df = df.withColumn("__don_rk", row_number().over(w))
        .filter(col("__don_rk") === 1).drop("__don_rk")
    }

    // ---- subqueries in the SELECT list used as VALUES (r12):
    // `EXISTS (…) AS flag`, `x IN (SELECT …) AS member`, NOT-variants,
    // and scalars nested inside arithmetic/CASE. Each attaches as ONE
    // hidden column on the post-WHERE frame — the same bounded join
    // shapes as the WHERE machinery, with ANSI 3VL NULL verdicts —
    // and the select expression references it; the projection then
    // drops the plumbing by simply not selecting it. A bare `*`
    // expands to the PRE-attach columns so hidden columns never leak
    // into star output. (Bare uncorrelated/correlated-aggregate
    // scalars were already substituted by substituteSelectScalars;
    // what reaches here are the boolean shapes it passes through.)
    val cols: Seq[SelectColumn] = {
      val raw = sel.columns
      // hidden plumbing that must never reach a bare `*`: correlated
      // SELECT-scalar lateral values already ON the frame (`__ssqv_N`,
      // via substituteSelectScalars — the r12 ADVICE star leak), plus
      // columns the attaches BELOW and the ORDER BY/QUALIFY/guard
      // attaches AFTER this block will add — so any pending attach
      // forces the star to expand NOW, against the pre-attach schema
      val latHidden = df.columns.filter(isSubqueryPlumbing).toSet
      val willAttach = raw.exists(c => containsSubqueryNode(c.expr) ||
          c.guard.exists(containsSubqueryNode)) ||
        sel.orderBy.exists(p => containsSubqueryNode(p._1)) ||
        sel.qualify.exists(containsSubqueryNode)
      if (!willAttach && latHidden.isEmpty) raw
      else {
        val expanded =
          if (!raw.exists(c => c.expr == IdentityNode(Seq("*")) &&
              c.starExclude.isEmpty && c.starReplace.isEmpty)) raw
          else {
            val names = df.columns.toSeq.filterNot(latHidden)
            if (names.distinct.size != names.size)
              throw BuildException("subquery expressions in the SELECT " +
                "list cannot combine with * over ambiguous join columns")
            raw.flatMap { c =>
              if (c.expr == IdentityNode(Seq("*")) &&
                  c.starExclude.isEmpty && c.starReplace.isEmpty)
                names.map(f => SelectColumn(IdentityNode(Seq(f)), None, None))
              else Seq(c)
            }
          }
        expanded.zipWithIndex.map { case (c, ci) =>
          var c2 = c
          if (containsSubqueryNode(c2.expr)) {
            val (df2, e2, _) = attachExprSubqueries(df, c2.expr, sel, s"__bsq_s$ci")
            df = df2
            c2 = c2.copy(expr = e2)
          }
          // column guards `col IF expr` with subqueries (r13): the
          // verdict attaches as a hidden boolean on the pre-projection
          // frame; projCols' `when(guard, value)` then reads a plain
          // column and the projection drops the plumbing
          if (c2.guard.exists(containsSubqueryNode)) {
            val (df2, g2, _) = attachExprSubqueries(df, c2.guard.get, sel, s"__gsq_s$ci")
            df = df2
            c2 = c2.copy(guard = Some(g2))
          }
          c2
        }
      }
    }

    val postWhereCtx = mkCtx(df)

    // ---- projection planning -----------------------------------------
    // pending post-agg scalar markers force the aggregate path even in
    // the degenerate `SELECT (SELECT 5) FROM t GROUP BY ALL` shape
    // (keys emptied by the marker exclusion above): GROUP BY () is a
    // global aggregate, one row
    val isAgg = sel.groupBy.nonEmpty || cols.exists(c => containsAgg(c.expr)) ||
      cols.exists(c => containsPendingScalar(c.expr))

    if (!isAgg) {
      var out = df
      // subqueries inline in ORDER BY (r13, closing the last dialect
      // cliff): each verdict/value attaches as a hidden column on the
      // PRE-projection frame — the same bounded join shapes as every
      // other position — and the sort key references it like any
      // unprojected source column; the window/DISTINCT hidden-carry
      // machinery below then treats it uniformly, and the projection
      // drops it by not selecting it
      val selN: SqlSelect =
        if (!sel.orderBy.exists(p => containsSubqueryNode(resolveAlias(p._1, cols)))) sel
        else sel.copy(orderBy = sel.orderBy.map { case (n, asc) =>
          val r = resolveAlias(n, cols)
          if (!containsSubqueryNode(r)) (n, asc)
          else {
            val (d2, n2, _) = attachExprSubqueries(out, r, sel, "__obsq")
            out = d2
            (n2, asc)
          }
        })
      // QUALIFY with INLINE windows (`QUALIFY row_number() OVER … == 1`,
      // the DuckDB dedup idiom): the WHOLE predicate — aliases expanded
      // to their select expressions, so both select aliases and source
      // columns are in scope — computes as ONE hidden boolean column on
      // the PRE-projection frame (the same frame the select list's own
      // windows see, per ANSI "filter after window computation"), rides
      // through the projection, and filters after it, where Catalyst
      // pushes the now-plain predicate below any sort. The gate is the
      // RAW predicate: a QUALIFY that only references a select-window
      // ALIAS keeps the plain post-projection path (no second window
      // computation, and DISTINCT stays legal for it). SUBQUERIES in
      // QUALIFY (r13) ride the same hoist: the verdict attaches as a
      // hidden column on this same pre-projection frame first, so the
      // hoisted predicate is plain by the time it builds.
      val qColRaw: Option[String] = sel.qualify
        .filter(q => containsWindow(q) || containsSubqueryNode(q))
        .map { raw =>
          var q = resolveAliasDeep(raw, cols)
          if (containsSubqueryNode(q)) {
            val (d2, q2, _) = attachExprSubqueries(out, q, sel, "__qsq")
            out = d2
            q = q2
          }
          out = out.withColumn("__qualify",
            ColumnBuilder.build(q, mkCtx(out))
              .cast(org.apache.spark.sql.types.BooleanType))
          "__qualify"
        }
      // DISTINCT + inline-window QUALIFY (r12, DuckDB semantics): the
      // window evaluates over the pre-distinct rows and QUALIFY
      // filters BEFORE the dedup — so the hidden column is consumed
      // right here instead of riding through the projection
      var qualifyApplied = false
      val qCol: Option[String] =
        if (!sel.distinct) qColRaw
        else {
          qColRaw.foreach { nm =>
            out = out.filter(coalesce(col(nm), lit(false))).drop(nm)
            qualifyApplied = true
          }
          None
        }
      val qCarry = qCol.toSeq.map(col)
      // windows anywhere that must survive a sort: in the select list,
      // or inline in ORDER BY (alias-resolved — an alias of a select
      // window also counts, and both force the sort ABOVE the windows)
      val hasWindow = cols.exists(c => containsWindow(c.expr)) ||
        selN.orderBy.exists(p => containsWindow(resolveAlias(p._1, cols)))
      // ORDER BY before projection so sort keys may reference
      // non-projected columns; Spark preserves sort through select.
      // NOT when the projection evaluates window functions: the Window
      // operator's partition exchange destroys any earlier order (the
      // output would be unsorted and a LIMIT would keep wrong rows), so
      // that case sorts ABOVE the projection instead. (The QUALIFY
      // hoist above runs before this sort, so its exchange cannot
      // destroy it either.)
      if (selN.orderBy.nonEmpty && !sel.distinct && !hasWindow)
        out = out.orderBy(selN.orderBy.map { case (n, asc) =>
          val c = ColumnBuilder.build(resolveAlias(n, cols), mkCtx(out))
          if (asc) c.asc else c.desc
        }: _*)
      if (!sel.distinct) {
        if (!hasWindow || selN.orderBy.isEmpty) {
          out = out.select(projCols(cols, mkCtx(out)) ++ qCarry: _*)
        } else {
          // windows + ORDER BY: project (evaluating the windows), then
          // sort; unprojected sort keys ride as hidden columns and drop
          // after the sort (the DISTINCT path's hidden-key treatment)
          val ctxPre = mkCtx(out)
          def selectedName(n: Node): Option[String] =
            cols.find(c => c.expr.text == n.text || c.alias.contains(n.text)).map(_.outputName)
          val hasStar = cols.exists(_.expr == IdentityNode(Seq("*")))
          val resolved = selN.orderBy.map { case (n, asc) => (resolveAlias(n, cols), asc) }
          // a star keeps every SOURCE column through the projection, but
          // never the subquery plumbing — keys referencing it still
          // need the hidden carry
          val missing = resolved.filter { case (n, _) =>
            selectedName(n).isEmpty && (!hasStar || referencesPlumbing(n)) }
          val hidden = missing.zipWithIndex.map { case ((n, _), i) =>
            ColumnBuilder.build(n, ctxPre).as(s"__wsort_$i") }
          val hiddenName = missing.zipWithIndex.map { case ((n, _), i) =>
            n.text -> s"__wsort_$i" }.toMap
          out = out.select(projCols(cols, ctxPre) ++ hidden ++ qCarry: _*)
          out = out.orderBy(resolved.map { case (n, asc) =>
            val c = hiddenName.get(n.text).map(col)
              .orElse(selectedName(n).map(col))
              .getOrElse(ColumnBuilder.build(n, mkCtx(out)))
            if (asc) c.asc else c.desc
          }: _*)
          if (hidden.nonEmpty)
            out = out.select(cols.map(c => col(c.outputName)) ++ qCarry: _*)
        }
      } else {
        // DISTINCT + ORDER BY whose keys are NOT in the select list:
        // carry each missing key as a hidden column, dedupe on the
        // selected columns only, sort, then drop the hidden keys
        // (r3 verdict #6 — the old rebuild-after-distinct failed
        // analysis). WINDOW keys ride the same carry: the window
        // evaluates over the PRE-distinct rows — DuckDB's observable
        // semantics (its ORDER BY windows may reference non-selected
        // columns, impossible post-distinct) — and dropDuplicates
        // keeps an arbitrary survivor per group, so a replayable
        // ordering needs the window constant per distinct tuple (e.g.
        // an extremum PARTITIONed BY the selected keys), exactly as in
        // DuckDB (r12; the refusal this replaces was dead4f9).
        val ctxPre = mkCtx(out)
        def selectedName(n: Node): Option[String] =
          cols.find(c => c.expr.text == n.text || c.alias.contains(n.text)).map(_.outputName)
        val hasStar = cols.exists(_.expr == IdentityNode(Seq("*")))
        val resolved = selN.orderBy.map { case (n, asc) => (resolveAlias(n, cols), asc) }
        val missing = resolved.filter { case (n, _) =>
          selectedName(n).isEmpty && (!hasStar || referencesPlumbing(n)) }
        if (missing.isEmpty) {
          out = out.select(projCols(cols, ctxPre): _*).distinct()
          if (selN.orderBy.nonEmpty)
            out = out.orderBy(resolved.map { case (n, asc) =>
              val c = ColumnBuilder.build(n, mkCtx(out))
              if (asc) c.asc else c.desc
            }: _*)
        } else {
          val hidden = missing.zipWithIndex.map { case ((n, _), i) =>
            n.text -> ColumnBuilder.build(n, ctxPre).as(s"__sort_$i")
          }
          val hiddenName = hidden.zipWithIndex.map { case ((t, _), i) => t -> s"__sort_$i" }.toMap
          out = out.select(projCols(cols, ctxPre) ++ hidden.map(_._2): _*)
          out = out.dropDuplicates(cols.map(_.outputName))
          out = out.orderBy(resolved.map { case (n, asc) =>
            val c = hiddenName.get(n.text).map(col)
              .orElse(selectedName(n).map(col))
              .getOrElse(ColumnBuilder.build(n, mkCtx(out)))
            if (asc) c.asc else c.desc
          }: _*)
          out = out.select(cols.map(c => col(c.outputName)): _*)
        }
      }
      qCol match {
        case Some(nm) =>
          // the hoisted QUALIFY: a plain boolean column now — filter
          // (Catalyst pushes it below the sort), drop the hidden
          applyLimit(out.filter(coalesce(col(nm), lit(false))).drop(nm), sel)
        case None =>
          applyLimit(if (qualifyApplied) out else applyQualify(out, sel), sel)
      }
    } else {
      // ---- group by / aggregation (exec/groupby.go) -------------------
      val keyNodes = sel.groupBy
      def matchesKey(n: Node): Boolean = keyNodes.exists(k => sameExpr(k, n, cols))
      val keyCols: Seq[Column] = keyNodes.map { k =>
        val name = cols.find(c => sameExpr(k, c.expr, cols)).map(_.outputName)
          .getOrElse(Ast.defaultName(k))
        ColumnBuilder.build(k, postWhereCtx).as(name)
      }
      val aggCols: Seq[Column] = cols.flatMap { c =>
        // post-agg scalar markers: the whole expression computes on the
        // AGGREGATED frame (its aggregates ride along as __agg_N via
        // extraAggNodes below) — nothing to build here, where the
        // marker column does not exist yet
        if (containsPendingScalar(c.expr)) None
        else if (containsAgg(c.expr)) Some(ColumnBuilder.build(c.expr, postWhereCtx).as(c.outputName))
        else if (matchesKey(c.expr)) None // already a key
        // a CONSTANT column (literal / typed-cast literal — what a
        // substituted scalar subquery becomes) projects as the literal
        // itself: Spark's analyzer allows foldable non-attributes in an
        // aggregate, and `last(5)` over an EMPTY global aggregate would
        // wrongly yield NULL where ANSI says the constant (r13; DuckDB
        // agrees: `SELECT count(*), 5 FROM t WHERE false` is `0, 5`)
        else if (isConstExpr(c.expr))
          Some(ColumnBuilder.build(c.expr, postWhereCtx).as(c.outputName))
        // group passthrough: the reference keeps the LAST value seen per
        // group (exec/groupby.go:338-348) — `last`, not `first`. Either
        // is row-order-dependent; parity is about matching the quirk.
        else Some(last(ColumnBuilder.build(c.expr, postWhereCtx)).as(c.outputName))
      }
      // HAVING / ORDER BY aggregates not in the select list, plus the
      // aggregates inside marker-bearing select columns (excluded from
      // aggCols above — their expressions compute post-agg)
      val extraAggNodes = (sel.having.toSeq ++ sel.orderBy.map(_._1) ++
          cols.filter(c => containsPendingScalar(c.expr)).map(_.expr))
        .flatMap(collectAggs)
        .filterNot(a => cols.exists(c =>
          !containsPendingScalar(c.expr) && c.expr.text == a.text))
        .distinct
      val extraCols = extraAggNodes.zipWithIndex.map { case (n, i) =>
        ColumnBuilder.build(n, postWhereCtx).as(s"__agg_$i")
      }
      val aggAll = aggCols ++ extraCols
      var out =
        if (keyCols.isEmpty && aggAll.isEmpty)
          // only post-agg scalar markers selected: GROUP BY () — one
          // global group row regardless of input row count
          df.agg(count(lit(1)).as("__pasq_gcnt")).drop("__pasq_gcnt")
        else if (keyCols.isEmpty) df.agg(aggAll.head, aggAll.tail: _*)
        // GROUP BY with no aggregate columns (key-only select) is a
        // distinct over the keys
        else if (aggAll.isEmpty) df.select(keyCols: _*).distinct()
        else if (sel.groupByRollup || sel.groupByCube) {
          // GROUPING() in the select list must reference the exact key
          // expression — an aliased key makes the analyzer reject it
          // (GROUPING_COLUMN_MISMATCH, same class as the groupingSets
          // alias trap below) — so when present, group on UNALIASED
          // keys and rename positionally afterward
          val hasGroupingFn = (cols.map(_.expr) ++ sel.having ++
            sel.orderBy.map(_._1)).exists(containsFnNamed(_, "grouping"))
          if (hasGroupingFn) {
            val unaliased = keyNodes.map(k => ColumnBuilder.build(k, postWhereCtx))
            val keyNames = keyNodes.map(k =>
              cols.find(c => sameExpr(k, c.expr, cols)).map(_.outputName)
                .getOrElse(Ast.defaultName(k)))
            val g = if (sel.groupByRollup) df.rollup(unaliased: _*)
                    else df.cube(unaliased: _*)
            val grouped = g.agg(aggAll.head, aggAll.tail: _*)
            grouped.toDF(keyNames ++ grouped.columns.drop(keyNodes.size): _*)
          } else if (sel.groupByRollup)
            df.rollup(keyCols: _*).agg(aggAll.head, aggAll.tail: _*)
          else
            df.cube(keyCols: _*).agg(aggAll.head, aggAll.tail: _*)
        }
        else if (sel.groupingSets.nonEmpty) {
          // GROUPING SETS: Spark's native grouping-set aggregation (one
          // Expand + one aggregate — NOT a union of per-set scans).
          // Grouping expressions must be UNALIASED — an alias makes the
          // analyzer treat the set key as unrelated to the groupBy key
          // and null it in every set (probed on this Spark) — so alias
          // the key outputs positionally afterward (grouping columns
          // lead the output schema in groupBy order).
          val unaliased = keyNodes.map(k => ColumnBuilder.build(k, postWhereCtx))
          val byText = keyNodes.zip(unaliased).map { case (k, c) => k.text -> c }.toMap
          val keyNames = keyNodes.map(k =>
            cols.find(c => sameExpr(k, c.expr, cols)).map(_.outputName)
              .getOrElse(Ast.defaultName(k)))
          val grouped = df.groupingSets(
              sel.groupingSets.map(_.map(k => byText(k.text))),
              unaliased: _*)
            .agg(aggAll.head, aggAll.tail: _*)
          grouped.toDF(keyNames ++ grouped.columns.drop(keyNodes.size): _*)
        }
        else df.groupBy(keyCols: _*).agg(aggAll.head, aggAll.tail: _*)

      // substitution map: agg/select expr text → output column name
      val subst: Map[String, String] =
        cols.map(c => c.expr.text -> c.outputName).toMap ++
        cols.flatMap(c => c.alias.map(a => a -> a)).toMap ++
        extraAggNodes.zipWithIndex.map { case (n, i) => n.text -> s"__agg_$i" }.toMap ++
        keyNodes.map(k => k.text -> cols.find(c => sameExpr(k, c.expr, cols))
          .map(_.outputName).getOrElse(Ast.defaultName(k))).toMap

      // SELECT-position uncorrelated scalars on the AGGREGATE path
      // (r14): each pending scalar attaches HERE, on the post-aggregate
      // frame, as the same lazy one-row broadcast the pre-projection
      // path uses (in-plan count + raise_error single-row guard — zero
      // build-time driver jobs, so explain on agg statements is free
      // too). The empty global-aggregate input has already completed
      // to its one row at this point, so ANSI's `SELECT count(*),
      // (SELECT 5) FROM t WHERE false` → `0, 5` survives without the
      // build-time literal probe this path used through r13. The
      // marker-bearing select expressions then compute on this frame,
      // aggregates substituted to their __agg_N / output columns
      // (their own full-text subst entries excluded — those name the
      // very columns being built).
      if (pendingAggScalars.nonEmpty) {
        pendingAggScalars.foreach { case (name, innerSel) =>
          out = out.crossJoin(broadcast(scalarOneRow(innerSel, name)))
        }
        val markerCols = cols.filter(c => containsPendingScalar(c.expr))
        val postSubst = subst -- markerCols.map(_.expr.text)
        markerCols.foreach { c =>
          out = out.withColumn(c.outputName,
            ColumnBuilder.build(substitute(c.expr, postSubst), mkCtx(out)))
        }
        out = out.drop(pendingAggScalars.map(_._1): _*)
      }

      val outCtx = mkCtx(out)
      sel.having.foreach { h =>
        val hs = substitute(h, subst)
        // HAVING with subqueries (`HAVING k IN (SELECT …)`, scalar /
        // quantified / EXISTS comparisons on aggregates — r12): the
        // aggregate refs are already substituted to output columns, so
        // the shared WHERE machinery applies verbatim to the agg frame
        out =
          if (containsSubqueryNode(hs)) applyPredicate(out, hs, sel)
          else out.filter(ColumnBuilder.build(hs, outCtx).cast("boolean"))
      }
      if (sel.orderBy.nonEmpty) {
        // ORDER BY subqueries on the aggregate path (r13): aggregate
        // refs substitute to output columns first, then each subquery
        // attaches as a hidden column on the POST-aggregate frame (the
        // frame the sort actually runs on — correlation resolves
        // against the grouped outputs, exactly like HAVING); the final
        // projection below drops the plumbing after the sort
        val obA = sel.orderBy.map { case (n, asc) =>
          val s0 = substitute(n, subst)
          if (!containsSubqueryNode(s0)) (s0, asc)
          else {
            val (d2, n2, _) = attachExprSubqueries(out, s0, sel, "__obsq")
            out = d2
            (n2, asc)
          }
        }
        out = out.orderBy(obA.map { case (n, asc) =>
          val c = ColumnBuilder.build(n, mkCtx(out))
          if (asc) c.asc else c.desc
        }: _*)
      }
      // final projection in select order, dropping hidden agg columns
      val finalNames = cols.map { c =>
        if (!containsAgg(c.expr) && matchesKey(c.expr))
          keyNodes.find(k => sameExpr(k, c.expr, cols)).map(k =>
            cols.find(cc => sameExpr(k, cc.expr, cols)).map(_.outputName)
              .getOrElse(Ast.defaultName(k))).getOrElse(c.outputName)
        else c.outputName
      }
      out = out.select(finalNames.map(col): _*)
      if (sel.distinct) out = out.distinct()
      applyLimit(applyQualify(out, sel), sel)
    }
  }

  /** QUALIFY: filter the PROJECTED frame (select aliases and plain
    * columns are in scope — `QUALIFY rk == 1` after a ranking window
    * is the dedup idiom). Runs before LIMIT, after ORDER BY; Catalyst
    * pushes the filter below the sort, preserving order. */
  private def applyQualify(df: DataFrame, sel: SqlSelect): DataFrame =
    sel.qualify.foldLeft(df) { (d0, q0) =>
      // subqueries in QUALIFY on this (post-projection / post-agg)
      // frame (r13): attach as hidden columns — same bounded shapes as
      // WHERE/HAVING — filter on the now-plain predicate, drop the
      // plumbing
      var d = d0
      val (q, qHid) =
        if (!containsSubqueryNode(q0)) (q0, Seq.empty[String])
        else {
          val (d2, q2, h) = attachExprSubqueries(d0, q0, sel, "__qsq")
          d = d2
          (q2, h)
        }
      // full ctx (vars + includer): QUALIFY referencing @var or INCLUDE
      // works exactly as it does in WHERE/HAVING
      val wins = collectWindows(q)
      if (wins.isEmpty)
        d.filter(ColumnBuilder.build(q, BuildCtx(Some(d.schema), vars, includer))
          .cast(org.apache.spark.sql.types.BooleanType))
          .drop(qHid: _*)
      else {
        // inline windows (`QUALIFY row_number() OVER (…) == 1`, the
        // DuckDB dedup idiom): Spark refuses window expressions inside
        // a Filter, so each hoists to a hidden column, the predicate
        // substitutes it by text, and the hidden columns drop after.
        // The hoisted Window's exchange destroys any ORDER BY already
        // applied, so the statement's sort re-establishes afterward.
        var d2 = d
        val subst = wins.map(_.text).distinct.zipWithIndex.map { case (t, i) =>
          val w = wins.find(_.text == t).get
          val nm = s"__qw_$i"
          d2 = d2.withColumn(nm,
            ColumnBuilder.build(w, BuildCtx(Some(d2.schema), vars, includer)))
          t -> nm
        }.toMap
        val pred = substitute(q, subst)
        d2 = d2.filter(ColumnBuilder.build(pred, BuildCtx(Some(d2.schema), vars, includer))
            .cast(org.apache.spark.sql.types.BooleanType))
          .drop(subst.values.toSeq ++ qHid: _*)
        if (sel.orderBy.nonEmpty)
          d2 = d2.orderBy(sel.orderBy.map { case (n, asc) =>
            // a key naming a projected output column (e.g. an aggregate
            // alias) sorts on that column — alias-expansion here would
            // rebuild the AGGREGATE expression inside Sort on an
            // already-aggregated frame, which the analyzer rejects
            val c = n match {
              case IdentityNode(parts)
                  if d2.columns.exists(_.equalsIgnoreCase(parts.mkString("."))) =>
                col(parts.mkString("."))
              case _ => ColumnBuilder.build(resolveAlias(n, sel.columns),
                BuildCtx(Some(d2.schema), vars, includer))
            }
            if (asc) c.asc else c.desc
          }: _*)
        d2
      }
    }

  // ---- helpers --------------------------------------------------------

  private var oneRow: DataFrame = _
  private def catalogFreeRow(): DataFrame = {
    // one partition, not range(1)'s defaultParallelism: a FROM-less
    // SELECT is a single-row constant, and every downstream frame
    // (recursive-CTE frontiers especially) inherits this partitioning —
    // range(1) at local[32] gave every fixpoint round 32 near-empty
    // tasks per checkpoint/count job (measured: ql_recursive_series
    // 1230 tasks for a 12-row recursion)
    if (oneRow == null) oneRow =
      org.apache.spark.sql.SparkSession.active.range(0, 1, 1, 1).toDF("__r")
    oneRow
  }

  /** Plan a FROM source standalone — MERGE USING re-uses the full
    * source grammar (table, subquery, inline VALUES). */
  def planFromSource(fs: FromSource): DataFrame = source(fs)

  /** `ASOF [LEFT] JOIN` by REWRITE: each left row pairs with the right
    * row holding the latest right timestamp at-or-before the left one,
    * per equality keys. No join operator at all — both sides union into
    * one tagged frame (the right row riding as a struct payload) and
    * ONE window per equality-key group carries the last-seen payload
    * forward (right rows sort before left rows at the same instant, so
    * a simultaneous right row is visible). ONE shuffle total, no range
    * explosion, no per-row probe — the shape that survives two 100 TB
    * event streams. ASOF (inner) drops left rows with no prior right
    * row; ASOF LEFT keeps them with NULLs. The ON clause must be
    * equality conjuncts plus exactly one `left_ts >= right_ts`
    * inequality (or the mirrored `right_ts <= left_ts`). */
  private def planAsof(outer: DataFrame, src: FromSource, right: DataFrame): DataFrame = {
    val on = src.joinOn.getOrElse(throw BuildException("ASOF JOIN requires ON"))
    val conjs = on match {
      case BooleanNode("AND", args, false) => args
      case other => Seq(other)
    }
    val rAliases = Set(src.aliasName)
    val lAliases = aliasSchemas.keySet.toSet -- rAliases
    def sideOf(n: Node): Option[Boolean] = n match { // Some(true) = right side
      case IdentityNode(p) =>
        val inR = resolvesIn(p, right.schema, rAliases)
        val inL = resolvesIn(p, outer.schema, lAliases)
        if (inR && inL)
          throw BuildException(s"ASOF JOIN: ambiguous column '${n.text}' — qualify it")
        if (inR) Some(true) else if (inL) Some(false) else None
      case _ => None
    }
    val eqs = collection.mutable.ArrayBuffer[(Node, Node)]() // (left, right)
    var ineq: Option[(Node, Node)] = None                    // left_ts >= right_ts
    def setIneq(l: Node, r: Node): Unit = {
      if (ineq.isDefined)
        throw BuildException("ASOF JOIN: exactly one timestamp inequality allowed")
      ineq = Some((l, r))
    }
    for (cj <- conjs) cj match {
      case BinaryNode("==" | "=", a, b, false) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(false), Some(true)) => eqs += ((a, b))
          case (Some(true), Some(false)) => eqs += ((b, a))
          case _ => throw BuildException(
            s"ASOF JOIN: equality must pair a left and a right column: ${cj.text}")
        }
      case BinaryNode(">=", a, b, false)
          if sideOf(a).contains(false) && sideOf(b).contains(true) => setIneq(a, b)
      case BinaryNode("<=", a, b, false)
          if sideOf(a).contains(true) && sideOf(b).contains(false) => setIneq(b, a)
      case other => throw BuildException("ASOF JOIN ON supports equality conjuncts " +
        s"plus one left_ts >= right_ts inequality, got: ${other.text}")
    }
    val (lTsN, rTsN) = ineq.getOrElse(throw BuildException(
      "ASOF JOIN requires a left_ts >= right_ts inequality in ON"))
    val clash = right.columns.filter(rc => outer.columns.exists(_.equalsIgnoreCase(rc)))
    if (clash.nonEmpty)
      throw BuildException("ASOF JOIN: right columns collide with left: " +
        clash.mkString(", ") + " — project/alias the right side")
    val lCtx = mkCtx(outer)
    val rCtx = mkCtx(right)
    val payloadType = StructType(right.schema.fields)
    var l2 = outer
    for (((ln, _), i) <- eqs.zipWithIndex)
      l2 = l2.withColumn(s"__as_k$i", ColumnBuilder.build(ln, lCtx))
    l2 = l2.withColumn("__as_ts", ColumnBuilder.build(lTsN, lCtx))
      .withColumn("__as_side", lit(0))
      .withColumn("__as_p", lit(null).cast(payloadType))
    val r2 = right.select(
      eqs.zipWithIndex.map { case ((_, rn), i) =>
        ColumnBuilder.build(rn, rCtx).as(s"__as_k$i") }.toSeq ++ Seq(
        ColumnBuilder.build(rTsN, rCtx).as("__as_ts"),
        lit(1).as("__as_side"),
        struct(right.columns.map(col).toIndexedSeq: _*).as("__as_p")): _*)
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(eqs.indices.map(i => col(s"__as_k$i")): _*)
      .orderBy(col("__as_ts").asc, col("__as_side").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    var out = unioned
      .withColumn("__as_match", last(col("__as_p"), ignoreNulls = true).over(w))
      .filter(col("__as_side") === 0)
    if (src.joinType == JoinType.Asof)
      out = out.filter(col("__as_match").isNotNull)
    for (rc <- right.columns)
      out = out.withColumn(rc, col(s"__as_match.$rc"))
    out.drop("__as_ts" +: "__as_side" +: "__as_p" +: "__as_match" +:
      eqs.indices.map(i => s"__as_k$i"): _*)
  }

  /** `FROM outer, LATERAL (SELECT …) l` — cross apply by REWRITE: the
    * inner WHERE's outer-referencing equality conjuncts become join
    * keys (the same correlation analysis as IN/EXISTS). Three shapes:
    * (a) aggregate subquery (no explicit GROUP BY): grouped aggregate
    *     on the correlation keys LEFT-joined back — one row per outer
    *     row, top-level count(...) coalesced to 0 for empty groups
    *     (the one aggregate whose empty-input value is not NULL);
    * (b) LIMIT k (ORDER BY mandatory): inner join + ONE rank window
    *     per outer row — top-k-per-group without a per-row rescan;
    * (c) plain: inner join on the correlation keys.
    * An uncorrelated lateral degrades to a cross join (standard).
    * Never a driver loop, never a nested-loop rescan: the rewrite is
    * what makes per-row subqueries survive a 100 TB outer table. */
  private def planLateral(outer: DataFrame, outerSel: SqlSelect,
      ss: SubquerySource): DataFrame = {
    val innerSel = ss.select
    val innerPlanner = new Planner(catalog, vars, includer)
    val c = analyzeCorrelation(innerSel, innerPlanner, outerSel, outer)
    requireEqualityCorrelation(c, "LATERAL subquery")
    if (c.keys.isEmpty)
      return outer.crossJoin(innerPlanner.plan(innerSel).alias(ss.alias))
    if (innerSel.groupBy.nonEmpty || innerSel.having.nonEmpty ||
        innerSel.qualify.nonEmpty || innerSel.distinct)
      throw BuildException("LATERAL supports plain, aggregate, and " +
        "ORDER BY+LIMIT subqueries (no explicit GROUP BY/HAVING/QUALIFY/DISTINCT)")
    val corrFields = c.keys.map(_._1).distinct
    val corrCols = corrFields.map(f =>
      SelectColumn(IdentityNode(Seq(f)), Some(s"__lat_$f"), None))
    val outerCtx = mkCtx(outer)
    def joinCond(innerDf: DataFrame): Column = c.keys.map { case (f, outerNode) =>
      outerCol(outerNode, outer, outerCtx, outerSel) === innerDf(s"__lat_$f")
    }.reduce(_ && _)
    def dropKeys(d: DataFrame): DataFrame =
      d.drop(corrFields.map(f => s"__lat_$f"): _*)
    // the lateral's visible columns register under its alias (both for
    // qualified `l.x` resolution — via an actual SubqueryAlias on the
    // inner frame — and for type-aware coercion via aliasSchemas)
    def aliased(d: DataFrame): DataFrame = {
      aliasSchemas.put(ss.alias,
        StructType(d.schema.fields.filterNot(_.name.startsWith("__lat_"))))
      d.alias(ss.alias)
    }
    val isAggLat = innerSel.columns.exists(sc => containsAgg(sc.expr))
    if (isAggLat) {
      if (innerSel.columns.exists(sc => !containsAgg(sc.expr)))
        throw BuildException("aggregate LATERAL must select only aggregates")
      if (innerSel.limit.isDefined)
        throw BuildException("aggregate LATERAL cannot take LIMIT")
      val aggCore = innerPlanner.plan(innerSel.copy(
        columns = innerSel.columns ++ corrCols,
        where = c.innerWhere,
        groupBy = corrFields.map(f => IdentityNode(Seq(f))),
        orderBy = Nil, limit = None, offset = None))
      // per-outer-row aggregate semantics: an EMPTY group still yields
      // a row (count 0, other aggregates NULL). Completing the agg side
      // with the outer keys that matched nothing — rather than
      // coalescing after a left join — keeps every lateral column's
      // alias qualifier intact (a withColumn would mint a new,
      // unqualified attribute and `l.x` would stop resolving).
      val keyProj = c.keys.map { case (f, outerNode) =>
        outerCol(outerNode, outer, outerCtx, outerSel).as(s"__lat_$f") }
      // a NULL-keyed inner group can never match any outer row under
      // `=` correlation — drop it BEFORE the null-safe join below, or
      // it would wrongly attach to NULL-keyed OUTER rows
      val aggNn = aggCore.filter(
        corrFields.map(f => col(s"__lat_$f").isNotNull).reduce(_ && _))
      val missing = outer.select(keyProj: _*).distinct()
        .join(aggNn, corrFields.map(f => s"__lat_$f"), "left_anti")
      val filled = missing.select(aggNn.columns.toIndexedSeq.map { cn =>
        if (cn.startsWith("__lat_")) col(cn)
        else {
          val dt = aggNn.schema(cn).dataType
          innerSel.columns.find(_.outputName == cn).map(_.expr) match {
            case Some(FuncNode(n, _)) if n.equalsIgnoreCase("count") =>
              lit(0L).cast(dt).as(cn)
            case _ => lit(null).cast(dt).as(cn)
          }
        }
      }: _*)
      val aggDf = aliased(aggNn.unionByName(filled))
      // null-SAFE equality: a NULL-keyed OUTER row must attach to its
      // completion row (count 0 / NULL aggs) — with plain `===` it
      // never joined and count(*) came back NULL instead of 0
      val nsCond = c.keys.map { case (f, outerNode) =>
        outerCol(outerNode, outer, outerCtx, outerSel) <=> aggDf(s"__lat_$f")
      }.reduce(_ && _)
      dropKeys(outer.join(aggDf, nsCond, "left"))
    } else innerSel.limit match {
      case Some(k) =>
        if (innerSel.orderBy.isEmpty)
          throw BuildException("LATERAL … LIMIT requires ORDER BY " +
            "(a nondeterministic top-k can never replay)")
        // sort keys rank the PROJECTED inner row: a key naming a select
        // alias (or matching a select expression) orders by that OUTPUT
        // column; any other key rides along as a hidden inner column
        // (built in INNER scope, where its table's columns resolve)
        val hidden = collection.mutable.ArrayBuffer[SelectColumn]()
        val ordCols: Seq[(String, Boolean)] = innerSel.orderBy.map { case (n, asc) =>
          innerSel.columns.find(sc =>
            sc.alias.contains(n.text) || sc.outputName == n.text ||
              sc.expr.text == n.text) match {
            case Some(sc) => (sc.outputName, asc)
            case None =>
              val name = s"__lat_ord_${hidden.length}"
              hidden += SelectColumn(n, Some(name), None)
              (name, asc)
          }
        }
        val innerDf = aliased(innerPlanner.plan(innerSel.copy(
          columns = innerSel.columns ++ corrCols ++ hidden, where = c.innerWhere,
          orderBy = Nil, limit = None, offset = None)))
        val withId = outer.withColumn("__lat_oid", monotonically_increasing_id())
        val joined = withId.join(innerDf, joinCond(innerDf), "inner")
        val ords = ordCols.map { case (name, asc) =>
          if (asc) col(name).asc else col(name).desc }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__lat_oid")).orderBy(ords: _*)
        dropKeys(joined.withColumn("__lat_rk", row_number().over(w))
          .filter(col("__lat_rk") <= k)
          .drop("__lat_oid" +: "__lat_rk" +: hidden.map(_.outputName).toSeq: _*))
      case None =>
        val innerDf = aliased(innerPlanner.plan(innerSel.copy(
          columns = innerSel.columns ++ corrCols, where = c.innerWhere,
          orderBy = Nil, limit = None, offset = None)))
        dropKeys(outer.join(innerDf, joinCond(innerDf), "inner"))
    }
  }

  private def source(src: FromSource): DataFrame = {
    val df = src match {
      case TableSource(name, alias, _, _) =>
        val d = catalog(name)
        alias.map(d.alias).getOrElse(d.alias(name))
      case SubquerySource(sub, alias, _, _, _) =>
        new Planner(catalog, vars, includer).plan(sub).alias(alias)
      case ValuesSource(rows, alias, colNames, _, _) =>
        // inline literal table: each row is a projection over the shared
        // 1-row frame, unioned — a LocalRelation after constant folding,
        // never a scan. Arity is parse-checked; VALUES is by nature
        // driver-sized (a literal list in the statement text).
        val ctx = BuildCtx(None, vars, includer)
        rows.map { r =>
          catalogFreeRow().select(r.zip(colNames).map { case (n, cn) =>
            ColumnBuilder.build(n, ctx).as(cn) }: _*)
        }.reduce(_.union(_)).alias(alias)
      case PivotSource(inner, agg, forCol, values, alias, _, _) =>
        // SQL-standard pivot: group by every column that is neither the
        // pivot column nor referenced by the aggregate, one output
        // column per IN value (named by the value or its AS alias) —
        // Spark's RelationalGroupedDataset.pivot with EXPLICIT values,
        // so no extra distinct-scan job and the output schema is fixed
        // up front (the form that scales; an open-ended pivot would
        // also make the column set data-dependent)
        val base = source(inner)
        val ctx = BuildCtx(Some(base.schema), vars, includer)
        val aggCol = ColumnBuilder.build(agg, ctx)
        def refs(n: Node): Set[String] = n match {
          case IdentityNode(p) => Set(p.last.toLowerCase)
          case BinaryNode(_, l, r, _) => refs(l) ++ refs(r)
          case BooleanNode(_, args, _) => args.flatMap(refs).toSet
          case UnaryNode(_, c) => refs(c)
          case TriNode(_, a, b, c, _) => refs(a) ++ refs(b) ++ refs(c)
          case FuncNode(_, args) => args.flatMap(refs).toSet
          case CaseNode(bs, e) =>
            bs.flatMap { case (w, t) => refs(w) ++ refs(t) }.toSet ++
              e.toSeq.flatMap(refs)
          case _ => Set.empty
        }
        val aggRefs = refs(agg)
        val keys = base.columns.filterNot(c =>
          c.equalsIgnoreCase(forCol) || aggRefs.contains(c.toLowerCase))
        if (keys.isEmpty)
          throw BuildException("PIVOT leaves no grouping columns")
        def litOf(n: Node): Any = n match {
          case NumberNode(d, isInt) => if (isInt) d.toLong else d
          case StringNode(v) => v
          case BoolNode(v) => v
          case other => throw BuildException(
            s"PIVOT IN values must be literals, got ${other.text}")
        }
        var out = base.groupBy(keys.map(col): _*)
          .pivot(forCol, values.map(v => litOf(v._1)))
          .agg(aggCol)
        for ((v, Some(a)) <- values)
          out = out.withColumnRenamed(litOf(v).toString, a)
        alias.map(out.alias).getOrElse(out)
      case SampleSource(inner, permill, key, _, _) =>
        // deterministic md5-keyed TABLESAMPLE: the keep decision is a
        // pure scan-stage filter (same bucket scheme as the pipeline's
        // rateSample), no shuffle, reproducible across runs and engines
        val base = source(inner)
        val ctx = BuildCtx(Some(base.schema), vars, includer)
        base.filter(graft.operators.Curation.md5Permill(
          ColumnBuilder.build(key, ctx)) < lit(permill))
      case UnpivotSource(inner, valCol, keyCol, cols, alias, _, _) =>
        // melt via Dataset.unpivot; NULL cells filtered to match the
        // SQL-standard EXCLUDE NULLS default (and DuckDB)
        val base = source(inner)
        val missing = cols.map(_._1).filterNot(c =>
          base.columns.exists(_.equalsIgnoreCase(c)))
        if (missing.nonEmpty)
          throw BuildException(s"UNPIVOT columns not found: ${missing.mkString(", ")}")
        val ids = base.columns.filterNot(c =>
          cols.exists(_._1.equalsIgnoreCase(c))).map(col)
        val vals = cols.map { case (c, a) => a.map(col(c).as(_)).getOrElse(col(c)) }
        val out = base.unpivot(ids.toArray, vals.toArray, keyCol, valCol)
          .filter(col(valCol).isNotNull)
        alias.map(out.alias).getOrElse(out)
    }
    aliasSchemas.put(src.aliasName, df.schema)
    df
  }

  /** alias → schema for every source seen by this planner, so qualified
    * identities (`u.email`) keep their types for coercion decisions even
    * after the join flattens the plan. */
  private val aliasSchemas = collection.mutable.LinkedHashMap[String, StructType]()

  /** Build context whose synthetic schema carries both bare and
    * alias-qualified field names so identity resolution and type-aware
    * coercion work across joins. */
  private def mkCtx(dfs: DataFrame*): BuildCtx = {
    val fields = collection.mutable.ArrayBuffer[StructField]()
    val seen = collection.mutable.HashSet[String]()
    for (df <- dfs; f <- df.schema.fields)
      if (seen.add(f.name.toLowerCase)) fields += f
    for ((a, st) <- aliasSchemas; f <- st.fields)
      if (seen.add(s"$a.${f.name}".toLowerCase)) fields += StructField(s"$a.${f.name}", f.dataType)
    BuildCtx(Some(StructType(fields.toSeq)), vars, includer)
  }

  private def projCols(cols: Seq[SelectColumn], ctx: BuildCtx): Seq[Column] =
    cols.flatMap { c =>
      c.expr match {
        case IdentityNode(Seq("*"))
            if c.starExclude.nonEmpty || c.starReplace.nonEmpty =>
          // DuckDB star modifiers: expand `*` against the input schema,
          // EXCLUDE drops, REPLACE substitutes in place keeping the
          // column's name; unknown names refuse loudly (a silently
          // ignored EXCLUDE is how a dropped-PII column comes back)
          val schema = ctx.schema.getOrElse(
            throw BuildException("* EXCLUDE/REPLACE requires a FROM"))
          // mkCtx appends alias-QUALIFIED synthetic fields (a.b) after
          // the real columns so qualified idents resolve; the star
          // expands over the real (unqualified) columns only — minus
          // subquery plumbing (`__ssq*` lateral values and the
          // hidden-attach columns), which must never leak into output
          val fieldNames = schema.fieldNames.toSeq
            .filterNot(_.contains(".")).filterNot(isSubqueryPlumbing)
          val known = fieldNames.map(_.toLowerCase).toSet
          val excl = c.starExclude.map(_.toLowerCase).toSet
          val repl = c.starReplace.map { case (n, name) => name.toLowerCase -> n }.toMap
          (excl ++ repl.keySet).find(!known.contains(_)).foreach(m =>
            throw BuildException(s"* modifier references unknown column '$m'"))
          fieldNames
            .filterNot(f => excl.contains(f.toLowerCase))
            .map { f =>
              repl.get(f.toLowerCase) match {
                case Some(n) => ColumnBuilder.build(n, ctx).as(f)
                case None => col(f)
              }
            }
        case IdentityNode(Seq("*")) => Seq(col("*"))
        case _ =>
          val base = ColumnBuilder.build(c.expr, ctx)
          val guarded = c.guard match {
            case Some(g) => when(ColumnBuilder.build(g, ctx).cast("boolean"), base)
            case None => base
          }
          Seq(guarded.as(c.outputName))
      }
    }

  /** Hidden columns minted by the subquery lowerings — lateral scalar
    * values (`__ssq…`) and the hidden-attach verdict/value columns —
    * which star expansion and `* EXCLUDE/REPLACE` must skip. */
  private def isSubqueryPlumbing(name: String): Boolean =
    name.startsWith("__ssq") || name.startsWith("__bsq") ||
      name.startsWith("__gsq") || name.startsWith("__obsq") ||
      name.startsWith("__qsq")

  /** Literal-only expression (the shapes substituteSelectScalars'
    * literal path emits, plus bare literals): safe to project verbatim
    * inside an aggregate — foldable, no attribute references. Kept
    * deliberately NARROW (no general function folding: a
    * nondeterministic builtin must not silently hoist). */
  private def isConstExpr(n: Node): Boolean = n match {
    case _: NumberNode | _: StringNode | _: BoolNode => true
    case NullNode => true
    case FuncNode("cast", args) => args.forall(isConstExpr)
    case BinaryNode(_, l, r, _) => isConstExpr(l) && isConstExpr(r)
    case UnaryNode("NOT" | "!" | "-", c) => isConstExpr(c)
    case _ => false
  }

  /** Does an (already-rewritten) expression reference a hidden
    * subquery-plumbing column? Such ORDER BY keys must hidden-carry
    * through the projection even under `SELECT *` — the star keeps
    * every source column but never the plumbing. */
  private def referencesPlumbing(n: Node): Boolean = n match {
    case IdentityNode(parts) => parts.exists(isSubqueryPlumbing)
    case BinaryNode(_, l, r, _) => referencesPlumbing(l) || referencesPlumbing(r)
    case BooleanNode(_, args, _) => args.exists(referencesPlumbing)
    case UnaryNode(_, c) => referencesPlumbing(c)
    case TriNode(_, a, b, c, _) =>
      referencesPlumbing(a) || referencesPlumbing(b) || referencesPlumbing(c)
    case FuncNode(_, args) => args.exists(referencesPlumbing)
    case CaseNode(bs, e) =>
      bs.exists { case (w, t) => referencesPlumbing(w) || referencesPlumbing(t) } ||
        e.exists(referencesPlumbing)
    case ArrayNode(items) => items.exists(referencesPlumbing)
    case WindowNode(f, pb, ob, _, _) =>
      referencesPlumbing(f) || pb.exists(referencesPlumbing) ||
        ob.exists(p => referencesPlumbing(p._1))
    case _ => false
  }

  private def applyLimit(df: DataFrame, sel: SqlSelect): DataFrame = {
    var out = df
    sel.offset.foreach(o => out = out.offset(o))
    sel.limit.foreach(l => out = out.limit(l))
    // WITH-tail output-partitioning knobs (the Spark reinterpretation
    // of the reference's statement properties, rel/sql.go:100 With):
    // repartition = n, repartition_by = "col[, …]" (hash-partition on
    // keys, e.g. to co-locate a downstream write), coalesce = n.
    // Unrecognized keys are ignored, matching the reference's
    // anything-goes property bag.
    val byCols = withCfgStr(sel, "repartition_by").toSeq
      .flatMap(_.split(",")).map(s => col(s.trim)).toList
    (withCfgInt(sel, "repartition"), byCols) match {
      case (Some(n), Nil) => out = out.repartition(n)
      case (Some(n), cs)  => out = out.repartition(n, cs: _*)
      case (None, Nil)    =>
      case (None, cs)     => out = out.repartition(cs: _*)
    }
    withCfgInt(sel, "coalesce").foreach(n => out = out.coalesce(n))
    out
  }

  private def withCfg(sel: SqlSelect, key: String): Option[Node] =
    sel.withConfig.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
  private def withCfgStr(sel: SqlSelect, key: String): Option[String] =
    withCfg(sel, key).map { case StringNode(s) => s; case n => n.text }
  private def withCfgInt(sel: SqlSelect, key: String): Option[Int] =
    withCfg(sel, key).map {
      case NumberNode(d, _) => d.toInt
      case n => throw BuildException(s"WITH $key expects a number, got '${n.text}'")
    }

  /** Split top-level AND conjuncts into IN-subquery terms and the rest. */
  private val scalarSubOps = Set(">", ">=", "<", "<=", "=", "==", "!=", "<>")
  private def splitSubqueries(w: Node): (Seq[(Node, SubqueryNode, Boolean)],
      Seq[(String, Node, SubqueryNode, Boolean)],
      Seq[(SubqueryNode, Boolean)],
      Seq[(String, String, Node, SubqueryNode)], Option[Node]) = {
    val conjuncts = w match {
      case BooleanNode("AND", args, false) => args
      case other => Seq(other)
    }
    val subqs = collection.mutable.ArrayBuffer[(Node, SubqueryNode, Boolean)]()
    val scalars = collection.mutable.ArrayBuffer[(String, Node, SubqueryNode, Boolean)]()
    val existsSubs = collection.mutable.ArrayBuffer[(SubqueryNode, Boolean)]()
    val quants = collection.mutable.ArrayBuffer[(String, String, Node, SubqueryNode)]()
    val rest = collection.mutable.ArrayBuffer[Node]()
    conjuncts.foreach {
      case BinaryNode("IN", l, s: SubqueryNode, neg) => subqs += ((l, s, neg))
      // quantified comparisons (op carries the quantifier, e.g. "> ANY"):
      // `= ANY` ≡ IN IS the semi join (a NULL never equality-matches,
      // which is exactly ANSI's UNKNOWN-drops behavior); everything
      // else — including `<> ALL`, whose ANSI NULL semantics need the
      // aggregate's null guards around its anti join — carries to the
      // quantified planner
      case BinaryNode(opq, l, s: SubqueryNode, false)
          if opq.endsWith(" ANY") || opq.endsWith(" ALL") =>
        val Array(op, quant) = opq.split(' ')
        (op, quant) match {
          case ("=" | "==", "ANY") => subqs += ((l, s, false))
          case _ => quants += ((op, quant, l, s))
        }
      case BinaryNode(op, l, s: SubqueryNode, neg) if scalarSubOps(op) =>
        scalars += ((op, l, s, neg))
      case UnaryNode("EXISTS", s: SubqueryNode) => existsSubs += ((s, false))
      case UnaryNode("NOT" | "!", UnaryNode("EXISTS", s: SubqueryNode)) =>
        existsSubs += ((s, true))
      case other => rest += other
    }
    val restNode = rest.size match {
      case 0 => None
      case 1 => Some(rest.head)
      case _ => Some(BooleanNode("AND", rest.toSeq))
    }
    (subqs.toSeq, scalars.toSeq, existsSubs.toSeq, quants.toSeq, restNode)
  }

  /** Scalar subqueries in the SELECT list. Two lowerings:
    *
    *   - CORRELATED: the aggregate-LATERAL rewrite — one grouped
    *     aggregate LEFT-joined back per correlation key (empty groups
    *     completed) — appended to FROM; the select expression then
    *     references the lateral's value column. Never a per-row rescan.
    *   - UNCORRELATED: passes THROUGH untouched (r13) — plan()'s
    *     hidden-column attach lowers it to the lazy in-plan broadcast
    *     (limit(2) → count + raise_error single-row guard), so building
    *     or EXPLAINing the statement launches ZERO driver jobs. On an
    *     AGGREGATE statement (GROUP BY / any aggregate select column)
    *     the value must survive an EMPTY input (ANSI: `SELECT
    *     count(*), (SELECT 5) FROM t WHERE false` is `0, 5`, but a
    *     crossJoin BELOW the aggregate yields zero rows and the scalar
    *     aggregates to NULL) — so the subquery is replaced by a MARKER
    *     (`__pasq_N`, returned in this method's second component) and
    *     the agg path attaches the same lazy broadcast scalar to the
    *     POST-aggregate frame, where the empty input has already
    *     aggregated to its one global row (r14; previously a
    *     build-time `limit(2).collect()` literal — every explain of an
    *     agg statement with a SELECT scalar paid a driver job).
    *
    * ORDER BY / QUALIFY / column guards pass through ENTIRELY: plan()
    * attaches their subqueries as hidden columns on the pre-projection
    * (or post-aggregate) frame — the same bounded join shapes — then
    * orders/filters/guards on the hidden column and drops it (r13;
    * these positions previously refused). WHERE keeps its own richer
    * path — splitSubqueries extracts those before this rewrite ever
    * sees them. */
  private def substituteSelectScalars(sel: SqlSelect): (SqlSelect, Seq[(String, SqlSelect)]) = {
    def hasSub(n: Node): Boolean = n match {
      case _: SubqueryNode => true
      case BinaryNode(_, l, r, _) => hasSub(l) || hasSub(r)
      case BooleanNode(_, args, _) => args.exists(hasSub)
      case UnaryNode(_, c) => hasSub(c)
      case TriNode(_, a, b, c, _) => hasSub(a) || hasSub(b) || hasSub(c)
      case FuncNode(_, args) => args.exists(hasSub)
      case CaseNode(branches, els) =>
        branches.exists { case (w, t) => hasSub(w) || hasSub(t) } || els.exists(hasSub)
      case ArrayNode(items) => items.exists(hasSub)
      case WindowNode(f, pb, ob, _, _) =>
        hasSub(f) || pb.exists(hasSub) || ob.exists(p => hasSub(p._1))
      case _ => false
    }
    val needed = sel.columns.exists(c => hasSub(c.expr))
    if (!needed) return (sel, Nil)
    // aggregate statements swap SELECT-position uncorrelated scalars
    // for POST-AGGREGATE markers (see scaladoc: empty-input ANSI
    // semantics, attached lazily by the agg path); plain selects defer
    // to the pre-projection lazy in-plan attach
    val stmtIsAgg = sel.groupBy.nonEmpty || sel.groupByAll ||
      sel.groupByRollup || sel.groupByCube || sel.groupingSets.nonEmpty ||
      sel.columns.exists(c => containsAgg(c.expr))
    val pendingAggScalars = collection.mutable.ArrayBuffer[(String, SqlSelect)]()
    // FROM-less statements (`SELECT count(*), (SELECT 5)`) never reach
    // the agg path's marker attach — plan() returns via the literal-
    // select branch — so their scalars take the eager typed-literal
    // probe (r13 literalOf). The probe's one driver job is acceptable
    // there: a FROM-less select is a one-row constant by construction.
    // A NULL result must come back as a TYPED cast, not a bare
    // NullNode: the dialect's `x == NULL ≙ IS NULL` parity idiom
    // (reference vm.go) would otherwise silently rewrite the
    // comparison (found live by scripts/fuzz_differential.py, r12).
    def literalOf(s: SubqueryNode): Node = {
      val sub = parseSub(s)
      val subDf = new Planner(catalog, vars, includer).plan(sub)
      if (subDf.columns.length != 1)
        throw BuildException("scalar subquery must return one column")
      val rows = subDf.limit(2).collect()
      if (rows.length > 1)
        throw BuildException("scalar subquery returned more than one row")
      if (rows.isEmpty || rows(0).isNullAt(0))
        FuncNode("cast", Seq(NullNode,
          StringNode(subDf.schema.head.dataType.sql.toLowerCase)))
      else rows(0).get(0) match {
        // exactness: NumberNode carries a Double, which is exact for
        // |int| ≤ 2^53 — wider longs and non-Double-round-trip decimals
        // re-enter the AST as a cast('…' AS type) so no precision is
        // lost on the way back into the plan
        case v: Long =>
          if (v.toDouble.toLong == v) NumberNode(v.toDouble, isInt = true)
          else FuncNode("cast", Seq(StringNode(v.toString), StringNode("bigint")))
        case v: Int => NumberNode(v.toDouble, isInt = true)
        case v: Short => NumberNode(v.toDouble, isInt = true)
        case v: Byte => NumberNode(v.toDouble, isInt = true)
        case v: Double => NumberNode(v, isInt = false)
        case v: Float => NumberNode(v.toDouble, isInt = false)
        case v0: java.math.BigDecimal =>
          // negative scales (1E+3) normalize to scale 0 so the target
          // type is always a legal decimal(p ≥ s, s ≥ 0)
          val v = if (v0.scale < 0) v0.setScale(0) else v0
          val p = math.max(v.precision, v.scale)
          FuncNode("cast", Seq(StringNode(v.toPlainString),
            StringNode(s"decimal($p,${v.scale})")))
        case v: java.sql.Date =>
          FuncNode("cast", Seq(StringNode(v.toString), StringNode("date")))
        case v: java.sql.Timestamp =>
          FuncNode("cast", Seq(StringNode(v.toString), StringNode("timestamp")))
        case v: String => StringNode(v)
        case v: Boolean => BoolNode(v)
        case other => throw BuildException(
          s"unsupported scalar subquery type: ${other.getClass.getSimpleName}")
      }
    }
    // outer-scope probe for CORRELATION detection: the FROM sources
    // cross-joined schema-only (lazy plan, no job); per-source failures
    // (e.g. a lateral that cannot plan uncorrelated) just drop out
    lazy val outerProbe: Option[DataFrame] = {
      val frames = sel.from.flatMap(s => scala.util.Try(source(s)).toOption)
      frames.reduceOption(_.crossJoin(_))
    }
    val laterals = collection.mutable.ArrayBuffer[SubquerySource]()
    def resolveSub(s: SubqueryNode): Node = {
      val innerSel = parseSub(s)
      val corr = outerProbe.flatMap { odf =>
        scala.util.Try(analyzeCorrelation(innerSel,
          new Planner(catalog, vars, includer), sel, odf)).toOption
      }.filter(_.keys.nonEmpty)
      corr match {
        // uncorrelated: lazy attach in plan() — pre-projection for
        // plain selects (the node passes through), post-aggregate via
        // marker for agg statements (the value must survive an empty
        // input there); FROM-less statements take the eager literal
        // probe (no frame exists to attach to — see literalOf)
        case None =>
          if (sel.from.isEmpty) literalOf(s)
          else if (!stmtIsAgg) s
          else {
            val name = s"__pasq_${pendingAggScalars.length}"
            pendingAggScalars += name -> innerSel
            IdentityNode(Seq(name))
          }
        case Some(_) =>
          // CORRELATED scalar in the SELECT list (r12): the
          // aggregate-LATERAL rewrite — one grouped aggregate LEFT-
          // joined back per correlation key, empty groups completed
          // (count → 0, other aggregates NULL) — gives the ANSI
          // per-outer-row value; the select expression then just
          // references the lateral's column. Never a per-row rescan.
          if (innerSel.columns.size != 1)
            throw BuildException("scalar subquery must return one column")
          if (!containsAgg(innerSel.columns.head.expr))
            throw BuildException("correlated scalar subquery must select " +
              "exactly one aggregate expression")
          val i = laterals.length
          val alias = s"__ssq_$i"; val vName = s"__ssqv_$i"
          laterals += SubquerySource(
            innerSel.copy(columns =
              Seq(innerSel.columns.head.copy(alias = Some(vName)))),
            alias, lateral = true)
          IdentityNode(Seq(alias, vName))
      }
    }
    def subst(n: Node, underAgg: Boolean = false): Node = n match {
      // boolean subquery shapes (IN / EXISTS / NOT EXISTS / quantified)
      // in the SELECT list pass through UNTOUCHED — plan() lowers them
      // to hidden columns via attachExprSubqueries on the post-WHERE
      // frame (3VL-exact verdict columns)
      case BinaryNode("IN", l, s: SubqueryNode, neg) =>
        BinaryNode("IN", subst(l, underAgg), s, neg)
      case e @ UnaryNode("EXISTS", _: SubqueryNode) => e
      case BinaryNode(opq, l, s: SubqueryNode, neg)
          if opq.endsWith(" ANY") || opq.endsWith(" ALL") =>
        BinaryNode(opq, subst(l, underAgg), s, neg)
      // a scalar INSIDE an aggregate's arguments (`sum(x + (SELECT 5))`)
      // passes through UNTOUCHED: its value is consumed per INPUT row,
      // so plan()'s pre-projection attach (the same lazy broadcast) puts
      // it on the PRE-aggregate frame — a post-agg __pasq marker there
      // would make extraAggNodes build `sum(x + __pasq_N)` against a
      // frame where the marker does not exist (ADVICE r14 high). Values
      // consumed inside an aggregate never need the empty-input
      // post-agg guard: `sum` over an empty input is NULL regardless.
      case s: SubqueryNode =>
        // FROM-less statements still take the literal probe even under
        // an aggregate — there is no pre-aggregate frame to attach to
        if (underAgg && sel.from.nonEmpty) s else resolveSub(s)
      case BinaryNode(op, l, r, neg) =>
        BinaryNode(op, subst(l, underAgg), subst(r, underAgg), neg)
      case BooleanNode(op, args, neg) =>
        BooleanNode(op, args.map(subst(_, underAgg)), neg)
      case UnaryNode(op, c) => UnaryNode(op, subst(c, underAgg))
      case TriNode(op, a, b, c, neg) =>
        TriNode(op, subst(a, underAgg), subst(b, underAgg), subst(c, underAgg), neg)
      case FuncNode(name, args) =>
        FuncNode(name, args.map(subst(_, underAgg || FuncRegistry.isAgg(name))))
      case CaseNode(branches, els) => CaseNode(
        branches.map { case (w, t) => (subst(w, underAgg), subst(t, underAgg)) },
        els.map(subst(_, underAgg)))
      case ArrayNode(items) => ArrayNode(items.map(subst(_, underAgg)))
      case WindowNode(f, pb, ob, fr, ref) => WindowNode(
        subst(f, underAgg).asInstanceOf[FuncNode], pb.map(subst(_, underAgg)),
        ob.map { case (e, asc) => (subst(e, underAgg), asc) }, fr, ref)
      case other => other
    }
    // HAVING passes through WHOLESALE: the aggregate path routes any
    // subquery-bearing HAVING to applyPredicate over the agg frame,
    // whose conjunct machinery + attachExprSubqueries cover every
    // shape (machine conjuncts, nested scalars — correlated ones
    // lateral-join the AGG frame, which is the correct scope there).
    // ORDER BY / QUALIFY / column guards also pass through wholesale —
    // plan() attaches their subqueries as hidden columns on the frame
    // each position actually evaluates against (r13).
    (sel.copy(
      columns = sel.columns.map(c => c.copy(expr = subst(c.expr))),
      from = sel.from ++ laterals.toSeq),
      pendingAggScalars.toSeq)
  }

  /** One non-equality cross-scope comparison as a join-condition
    * Column (r15 — see Correlation.extraPreds): the original conjunct
    * was `inner <op> outer` when `innerOnLeft`, else `outer <op>
    * inner`. Spark's own coercions apply (int/long widening etc.),
    * matching what the conjunct would get inline. */
  private def extraCmpCol(op: String, inner: Column, outer: Column,
      innerOnLeft: Boolean): Column = {
    val (a, b) = if (innerOnLeft) (inner, outer) else (outer, inner)
    op match {
      case "<" => a < b
      case "<=" => a <= b
      case ">" => a > b
      case ">=" => a >= b
      case "!=" | "<>" => a =!= b
      case other => throw BuildException(
        s"unsupported correlated comparison operator: $other")
    }
  }

  /** Loud refusal for lowerings whose per-key aggregation shapes
    * cannot carry a non-equality cross-scope conjunct (the counts /
    * extrema are computed per correlation KEY; a conjunct referencing
    * the outer row's VALUES changes the slice per row). EXISTS handles
    * these (join-condition fold); everything else points there. */
  private def requireEqualityCorrelation(c: Correlation, shape: String): Unit =
    if (c.extraPreds.nonEmpty) throw BuildException(
      s"correlated $shape supports only equality correlation " +
        "conjuncts; a non-equality cross-scope comparison " +
        s"(${c.extraPreds.map(p => s"inner.${p._2} ${p._1} outer-expr").mkString(", ")}) " +
        "is supported in EXISTS (...) — rewrite through EXISTS")

  /** Build an OUTER correlation reference against `frame`. A plain
    * (possibly qualified) column ref resolves through the frame itself
    * first (eager — `frame.col` fails NOW if unresolvable, letting us
    * fall back); when aggregation has stripped the source alias
    * qualifier (HAVING-position correlation: `o.user_id` over a frame
    * whose output is the bare grouped `user_id`), the bare last
    * segment resolves instead; computed expressions take the full
    * dialect builder as before.
    *
    * STRICT on unknown qualifiers (r16): the stripped-qualifier
    * fallback fires only for a two-part `alias.col` whose head names
    * one of the outer SELECT's FROM aliases. Anything else — a
    * three-part `l.j2.x`, a `nosuch.x` — rethrows the frame's own
    * UNRESOLVED_COLUMN, the same error the projection path raises
    * (reference error parity: testutil/testsuite.go:65-152). The old
    * suffix fallback silently bound `l.j2.o_custkey` to whatever bare
    * `o_custkey` the frame happened to carry. */
  private def outerCol(n: Node, frame: DataFrame, ctx: BuildCtx,
      outerSel: SqlSelect): Column = n match {
    case IdentityNode(parts) =>
      scala.util.Try(frame.col(parts.mkString("."))) match {
        case scala.util.Success(c) => c
        case scala.util.Failure(e) =>
          val aliasKnown = parts.length == 2 &&
            outerSel.from.exists(_.aliasName.equalsIgnoreCase(parts.head))
          if (aliasKnown)
            scala.util.Try(frame.col(parts.last))
              .getOrElse(ColumnBuilder.build(n, ctx))
          else if (parts.length > 1) throw e
          else ColumnBuilder.build(n, ctx)
      }
    case _ => ColumnBuilder.build(n, ctx)
  }

  /** Does a node contain a SubqueryNode anywhere? */
  private def containsSubqueryNode(n: Node): Boolean = n match {
    case _: SubqueryNode => true
    case BinaryNode(_, l, r, _) => containsSubqueryNode(l) || containsSubqueryNode(r)
    case BooleanNode(_, args, _) => args.exists(containsSubqueryNode)
    case UnaryNode(_, c) => containsSubqueryNode(c)
    case TriNode(_, a, b, c, _) =>
      containsSubqueryNode(a) || containsSubqueryNode(b) || containsSubqueryNode(c)
    case FuncNode(_, args) => args.exists(containsSubqueryNode)
    case CaseNode(bs, e) =>
      bs.exists { case (w, t) => containsSubqueryNode(w) || containsSubqueryNode(t) } ||
        e.exists(containsSubqueryNode)
    case ArrayNode(items) => items.exists(containsSubqueryNode)
    case WindowNode(f, pb, ob, _, _) =>
      containsSubqueryNode(f) || pb.exists(containsSubqueryNode) ||
        ob.exists(p => containsSubqueryNode(p._1))
    case _ => false
  }

  /** Apply ONE boolean predicate that may contain subqueries
    * (IN / NOT IN / EXISTS / quantified ANY-ALL / scalar comparisons)
    * to a frame: the WHERE machinery, extracted so HAVING (post-agg,
    * with aggregate refs already substituted to output columns) and
    * DML WHEREs reuse the exact same lowerings. `sel` supplies the
    * outer scope for correlation analysis. */
  private def applyPredicate(df0: DataFrame, w: Node, sel: SqlSelect): DataFrame = {
    var df = df0
      val (subqs, scalars, existsSubs, quants, rest) = splitSubqueries(w)
      for (((left, sub, negated), i) <- subqs.zipWithIndex) {
        val innerSel = parseSub(sub)
        val innerPlanner = new Planner(catalog, vars, includer)
        val c = analyzeCorrelation(innerSel, innerPlanner, sel, df)
        requireEqualityCorrelation(c, "IN subquery")
        if (c.keys.isEmpty) {
          val subDf = innerPlanner.plan(innerSel)
          val subCol = subDf.columns.head
          val renamed = subDf.withColumnRenamed(subCol, "__subq_key")
          if (negated) {
            // ANSI NOT IN (≡ x <> ALL S): empty S keeps every row;
            // otherwise a NULL in S or a NULL x makes the predicate
            // UNKNOWN and the row DROPS — a bare anti join is
            // NULL-insensitive and wrongly kept those rows (r12 fix).
            // One bounded count aggregate broadcast supplies the guard.
            val cnt = s"__nin_cnt$i"; val acnt = s"__nin_acnt$i"
            val aggd = renamed.agg(count(col("__subq_key")).as(cnt),
              count(lit(1)).as(acnt))
            df = df.crossJoin(broadcast(aggd))
            val gctx = mkCtx(df)
            val xc = ColumnBuilder.build(left, gctx)
            df = df.filter(col(acnt) === 0 ||
                (col(cnt) === col(acnt) && xc.isNotNull))
              .drop(cnt, acnt)
            df = df.join(renamed,
              ColumnBuilder.build(left, mkCtx(df)) === col("__subq_key"),
              "left_anti")
          } else
            df = df.join(renamed,
              ColumnBuilder.build(left, mkCtx(df)) === col("__subq_key"), "left_semi")
        } else if (innerSel.groupBy.isEmpty && innerSel.having.isEmpty &&
            containsAgg(innerSel.columns.head.expr)) {
          // correlated BARE-AGGREGATE IN: ANSI's set is a SINGLETON
          // even for an EMPTY slice (count → [0], max → [NULL]) —
          // membership over a singleton IS the scalar comparison, via
          // the aggregate LATERAL whose empty-group completion encodes
          // exactly that. The grouped lowering below produced NO row
          // for empty slices, so `x IN (SELECT count(*) …)` missed the
          // x = 0 match — the classic COUNT edge, caught live by
          // scripts/fuzz_differential.py (r12).
          if (innerSel.columns.size != 1)
            throw BuildException("IN-subquery must select exactly one column")
          val sc = s"__inq1_$i"
          val aliased = innerSel.copy(columns =
            Seq(innerSel.columns.head.copy(alias = Some(sc))))
          df = planLateral(df, sel,
            SubquerySource(aliased, s"__inq1t_$i", lateral = true))
          val cmp = ColumnBuilder.build(
            BinaryNode(if (negated) "!=" else "=", left, IdentityNode(Seq(sc))),
            mkCtx(df))
          df = df.filter(coalesce(cmp.cast("boolean"), lit(false))).drop(sc)
        } else {
          // correlated IN: semi/anti join on the value column AND the
          // correlation equalities; the subquery's own projection
          // supplies the value expression, evaluated in the INNER scope
          if (innerSel.columns.size != 1)
            throw BuildException("IN-subquery must select exactly one column")
          val corrFields = c.keys.map(_._1).distinct
          val valueCol =
            SelectColumn(innerSel.columns.head.expr, Some(s"__inq${i}_key"), None)
          val corrCols = corrFields.map(f =>
            SelectColumn(IdentityNode(Seq(f)), Some(s"__inq${i}_$f"), None))
          // a GROUPED correlated IN appends the correlation keys to the
          // grouping: per-outer-row the inner groups are exactly the
          // (user keys × correlation key) groups restricted to that
          // row, so HAVING evaluates over the same per-group rows the
          // nested-loop semantics would see — still ONE distributed
          // aggregate + ONE semi/anti join, never a per-row rescan
          val grouped = innerSel.groupBy.nonEmpty || innerSel.having.nonEmpty
          val newGroupBy =
            if (grouped)
              (innerSel.groupBy ++ corrFields.map(f => IdentityNode(Seq(f)): Node)).distinct
            else innerSel.groupBy
          val innerDf = innerPlanner.plan(innerSel.copy(
            columns = valueCol +: corrCols, distinct = false,
            where = c.innerWhere, groupBy = newGroupBy,
            orderBy = Nil, limit = None,
            offset = None, qualify = None))
          val outerCtx = mkCtx(df)
          if (negated) {
            // correlated ANSI NOT IN: the same per-slice NULL guards as
            // the uncorrelated path, but the value/row counts aggregate
            // PER CORRELATION KEY and left-join back (empty slice →
            // NULL counts → coalesce to 0 → keep, per `<> ALL ∅`)
            val cnt = s"__nin_cnt$i"; val acnt = s"__nin_acnt$i"
            val aggd = innerDf.groupBy(corrFields.map(f =>
                col(s"__inq${i}_$f")): _*)
              .agg(count(col(s"__inq${i}_key")).as(cnt),
                count(lit(1)).as(acnt))
            val gcond = c.keys.map { case (f, outerNode) =>
              outerCol(outerNode, df, outerCtx, sel) === aggd(s"__inq${i}_$f")
            }.reduce(_ && _)
            df = df.join(aggd, gcond, "left")
              .withColumn(cnt, coalesce(col(cnt), lit(0L)))
              .withColumn(acnt, coalesce(col(acnt), lit(0L)))
            val gctx = mkCtx(df)
            val xc = ColumnBuilder.build(left, gctx)
            df = df.filter(col(acnt) === 0 ||
                (col(cnt) === col(acnt) && xc.isNotNull))
              .drop(cnt +: acnt +: corrFields.map(f => s"__inq${i}_$f"): _*)
            val actx = mkCtx(df)
            val antiCond = (ColumnBuilder.build(left, actx) === innerDf(s"__inq${i}_key")) +:
              c.keys.map { case (f, outerNode) =>
                outerCol(outerNode, df, actx, sel) === innerDf(s"__inq${i}_$f")
              }
            df = df.join(innerDf, antiCond.reduce(_ && _), "left_anti")
          } else {
            val cond = (ColumnBuilder.build(left, outerCtx) === innerDf(s"__inq${i}_key")) +:
              c.keys.map { case (f, outerNode) =>
                outerCol(outerNode, df, outerCtx, sel) === innerDf(s"__inq${i}_$f")
              }
            df = df.join(innerDf, cond.reduce(_ && _), "left_semi")
          }
        }
      }
      // uncorrelated scalar subqueries: the subquery must yield at most
      // one row (an aggregate does — and a multi-row frame comparing
      // against an arbitrary row would be silently nondeterministic, so
      // it raises instead, matching standard SQL); the single value
      // broadcast-joins onto every row and the comparison evaluates
      // with full dialect coercions by rebuilding the BinaryNode
      // against the joined frame. The single-row check is IN-PLAN
      // (limit(2) → count + raise_error inside one broadcast
      // aggregate), so building a statement with N scalar subqueries
      // launches ZERO driver jobs — the violation raises when the
      // query actually runs, and limit(2) bounds the probe: one extra
      // row is enough to prove it.
      for (((op, left, sub, negated), i) <- scalars.zipWithIndex) {
        val innerSel = parseSub(sub)
        val sc = s"__scalar_$i"
        val corr = analyzeCorrelation(innerSel,
          new Planner(catalog, vars, includer), sel, df)
        requireEqualityCorrelation(corr, "scalar subquery comparison")
        if (corr.keys.nonEmpty) {
          // CORRELATED scalar: exactly the aggregate-LATERAL shape —
          // one grouped aggregate on the correlation keys joined back
          // (one row per outer row; empty groups compare against NULL,
          // which filters false, per standard SQL), then the
          // comparison. Never a per-row rescan.
          if (innerSel.columns.size != 1 ||
              !containsAgg(innerSel.columns.head.expr))
            throw BuildException("correlated scalar subquery must select " +
              "exactly one aggregate expression")
          val aliased = innerSel.copy(columns =
            Seq(innerSel.columns.head.copy(alias = Some(sc))))
          df = planLateral(df, sel,
            SubquerySource(aliased, s"__sct_$i", lateral = true))
          val cmp = ColumnBuilder.build(
            BinaryNode(op, left, IdentityNode(Seq(sc)), negated), mkCtx(df))
          df = df.filter(cmp.cast("boolean")).drop(sc)
        } else {
          val subDf = new Planner(catalog, vars, includer).plan(innerSel)
          val firstTwo = subDf.select(col(subDf.columns.head).as(sc)).limit(2)
          val dt = firstTwo.schema.head.dataType
          val one = firstTwo
            .agg(count(lit(1)).as("__sc_n"),
              first(col(sc), ignoreNulls = false).as("__sc_v"))
            .select(when(col("__sc_n") > 1,
                raise_error(lit("scalar subquery returned more than one row")).cast(dt))
              .otherwise(col("__sc_v")).as(sc))
          df = df.crossJoin(broadcast(one))
          val cmp = ColumnBuilder.build(
            BinaryNode(op, left, IdentityNode(Seq(sc)), negated), mkCtx(df))
          df = df.filter(cmp.cast("boolean")).drop(sc)
        }
      }
      // Quantified comparisons `x <op> ANY|ALL (SELECT …)` beyond the
      // membership shapes (those became semi/anti joins above). Each
      // reduces to ONE bounded aggregate of the subquery column —
      // min/max/count — broadcast onto every outer row; no per-row
      // rescans, no row-count-shaped joins:
      //   x > ANY  ≡ x > min      x > ALL  ≡ empty OR x > max
      //   x < ANY  ≡ x < max      x < ALL  ≡ empty OR x < min
      //   x <> ANY ≡ nonempty AND (min <> max OR x <> min)
      //   x = ALL  ≡ empty OR (min = max AND x = min)
      // Empty-set semantics are ANSI (ANY → FALSE via NULL extremum,
      // ALL → TRUE via the count guard). Comparisons rebuild dialect
      // BinaryNodes so coercions match plain WHERE comparisons.
      for (((op, quant, left, sub), i) <- quants.zipWithIndex) {
        val innerSel = parseSub(sub)
        val innerPlanner = new Planner(catalog, vars, includer)
        val corr = analyzeCorrelation(innerSel, innerPlanner, sel, df)
        requireEqualityCorrelation(corr, "quantified (ANY/ALL) subquery")
        if (innerSel.columns.size != 1)
          throw BuildException("quantified subquery must select exactly one column")
        // CORRELATED bare-aggregate subquery (no GROUP BY/HAVING): ANSI
        // gives EVERY outer row exactly one aggregate row — even an
        // empty slice (count→0, max/min/sum→NULL) — so ANY/ALL over the
        // singleton set IS the scalar comparison. Route through the
        // aggregate LATERAL, whose empty-group completion encodes
        // exactly that; the generic grouped lowering below would wrongly
        // verdict empty slices via the empty-SET rules (ALL→TRUE)
        // instead of comparing against the completed row (r12).
        if (corr.keys.nonEmpty && innerSel.groupBy.isEmpty &&
            innerSel.having.isEmpty &&
            containsAgg(innerSel.columns.head.expr)) {
          val sc = s"__q1_$i"
          val aliased = innerSel.copy(columns =
            Seq(innerSel.columns.head.copy(alias = Some(sc))))
          df = planLateral(df, sel,
            SubquerySource(aliased, s"__q1t_$i", lateral = true))
          val cmp = ColumnBuilder.build(
            BinaryNode(op, left, IdentityNode(Seq(sc))), mkCtx(df))
          df = df.filter(coalesce(cmp.cast("boolean"), lit(false))).drop(sc)
        } else {
        val vName = s"__qv_$i"
        val mn = s"__qmin_$i"; val mx = s"__qmax_$i"
        val cnt = s"__qcnt_$i"; val acnt = s"__qacnt_$i"
        // cnt counts NON-NULL values (min/max skip NULLs the same way);
        // acnt counts rows — their difference carries the ANSI NULL
        // semantics: for ALL, a NULL in the subquery makes every
        // no-false row UNKNOWN (dropped), never TRUE
        val corrFields = corr.keys.map(_._1).distinct
        val qkCols = corrFields.map(f => s"__qk${i}_$f")
        // valsDf: the raw subquery values (plus correlation keys when
        // correlated) — the <> ALL anti join rides on this same frame
        val valsDf =
          if (corr.keys.isEmpty)
            // positional rename: an expression-derived output name may
            // contain dots/quotes that col() would misparse
            innerPlanner.plan(innerSel).toDF(vName)
          else {
            // CORRELATED: same aggregate-LATERAL shape as correlated
            // scalar/IN — per-correlation-key bounded aggregate LEFT-
            // joined on the equality conjuncts; never a per-row rescan.
            // GROUP BY / HAVING / aggregate-valued inners (r12) append
            // the correlation keys to the grouping, exactly like
            // grouped correlated IN: the quantifier then ranges over
            // the per-(group × slice) aggregate rows ANSI prescribes
            // (same documented count-over-empty-slice edge as IN)
            val valueCol =
              SelectColumn(innerSel.columns.head.expr, Some(vName), None)
            val kCols = corrFields.map(f =>
              SelectColumn(IdentityNode(Seq(f)), Some(s"__qk${i}_$f"), None))
            val grouped = innerSel.groupBy.nonEmpty ||
              innerSel.having.nonEmpty ||
              containsAgg(innerSel.columns.head.expr)
            val newGroupBy = if (grouped)
              (innerSel.groupBy ++
                corrFields.map(f => IdentityNode(Seq(f)): Node)).distinct
            else innerSel.groupBy
            innerPlanner.plan(innerSel.copy(
              columns = valueCol +: kCols, distinct = false,
              where = corr.innerWhere, groupBy = newGroupBy,
              orderBy = Nil, limit = None,
              offset = None, qualify = None))
          }
        val v = col(vName)
        if (corr.keys.isEmpty) {
          val aggd = valsDf.agg(min(v).as(mn), max(v).as(mx),
            count(v).as(cnt), count(lit(1)).as(acnt))
          df = df.crossJoin(broadcast(aggd))
        } else {
          val aggd = valsDf.groupBy(qkCols.map(col): _*)
            .agg(min(v).as(mn), max(v).as(mx),
              count(v).as(cnt), count(lit(1)).as(acnt))
          val outerCtx = mkCtx(df)
          val cond = corr.keys.map { case (f, outerNode) =>
            outerCol(outerNode, df, outerCtx, sel) === aggd(s"__qk${i}_$f")
          }.reduce(_ && _)
          // a LEFT join: an outer row whose group is EMPTY gets NULL
          // aggregates — the count coalesces restore the ANSI empty-set
          // verdicts (ANY → FALSE via the NULL extremum, ALL → TRUE via
          // acnt = 0)
          df = df.join(aggd, cond, "left")
            .withColumn(cnt, coalesce(col(cnt), lit(0L)))
            .withColumn(acnt, coalesce(col(acnt), lit(0L)))
        }
        val qctx = mkCtx(df)
        def cmp(o: String, rc: String) = ColumnBuilder.build(
          BinaryNode(o, left, IdentityNode(Seq(rc))), qctx).cast("boolean")
        val noNulls = col(acnt) === col(cnt)
        val pred = (op, quant) match {
          // ANY: TRUE iff some comparison is TRUE — NULL values can only
          // turn FALSE into UNKNOWN, and both drop, so the non-null
          // extremum decides
          case (">", "ANY")  => cmp(">", mn)
          case (">=", "ANY") => cmp(">=", mn)
          case ("<", "ANY")  => cmp("<", mx)
          case ("<=", "ANY") => cmp("<=", mx)
          case ("!=" | "<>", "ANY") =>
            // both comparisons depend on x, so a NULL x yields NULL and
            // drops (ANSI: NULL <> ANY nonempty is UNKNOWN — the old
            // `mn =!= mx` shortcut was TRUE regardless of x); for a
            // non-NULL x the pair is equivalent: two distinct values
            // make one of them differ from x, one value makes both
            // clauses the same test
            col(cnt) > 0 && (cmp("!=", mn) || cmp("!=", mx))
          // ALL: TRUE iff the set is EMPTY, or no comparison is FALSE
          // and none is UNKNOWN (no NULL values, non-null x — the cmp
          // itself is NULL for a NULL x and coalesces to a drop)
          case (">", "ALL")  => col(acnt) === 0 || (noNulls && cmp(">", mx))
          case (">=", "ALL") => col(acnt) === 0 || (noNulls && cmp(">=", mx))
          case ("<", "ALL")  => col(acnt) === 0 || (noNulls && cmp("<", mn))
          case ("<=", "ALL") => col(acnt) === 0 || (noNulls && cmp("<=", mn))
          case ("=" | "==", "ALL") =>
            col(acnt) === 0 || (noNulls && col(mn) === col(mx) && cmp("=", mn))
          case ("!=" | "<>", "ALL") =>
            // handled below by an anti join; the aggregate supplies the
            // NULL guards only
            lit(true)
          case other => throw BuildException(s"unsupported quantified comparison $other")
        }
        if ((op == "!=" || op == "<>") && quant == "ALL") {
          // x <> ALL S ≡ NOT IN with ANSI NULLs: empty S keeps every
          // row (even a NULL x); otherwise a NULL in S or a NULL x is
          // UNKNOWN (drop), and membership drops via ONE anti join on
          // the non-null values
          val xc = ColumnBuilder.build(left, qctx)
          df = df.filter(col(acnt) === 0 || (noNulls && xc.isNotNull))
            .drop(mn +: mx +: cnt +: acnt +: qkCols: _*)
          val renamed = valsDf.select(
            v.as(s"__qall_$i") +: qkCols.map(col): _*)
          val againCtx = mkCtx(df)
          val antiCond = (ColumnBuilder.build(left, againCtx) === col(s"__qall_$i")) +:
            corr.keys.map { case (f, outerNode) =>
              outerCol(outerNode, df, againCtx, sel) === renamed(s"__qk${i}_$f")
            }
          df = df.join(renamed, antiCond.reduce(_ && _), "left_anti")
        } else
          df = df.filter(coalesce(pred, lit(false)))
            .drop(mn +: mx +: cnt +: acnt +: qkCols: _*)
        }
      }
      // EXISTS / NOT EXISTS subqueries. Correlated equality conjuncts
      // (`inner.col = outer.col`) plan as a left_semi/left_anti join —
      // Catalyst's own strategy for EXISTS, broadcastable when the
      // inner side is small; a subquery with no correlation is a
      // whole-corpus existence fact, answered by ONE bounded
      // limit(1)-count probe. SQL scoping decides correlation: an
      // unqualified name that resolves in the inner scope belongs to
      // it, so only names the inner frame CANNOT resolve reach out.
      for (((sub, negated), i) <- existsSubs.zipWithIndex) {
        val innerSel = parseSub(sub)
        val innerPlanner = new Planner(catalog, vars, includer)
        val c = analyzeCorrelation(innerSel, innerPlanner, sel, df)
        if (c.keys.isEmpty && c.extraPreds.isEmpty) {
          // whole-corpus existence fact — ONE bounded limit(1) count,
          // evaluated lazily in-plan (broadcast 1-row aggregate +
          // filter) so statement BUILD launches no job; Catalyst folds
          // the filter to a LocalRelation-or-pass once it runs
          val en = s"__ex_n$i"
          val probe = innerPlanner.plan(innerSel).limit(1)
            .agg(count(lit(1)).as(en))
          df = df.crossJoin(broadcast(probe))
            .filter(if (negated) col(en) === 0 else col(en) > 0)
            .drop(en)
        } else {
          // NON-EQUALITY cross-scope conjuncts (r15, found live by the
          // DML fuzzer: `EXISTS (… WHERE d.id = t.id AND d.amount >
          // t.v)`): their inner fields ride the prefix-renamed
          // projection and the comparison folds into the semi/anti
          // join condition below. Equality keys (when present) keep
          // the join hash-partitionable; a pure non-equi EXISTS plans
          // as the nested-loop join it semantically is — loud in the
          // plan, correct, and broadcastable when the inner is small.
          val corrFields = (c.keys.map(_._1) ++ c.extraPreds.map(_._2)).distinct
          val grouped = innerSel.groupBy.nonEmpty || innerSel.having.nonEmpty
          if (grouped && c.extraPreds.nonEmpty)
            throw BuildException("correlated EXISTS with GROUP BY/HAVING " +
              "supports only equality correlation conjuncts")
          // prefix-rename the inner key columns so the join condition
          // can never capture an identically-named outer column
          val innerKeys =
            if (!grouped) {
              val innerDf = innerPlanner.plan(innerSel.copy(
                columns = Seq(SelectColumn(IdentityNode(Seq("*")), None, None)),
                distinct = false, where = c.innerWhereNoExtra,
                orderBy = Nil, limit = None, offset = None, qualify = None))
              innerDf.select(corrFields.map(f =>
                col(f).as(s"__ex${i}_$f")): _*)
            } else
              // GROUPED correlated EXISTS (r12): true iff SOME group of
              // the outer row's slice satisfies HAVING — the correlation
              // keys append to the grouping (same lowering as grouped
              // correlated IN) and the group keys ARE the join keys;
              // still one distributed aggregate + one semi/anti join
              innerPlanner.plan(innerSel.copy(
                columns = corrFields.map(f =>
                  SelectColumn(IdentityNode(Seq(f)), Some(s"__ex${i}_$f"), None)),
                distinct = false, where = c.innerWhere,
                groupBy = (innerSel.groupBy ++
                  corrFields.map(f => IdentityNode(Seq(f)): Node)).distinct,
                orderBy = Nil, limit = None, offset = None, qualify = None))
          val outerCtx = mkCtx(df)
          val cond = (c.keys.map { case (f, outerNode) =>
            outerCol(outerNode, df, outerCtx, sel) === innerKeys(s"__ex${i}_$f")
          } ++ c.extraPreds.map { case (op, f, outerNode, innerOnLeft) =>
            extraCmpCol(op, innerKeys(s"__ex${i}_$f"),
              outerCol(outerNode, df, outerCtx, sel), innerOnLeft)
          }).reduce(_ && _)
          if (grouped && innerSel.groupBy.isEmpty) {
            // HAVING without GROUP BY: ANSI gives even an EMPTY outer
            // slice one aggregate row (count→0, sum/min/max→NULL) and
            // tests HAVING against it — a CONSTANT verdict, evaluated
            // lazily as a 1-row broadcast (`HAVING count(*) = 0` must
            // make EXISTS true exactly for sliceless outer rows — the
            // classic COUNT bug of naive decorrelation). The final
            // predicate is (some slice group passes HAVING) OR (slice
            // empty AND the empty verdict) — two left joins + the
            // broadcast, no semi-join OR contortions.
            val vN = s"__exh_v$i"
            val verdict = broadcast(innerPlanner.plan(innerSel.copy(
              columns = Seq(SelectColumn(innerSel.having.get, Some(vN), None)),
              distinct = false, where = Some(BoolNode(false)),
              groupBy = Nil, having = None,
              orderBy = Nil, limit = None, offset = None, qualify = None)))
            val aN = s"__exh_a$i"
            val aKeys = innerKeys.withColumn(aN, lit(1))
            val kN = s"__exh_k$i"
            val kKeys = innerPlanner.plan(innerSel.copy(
                columns = corrFields.map(f =>
                  SelectColumn(IdentityNode(Seq(f)), Some(s"__exk${i}_$f"), None)),
                distinct = true, where = c.innerWhere,
                groupBy = Nil, having = None,
                orderBy = Nil, limit = None, offset = None, qualify = None))
              .withColumn(kN, lit(1))
            val kCond = c.keys.map { case (f, outerNode) =>
              outerCol(outerNode, df, outerCtx, sel) === kKeys(s"__exk${i}_$f")
            }.reduce(_ && _)
            df = df.join(aKeys, cond, "left").join(kKeys, kCond, "left")
              .crossJoin(verdict)
            val pass = coalesce(
              col(aN).isNotNull ||
                (col(kN).isNull && coalesce(col(vN).cast("boolean"), lit(false))),
              lit(false))
            df = df.filter(if (negated) !pass else pass)
              .drop(aN +: kN +: vN +:
                (corrFields.map(f => s"__ex${i}_$f") ++
                  corrFields.map(f => s"__exk${i}_$f")): _*)
          } else
            df = df.join(innerKeys, cond, if (negated) "left_anti" else "left_semi")
        }
      }
      rest.foreach { r =>
        if (containsSubqueryNode(r)) {
          // subqueries NESTED in the residual predicate — under OR,
          // inside arithmetic or CASE — where the conjunct machinery
          // above cannot see them: each attaches as a hidden column
          // (same bounded join shapes, full ANSI 3VL) and the now-plain
          // predicate filters
          val (df2, r2, hid) = attachExprSubqueries(df, r, sel, "__bsq")
          df = df2.filter(ColumnBuilder.build(r2, mkCtx(df2)).cast("boolean"))
          if (hid.nonEmpty) df = df.drop(hid: _*)
        } else
          df = df.filter(ColumnBuilder.build(r, mkCtx(df)).cast("boolean"))
      }
    df
  }

  /** Lower subquery expressions embedded in a GENERAL expression
    * position — membership/existence tests (`x IN (SELECT …)`,
    * `EXISTS (SELECT …)`, negated forms) used as VALUES (projected,
    * under OR, inside CASE/arithmetic) and scalar subqueries nested
    * where the top-level-conjunct machinery of splitSubqueries cannot
    * reach — into hidden columns on the frame. Each subquery costs the
    * SAME bounded plan shapes as its WHERE-conjunct cousin: a
    * broadcast 1-row aggregate (uncorrelated scalar/EXISTS, IN's
    * NULL-count guard), a per-correlation-key aggregate LEFT-joined on
    * the equality conjuncts (correlated), and a DISTINCT key frame for
    * the membership marker — never a per-row rescan, and the join
    * against distinct keys preserves row cardinality. ANSI 3-valued
    * logic is preserved: `x IN S` is TRUE on a match, FALSE when S is
    * empty or (no match, no NULLs, x non-NULL), else NULL — so
    * `NOT IN` under OR verdicts exactly as the standard says.
    * Returns the augmented frame, the rewritten node, and the hidden
    * columns the CALLER drops once the expression is consumed
    * (projection drops them implicitly by not selecting them). */
  /** An UNCORRELATED scalar subquery as a guaranteed-one-row frame with
    * the single-row guard IN the plan: count + first over limit(2),
    * raise_error if a second row exists. Nothing executes at build
    * time; consumers crossJoin(broadcast(…)) it wherever the scalar is
    * in scope (pre-projection for plain selects, post-aggregate for
    * agg statements — the r14 lazy path for both positions). */
  private def scalarOneRow(innerSel: SqlSelect, name: String): DataFrame = {
    val subDf = new Planner(catalog, vars, includer).plan(innerSel)
    if (subDf.columns.length != 1)
      throw BuildException("scalar subquery must return one column")
    val firstTwo = subDf.select(col(subDf.columns.head).as(name)).limit(2)
    val dt = firstTwo.schema.head.dataType
    firstTwo
      .agg(count(lit(1)).as("__sc_n"),
        first(col(name), ignoreNulls = false).as("__sc_v"))
      .select(when(col("__sc_n") > 1,
          raise_error(lit("scalar subquery returned more than one row")).cast(dt))
        .otherwise(col("__sc_v")).as(name))
  }

  private def attachExprSubqueries(df0: DataFrame, n0: Node,
      sel: SqlSelect, tag: String): (DataFrame, Node, Seq[String]) = {
    var df = df0
    val hidden = collection.mutable.ArrayBuffer[String]()
    var seq = 0
    def fresh(p: String): String = { seq += 1; s"${tag}_$p$seq" }

    def attachIn(x: Node, sub: SubqueryNode, neg: Boolean): Node = {
      val innerSel = parseSub(sub)
      val innerPlanner = new Planner(catalog, vars, includer)
      val c = analyzeCorrelation(innerSel, innerPlanner, sel, df)
      requireEqualityCorrelation(c, "IN subquery")
      if (innerSel.columns.size != 1)
        throw BuildException("IN-subquery must select exactly one column")
      val h = fresh("in"); val kn = fresh("k"); val mk = fresh("m")
      val cnt = fresh("c"); val acnt = fresh("a")
      if (c.keys.isEmpty) {
        val renamed = innerPlanner.plan(innerSel).toDF(kn)
        val aggd = renamed.agg(count(col(kn)).as(cnt), count(lit(1)).as(acnt))
        df = df.crossJoin(broadcast(aggd))
        val xc = ColumnBuilder.build(x, mkCtx(df))
        val dkeys = renamed.where(col(kn).isNotNull).distinct()
          .withColumn(mk, lit(1))
        df = df.join(dkeys, xc === dkeys(kn), "left")
        val base = when(col(acnt) === 0, lit(false))
          .when(col(mk).isNotNull, lit(true))
          .when(xc.isNull || col(cnt) < col(acnt),
            lit(null).cast("boolean"))
          .otherwise(lit(false))
        df = df.withColumn(h, if (neg) !base else base)
          .drop(kn, mk, cnt, acnt)
      } else if (innerSel.groupBy.isEmpty && innerSel.having.isEmpty &&
          containsAgg(innerSel.columns.head.expr)) {
        // correlated BARE-AGGREGATE: ANSI's set is a SINGLETON even
        // for an empty slice (max→NULL, count→0) — membership over a
        // singleton IS the scalar comparison (x = w / x <> w, 3VL),
        // via the LATERAL's empty-group completion. The generic path
        // below would wrongly verdict empty slices FALSE/TRUE via the
        // empty-SET rules instead of comparing against the completed
        // row (count-valued inners included: x IN (SELECT count(*) …)
        // matches x = 0 on an empty slice, the classic COUNT edge)
        val sc = fresh("in1")
        val aliased = innerSel.copy(columns =
          Seq(innerSel.columns.head.copy(alias = Some(sc))))
        df = planLateral(df, sel,
          SubquerySource(aliased, fresh("in1t"), lateral = true))
        val verdict = ColumnBuilder.build(
          BinaryNode(if (neg) "!=" else "=", x, IdentityNode(Seq(sc))),
          mkCtx(df)).cast("boolean")
        df = df.withColumn(h, verdict).drop(sc)
      } else {
        // correlated: per-correlation-key counts LEFT-joined back
        // (empty slice → 0 → FALSE, and a NULL outer key never
        // equality-matches, per ANSI) + a distinct (value, key)
        // membership marker; grouped/aggregate-valued inners append
        // the correlation keys to the grouping, exactly like the
        // WHERE-conjunct correlated-IN lowering
        val corrFields = c.keys.map(_._1).distinct
        val valueCol = SelectColumn(innerSel.columns.head.expr, Some(kn), None)
        val kCols = corrFields.map(f =>
          SelectColumn(IdentityNode(Seq(f)), Some(s"${kn}_$f"), None))
        val grouped = innerSel.groupBy.nonEmpty || innerSel.having.nonEmpty ||
          containsAgg(innerSel.columns.head.expr)
        val newGroupBy = if (grouped)
          (innerSel.groupBy ++ corrFields.map(f => IdentityNode(Seq(f)): Node)).distinct
        else innerSel.groupBy
        val innerDf = innerPlanner.plan(innerSel.copy(
          columns = valueCol +: kCols, distinct = false,
          where = c.innerWhere, groupBy = newGroupBy,
          orderBy = Nil, limit = None, offset = None, qualify = None))
        val aggd = innerDf.groupBy(corrFields.map(f => col(s"${kn}_$f")): _*)
          .agg(count(col(kn)).as(cnt), count(lit(1)).as(acnt))
        val outerCtx = mkCtx(df)
        val aCond = c.keys.map { case (f, o) =>
          outerCol(o, df, outerCtx, sel) === aggd(s"${kn}_$f") }.reduce(_ && _)
        df = df.join(aggd, aCond, "left")
          .withColumn(cnt, coalesce(col(cnt), lit(0L)))
          .withColumn(acnt, coalesce(col(acnt), lit(0L)))
          .drop(corrFields.map(f => s"${kn}_$f"): _*)
        val dkeys = innerDf.where(col(kn).isNotNull)
          .select(col(kn) +: corrFields.map(f => col(s"${kn}_$f")): _*)
          .distinct().withColumn(mk, lit(1))
        val mCtx = mkCtx(df)
        val xc = ColumnBuilder.build(x, mCtx)
        val mCond = (xc === dkeys(kn)) +: c.keys.map { case (f, o) =>
          outerCol(o, df, mCtx, sel) === dkeys(s"${kn}_$f") }
        df = df.join(dkeys, mCond.reduce(_ && _), "left")
        val base = when(col(acnt) === 0, lit(false))
          .when(col(mk).isNotNull, lit(true))
          .when(xc.isNull || col(cnt) < col(acnt),
            lit(null).cast("boolean"))
          .otherwise(lit(false))
        df = df.withColumn(h, if (neg) !base else base)
          .drop(kn, mk, cnt, acnt)
          .drop(corrFields.map(f => s"${kn}_$f"): _*)
      }
      hidden += h
      IdentityNode(Seq(h))
    }

    def attachExists(sub: SubqueryNode, neg: Boolean): Node = {
      val innerSel = parseSub(sub)
      val innerPlanner = new Planner(catalog, vars, includer)
      val c = analyzeCorrelation(innerSel, innerPlanner, sel, df)
      val h = fresh("ex")
      if (c.keys.isEmpty && c.extraPreds.isEmpty) {
        val en = fresh("en")
        val probe = innerPlanner.plan(innerSel).limit(1)
          .agg(count(lit(1)).as(en))
        df = df.crossJoin(broadcast(probe))
          .withColumn(h, if (neg) col(en) === 0 else col(en) > 0)
          .drop(en)
      } else if (c.extraPreds.nonEmpty) {
        // NON-EQUALITY cross-scope conjuncts as a VALUE (r15): the
        // distinct-key left-join marker below would duplicate outer
        // rows when a non-equi condition matches several inner rows,
        // so the verdict computes through a ROW-ID round trip: tag the
        // outer with a unique id, LEFT SEMI join (cardinality-exact)
        // to find the ids with a match, join the id set back as the
        // marker. Equality keys (when present) keep both joins
        // hash-partitionable; the id join-back keys on a unique long.
        if (innerSel.groupBy.nonEmpty || innerSel.having.nonEmpty)
          throw BuildException("correlated EXISTS with GROUP BY/HAVING " +
            "supports only equality correlation conjuncts")
        val corrFields = (c.keys.map(_._1) ++ c.extraPreds.map(_._2)).distinct
        val innerDf = innerPlanner.plan(innerSel.copy(
          columns = Seq(SelectColumn(IdentityNode(Seq("*")), None, None)),
          distinct = false, where = c.innerWhereNoExtra,
          orderBy = Nil, limit = None, offset = None, qualify = None))
          .select(corrFields.map(f => col(f).as(s"${h}_$f")): _*)
        val rid = fresh("rid"); val mk = fresh("m")
        // PIN the id-stamped frame before it feeds BOTH sides of the
        // round trip (the semi-join probe AND the join-back).
        // monotonically_increasing_id is nondeterministic: without the
        // pin each branch re-evaluates this subtree, and when it
        // contains a shuffle (outer is a join/agg — common) reducer
        // fetch order differs between evaluations, so the same logical
        // row can carry different ids in the two branches = silently
        // wrong EXISTS verdicts at cluster scale / under AQE / on
        // retry. cache() is lazy (keeps the session.explain zero-job
        // gate) and is the same pattern GraftSession.whereVictims uses
        // for DML row ids.
        //
        // Lifetime: the pin lives until the application ends (nothing
        // can safely unpersist it — removing the CacheManager entry
        // would make a later re-execution of the SAME frame evaluate
        // both branches uncached, reintroducing the race). One pin per
        // statement using this shape, MEMORY_AND_DISK (spills, never
        // OOMs). At cluster scale prefer the WHERE-conjunct form
        // (EXISTS as a top-level conjunct folds extraPreds into one
        // semi-join — no row ids, no pin) when the verdict is only
        // filtered on, not projected.
        df = df.withColumn(rid, monotonically_increasing_id()).cache()
        val outerCtx = mkCtx(df)
        val cond = (c.keys.map { case (f, o) =>
          outerCol(o, df, outerCtx, sel) === innerDf(s"${h}_$f")
        } ++ c.extraPreds.map { case (op, f, o, innerOnLeft) =>
          extraCmpCol(op, innerDf(s"${h}_$f"),
            outerCol(o, df, outerCtx, sel), innerOnLeft)
        }).reduce(_ && _)
        val hits = df.join(innerDf, cond, "left_semi")
          .select(col(rid)).withColumn(mk, lit(1))
        df = df.join(hits, Seq(rid), "left")
          .withColumn(h, if (neg) col(mk).isNull else col(mk).isNotNull)
          .drop(mk, rid)
      } else {
        val corrFields = c.keys.map(_._1).distinct
        val grouped = innerSel.groupBy.nonEmpty || innerSel.having.nonEmpty
        if (grouped && innerSel.groupBy.isEmpty)
          throw BuildException("correlated EXISTS with HAVING but no " +
            "GROUP BY is supported as a top-level WHERE/HAVING conjunct only")
        val mk = fresh("m")
        val keyDf0 =
          if (!grouped) {
            val innerDf = innerPlanner.plan(innerSel.copy(
              columns = Seq(SelectColumn(IdentityNode(Seq("*")), None, None)),
              distinct = false, where = c.innerWhere,
              orderBy = Nil, limit = None, offset = None, qualify = None))
            innerDf.select(corrFields.map(f => col(f).as(s"${h}_$f")): _*)
          } else
            innerPlanner.plan(innerSel.copy(
              columns = corrFields.map(f =>
                SelectColumn(IdentityNode(Seq(f)), Some(s"${h}_$f"), None)),
              distinct = false, where = c.innerWhere,
              groupBy = (innerSel.groupBy ++
                corrFields.map(f => IdentityNode(Seq(f)): Node)).distinct,
              orderBy = Nil, limit = None, offset = None, qualify = None))
        val keyDf = keyDf0.distinct().withColumn(mk, lit(1))
        val outerCtx = mkCtx(df)
        val cond = c.keys.map { case (f, o) =>
          outerCol(o, df, outerCtx, sel) === keyDf(s"${h}_$f") }.reduce(_ && _)
        df = df.join(keyDf, cond, "left")
          .withColumn(h, if (neg) col(mk).isNull else col(mk).isNotNull)
          .drop(mk +: corrFields.map(f => s"${h}_$f"): _*)
      }
      hidden += h
      IdentityNode(Seq(h))
    }

    /** Quantified comparison as a VALUE — unlike the WHERE-conjunct
      * guard predicates (which may collapse UNKNOWN→FALSE because both
      * drop under a filter), the projected verdict must be exactly
      * ANSI 3VL. Same bounded min/max/count/rowcount aggregate; the
      * verdict CASE reads: decided-by-extremum first, then the NULL
      * sources (NULL x, NULLs in the set), then the clean default.
      * `= ANY` and `<> ALL` ARE the membership tests and route to the
      * IN lowering, which already carries 3VL. */
    def attachQuant(op: String, quant: String, x: Node,
        sub: SubqueryNode): Node = {
      val innerSel = parseSub(sub)
      val innerPlanner = new Planner(catalog, vars, includer)
      val c = analyzeCorrelation(innerSel, innerPlanner, sel, df)
      requireEqualityCorrelation(c, "quantified (ANY/ALL) subquery")
      if (innerSel.columns.size != 1)
        throw BuildException("quantified subquery must select exactly one column")
      val h = fresh("q"); val vn = fresh("v")
      val mn = fresh("mn"); val mx = fresh("mx")
      val cnt = fresh("c"); val acnt = fresh("a")
      // correlated bare-aggregate: a singleton set per outer row (ANSI
      // completes empty slices to count→0/NULL) — the verdict IS the
      // scalar comparison, via the LATERAL's empty-group completion
      if (c.keys.nonEmpty && innerSel.groupBy.isEmpty &&
          innerSel.having.isEmpty &&
          containsAgg(innerSel.columns.head.expr)) {
        val sc = fresh("q1")
        val aliased = innerSel.copy(columns =
          Seq(innerSel.columns.head.copy(alias = Some(sc))))
        df = planLateral(df, sel,
          SubquerySource(aliased, fresh("q1t"), lateral = true))
        val verdict = ColumnBuilder.build(
          BinaryNode(op, x, IdentityNode(Seq(sc))), mkCtx(df)).cast("boolean")
        df = df.withColumn(h, verdict).drop(sc)
        hidden += h
        return IdentityNode(Seq(h))
      }
      if (c.keys.isEmpty) {
        val vals = innerPlanner.plan(innerSel).toDF(vn)
        val aggd = vals.agg(min(col(vn)).as(mn), max(col(vn)).as(mx),
          count(col(vn)).as(cnt), count(lit(1)).as(acnt))
        df = df.crossJoin(broadcast(aggd))
      } else {
        val valueCol = SelectColumn(innerSel.columns.head.expr, Some(vn), None)
        val kCols = c.keys.map(_._1).distinct.map(f =>
          SelectColumn(IdentityNode(Seq(f)), Some(s"${vn}_$f"), None))
        // grouped/aggregate-valued inners append the correlation keys
        // to the grouping (grouped-correlated-IN lowering, r12)
        val grouped = innerSel.groupBy.nonEmpty || innerSel.having.nonEmpty ||
          containsAgg(innerSel.columns.head.expr)
        val newGroupBy = if (grouped)
          (innerSel.groupBy ++
            c.keys.map(_._1).distinct.map(f => IdentityNode(Seq(f)): Node)).distinct
        else innerSel.groupBy
        val vals = innerPlanner.plan(innerSel.copy(
          columns = valueCol +: kCols, distinct = false,
          where = c.innerWhere, groupBy = newGroupBy,
          orderBy = Nil, limit = None,
          offset = None, qualify = None))
        val corrFields = c.keys.map(_._1).distinct
        val aggd = vals.groupBy(corrFields.map(f => col(s"${vn}_$f")): _*)
          .agg(min(col(vn)).as(mn), max(col(vn)).as(mx),
            count(col(vn)).as(cnt), count(lit(1)).as(acnt))
        val outerCtx = mkCtx(df)
        val cond = c.keys.map { case (f, o) =>
          outerCol(o, df, outerCtx, sel) === aggd(s"${vn}_$f") }.reduce(_ && _)
        df = df.join(aggd, cond, "left")
          .withColumn(cnt, coalesce(col(cnt), lit(0L)))
          .withColumn(acnt, coalesce(col(acnt), lit(0L)))
          .drop(corrFields.map(f => s"${vn}_$f"): _*)
      }
      val qctx = mkCtx(df)
      val xc = ColumnBuilder.build(x, qctx)
      def cmpc(o: String, rc: String) = ColumnBuilder.build(
        BinaryNode(o, x, IdentityNode(Seq(rc))), qctx).cast("boolean")
      val nullB = lit(null).cast("boolean")
      val verdict = (op, quant) match {
        case (">" | ">=" | "<" | "<=", "ANY") =>
          val ext = if (op.startsWith(">")) mn else mx
          when(col(acnt) === 0, lit(false))
            .when(cmpc(op, ext) === true, lit(true))
            .when(xc.isNull || col(cnt) < col(acnt), nullB)
            .otherwise(lit(false))
        case (">" | ">=" | "<" | "<=", "ALL") =>
          val ext = if (op.startsWith(">")) mx else mn
          when(col(acnt) === 0, lit(true))
            .when(cmpc(op, ext) === false, lit(false))
            .when(xc.isNull || col(cnt) < col(acnt), nullB)
            .otherwise(lit(true))
        case ("=" | "==", "ALL") =>
          when(col(acnt) === 0, lit(true))
            .when(xc.isNull || col(cnt) === 0, nullB)
            .when(col(mn) =!= col(mx) || (cmpc("=", mn) === false), lit(false))
            .when(col(cnt) < col(acnt), nullB)
            .otherwise(lit(true))
        case ("!=" | "<>", "ANY") =>
          when(col(acnt) === 0, lit(false))
            .when(xc.isNull || col(cnt) === 0, nullB)
            .when(col(mn) =!= col(mx) || (cmpc("!=", mn) === true), lit(true))
            .when(col(cnt) < col(acnt), nullB)
            .otherwise(lit(false))
        case other =>
          throw BuildException(s"unsupported quantified comparison $other")
      }
      df = df.withColumn(h, verdict).drop(mn, mx, cnt, acnt)
      hidden += h
      IdentityNode(Seq(h))
    }

    def attachScalar(sub: SubqueryNode): Node = {
      val innerSel = parseSub(sub)
      val sc = fresh("sc")
      val corr = analyzeCorrelation(innerSel,
        new Planner(catalog, vars, includer), sel, df)
      requireEqualityCorrelation(corr, "scalar subquery")
      if (corr.keys.nonEmpty) {
        if (innerSel.columns.size != 1 ||
            !containsAgg(innerSel.columns.head.expr))
          throw BuildException("correlated scalar subquery must select " +
            "exactly one aggregate expression")
        val aliased = innerSel.copy(columns =
          Seq(innerSel.columns.head.copy(alias = Some(sc))))
        df = planLateral(df, sel,
          SubquerySource(aliased, fresh("sct"), lateral = true))
      } else {
        df = df.crossJoin(broadcast(scalarOneRow(innerSel, sc)))
      }
      hidden += sc
      IdentityNode(Seq(sc))
    }

    def walk(n: Node): Node = n match {
      case BinaryNode("IN", x, s: SubqueryNode, neg) => attachIn(walk(x), s, neg)
      case UnaryNode("EXISTS", s: SubqueryNode) => attachExists(s, neg = false)
      case UnaryNode("NOT" | "!", UnaryNode("EXISTS", s: SubqueryNode)) =>
        attachExists(s, neg = true)
      case BinaryNode(opq, x, s: SubqueryNode, false)
          if opq.endsWith(" ANY") || opq.endsWith(" ALL") =>
        val Array(op, quant) = opq.split(' ')
        (op, quant) match {
          // the membership shapes ARE the IN lowering (3VL-exact there)
          case ("=" | "==", "ANY") => attachIn(walk(x), s, neg = false)
          case ("!=" | "<>", "ALL") => attachIn(walk(x), s, neg = true)
          case _ => attachQuant(op, quant, walk(x), s)
        }
      case s: SubqueryNode => attachScalar(s)
      case BinaryNode(op, l, r, neg) => BinaryNode(op, walk(l), walk(r), neg)
      case BooleanNode(op, args, neg) => BooleanNode(op, args.map(walk), neg)
      case UnaryNode(op, c) => UnaryNode(op, walk(c))
      case TriNode(op, a, b, c, neg) =>
        TriNode(op, walk(a), walk(b), walk(c), neg)
      case FuncNode(name, args) => FuncNode(name, args.map(walk))
      case CaseNode(bs, e) =>
        CaseNode(bs.map { case (w, t) => (walk(w), walk(t)) }, e.map(walk))
      case ArrayNode(items) => ArrayNode(items.map(walk))
      case WindowNode(f, pb, ob, fr, ref) =>
        WindowNode(walk(f).asInstanceOf[FuncNode], pb.map(walk),
          ob.map { case (e, asc) => (walk(e), asc) }, fr, ref)
      case other => other
    }
    val out = walk(n0)
    (df, out, hidden.toSeq)
  }

  /** Correlation analysis of a subquery's WHERE against the outer
    * frame: `keys` are (innerField, outerNode) pairs from equality
    * conjuncts whose one side ONLY the outer scope can bind;
    * `innerWhere` is the remaining predicate INCLUDING any non-equality
    * cross-scope conjuncts — a consumer that cannot handle those keeps
    * today's loud unresolved-column failure instead of silently
    * dropping a predicate. `extraPreds` classifies exactly those
    * non-equality cross-scope comparisons ((op, innerField, outerNode,
    * innerOnLeft)) and `innerWhereNoExtra` is innerWhere with them
    * removed — the pair an extra-aware lowering (WHERE-conjunct
    * EXISTS, r15: `EXISTS (… WHERE d.id = t.id AND d.amount > t.v)` —
    * found live by scripts/fuzz_dml.py) consumes by folding the
    * comparison into its join condition. */
  private final case class Correlation(keys: Seq[(String, Node)],
      innerWhere: Option[Node],
      extraPreds: Seq[(String, String, Node, Boolean)] = Nil,
      innerWhereNoExtra: Option[Node] = None)

  private def analyzeCorrelation(innerSel: SqlSelect, innerPlanner: Planner,
      outerSel: SqlSelect, outerDf: DataFrame): Correlation = {
    val innerAliases = innerSel.from.map(_.aliasName).toSet
    val outerAliases = outerSel.from.map(_.aliasName).toSet
    val probeSchema = innerPlanner.plan(innerSel.copy(
      columns = Seq(SelectColumn(IdentityNode(Seq("*")), None, None)),
      distinct = false, where = None, groupBy = Nil,
      groupByRollup = false, groupByCube = false, having = None,
      orderBy = Nil, limit = None, offset = None, qualify = None)).schema
    def identOf(n: Node): Option[Seq[String]] = n match {
      case IdentityNode(p) if !p.mkString(".").startsWith("@") => Some(p)
      case _ => None
    }
    val conjs = innerSel.where.toSeq.flatMap {
      case BooleanNode("AND", args, false) => args
      case other => Seq(other)
    }
    // is this a cross-scope ident-vs-ident comparison? returns
    // (innerPath, outerNode, innerOnLeft)
    def crossScope(l: Node, r: Node): Option[(Seq[String], Node, Boolean)] =
      (identOf(l), identOf(r)) match {
        case (Some(lp), Some(rp)) =>
          val lIn = resolvesIn(lp, probeSchema, innerAliases)
          val rIn = resolvesIn(rp, probeSchema, innerAliases)
          if (lIn && !rIn && resolvesIn(rp, outerDf.schema, outerAliases))
            Some((lp, r, true))
          else if (rIn && !lIn && resolvesIn(lp, outerDf.schema, outerAliases))
            Some((rp, l, false))
          else None
        case _ => None
      }
    val (corr, innerOnly) = conjs.partition {
      case BinaryNode("==" | "=", l, r, false) => crossScope(l, r).isDefined
      case _ => false
    }
    val keys = corr.collect { case BinaryNode(_, l, r, _) =>
      val (innerPath, outerNode, _) = crossScope(l, r).get
      (fieldNameIn(innerPath, probeSchema), outerNode)
    }
    val cmpOps = Set("<", "<=", ">", ">=", "!=", "<>")
    val (extraConjs, pureInner) = innerOnly.partition {
      case BinaryNode(op, l, r, false) if cmpOps.contains(op) =>
        crossScope(l, r).isDefined
      case _ => false
    }
    val extraPreds = extraConjs.collect { case BinaryNode(op, l, r, _) =>
      val (innerPath, outerNode, innerOnLeft) = crossScope(l, r).get
      (op, fieldNameIn(innerPath, probeSchema), outerNode, innerOnLeft)
    }
    def andOf(ns: Seq[Node]): Option[Node] = ns match {
      case Nil => None
      case Seq(one) => Some(one)
      case many => Some(BooleanNode("AND", many))
    }
    Correlation(keys, andOf(innerOnly), extraPreds, andOf(pureInner))
  }

  /** Does a column path resolve against this scope? Full-name match; a
    * head segment naming a (struct/map) field; or a qualified `t.col`
    * whose qualifier names one of the scope's FROM aliases and whose
    * last segment is a field — the qualifier is what keeps
    * `users.user_id` from resolving inside a subquery over `orders`
    * even though both tables carry a `user_id` column. */
  private def resolvesIn(parts: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      aliases: Set[String]): Boolean = {
    val name = parts.mkString(".")
    if (schema.fieldNames.exists(_.equalsIgnoreCase(name))) true
    else if (parts.length > 1) {
      schema.fieldNames.exists(_.equalsIgnoreCase(parts.head)) ||
        (aliases.exists(_.equalsIgnoreCase(parts.head)) &&
          schema.fieldNames.exists(_.equalsIgnoreCase(parts.last)))
    } else false
  }

  /** The schema field name a path denotes (full-name match wins, then
    * the qualified last segment). */
  private def fieldNameIn(parts: Seq[String],
      schema: org.apache.spark.sql.types.StructType): String = {
    val name = parts.mkString(".")
    schema.fieldNames.find(_.equalsIgnoreCase(name))
      .orElse(schema.fieldNames.find(_.equalsIgnoreCase(parts.last)))
      .getOrElse(name)
  }

  private def parseSub(s: SubqueryNode): SqlSelect =
    new SqlParser(s.tokens).parseStatement() match {
      case sel: SqlSelect => sel
      case other => throw BuildException("subquery must be a SELECT")
    }

  /** All window expressions in the tree (outermost only — windows do
    * not nest inside windows' functions in this dialect). */
  private def collectWindows(n: Node): Seq[WindowNode] = n match {
    case w: WindowNode => Seq(w)
    case BinaryNode(_, l, r, _) => collectWindows(l) ++ collectWindows(r)
    case BooleanNode(_, args, _) => args.flatMap(collectWindows)
    case UnaryNode(_, c) => collectWindows(c)
    case TriNode(_, a, b, c, _) =>
      collectWindows(a) ++ collectWindows(b) ++ collectWindows(c)
    case FuncNode(_, args) => args.flatMap(collectWindows)
    case CaseNode(branches, els) =>
      branches.flatMap { case (w, t) => collectWindows(w) ++ collectWindows(t) } ++
        els.toSeq.flatMap(collectWindows)
    case ArrayNode(items) => items.flatMap(collectWindows)
    case _ => Nil
  }

  private def containsWindow(n: Node): Boolean = collectWindows(n).nonEmpty

  /** Whether the expression tree calls the named function anywhere. */
  private def containsFnNamed(n: Node, fname: String): Boolean = n match {
    case FuncNode(name, args) =>
      name == fname || args.exists(containsFnNamed(_, fname))
    case BinaryNode(_, l, r, _) => containsFnNamed(l, fname) || containsFnNamed(r, fname)
    case BooleanNode(_, args, _) => args.exists(containsFnNamed(_, fname))
    case UnaryNode(_, c) => containsFnNamed(c, fname)
    case TriNode(_, a, b, c, _) =>
      containsFnNamed(a, fname) || containsFnNamed(b, fname) || containsFnNamed(c, fname)
    case CaseNode(branches, els) =>
      branches.exists { case (w, t) =>
        containsFnNamed(w, fname) || containsFnNamed(t, fname) } ||
        els.exists(containsFnNamed(_, fname))
    case ArrayNode(items) => items.exists(containsFnNamed(_, fname))
    case WindowNode(f, pb, ob, _, _) =>
      containsFnNamed(f, fname) || pb.exists(containsFnNamed(_, fname)) ||
        ob.exists(p => containsFnNamed(p._1, fname))
    case _ => false
  }

  private def containsAgg(n: Node): Boolean = n match {
    case FuncNode(name, args) => FuncRegistry.isAgg(name) || args.exists(containsAgg)
    case BinaryNode(_, l, r, _) => containsAgg(l) || containsAgg(r)
    case BooleanNode(_, args, _) => args.exists(containsAgg)
    case UnaryNode(_, c) => containsAgg(c)
    case TriNode(_, a, b, c, _) => containsAgg(a) || containsAgg(b) || containsAgg(c)
    case CaseNode(branches, els) =>
      branches.exists { case (w, t) => containsAgg(w) || containsAgg(t) } ||
        els.exists(containsAgg)
    case _ => false
  }

  private def collectAggs(n: Node): Seq[Node] = n match {
    case f @ FuncNode(name, _) if FuncRegistry.isAgg(name) => Seq(f)
    case FuncNode(_, args) => args.flatMap(collectAggs)
    case BinaryNode(_, l, r, _) => collectAggs(l) ++ collectAggs(r)
    case BooleanNode(_, args, _) => args.flatMap(collectAggs)
    case UnaryNode(_, c) => collectAggs(c)
    case TriNode(_, a, b, c, _) => collectAggs(a) ++ collectAggs(b) ++ collectAggs(c)
    case CaseNode(branches, els) =>
      branches.flatMap { case (w, t) => collectAggs(w) ++ collectAggs(t) } ++
        els.toSeq.flatMap(collectAggs)
    case _ => Nil
  }

  /** Two expressions denote the same key if their text matches, or one
    * is an identity naming the other's alias. */
  private def sameExpr(a: Node, b: Node, cols: Seq[SelectColumn]): Boolean =
    a.text == b.text ||
      (a match { case IdentityNode(p) => cols.exists(c => c.alias.contains(p.mkString(".")) && c.expr.text == b.text); case _ => false }) ||
      (b match { case IdentityNode(p) => cols.exists(c => c.alias.contains(p.mkString(".")) && c.expr.text == a.text); case _ => false })

  /** ORDER BY may name a select alias — swap in the aliased expression. */
  private def resolveAlias(n: Node, cols: Seq[SelectColumn]): Node = n match {
    case IdentityNode(parts) =>
      cols.find(_.alias.contains(parts.mkString("."))).map(_.expr).getOrElse(n)
    case _ => n
  }

  /** Alias expansion through the whole tree (QUALIFY scoping: select
    * aliases AND source columns are both legal, so the predicate
    * rewrites to pure source terms before filtering pre-projection). */
  private def resolveAliasDeep(n: Node, cols: Seq[SelectColumn]): Node = n match {
    case id: IdentityNode => resolveAlias(id, cols)
    case BinaryNode(op, l, r, neg) =>
      BinaryNode(op, resolveAliasDeep(l, cols), resolveAliasDeep(r, cols), neg)
    case BooleanNode(op, args, neg) =>
      BooleanNode(op, args.map(resolveAliasDeep(_, cols)), neg)
    case UnaryNode(op, c) => UnaryNode(op, resolveAliasDeep(c, cols))
    case TriNode(op, a, b, c, neg) => TriNode(op, resolveAliasDeep(a, cols),
      resolveAliasDeep(b, cols), resolveAliasDeep(c, cols), neg)
    case FuncNode(name, args) => FuncNode(name, args.map(resolveAliasDeep(_, cols)))
    case CaseNode(branches, els) => CaseNode(
      branches.map { case (w, t) => (resolveAliasDeep(w, cols), resolveAliasDeep(t, cols)) },
      els.map(resolveAliasDeep(_, cols)))
    case ArrayNode(items) => ArrayNode(items.map(resolveAliasDeep(_, cols)))
    case WindowNode(f, pb, ob, fr, ref) => WindowNode(
      resolveAliasDeep(f, cols).asInstanceOf[FuncNode],
      pb.map(resolveAliasDeep(_, cols)),
      ob.map { case (e, asc) => (resolveAliasDeep(e, cols), asc) }, fr, ref)
    case other => other
  }

  /** Replace subtrees whose text appears in the substitution map with a
    * column reference to the aggregated output. */
  private def substitute(n: Node, subst: Map[String, String]): Node =
    subst.get(n.text) match {
      case Some(name) => IdentityNode(Seq(name))
      case None => n match {
        case BinaryNode(op, l, r, neg) => BinaryNode(op, substitute(l, subst), substitute(r, subst), neg)
        case BooleanNode(op, args, neg) => BooleanNode(op, args.map(substitute(_, subst)), neg)
        case UnaryNode(op, c) => UnaryNode(op, substitute(c, subst))
        case TriNode(op, a, b, c, neg) =>
          TriNode(op, substitute(a, subst), substitute(b, subst), substitute(c, subst), neg)
        case FuncNode(name, args) => FuncNode(name, args.map(substitute(_, subst)))
        case other => other
      }
    }
}

object Planner {
  /** Does `st` read table `name` anywhere in its FROM tree? Drives
    * WITH RECURSIVE detection (a CTE whose statement reads its own
    * name) and the base/recursive-term split validation. */
  def referencesTable(st: Statement, name: String): Boolean = {
    val n = name.toLowerCase
    def inSource(fs: FromSource): Boolean = fs match {
      case t: TableSource => t.name.toLowerCase == n
      case s: SubquerySource => refs(s.select)
      case p: PivotSource => inSource(p.source)
      case s: SampleSource => inSource(s.source)
      case u: UnpivotSource => inSource(u.source)
      case _: ValuesSource => false
    }
    def refs(s: Statement): Boolean = s match {
      case sel: SqlSelect => sel.from.exists(inSource)
      case SqlSetOp(_, _, l, r, _, _) => refs(l) || refs(r)
      case SqlWith(ctes, body, _) => ctes.exists(c => refs(c.stmt)) || refs(body)
      case _ => false
    }
    refs(st)
  }
}
