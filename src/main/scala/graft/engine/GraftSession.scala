package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expr._
import graft.rel._

/** The engine's user-facing session: a source registry + session state +
  * statement dispatch, mirroring the reference's schema registry /
  * `database/sql` driver surface (/root/reference/schema/registry.go,
  * exec/sqldriver.go, exec/command.go, exec/ddl.go).
  *
  * `sql(text)` accepts the full dialect: SELECT (incl. joins, group by,
  * having, order, limit/offset, INTO), INSERT/UPDATE/UPSERT/DELETE on
  * registered mutable tables, SET @var / USE, SHOW/DESCRIBE rewritten as
  * catalog DataFrames (plan/sql_rewrite.go:49-245 behavior), CREATE
  * SOURCE/TABLE/VIEW WITH {json}, DROP, transaction no-ops, and
  * FilterQL FILTER statements.
  */
final class GraftSession(val spark: SparkSession) {

  // engine performance confs travel with the ENGINE, not the mains
  // (VERDICT r16 #2): a consumer-built SparkSession gets the same
  // cached-plan AQE coalescing as Bench/Verify; all entries are
  // dynamic SQL confs, set once at session wrap
  graft.plans.SessionTuning.applyTo(spark)

  // the compiled kernel suite (graft_simhash64, graft_cosine, graft_dot,
  // graft_minhash, graft_pq_encode, …) is part of the engine's SQL
  // surface: a session user gets the pipeline primitives from plain SQL
  graft.functions.VectorExpressions.register(spark)
  // …and from the engine DIALECT too, through the same extension surface
  // a user would use (expr.FuncAdd ≙ FuncRegistry.add) — beyond-reference
  // builtins, so guarded to not clobber user registrations
  locally {
    import graft.functions.{VectorExpressions => VE}
    val kernels: Seq[(String, Seq[Column] => Column)] = Seq(
      "simhash64" -> (as => VE.simhash64(as.head)),
      "cosine_sim" -> (as => VE.cosine_sim(as(0), as(1))),
      "dot_product" -> (as => VE.dot_product(as(0), as(1))),
      "l2_normalize" -> (as => VE.l2_normalize(as.head)))
    for ((n, f) <- kernels if !FuncRegistry.contains(n)) FuncRegistry.add(n)(f)
  }

  /** name → loader; kept lazy so CREATE SOURCE can register paths before
    * files exist and schemas refresh on access (schema/schema.go:23). */
  private val tables = collection.concurrent.TrieMap.empty[String, () => DataFrame]
  private val sessionVars = collection.concurrent.TrieMap.empty[String, Any]
  private val namedFilters = collection.concurrent.TrieMap.empty[String, Node]
  // table name → the refresher holding its background task, so dropTable
  // can deregister (an orphaned task would re-introspect every interval)
  private val refreshers =
    collection.concurrent.TrieMap.empty[String, SampleIntrospect.BackgroundRefresher]

  // ---- registry (schema.RegisterSourceAsSchema ≙) ---------------------

  def registerTable(name: String, df: DataFrame): Unit =
    registerLazy(name, () => df)
  def registerLazy(name: String, load: () => DataFrame): Unit = {
    tables.put(name.toLowerCase, load)
    // ANY re-registration displaces a sampled table's background task:
    // without this, registerParquet over a refreshed CSV table would
    // leave the old refresher re-introspecting an orphaned loader's
    // cache every interval until its close()
    swapRefresher(name, None)
  }

  /** Reconcile the refresher registry after (re-)registering `name`:
    * remember `next` (or forget, for plain tables), and deregister the
    * table's key from a DISPLACED previous instance — one that differs
    * from `next`. Same-instance re-registration needs no deregister:
    * the loader already REPLACED the task under the same key (and a
    * deregister here would cancel the fresh task). */
  private def swapRefresher(name: String,
      next: Option[SampleIntrospect.BackgroundRefresher]): Unit = {
    val k = name.toLowerCase
    val prev = next match {
      case Some(r) => refreshers.put(k, r)
      case None => refreshers.remove(k)
    }
    prev.foreach(p => if (!next.exists(_ eq p)) p.deregister((this, k)))
  }
  def registerParquet(name: String, path: String): Unit =
    registerLazy(name, () => spark.read.parquet(path))
  def registerCsv(name: String, path: String): Unit =
    registerLazy(name, () => spark.read.option("header", "true").option("inferSchema", "true").csv(path))
  /** CSV source typed from a bounded row sample with TTL re-introspection
    * (datasource/introspect.go:14-78, schema/schema.go:23) — unlike
    * `registerCsv`'s full-file inference pass, introspection cost here
    * is a driver fetch of `sampleRows` rows regardless of file size. */
  def registerCsvSampled(name: String, path: String,
      sampleRows: Int = SampleIntrospect.IntrospectCount,
      refreshMs: Long = SampleIntrospect.RefreshIntervalMs,
      clock: () => Long = () => System.currentTimeMillis(),
      refresher: Option[SampleIntrospect.BackgroundRefresher] = None): Unit = {
    // keyed by table name: re-registering this table REPLACES its
    // background task instead of accumulating one per call
    tables.put(name.toLowerCase, SampleIntrospect.csvLoader(
      spark, path, sampleRows, refreshMs, clock, refresher,
      refreshKey = (this, name.toLowerCase)))
    swapRefresher(name, refresher)
  }
  /** JSON-lines source typed from a bounded line sample (recursive
    * struct/array introspection) with TTL re-introspection — the JSON
    * half of the reference's sampling model. */
  def registerJsonSampled(name: String, path: String,
      sampleRows: Int = SampleIntrospect.IntrospectCount,
      refreshMs: Long = SampleIntrospect.RefreshIntervalMs,
      clock: () => Long = () => System.currentTimeMillis(),
      refresher: Option[SampleIntrospect.BackgroundRefresher] = None): Unit = {
    tables.put(name.toLowerCase, SampleIntrospect.jsonLoader(
      spark, path, sampleRows, refreshMs, clock, refresher,
      refreshKey = (this, name.toLowerCase)))
    swapRefresher(name, refresher)
  }
  def registerJson(name: String, path: String): Unit =
    registerLazy(name, () => spark.read.json(path))
  /** JDBC-backed source — the Spark-native equivalent of the reference's
    * SQLite full-pushdown source (datasource/sqlite/sqlrewrite.go):
    * Spark's JDBC relation pushes filters/projections itself. */
  def registerJdbc(name: String, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): Unit =
    registerLazy(name, () => spark.read.jdbc(url, table, props))
  def dropTable(name: String): Unit = {
    tables.remove(name.toLowerCase)
    refreshers.remove(name.toLowerCase)
      .foreach(_.deregister((this, name.toLowerCase)))
  }
  def tableNames: Seq[String] = tables.keys.toSeq.sorted
  def table(name: String): DataFrame =
    tables.get(name.toLowerCase)
      // schema-qualified `db.table` falls back to the bare table name
      // (single-namespace registry; the reference resolves the schema
      // prefix through its registry — schema/registry.go)
      .orElse(tables.get(name.toLowerCase.split('.').last))
      .getOrElse(throw new IllegalArgumentException(s"unknown table '$name'"))()

  /** Named stored filters for FilterQL INCLUDE resolution. */
  def addFilter(name: String, filterQl: String): Unit = {
    SqlParser.parse(filterQl) match {
      case FilterStatement(f, _, _, _) => namedFilters.put(name.toLowerCase, f)
      case _ => namedFilters.put(name.toLowerCase, ExprParser.parse(filterQl))
    }
  }
  def setVar(name: String, v: Any): Unit = sessionVars.put(name.stripPrefix("@@").stripPrefix("@"), v)
  def getVar(name: String): Option[Any] = sessionVars.get(name.stripPrefix("@@").stripPrefix("@"))

  private def includer(name: String): Option[Node] = namedFilters.get(name.toLowerCase)

  private def planner = new Planner(table, sessionVars.toMap, includer)

  /** Plan a `WITH … SELECT` chain: each CTE plans against a catalog
    * overlay holding the CTEs before it (sequential scope), then the
    * body plans with every CTE visible. CTE names shadow registered
    * tables for the statement's duration only — nothing enters the
    * session registry. Under WITH RECURSIVE, a self-referencing CTE is
    * evaluated to fixpoint by [[planRecursiveCte]]. */
  private def runWith(w: SqlWith): DataFrame = {
    val overlay = collection.mutable.Map[String, DataFrame]()
    def lookup(n: String): DataFrame =
      overlay.getOrElse(n.toLowerCase, table(n))
    for (cte <- w.ctes) {
      val df =
        if (w.recursive && Planner.referencesTable(cte.stmt, cte.name))
          planRecursiveCte(cte, overlay, lookup)
        else applyCteCols(
          new Planner(lookup, sessionVars.toMap, includer).planStatement(cte.stmt),
          cte)
      overlay(cte.name.toLowerCase) = df
    }
    val p = new Planner(lookup, sessionVars.toMap, includer)
    w.body match {
      case sel: SqlSelect =>
        val df = p.plan(sel)
        sel.into match {
          case Some(t) => val m = df.cache(); registerTable(t, m); m
          case None => df
        }
      case _: SqlWith =>
        throw BuildException("nested WITH is not supported; merge the CTE lists")
      case other => p.planStatement(other)
    }
  }

  /** Positional column aliases from `name(col, …) AS (…)`. */
  private def applyCteCols(df: DataFrame, cte: CteDef): DataFrame =
    if (cte.cols.isEmpty) df
    else if (cte.cols.length != df.columns.length)
      throw BuildException(s"CTE ${cte.name} declares ${cte.cols.length} " +
        s"columns but its query produces ${df.columns.length}")
    else df.toDF(cte.cols: _*)

  /** Fixpoint evaluation of a recursive CTE (`base UNION [ALL] rec`),
    * semi-naive: iteration i plans the recursive term with the CTE name
    * bound to iteration i-1's NEW rows only, so work per round is
    * proportional to the frontier, not the accumulated result. UNION
    * (distinct) additionally anti-joins each frontier against
    * everything seen (`except`), which is what terminates cyclic
    * graphs. Every frontier is localCheckpoint-ed: the plan stays one
    * iteration deep instead of towering (the bpeTrain lineage lesson),
    * and the accumulated result is a flat union of checkpointed
    * frontiers. Iterations are distributed jobs; the only driver-side
    * values are the per-round emptiness probes. Depth is capped
    * (default 200, `SET @@max_recursion = n` to change) — a cyclic
    * UNION ALL raises instead of spinning forever.
    *
    * Durability knob (r15, VERDICT r14 #5): `SET @@checkpoint_dir =
    * '/dfs/path'` makes every `@@checkpoint_every`-th frontier
    * (default 8, round 0 = the base term included) a RELIABLE
    * checkpoint against that directory instead of a localCheckpoint,
    * bounding executor-loss rework on a real cluster — see
    * [[graft.plans.CheckpointPolicy]] for the tradeoff. Unset (the
    * default) every round stays local. */
  private def planRecursiveCte(cte: CteDef,
      overlay: collection.mutable.Map[String, DataFrame],
      lookup: String => DataFrame): DataFrame = {
    val (baseStmt, recStmt, all) = cte.stmt match {
      case SqlSetOp(op, a, l, r, ob, lim) if op == "UNION" =>
        if (ob.nonEmpty || lim.isDefined)
          throw BuildException(s"WITH RECURSIVE ${cte.name}: ORDER BY/LIMIT " +
            "on the recursive body is not supported; wrap the CTE instead")
        if (Planner.referencesTable(l, cte.name))
          throw BuildException(s"WITH RECURSIVE ${cte.name}: the self-" +
            "reference must appear only in the final UNION term")
        (l, r, a)
      case _ =>
        throw BuildException(s"WITH RECURSIVE ${cte.name}: body must be " +
          "<base> UNION [ALL] <recursive term>")
    }
    val maxIter = sessionVars.get("max_recursion") match {
      case Some(v) => v.toString.toDouble.toInt
      case None => 200
    }
    val ckpt = graft.plans.CheckpointPolicy(
      sessionVars.get("checkpoint_dir").map(_.toString).filter(_.nonEmpty),
      sessionVars.get("checkpoint_every") match {
        case Some(v) => v.toString.toDouble.toInt
        case None => 8
      })
    val planner = new Planner(lookup, sessionVars.toMap, includer)
    var result = applyCteCols(planner.planStatement(baseStmt), cte)
    if (!all) result = result.distinct()
    // checkpoint-with-count (r16): the eager checkpoint's forcing
    // count is the emptiness probe — one job per round, not two
    val (result0, n0) = ckpt.applyWithCount(result, 0)
    result = result0
    // Lifecycle of the checkpoint blocks (the r11 instability: every
    // frontier's MEMORY_AND_DISK blocks lived until GC decided, and
    // `except(result)` re-scanned an O(iters) union chain each round —
    // warm reps swung 4→23 s):
    //  - `chain` holds the checkpointed frames whose union IS `result`;
    //  - every `compactEvery` rounds `result` re-checkpoints to ONE
    //    flat relation and the superseded chain blocks are unpersisted
    //    eagerly (except the live frontier, still the next round's
    //    input);
    //  - a frontier that compaction has orphaned is freed the moment a
    //    new frontier supersedes it.
    // UNION (distinct) compacts tightly — `except(result)` cost is
    // proportional to chain length; UNION ALL has no except, so it
    // compacts rarely (plan-depth bound only) and avoids the O(n²/k)
    // re-copy of the accumulated result.
    val compactEvery = if (all) 64 else 8
    val chain = collection.mutable.ArrayBuffer[DataFrame](result)
    var frontier = result
    var frontierInChain = true
    val key = cte.name.toLowerCase
    var iter = 0
    // emptiness read off the checkpoint's own forcing count — no
    // separate scan-shaped isEmpty job
    var done = n0 == 0
    while (!done) {
      iter += 1
      if (iter > maxIter)
        throw BuildException(s"WITH RECURSIVE ${cte.name}: no fixpoint " +
          s"after $maxIter iterations (SET @@max_recursion to raise)")
      overlay(key) = frontier
      var next = new Planner(lookup, sessionVars.toMap, includer)
        .planStatement(recStmt)
      if (next.columns.length != result.columns.length)
        throw BuildException(s"WITH RECURSIVE ${cte.name}: recursive term " +
          s"produces ${next.columns.length} columns, base ${result.columns.length}")
      next = next.toDF(result.columns.toIndexedSeq: _*)
      if (!all) next = next.distinct().except(result)
      val (nextCk, nNext) = ckpt.applyWithCount(next, iter)
      next = nextCk
      if (nNext == 0) { freeLocalCheckpoint(next); done = true }
      else {
        if (!frontierInChain) freeLocalCheckpoint(frontier)
        result = result.union(next)
        chain += next
        frontier = next
        frontierInChain = true
        if (iter % compactEvery == 0) {
          result = ckpt(result, iter)
          chain.foreach(d => if (!(d eq frontier)) freeLocalCheckpoint(d))
          chain.clear()
          chain += result
          frontierInChain = false
        }
      }
    }
    if (!frontierInChain) freeLocalCheckpoint(frontier)
    result
  }

  /** Unpersist the cache blocks behind a `localCheckpoint(true)`-ed
    * frame. localCheckpoint is CACHE-backed (MEMORY_AND_DISK), so the
    * blocks survive until RDD GC unless freed explicitly — this is the
    * explicit path. Only safe once nothing will read the frame again:
    * a localCheckpoint truncates lineage, so freed blocks CANNOT be
    * recomputed. */
  private def freeLocalCheckpoint(df: DataFrame): Unit =
    try df match {
      case c: org.apache.spark.sql.classic.Dataset[_] =>
        c.queryExecution.analyzed.collect {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        }.foreach(_.unpersist(false))
      case _ => ()
    } catch { case scala.util.control.NonFatal(_) => () }

  // ---- statement dispatch (exec/executor.go WalkPlan ≙) ---------------

  def sql(text: String): DataFrame = run(SqlParser.parse(text))

  /** Formatted physical plan of a QUERY statement — the plan-audit
    * workflow as a user surface (r13). Statement BUILD launches no
    * Spark jobs even when the select list, ORDER BY, QUALIFY or column
    * guards contain scalar subqueries: every uncorrelated scalar
    * lowers to a lazy in-plan broadcast aggregate with a `raise_error`
    * single-row guard, so the plan is inspectable before any data is
    * touched (gated by PlanSpec's zero-job listener case). Query
    * statements only — DML/DDL refuse loudly rather than execute as a
    * side effect; `SELECT … INTO` explains the query without
    * materializing the target. (A recursive CTE is the one exception:
    * its fixpoint must run to know the result schema.) */
  def explain(text: String): String = SqlParser.parse(text) match {
    case sel: SqlSelect => fmtPlan(planner.plan(sel))
    case sop: SqlSetOp => fmtPlan(planner.planStatement(sop))
    case w: SqlWith => fmtPlan(runWith(w))
    case f: FilterStatement => fmtPlan(filterDf(f))
    case other => throw BuildException(
      s"explain supports query statements only, not ${other.getClass.getSimpleName}")
  }

  private def fmtPlan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Positional-placeholder query — the reference's `database/sql`
    * driver surface (exec/sqldriver.go:352-390 queryArgsConvert ≙):
    * each `?` in `text` substitutes the rendering of the next arg, then
    * the expanded statement runs through the normal dialect path.
    *
    * Renderings (sqldriver.go:369-387): NULL for null; quoted-escaped
    * for String/bytes; decimal for the int family; `1`/`0` for
    * booleans; 12-digit e-notation for floats (FormatFloat(v,'e',12,64)
    * ≙); `'yyyy-MM-dd HH:mm:ss.fffffffff'` (MysqlTimeFormat ≙) for
    * timestamps. More args than placeholders raises the reference's
    * exact message; placeholders BEYOND the arg list stay in the text
    * (and fail at parse), as in the reference.
    *
    * Guards: the reference refuses any parameterized query already
    * containing a quote character (its "tiny bit of string
    * sanitization", sqldriver.go:356-358) by silently returning an
    * empty query; here the same refusal is LOUD (README divergence
    * rule: silent empties never surface in a distributed run). String
    * escaping doubles into backslash-escapes for `\` and the quote
    * only — this dialect's lexer keeps other `\x` pairs literal, so
    * control characters embed raw and round-trip exactly. */
  def sql(text: String, args: Seq[Any]): DataFrame = {
    if (args.isEmpty) return sql(text)
    if (text.exists(c => c == '\'' || c == '"'))
      throw BuildException("parameterized query must not contain quote " +
        "characters (reference sqldriver.go queryArgsConvert sanitization)")
    val tsFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.nnnnnnnnn")
    def esc(s: String): String =
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def render(a: Any): String = a match {
      case null | None => "NULL"
      case s: String => esc(s)
      case b: Array[Byte] => esc(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      case v: Long => v.toString
      case v: Int => v.toString
      case v: Short => v.toString
      case v: Byte => v.toString
      case v: Boolean => if (v) "1" else "0"
      case v: Double => String.format(java.util.Locale.ROOT, "%.12e", Double.box(v))
      case v: Float => String.format(java.util.Locale.ROOT, "%.12e", Double.box(v.toDouble))
      case v: java.sql.Timestamp => "'" + v.toLocalDateTime.format(tsFmt) + "'"
      case v: java.time.Instant =>
        "'" + java.time.LocalDateTime.ofInstant(v, java.time.ZoneOffset.UTC).format(tsFmt) + "'"
      case v: java.time.LocalDateTime => "'" + v.format(tsFmt) + "'"
      case other => throw BuildException(
        s"${other} (${other.getClass.getSimpleName}) can't be used as a query arg")
    }
    val sb = new StringBuilder
    var rest = text
    for (a <- args) {
      val i = rest.indexOf('?')
      if (i == -1)
        throw BuildException("number of parameters doesn't match number of placeholders")
      sb ++= rest.substring(0, i)
      sb ++= render(a)
      rest = rest.substring(i + 1)
    }
    sb ++= rest
    sql(sb.toString)
  }

  private def run(st: Statement): DataFrame = st match {
    case sel: SqlSelect =>
      val df = planner.plan(sel)
      sel.into match {
        case Some(t) => val m = df.cache(); registerTable(t, m); m
        case None => df
      }
    case sop: SqlSetOp => planner.planStatement(sop)
    case w: SqlWith => runWith(w)
    case f: FilterStatement => filterDf(f)
    case fs: FilterSelect =>
      val base = fs.from.map(table).getOrElse(emptyDf())
      val ctx = BuildCtx(Some(base.schema), sessionVars.toMap, includer)
      var out = base.filter(ColumnBuilder.build(fs.filter, ctx).cast("boolean"))
      out = out.select(fs.columns.map(c => ColumnBuilder.build(c.expr, ctx).as(c.outputName)): _*)
      fs.limit.map(out.limit).getOrElse(out)
    case ins: SqlInsert => runInsert(ins); emptyOk()
    case up: SqlUpdate => runUpdate(up); emptyOk()
    case up: SqlUpsert => runUpsert(up); emptyOk()
    case mg: SqlMerge => runMerge(mg); emptyOk()
    case del: SqlDelete => runDelete(del); emptyOk()
    case SqlSet(name, v) => setVar(name, literal(v)); emptyOk()
    case SqlUse(_) => emptyOk()
    case show: SqlShow => runShow(show)
    case SqlDescribe(t) => describe(t)
    case SqlExplain(stmt) => stmt match {
      case sel: SqlSelect =>
        val plan = planner.plan(sel).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        spark.createDataFrame(
          java.util.List.of(Row(plan)), StructType(Seq(StructField("plan", StringType))))
      case _ => emptyOk()
    }
    case c: SqlCreate => runCreate(c); emptyOk()
    case SqlDrop(_, name, ifExists) =>
      if (!ifExists && !tables.contains(name.toLowerCase))
        throw new IllegalArgumentException(s"unknown table '$name'")
      dropTable(name); emptyOk()
    case SqlNoop(_) => emptyOk()
    // parity: the reference parses PREPARE but its executor rejects it
    // (exec/executor.go:144-146 ErrNotImplemented)
    case SqlPrepare(_, _) =>
      throw new UnsupportedOperationException("prepared statements not implemented")
  }

  /** Execute a `;`-separated script statement by statement (the
    * reference's multi-statement surface, rel.ParseSqlStatements);
    * returns the LAST statement's result. Session state (SET @vars,
    * USE, DDL) threads through, so
    * `SET @v = "x"; SELECT … WHERE name = @v` works as one call. */
  def sqlScript(text: String): DataFrame = {
    val stmts = SqlParser.parseStatements(text)
    require(stmts.nonEmpty, "empty script")
    stmts.map(run).last
  }

  /** FilterQL match: `FILTER <expr> FROM t` → filtered DataFrame
    * (vm.Matches over a source, vm/filterqlvm.go:75-106). */
  def filterDf(f: FilterStatement): DataFrame = {
    val base = f.from.map(table).getOrElse(
      throw new IllegalArgumentException("FILTER needs FROM <table> in engine context"))
    val ctx = BuildCtx(Some(base.schema), sessionVars.toMap, includer)
    val out = base.filter(ColumnBuilder.build(f.filter, ctx).cast("boolean"))
    f.limit.map(out.limit).getOrElse(out)
  }

  /** Single-row expression evaluation against a literal context — the
    * reference's `vm.Eval(ctx, ast)` embedding surface (vm/vm.go:42-44).
    * Evaluated ON THE DRIVER by [[graft.expr.LocalEval]] (no Spark job —
    * the reference's ~789 ns path, BASELINE.md); expressions using
    * builtins outside LocalEval's subset fall back to a one-row Spark
    * DataFrame. Returns null when the expression can't evaluate
    * (missing field ≈ null semantics, SURVEY §7 divergence note). */
  def eval(exprText: String, row: Map[String, Any]): Any = {
    val node = ExprParser.parse(exprText)
    val resolved = resolveIncludes(node)
    try LocalEval.eval(resolved, row).orNull
    catch { case _: LocalEval.Unsupported => evalViaSpark(resolved, row) }
  }

  private def evalViaSpark(node: Node, row: Map[String, Any]): Any = {
    val fields = row.toSeq.map { case (k, v) => StructField(k, literalType(v)) }
    val df = spark.createDataFrame(
      java.util.List.of(Row(row.values.toSeq: _*)), StructType(fields))
    val ctx = BuildCtx(Some(df.schema), sessionVars.toMap, includer)
    val r = df.select(ColumnBuilder.build(node, ctx).as("r")).head()
    if (r.isNullAt(0)) null else r.get(0)
  }

  /** Parse once, evaluate many — the reference's `expr.MustParse` +
    * `vm.Eval` loop shape (README.md:105-123). The returned closure
    * runs entirely on the driver via LocalEval; rows that hit an
    * unsupported builtin fall back to the one-row Spark path. */
  def compile(exprText: String): Map[String, Any] => Any = {
    val resolved = resolveIncludes(ExprParser.parse(exprText))
    row =>
      try LocalEval.eval(resolved, row).orNull
      catch { case _: LocalEval.Unsupported => evalViaSpark(resolved, row) }
  }

  /** Inline INCLUDE references ahead of evaluation (expr/include.go
    * InlineIncludes ≙) so LocalEval needs no resolver. Depth-capped at
    * [[ColumnBuilder.maxIncludeDepth]] (expr/include.go:14-15
    * `maxIncludeDepth`/`ErrMaxDepth` ≙): two mutually-recursive named
    * filters raise a loud BuildException NAMING the include path instead
    * of a StackOverflowError; a 100-deep acyclic chain still resolves
    * (the reference bound is `depth > maxIncludeDepth`). */
  private def resolveIncludes(n: Node): Node = resolveIncludes(n, Nil)

  private def resolveIncludes(n: Node, path: List[String]): Node = {
    def rec(m: Node): Node = resolveIncludes(m, path)
    n match {
      case IncludeNode(name, neg) =>
        // `>` not `>=`: the reference accepts a 100-deep acyclic chain
        // (expr/include.go:38 `depth > maxIncludeDepth` ≙), and a deep
        // chain is a depth violation, not necessarily a cycle (r12
        // ADVICE — the old message asserted "cycle path" either way)
        if (path.length > ColumnBuilder.maxIncludeDepth)
          throw BuildException("Recursive Evaluation Error: INCLUDE depth " +
            s"exceeds ${ColumnBuilder.maxIncludeDepth} — include path: " +
            (path.reverse :+ name).mkString(" -> "))
        val inner = includer(name)
          .map(resolveIncludes(_, name :: path))
          .getOrElse(throw BuildException(s"INCLUDE '$name' not resolvable"))
        if (neg) UnaryNode("NOT", inner) else inner
      case BinaryNode(op, l, r, neg) => BinaryNode(op, rec(l), rec(r), neg)
      case BooleanNode(op, args, neg) => BooleanNode(op, args.map(rec), neg)
      case UnaryNode(op, c) => UnaryNode(op, rec(c))
      case TriNode(op, a, b, c, neg) => TriNode(op, rec(a), rec(b), rec(c), neg)
      case FuncNode(name, args) => FuncNode(name, args.map(rec))
      case ArrayNode(items) => ArrayNode(items.map(rec))
      case CaseNode(bs, e) =>
        CaseNode(bs.map { case (c, v) => (rec(c), rec(v)) }, e.map(rec))
      case other => other
    }
  }

  /** Single-row FilterQL match against a literal context (vm.Matches) —
    * driver-side via LocalEval, Spark fallback for exotic builtins. */
  def matches(filterQl: String, row: Map[String, Any]): Boolean = {
    val f = SqlParser.parse(filterQl) match {
      case FilterStatement(n, _, _, _) => n
      case _ => ExprParser.parse(filterQl)
    }
    val resolved = resolveIncludes(f)
    try LocalEval.eval(resolved, row).contains(true)
    catch { case _: LocalEval.Unsupported =>
      val fields = row.toSeq.map { case (k, v) => StructField(k, literalType(v)) }
      val df = spark.createDataFrame(
        java.util.List.of(Row(row.values.toSeq: _*)), StructType(fields))
      val ctx = BuildCtx(Some(df.schema), sessionVars.toMap, includer)
      val res = df.select(coalesce(ColumnBuilder.build(resolved, ctx).cast(BooleanType), lit(false))).head()
      res.getBoolean(0)
    }
  }

  /** Single-row SELECT evaluation against a literal context — the
    * reference's SQL-VM (vm/sqlvm.go: a SqlSelect projected over one
    * ContextReader). Driver-side via [[graft.expr.LocalEval]], Spark
    * fallback per expression.
    *
    * Reference semantics preserved: a WHERE that is not TRUE yields an
    * empty result; a column guard (`col IF boolexpr`) must evaluate to
    * boolean true or the COLUMN is omitted (a non-boolean guard value
    * omits, vm/sqlvm_test.go `str5 IF toint(str5)`); a column whose
    * expression cannot evaluate (missing field, failed coercion) is
    * omitted. Divergence (README #1): the reference distinguishes
    * filtered (empty) from could-not-evaluate (nil) WHEREs; here both
    * are the empty map. */
  def sqlEval(sqlText: String, row: Map[String, Any]): Map[String, Any] = {
    val sel = SqlParser.parse(sqlText) match {
      case s: SqlSelect => s
      case _ => throw new IllegalArgumentException("sqlEval requires a SELECT statement")
    }
    def ev(n: Node): Option[Any] = {
      val r = resolveIncludes(n)
      (try LocalEval.eval(r, row)
       catch { case _: LocalEval.Unsupported => Option(evalViaSpark(r, row)) })
        .filter(_ != null)
    }
    def evSafe(n: Node): Option[Any] =
      try ev(n) catch { case scala.util.control.NonFatal(_) => None }
    val pass = sel.where.forall(w => evSafe(w).contains(true))
    if (!pass) Map.empty
    else sel.columns.flatMap { c =>
      val guardOk = c.guard.forall(g => evSafe(g).contains(true))
      if (!guardOk) None
      else evSafe(c.expr).map(v => c.outputName -> v)
    }.toMap
  }

  /** Datemath boundary of a filter over a literal context — the next
    * instant the filter's truth value may flip
    * (/root/reference/vm/datemath.go DateConverter ≙). */
  def dateBoundary(filterText: String, row: Map[String, Any]): DateMath.BoundaryResult = {
    val f = SqlParser.parse(filterText) match {
      case FilterStatement(n, _, _, _) => n
      case _ => ExprParser.parse(filterText)
    }
    DateMath.boundary(resolveIncludes(f), row)
  }

  // ---- DML on in-mem mutable tables (exec/mutations.go ≙) -------------

  private def runInsert(ins: SqlInsert): Unit = {
    val target = table(ins.table)
    val newRows = ins.select match {
      case Some(sel) => planner.plan(sel).toDF(ins.columns: _*)
      case None => rowsDf(ins.columns, ins.values, target.schema)
    }
    val aligned = alignTo(newRows, target.schema)
    registerTable(ins.table, target.unionByName(aligned, allowMissingColumns = true))
  }

  private def runUpdate(up: SqlUpdate): Unit = {
    val target = table(up.table)
    if (up.where.exists(containsSubquery) ||
        up.set.exists(p => containsSubquery(p._2))) {
      // subquery WHERE: membership flag from the planner-evaluated
      // victim set (whereVictims), SETs apply where the flag holds.
      // SET-position subqueries (r12): each value plans as
      // `SELECT __rid, <expr>` over the rid-stamped target — the
      // planner's expression-position machinery (scalar substitution,
      // aggregate LATERAL, boolean attach) covers correlated and
      // uncorrelated forms with one value per row, and the rid join
      // carries it back without disturbing cardinality
      val (victims, idDf) = up.where match {
        case Some(w) => whereVictims(up.table, target, w)
        case None =>
          val d = target.withColumn("__rid", monotonically_increasing_id()).cache()
          (d.select("__rid"), d)
      }
      val marked = idDf.join(
        victims.withColumn("__hit", lit(1)), Seq("__rid"), "left")
      val cond = col("__hit").isNotNull
      val ctx = BuildCtx(Some(target.schema), sessionVars.toMap, includer)
      var out = marked
      for ((name, vNode) <- up.set) {
        val orig = target.schema.fields.find(_.name.equalsIgnoreCase(name))
        if (containsSubquery(vNode)) {
          val lookup: String => DataFrame = n =>
            if (n.equalsIgnoreCase(up.table)) idDf else table(n)
          val valDf = new Planner(lookup, sessionVars.toMap, includer).plan(SqlSelect(
            columns = Seq(SelectColumn(IdentityNode(Seq("__rid")), None, None),
              SelectColumn(vNode, Some("__setv"), None)),
            from = Seq(TableSource(up.table, None))))
          out = out.join(valDf, Seq("__rid"), "left")
          val typed = orig.map(f => col("__setv").cast(f.dataType))
            .getOrElse(col("__setv"))
          out = out.withColumn(name, when(cond, typed).otherwise(col(name)))
            .drop("__setv")
        } else {
          val v = ColumnBuilder.build(vNode, ctx)
          val typed = orig.map(f => v.cast(f.dataType)).getOrElse(v)
          out = out.withColumn(name, when(cond, typed).otherwise(col(name)))
        }
      }
      registerTable(up.table, out.drop("__rid", "__hit").cache())
      return
    }
    val ctx = BuildCtx(Some(target.schema), sessionVars.toMap, includer)
    val cond = up.where.map(w => ColumnBuilder.build(w, ctx).cast(BooleanType)).getOrElse(lit(true))
    var out = target
    for ((name, vNode) <- up.set) {
      val v = ColumnBuilder.build(vNode, ctx)
      val orig = target.schema.fields.find(_.name.equalsIgnoreCase(name))
      val typed = orig.map(f => v.cast(f.dataType)).getOrElse(v)
      out = out.withColumn(name, when(cond, typed).otherwise(col(name)))
    }
    registerTable(up.table, out.cache())
  }

  private def runUpsert(up: SqlUpsert): Unit = {
    // keyed replace-or-insert on the first column (reference upserts by
    // table key — schema/datasource.go ConnUpsert)
    val target = table(up.table)
    if (up.values.nonEmpty) {
      val newRows = alignTo(rowsDf(up.columns, up.values, target.schema), target.schema)
      val keyCol = up.columns.headOption.getOrElse(target.columns.head)
      val kept = target.join(newRows.select(col(keyCol).as("__k")),
        col(keyCol) === col("__k"), "left_anti")
      registerTable(up.table, kept.unionByName(newRows, allowMissingColumns = true).cache())
    }
  }

  /** MERGE INTO (beyond ref — the set-based CDC upsert): ONE left join
    * decides the fate of every target row (first matching WHEN wins),
    * ONE anti join derives the inserts — no driver loop anywhere; the
    * source is a table, subquery, or inline VALUES and stays
    * broadcast-eligible (at 100 TB the target is the big side, the
    * delta the small one). A target row matching multiple source rows
    * raises, per standard MERGE ambiguity semantics — checked with one
    * bounded count aggregate over matched pairs. Source columns are
    * prefix-renamed before the join so the (usually identical) column
    * names of the two sides never collide; expressions resolve
    * alias-qualified or bare (target first, then source). */
  private def runMerge(m: SqlMerge): Unit = {
    val target = table(m.target)
    val tA = m.targetAlias.getOrElse(m.target)
    val src0 = planner.planFromSource(m.source)
    val sA = m.source.aliasName
    val srcR = src0.select(
      src0.columns.map(c => col(c).as(s"__s_$c")) :+ lit(1).as("__sid"): _*)
    val tCols = target.columns.toSeq
    def srcCol(c: String): Option[String] =
      src0.columns.find(_.equalsIgnoreCase(c)).map("__s_" + _)
    def tgtCol(c: String): Option[String] =
      target.columns.find(_.equalsIgnoreCase(c))
    /** `srcFirst`: in WHEN NOT MATCHED context the frame is the
      * source-only anti join — target columns do not exist there, so a
      * BARE name shared by both tables (the common CDC case:
      * `INSERT VALUES (sku, amount)`) must resolve to the SOURCE
      * column; everywhere else bare names resolve target-first. */
    def rewriteWith(srcFirst: Boolean)(n: Node): Node = {
      def rewrite(n: Node): Node = n match {
        case IdentityNode(Seq(q, c)) if q.equalsIgnoreCase(sA) =>
          IdentityNode(Seq(srcCol(c).getOrElse(
            throw BuildException(s"MERGE: unknown source column '$c'"))))
        case IdentityNode(Seq(q, c)) if q.equalsIgnoreCase(tA) =>
          IdentityNode(Seq(tgtCol(c).getOrElse(
            throw BuildException(s"MERGE: unknown target column '$c'"))))
        case IdentityNode(Seq(c)) if srcFirst && srcCol(c).isDefined =>
          IdentityNode(Seq(srcCol(c).get))
        case IdentityNode(Seq(c)) if tgtCol(c).isDefined => n
        case IdentityNode(Seq(c)) if srcCol(c).isDefined =>
          IdentityNode(Seq(srcCol(c).get))
        case BinaryNode(op, l, r, neg) => BinaryNode(op, rewrite(l), rewrite(r), neg)
        case BooleanNode(op, args, neg) => BooleanNode(op, args.map(rewrite), neg)
        case UnaryNode(op, c) => UnaryNode(op, rewrite(c))
        case TriNode(op, a, b, c, neg) =>
          TriNode(op, rewrite(a), rewrite(b), rewrite(c), neg)
        case FuncNode(name, args) => FuncNode(name, args.map(rewrite))
        case CaseNode(bs, e) =>
          CaseNode(bs.map { case (w, t) => (rewrite(w), rewrite(t)) }, e.map(rewrite))
        case other => other
      }
      rewrite(n)
    }
    def rewrite(n: Node): Node = rewriteWith(srcFirst = false)(n)
    val tgt = target.withColumn("__tid", monotonically_increasing_id())
    val joinedCtx = BuildCtx(
      Some(StructType(tgt.schema.fields ++ srcR.schema.fields)),
      sessionVars.toMap, includer)
    def cb(n: Node): Column = ColumnBuilder.build(rewrite(n), joinedCtx)
    val cond = cb(m.on).cast(BooleanType)
    val joined = tgt.join(srcR, cond, "left")
    if (joined.filter(col("__sid").isNotNull).groupBy("__tid").count()
        .filter(col("count") > 1).limit(1).count() > 0)
      throw BuildException(
        "MERGE: a target row matches multiple source rows (ambiguous)")
    val matchedWhens = m.whens.filter(_.matched)
    val isMatched = col("__sid").isNotNull
    // 1-based index of the FIRST matching WHEN MATCHED clause, 0 = keep
    val actionIdx = matchedWhens.zipWithIndex.reverse
      .foldLeft(lit(0): Column) { case (els, (w, i)) =>
        val c = w.cond.map(n => cb(n).cast(BooleanType)).getOrElse(lit(true))
        when(isMatched && coalesce(c, lit(false)), lit(i + 1)).otherwise(els)
      }
    var kept = joined.withColumn("__act", actionIdx)
    val deleteIdx = matchedWhens.zipWithIndex.collect {
      case (MergeWhen(_, _, MergeDelete), i) => i + 1 }
    if (deleteIdx.nonEmpty)
      kept = kept.filter(!col("__act").isin(deleteIdx.map(Integer.valueOf): _*))
    val outCols = tCols.map { c =>
      val f = target.schema.fields.find(_.name == c).get
      var e: Column = col(c)
      for ((w, i) <- matchedWhens.zipWithIndex) w.action match {
        case MergeUpdate(set) =>
          set.find(_._1.equalsIgnoreCase(c)).foreach { case (_, vn) =>
            e = when(col("__act") === (i + 1), cb(vn).cast(f.dataType)).otherwise(e)
          }
        case _ =>
      }
      e.as(c)
    }
    val updated = kept.select(outCols: _*)
    val notMatchedWhens = m.whens.filter(!_.matched)
    val inserts =
      if (notMatchedWhens.isEmpty) None
      else {
        val srcOnly = srcR.join(tgt, cond, "left_anti")
        val srcCtx = BuildCtx(Some(srcOnly.schema), sessionVars.toMap, includer)
        def sb(n: Node): Column =
          ColumnBuilder.build(rewriteWith(srcFirst = true)(n), srcCtx)
        val insIdx = notMatchedWhens.zipWithIndex.reverse
          .foldLeft(lit(0): Column) { case (els, (w, i)) =>
            val c = w.cond.map(n => sb(n).cast(BooleanType)).getOrElse(lit(true))
            when(coalesce(c, lit(false)), lit(i + 1)).otherwise(els)
          }
        val withI = srcOnly.withColumn("__ins", insIdx).filter(col("__ins") > 0)
        val frames = notMatchedWhens.zipWithIndex.collect {
          case (MergeWhen(_, _, MergeInsert(cols0, vals)), i) =>
            val cols = if (cols0.nonEmpty) cols0 else tCols
            if (cols.length != vals.length)
              throw BuildException(s"MERGE INSERT provides ${vals.length} " +
                s"values for ${cols.length} columns")
            val proj = tCols.map { tc =>
              val f = target.schema.fields.find(_.name == tc).get
              cols.indexWhere(_.equalsIgnoreCase(tc)) match {
                case -1 => lit(null).cast(f.dataType).as(tc)
                case j => sb(vals(j)).cast(f.dataType).as(tc)
              }
            }
            withI.filter(col("__ins") === (i + 1)).select(proj: _*)
        }
        frames.reduceOption(_.union(_))
      }
    registerTable(m.target, inserts.map(updated.union).getOrElse(updated).cache())
  }

  /** Does a predicate contain a subquery anywhere? DML WHEREs with one
    * route through the planner's full WHERE machinery (below). */
  private def containsSubquery(n: Node): Boolean = n match {
    case _: SubqueryNode => true
    case BinaryNode(_, l, r, _) => containsSubquery(l) || containsSubquery(r)
    case BooleanNode(_, args, _) => args.exists(containsSubquery)
    case UnaryNode(_, c) => containsSubquery(c)
    case TriNode(_, a, b, c, _) =>
      containsSubquery(a) || containsSubquery(b) || containsSubquery(c)
    case FuncNode(_, args) => args.exists(containsSubquery)
    case CaseNode(bs, e) =>
      bs.exists { case (w, t) => containsSubquery(w) || containsSubquery(t) } ||
        e.exists(containsSubquery)
    case ArrayNode(items) => items.exists(containsSubquery)
    case _ => false
  }

  /** The `__rid` rows of `target` matching a DML WHERE that uses
    * subqueries (IN/EXISTS/quantified/scalar — beyond ref, the
    * `DELETE … WHERE k IN (SELECT …)` CDC shape): plan
    * `SELECT __rid FROM <t> WHERE <where>` through the SELECT planner
    * over a row-id'd view — every subquery feature the SELECT path has
    * works in DML for free. The id'd frame is cache-pinned so the two
    * reads (victim scan + join-back) see identical ids. Returns
    * (victims, idDf). */
  private def whereVictims(tableName: String, target: DataFrame,
      where: Node): (DataFrame, DataFrame) = {
    val idDf = target.withColumn("__rid", monotonically_increasing_id()).cache()
    val lookup: String => DataFrame = n =>
      if (n.equalsIgnoreCase(tableName)) idDf else table(n)
    val victims = new Planner(lookup, sessionVars.toMap, includer).plan(SqlSelect(
      columns = Seq(SelectColumn(IdentityNode(Seq("__rid")), None, None)),
      from = Seq(TableSource(tableName, None)),
      where = Some(where)))
      .distinct() // a WHERE row matches at most once, whatever joins planned it
    (victims, idDf)
  }

  private def runDelete(del: SqlDelete): Unit = {
    val target = table(del.table)
    if (del.where.exists(containsSubquery)) {
      val (victims0, idDf) = whereVictims(del.table, target, del.where.get)
      val victims = del.limit.map(victims0.limit).getOrElse(victims0)
      registerTable(del.table,
        idDf.join(victims, Seq("__rid"), "left_anti").drop("__rid").cache())
      return
    }
    val ctx = BuildCtx(Some(target.schema), sessionVars.toMap, includer)
    val cond = del.where.map(w => ColumnBuilder.build(w, ctx).cast(BooleanType)).getOrElse(lit(true))
    del.limit match {
      case Some(n) =>
        // DELETE … LIMIT n removes at most n matching rows in scan order
        // (exec/mutations.go DeletionScanner honors Limit)
        val withId = target.withColumn("__rid", monotonically_increasing_id())
        val victims = withId.filter(coalesce(cond, lit(false))).limit(n).select("__rid")
        registerTable(del.table,
          withId.join(victims, Seq("__rid"), "left_anti").drop("__rid").cache())
      case None =>
        registerTable(del.table, target.filter(!coalesce(cond, lit(false))).cache())
    }
  }

  private def rowsDf(cols: Seq[String], values: Seq[Seq[Node]], target: StructType): DataFrame = {
    val names = if (cols.nonEmpty) cols else target.fieldNames.toSeq
    val rows = values.map(vs => Row(vs.map(literal): _*))
    val fields = names.zipWithIndex.map { case (n, i) =>
      val dt = target.fields.find(_.name.equalsIgnoreCase(n)).map(_.dataType)
        .getOrElse(literalType(values.head(i) match { case v => literal(v) }))
      StructField(n, dt)
    }
    // build with inferred literal types then cast to target
    val litFields = names.zipWithIndex.map { case (n, i) =>
      StructField(n, literalType(literal(values.head(i))))
    }
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), StructType(litFields))
    df.select(fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  private def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.map(_.toLowerCase).toSet
    val cols = target.fields.toSeq.map { f =>
      if (present.contains(f.name.toLowerCase)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }

  // ---- SHOW / DESCRIBE as DataFrames (plan/sql_rewrite.go ≙) ----------

  /** Apply SHOW's optional `LIKE 'glob'` (against `keyCol`) and
    * `WHERE expr` filters — every SHOW form is filterable, mirroring the
    * reference's rewrite-to-SELECT scheme (plan/sql_rewrite.go:49-245). */
  private def applyLikeWhere(df0: DataFrame, keyCol: String, s: SqlShow): DataFrame = {
    var df = df0
    s.like.foreach(p => df = df.filter(regexp_like(col(keyCol),
      lit(ColumnBuilder.globToRegex(p)))))
    s.where.foreach { w =>
      val ctx = BuildCtx(Some(df.schema), sessionVars.toMap, includer)
      df = df.filter(ColumnBuilder.build(w, ctx).cast(BooleanType))
    }
    df
  }

  private def runShow(s: SqlShow): DataFrame = s.kind match {
    case "TABLES" =>
      val df =
        if (s.full) // SHOW FULL TABLES → (Table, Table_Type) (schema.go:33)
          spark.createDataFrame(
            java.util.Arrays.asList(tableNames.map(t => Row(t, "BASE TABLE")): _*),
            StructType(Seq(StructField("Table", StringType), StructField("Table_Type", StringType))))
        else seqDf("Table", tableNames)
      applyLikeWhere(df, "Table", s)
    case "DATABASES" => applyLikeWhere(seqDf("Database", Seq("default")), "Database", s)
    case "VARIABLES" | "GLOBAL VARIABLES" | "SESSION VARIABLES" =>
      val rows = sessionVars.toSeq.sortBy(_._1).map { case (k, v) => Row(k, String.valueOf(v)) }
      val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("Variable_name", StringType), StructField("Value", StringType))))
      applyLikeWhere(df, "Variable_name", s)
    case "COLUMNS" =>
      val t = s.target.getOrElse(throw new IllegalArgumentException("SHOW COLUMNS needs FROM <table>"))
      applyLikeWhere(describeDf(t, full = s.full), "Field", s)
    case "CREATE" =>
      val t = s.target.get
      val ddl = table(t).schema.fields
        .map(f => s"  `${f.name}` ${f.dataType.sql}").mkString(s"CREATE TABLE `$t` (\n", ",\n", "\n)")
      spark.createDataFrame(java.util.List.of(Row(t, ddl)),
        StructType(Seq(StructField("Table", StringType), StructField("Create Table", StringType))))
    case "INDEX" | "KEYS" | "INDEXES" =>
      // accept-and-empty: no secondary indexes in this engine
      spark.createDataFrame(java.util.List.of[Row](),
        StructType(Seq(StructField("Table", StringType), StructField("Key_name", StringType))))
    case other => throw new IllegalArgumentException(s"SHOW $other not supported")
  }

  private def describe(t: String): DataFrame = describeDf(t, full = false)

  /** MySQL-shaped DESCRIBE: (Field, Type, Null, Key, Default, Extra) —
    * schema.DescribeCols (/root/reference/schema/schema.go:31); FULL adds
    * Collation/Privileges/Comment (DescribeFullCols, schema.go:29). */
  private def describeDf(t: String, full: Boolean): DataFrame = {
    val fields = table(t).schema.fields.toSeq
    if (full) {
      val rows = fields.map(f => Row(f.name, f.dataType.sql.toLowerCase, null,
        if (f.nullable) "YES" else "NO", "", null, "", "select", ""))
      spark.createDataFrame(java.util.Arrays.asList(rows: _*),
        StructType(Seq("Field", "Type", "Collation", "Null", "Key", "Default",
          "Extra", "Privileges", "Comment").map(StructField(_, StringType))))
    } else {
      val rows = fields.map(f => Row(f.name, f.dataType.sql.toLowerCase,
        if (f.nullable) "YES" else "NO", "", null, ""))
      spark.createDataFrame(java.util.Arrays.asList(rows: _*),
        StructType(Seq("Field", "Type", "Null", "Key", "Default", "Extra")
          .map(StructField(_, StringType))))
    }
  }

  private def runCreate(c: SqlCreate): Unit = c.kind match {
    case "SOURCE" | "SCHEMA" =>
      // CREATE SOURCE name WITH {"type":"csv","path":"..."} (exec/ddl.go:21-160)
      val conf = c.withJson.getOrElse("{}")
      val get = (k: String) =>
        s""""$k"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(conf).map(_.group(1))
      (get("type"), get("path")) match {
        case (Some("csv"), Some(p)) => registerCsv(c.name, p)
        case (Some("json"), Some(p)) => registerJson(c.name, p)
        case (Some("parquet"), Some(p)) => registerParquet(c.name, p)
        // columnar formats Spark ships natively (beyond the reference's
        // csv/json datasources) — lazy like the others, so pushdown and
        // pruning reach the scan
        case (Some("orc"), Some(p)) => registerLazy(c.name, () => spark.read.orc(p))
        case _ => // registered empty; becomes usable when a writer fills it
          registerTable(c.name, emptyDf())
      }
    case "TABLE" | "VIEW" | "CONTINUOUSVIEW" =>
      c.select match {
        case Some(sel) => registerTable(c.name, planner.plan(sel).cache())
        case None => registerTable(c.name, emptyDf())
      }
    case other => throw new IllegalArgumentException(s"CREATE $other not supported")
  }

  // ---- small utilities ------------------------------------------------

  private def emptyDf(): DataFrame = spark.range(0).toDF("id")
  private def emptyOk(): DataFrame =
    spark.createDataFrame(java.util.List.of(Row("ok")),
      StructType(Seq(StructField("status", StringType))))
  private def seqDf(colName: String, vals: Seq[String]): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(vals.map(Row(_)): _*),
      StructType(Seq(StructField(colName, StringType))))

  private def literal(n: Node): Any = n match {
    case StringNode(s) => s
    case NumberNode(d, true) => d.toLong
    case NumberNode(d, false) => d
    case BoolNode(b) => b
    case NullNode => null
    case UnaryNode("-", NumberNode(d, true)) => -d.toLong
    case UnaryNode("-", NumberNode(d, false)) => -d
    case other => throw new IllegalArgumentException(s"expected literal, got ${other.text}")
  }

  private def literalType(v: Any): DataType = v match {
    case _: java.lang.Long | _: java.lang.Integer => LongType
    case _: java.lang.Double | _: java.lang.Float => DoubleType
    case _: java.lang.Boolean => BooleanType
    case _: java.sql.Timestamp => TimestampType
    case s: Seq[_] => ArrayType(s.headOption.map(literalType).getOrElse(StringType))
    case m: collection.Map[_, _] =>
      MapType(StringType, m.values.headOption.map(literalType).getOrElse(StringType))
    case _ => StringType
  }
}
