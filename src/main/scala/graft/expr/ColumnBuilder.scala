package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles an expression [[Node]] into an `org.apache.spark.sql.Column`.
  *
  * This replaces the reference's tree-walking row VM
  * (/root/reference/vm/vm.go:42-176) with Catalyst expressions: every
  * qlbridge expression becomes a declarative Column, so the whole thing
  * runs inside whole-stage codegen at full columnar speed — the 100 TB
  * answer to the reference's ~1 µs/row interpreter.
  *
  * Encoded reference semantics (SURVEY §2.8):
  *  - BETWEEN is EXCLUSIVE on both ends (vm.go:868)
  *  - LIKE is glob matching; `%` ≙ `*`, `?` matches one char (vm.go:1113-1126)
  *  - CONTAINS is substring on strings, element-substring on arrays
  *  - IN: scalar∈array-literal, scalar∈array-column, key∈map
  *  - INTERSECTS: arrays overlap
  *  - EXISTS ident: present, non-null — and non-empty for strings
  *    (empty string counts as Nil, value/value.go:510)
  *  - string↔number comparison coerces the string side to double
  *  - time↔string comparison parses datemath ("now-3d") / timestamps,
  *    compares at second granularity (vm.go:1070-1106)
  *  - int/int division stays integral (vm.go:1132-1151); `%` truncates
  *    both operands to long
  */
final case class BuildCtx(
    schema: Option[StructType] = None,
    vars: Map[String, Any] = Map.empty,
    includer: String => Option[Node] = _ => None,
    includePath: List[String] = Nil) {

  def fieldType(path: Seq[String]): Option[DataType] = schema.flatMap { st =>
    st.fields.find(_.name.equalsIgnoreCase(path.mkString("."))) match {
      case Some(f) => Some(f.dataType)
      case None =>
        st.fields.find(_.name.equalsIgnoreCase(path.head)).map { f =>
          if (path.length == 1) f.dataType
          else f.dataType match {
            case MapType(_, vt, _) => vt
            case s: StructType =>
              s.fields.find(_.name.equalsIgnoreCase(path.tail.mkString("."))).map(_.dataType)
                .getOrElse(StringType)
            case dt => dt
          }
        }
    }
  }
}

object ColumnBuilder {

  def build(node: Node, ctx: BuildCtx = BuildCtx()): Column = node match {
    case w: WindowNode       => window(w, ctx)
    case CaseNode(branches, els) =>
      val first = when(build(branches.head._1, ctx).cast(BooleanType),
        build(branches.head._2, ctx))
      val chained = branches.tail.foldLeft(first) { case (acc, (c, v)) =>
        acc.when(build(c, ctx).cast(BooleanType), build(v, ctx)) }
      els.map(e => chained.otherwise(build(e, ctx))).getOrElse(chained)
    case IdentityNode(parts) => identity(parts, ctx)
    case StringNode(v)       => lit(v)
    case NumberNode(d, isInt) => if (isInt) lit(d.toLong) else lit(d)
    case BoolNode(v)         => lit(v)
    case NullNode            => lit(null)
    case ArrayNode(items) =>
      // literal lists mixing STRING and non-string elements (["a", 3,
      // 4.5] — the reference's SliceValue) become array<string>; ANSI
      // would otherwise pick a numeric common type and error casting
      // the strings. Purely-numeric mixes ([3, 4.5]) keep Spark's
      // native widening (array<double>).
      val ts = items.map(typeOf(_, ctx))
      val mixedWithString =
        ts.distinct.size > 1 && ts.exists(_.contains(StringType))
      if (mixedWithString) array(items.map(build(_, ctx).cast(StringType)): _*)
      else array(items.map(build(_, ctx)): _*)
    case b: BinaryNode       => binary(b, ctx)
    case BooleanNode(op, args, neg) =>
      val cols = args.map(a => build(a, ctx).cast(BooleanType))
      val combined = if (op == "AND") cols.reduce(_ && _) else cols.reduce(_ || _)
      if (neg) !combined else combined
    case UnaryNode(op, child) => op match {
      case "!" | "NOT" => !build(child, ctx).cast(BooleanType)
      case "-"         => negate(build(child, ctx))
      case "EXISTS"    => existsCol(child, ctx)
    }
    case TriNode("BETWEEN", a, lo, hi, neg) =>
      val c = betweenExclusive(a, lo, hi, ctx)
      if (neg) !c else c
    case t: TriNode => throw BuildException(s"unsupported ternary op ${t.op}")
    case FuncNode(name, args) => FuncRegistry.build(name, args, ctx)
    case s: SubqueryNode =>
      // every supported position lowers subqueries BEFORE column
      // building (split conjuncts, literal substitution, or the
      // hidden-column attach) — reaching here means an unsupported
      // position like a GROUP BY key
      throw BuildException(
        "subquery expressions are supported in WHERE/HAVING, the SELECT " +
          "list, and UPDATE SET — not in this position")
    case IncludeNode(name, neg) =>
      // depth-capped like the driver-side inliner (reference
      // expr/include.go:14-15 maxIncludeDepth/ErrMaxDepth ≙): a cyclic
      // named-filter graph raises naming the include path, never a
      // StackOverflowError. The bound is `>` (expr/include.go:38
      // `depth > maxIncludeDepth` ≙) so a legal 100-deep ACYCLIC chain
      // still resolves; the message states a depth limit — a deep
      // chain is not necessarily a cycle (r12 ADVICE).
      if (ctx.includePath.length > maxIncludeDepth)
        throw BuildException("Recursive Evaluation Error: INCLUDE depth " +
          s"exceeds $maxIncludeDepth — include path: " +
          (ctx.includePath.reverse :+ name).mkString(" -> "))
      ctx.includer(name) match {
        case Some(n) =>
          val c = build(n, ctx.copy(includePath = name :: ctx.includePath))
            .cast(BooleanType)
          if (neg) !c else c
        case None => throw BuildException(s"INCLUDE '$name' not resolvable")
      }
  }

  /** Max INCLUDE inlining depth (expr/include.go:14 `maxIncludeDepth` ≙). */
  val maxIncludeDepth = 100

  // ---- identities ----------------------------------------------------

  /** `func(args) OVER (PARTITION BY … ORDER BY …)` onto Spark's Window
    * operator. Ranking/offset functions map by name; the agg trio (+
    * min/max/count) become running aggregates under Spark's default
    * frame. Anything else is an analysis-time error — silently treating
    * an unknown name as a scalar would drop the OVER. */
  private def window(w: WindowNode, ctx: BuildCtx): Column = {
    import org.apache.spark.sql.expressions.Window
    if (w.ref.isDefined)
      throw BuildException(s"unresolved named window '${w.ref.get}' — " +
        "OVER <name> requires a WINDOW clause definition in the same SELECT")
    val base = Window.partitionBy(w.partitionBy.map(build(_, ctx)): _*)
    val ordered =
      if (w.orderBy.isEmpty) base
      else base.orderBy(w.orderBy.map { case (n, asc) =>
        val c = build(n, ctx); if (asc) c.asc else c.desc }: _*)
    // frame clause: aggregate window functions only — ranking/offset
    // functions define their own frame and must refuse one loudly
    // (matching Spark SQL's own analyzer rule)
    val aggWindowFns = Set("sum", "avg", "min", "max", "count")
    val spec = w.frame match {
      case None => ordered
      case Some((unit, s, e)) =>
        if (!aggWindowFns.contains(w.func.name.toLowerCase))
          throw new IllegalArgumentException(
            s"${w.func.name} does not accept a frame clause")
        if (unit == "ROWS") ordered.rowsBetween(s, e)
        else ordered.rangeBetween(s, e)
    }
    val f = w.func
    def arg0: Column = build(f.args.head, ctx)
    def offsetArg: Int = f.args.lift(1) match {
      case Some(NumberNode(d, true)) => d.toInt
      case None => 1
      case Some(other) => throw new IllegalArgumentException(
        s"${f.name} offset must be an integer literal, got: ${other.text}")
    }
    val name = f.name.toLowerCase
    val fn = name match {
      case "row_number" => row_number()
      case "rank" => rank()
      case "dense_rank" => dense_rank()
      case "percent_rank" => percent_rank()
      case "ntile" => f.args.head match {
        case NumberNode(d, true) => ntile(d.toInt)
        case other => throw new IllegalArgumentException(
          s"ntile needs an integer literal, got: ${other.text}")
      }
      case "lag" => lag(arg0, offsetArg)
      case "lead" => lead(arg0, offsetArg)
      case "sum" => sum(arg0)
      case "avg" => avg(arg0)
      case "min" => min(arg0)
      case "max" => max(arg0)
      case "count" => f.args.headOption match {
        case None | Some(IdentityNode(Seq("*"))) => count(lit(1))
        case Some(a) => count(build(a, ctx))
      }
      case other => throw new IllegalArgumentException(
        s"unsupported window function: $other")
    }
    val out = fn.over(spec)
    // ranking functions cast to long AFTER the window applies: Spark
    // returns int32 where every other engine (and this dialect's
    // count()) speaks int64
    if (Set("row_number", "rank", "dense_rank", "ntile")(name))
      out.cast(LongType)
    else out
  }

  private def identity(parts: Seq[String], ctx: BuildCtx): Column = {
    val name = parts.mkString(".")
    if (name == "*") return col("*")
    if (name.startsWith("@")) { // session/global variable
      val key = name.stripPrefix("@@").stripPrefix("@")
      return ctx.vars.get(key).orElse(ctx.vars.get(name)) match {
        case Some(v) => lit(v)
        case None    => lit(null)
      }
    }
    ctx.schema match {
      case Some(st) =>
        if (st.fieldNames.exists(_.equalsIgnoreCase(name))) col(name)
        else if (parts.length > 1 && st.fieldNames.exists(_.equalsIgnoreCase(parts.head))) {
          // map/struct traversal: mt.event0 → col("mt")("event0")
          val base = st.fields.find(_.name.equalsIgnoreCase(parts.head)).get
          base.dataType match {
            case _: MapType | _: StructType => col(parts.head).getItem(parts.tail.mkString("."))
            case _ => col(parts.last) // table.column with single-df context
          }
        } else col(name)  // qualified t.col (Spark resolves via alias) or unknown-column error
      case None => col(name)
    }
  }

  // ---- operators -----------------------------------------------------

  private val arithOps = Set("+", "-", "*", "/", "%")
  private val cmpOps = Set("=", "==", "!=", "<>", ">", ">=", "<", "<=")

  private def binary(b: BinaryNode, ctx: BuildCtx): Column = {
    val BinaryNode(op, ln, rn, neg) = b
    def l = build(ln, ctx)
    def r = build(rn, ctx)
    // number-vs-array: the reference compares the scalar against each
    // element numerically for ANY operator reaching the number path —
    // even `5.5 + ["hello"]` evaluates to a bool (vm.go:398-417)
    if (arithOps.contains(op) || cmpOps.contains(op)) {
      (typeOf(ln, ctx), typeOf(rn, ctx)) match {
        case (Some(t), Some(ArrayType(_, _))) if numeric(t) =>
          val anyEq = coalesce(
            exists(r, e => e.try_cast(DoubleType) === l.try_cast(DoubleType)), lit(false))
          return if (neg) !anyEq else anyEq
        case _ =>
      }
    }
    val c: Column = op match {
      case "+" =>
        (typeOf(ln, ctx), typeOf(rn, ctx)) match {
          // string + string concatenates; string + number coerces numeric
          case (Some(StringType), Some(StringType)) => concat(l, r)
          case (Some(StringType), Some(t)) if t.isInstanceOf[NumericType] =>
            l.try_cast(DoubleType) + r // unparseable string → null, not ANSI error
          case (Some(t), Some(StringType)) if t.isInstanceOf[NumericType] =>
            l + r.try_cast(DoubleType)
          case _ => l + r
        }
      case "-" => l - r
      case "*" => l * r
      case "/" =>
        (typeOf(ln, ctx), typeOf(rn, ctx)) match {
          // int / int stays integral (vm.go:1132-1151)
          case (Some(t1), Some(t2)) if integral(t1) && integral(t2) => try_divide(l, r).cast(LongType)
          case _ => l / r
        }
      case "%" => l.cast(LongType) % r.cast(LongType)
      case o if cmpOps.contains(o) => compare(o, ln, rn, ctx)
      case "LIKE"       => likeGlob(ln, rn, ctx)
      case "ILIKE"      => likeGlob(ln, rn, ctx, ci = true)
      case "CONTAINS"   => containsOp(ln, rn, ctx)
      case "IN"         => inOp(ln, rn, ctx)
      case "INTERSECTS" => arrays_overlap(l, r)
      case "IS"         => l.isNull // IS NULL; negated handled below
      // IS [NOT] DISTINCT FROM — null-safe equality through the SAME
      // coercion matrix as `=` (string↔number, datemath), not a raw
      // <=>: two missing values are NOT distinct, one missing is, and
      // both-present compares exactly like the plain equality
      case "ISDISTINCT" =>
        when(l.isNull && r.isNull, lit(false))
          .when(l.isNull || r.isNull, lit(true))
          .otherwise(!compare("==", ln, rn, ctx))
      case other        => throw BuildException(s"unsupported binary op $other")
    }
    if (neg) {
      if (op == "IS") build(ln, ctx).isNotNull
      // NOT IN with an unevaluable side is TRUE in the reference
      // (vm_test.go: `userid NOT IN ("abc")` with missing userid)
      else if (op == "IN") !coalesce(c, lit(false))
      else !c
    } else if (op == "IN") coalesce(c, lit(false))
    else c
  }

  /** Comparison with the reference's coercion matrix (vm.go:299-775). */
  private def compare(op: String, ln: Node, rn: Node, ctx: BuildCtx): Column = {
    // reference idiom: `x != NULL` ≙ IS NOT NULL, `x == NULL` ≙ IS NULL
    (ln, rn) match {
      case (_, NullNode) =>
        val l0 = build(ln, ctx)
        return if (op == "!=" || op == "<>") l0.isNotNull else l0.isNull
      case (NullNode, _) =>
        val r0 = build(rn, ctx)
        return if (op == "!=" || op == "<>") r0.isNotNull else r0.isNull
      case _ =>
    }
    val (lt, rt) = (typeOf(ln, ctx), typeOf(rn, ctx))
    def tsSide(t: Option[DataType]) = t.exists(_.isInstanceOf[TimestampType])
    def numSide(t: Option[DataType]) = t.exists(numeric)
    def boolSide(t: Option[DataType]) = t.contains(BooleanType)
    // unparseable coercions yield null (reference: could-not-evaluate),
    // never an ANSI runtime error — hence try_cast throughout
    val (l, r) =
      if (tsSide(lt) || tsSide(rt)) {
        // compare times at Unix seconds (vm.go:1070-1106); strings go
        // through datemath/flexible timestamp parsing
        (toEpochSeconds(ln, ctx), toEpochSeconds(rn, ctx))
      } else if (numSide(lt) && rt.contains(StringType)) {
        (build(ln, ctx).try_cast(DoubleType), build(rn, ctx).try_cast(DoubleType))
      } else if (lt.contains(StringType) && numSide(rt)) {
        (build(ln, ctx).try_cast(DoubleType), build(rn, ctx).try_cast(DoubleType))
      } else if (boolSide(lt) && rt.contains(StringType)) {
        // bool vs string: coerce the string side; non-boolish → null
        (build(ln, ctx), build(rn, ctx).try_cast(BooleanType))
      } else if (lt.contains(StringType) && boolSide(rt)) {
        (build(ln, ctx).try_cast(BooleanType), build(rn, ctx))
      } else (build(ln, ctx), build(rn, ctx))
    op match {
      case "=" | "==" => l === r
      case "!=" | "<>" => l =!= r
      case ">"  => l > r
      case ">=" => l >= r
      case "<"  => l < r
      case "<=" => l <= r
    }
  }

  private def toEpochSeconds(n: Node, ctx: BuildCtx): Column = n match {
    case StringNode(s) if DateMath.isDateMath(s) => unix_timestamp(DateMath.toColumn(s))
    // flexible literal parse: "12/18/2015" etc. (araddon/dateparse shapes)
    case StringNode(s) => unix_timestamp(graft.functions.Builtins.flexibleTs(lit(s)))
    case _ =>
      typeOf(n, ctx) match {
        case Some(_: TimestampType) => unix_timestamp(build(n, ctx))
        case Some(StringType) =>
          val c = build(n, ctx)
          unix_timestamp(coalesce(c.try_cast(TimestampType), DateMath.parseColumn(c)))
        case _ => build(n, ctx).cast(LongType)
      }
  }

  /** Reference LIKE is glob (`*`/`?`), with `%` rewritten to `*`
    * (vm.go:1113-1126). On an array LHS, true if any element matches;
    * on an array RHS, true if any pattern matches (vm.go:1055-1060).
    * An unevaluable side yields false, like the reference's nil path. */
  private def likeGlob(ln: Node, rn: Node, ctx: BuildCtx,
      ci: Boolean = false): Column = {
    val l = build(ln, ctx)
    // ci = ILIKE (case-insensitive — the (?i) regex flag, matching
    // DuckDB/Postgres ILIKE over the same translated pattern)
    val flag = if (ci) "(?i)" else ""
    typeOf(rn, ctx) match {
      case Some(ArrayType(_, _)) =>
        return coalesce(
          exists(build(rn, ctx), p => regexp_like(l.cast(StringType), dynGlobPattern(p, flag))),
          lit(false))
      case Some(MapType(_, _, _)) =>
        throw BuildException("LIKE pattern must be a string or array of patterns")
      case _ =>
    }
    val pat: Column = rn match {
      case StringNode(s) => lit(flag + globToRegex(s))
      case _ => dynGlobPattern(build(rn, ctx), flag) // non-literal pattern: translate per-row
    }
    val c = typeOf(ln, ctx) match {
      case Some(ArrayType(_, _)) => exists(l, e => regexp_like(e.cast(StringType), pat))
      case _ => regexp_like(l.cast(StringType), pat)
    }
    coalesce(c, lit(false))
  }

  /** Column-valued glob → anchored regex (for non-literal patterns). */
  private def dynGlobPattern(r: Column, flag: String = ""): Column =
    concat(lit(flag + "^"), regexp_replace(regexp_replace(regexp_replace(
      r, "([.\\\\+^$\\[\\]{}()|])", "\\\\$1"), "[%*]", ".*"), "\\?", "."), lit("$"))

  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      val c = glob.charAt(i)
      if (c == '\\' && i + 1 < glob.length) {
        // `\*` is a LITERAL star, not a wildcard (mb0/glob escapes)
        val nx = glob.charAt(i + 1)
        if (".\\+^$[]{}()|*?".contains(nx)) sb.append('\\')
        sb.append(nx)
        i += 2
      } else {
        c match {
          case '*' | '%' => sb.append(".*")
          case '?'       => sb.append('.')
          case x if ".\\+^$[]{}()|".contains(x) => sb.append('\\').append(x)
          case x => sb.append(x)
        }
        i += 1
      }
    }
    sb.append('$').toString
  }

  private def containsOp(ln: Node, rn: Node, ctx: BuildCtx): Column = {
    val l = build(ln, ctx); val r = build(rn, ctx)
    val c = (typeOf(ln, ctx), typeOf(rn, ctx)) match {
      // array LHS: any element contains the value (numeric elements
      // compare via their string form — `[1,2,3,5] contains int5`)
      case (Some(ArrayType(_, _)), _) =>
        exists(l, e => e.cast(StringType).contains(r.cast(StringType)))
      // array RHS: any of the values is a substring (vm.go slice rhs)
      case (_, Some(ArrayType(_, _))) =>
        exists(r, p => l.cast(StringType).contains(p.cast(StringType)))
      case _ => l.cast(StringType).contains(r.cast(StringType))
    }
    // unevaluable side ⇒ false, like the reference's nil path
    coalesce(c, lit(false))
  }

  private def inOp(ln: Node, rn: Node, ctx: BuildCtx): Column = {
    val l = build(ln, ctx)
    val lIsMap = typeOf(ln, ctx).exists(_.isInstanceOf[MapType])
    val lIsArray = typeOf(ln, ctx).exists(_.isInstanceOf[ArrayType])
    rn match {
      case ArrayNode(items) if lIsMap =>
        // map IN (v1, v2, …): any of the values is a key
        items.map(it => map_contains_key(l, build(it, ctx)))
          .foldLeft(lit(false))(_ || _)
      case _ if lIsMap =>
        map_contains_key(l, build(rn, ctx))
      case _ if lIsArray =>
        // slice IN slice is a synonym of INTERSECTS (reference #14564,
        // `roles IN ("user","api")`) — string-form overlap like the vm
        arrays_overlap(l.cast(ArrayType(StringType)),
          build(rn, ctx).cast(ArrayType(StringType)))
      case ArrayNode(items) =>
        // mixed-type lists compare per element: numeric LHS coerces each
        // value numerically (non-coercible skipped), string LHS compares
        // by string form (vm.go:370-383, 398-417, 488-496) — `isin`
        // would force one common type and ANSI-error on "a" vs 10;
        // an empty list is simply false (foldLeft, not reduce)
        val lIsNum = typeOf(ln, ctx).exists(numeric)
        items.map { it =>
          val iv = build(it, ctx)
          if (lIsNum) l.try_cast(DoubleType) === iv.try_cast(DoubleType)
          else l.cast(StringType) === iv.cast(StringType)
        }.foldLeft(lit(false))(_ || _)
      case _ =>
        typeOf(rn, ctx) match {
          case Some(ArrayType(_, _))  => array_contains(build(rn, ctx), l)
          case Some(MapType(_, _, _)) => map_contains_key(build(rn, ctx), l)
          // string IN string is plain equality (vm.go:1061-1065)
          case Some(StringType) => l.cast(StringType) === build(rn, ctx)
          case _ => array_contains(build(rn, ctx), l)
        }
    }
  }

  private def betweenExclusive(a: Node, lo: Node, hi: Node, ctx: BuildCtx): Column =
    compare(">", a, lo, ctx) && compare("<", a, hi, ctx)

  /** EXISTS: field present and non-nil; empty string counts as Nil
    * (value/value.go:510). */
  def existsCol(n: Node, ctx: BuildCtx): Column = {
    val c = build(n, ctx)
    typeOf(n, ctx) match {
      case Some(StringType) => c.isNotNull && c =!= ""
      case _ => c.isNotNull
    }
  }

  private def negate(c: Column): Column = -c

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def numeric(t: DataType): Boolean = t match {
    case _: NumericType => true
    case _ => false
  }

  /** Best-effort static type of a node under the build context. */
  def typeOf(n: Node, ctx: BuildCtx): Option[DataType] = n match {
    case _: WindowNode => None
    case CaseNode(branches, _) => typeOf(branches.head._2, ctx)
    case NumberNode(_, isInt) => Some(if (isInt) LongType else DoubleType)
    case StringNode(_) => Some(StringType)
    case BoolNode(_)   => Some(BooleanType)
    case NullNode      => Some(NullType)
    case ArrayNode(items) =>
      items.headOption.flatMap(typeOf(_, ctx)).map(ArrayType(_)).orElse(Some(ArrayType(StringType)))
    case IdentityNode(parts) => ctx.fieldType(parts)
    case BinaryNode(op, l, r, _) if arithOps.contains(op) =>
      (typeOf(l, ctx), typeOf(r, ctx)) match {
        // string + string concatenates → string (chained "a" + b + "c")
        case (Some(StringType), Some(StringType)) if op == "+" => Some(StringType)
        case (Some(StringType), Some(b)) if numeric(b) && op == "+" => Some(DoubleType)
        case (Some(a), Some(StringType)) if numeric(a) && op == "+" => Some(DoubleType)
        case (Some(a), Some(b)) if integral(a) && integral(b) && op != "/" => Some(LongType)
        case (Some(a), Some(b)) if numeric(a) && numeric(b) => Some(DoubleType)
        case _ => None
      }
    case BinaryNode(_, _, _, _) | BooleanNode(_, _, _) | TriNode(_, _, _, _, _) => Some(BooleanType)
    case UnaryNode("-", c) => typeOf(c, ctx)
    case UnaryNode(_, _) => Some(BooleanType)
    case FuncNode(name, args) => FuncRegistry.returnType(name, args, ctx)
    case IncludeNode(_, _) => Some(BooleanType)
  }
}

final case class BuildException(msg: String) extends RuntimeException(msg)
