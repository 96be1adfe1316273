package graft.expr

import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.format.DateTimeFormatter
import scala.util.Try

/** Driver-side tree-walking evaluator for literal contexts — the
  * Spark-native analog of the reference's `vm.Eval(ctx, ast)` hot path
  * (/root/reference/vm/vm.go:42-176, ~789 ns/op per BASELINE.md).
  *
  * `GraftSession.eval`/`matches` used to run ONE SPARK JOB PER ROW
  * (~10⁸× the reference's embedding cost); this interpreter evaluates
  * the same expression surface in nanoseconds on the driver, falling
  * back to the Spark path only for builtins it does not implement
  * (signalled by [[LocalEval.Unsupported]]).
  *
  * Value model: Long, Double, Boolean, String, java.sql.Timestamp,
  * Seq[Any], Map[String, Any]. `None` = the reference's
  * "could not evaluate" (missing field / failed coercion).
  * Semantics mirror ColumnBuilder: exclusive BETWEEN, glob LIKE,
  * string↔number coercion, time compares at epoch seconds, empty
  * string counts as nil for EXISTS.
  */
object LocalEval {

  final case class Unsupported(what: String) extends RuntimeException(what)

  type Ctx = Map[String, Any]

  def eval(node: Node, ctx: Ctx): Option[Any] = node match {
    case StringNode(s)        => Some(s)
    case NumberNode(d, isInt) => Some(if (isInt) d.toLong else d)
    case BoolNode(b)          => Some(b)
    case NullNode             => None
    case ArrayNode(items)     => Some(items.flatMap(eval(_, ctx)))
    case IdentityNode(parts)  => identity(parts, ctx)
    case b: BinaryNode        => binary(b, ctx)
    case BooleanNode(op, args, neg) =>
      val res = boolNary(op, args, ctx)
      if (neg) res.map(v => !v.asInstanceOf[Boolean]) else res
    case UnaryNode(op, child) => op match {
      case "!" | "NOT" => eval(child, ctx).flatMap(v => asBool(v)).map(!_)
      case "-" => eval(child, ctx).flatMap {
        case l: Long => Some(-l); case d: Double => Some(-d); case _ => None
      }
      case "EXISTS" => Some(exists(child, ctx))
    }
    case TriNode("BETWEEN", a, lo, hi, neg) =>
      val r = for {
        c1 <- compare(">", a, lo, ctx)
        c2 <- compare("<", a, hi, ctx)
      } yield c1 && c2
      if (neg) r.map(!_) else r
    case t: TriNode  => throw Unsupported(s"ternary ${t.op}")
    case f: FuncNode => func(f, ctx)
    case CaseNode(branches, els) =>
      branches.collectFirst {
        case (c, v) if eval(c, ctx).contains(true) => eval(v, ctx)
      }.getOrElse(els.flatMap(e => Some(eval(e, ctx))).getOrElse(None))
    case _: WindowNode   => throw Unsupported("window function") // needs a partition, not a row
    case _: SubqueryNode => throw Unsupported("subquery")
    case _: IncludeNode  => throw Unsupported("INCLUDE") // needs session includer
  }

  // ---- identities -----------------------------------------------------

  private def lookup(ctx: Ctx, name: String): Option[Any] =
    ctx.get(name).orElse(ctx.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }).filter(_ != null)

  private def identity(parts: Seq[String], ctx: Ctx): Option[Any] = {
    val full = parts.mkString(".")
    lookup(ctx, full).orElse {
      if (parts.length > 1) lookup(ctx, parts.head).flatMap {
        case m: collection.Map[_, _] =>
          val mm = m.asInstanceOf[collection.Map[String, Any]]
          val key = parts.tail.mkString(".")
          mm.get(key).orElse(mm.collectFirst {
            case (k, v) if k.equalsIgnoreCase(key) => v
          }).filter(_ != null)
        case _ => None
      } else None
    }
  }

  private def exists(n: Node, ctx: Ctx): Boolean = eval(n, ctx) match {
    case Some(s: String) => s.nonEmpty // empty string counts as nil
    case Some(_) => true
    case None => false
  }

  // ---- coercions ------------------------------------------------------

  private def asNum(v: Any): Option[Double] = v match {
    case l: Long => Some(l.toDouble)
    case d: Double => Some(d)
    case i: Int => Some(i.toDouble)
    case b: Boolean => None
    case s: String => Try(s.toDouble).toOption
    case _ => None
  }
  private def asBool(v: Any): Option[Boolean] = v match {
    case b: Boolean => Some(b)
    case s: String => s.toLowerCase match {
      case "true" | "t" | "1" | "yes" | "y" => Some(true)
      case "false" | "f" | "0" | "no" | "n" => Some(false)
      case _ => None
    }
    case _ => None
  }
  private def asStr(v: Any): String = v match {
    case d: Double => if (d == d.toLong) d.toLong.toString else d.toString
    case other => String.valueOf(other)
  }

  private val flexFormats = Seq(
    "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd", "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy", "dd/MM/yyyy", "yyyy/MM/dd", "MMM d, yyyy", "MMMM d, yyyy")
    .map(DateTimeFormatter.ofPattern)

  /** epoch SECONDS of a time-ish value (vm.go compares times at Unix
    * seconds); datemath strings anchor at `now`. */
  private def asEpochSec(v: Any): Option[Long] = v match {
    case ts: java.sql.Timestamp => Some(ts.getTime / 1000)
    case l: Long => Some(l)
    case d: Double => Some(d.toLong)
    case s: String if DateMath.isDateMath(s) => DateMath.evalMillis(s).map(_ / 1000)
    case s: String =>
      Try(Instant.parse(s)).toOption.map(_.getEpochSecond).orElse {
        flexFormats.view.flatMap { f =>
          Try(java.time.LocalDate.parse(s, f).atStartOfDay(ZoneOffset.UTC).toEpochSecond).toOption
            .orElse(Try(java.time.LocalDateTime.parse(s, f).toEpochSecond(ZoneOffset.UTC)).toOption)
        }.headOption
      }
    case _ => None
  }

  // ---- operators ------------------------------------------------------

  private val cmpOps = Set("=", "==", "!=", "<>", ">", ">=", "<", "<=")

  private def binary(b: BinaryNode, ctx: Ctx): Option[Any] = {
    val BinaryNode(op, ln, rn, neg) = b
    val base: Option[Any] = op match {
      case "IS" => Some(eval(ln, ctx).isEmpty)
      // IS [NOT] DISTINCT FROM: null-safe — two missing values are NOT
      // distinct; one missing is distinct; both present compare equal
      case "ISDISTINCT" =>
        (eval(ln, ctx), eval(rn, ctx)) match {
          case (None, None) => Some(false)
          case (Some(_), None) | (None, Some(_)) => Some(true)
          case _ => compare("==", ln, rn, ctx).map(bo => !bo)
        }
      case o if cmpOps.contains(o) => compare(o, ln, rn, ctx)
      case "+" | "-" | "*" | "/" | "%" => arith(op, ln, rn, ctx)
      case "LIKE" => likeOp(ln, rn, ctx)
      case "ILIKE" => likeOp(ln, rn, ctx, ci = true)
      case "CONTAINS" => containsOp(ln, rn, ctx)
      case "IN" => Some(inOp(ln, rn, ctx).getOrElse(false))
      case "INTERSECTS" =>
        for { l <- eval(ln, ctx); r <- eval(rn, ctx) } yield (l, r) match {
          case (a: Seq[_], b2: Seq[_]) => a.map(asStr).toSet.intersect(b2.map(asStr).toSet).nonEmpty
          // map INTERSECTS slice: any of the values is a key
          case (m: collection.Map[_, _], b2: Seq[_]) =>
            val mm = m.asInstanceOf[collection.Map[String, Any]]
            b2.exists(k => mm.contains(asStr(k)))
          case _ => false
        }
      case other => throw Unsupported(s"binary $other")
    }
    if (neg) base.map {
      case bo: Boolean => !bo
      case v => v
    } else base
  }

  private def arith(op: String, ln: Node, rn: Node, ctx: Ctx): Option[Any] = {
    val lv = eval(ln, ctx); val rv = eval(rn, ctx)
    (lv, rv) match {
      // number-vs-array: any-element numeric equality (vm.go:398-417)
      case (Some(l), Some(arr: Seq[_])) if asNum(l).isDefined =>
        return Some(arr.exists(e => asNum(e).contains(asNum(l).get)))
      case (Some(l: String), Some(r: String)) if op == "+" => return Some(l + r)
      case _ =>
    }
    for {
      l <- lv; r <- rv
      res <- (l, r) match {
        case (a: Long, b: Long) => op match {
          case "+" => Some(a + b)
          case "-" => Some(a - b)
          case "*" => Some(a * b)
          case "/" => if (b == 0) None else Some(a / b) // int-preserving (vm.go:1132-1151)
          case "%" => if (b == 0) None else Some(a % b)
        }
        case _ =>
          for { a <- asNum(l); b <- asNum(r) } yield op match {
            case "+" => a + b
            case "-" => a - b
            case "*" => a * b
            case "/" => a / b
            case "%" => (a.toLong % b.toLong) // % truncates operands (vm.go:976-978)
          }
      }
    } yield res
  }

  private def isTimeish(v: Any): Boolean = v.isInstanceOf[java.sql.Timestamp]
  private def isDateLiteral(n: Node): Boolean = n match {
    case StringNode(s) => DateMath.isDateMath(s)
    case _ => false
  }

  private def compare(op: String, ln: Node, rn: Node, ctx: Ctx): Option[Boolean] = {
    // `x != NULL` / `x == NULL` are null checks
    (ln, rn) match {
      case (_, NullNode) =>
        val e = eval(ln, ctx).isEmpty
        return Some(if (op == "!=" || op == "<>") !e else e)
      case (NullNode, _) =>
        val e = eval(rn, ctx).isEmpty
        return Some(if (op == "!=" || op == "<>") !e else e)
      case _ =>
    }
    val lv = eval(ln, ctx); val rv = eval(rn, ctx)
    (lv, rv) match {
      // missing side: `x != v` is TRUE, every other comparison FALSE
      // (vm.go nil handling: NE → true; EQ/GT/GE/LT/LE/LIKE → false)
      case (None, _) | (_, None) =>
        Some(op == "!=" || op == "<>")
      case (Some(l), Some(arr: Seq[_])) if asNum(l).isDefined => // any-element equality
        Some(arr.exists(e => asNum(e).contains(asNum(l).get)))
      // slice-of-times vs date literal: any element satisfies
      // (`transactions < "now-1h"`); empty slice → false
      case (Some(l: Seq[_]), Some(r)) if isDateLiteral(rn) || isTimeish(r) =>
        asEpochSec(r).map(b =>
          l.exists(el => asEpochSec(el).exists(a => cmpNum(op, a.toDouble, b.toDouble))))
      case (Some(l), Some(r)) if isTimeish(l) || isTimeish(r) ||
          isDateLiteral(ln) || isDateLiteral(rn) =>
        for { a <- asEpochSec(l); b <- asEpochSec(r) } yield cmpNum(op, a.toDouble, b.toDouble)
      case (Some(l: String), Some(r: String)) =>
        Some(op match { // divergence: relational string compares are lexicographic
          case "=" | "==" => l == r
          case "!=" | "<>" => l != r
          case ">" => l > r
          case ">=" => l >= r
          case "<" => l < r
          case "<=" => l <= r
        })
      case (Some(l: Boolean), Some(r)) => asBool(r).map(rb => cmpBool(op, l, rb))
      case (Some(l), Some(r: Boolean)) => asBool(l).map(lb => cmpBool(op, lb, r))
      case (Some(l), Some(r)) =>
        for { a <- asNum(l); b <- asNum(r) } yield cmpNum(op, a, b)
      case _ => None
    }
  }

  private def cmpNum(op: String, a: Double, b: Double): Boolean = op match {
    case "=" | "==" => a == b
    case "!=" | "<>" => a != b
    case ">" => a > b
    case ">=" => a >= b
    case "<" => a < b
    case "<=" => a <= b
  }
  private def cmpBool(op: String, a: Boolean, b: Boolean): Boolean = op match {
    case "=" | "==" => a == b
    case "!=" | "<>" => a != b
    case _ => false
  }

  private def likeOp(ln: Node, rn: Node, ctx: Ctx, ci: Boolean = false): Option[Any] = {
    val l = eval(ln, ctx); val r = eval(rn, ctx)
    def m(v: Any, pat: Any): Boolean =
      asStr(v).matches((if (ci) "(?i)" else "") + ColumnBuilder.globToRegex(asStr(pat)))
    Some((l, r) match {
      case (Some(a: Seq[_]), Some(p)) if !p.isInstanceOf[Seq[_]] => a.exists(m(_, p))
      case (Some(a), Some(ps: Seq[_])) => ps.exists(m(a, _))
      case (Some(a), Some(p)) => m(a, p)
      case _ => false
    })
  }

  private def containsOp(ln: Node, rn: Node, ctx: Ctx): Option[Any] = {
    val l = eval(ln, ctx); val r = eval(rn, ctx)
    Some((l, r) match {
      case (Some(a: Seq[_]), Some(v)) => a.exists(e => asStr(e).contains(asStr(v)))
      case (Some(a), Some(vs: Seq[_])) => vs.exists(v => asStr(a).contains(asStr(v)))
      case (Some(a), Some(v)) => asStr(a).contains(asStr(v))
      case _ => false
    })
  }

  private def inOp(ln: Node, rn: Node, ctx: Ctx): Option[Boolean] = {
    val lv = eval(ln, ctx)
    val rv = eval(rn, ctx)
    for { l <- lv; r <- rv } yield (l, r) match {
      // slice IN slice is a synonym of INTERSECTS (reference #14564)
      case (ls: Seq[_], rs: Seq[_]) =>
        ls.map(asStr).toSet.intersect(rs.map(asStr).toSet).nonEmpty
      // map IN slice/scalar: any of the values is a key
      case (m: collection.Map[_, _], rs: Seq[_]) =>
        val mm = m.asInstanceOf[collection.Map[String, Any]]
        rs.exists(k => mm.contains(asStr(k)))
      case (m: collection.Map[_, _], k) =>
        m.asInstanceOf[collection.Map[String, Any]].contains(asStr(k))
      case (_, m: collection.Map[_, _]) =>
        m.asInstanceOf[collection.Map[String, Any]].contains(asStr(l))
      case (_, arr: Seq[_]) =>
        if (asNum(l).isDefined && !l.isInstanceOf[String])
          arr.exists(e => asNum(e).contains(asNum(l).get))
        else arr.exists(e => asStr(e) == asStr(l))
      case (_, s: String) => asStr(l) == s // string IN string = equality
      case _ => false
    }
  }

  private def boolNary(op: String, args: Seq[Node], ctx: Ctx): Option[Boolean] = {
    val vals = args.map(a => eval(a, ctx).flatMap(asBool))
    if (op == "AND") {
      if (vals.exists(_.contains(false))) Some(false)
      else if (vals.forall(_.contains(true))) Some(true)
      else None // missing operand fails the AND (vm.go:252-274)
    } else {
      if (vals.exists(_.contains(true))) Some(true)
      else Some(false) // missing operand in OR is skipped
    }
  }

  // ---- builtin subset -------------------------------------------------

  private def func(f: FuncNode, ctx: Ctx): Option[Any] = {
    def arg(i: Int): Option[Any] = eval(f.args(i), ctx)
    f.name match {
      case "toint" => arg(0).flatMap(v =>
        Try(asStr(v).replaceAll("[$£€¥,\\s]", "").toDouble.toLong).toOption)
      case "tonumber" => arg(0).flatMap(v =>
        Try(asStr(v).replaceAll("[$£€¥,\\s]", "").toDouble).toOption)
      case "tostring" => arg(0).map(asStr)
      case "tobool" => arg(0).flatMap(asBool)
      case "contains" => Some(
        (for { a <- arg(0); b <- arg(1) } yield asStr(a).contains(asStr(b))).getOrElse(false))
      case "not" => eval(f.args.head, ctx).flatMap(asBool).map(!_)
      case "exists" => Some(exists(f.args.head, ctx))
      case "eq" | "ne" | "gt" | "ge" | "lt" | "le" =>
        val sqlOp = Map("eq" -> "==", "ne" -> "!=", "gt" -> ">", "ge" -> ">=",
          "lt" -> "<", "le" -> "<=")(f.name)
        for { a <- arg(0).flatMap(asNum); b <- arg(1).flatMap(asNum) }
          yield cmpNum(sqlOp, a, b)
      case "oneof" => f.args.view.flatMap(a => eval(a, ctx) match {
        case Some(s: String) if s.isEmpty => None
        case other => other
      }).headOption
      case "any" => Some(f.args.exists(exists(_, ctx)))
      case "all" => Some(f.args.forall(exists(_, ctx)))
      case "len" => arg(0).map {
        case s: String => s.length.toLong
        case a: Seq[_] => a.size.toLong
        case m: collection.Map[_, _] => m.size.toLong
        case _ => 0L
      }
      case "tolower" | "string.lowercase" => arg(0).map(asStr(_).toLowerCase)
      case "string.uppercase" => arg(0).map(asStr(_).toUpperCase)
      case "strip" | "string.strip" => arg(0).map(asStr(_).trim)
      case "split" | "string.split" =>
        for { s <- arg(0); sep <- arg(1) }
          yield asStr(s).split(java.util.regex.Pattern.quote(asStr(sep)))
            .toSeq.filter(_.nonEmpty)
      case "hasprefix" => for { s <- arg(0); p <- arg(1) } yield asStr(s).startsWith(asStr(p))
      case "hassuffix" => for { s <- arg(0); p <- arg(1) } yield asStr(s).endsWith(asStr(p))
      case "replace" =>
        for { s <- arg(0); from <- arg(1) }
          yield asStr(s).replace(asStr(from), f.args.lift(2).flatMap(eval(_, ctx)).map(asStr).getOrElse(""))
      case "char_length" => arg(0).map(asStr(_).length.toLong)
      case "sqrt" => arg(0).flatMap(asNum).map(math.sqrt)
      case "pow" => for { a <- arg(0).flatMap(asNum); b <- arg(1).flatMap(asNum) } yield math.pow(a, b)
      case "now" => Some(new java.sql.Timestamp(System.currentTimeMillis()))
      case "todate" => f.args match {
        case Seq(StringNode(s)) if DateMath.isDateMath(s) =>
          DateMath.evalMillis(s).map(new java.sql.Timestamp(_))
        case _ => arg(0).flatMap(asEpochSec).map(s => new java.sql.Timestamp(s * 1000))
      }
      case "emaildomain" => arg(0).map(asStr).filter(_.contains("@"))
        .map(s => s.substring(s.lastIndexOf('@') + 1).toLowerCase)
      case "email" => arg(0).map(asStr).map { raw =>
        val inner = "<([^>]+)>".r.findFirstMatchIn(raw).map(_.group(1)).getOrElse(raw.trim)
        inner.toLowerCase
      }.filter(_.matches("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$"))
      case other => throw Unsupported(s"builtin $other")
    }
  }
}
