package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Elasticsearch-style datemath ("now-3d", "now+2h/d") as pure Column
  * arithmetic — the reference coerces such strings to times inside
  * comparisons (/root/reference/value/coerce.go:315-331 StringToTimeAnchor,
  * boundary analyzer /root/reference/vm/datemath.go:21-199).
  *
  * Everything here is declarative (make_interval / date_trunc / when
  * chains), so datemath comparisons stay inside whole-stage codegen.
  */
object DateMath {

  private val Full = """^now(([+-]\d+[smhdwMy])*)(/[smhdwMy])?$""".r
  private val Off = """([+-])(\d+)([smhdwMy])""".r

  def isDateMath(s: String): Boolean = Full.matches(s.trim)

  /** Literal datemath → Column anchored at current_timestamp(). */
  def toColumn(s: String): Column = {
    val t = s.trim
    val m = Full.findFirstMatchIn(t).getOrElse(
      throw BuildException(s"invalid datemath '$s'"))
    var c: Column = current_timestamp()
    for (o <- Off.findAllMatchIn(Option(m.group(1)).getOrElse(""))) {
      val n = o.group(2).toInt * (if (o.group(1) == "-") -1 else 1)
      c = c + interval(o.group(3), lit(n))
    }
    Option(m.group(3)).map(_.stripPrefix("/")) match {
      case Some(u) => date_trunc(truncName(u), c)
      case None => c
    }
  }

  /** Runtime string column that may hold datemath or a timestamp text.
    * Handles a single ±N-unit offset (the common reference shape). */
  def parseColumn(c: Column): Column = {
    val isNow = c === "now"
    val sign = when(regexp_extract(c, "^now([+-])", 1) === "-", -1).otherwise(1)
    val n = regexp_extract(c, "^now[+-](\\d+)", 1).cast(IntegerType) * sign
    val unit = regexp_extract(c, "^now[+-]\\d+([smhdwMy])", 1)
    when(isNow, current_timestamp())
      .when(unit =!= "", current_timestamp() + interval0(unit, n))
      .otherwise(c.try_cast(TimestampType)) // unparseable → null, not ANSI error
  }

  private def interval(unit: String, n: Column): Column = unit match {
    case "s" => make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0), n.cast(DecimalType(18, 6)))
    case "m" => make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), n, lit(0))
    case "h" => make_interval(lit(0), lit(0), lit(0), lit(0), n, lit(0), lit(0))
    case "d" => make_interval(lit(0), lit(0), lit(0), n, lit(0), lit(0), lit(0))
    case "w" => make_interval(lit(0), lit(0), n, lit(0), lit(0), lit(0), lit(0))
    case "M" => make_interval(lit(0), n, lit(0), lit(0), lit(0), lit(0), lit(0))
    case "y" => make_interval(n, lit(0), lit(0), lit(0), lit(0), lit(0), lit(0))
    case u => throw BuildException(s"unknown datemath unit '$u'")
  }

  /** interval selected by a runtime unit column. */
  private def interval0(unit: Column, n: Column): Column =
    when(unit === "s", interval("s", n))
      .when(unit === "m", interval("m", n))
      .when(unit === "h", interval("h", n))
      .when(unit === "d", interval("d", n))
      .when(unit === "w", interval("w", n))
      .when(unit === "M", interval("M", n))
      .otherwise(interval("y", n))

  private def truncName(u: String): String = u match {
    case "s" => "second"
    case "m" => "minute"
    case "h" => "hour"
    case "d" => "day"
    case "w" => "week"
    case "M" => "month"
    case "y" => "year"
  }

  // ---- driver-side evaluation + boundary analysis ---------------------

  /** Driver-side datemath evaluation (lytics/datemath EvalAnchor ≙):
    * epoch millis of "now±N[u](/u)" anchored at `nowMs`, UTC. */
  def evalMillis(s: String, nowMs: Long = System.currentTimeMillis()): Option[Long] = {
    val t = s.trim
    Full.findFirstMatchIn(t).map { m =>
      var zdt = java.time.Instant.ofEpochMilli(nowMs).atZone(java.time.ZoneOffset.UTC)
      for (o <- Off.findAllMatchIn(Option(m.group(1)).getOrElse(""))) {
        val n = o.group(2).toLong * (if (o.group(1) == "-") -1 else 1)
        zdt = o.group(3) match {
          case "s" => zdt.plusSeconds(n)
          case "m" => zdt.plusMinutes(n)
          case "h" => zdt.plusHours(n)
          case "d" => zdt.plusDays(n)
          case "w" => zdt.plusWeeks(n)
          case "M" => zdt.plusMonths(n)
          case "y" => zdt.plusYears(n)
        }
      }
      val out = Option(m.group(3)).map(_.stripPrefix("/")) match {
        case Some("s") => zdt.withNano(0)
        case Some("m") => zdt.truncatedTo(java.time.temporal.ChronoUnit.MINUTES)
        case Some("h") => zdt.truncatedTo(java.time.temporal.ChronoUnit.HOURS)
        case Some("d") => zdt.truncatedTo(java.time.temporal.ChronoUnit.DAYS)
        case Some("w") => zdt.truncatedTo(java.time.temporal.ChronoUnit.DAYS)
          .`with`(java.time.temporal.TemporalAdjusters.previousOrSame(java.time.DayOfWeek.MONDAY))
        case Some("M") => zdt.truncatedTo(java.time.temporal.ChronoUnit.DAYS).withDayOfMonth(1)
        case Some("y") => zdt.truncatedTo(java.time.temporal.ChronoUnit.DAYS).withDayOfYear(1)
        case _ => zdt
      }
      out.toInstant.toEpochMilli
    }
  }

  /** Result of [[DateMath.boundary]] — mirrors the reference's
    * DateConverter (/root/reference/vm/datemath.go:21-199). */
  final case class BoundaryResult(
      hasDateMath: Boolean,
      timeStrings: Seq[String],
      /** earliest epoch-millis instant at which the expression's truth
        * value can POSSIBLY flip; None when no boundary exists. */
      boundaryMs: Option[Long])

  /** Inspect a boolean expression for datemath terms and compute the
    * first instant its truth value may flip (re-evaluation scheduling,
    * not windowing — vm/datemath.go:21-115).
    *
    * For `ident <op> "now±N"`: Ct = ident's time, Rt = anchor-evaluated
    * datemath, boundary Bt = now + (Ct − Rt) when the relation can flip;
    * `==`/`!=` never yield boundaries. The string side may be on the
    * left (`"now-1d" > x`) — the comparison is normalized first. */
  def boundary(node: Node, ctx: Map[String, Any],
      nowMs: Long = System.currentTimeMillis()): BoundaryResult = {
    val times = collection.mutable.ArrayBuffer.empty[String]
    var bt: Option[Long] = None
    def addBoundary(ms: Long): Unit =
      bt = Some(bt.fold(ms)(math.min(_, ms)))
    def flip(op: String): String = op match {
      case ">" => "<"; case ">=" => "<="; case "<" => ">"; case "<=" => ">="; case o => o
    }
    def addValue(ctMs: Long, op: String, dm: String): Unit =
      evalMillis(dm, nowMs).foreach { rt =>
        op match {
          case ">" | ">=" => if (rt < ctMs) addBoundary(nowMs + (ctMs - rt))
          case "<" | "<=" => if (ctMs >= rt) addBoundary(nowMs + (ctMs - rt))
          case _ => // ==/!= unsupported for boundaries
        }
      }
    def evalTimeMs(n: Node): Option[Long] =
      LocalEval.eval(n, ctx).flatMap {
        case ts: java.sql.Timestamp => Some(ts.getTime)
        case _ => None
      }
    def walk(n: Node): Unit = n match {
      case BinaryNode(op, l, r, _) =>
        // the reference keys on a bare "now" prefix and then errors on
        // non-datemath (datemath.go:131 + EvalAnchor err); we require a
        // full datemath match, so `status == "now shipping"` is not
        // misclassified as time-dependent
        (l, r) match {
          case (StringNode(s), other) if isDateMath(s) =>
            times += s
            evalTimeMs(other).foreach(ct => addValue(ct, flip(op), s))
          case (other, StringNode(s)) if isDateMath(s) =>
            times += s
            evalTimeMs(other).foreach(ct => addValue(ct, op, s))
          case _ => walk(l); walk(r)
        }
      case BooleanNode(_, args, _) => args.foreach(walk)
      case UnaryNode(_, c) => walk(c)
      case TriNode(_, a, b, c, _) => walk(a); walk(b); walk(c)
      case FuncNode(_, args) => args.foreach(walk)
      case ArrayNode(items) => items.foreach(walk)
      case _ =>
    }
    walk(node)
    BoundaryResult(times.nonEmpty, times.toSeq, bt)
  }
}
