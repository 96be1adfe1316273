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
      .otherwise(c.cast(TimestampType))
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
}
