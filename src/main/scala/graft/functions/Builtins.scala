package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expr._

/** The reference's ~70 builtin scalar/agg functions
  * (/root/reference/expr/builtins/builtins.go:21-141), re-expressed as
  * pure Column builders so every call stays codegen-eligible.
  * Families and semantics follow SURVEY.md §2.8; deliberate divergences
  * are noted inline (siphash → xxhash64).
  */
object Builtins {

  import FuncRegistry.{add, addRaw}
  import ColumnBuilder.build

  private def nullIfEmpty(c: Column): Column = when(c.cast(StringType) === "", lit(null)).otherwise(c)

  /** exists-semantics per type: non-null, and non-empty for strings. */
  private def existy(ctx: BuildCtx, n: Node): Column = ColumnBuilder.existsCol(n, ctx)

  def register(): Unit = {
    // ---- math (expr/builtins/math.go) --------------------------------
    add("sqrt", returnType = Some(DoubleType))(a => sqrt(a.head.cast(DoubleType)))
    add("pow", returnType = Some(DoubleType))(a => pow(a(0).cast(DoubleType), a(1).cast(DoubleType)))
    // beyond the reference pair (math.go stops at sqrt/pow): abs is
    // type-preserving (bigint stays bigint — the DML fuzzer compares it
    // against DuckDB's integer abs bit-exactly)
    add("abs")(a => abs(a.head))

    // ---- aggregates (exec/groupby.go; count counts non-nil) ----------
    addRaw("count", isAgg = true, returnType = Some(LongType)) { (ctx, args) =>
      args match {
        case Seq(IdentityNode(Seq("*"))) => count(lit(1))
        // COUNT(DISTINCT(x)) — parsed as a nested `distinct` call;
        // computed CORRECTLY (the reference returns 0, its issue #56 —
        // documented divergence)
        case Seq(FuncNode("distinct", Seq(inner))) =>
          count_distinct(nullIfEmpty(build(inner, ctx)))
        case Seq(n) => count(nullIfEmpty(build(n, ctx)))
        case _ => count(lit(1))
      }
    }
    add("sum", isAgg = true, returnType = Some(DoubleType))(a => sum(a.head.cast(DoubleType)))
    add("avg", isAgg = true, returnType = Some(DoubleType))(a => avg(a.head.cast(DoubleType)))
    // beyond the reference trio (it errors on these — exec/groupby.go:457-470):
    add("min", isAgg = true)(a => min(a.head))
    add("max", isAgg = true)(a => max(a.head))

    // ---- logical (expr/builtins/logic.go, float-coercing; unparseable
    // input → null result, the reference's could-not-evaluate) ---------
    def num(c: Column) = c.try_cast(DoubleType)
    add("eq", returnType = Some(BooleanType))(a => num(a(0)) === num(a(1)))
    add("ne", returnType = Some(BooleanType))(a => num(a(0)) =!= num(a(1)))
    add("gt", returnType = Some(BooleanType))(a => num(a(0)) > num(a(1)))
    add("ge", returnType = Some(BooleanType))(a => num(a(0)) >= num(a(1)))
    add("lt", returnType = Some(BooleanType))(a => num(a(0)) < num(a(1)))
    add("le", returnType = Some(BooleanType))(a => num(a(0)) <= num(a(1)))
    add("not", returnType = Some(BooleanType))(a => !a.head.cast(BooleanType))
    addRaw("exists", returnType = Some(BooleanType))((ctx, args) => existy(ctx, args.head))
    addRaw("any", returnType = Some(BooleanType))((ctx, args) =>
      args.map(existy(ctx, _)).reduce(_ || _))
    addRaw("all", returnType = Some(BooleanType)) { (ctx, args) =>
      args.map { n =>
        val c = build(n, ctx)
        ColumnBuilder.typeOf(n, ctx) match {
          case Some(BooleanType) => coalesce(c, lit(false))
          case Some(StringType)  => c.isNotNull && c =!= ""
          case _ => c.isNotNull
        }
      }.reduce(_ && _)
    }
    addRaw("oneof") { (ctx, args) => coalesce(args.map(n => nullIfEmpty(build(n, ctx))): _*) }

    // ---- ANSI null-handling + grouping (beyond ref: the reference only
    // has oneof; these are the standard SQL spellings) ------------------
    add("coalesce")(a => coalesce(a: _*))
    add("nullif")(a => when(a(0) === a(1), lit(null)).otherwise(a(0)))
    add("greatest")(a => greatest(a: _*))
    add("least")(a => least(a: _*))
    // GROUPING(key) for ROLLUP/CUBE/GROUPING SETS output disambiguation
    // (1 = the key is rolled up in this row, 0 = a data value); marked
    // isAgg so it plans into the aggregate projection; long for the
    // DuckDB int64 parity
    add("grouping", isAgg = true, returnType = Some(LongType))(a =>
      grouping(a.head).cast(LongType))

    // ---- map constructors (expr/builtins/list_map.go) ----------------
    add("map")(a => map(a(0).cast(StringType), a(1)))
    add("maptime")(a =>
      if (a.size >= 2) map(a(0).cast(StringType), a(1).cast(TimestampType))
      else map(a(0).cast(StringType), current_timestamp()))

    // ---- date/time (expr/builtins/time.go) ---------------------------
    addRaw("todate", returnType = Some(TimestampType)) { (ctx, args) =>
      args match {
        case Seq(StringNode(layout), v) => // todate("01/02/2006", field) — Go layout
          try_to_timestamp(build(v, ctx), lit(goLayoutToJava(layout)))
        case Seq(StringNode(s)) if DateMath.isDateMath(s) => // todate("now+3d")
          DateMath.toColumn(s)
        case Seq(v) => flexibleTs(build(v, ctx))
        case _ => throw BuildException("todate expects 1 or 2 args")
      }
    }
    addRaw("todatein", returnType = Some(TimestampType)) { (ctx, args) =>
      val tz = args(1) match {
        case StringNode(s) => s
        case n => n.text
      }
      to_utc_timestamp(flexibleTs(build(args.head, ctx)), tz)
    }
    add("totimestamp", returnType = Some(LongType))(a => unix_timestamp(flexibleTs(a.head)))
    add("now", returnType = Some(TimestampType))(_ => current_timestamp())
    addRaw("yy", returnType = Some(LongType)) { (ctx, args) =>
      val ts = if (args.isEmpty) current_timestamp() else flexibleTs(build(args.head, ctx))
      (year(ts) % 100).cast(LongType)
    }
    addRaw("yymm", returnType = Some(StringType)) { (ctx, args) =>
      val ts = if (args.isEmpty) current_timestamp() else flexibleTs(build(args.head, ctx))
      date_format(ts, "yyMM")
    }
    add("mm", returnType = Some(LongType))(a => month(flexibleTs(a.head)).cast(LongType))
    add("monthofyear", returnType = Some(LongType))(a => month(flexibleTs(a.head)).cast(LongType))
    // Go time.Weekday: 0 = Sunday (time.go:160-198) vs Spark 1 = Sunday
    addRaw("dayofweek", returnType = Some(LongType)) { (ctx, args) =>
      val ts = if (args.isEmpty) current_timestamp() else flexibleTs(build(args.head, ctx))
      (dayofweek(ts) - 1).cast(LongType)
    }
    addRaw("hourofday", returnType = Some(LongType)) { (ctx, args) =>
      val ts = if (args.isEmpty) current_timestamp() else flexibleTs(build(args.head, ctx))
      hour(ts).cast(LongType)
    }
    addRaw("hourofweek", returnType = Some(LongType)) { (ctx, args) =>
      val ts = if (args.isEmpty) current_timestamp() else flexibleTs(build(args.head, ctx))
      ((dayofweek(ts) - 1) * 24 + hour(ts)).cast(LongType)
    }
    add("seconds", returnType = Some(DoubleType))(a => durationSeconds(a.head))
    val strftimeB: FuncRegistry.RawBuilder = (ctx, args) => {
      val fmt = args(1) match {
        case StringNode(f) => f
        case n => throw BuildException(s"strftime format must be a literal, got ${n.text}")
      }
      date_format(flexibleTs(build(args.head, ctx)), strftimeToJava(fmt))
    }
    addRaw("extract", returnType = Some(StringType))(strftimeB)
    addRaw("strftime", returnType = Some(StringType))(strftimeB)
    add("unixtrunc", returnType = Some(StringType)) { a =>
      val ts = flexibleTs(a.head)
      if (a.size >= 2)
        when(a(1) === "ms", (unix_timestamp(ts) * 1000).cast(StringType))
          .otherwise(unix_timestamp(ts).cast(StringType))
      else unix_timestamp(ts).cast(StringType)
    }

    // ---- cast/coerce (expr/builtins/cast.go) -------------------------
    add("tostring", returnType = Some(StringType))(a => a.head.cast(StringType))
    add("tobool", returnType = Some(BooleanType))(a => a.head.try_cast(BooleanType))
    // toint("$1.50") strips currency/commas (value/coerce.go:389-412)
    add("toint", returnType = Some(LongType))(a =>
      regexp_replace(a.head.cast(StringType), "[$£€¥,\\s]", "").try_cast(DoubleType).cast(LongType))
    add("tonumber", returnType = Some(DoubleType))(a =>
      regexp_replace(a.head.cast(StringType), "[$£€¥,\\s]", "").try_cast(DoubleType))
    add("unsign", returnType = Some(LongType))(a => abs(a.head.cast(LongType)))
    addRaw("cast") { (ctx, args) =>
      val target = args(1) match {
        case StringNode(s) => s
        case IdentityNode(p) => p.mkString(".")
        case n => n.text
      }
      castTo(build(args.head, ctx), target)
    }
    addRaw("try_cast") { (ctx, args) =>
      val target = args(1) match {
        case StringNode(s) => s
        case IdentityNode(p) => p.mkString(".")
        case n => n.text
      }
      tryCastTo(build(args.head, ctx), target)
    }
    // ANSI EXTRACT(part FROM ts), desugared by the parser to
    // extract_part("PART", ts); long outputs for DuckDB int64 parity.
    // DOW follows DuckDB (Sunday = 0; Spark's dayofweek is Sunday = 1)
    addRaw("extract_part", returnType = Some(LongType)) { (ctx, args) =>
      val part = args.head match {
        case StringNode(s) => s.toUpperCase
        case n => n.text.toUpperCase
      }
      val ts = flexibleTs(build(args(1), ctx))
      val c = part match {
        case "YEAR" => year(ts)
        case "MONTH" => month(ts)
        case "DAY" => dayofmonth(ts)
        case "HOUR" => hour(ts)
        case "MINUTE" => minute(ts)
        case "SECOND" => second(ts)
        case "QUARTER" => quarter(ts)
        case "WEEK" => weekofyear(ts)
        case "DOW" => dayofweek(ts) - lit(1)
        case "DOY" => dayofyear(ts)
        case other => throw BuildException(s"unsupported EXTRACT part '$other'")
      }
      c.cast(LongType)
    }
    // INTERVAL n UNIT literal (parser desugar) — a real Spark interval
    // Column, so +/- against timestamps resolve natively
    addRaw("interval_lit") { (_, args) =>
      val n = args.head match { case StringNode(s) => s; case x => x.text }
      val unit = args(1) match { case StringNode(s) => s; case x => x.text }
      require(n.matches("-?\\d+") &&
        unit.matches("(?i)(second|minute|hour|day|week|month|year)s?"),
        s"unsupported interval '$n $unit'")
      expr(s"INTERVAL $n $unit")
    }
    // date_trunc(unit, ts) — unit names shared with DuckDB
    addRaw("date_trunc") { (ctx, args) =>
      val unit = args.head match {
        case StringNode(s) => s
        case n => n.text
      }
      date_trunc(unit, flexibleTs(build(args(1), ctx)))
    }
    add("char_length", returnType = Some(LongType))(a => length(a.head.cast(StringType)).cast(LongType))

    // ---- string (expr/builtins/string.go) ----------------------------
    // missing/null operand ⇒ false, matching the reference's builtin
    // (`contains(key,"-")` over a row without `key` is false, not error)
    add("contains", returnType = Some(BooleanType))(a =>
      coalesce(a(0).cast(StringType).contains(a(1)), lit(false)))
    add("tolower", returnType = Some(StringType))(a => lower(a.head.cast(StringType)))
    add("string.lowercase", returnType = Some(StringType))(a => lower(a.head.cast(StringType)))
    add("string.uppercase", returnType = Some(StringType))(a => upper(a.head.cast(StringType)))
    add("string.titlecase", returnType = Some(StringType))(a => initcap(a.head.cast(StringType)))
    // Go strings.Index: 0-based, -1 when missing
    add("string.index", returnType = Some(LongType))(a =>
      (call_function("locate", a(1).cast(StringType), a(0).cast(StringType)) - 1).cast(LongType))
    add("split", returnType = Some(ArrayType(StringType))) { a =>
      filter(split(a(0).cast(StringType), regexQuote(a(1))), e => e =!= "")
    }
    add("string.split", returnType = Some(ArrayType(StringType))) { a =>
      filter(split(a(0).cast(StringType), regexQuote(a(1))), e => e =!= "")
    }
    // generators (beyond ref — the dialect's UNNEST): one row per array
    // element; Spark's analyzer enforces generator placement (SELECT
    // list only, one per statement) with its own clear errors
    add("explode")(a => explode(a.head))
    add("explode_outer")(a => explode_outer(a.head))
    add("unnest")(a => explode(a.head))
    add("strip", returnType = Some(StringType))(a => trim(a.head.cast(StringType)))
    add("string.strip", returnType = Some(StringType))(a => trim(a.head.cast(StringType)))
    add("replace", returnType = Some(StringType)) { a =>
      val repl = if (a.size >= 3) a(2) else lit("")
      replace(a(0).cast(StringType), a(1).cast(StringType), repl.cast(StringType))
    }
    addRaw("join", returnType = Some(StringType)) { (ctx, args) =>
      // join(v1, v2, …, sep): args joined by the LAST arg; array args
      // are flattened (string.go:296-330)
      val sep = build(args.last, ctx).cast(StringType)
      val parts = args.dropRight(1).map { n =>
        ColumnBuilder.typeOf(n, ctx) match {
          case Some(ArrayType(_, _)) => array_join(build(n, ctx), ",")
          case _ => build(n, ctx).cast(StringType)
        }
      }
      parts.reduce((x, y) => concat(x, sep, y))
    }
    add("hassuffix", returnType = Some(BooleanType))(a => a(0).cast(StringType).endsWith(a(1)))
    add("hasprefix", returnType = Some(BooleanType))(a => a(0).cast(StringType).startsWith(a(1)))
    addRaw("string.substr", returnType = Some(StringType)) { (ctx, args) =>
      // Go slicing: substr(s, start[, end]) 0-based, end exclusive
      val s = build(args.head, ctx).cast(StringType)
      val start = build(args(1), ctx).cast(IntegerType)
      args.lift(2) match {
        case Some(endN) =>
          val end = build(endN, ctx).cast(IntegerType)
          s.substr(start + 1, end - start)
        case None => s.substr(start + 1, length(s) - start)
      }
    }

    // ---- array (expr/builtins/list_map.go:16-205) --------------------
    addRaw("len", returnType = Some(LongType)) { (ctx, args) =>
      val c = build(args.head, ctx)
      ColumnBuilder.typeOf(args.head, ctx) match {
        case Some(ArrayType(_, _)) => size(c).cast(LongType)
        case Some(MapType(_, _, _)) => size(map_keys(c)).cast(LongType)
        case _ => length(c.cast(StringType)).cast(LongType)
      }
    }
    addRaw("array.index") { (ctx, args) =>
      val arr = build(args.head, ctx)
      val i = build(args(1), ctx).cast(IntegerType)
      // reference: 0-based, negative counts from end — element_at is
      // 1-based with native negative support
      element_at(arr, when(i >= 0, i + 1).otherwise(i))
    }
    addRaw("array.slice") { (ctx, args) =>
      val arr = build(args.head, ctx)
      val start = build(args(1), ctx).cast(IntegerType)
      args.lift(2) match {
        case Some(endN) =>
          val end = build(endN, ctx).cast(IntegerType)
          slice(arr, start + 1, end - start)
        case None => slice(arr, start + 1, greatest(size(arr) - start, lit(0)))
      }
    }

    // ---- selection / map ops (expr/builtins/filter.go, list_map.go) --
    addRaw("match", returnType = Some(MapType(StringType, StringType))) { (ctx, args) =>
      // match("k_"): map of row fields whose NAME starts with any prefix,
      // prefix stripped from the key — needs the schema.
      val prefixes = args.map {
        case StringNode(s) => s
        case n => n.text
      }
      val st = ctx.schema.getOrElse(throw BuildException("match() needs schema context"))
      val hits = for {
        f <- st.fields.toSeq
        p <- prefixes
        if f.name.startsWith(p)
      } yield (f.name.stripPrefix(p), f.name)
      if (hits.isEmpty) lit(null).cast(MapType(StringType, StringType))
      else map(hits.flatMap { case (k, fn) => Seq(lit(k), col(fn).cast(StringType)) }: _*)
    }
    add("mapkeys", returnType = Some(ArrayType(StringType)))(a => map_keys(a.head))
    add("mapvalues")(a => map_values(a.head))
    add("mapinvert")(a => map_from_arrays(map_values(a.head).cast(ArrayType(StringType)), map_keys(a.head)))
    addRaw("filter") { (ctx, args) => filterOp(ctx, args, keep = false) }
    addRaw("filtermatch") { (ctx, args) => filterOp(ctx, args, keep = true) }

    // ---- url/email (expr/builtins/url_email.go) ----------------------
    val emailRe = "^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$"
    def emailAddr(c: Column): Column = {
      val inner = regexp_extract(c.cast(StringType), "<([^>]+)>", 1)
      val addr = when(inner =!= "", inner).otherwise(trim(c.cast(StringType)))
      when(addr.rlike(emailRe), lower(addr)).otherwise(lit(null))
    }
    add("email", returnType = Some(StringType))(a => emailAddr(a.head))
    add("emailname", returnType = Some(StringType))(a =>
      trim(regexp_extract(a.head.cast(StringType), "^([^<]*)<[^>]+>", 1)))
    add("emaildomain", returnType = Some(StringType))(a =>
      substring_index(emailAddr(a.head), "@", -1))
    def withScheme(c: Column): Column = {
      val s = lower(trim(c.cast(StringType)))
      when(s.startsWith("http"), s).otherwise(concat(lit("http://"), s))
    }
    def hostOf(c: Column): Column = parse_url(withScheme(c), lit("HOST"))
    def domainOf(c: Column): Column = {
      // last two host labels (url_email.go:165-171)
      val h = hostOf(c)
      val parts = split(h, "\\.")
      when(size(parts) > 2, concat_ws(".", element_at(parts, -2), element_at(parts, -1)))
        .otherwise(h)
    }
    add("host", returnType = Some(StringType))(a => hostOf(a.head))
    add("hosts", returnType = Some(ArrayType(StringType)))(a => array(a.map(hostOf): _*))
    add("domain", returnType = Some(StringType))(a => domainOf(a.head))
    add("domains", returnType = Some(ArrayType(StringType)))(a => array_distinct(array(a.map(domainOf): _*)))
    add("path", returnType = Some(StringType))(a => parse_url(withScheme(a.head), lit("PATH")))
    add("qs", returnType = Some(StringType))(a =>
      url_decode(parse_url(withScheme(a(0)), lit("QUERY"), a(1).cast(StringType))))
    add("qs2", returnType = Some(StringType))(a =>
      parse_url(withScheme(a(0)), lit("QUERY"), a(1).cast(StringType)))
    add("qsl", returnType = Some(ArrayType(StringType))) { a =>
      val q = parse_url(withScheme(a(0)), lit("QUERY"))
      regexp_extract_all(q, concat(lit("(?:^|&)"), a(1).cast(StringType), lit("=([^&]*)")), lit(1))
    }
    add("urlmain", returnType = Some(StringType))(a =>
      substring_index(substring_index(a.head.cast(StringType), "?", 1), "#", 1))
    add("urlminusqs", returnType = Some(StringType)) { a =>
      val url = a(0).cast(StringType); val key = a(1).cast(StringType)
      val stripped = regexp_replace(url,
        concat(lit("([?&])"), key, lit("=[^&]*(&|$)")), lit("$1"))
      regexp_replace(regexp_replace(stripped, "[?&]$", ""), "\\?&", "?")
    }
    add("urldecode", returnType = Some(StringType))(a => url_decode(a.head.cast(StringType)))
    add("url.matchqs", returnType = Some(StringType)) { a =>
      // keep only the listed qs keys
      val url = a.head.cast(StringType)
      val base = substring_index(substring_index(url, "?", 1), "#", 1)
      val kept = a.tail.map(k =>
        when(parse_url(url, lit("QUERY"), k.cast(StringType)).isNotNull,
          concat(k.cast(StringType), lit("="), parse_url(url, lit("QUERY"), k.cast(StringType)))))
      val q = concat_ws("&", kept: _*)
      when(q === "", base).otherwise(concat(base, lit("?"), q))
    }
    def uaBrowser(c: Column): Column = {
      val ua = lower(c.cast(StringType))
      when(ua.contains("edg"), "Edge")
        .when(ua.contains("chrome"), "Chrome")
        .when(ua.contains("firefox"), "Firefox")
        .when(ua.contains("safari"), "Safari")
        .when(ua.contains("msie") || ua.contains("trident"), "Internet Explorer")
        .otherwise("Unknown")
    }
    def uaOs(c: Column): Column = {
      val ua = lower(c.cast(StringType))
      when(ua.contains("windows"), "Windows")
        .when(ua.contains("android"), "Android")
        .when(ua.contains("iphone") || ua.contains("ipad") || ua.contains("ios"), "iOS")
        .when(ua.contains("mac os"), "Mac OS")
        .when(ua.contains("linux"), "Linux")
        .otherwise("Unknown")
    }
    add("useragent", returnType = Some(StringType)) { a =>
      val part = a(1)
      // part is a literal column of the attribute name
      when(part === "browser", uaBrowser(a(0)))
        .when(part === "os", uaOs(a(0)))
        .when(part === "bot", lower(a(0).cast(StringType)).contains("bot").cast(StringType))
        .when(part === "mobile",
          (lower(a(0).cast(StringType)).contains("mobile") ||
           lower(a(0).cast(StringType)).contains("android")).cast(StringType))
        .otherwise(lit(null))
    }
    add("useragent.map", returnType = Some(MapType(StringType, StringType)))(a =>
      map(lit("browser"), uaBrowser(a.head), lit("os"), uaOs(a.head)))
    add("uuid", returnType = Some(StringType))(_ => uuid())

    // ---- hashing/encoding (expr/builtins/hash_and_encode.go) ---------
    // reference hash()/hash.sip is siphash; xxhash64 is the built-in,
    // codegen'd 64-bit hash in Spark — documented divergence.
    add("hash", returnType = Some(LongType))(a => abs(xxhash64(a.head)))
    add("hash.sip", returnType = Some(LongType))(a => abs(xxhash64(a.head)))
    add("hash.md5", returnType = Some(StringType))(a => md5(a.head.cast(BinaryType)))
    add("hash.sha1", returnType = Some(StringType))(a => sha1(a.head.cast(BinaryType)))
    add("hash.sha256", returnType = Some(StringType))(a => sha2(a.head.cast(BinaryType), 256))
    add("hash.sha512", returnType = Some(StringType))(a => sha2(a.head.cast(BinaryType), 512))
    add("encoding.b64encode", returnType = Some(StringType))(a => base64(a.head.cast(BinaryType)))
    add("encoding.b64decode", returnType = Some(StringType))(a => unbase64(a.head).cast(StringType))

    // ---- json (expr/builtins/json.go jmespath ≈ JsonPath subset) -----
    addRaw("json.jmespath", returnType = Some(StringType)) { (ctx, args) =>
      val path = args(1) match {
        case StringNode(s) => if (s.startsWith("$")) s else "$." + s
        case n => n.text
      }
      get_json_object(build(args.head, ctx).cast(StringType), path)
    }
  }

  // ---- helpers -------------------------------------------------------

  /** Flexible timestamp coercion (araddon/dateparse behavior, common
    * formats chained): timestamps pass through; strings try several
    * layouts; numbers are epoch seconds/millis. */
  def flexibleTs(c: Column): Column =
    coalesce(
      c.try_cast(TimestampType), // try_*: unparseable → null, not ANSI error
      try_to_timestamp(c, lit("MM/dd/yyyy HH:mm:ss")),
      try_to_timestamp(c, lit("MM/dd/yyyy")),
      try_to_timestamp(c, lit("dd/MM/yyyy")),
      try_to_timestamp(c, lit("yyyy/MM/dd")),
      try_to_timestamp(c, lit("MMM d, yyyy")),
      try_to_timestamp(c, lit("MMMM d, yyyy")))

  /** "25m" → 1500.0 etc.; bare numbers pass through as seconds. */
  private def durationSeconds(c: Column): Column = {
    val s = trim(c.cast(StringType))
    val n = regexp_extract(s, "^(-?\\d+(?:\\.\\d+)?)", 1).cast(DoubleType)
    val unit = regexp_extract(s, "([smhdwMy])$", 1)
    when(unit === "s", n)
      .when(unit === "m", n * 60)
      .when(unit === "h", n * 3600)
      .when(unit === "d", n * 86400)
      .when(unit === "w", n * 604800)
      .when(unit === "M", n * 2592000)
      .when(unit === "y", n * 31536000)
      .otherwise(s.try_cast(DoubleType))
  }

  private def castTo(c: Column, target: String): Column = target.toLowerCase match {
    case "int" | "integer" | "bigint" => c.cast(LongType)
    case "float" | "double" | "number" => c.cast(DoubleType)
    case "char" | "varchar" | "string" | "text" => c.cast(StringType)
    case "bool" | "boolean" => c.cast(BooleanType)
    case "time" | "timestamp" | "datetime" => flexibleTs(c)
    case "date" => c.cast(DateType)
    // any legal DDL type beyond the friendly names — decimal(p,s) (the
    // FROM-less scalar-subquery exactness path re-enters BigDecimals as
    // cast('…' AS decimal(p,s))), array<…>, map<…>, void (typed NULL of
    // an empty/NULL scalar over a NULL-typed column)
    case other => parseDdlType(other) match {
      case Some(dt) => c.cast(dt)
      case None => throw BuildException(s"unsupported cast target '$other'")
    }
  }

  /** TRY_CAST: NULL instead of an error on malformed input (ANSI-mode
    * safe ingestion — the shape a 100 TB raw-text load needs). */
  private def tryCastTo(c: Column, target: String): Column = target.toLowerCase match {
    case "int" | "integer" | "bigint" => c.try_cast(LongType)
    case "float" | "double" | "number" => c.try_cast(DoubleType)
    case "char" | "varchar" | "string" | "text" => c.try_cast(StringType)
    case "bool" | "boolean" => c.try_cast(BooleanType)
    case "time" | "timestamp" | "datetime" => c.try_cast(TimestampType)
    case "date" => c.try_cast(DateType)
    case other => parseDdlType(other) match {
      case Some(dt) => c.try_cast(dt)
      case None => throw BuildException(s"unsupported cast target '$other'")
    }
  }

  /** Parse a DDL type name (decimal(10,2), array<int>, void, …) —
    * None when it isn't one, so the caller keeps its loud error. The
    * only producer of a `void` target is the NULL-scalar-subquery
    * literal path, where the input is a NULL literal (NullType→NullType
    * is the identity cast Catalyst accepts). */
  private def parseDdlType(s: String): Option[DataType] =
    scala.util.Try(DataType.fromDDL(s)).toOption

  private def regexQuote(c: Column): Column =
    regexp_replace(c.cast(StringType), "([.\\\\+*?^$\\[\\]{}()|])", "\\\\$1")

  /** map/array filter-out (filter) vs filter-in (filtermatch) by glob
    * patterns (expr/builtins/filter.go). */
  private def filterOp(ctx: BuildCtx, args: Seq[Node], keep: Boolean): Column = {
    val target = build(args.head, ctx)
    val patterns = args.tail.map {
      case StringNode(s) => s
      case n => n.text
    }
    def matches(k: Column): Column =
      patterns.map(p => k.rlike(ColumnBuilder.globToRegex(p))).reduce(_ || _)
    ColumnBuilder.typeOf(args.head, ctx) match {
      case Some(MapType(_, _, _)) =>
        val m = map_filter(target, (k, _) => if (keep) matches(k) else !matches(k))
        when(size(map_keys(m)) > 0, m).otherwise(lit(null))
      case Some(ArrayType(_, _)) =>
        val a = filter(target, e => if (keep) matches(e.cast(StringType)) else !matches(e.cast(StringType)))
        when(size(a) > 0, a).otherwise(lit(null))
      case _ =>
        val hit = matches(target.cast(StringType))
        when(if (keep) hit else !hit, target).otherwise(lit(null))
    }
  }

  /** Translate a Go reference-time layout ("01/02/2006") into a Java
    * DateTimeFormatter pattern ("MM/dd/yyyy"). */
  def goLayoutToJava(layout: String): String = {
    val repl = Seq(
      "2006" -> "yyyy", "January" -> "MMMM", "Jan" -> "MMM", "Monday" -> "EEEE",
      "Mon" -> "EEE", "15" -> "HH", "04" -> "mm", "05" -> "ss", ".000" -> ".SSS",
      "-07:00" -> "XXX", "-0700" -> "Z", "Z07:00" -> "XXX", "MST" -> "zzz",
      "PM" -> "a", "pm" -> "a", "01" -> "MM", "02" -> "dd", "03" -> "hh", "2" -> "d", "1" -> "M")
    var out = layout
    for ((go, java) <- repl) out = out.replace(go, java)
    out
  }

  /** Translate strftime directives to a Java DateTimeFormatter pattern
    * (reference extract/strftime — expr/builtins/time.go). */
  def strftimeToJava(fmt: String): String = {
    val repl = Seq(
      "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd", "%e" -> "d",
      "%H" -> "HH", "%I" -> "hh", "%M" -> "mm", "%S" -> "ss", "%B" -> "MMMM",
      "%b" -> "MMM", "%A" -> "EEEE", "%a" -> "EEE", "%j" -> "DDD", "%p" -> "a",
      "%z" -> "Z", "%Z" -> "zzz", "%%" -> "%")
    repl.foldLeft(fmt) { case (c, (k, v)) => c.replace(k, v) }
  }
}
